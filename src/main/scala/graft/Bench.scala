package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the BASELINE.md headline queries (B3 Q1-like
  * agg, B5 5-way join, B8 top-k, A2 ORC roundtrip, C3 cosine top-k)
  * against SPARK_GRAFT_SF_DIR and prints one JSON line. Results are
  * fully materialized through the noop sink (count() would let Spark
  * prune aggregation payloads).
  *
  * METHOD (round-14, verdict item 5 — the suite_isolated treatment):
  * by default each headline query runs in its OWN child JVM (fresh
  * JIT/GC/page-cache state — the standing bench ran minutes after the
  * full test suite on the same box and drifted +36%/+13% two rounds
  * running on identical code), behind an IDLE-BOX GUARD (wait until
  * the 1-min load average drops below SPARK_GRAFT_BENCH_MAXLOAD,
  * default 8, up to 240 s) with min-of-SPARK_GRAFT_BENCH_RUNS (3)
  * inside each child. The emitted JSON carries the method and the
  * load it started at, so the artifact is its own evidence.
  * SPARK_GRAFT_BENCH_ISOLATED=0 restores the single-JVM in-process
  * path (used by the children themselves and by scale rehearsals that
  * bench generated corpora in a warm session). */
object Bench {
  private val headline = Seq(
    "b3_agg_group", "b5_join_multi", "b8_topk", "a2_roundtrip", "c3_sim_topk")

  /** comma-separated override, e.g. scale rehearsals benching the dedup
    * pipeline queries on generated sf1 data */
  private def querySet: Seq[String] =
    sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(headline)

  def main(args: Array[String]): Unit =
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATED", "1") == "1") isolatedMain()
    else inProcessMain()

  // ------------------------------------------ isolated (the method)

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Idle-box guard: refuse to START a measurement on a loaded box —
    * poll the 1-min load average until it falls below the threshold or
    * the timeout passes (then proceed and record the load: a number
    * taken on a busy box is flagged, not silently trusted). */
  private def awaitIdle(maxLoad: Double, timeoutSec: Int = 240): Double = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    var l = loadAvg
    while (l > maxLoad && System.nanoTime() < deadline) {
      System.err.println(f"[bench] load $l%.1f > $maxLoad%.1f — waiting for idle box")
      Thread.sleep(5000)
      l = loadAvg
    }
    l
  }

  private def isolatedMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "8").toDouble
    val jvm = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val xmx = s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
    val startLoad = awaitIdle(maxLoad)
    var fallbacks = List.empty[String]
    val results = querySet.map { name =>
      val childOut = java.nio.file.Files.createTempFile("graft_bench_", ".json")
      awaitIdle(maxLoad)
      val cmd = (Seq(jvm) ++ jdk17AddOpens ++ Seq(xmx,
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Bench")).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ISOLATED", "0")
      pb.environment().put("SPARK_GRAFT_BENCH_QUERIES", name)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", childOut.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.to(
        java.nio.file.Files.createTempFile(s"graft_bench_${name}_", ".log").toFile))
      val code = pb.start().waitFor()
      val sec =
        if (code == 0 && java.nio.file.Files.size(childOut) > 0) {
          // the child's single-query JSON: {"metric":…,"queries":{"<name>":N},…}
          val line = java.nio.file.Files.readString(childOut)
          val m = s""""$name":([0-9.Ee+-]+)""".r.findFirstMatchIn(line)
          m.map(_.group(1).toDouble)
        } else None
      sec match {
        case Some(s) => name -> s
        case None =>
          // a child that died measures nothing — say so loudly and fall
          // back to an in-process run rather than fabricating a number
          System.err.println(s"[bench] isolated child for $name failed " +
            s"(exit $code) — falling back to in-process")
          fallbacks ::= name
          name -> runInProcess(Seq(name), sfDir).head._2
      }
    }
    // the artifact must not claim fresh-JVM numbers for queries that
    // actually ran warm in-process — name the fallbacks in the JSON
    val fb = if (fallbacks.isEmpty) ""
      else fallbacks.reverse.map(q => s""""$q"""")
        .mkString(""","in_process_fallback":[""", ",", "]")
    emit(results, sfDir,
      f""","method":"isolated_jvm","load_at_start":$startLoad%.2f""" + fb)
  }

  // ------------------------------------------ in-process (children)

  private def inProcessMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emit(runInProcess(querySet, sfDir), sfDir, "")
  }

  private def runInProcess(queries: Seq[String], sfDir: String): Seq[(String, Double)] = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen + parquet footer cache, so per-query
    // numbers measure execution rather than first-touch JVM costs.
    // Routed through Relational.table so the schema memo (round-14) is
    // warm for the first timed run too, matching steady-state serving.
    graft.ops.Relational.table(spark, sfDir, "lineitem").agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1))).write.format("noop").mode("overwrite").save()
    // min of three runs per query: background-load noise on a shared box
    // swings single runs ±2× (round-2's driver run read 7.0s total where
    // an idle box measures 4.8-5.4s); the min tracks the query's actual cost
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = queries.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    spark.stop()
    results
  }

  private def emit(results: Seq[(String, Double)], sfDir: String,
                   extra: String): Unit = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$extra}"""
    // stdout gets buried in sbt log noise (BENCH_r01 parsed: null) — also
    // write the line to a file the driver / later rounds can load directly
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
  }
}
