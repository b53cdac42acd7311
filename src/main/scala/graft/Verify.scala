package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as long, convert in
      // Relational.events (Spark has no native nanos timestamp read)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // local mode needs no tight liveness detection: GC pauses under the
      // O(n²) baselines at large SF can exceed the 10s default heartbeat,
      // and a "dead" local executor takes the whole context down with it
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="graft.pack.shardSpan=64,other.key=v" — runtime
    // conf for sweep variants; ops (and their oracle SQL, e.g. c15's
    // shard span) read these through the session, so a swept knob stays
    // in sync with its oracle by construction
    sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(",")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    new java.io.File(outDir).mkdirs()
    // per-query watchdog: one pathological query must not stall the whole
    // correctness dump — cancel its job group after the timeout and move on
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "300").toInt
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // scale sweeps skip the labeled O(n²) correctness baselines rather
    // than burn a watchdog timeout each (e.g. SPARK_GRAFT_SKIP=c2_dedup_ngram)
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // SPARK_GRAFT_ONLY=b24_asof_join,b25_range_join → dump just those
    // (local iteration on a new operator without the full registry)
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // names whose missing output is EXPECTED (env-skipped, ONLY-excluded)
    // — written to skipped.json so the oracle checker can distinguish
    // them from a query that crashed before writing. Watchdog timeouts
    // go to cancelled.json instead: a formerly-passing query that starts
    // hanging must surface as a FAILURE, not a policy skip.
    val intentionallySkipped = scala.collection.mutable.ArrayBuffer[String]()
    val cancelled = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.nonEmpty && !only(name)) { intentionallySkipped += name }
      else if (skip(name)) {
        intentionallySkipped += name
        System.err.println(s"[verify] $name skipped (SPARK_GRAFT_SKIP)")
      }
      else {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
      try {
        Await.result(Future {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }, timeoutSec.seconds)
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          cancelled += name
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s, cancelled")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally spark.sparkContext.clearJobGroup()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/skipped.json"),
      intentionallySkipped.sorted.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/cancelled.json"),
      cancelled.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
