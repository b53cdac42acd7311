package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query micro-profile for the optimization rounds: splits each
  * run into CONSTRUCT+PLAN (DataFrame build through executedPlan, i.e.
  * analysis/optimization/physical planning) and EXECUTE (noop-sink
  * materialization), over N warm repetitions in one JVM. Where Bench
  * answers "how long does the query take", this answers "is the time
  * planning or execution" — guide §1 requires knowing which before
  * touching anything.
  *
  * Usage: QueryProfile <sfDir> <reps> key[,key...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .write.format("noop").mode("overwrite").save()
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val minPlan = rows.map(_._1).min
      val minExec = rows.map(_._2).min
      val minTotal = rows.map(r => r._1 + r._2).min
      println(f"[profile] $key%-28s plan_min=$minPlan%7.3f exec_min=$minExec%7.3f total_min=$minTotal%7.3f  (all: ${rows.map(r => f"${r._1 + r._2}%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
