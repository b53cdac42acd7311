package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: 1-task ORC write (the sf0.1 a2 sizing) vs repartition(n)
  * parallel write — re-measuring the SparkEntry sizing-doctrine claim
  * on this box. Evidence only; not a query path. */
object OrcParallelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
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
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    src.write.format("noop").mode("overwrite").save()
    for (n <- Seq(0, 2, 4, 8, 16, 32)) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_par_probe_$n"
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = if (n == 0) src else src.repartition(n)
        df.write.format("orc").mode("overwrite").save(path)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[par] n=$n%-3d write_min=${times.min}%6.3f  (all: ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
