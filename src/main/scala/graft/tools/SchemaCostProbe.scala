package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: per-construction cost of spark.read.parquet schema inference
  * vs an explicit-schema read, warm session. Evidence for the round-14
  * table() schema-cache decision. */
object SchemaCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("lineitem", "orders", "customer", "nation", "region")
    // warm
    tables.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").schema)
    val schemas = tables.map(t => t -> spark.read.parquet(s"$sfDir/$t.parquet").schema).toMap
    for (mode <- Seq("infer", "explicit")) {
      val times = (1 to 8).map { _ =>
        val t0 = System.nanoTime()
        tables.foreach { t =>
          val df = if (mode == "infer") spark.read.parquet(s"$sfDir/$t.parquet")
                   else spark.read.schema(schemas(t)).parquet(s"$sfDir/$t.parquet")
          df.queryExecution.analyzed // force analysis
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[schema] $mode%-9s 5tables_min=${times.min}%6.4f  (all: ${times.map(t => f"$t%.3f").mkString(",")})")
    }
    spark.stop()
  }
}
