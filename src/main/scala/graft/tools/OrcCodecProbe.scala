package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe for the a2 roundtrip's ORC encode cost: times the
  * lineitem ORC write (the a2 write leg, same sizing) and the read+agg
  * leg under each candidate codec, warm, min-of-N. Evidence for the
  * round-14 OPTIMIZATION codec decision — not part of any query path. */
object OrcCodecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
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
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    src.write.format("noop").mode("overwrite").save() // warm page cache + JIT
    println("session default orc codec: " + spark.conf.get("spark.sql.orc.compression.codec"))
    for (codec <- Seq("default", "snappy", "zstd", "lz4", "zlib", "none")) {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_codec_probe_$codec"
      val writes = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val w = src.write.format("orc").mode("overwrite")
        (if (codec == "default") w else w.option("compression", codec)).save(path)
        (System.nanoTime() - t0) / 1e9
      }
      val reads = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.read.orc(path)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(round(col("l_quantity") * 10000, 0).cast("long")) / 10000.0, 4).as("sum_qty"))
          .orderBy("l_returnflag")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val bytes = {
        val d = new java.io.File(path)
        d.listFiles().filter(_.getName.endsWith(".orc")).map(_.length()).sum
      }
      println(f"[codec] $codec%-8s write_min=${writes.min}%6.3f read_min=${reads.min}%6.3f bytes=$bytes%10d  (writes: ${writes.map(w => f"$w%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
