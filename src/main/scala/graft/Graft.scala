package graft

import org.apache.spark.sql.SparkSession

/** User entry point: a SparkSession builder with graft's required and
  * recommended configuration applied. On a cluster, pair with
  * `spark.sql.extensions=graft.GraftExtensions` (or call
  * `functions.GraftFunctions.register`). */
object Graft {

  /** Confs the library requires (nanos parquet reads, UTC determinism)
    * plus scale defaults (AQE with skew-join handling is on by default
    * in Spark 4; shuffle partitions sized by the caller). */
  def builder(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    if (shufflePartitions > 0) b.config("spark.sql.shuffle.partitions", shufflePartitions)
    else b
  }

  def session(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    functions.GraftFunctions.register(s)
    s
  }
}
