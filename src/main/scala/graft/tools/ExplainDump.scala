package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registry queries to files — the
  * plan evidence for the optimization rounds (plans/r<N>/<key>_<tag>.txt).
  *
  * Usage: ExplainDump <sfDir> <outDir> <tag> [key,key,... | all]
  *
  * Construction side effects (a2's ORC write, index builds) run as they
  * would in the bench; the dumped plan is the final query's formatted
  * explain. Keys that fail to construct are recorded with the error so
  * a dump over `all` never silently drops a key.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val keys: Seq[String] =
      if (args.length < 4 || args(3) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(outDir)
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
    keys.foreach { key =>
      val out = outDir.resolve(s"${key}_$tag.txt")
      val text =
        try {
          val df = graft.SparkEntry.queries(key)(spark, sfDir)
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        } catch {
          case e: Throwable => s"CONSTRUCTION FAILED: $e"
        }
      java.nio.file.Files.writeString(out, text)
      println(s"[explain] $key -> $out")
    }
    spark.stop()
  }
}
