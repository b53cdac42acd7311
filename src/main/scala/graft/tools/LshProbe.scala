package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade-timing main for c2_dedup_cosine_lsh: min-of-2 warm runs. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(dir: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.ops.Similarity.dedupCosineLsh(spark, dir)
        .agg(count(lit(1))).head().getLong(0)
      (n, (System.nanoTime() - t0) / 1e9)
    }
    args.foreach { dir =>
      val (n1, t1) = once(dir); val (_, t2) = once(dir)
      println(f"""{"dir":"$dir","pairs":$n1,"run1_sec":$t1%.1f,"run2_sec":$t2%.1f,"min_sec":${math.min(t1,t2)}%.1f}""")
    }
    spark.stop()
  }
}
