package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Similarity}

/**
 * Prices the hierarchical vs flat arrival probe on the SAME
 * constant-population index at high cell count — the experiment that
 * shows where the `centroids2` codebook pays. Builds one index under
 * `graft.semdedup.cellPop` (k = n/pop cells), probes the arrival batch
 * hierarchically ((k1+k2)·d per row), then deletes the coarse codebook
 * — the reader falls back to the flat probe over the SAME k-row
 * centroid table (k·d per row) — and probes again. Same index, same
 * arrivals, same dispatch; only the cell-choice kernel differs.
 *
 * Usage: runMain graft.tools.HierProbe <sfDir> [pop]
 */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pop = if (args.length > 1) args(1) else "100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.semdedup.cellPop", pop)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 20 =!= 7)
    val batch = e.filter(col("vec_id") % 20 === 7).localCheckpoint()
    val idx = Similarity.freshScratch(spark, "graft_hier_probe_")
    val t0 = System.nanoTime()
    Similarity.buildIvfIndexFrom(spark, corpus, idx)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val k = spark.read.parquet(s"$idx/centroids").count()
    val k1 = spark.read.parquet(s"$idx/centroids2").count()
    def probe(): (Long, Double) = {
      val t = System.nanoTime()
      val n = Similarity.dedupSemanticIncremental(spark, idx, batch)
        .agg(count(lit(1))).head().getLong(0)
      (n, (System.nanoTime() - t) / 1e9)
    }
    val (hd1, ht1) = probe(); val (_, ht2) = probe()
    // the round-10 recall knob priced at the same crossover cell count:
    // top-2 coarse branches, 2×(k/k1) sub-scan + 2× candidate fan-out
    spark.conf.set("graft.semdedup.coarseProbes", "2")
    val (h2d, h2t1) = probe(); val (_, h2t2) = probe()
    spark.conf.unset("graft.semdedup.coarseProbes")
    IndexMeta.delete(spark, s"$idx/centroids2")
    val (fd1, ft1) = probe(); val (_, ft2) = probe()
    println(f"""{"dir":"$dir","pop":$pop,"cells":$k,"coarse":$k1,""" +
      f""""build_sec":$tBuild%.1f,"hier_drops":$hd1,""" +
      f""""hier_sec":${math.min(ht1, ht2)}%.1f,""" +
      f""""hier2_drops":$h2d,"hier2_sec":${math.min(h2t1, h2t2)}%.1f,""" +
      f""""flat_drops":$fd1,""" +
      f""""flat_sec":${math.min(ft1, ft2)}%.1f}""")
    IndexMeta.delete(spark, idx)
    spark.stop()
  }
}
