package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Similarity}

/**
 * Prices the multi-branch coarse probe (`graft.semdedup.coarseProbes`)
 * on a constant-population index at decade scale — the knob that closes
 * the hierarchical probe's coarse-boundary recall dip (round-9
 * DispatchProbe table: 993–995/1000 planted twins at b=1 vs the flat
 * index's 999–1000).
 *
 * One cellPop index is built per dir, then the SAME index is probed at
 * b=1 and b=2 (the conf re-plans the probe; placement is b-invariant so
 * no rebuild), plus the flat √n index as the recall reference. Reports
 * min-of-2 warm wall time and the planted-twin drop count (arrival ids
 * ≥ 10,000,000 — the DispatchProbe planting scheme, reproduced exactly
 * for table comparability).
 *
 * Usage: runMain graft.tools.CoarseProbeSweep <embeddingsDir> [dir...]
 * SPARK_GRAFT_CELLPOP (default 1000) sets the population knob.
 */
object CoarseProbeSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cellPop = sys.env.getOrElse("SPARK_GRAFT_CELLPOP", "1000")

    def minOf2(body: => (Long, Long)): (Long, Long, Double) = {
      def once() = { val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9) }
      val (r, t1) = once(); val (_, t2) = once()
      (r._1, r._2, math.min(t1, t2))
    }

    args.foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val corpus = e.filter(col("vec_id") % 20 =!= 7)
      val planted = corpus.orderBy("vec_id").limit(1000).select(
        (col("vec_id") + 10000000L).as("vec_id"),
        expr("""zip_with(embedding, sequence(0, size(embedding) - 1),
          |(x, d) -> cast(x + IF((xxhash64(concat('jit_', cast(d as string), '_', cast(vec_id as string))) & 1) = 1, 0.001D, -0.001D) as float))"""
          .stripMargin).as("embedding"))
      val batch = e.filter(col("vec_id") % 20 === 7).unionByName(planted)
        .localCheckpoint()
      val nArr = batch.count()

      def probe(idx: String): (Long, Long) = {
        val out = Similarity.dedupSemanticIncremental(spark, idx, batch)
          .agg(count(lit(1)).as("n"),
            count(when(col("arrival_id") >= 10000000L, 1)).as("planted"))
          .head()
        (out.getLong(0), out.getLong(1))
      }
      def run(label: String, idx: String): Unit = {
        val (drops, plantedDrops, sec) = minOf2(probe(idx))
        println(f"""{"config":"$label","dir":"$dir","arrival_rows":$nArr,""" +
          f""""drops":$drops,"planted_drops":$plantedDrops,"probe_sec":$sec%.1f}""")
      }

      // flat √n reference
      val flatIdx = Similarity.freshScratch(spark, "graft_cps_flat_")
      Similarity.buildIvfIndexFrom(spark, corpus, flatIdx)
      run("flat", flatIdx)
      IndexMeta.delete(spark, flatIdx)

      // one two-level index, probed at b=1 then b=2 then b=4
      val popIdx = Similarity.freshScratch(spark, "graft_cps_pop_")
      spark.conf.set("graft.semdedup.cellPop", cellPop)
      try {
        val t0 = System.nanoTime()
        Similarity.buildIvfIndexFrom(spark, corpus, popIdx)
        println(f"""{"config":"build pop=$cellPop","dir":"$dir","build_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
        for (b <- Seq(1, 2, 4)) {
          spark.conf.set("graft.semdedup.coarseProbes", b.toString)
          run(s"two-level b=$b", popIdx)
        }
      } finally {
        spark.conf.unset("graft.semdedup.coarseProbes")
        spark.conf.unset("graft.semdedup.cellPop")
      }
      IndexMeta.delete(spark, popIdx)
    }
    spark.stop()
  }
}
