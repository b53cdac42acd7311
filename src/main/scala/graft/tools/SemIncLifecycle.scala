package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Similarity}

/**
 * Fit-once/score-arrivals rehearsal for incremental semantic dedup
 * (`c2_dedup_semantic_inc`) — the NearDupLifecycle table for
 * embeddings: build the IVF index on a 95% slice once, then time
 * deduping the held-out 5% ARRIVAL batch against it, vs the cost every
 * batch run pays today (`c2_dedup_semantic` re-clustering the union).
 *
 * Usage: runMain graft.tools.SemIncLifecycle <sfDir> [sfDir...]
 * One JSON line per dir; probe timings are min-of-2 warm runs.
 */
object SemIncLifecycle {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sec[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    args.foreach { dir =>
      val idx = Similarity.freshScratch(spark, "graft_seminc_rehearsal_")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val corpus = e.filter(col("vec_id") % 20 =!= 7)
      // MakeScale's re-keying keeps all of a vector's clique twins in
      // one mod-20 class, so the bare held-out batch has no corpus
      // twin — plant jittered copies of 1000 corpus vectors (fresh ids)
      // so the rehearsal also proves the probe FINDS at scale
      val planted = corpus.orderBy("vec_id").limit(1000).select(
        (col("vec_id") + 10000000L).as("vec_id"),
        expr("""zip_with(embedding, sequence(0, size(embedding) - 1),
          |(x, d) -> cast(x + IF((xxhash64(concat('jit_', cast(d as string), '_', cast(vec_id as string))) & 1) = 1, 0.001D, -0.001D) as float))"""
          .stripMargin).as("embedding"))
      val batch = e.filter(col("vec_id") % 20 === 7).unionByName(planted)
      val n = e.count()
      val (_, buildSec) = sec {
        Similarity.buildIvfIndexFrom(spark, corpus, idx)
      }
      def probeOnce() = Similarity.dedupSemanticIncremental(spark, idx, batch)
        .agg(count(lit(1))).head().getLong(0)
      val (drops1, p1) = sec(probeOnce())
      val (_, p2) = sec(probeOnce())
      // the cost every batch pays WITHOUT the index: the batch op over
      // the full union (re-cluster + re-sign everything)
      val (_, fullSec) = sec {
        Similarity.queries("c2_dedup_semantic")(spark, dir)
          .agg(count(lit(1))).head().getLong(0)
      }
      println(f"""{"dir":"$dir","n":$n,"build_once_sec":$buildSec%.1f,""" +
        f""""probe_batch_sec":${math.min(p1, p2)}%.1f,"batch_drops":$drops1,""" +
        f""""full_rerun_sec":$fullSec%.1f}""")
      IndexMeta.delete(spark, idx)
    }
    spark.stop()
  }
}
