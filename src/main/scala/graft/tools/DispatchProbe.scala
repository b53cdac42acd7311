package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Similarity}

/**
 * Measures BOTH sides of the round-8 incremental-probe dispatch
 * (`graft.probe.broadcastMaxRows`) on the SAME arrival batch at scale:
 * the sub-threshold broadcast plan (arrival keys broadcast, corpus
 * side map-only) vs the over-threshold shuffle_hash plan (arrival side
 * as the hash build, corpus pays one exchange). DispatchSpec pins the
 * two plans hash-identical at sf0.001; this rehearsal prices the
 * switch at decade scale for the two stores that use it —
 *
 *   1. the persistent near-dup store probe (c27 shape: 20% of the
 *      documents table arrives against an 80% corpus store), and
 *   2. incremental semantic dedup (c2_dedup_semantic_inc shape: 5%
 *      of embeddings + 1000 planted twins arrive against a 95% index).
 *
 * Usage: runMain graft.tools.DispatchProbe <sfDir> [sfDir...]
 * One JSON line per (store, dir); timings are min-of-2 warm runs.
 * SPARK_GRAFT_DISPATCH_STORES=neardup|seminc limits to one store (the
 * embeddings-only decade dirs carry 10× the document rows per vector,
 * so the two stores peak at different dirs).
 */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v,k=v" — session confs for knob rehearsals
    // (e.g. graft.semdedup.cellPop to price the two-level index probe)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    def minOf2(body: => Long): (Long, Double) = {
      def once() = { val t0 = System.nanoTime(); val r = body
        (r, (System.nanoTime() - t0) / 1e9) }
      val (r, t1) = once(); val (_, t2) = once(); (r, math.min(t1, t2))
    }
    // the dispatch reads the conf per call, so flipping it between
    // runs re-plans the SAME probe both ways
    def withThreshold[A](rows: Long)(body: => A): A = {
      spark.conf.set("graft.probe.broadcastMaxRows", rows.toString)
      try body finally spark.conf.unset("graft.probe.broadcastMaxRows")
    }

    val stores = sys.env.getOrElse("SPARK_GRAFT_DISPATCH_STORES", "neardup,seminc")
      .split(",").map(_.trim).toSet
    args.foreach { dir =>
      // --- near-dup store (c27 probe shape) ---
      if (stores("neardup")) locally {
        val idx = Similarity.freshScratch(spark, "graft_dispatch_nd_")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val corpus = docs.filter(col("doc_id") % 5 =!= 3)
        val arr = docs.filter(col("doc_id") % 5 === 3)
        val nArr = arr.count()
        Similarity.buildNearDupIndex(spark, corpus, idx)
        val arrSh = Similarity.hashedShingles(spark, arr).localCheckpoint()
        def probe() = Similarity.probeNearDupIndex(spark, idx, arrSh)
          .agg(count(lit(1))).head().getLong(0)
        val (pairsB, tBcast) = withThreshold(Long.MaxValue)(minOf2(probe()))
        val (pairsS, tShuf) = withThreshold(0L)(minOf2(probe()))
        require(pairsB == pairsS,
          s"dispatch paths disagree: broadcast=$pairsB shuffle=$pairsS")
        println(f"""{"store":"neardup","dir":"$dir","arrival_rows":$nArr,""" +
          f""""pairs":$pairsB,"broadcast_sec":$tBcast%.1f,""" +
          f""""shuffle_hash_sec":$tShuf%.1f}""")
        IndexMeta.delete(spark, idx)
      }
      // --- IVF index (semantic-inc probe shape) ---
      if (stores("seminc")) locally {
        val idx = Similarity.freshScratch(spark, "graft_dispatch_si_")
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val corpus = e.filter(col("vec_id") % 20 =!= 7)
        val planted = corpus.orderBy("vec_id").limit(1000).select(
          (col("vec_id") + 10000000L).as("vec_id"),
          expr("""zip_with(embedding, sequence(0, size(embedding) - 1),
            |(x, d) -> cast(x + IF((xxhash64(concat('jit_', cast(d as string), '_', cast(vec_id as string))) & 1) = 1, 0.001D, -0.001D) as float))"""
            .stripMargin).as("embedding"))
        val batch = e.filter(col("vec_id") % 20 === 7).unionByName(planted)
        val nArr = batch.count()
        Similarity.buildIvfIndexFrom(spark, corpus, idx)
        def probe() = Similarity.dedupSemanticIncremental(spark, idx, batch)
          .agg(count(lit(1))).head().getLong(0)
        val (dropsB, tBcast) = withThreshold(Long.MaxValue)(minOf2(probe()))
        val (dropsS, tShuf) = withThreshold(0L)(minOf2(probe()))
        require(dropsB == dropsS,
          s"dispatch paths disagree: broadcast=$dropsB shuffle=$dropsS")
        println(f"""{"store":"seminc","dir":"$dir","arrival_rows":$nArr,""" +
          f""""drops":$dropsB,"broadcast_sec":$tBcast%.1f,""" +
          f""""shuffle_hash_sec":$tShuf%.1f}""")
        IndexMeta.delete(spark, idx)
      }
    }
    spark.stop()
  }
}
