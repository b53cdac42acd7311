package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, Similarity}

/**
 * Decade economics of the lexical-index maintenance legs (round-13
 * verdict item 1's "Done" clause): per scale dir, time
 *   - a FULL refit on 100% of the corpus (what an arrival used to
 *     cost before c43d),
 *   - the incremental path: fit on 90%, then `appendLexIndex` of the
 *     held-out 10% (the arrival batch),
 *   - `deleteLexDocs` + `compactLexIndex` of a 1% takedown slice
 *     (the c43e leg),
 * and report the fit's pinned-intermediate high-water mark (the tf
 * posting set `Scale.pin`s for its two consumers — the disk obligation
 * BASELINE documents per round-13 verdict item 6): RDD storage bytes
 * (memory + disk tiers) right after the fit returns.
 *
 * Expected shape: refit tracks the corpus, append tracks the batch —
 * the c41c/c27/ANN-append doctrine on the lexical side.
 *
 * Usage: runMain graft.tools.LexIngestDecade <sfDir> [sfDir...]
 */
object LexIngestDecade {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def pinnedBytes: (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    // Discharge every resident pin (Scale.pin's localCheckpoint blocks
    // persist until GC) BEFORE each timed/measured phase: without this
    // the census for dir N includes dir N-1's undischarged blocks, and
    // a prior phase's resident blocks contend for memory/disk during
    // the later timed phases — contaminated economics either way.
    def discharge(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc() // ContextCleaner reclaims checkpoint block refs lazily
    }

    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      // full refit (the pre-c43d cost of every arrival)
      discharge()
      val full = Similarity.freshScratch(spark, "graft_lexdec_full_")
      val (_, tRefit) = timed(Pipeline.fitLexIndex(docs, full))
      // read the mark BEFORE discharging — these are the fit's OWN
      // blocks and nothing else's (the discharge above zeroed the slate)
      val (memHw, diskHw) = pinnedBytes
      // incremental: fit 90%, append the 10% arrival batch
      discharge()
      val inc = Similarity.freshScratch(spark, "graft_lexdec_inc_")
      val (_, tFit90) = timed(
        Pipeline.fitLexIndex(docs.filter(col("doc_id") % 10 =!= 7), inc))
      discharge()
      val (_, tAppend) = timed(
        Pipeline.appendLexIndex(spark, inc, docs.filter(col("doc_id") % 10 === 7),
          Some("decade")))
      // takedown: tombstone 1%, compact
      discharge()
      val (_, tDelete) = timed(
        Pipeline.deleteLexDocs(spark, inc, docs.filter(col("doc_id") % 100 === 3)
          .select(col("doc_id"))))
      val (_, tCompact) = timed(Pipeline.compactLexIndex(spark, inc))
      // fixed-size arrival (the daily-crawl shape): the SAME 1000-doc
      // batch appended into a 10×-growing index — the flat-cost claim
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      // 1000 docs, or a tenth of a corpus too small to spare them
      val fixN = math.min(1000L, math.max(1L, maxId / 10))
      val fix = Similarity.freshScratch(spark, "graft_lexdec_fix_")
      discharge()
      Pipeline.fitLexIndex(docs.filter(col("doc_id") <= maxId - fixN), fix)
      discharge()
      val (_, tFixed) = timed(
        Pipeline.appendLexIndex(spark, fix, docs.filter(col("doc_id") > maxId - fixN),
          Some("fixed1k")))
      println(f"""{"metric":"lex_ingest_decade","dir":"$dir","docs":$n,""" +
        f""""refit_sec":$tRefit%.1f,"fit90_sec":$tFit90%.1f,""" +
        f""""append10_sec":$tAppend%.1f,"append_fixed1k_sec":$tFixed%.1f,""" +
        f""""delete_sec":$tDelete%.2f,"compact_sec":$tCompact%.1f,""" +
        f""""fit_pinned_mem_mb":${memHw / 1048576}%d,""" +
        f""""fit_pinned_disk_mb":${diskHw / 1048576}%d}""")
    }
    spark.stop()
  }
}
