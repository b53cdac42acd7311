package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Relational, Similarity, Training}

/**
 * Decade economics of the c33b incremental pretrain composition
 * (round-13 verdict item 4's "Done" clause: per-slice cost flat while
 * batch c33 tracks the corpus). Per scale dir: build the pipeline
 * state on everything below the last `SPARK_GRAFT_SLICE_DOCS`
 * (default 5000) ids, then time the ingest of that FIXED-SIZE arrival
 * slice — the same absolute batch against a 10×-growing state, so a
 * flat per-slice number is the structural claim (Θ(slice +
 * store-probe), no old-corpus re-read), comparable against the batch
 * c33 stage table (BASELINE round-13: 9.4 s at 60k docs → 478.8 s at
 * 6M) which pays the corpus every run.
 *
 * Usage: runMain graft.tools.PretrainIngestDecade <sfDir> [sfDir...]
 */
object PretrainIngestDecade {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sliceDocs = sys.env.getOrElse("SPARK_GRAFT_SLICE_DOCS", "5000").toLong

    def timed[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { dir =>
      val docs = Relational.table(spark, dir, "documents")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      // the requested fixed slice, or a tenth of a corpus too small
      // to spare it (sf0.1 IS 5000 docs — the default slice would
      // otherwise swallow the whole build corpus)
      val effSlice = math.min(sliceDocs, math.max(1L, maxId / 10))
      val cut = maxId - effSlice // ids are dense in the fixtures
      val st = Similarity.freshScratch(spark, "graft_c33b_decade_")
      val tBuild = timed(
        Training.buildPretrainState(spark, docs.filter(col("doc_id") <= cut), st))
      val slice = docs.filter(col("doc_id") > cut).localCheckpoint()
      val nSlice = slice.count()
      val tIngest = timed(Training.ingestPretrainSlice(spark, st, slice, "decade"))
      // c33d takedown economics on the soaked state: tombstone a 1%
      // slice of the shipped ids, then compact — delete should track
      // the tombstone count, compact the AFFECTED slices (both state
      // dirs here), never the corpus
      val tDelete = timed(Training.tombstonePretrainDocs(spark, st,
        docs.filter(col("doc_id") % 100 === 3).select(col("doc_id"))))
      val tCompact = timed(Training.compactPretrainShards(spark, st))
      println(f"""{"metric":"pretrain_ingest_decade","dir":"$dir",""" +
        f""""corpus_docs":${maxId - nSlice + 1}%d,"slice_docs":$nSlice%d,""" +
        f""""build_sec":$tBuild%.1f,"ingest_slice_sec":$tIngest%.1f,""" +
        f""""delete_sec":$tDelete%.2f,"compact_sec":$tCompact%.1f}""")
    }
    spark.stop()
  }
}
