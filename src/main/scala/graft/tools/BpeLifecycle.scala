package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Relational, Similarity, Training}

/**
 * Fit-once/encode-arrivals economics for the learned BPE tokenizer
 * (`c32`, BASELINE.md round-8). Per dir:
 *
 *   1. fit the merge table on the 95% slice (timed — the one-time
 *      cost: one vocab-sized shuffle + the driver merge loop over the
 *      bounded word dictionary)
 *   2. encode the held-out 5% arrival batch through the persisted
 *      table (timed, min-of-2 warm — the per-batch deployment cost:
 *      a map-only scan with the codec plan-shipped)
 *   3. the cost a naive per-batch pipeline pays: refit + encode
 *
 * The structural claim the numbers check: encode scales with the
 * BATCH, fit with the corpus VOCABULARY (not its row count) — so the
 * fit/encode ratio must widen with corpus size, and encode per-row
 * cost must hold flat across decades.
 *
 * Usage: runMain graft.tools.BpeLifecycle <sfDir> [sfDir...]
 */
object BpeLifecycle {
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
    val merges = spark.conf.getOption("graft.bpe.merges").map(_.toInt).getOrElse(200)
    val maxWords = spark.conf.getOption("graft.bpe.maxWords").map(_.toInt).getOrElse(65536)
    args.foreach { dir =>
      val model = Similarity.freshScratch(spark, "graft_bpe_rehearsal_")
      val docs = Relational.table(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 20 =!= 7)
      val arrivals = docs.filter(col("doc_id") % 20 === 7)
      val n = docs.count()
      val (_, fitSec) = sec {
        Training.fitBpe(spark, corpus, model, merges, maxWords)
      }
      def encodeOnce() = Training.tokenizeBpe(spark, arrivals, model)
        .agg(count(lit(1)), sum(col("n_tokens"))).head()
      val (r1, e1) = sec(encodeOnce())
      val (_, e2) = sec(encodeOnce())
      val refitModel = Similarity.freshScratch(spark, "graft_bpe_refit_")
      val (_, refitSec) = sec {
        Training.fitBpe(spark, corpus, refitModel, merges, maxWords)
        Training.tokenizeBpe(spark, arrivals, refitModel)
          .agg(count(lit(1))).head()
      }
      println(f"""{"dir":"$dir","docs":$n,"fit_once_sec":$fitSec%.1f,""" +
        f""""encode_batch_sec":${math.min(e1, e2)}%.1f,""" +
        f""""encoded_rows":${r1.getLong(0)},"encoded_tokens":${r1.getLong(1)},""" +
        f""""refit_and_encode_sec":$refitSec%.1f}""")
      IndexMeta.delete(spark, model)
      IndexMeta.delete(spark, refitModel)
    }
    spark.stop()
  }
}
