package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Pipeline, Relational, Similarity}

/**
 * Fit-once/score-arrivals economics for the persisted quality
 * classifier (`c29b`, BASELINE.md round-8): the c24b/LM table's shape
 * applied to the learned filter. Per dir:
 *
 *   1. fit the LBFGS model on the 95% slice, persist (timed — paid once)
 *   2. score the held-out 5% arrival batch from the persisted weights
 *      (timed, min-of-2 warm — the per-batch deployment cost)
 *   3. the cost every batch pays WITHOUT persistence: refit + score
 *      (timed — what c29 does per call)
 *
 * Usage: runMain graft.tools.ClassifierLifecycle <sfDir> [sfDir...]
 */
object ClassifierLifecycle {
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
      val model = Similarity.freshScratch(spark, "graft_c29b_rehearsal_")
      val docs = Relational.table(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 20 =!= 7)
      val arrivals = docs.filter(col("doc_id") % 20 === 7)
      val n = docs.count()
      val (_, fitSec) = sec {
        Pipeline.fitQualityClassifier(spark, corpus, model)
      }
      def scoreOnce() = Pipeline.scoreWithClassifier(spark, arrivals, model)
        .agg(count(lit(1))).head().getLong(0)
      val (rows1, s1) = sec(scoreOnce())
      val (_, s2) = sec(scoreOnce())
      // the no-persistence cost: refit on the corpus, then score
      val refitModel = Similarity.freshScratch(spark, "graft_c29b_refit_")
      val (_, refitSec) = sec {
        Pipeline.fitQualityClassifier(spark, corpus, refitModel)
        scoreOnce()
      }
      println(f"""{"dir":"$dir","docs":$n,"fit_once_sec":$fitSec%.1f,""" +
        f""""score_batch_sec":${math.min(s1, s2)}%.1f,"scored_rows":$rows1,""" +
        f""""refit_and_score_sec":$refitSec%.1f}""")
      IndexMeta.delete(spark, model)
      IndexMeta.delete(spark, refitModel)
    }
    spark.stop()
  }
}
