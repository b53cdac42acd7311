package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, Relational, Similarity}

/**
 * Measurement harness for the persisted lexical retrieval index
 * (c43c) — the two numbers the round-13 verdict asked for:
 *
 *   `capsweep <sfDir> [caps]` — the posting-cap ↔ recall trade as a
 *   table: for each cap, fit the lex index at that cap and score the
 *   standard qmod query batch; overlap@10 is against the UNCAPPED run
 *   of the same pipeline (same IVF dense leg), so the number isolates
 *   exactly what the truncation costs. Default caps 100,300,1000,3000
 *   (the verdict's grid).
 *
 *   `decade <sfDir> [batch]` — fit-once/score-arrivals economics: fit
 *   time (the corpus passes, paid once) vs the score time of a FIXED
 *   `batch`-query set (default 64). Across sf0.01/sf1/sf10 the fit
 *   grows with the corpus while the per-batch score stays flat —
 *   c43b's contrast: it re-pays the corpus passes inside every batch.
 *
 * Output: one JSON line per measurement on stdout.
 */
object RetrievalDecade {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-retrieval-decade").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def queryFrames(qIds: DataFrame): (DataFrame, DataFrame) = (
      Relational.table(spark, sfDir, "documents")
        .join(qIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text")).localCheckpoint(),
      Relational.table(spark, sfDir, "embeddings")
        .join(qIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("embedding")).localCheckpoint())

    mode match {
      case "capsweep" =>
        val caps = (if (args.length > 2) args(2) else "100,300,1000,3000")
          .split(",").map(_.trim.toInt).toSeq
        val qIds = Relational.table(spark, sfDir, "embeddings")
          .select(col("vec_id").as("doc_id")).filter(col("doc_id") % 17 === 0)
          .join(Relational.table(spark, sfDir, "documents").select("doc_id"),
            Seq("doc_id"), "left_semi").localCheckpoint()
        val (qd, qv) = queryFrames(qIds)
        val annDir = ensureAnn(spark, sfDir)
        def runClean(cap: Int): (Map[Long, Set[Long]], Double, Double) = {
          spark.conf.set("graft.retrieval.postingCap", cap.toString)
          val lexDir = Similarity.freshScratch(spark, s"graft_capsweep_${cap}_")
          val (_, fitSec) = timed(
            Pipeline.fitLexIndex(Relational.table(spark, sfDir, "documents"), lexDir))
          val (rows, scoreSec) = timed(
            Pipeline.hybridScoreIndexed(spark, lexDir, annDir, qd, qv)
              .select("query_id", "doc_id").collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSeq)
          (rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap, fitSec, scoreSec)
        }
        val (exact, exactFit, exactScore) = runClean(Int.MaxValue)
        System.err.println(f"[capsweep] uncapped fit=$exactFit%.1f score=$exactScore%.1f queries=${exact.size}")
        caps.foreach { cap =>
          val (got, fitSec, scoreSec) = runClean(cap)
          val ov = exact.keys.toSeq.map { q =>
            val e = exact(q)
            e.intersect(got.getOrElse(q, Set.empty)).size.toDouble / math.max(1, e.size)
          }
          val mean = ov.sum / ov.size
          println(f"""{"mode":"capsweep","dir":"$sfDir","cap":$cap,"overlap10_vs_uncapped":$mean%.4f,"fit_sec":$fitSec%.1f,"score_sec":$scoreSec%.1f,"n_queries":${ov.size}}""")
        }

      case "decade" =>
        val batch = if (args.length > 2) args(2).toInt else 64
        // FIXED-size batch across corpus scales: the lowest `batch`
        // doc-backed embedding ids — deterministic, same work class at
        // every SF, so the score column isolates per-batch cost
        val qIds = Relational.table(spark, sfDir, "embeddings")
          .select(col("vec_id").as("doc_id"))
          .join(Relational.table(spark, sfDir, "documents").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .orderBy("doc_id").limit(batch).localCheckpoint()
        val (qd, qv) = queryFrames(qIds)
        val annDir = ensureAnn(spark, sfDir)
        val lexDir = Similarity.freshScratch(spark, "graft_lexdecade_")
        val (_, fitSec) = timed(
          Pipeline.fitLexIndex(Relational.table(spark, sfDir, "documents"), lexDir))
        def score(): Double = timed(
          Pipeline.hybridScoreIndexed(spark, lexDir, annDir, qd, qv)
            .write.mode("overwrite").format("noop").save())._2
        val s1 = score(); val s2 = score()
        println(f"""{"mode":"decade","dir":"$sfDir","batch":$batch,"fit_sec":$fitSec%.1f,"score_sec_run1":$s1%.1f,"score_sec_run2":$s2%.1f}""")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }

  /** The shared persisted IVF index for the dense leg (build once per
    * corpus via the same fingerprint cache the registry uses). */
  private def ensureAnn(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    graft.ops.IndexMeta.ensureDerived(spark, s"$sfDir/embeddings.parquet",
      s"graft_ivf_index_${key}_")(
      p => graft.ops.IndexMeta.exists(spark, s"$p/centroids/_SUCCESS"))(
      Similarity.buildIvfIndex(spark, sfDir, _))
  }
}
