package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.OrcIO
import graft.ops.{Curation, Multimodal, Pipeline, Profile, Relational, Scale, Similarity, Temporal, Training}

/** Driver contract — see /root/repo/SURVEY.md §2 for the op inventory.
  * `queries` keys are SURVEY op ids; `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible op (§2.4 determinism rules:
  * total order, exact scaled-long money sums, 4-decimal rounding,
  * column-name parity with the Spark result). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroup(spark, "/root/testdata/sf0.001")

  // ---- Tier A queries (the reference's own surface, over testdata) ----

  /** A2/A1: lineitem → ORC write → ORC read → aggregate; proves the
    * encode/decode roundtrip at dataset scale (oracle reads the same
    * parquet directly — DuckDB cannot read ORC). */
  private def a2Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_a2_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // size write parallelism by data volume (~64MB of RAW data per
    // partition), not core count: repartitioning a small single-row-group
    // source costs more in shuffle than the parallel write saves
    // (measured), while a large source arrives many-partitioned and needs
    // no shuffle at all. sizeInBytes is the COMPRESSED file size — scale
    // by ~8× (zstd parquet ratio) or the write itself becomes the
    // bottleneck: at sf1 the unscaled estimate packed a 6M-row ORC encode
    // into one task (56 s single-threaded vs ~8 s parallel).
    val src = Relational.table(spark, dir, "lineitem")
    val sizeBytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    // `graft.io.compressionFactor`: raw-bytes-per-compressed-byte of the
    // SOURCE files (sizeInBytes is the compressed file size). Default 8
    // is the measured zstd-parquet ratio on this data (BASELINE.md); a
    // differently-compressed source (snappy ~4, uncompressed 1) should
    // set it so write parallelism tracks actual raw volume. Shared
    // accessor with Relational.dimHint (round-13 advice).
    val target = (sizeBytes.toDouble * Relational.compressionFactor(spark)
      / (64L << 20)).toLong.toInt.max(1)
      .min(spark.sparkContext.defaultParallelism)
    val sized = if (target > src.rdd.getNumPartitions) src.repartition(target) else src
    OrcIO.writeOrc(sized, path, OrcIO.WriteOptions(overwrite = true))
    // read back with the schema we just wrote (nullable-widened to what
    // inference would return): skips the per-run footer-inference job
    OrcIO.readOrcAs(spark, path, sized.schema)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("l_quantity") * 10000, 0).cast("long")) / 10000.0, 4).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** A10: column stats — count includes NULLs, sum/min/max exclude. */
  private def a10Stats(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "lineitem")
      .agg(count(lit(1)).as("cnt"),
        round(sum(round(col("l_quantity") * 10000, 0).cast("long")) / 10000.0, 4).as("sum_q"),
        round(min(col("l_quantity")), 4).as("min_q"),
        round(max(col("l_quantity")), 4).as("max_q"))

  /** A8: lenient cell-granular cast — failures become NULL, never job
    * failures (try_cast semantics = orca's write-value doctrine). */
  private def a8Lenient(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "events")
      .select(col("event_id"),
        expr("try_cast(event_type AS int)").as("bad_int"),
        expr("try_cast(cast(round(value, 4) AS string) AS double)").as("good_double"))
      .orderBy("event_id")

  /** A7: distributed schema inference over a row RDD (non-SQL op —
    * rows-only check; exactness is unit-tested in typedef specs). The
    * input stays a file-backed RDD end to end — rows map to the orca-style
    * Map form on executors and feed the per-partition-fold + tree-merge
    * inference without ever touching the driver. */
  private def a7Infer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rdd = Relational.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .rdd
      .map(r => Map("doc_id" -> r.getLong(0), "lang" -> r.getString(1), "n_chars" -> r.getLong(2)): Any)
    val schema = OrcIO.inferSchema(rdd).get
    Seq(schema.toDDL).toDF("inferred_ddl")
  }

  private val tierA: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a2_roundtrip" -> (a2Roundtrip _),
    "a7_infer" -> (a7Infer _),
    "a8_lenient" -> (a8Lenient _),
    "a10_stats" -> (a10Stats _))

  private val tierAOracle: Map[String, String] = Map(
    // a7's DDL self-oracle: orca's value-based integer narrowing
    // (core.clj:178-189 — the VALUE 10 is a tinyint regardless of its
    // JVM class) merged over rows is equivalent, for integers, to
    // narrowing the global min/max — which DuckDB recomputes from the
    // same parquet. A narrowing regression (or a field-order change in
    // struct inference) now fails the hash gate instead of hiding in
    // the rows-only bucket. Ranges are the Hive lattice's, matching
    // Infer.scala; lang is always a string.
    "a7_infer" ->
      """SELECT concat(
        |  'doc_id ',
        |  CASE WHEN min(doc_id) >= -128 AND max(doc_id) <= 127 THEN 'TINYINT'
        |       WHEN min(doc_id) >= -32768 AND max(doc_id) <= 32767 THEN 'SMALLINT'
        |       WHEN min(doc_id) >= -2147483648 AND max(doc_id) <= 2147483647 THEN 'INT'
        |       ELSE 'BIGINT' END,
        |  ',lang STRING,n_chars ',
        |  CASE WHEN min(n_chars) >= -128 AND max(n_chars) <= 127 THEN 'TINYINT'
        |       WHEN min(n_chars) >= -32768 AND max(n_chars) <= 32767 THEN 'SMALLINT'
        |       WHEN min(n_chars) >= -2147483648 AND max(n_chars) <= 2147483647 THEN 'INT'
        |       ELSE 'BIGINT' END) AS inferred_ddl
        |FROM documents""".stripMargin,
    "a2_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(cast(round(l_quantity * 10000, 0) as bigint)) / 10000.0, 4) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a8_lenient" ->
      """SELECT event_id, TRY_CAST(event_type AS INT) AS bad_int,
        |  TRY_CAST(CAST(round(value, 4) AS VARCHAR) AS DOUBLE) AS good_double
        |FROM events ORDER BY event_id""".stripMargin,
    "a10_stats" ->
      """SELECT count(*) AS cnt,
        |  round(sum(cast(round(l_quantity * 10000, 0) as bigint)) / 10000.0, 4) AS sum_q,
        |  round(min(l_quantity), 4) AS min_q, round(max(l_quantity), 4) AS max_q
        |FROM lineitem""".stripMargin)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    tierA ++ Relational.queries ++ Pipeline.queries ++ Similarity.queries ++
      Multimodal.queries ++ Scale.queries ++ Temporal.queries ++ Profile.queries ++
      Curation.queries ++ Training.queries ++
      graft.streaming.Sessionize.queries ++ graft.sources.JsonInfer.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    tierAOracle ++ Relational.oracleSql ++ Pipeline.oracleSql ++ Similarity.oracleSql ++
      Scale.oracleSql ++ Multimodal.oracleSql ++ Temporal.oracleSql ++ Profile.oracleSql ++
      Curation.oracleSql ++ Training.oracleSql ++
      graft.streaming.Sessionize.oracleSql ++ graft.sources.JsonInfer.oracleSql
}
