package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-profiling and compaction utilities a training-data pipeline
  * runs constantly: one-pass column profiles (row/null/distinct counts,
  * typed min/max) and latest-record-per-key changelog compaction.
  *
  * Scale notes:
  *  - `profile` computes every statistic in a SINGLE aggregate pass.
  *    The exact distinct counts make Catalyst plan one Expand (one
  *    input row → n_cols rows) feeding a partially-aggregated shuffle —
  *    still one scan, still map-side combined. `profileApprox` is the
  *    100 TB form: `approx_count_distinct` (HLL, same plan minus the
  *    Expand) — registered as c10_profile_approx, bracket-checked in
  *    ProfileSpec; the oracle checks the exact form.
  *  - `latestByKey` is `max(struct(ts, tie, payload...))` — an ordinary
  *    partial aggregation (map-side combine, tiny shuffle), NOT a
  *    window sort: row_number() over each key would shuffle and sort
  *    the full changelog, while max-struct reduces each partition to
  *    one row per key before the exchange.
  */
object Profile {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** One profile row per requested column: total rows, nulls, exact
    * distinct count, min/max rendered to strings (timestamps formatted,
    * doubles rounded to 4). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** The 100 TB form: `approx_count_distinct` (HyperLogLog++ at 1%
    * relative standard deviation — ~10k registers per column, constant
    * regardless of input size) replaces the exact ndv. The multi-column
    * exact distinct forces Catalyst to Expand every input row n_cols
    * times before the shuffle; the HLL sketch aggregates in ONE pass
    * with no Expand — same single scan, constant-size partial state per
    * column (asserted in ProfileSpec, bracket-checked ±5% vs the exact
    * profile — 5σ headroom over the sketch's 1% rsd). */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), 0.01))

  private def profileWith(df: DataFrame, cols: Seq[String],
      ndv: String => org.apache.spark.sql.Column): DataFrame = {
    // min/max aggregate on the NATIVE type (never lexicographically on a
    // rendered string), then the extremum is rendered for the output row
    def render(c: org.apache.spark.sql.Column, name: String): org.apache.spark.sql.Column = {
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.TimestampType => date_format(c, fmt)
        case org.apache.spark.sql.types.DoubleType    => round(c, 4).cast("string")
        case _                                        => c.cast("string")
      }
    }
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__rows"),
        count(col(c)).as(s"${c}__nonnull"),
        ndv(c).as(s"${c}__ndv"),
        render(min(col(c)), c).as(s"${c}__min"),
        render(max(col(c)), c).as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one row per column
    val stacked = cols.map { c =>
      s"'$c', ${c}__rows, ${c}__rows - ${c}__nonnull, ${c}__ndv, ${c}__min, ${c}__max"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_rows, n_nulls, ndv, min_s, max_s)"))
      .orderBy("col_name")
  }

  /** Changelog compaction: the latest record per key, ties on `ts`
    * broken by the greatest `tie` column. */
  def latestByKey(df: DataFrame, key: String, ts: String, tie: String): DataFrame = {
    val payload = df.columns.filter(c => c != key)
    // struct comparison is lexicographic by field position: ts first,
    // then tie — payload fields after that never decide (tie is unique)
    val ordered = struct((Seq(ts, tie) ++ payload.filterNot(Set(ts, tie))).map(col): _*)
    df.groupBy(col(key)).agg(max(ordered).as("_latest"))
      .select(col(key) +: payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  // --------------------------------------------------- registered queries

  /** C10 — one-pass profile of a 4-type column slice of lineitem. */
  def profileLineitem(spark: SparkSession, dir: String): DataFrame =
    profile(Relational.table(spark, dir, "lineitem"),
      Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"))

  /** C10b — the same profile through the HLL path (rows-only check: the
    * sketch estimate is not SQL-reproducible in DuckDB; ProfileSpec
    * brackets it within ±5% of the exact ndv). */
  def profileLineitemApprox(spark: SparkSession, dir: String): DataFrame =
    profileApprox(Relational.table(spark, dir, "lineitem"),
      Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"))

  /** C11 — latest event per user from the events changelog. */
  def latestEvent(spark: SparkSession, dir: String): DataFrame =
    latestByKey(Relational.table(spark, dir, "events"), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), fmt).as("ts_s"), col("event_type"),
        round(col("value"), 4).as("value"))
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c10_profile" -> (profileLineitem _),
    "c10_profile_approx" -> (profileLineitemApprox _),
    "c11_latest_by_key" -> (latestEvent _))

  val oracleSql: Map[String, String] = Map(
    "c10_profile" ->
      """WITH s AS (
        |  SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
        |    count(*) - count(l_orderkey) AS n_nulls, count(DISTINCT l_orderkey) AS ndv,
        |    cast(min(l_orderkey) AS VARCHAR) AS min_s, cast(max(l_orderkey) AS VARCHAR) AS max_s
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |    count(DISTINCT l_quantity),
        |    cast(round(min(l_quantity), 4) AS VARCHAR), cast(round(max(l_quantity), 4) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |    count(DISTINCT l_shipdate),
        |    strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'), strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
        |  FROM lineitem)
        |SELECT * FROM s ORDER BY col_name""".stripMargin,
    "c11_latest_by_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  event_type, round(value, 4) AS value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)
}
