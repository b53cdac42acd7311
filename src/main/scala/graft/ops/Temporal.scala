package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference's relational surface cannot
  * express directly (SURVEY §2 tier-B extensions): merge-as-of join and
  * point-in-interval range join. Both are built by COMPOSITION of
  * Spark's native operators (option (a) of the custom-operator ladder)
  * because the semantics decompose exactly onto window functions and
  * equi-joins — no custom SparkPlan needed, and everything stays inside
  * whole-stage codegen.
  *
  * Scale notes (100 TB doctrine):
  *  - `asOfJoin` is ONE shuffle by key + a per-partition sort — the same
  *    cost envelope as a sort-merge join. No range/theta join, no
  *    broadcast of either side, no per-probe subquery. Skewed keys cost
  *    what they cost a sort-merge join; salt upstream if a single key's
  *    rows exceed a partition.
  *  - `rangeJoinBins` turns `point BETWEEN lo AND hi` into an EQUI-join
  *    on (key, time-bin) with a residual predicate, so Catalyst plans a
  *    shuffled hash / sort-merge join instead of the
  *    BroadcastNestedLoopJoin a raw inequality join degenerates to.
  *    Interval rows fan out to ceil(span/binWidth)+1 bin rows — pick
  *    binWidth ≈ the typical interval span so the fan-out stays ~2×.
  */
object Temporal {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  // ---------------------------------------------------------------- as-of

  /** Left as-of join: for every probe row, attach the build row with the
    * greatest `buildTs` <= `probeTs` within the same `key` (ties on
    * buildTs broken by greatest `tieBreak`). Unmatched probe rows keep
    * NULL build columns.
    *
    * Implementation: tag + union both sides, then a single
    * `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
    * side, tieBreak ROWS UNBOUNDED PRECEDING)` carries the most recent
    * build payload forward onto each probe row. Build rows sort before
    * probe rows at equal ts, so a build row exactly at probeTs matches
    * (<=, not <). Column names must be disjoint across the two inputs
    * except for `key`. The tie column keeps its native type in the sort
    * (any orderable type — numeric, string, timestamp — works; probe
    * rows carry a typed NULL that sorts first, and their tie value is
    * never consumed anyway).
    */
  def asOfJoin(probe: DataFrame, build: DataFrame, key: String,
               probeTs: String, buildTs: String, tieBreak: String): DataFrame = {
    val probeCols = probe.columns.filter(_ != key)
    val buildCols = build.columns.filter(_ != key)
    val probeType = probe.select(probeCols.map(col): _*).schema
    val buildType = build.select(buildCols.map(col): _*).schema
    val tieType = build.schema(tieBreak).dataType
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tieType),
      s"asOfJoin tie-break column '$tieBreak' has unorderable type $tieType")
    val b = build.select(
      col(key).as("_k"), col(buildTs).as("_ts"), lit(0).as("_side"),
      col(tieBreak).as("_tie"),
      struct(buildCols.map(col): _*).as("_payload"),
      lit(null).cast(probeType).as("_probe"))
    val p = probe.select(
      col(key).as("_k"), col(probeTs).as("_ts"), lit(1).as("_side"),
      lit(null).cast(tieType).as("_tie"),
      lit(null).cast(buildType).as("_payload"),
      struct(probeCols.map(col): _*).as("_probe"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = b.unionByName(p)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = Seq(col("_k").as(key)) ++
      probeCols.map(c => col(s"_probe.$c").as(c)) ++
      buildCols.map(c => col(s"_match.$c").as(c))
    carried.select(out: _*)
  }

  // ------------------------------------------------------------ range join

  /** Point-in-interval join, binned: matches every (point, interval)
    * pair with the same `key` and `lo <= pointTs < hi`. `points` must
    * carry (key, pointTs, ...), `intervals` (key, lo, hi, ...); names
    * otherwise disjoint. `binWidthUs` is the bucketing granularity in
    * microseconds. Emits intervals.* ++ points.*.
    *
    * `joinType` may be "inner" or "left" (intervals are the preserved
    * side). The match itself always runs as an INNER equi-join on
    * (key, bin) — a left join over the exploded bins would emit one
    * null row per unmatched BIN rather than per interval — and "left"
    * re-attaches the unmatched intervals afterwards via a left-anti
    * join on a per-row interval id, so each unmatched interval emits
    * exactly one null-extended row. The anti join shuffles only the
    * (small) interval side's ids.
    */
  def rangeJoinBins(points: DataFrame, intervals: DataFrame, key: String,
                    pointTs: String, lo: String, hi: String,
                    binWidthUs: Long, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"rangeJoinBins supports joinType inner|left, got '$joinType'")
    // per-row id so "left" can recover unmatched intervals even when
    // interval rows are duplicates; purely internal to this operator.
    // "left" evaluates ivTagged in TWO branches (inner join + left-anti),
    // and monotonically_increasing_id is only stable per evaluation — an
    // intervals input downstream of a shuffle could order its partitions
    // differently across re-evaluations, silently dropping or duplicating
    // unmatched intervals. localCheckpoint pins the ids once; the inner
    // path evaluates once and needs no pin.
    val ivTagged0 = intervals.withColumn("_iid", monotonically_increasing_id())
    val ivTagged = if (joinType == "left") ivTagged0.localCheckpoint() else ivTagged0
    // rename the key/bin columns UNIQUELY per side before joining: both
    // sides often share lineage (e.g. two filters of the same events
    // scan), and Spark's self-join dedup re-aliases the right side so a
    // post-join drop(rightDf(col)) silently no-ops on the re-aliased
    // attribute — dropping by a unique NAME is deterministic
    val iv = ivTagged
      .withColumn("_ibin", explode(sequence(
        expr(s"unix_micros($lo) div ${binWidthUs}L"),
        expr(s"unix_micros($hi) div ${binWidthUs}L"))))
      .withColumnRenamed(key, "_ikey")
    val pt = points.withColumnRenamed(key, "_pkey")
      .withColumn("_pbin", expr(s"unix_micros($pointTs) div ${binWidthUs}L"))
    val cond = col("_pkey") === col("_ikey") && col("_pbin") === col("_ibin") &&
      col(pointTs) >= col(lo) && col(pointTs) < col(hi)
    // the point's single bin meets each interval in exactly one of the
    // interval's exploded bins, so the inner equi-join emits no duplicates
    val inner = iv.join(pt, cond, "inner")
      .drop("_ibin", "_pbin", "_pkey")
      .withColumnRenamed("_ikey", key)
    val matched =
      if (joinType == "inner") inner
      else {
        val pointCols = points.schema.fields.filter(_.name != key)
        val unmatched = ivTagged
          .join(inner.select(col("_iid")), Seq("_iid"), "left_anti")
          .select(col("*") +: pointCols.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
        inner.unionByName(unmatched)
      }
    matched.drop("_iid")
  }

  // --------------------------------------------------- registered queries

  /** B24 — as-of join: every click event picks up the same user's most
    * recent purchase at-or-before the click (the classic "state of the
    * account when the event happened" lookup). */
  def asofClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Relational.table(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id"), col("ts").as("purch_ts"))
    asOfJoin(clicks, purch, "user_id", "click_ts", "purch_ts", "purch_id")
      .select(col("click_id"), col("user_id"),
        date_format(col("click_ts"), fmt).as("click_t"),
        coalesce(col("purch_id"), lit(-1L)).as("purch_id"),
        coalesce(date_format(col("purch_ts"), fmt), lit("none")).as("purch_t"))
      .orderBy("click_id")
  }

  /** B25 — range join: per purchase, how many clicks the same user made
    * in the hour leading up to it (attribution-window join). LEFT so
    * purchases with zero preceding clicks still report 0. */
  def rangeClicksBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Relational.table(spark, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("lo"), col("ts").as("hi"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    rangeJoinBins(clicks, purch, "user_id", "cts", "lo", "hi",
      binWidthUs = 3600L * 1000000L, joinType = "left")
      .groupBy(col("purch_id"))
      .agg(count(col("click_id")).as("n_clicks"))
      .orderBy("purch_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b24_asof_join" -> (asofClickPurchase _),
    "b25_range_join" -> (rangeClicksBeforePurchase _))

  /** Oracles work at Spark's microsecond precision: `ts::TIMESTAMP`
    * truncates DuckDB's nanosecond events timestamps exactly the way the
    * read path's `ts div 1000` does. */
  val oracleSql: Map[String, String] = Map(
    "b24_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purch_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |m AS (SELECT c.click_id, c.user_id, c.ts AS click_ts, max(p.ts) AS purch_ts
        |      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
        |      GROUP BY 1, 2, 3),
        |f AS (SELECT m.click_id, m.user_id, m.click_ts, m.purch_ts, max(p.purch_id) AS purch_id
        |      FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.ts = m.purch_ts
        |      GROUP BY 1, 2, 3, 4)
        |SELECT click_id, user_id,
        |  strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_t,
        |  coalesce(purch_id, -1) AS purch_id,
        |  coalesce(strftime(purch_ts, '%Y-%m-%d %H:%M:%S'), 'none') AS purch_t
        |FROM f ORDER BY click_id""".stripMargin,
    "b25_range_join" ->
      """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
        |p AS (SELECT event_id AS purch_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM e WHERE event_type = 'click')
        |SELECT p.purch_id, count(c.click_id) AS n_clicks
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |GROUP BY 1 ORDER BY purch_id""".stripMargin)
}
