package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics and plan-shape checks for the temporal joins. The crafted
  * frames pin exactly the edge cases the sf-scale oracle can't isolate:
  * at-or-before inclusivity, build-side ties, unmatched probes, and the
  * half-open [lo, hi) range boundaries. */
class TemporalSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val purchases = {
    import spark.implicits._
    Seq(
      (100L, 1L, ts("2024-01-01 00:00:05")),
      (101L, 1L, ts("2024-01-01 00:00:10")),
      (102L, 1L, ts("2024-01-01 00:00:10")), // tie on ts with 101
      (103L, 1L, ts("2024-01-01 00:00:20")),
      (104L, 2L, ts("2024-01-01 00:00:07"))
    ).toDF("purch_id", "user_id", "purch_ts")
  }

  private lazy val clicks = {
    import spark.implicits._
    Seq(
      (1L, 1L, ts("2024-01-01 00:00:04")), // before any purchase → null
      (2L, 1L, ts("2024-01-01 00:00:10")), // equal ts counts; tie → max id
      (3L, 1L, ts("2024-01-01 00:00:15")), // between 10 and 20 → 102
      (4L, 1L, ts("2024-01-01 00:00:25")), // after all → 103
      (5L, 3L, ts("2024-01-01 00:00:30"))  // user with no purchases → null
    ).toDF("click_id", "user_id", "click_ts")
  }

  test("asOfJoin: at-or-before, tie-break by max id, unmatched → null") {
    val got = Temporal
      .asOfJoin(clicks, purchases, "user_id", "click_ts", "purch_ts", "purch_id")
      .select(col("click_id"), col("purch_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> -1L, 2L -> 102L, 3L -> 102L, 4L -> 103L, 5L -> -1L))
  }

  test("asOfJoin: single shuffle by key, no join operator in the plan") {
    val p = Temporal
      .asOfJoin(clicks, purchases, "user_id", "click_ts", "purch_ts", "purch_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$p")
  }

  test("rangeJoinBins: half-open [lo, hi), keyed, no duplicate pairs") {
    import spark.implicits._
    // interval [00:00:10, 00:01:10) for user 1 with binWidth = 30s so the
    // interval spans 3 bins; points at lo (in), hi (out), mid (in),
    // below lo (out), other user (out)
    val iv = Seq((10L, 1L, ts("2024-01-01 00:00:10"), ts("2024-01-01 00:01:10")))
      .toDF("iv_id", "user_id", "lo", "hi")
    val pts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10")), // == lo → in
      (2L, 1L, ts("2024-01-01 00:01:10")), // == hi → out
      (3L, 1L, ts("2024-01-01 00:00:40")), // mid → in
      (4L, 1L, ts("2024-01-01 00:00:09")), // below → out
      (5L, 2L, ts("2024-01-01 00:00:40"))  // other key → out
    ).toDF("pt_id", "user_id", "pts")
    val got = Temporal
      .rangeJoinBins(pts, iv, "user_id", "pts", "lo", "hi", binWidthUs = 30L * 1000000L)
      .select("pt_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L))
  }

  test("rangeJoinBins left: one null row per unmatched interval, none for matched") {
    import spark.implicits._
    // interval 10 matches two points; interval 11 spans THREE bins and
    // matches nothing — it must emit exactly ONE null-extended row, not
    // one per bin (the round-2 advisory bug); interval 12 matches one
    // point in its middle bin and must emit NO null rows even though its
    // first/last bins are empty
    val iv = Seq(
      (10L, 1L, ts("2024-01-01 00:00:10"), ts("2024-01-01 00:01:10")),
      (11L, 2L, ts("2024-01-01 02:00:00"), ts("2024-01-01 02:01:30")),
      (12L, 1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:01:30"))
    ).toDF("iv_id", "user_id", "lo", "hi")
    val pts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10")),
      (3L, 1L, ts("2024-01-01 00:00:40")),
      (6L, 1L, ts("2024-01-01 03:00:45"))
    ).toDF("pt_id", "user_id", "pts")
    val got = Temporal
      .rangeJoinBins(pts, iv, "user_id", "pts", "lo", "hi",
        binWidthUs = 30L * 1000000L, joinType = "left")
      .select(col("iv_id"), col("pt_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq.sorted
    assert(got === Seq(10L -> 1L, 10L -> 3L, 11L -> -1L, 12L -> 6L))
  }

  test("asOfJoin: non-numeric (string) tie-break orders natively, no silent nulls") {
    import spark.implicits._
    val build = Seq(
      ("a", 1L, ts("2024-01-01 00:00:10")),
      ("c", 1L, ts("2024-01-01 00:00:10")), // tie on ts → max string wins
      ("b", 1L, ts("2024-01-01 00:00:10"))
    ).toDF("tag", "user_id", "bts")
    val probe = Seq((1L, 1L, ts("2024-01-01 00:00:15"))).toDF("pid", "user_id", "cts")
    val got = Temporal.asOfJoin(probe, build, "user_id", "cts", "bts", "tag")
      .select("tag").as[String].collect().toSeq
    assert(got === Seq("c"))
  }

  test("rangeJoinBins: plans an equi-join, never a nested-loop/cartesian") {
    val ev = Relational.table(spark, "/root/testdata/sf0.001", "events")
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("lo"), col("ts").as("hi"))
    val pts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p = Temporal
      .rangeJoinBins(pts, iv, "user_id", "cts", "lo", "hi", 3600L * 1000000L, "left")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a non-equi plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no hash-equi join in:\n$p")
  }
}
