package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ProfileSpec extends AnyFunSuite with SparkTestSession {

  test("profile: typed min/max (not lexicographic), null + ndv counts") {
    import spark.implicits._
    // 2.0 vs 10.0 catches a min-of-rendered-string regression ("10.0" < "2.0")
    val df = Seq(
      (Some(10.0), Some("b"), Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
      (Some(2.0), None, Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (None, Some("a"), None),
      (Some(2.0), Some("a"), Some(Timestamp.valueOf("2024-01-03 00:00:00")))
    ).toDF("d", "s", "t")
    val rows = Profile.profile(df, Seq("d", "s", "t")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(rows("d") === ((4L, 1L, 2L, "2.0", "10.0")))
    assert(rows("s") === ((4L, 1L, 2L, "a", "b")))
    assert(rows("t") === ((4L, 1L, 3L, "2024-01-01 00:00:00", "2024-01-03 00:00:00")))
  }

  test("profileApprox: HLL ndv within ±5% of exact; no Expand in the plan") {
    val exact = Profile.profileLineitem(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = Profile.profileLineitemApprox(spark, "/root/testdata/sf0.01")
    val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, ndv) =>
      val a = approx(c)
      assert(math.abs(a - ndv) <= math.max(1L, (ndv * 0.05).toLong),
        s"$c: approx ndv $a vs exact $ndv outside 5%")
    }
    // all other stats are exact and identical between the two paths
    val e = Profile.profileLineitem(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))).toMap
    val ap = approxDf.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))).toMap
    assert(e === ap)
    // the HLL sketch removes the multi-distinct Expand: one pass, no
    // n_cols-way row multiplication before the shuffle
    val pExact = Profile.profileLineitem(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    val pApprox = approxDf.queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"), "exact multi-distinct should plan an Expand")
    assert(!pApprox.contains("Expand"), s"HLL profile must not Expand:\n$pApprox")
  }

  test("latestByKey: max ts wins, ties broken by greatest tie column") {
    import spark.implicits._
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 10L, "old"),
      (1L, Timestamp.valueOf("2024-01-01 00:00:09"), 11L, "tie_lo"),
      (1L, Timestamp.valueOf("2024-01-01 00:00:09"), 12L, "tie_hi"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:05"), 13L, "only")
    ).toDF("k", "ts", "id", "tag")
    val got = Profile.latestByKey(df, "k", "ts", "id")
      .select("k", "id", "tag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(1L -> ((12L, "tie_hi")), 2L -> ((13L, "only"))))
  }

  test("latestByKey: partial aggregation, no window sort in the plan") {
    val ev = Relational.table(spark, "/root/testdata/sf0.001", "events")
    val p = Profile.latestByKey(ev, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"compaction must not plan a window:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2
      || p.contains("partial_max") || p.contains("partial max"),
      s"no map-side combine before the exchange:\n$p")
  }
}
