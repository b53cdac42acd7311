package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute and return rows on sf0.001 —
  * the same smoke the driver's t1 gate runs, caught before the round
  * boundary. Also cross-checks the queries/oracle key contract. */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("b29b approx quantiles bracket the exact percentiles") {
    def grab(name: String) = SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val exact = grab("b29_quantiles")
    val approx = grab("b29b_quantiles_approx")
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).foreach { case (e, a) =>
        // at accuracy 10000 over integral quantities the sketch lands
        // within one quantity unit of the exact interpolated value
        assert(math.abs(e - a) <= 1.0, s"$flag: exact $e vs approx $a")
      }
    }
  }

  test("b14 approx distinct brackets the exact count (SURVEY B14)") {
    val approx = SparkEntry.queries("b14_approx_distinct")(spark, dir).head().getLong(0)
    val exact = graft.ops.Relational.table(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact drifts more than 10%")
  }
}
