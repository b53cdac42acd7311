package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CosineSimilaritySpec extends AnyFunSuite with SparkTestSession {

  private def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(expr("graft_cosine(a, b)")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("identical vectors → 1.0; orthogonal → 0.0; opposite → -1.0") {
    assert(math.abs(cos(Seq(1, 2, 3), Seq(1, 2, 3)).get - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1, 0), Seq(0, 1)).get) < 1e-12)
    assert(math.abs(cos(Seq(1, 0), Seq(-1, 0)).get + 1.0) < 1e-12)
  }

  test("zero vector → NULL; null input → NULL") {
    assert(cos(Seq(0, 0), Seq(1, 2)) == None)
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Double]], Some(Seq(1.0, 2.0)))).toDF("a", "b")
    assert(df.select(expr("graft_cosine(a, b)")).head().isNullAt(0))
  }

  test("float arrays accepted; matches double fold to the last ulp") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(0.1f, 0.2f, 0.7f), Seq(0.5f, 0.4f, 0.1f))).toDF("a", "b")
    val native = df.select(expr("graft_cosine(a, b)")).head().getDouble(0)
    val fold = df.select(expr(
      """aggregate(zip_with(a, b, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v)
        | / (sqrt(aggregate(zip_with(a, a, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v))
        |  * sqrt(aggregate(zip_with(b, b, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v)))""".stripMargin))
      .head().getDouble(0)
    assert(native == fold, s"native $native != interpreted fold $fold")
  }

  test("type check rejects non-array inputs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    assertThrows[Exception](df.select(expr("graft_cosine(a, b)")).head())
  }
}
