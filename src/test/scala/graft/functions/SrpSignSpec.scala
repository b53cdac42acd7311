package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SrpSignSpec extends AnyFunSuite with SparkTestSession {

  private def sign(vecs: Seq[Seq[Float]], words: Int = 4): Seq[Seq[Long]] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    vecs.toDF("embedding")
      .select(expr(s"graft_srp_sign(embedding, 42L, $words)").as("sigs"))
      .collect().toSeq.map(_.getSeq[Long](0))
  }

  test("deterministic, word count honored, and partitioning-independent") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vecs = (0 until 50).map(i => Seq.tabulate(64)(d => math.sin(i * 64 + d).toFloat))
    val once = sign(vecs)
    assert(once.forall(_.length == 4))
    assert(sign(vecs) == once, "same input must sign identically")
    val spread = vecs.toDF("embedding").repartition(7)
      .select(col("embedding"), expr("graft_srp_sign(embedding, 42L, 4)").as("sigs"))
      .collect().map(r => r.getSeq[Float](0) -> r.getSeq[Long](1)).toMap
    vecs.zip(once).foreach { case (v, s) => assert(spread(v) == s) }
  }

  test("codegen and interpreted paths agree") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val vec = Array.tabulate(64)(d => (math.cos(d * 0.7) * (d % 5 - 2)).toFloat)
    val e = SrpSign(Literal(new GenericArrayData(vec), ArrayType(FloatType)), 42L, 4)
    val interpreted = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // the DataFrame path runs through whole-stage codegen
    val viaDf = sign(Seq(vec.toSeq)).head
    assert(interpreted.toLongArray().toSeq == viaDf,
      "doGenCode must produce the interpreted result")
  }

  test("SRP property: near-identical vectors have near-zero Hamming distance") {
    val base = Seq.tabulate(64)(d => math.sin(d * 1.3).toFloat)
    val near = base.map(x => x + 1e-6f)
    val far = base.map(x => -x)
    val Seq(sb, sn, sf) = sign(Seq(base, near, far))
    def ham(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham(sb, sn) <= 2, "epsilon-perturbed vector flipped too many planes")
    assert(ham(sb, sf) == 256, "antipodal vector must flip every plane")
  }

  test("non-literal seed/words is rejected") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1.0f)).toDF("embedding")
        .select(expr("graft_srp_sign(embedding, cast(rand() * 10 as long), 4)")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("literal"))
  }
}
