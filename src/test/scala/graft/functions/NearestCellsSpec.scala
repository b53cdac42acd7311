package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class NearestCellsSpec extends AnyFunSuite with SparkTestSession {

  /** drive through the Column API (codegen path, same wiring as the ops) */
  private def viaDf(vec: Seq[Float], cents: Array[Float], dim: Int, nprobe: Int): Seq[Int] = {
    import org.apache.spark.sql.graft.GraftColumns
    import spark.implicits._
    Seq(Tuple1(vec)).toDF("embedding")
      .select(GraftColumns.column(NearestCells(
        GraftColumns.expression(col("embedding")), cents, dim, nprobe)).as("cells"))
      .head().getSeq[Int](0)
  }

  /** reference: every cell sorted by (squared L2, cell id) */
  private def brute(vec: Seq[Float], cents: Array[Float], dim: Int): Seq[(Double, Int)] =
    (0 until cents.length / dim).map { c =>
      val d = (0 until dim).map { j =>
        val diff = vec(j).toDouble - cents(c * dim + j); diff * diff
      }.sum
      (d, c)
    }.sorted

  test("returns the nprobe nearest cells ordered by (distance, cell id)") {
    val rnd = new scala.util.Random(11)
    val dim = 8; val k = 40
    val cents = Array.fill(k * dim)(rnd.nextFloat())
    val vec = Seq.fill(dim)(rnd.nextFloat())
    val got = viaDf(vec, cents, dim, 5)
    assert(got == brute(vec, cents, dim).take(5).map(_._2))
  }

  test("ties break by cell id (duplicate centroids keep ascending ids)") {
    // three identical centroids + one far one
    val cents = Array[Float](1f, 1f, /*cell1*/ 1f, 1f, /*cell2*/ 9f, 9f, /*cell3*/ 1f, 1f)
    val got = viaDf(Seq(1f, 1f), cents, dim = 2, nprobe = 3)
    assert(got == Seq(0, 1, 3))
  }

  test("nprobe larger than k returns every cell, still sorted") {
    val cents = Array[Float](5f, /*c1*/ 1f, /*c2*/ 3f)
    assert(viaDf(Seq(2f), cents, dim = 1, nprobe = 10) == Seq(1, 2, 0))
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(23)
    val dim = 6; val k = 17
    val cents = Array.fill(k * dim)(rnd.nextFloat())
    val vec = Array.fill(dim)(rnd.nextFloat())
    val e = NearestCells(
      Literal(new GenericArrayData(vec), ArrayType(FloatType)), cents, dim, 4)
    val interp = e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
    assert(interp == viaDf(vec.toSeq, cents, dim, 4))
    assert(interp == brute(vec.toSeq, cents, dim).take(4).map(_._2))
  }

  test("double-typed embeddings are accepted (same cells as float input)") {
    import org.apache.spark.sql.graft.GraftColumns
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 4; val k = 9
    val cents = Array.fill(k * dim)(rnd.nextFloat())
    val vec = Seq.fill(dim)(rnd.nextFloat())
    val got = Seq(Tuple1(vec.map(_.toDouble))).toDF("embedding")
      .select(GraftColumns.column(NearestCells(
        GraftColumns.expression(col("embedding")), cents, dim, 3)).as("cells"))
      .head().getSeq[Int](0)
    assert(got == brute(vec, cents, dim).take(3).map(_._2))
  }
}
