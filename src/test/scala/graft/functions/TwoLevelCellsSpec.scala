package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TwoLevelCellsSpec extends AnyFunSuite with SparkTestSession {

  /** drive through the Column API (codegen path, same wiring as the ops) */
  private def viaDf(vec: Seq[Float], coarse: Array[Float], sub: Array[Float],
      dim: Int, k2: Int, nprobe: Int, nprobe1: Int): Seq[Int] = {
    import org.apache.spark.sql.graft.GraftColumns
    import spark.implicits._
    Seq(Tuple1(vec)).toDF("embedding")
      .select(GraftColumns.column(TwoLevelCells(
        GraftColumns.expression(col("embedding")), coarse, sub, dim, k2, nprobe, nprobe1))
        .as("cells"))
      .head().getSeq[Int](0)
  }

  private def sqDist(vec: Seq[Float], flat: Array[Float], cell: Int, dim: Int): Double =
    (0 until dim).map { j =>
      val diff = vec(j).toDouble - flat(cell * dim + j); diff * diff
    }.sum

  /** reference: branch ranks by coarse distance, then per-branch
    * sub-cells by (distance, global id), concatenated */
  private def brute(vec: Seq[Float], coarse: Array[Float], sub: Array[Float],
      dim: Int, k2: Int, nprobe: Int, nprobe1: Int): Seq[Int] = {
    val k1 = coarse.length / dim
    val branches = (0 until k1).map(c => (sqDist(vec, coarse, c, dim), c))
      .sorted.take(math.min(nprobe1, k1)).map(_._2)
    branches.flatMap { c =>
      (0 until k2).map(s => (sqDist(vec, sub, c * k2 + s, dim), c * k2 + s))
        .sorted.take(math.min(nprobe, k2)).map(_._2)
    }
  }

  private val rnd = new scala.util.Random(7)
  private val dim = 6; private val k1 = 5; private val k2 = 4
  private val coarse = Array.fill(k1 * dim)(rnd.nextFloat())
  private val sub = Array.fill(k1 * k2 * dim)(rnd.nextFloat())
  private val vecs = Seq.fill(20)(Seq.fill(dim)(rnd.nextFloat()))

  test("single-branch (default) matches the reference order") {
    for (v <- vecs; np <- Seq(1, 2, k2)) {
      assert(viaDf(v, coarse, sub, dim, k2, np, 1) == brute(v, coarse, sub, dim, k2, np, 1))
    }
  }

  test("multi-branch returns each probed branch's top cells in branch-rank order") {
    for (v <- vecs; b <- Seq(2, 3, k1)) {
      assert(viaDf(v, coarse, sub, dim, k2, 2, b) == brute(v, coarse, sub, dim, k2, 2, b))
    }
  }

  test("placement invariance: element 1 identical at every coarse width") {
    // an index written under any nprobe1 places vectors the same way —
    // the append/probe kernel-consistency doctrine depends on this
    for (v <- vecs) {
      val first = viaDf(v, coarse, sub, dim, k2, 1, 1).head
      for (b <- 2 to k1)
        assert(viaDf(v, coarse, sub, dim, k2, 1, b).head == first)
    }
  }

  test("probe monotonicity: width-b output is a strict prefix of width-(b+1)") {
    // widening the coarse probe only ever ADDS searched cells — the
    // recall >= single-branch guarantee is structural, not statistical
    for (v <- vecs; np <- Seq(1, 3); b <- 1 until k1) {
      val narrow = viaDf(v, coarse, sub, dim, k2, np, b)
      val wide = viaDf(v, coarse, sub, dim, k2, np, b + 1)
      assert(wide.take(narrow.length) == narrow)
      assert(wide.length > narrow.length)
    }
  }

  test("full width + full depth visits every cell exactly once") {
    for (v <- vecs.take(5)) {
      val all = viaDf(v, coarse, sub, dim, k2, k2, k1)
      assert(all.sorted == (0 until k1 * k2).toList)
    }
  }

  test("interpreted eval equals the codegen path (multi-branch)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    for (v <- vecs.take(5); b <- Seq(1, 2, 3)) {
      val e = TwoLevelCells(
        Literal(new GenericArrayData(v.toArray), ArrayType(FloatType)),
        coarse, sub, dim, k2, 2, b)
      val interp = e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(interp == viaDf(v, coarse, sub, dim, k2, 2, b))
    }
  }
}
