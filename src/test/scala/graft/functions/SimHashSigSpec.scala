package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SimHashSigSpec extends AnyFunSuite with SparkTestSession {

  private def sigs(hashes: Seq[Long], words: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Tuple1(hashes)).toDF("hs")
      .select(expr(s"graft_simhash(hs, $words)"))
      .head().getSeq[Long](0)
  }

  /** the original interpreted HOF formulation, as plain Scala */
  private def hofSimhash(hashes: Seq[Long]): Long = {
    val votes = Array.fill(64)(0)
    hashes.foreach { h =>
      (0 until 64).foreach(i => votes(i) += (if (((h >> i) & 1L) == 1L) 1 else -1))
    }
    (0 until 64).foldLeft(0L)((acc, i) => if (votes(i) > 0) acc | (1L << i) else acc)
  }

  test("word 0 reproduces the interpreted HOF simhash bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val hashes = Seq.fill(200)(rnd.nextLong())
    assert(sigs(hashes, 4).head == hofSimhash(hashes))
  }

  test("frequency weighting: a repeated token drags bits toward its hash") {
    val h = 0x0f0f0f0f0f0f0f0fL
    // 3 votes for h vs 1 for its complement — every bit resolves to h
    assert(sigs(Seq(h, h, h, ~h), 1).head == h)
  }

  test("words are independent: distinct values, stable across calls") {
    val rnd = new scala.util.Random(9)
    val hashes = Seq.fill(100)(rnd.nextLong())
    val s = sigs(hashes, 4)
    assert(s.size == 4)
    assert(s.distinct.size == 4, s"words should differ: $s")
    assert(sigs(hashes, 4) == s)
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(13)
    val hashes = Array.fill(150)(rnd.nextLong())
    val e = SimHashSig(Literal(new GenericArrayData(hashes), ArrayType(LongType)), 4)
    val interp = e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(interp == sigs(hashes.toSeq, 4))
  }

  test("empty token stream yields all-zero signatures (votes never > 0)") {
    assert(sigs(Seq.empty, 2) == Seq(0L, 0L))
  }
}
