package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HammingTopKSpec extends AnyFunSuite with SparkTestSession {

  private def topk(q: Seq[Long], ids: Seq[Long], flat: Seq[Long], self: Long, k: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((q, ids, flat, self)).toDF("q", "ids", "flat", "self")
      .select(expr(s"graft_hamming_topk(q, ids, flat, self, $k)"))
      .head().getSeq[Long](0)
  }

  private def unpack(p: Long): (Long, Long) = (p >>> 48, p & ((1L << 48) - 1))

  test("selects the k smallest Hamming distances, sorted, self excluded") {
    // 1 sig word; query 0b0000; members at distances 0,1,2,3 + self
    val got = topk(Seq(0L), ids = Seq(10L, 11L, 12L, 13L, 7L),
      flat = Seq(0L, 1L, 3L, 7L, 0L), self = 7L, k = 3)
    assert(got.map(unpack) == Seq((0L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("ties break by id; k larger than candidates returns all") {
    val got = topk(Seq(0L), ids = Seq(5L, 3L, 9L), flat = Seq(1L, 1L, 1L), self = -1L, k = 10)
    assert(got.map(unpack) == Seq((1L, 3L), (1L, 5L), (1L, 9L)))
  }

  test("multi-word signatures sum per-word popcounts; matches a Scala recount") {
    val rnd = new scala.util.Random(7)
    val w = 4
    val q = Seq.fill(w)(rnd.nextLong())
    val n = 100
    val ids = (0L until n.toLong)
    val flat = Seq.fill(n * w)(rnd.nextLong())
    val got = topk(q, ids, flat, self = 50L, k = 8).map(unpack)
    val want = ids.filterNot(_ == 50L).map { i =>
      val h = (0 until w).map(p => java.lang.Long.bitCount(q(p) ^ flat(i.toInt * w + p))).sum
      (h.toLong, i)
    }.sorted.take(8)
    assert(got == want)
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val q = Array(0x0f0fL, 0x3333L)
    val ids = Array(1L, 2L, 3L, 4L)
    val flat = Array(0L, 0L, 0x0f0fL, 0x3333L, -1L, -1L, 0x0fL, 0x33L)
    def lit(a: Array[Long]) = Literal(new GenericArrayData(a), ArrayType(LongType))
    val e = HammingTopK(lit(q), lit(ids), lit(flat), Literal(4L, LongType), 3)
    val interp = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(interp == topk(q.toSeq, ids.toSeq, flat.toSeq, 4L, 3))
  }

  test("an id above 48 bits fails loudly, not silently wrong") {
    val ex = intercept[Exception](topk(Seq(0L), Seq(1L << 50), Seq(0L), -1L, 1))
    assert(ex.getMessage.contains("exceeds 48 bits") ||
      Option(ex.getCause).exists(_.getMessage.contains("exceeds 48 bits")))
  }
}
