package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd frequency-weighted SimHash signature over an array of
 * token hashes: `words` independent 64-bit simhash words in one pass
 * (the near-dup signature of `Similarity.dedupSimHash`).
 *
 * Word 0 votes with the raw input hash — bit-for-bit the signature the
 * interpreted HOF formulation produced (`aggregate` over a 64-slot
 * vote array per token), which at sf100 was the op's dominant cost:
 * 64 interpreted lambda applications and a fresh vote array PER TOKEN.
 * Words ≥ 1 vote with a splitmix64 remix of the token hash keyed by
 * the word index — independent planes from the same token stream, no
 * second tokenize/hash pass. Everything is generated Java: one
 * `words × 64` int vote table per ROW, zero per-token allocation.
 *
 * Widening the signature is what lets the band keys grow with log₂(n):
 * 4 words → eight 32-bit band keys, the same key-space-above-n
 * doctrine as the cosine-LSH path (see BASELINE.md round 6 — a 4×16-bit
 * banding of the 64-bit signature birthday-saturates at ~4M rows).
 */
case class SimHashSig(child: Expression, words: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if words >= 1 && words <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash needs array<bigint> token hashes and 1..16 words, got ${child.dataType} / $words")
  }

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](words * 64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var w = 0
      while (w < words) {
        val hw = if (w == 0) h else SimHashSig.remix(h, w)
        val base = w * 64
        var p = 0
        while (p < 64) {
          votes(base + p) += (if (((hw >>> p) & 1L) == 1L) 1 else -1)
          p += 1
        }
        w += 1
      }
      i += 1
    }
    val sigs = new Array[Long](words)
    var w = 0
    while (w < words) {
      var sig = 0L
      var p = 0
      while (p < 64) {
        if (votes(w * 64 + p) > 0) sig |= (1L << p)
        p += 1
      }
      sigs(w) = sig
      w += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val h = ctx.freshName("h"); val w = ctx.freshName("w")
      val hw = ctx.freshName("hw"); val base = ctx.freshName("base"); val p = ctx.freshName("p")
      val sigs = ctx.freshName("sigs"); val sig = ctx.freshName("sig")
      val cls = classOf[SimHashSig].getName
      s"""
        |int $n = $a.numElements();
        |int[] $votes = new int[$words * 64];
        |for (int $i = 0; $i < $n; $i++) {
        |  long $h = $a.getLong($i);
        |  for (int $w = 0; $w < $words; $w++) {
        |    long $hw = ($w == 0) ? $h : $cls.remix($h, $w);
        |    int $base = $w * 64;
        |    for (int $p = 0; $p < 64; $p++) {
        |      $votes[$base + $p] += ((($hw >>> $p) & 1L) == 1L) ? 1 : -1;
        |    }
        |  }
        |}
        |long[] $sigs = new long[$words];
        |for (int $w = 0; $w < $words; $w++) {
        |  long $sig = 0L;
        |  for (int $p = 0; $p < 64; $p++) {
        |    if ($votes[$w * 64 + $p] > 0) $sig |= (1L << $p);
        |  }
        |  $sigs[$w] = $sig;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashSig {
  /** splitmix64 finalizer over (h, word) — deterministic per-word token
    * hash derivation, identical on every executor; called from both the
    * interpreted and the generated path so the two cannot diverge. */
  def remix(h: Long, word: Int): Long = {
    var z = h + word * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
