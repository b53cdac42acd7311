package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd Hamming top-k scan over a packed signature directory — the
 * per-cell screen of the two-level ANN join (`Similarity.knnJoinIvf2`).
 *
 * Inputs: the probing vector's signature words, a cell directory as
 * PARALLEL arrays (member ids + flattened member signature words), and
 * the prober's own id to exclude. Returns the `k` members with the
 * smallest Hamming distance, each packed as `(h << 48) | vb`, sorted
 * ascending — so the packed longs ORDER exactly like (h, vb) pairs and
 * downstream windows can sort on the bare long. Requires `vb < 2^48`
 * (checked loudly; 281 T ids of headroom).
 *
 * This replaces a `transform + array_sort + slice` HOF chain that
 * built a struct per candidate per probe row — 715 M allocations at
 * sf10, which kept the two-level join as slow as the flat probe it was
 * meant to beat (333 s vs 341 s measured). Here the scan is generated
 * Java: XOR + popcount per candidate, a bounded insertion buffer, zero
 * allocation beyond the ≤k-element result.
 */
case class HammingTopK(
    querySigs: Expression, memberIds: Expression, memberSigs: Expression,
    selfId: Expression, k: Int)
    extends QuaternaryExpression with Serializable {

  override def first: Expression = querySigs
  override def second: Expression = memberIds
  override def third: Expression = memberSigs
  override def fourth: Expression = selfId

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean =
    querySigs.nullable || memberIds.nullable || memberSigs.nullable || selfId.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def longArray(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (longArray(querySigs) && longArray(memberIds) && longArray(memberSigs) &&
      selfId.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hamming_topk needs (array<bigint> sigs, array<bigint> ids, array<bigint> flat sigs, bigint self, k >= 1), " +
        s"got (${querySigs.dataType}, ${memberIds.dataType}, ${memberSigs.dataType}, ${selfId.dataType}, $k)")
  }

  override def nullSafeEval(q: Any, ids: Any, flat: Any, self: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ia = ids.asInstanceOf[ArrayData]
    val fa = flat.asInstanceOf[ArrayData]
    val selfV = self.asInstanceOf[Long]
    val w = qa.numElements()
    val qs = new Array[Long](w)
    var j = 0
    while (j < w) { qs(j) = qa.getLong(j); j += 1 }
    val n = ia.numElements()
    val best = new Array[Long](k)
    var cnt = 0
    var i = 0
    while (i < n) {
      val vb = ia.getLong(i)
      if (vb != selfV) {
        if ((vb >>> 48) != 0L)
          throw new IllegalArgumentException(s"hamming_topk: id $vb exceeds 48 bits")
        var h = 0
        var p = 0
        while (p < w) { h += java.lang.Long.bitCount(qs(p) ^ fa.getLong(i * w + p)); p += 1 }
        val packed = (h.toLong << 48) | vb
        if (cnt < k || packed < best(cnt - 1)) {
          // bounded insertion keeping `best[0..cnt)` sorted ascending
          var pos = if (cnt < k) cnt else cnt - 1
          while (pos > 0 && best(pos - 1) > packed) { best(pos) = best(pos - 1); pos -= 1 }
          best(pos) = packed
          if (cnt < k) cnt += 1
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(best, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (q, ids, flat, self) => {
      val w = ctx.freshName("w"); val qs = ctx.freshName("qs"); val n = ctx.freshName("n")
      val best = ctx.freshName("best"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val p = ctx.freshName("p"); val j = ctx.freshName("j")
      val vb = ctx.freshName("vb"); val h = ctx.freshName("h")
      val packed = ctx.freshName("packed"); val pos = ctx.freshName("pos")
      s"""
        |int $w = $q.numElements();
        |long[] $qs = new long[$w];
        |for (int $j = 0; $j < $w; $j++) { $qs[$j] = $q.getLong($j); }
        |int $n = $ids.numElements();
        |long[] $best = new long[$k];
        |int $cnt = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  long $vb = $ids.getLong($i);
        |  if ($vb == $self) continue;
        |  if (($vb >>> 48) != 0L)
        |    throw new IllegalArgumentException("hamming_topk: id " + $vb + " exceeds 48 bits");
        |  int $h = 0;
        |  for (int $p = 0; $p < $w; $p++) {
        |    $h += java.lang.Long.bitCount($qs[$p] ^ $flat.getLong($i * $w + $p));
        |  }
        |  long $packed = (((long) $h) << 48) | $vb;
        |  if ($cnt < $k || $packed < $best[$cnt - 1]) {
        |    int $pos = ($cnt < $k) ? $cnt : $cnt - 1;
        |    while ($pos > 0 && $best[$pos - 1] > $packed) { $best[$pos] = $best[$pos - 1]; $pos--; }
        |    $best[$pos] = $packed;
        |    if ($cnt < $k) $cnt++;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($best, $cnt));
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression, fourth: Expression): Expression =
    copy(querySigs = first, memberIds = second, memberSigs = third, selfId = fourth)

  override def prettyName: String = "graft_hamming_topk"
}
