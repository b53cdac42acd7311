package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd sign-random-projection signature over a numeric array:
 * `words` 64-bit SRP words (64 planes each) in one tight pass — the
 * screen-signature hot loop of the two-level ANN join
 * (`Similarity.knnJoinIvf2`).
 *
 * The interpreted higher-order-function formulation this replaces
 * (`aggregate(zip_with(...))` per plane) allocates an array per plane
 * per row and never enters whole-stage codegen; at 256 planes that was
 * the dominant cost of the whole join (measured at sf1: the HOF
 * projection alone out-costed the flat probe it was meant to beat).
 * Here the plane loop is generated Java over a broadcast-referenced
 * packed sign matrix: `words × d × 64` multiply-adds, zero allocation
 * beyond the result array.
 *
 * Sign matrix layout: `matrix(w * 512 + dim)` is a packed long whose
 * bit `p` is plane `p`'s sign (+1 if set, −1 otherwise) for `dim` in
 * word `w` — the same per-dim packing as the SQL-literal SRP matrix in
 * `Similarity.srpSignsLit`, capped at 512 dims. Data-independent and
 * derived ONLY from the fixed seed, so every executor of any cluster
 * regenerates it identically; nothing data-sized ships with the plan.
 */
case class SrpSign(child: Expression, seed: Long, words: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val matrix: Array[Long] = SrpSign.matrixFor(seed, words)

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if words >= 1 && words <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"srp_sign needs array<float|double> input and 1..16 words, got ${child.dataType} / $words")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = math.min(x.numElements(), 512)
    val isFloat = elemType == FloatType
    val sigs = new Array[Long](words)
    val acc = new Array[Double](64)
    var w = 0
    while (w < words) {
      java.util.Arrays.fill(acc, 0.0)
      var i = 0
      while (i < d) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val m = matrix(w * 512 + i)
        var p = 0
        while (p < 64) {
          acc(p) += (if (((m >>> p) & 1L) == 1L) xv else -xv)
          p += 1
        }
        i += 1
      }
      var sig = 0L
      var p = 0
      while (p < 64) {
        if (acc(p) > 0.0) sig |= (1L << p)
        p += 1
      }
      sigs(w) = sig
      w += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("srpMatrix", matrix, "long[]")
    val getter = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d"); val w = ctx.freshName("w"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val xv = ctx.freshName("xv"); val m = ctx.freshName("m")
      val acc = ctx.freshName("acc"); val sig = ctx.freshName("sig"); val sigs = ctx.freshName("sigs")
      s"""
        |int $d = java.lang.Math.min($a.numElements(), 512);
        |long[] $sigs = new long[$words];
        |double[] $acc = new double[64];
        |for (int $w = 0; $w < $words; $w++) {
        |  java.util.Arrays.fill($acc, 0.0);
        |  for (int $i = 0; $i < $d; $i++) {
        |    double $xv = ${getter(a, i)};
        |    long $m = $mat[$w * 512 + $i];
        |    for (int $p = 0; $p < 64; $p++) {
        |      $acc[$p] += ((($m >>> $p) & 1L) == 1L) ? $xv : -$xv;
        |    }
        |  }
        |  long $sig = 0L;
        |  for (int $p = 0; $p < 64; $p++) {
        |    if ($acc[$p] > 0.0) $sig |= (1L << $p);
        |  }
        |  $sigs[$w] = $sig;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_srp_sign"
}

object SrpSign {
  /** Deterministic packed sign matrix — regenerated from the seed on
    * every executor, never shipped. */
  def matrixFor(seed: Long, words: Int): Array[Long] = {
    val rng = new scala.util.Random(seed)
    Array.fill(words * 512)(rng.nextLong())
  }
}
