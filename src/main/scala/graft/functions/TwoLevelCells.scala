package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd TWO-LEVEL nearest-cell selection — the constant-population
 * (`graft.semdedup.cellPop`) quantizer's assignment kernel.
 *
 * At constant per-cell population the cell count k grows LINEARLY with
 * the corpus, so the flat [[NearestCells]] scan — n·k·d work — turns
 * quadratic in n. The standard fix (FAISS's IMI / hierarchical coarse
 * quantization) splits the codebook: k1 ≈ √k coarse centroids choose a
 * branch, then only that branch's k2 ≈ k/k1 sub-centroids are scanned —
 * (k1 + k2)·d ≈ 2√k·d per row, restoring overall linearity. A pair
 * straddling a COARSE boundary is never compared — the same accepted
 * miss class as the flat quantizer's cell boundary, one level up.
 *
 * Both codebooks ride inside the expression (flattened floats,
 * plan-shipped once — at k = 16k cells, d = 64 that is ~4 MB, the same
 * order as the flat centroid table the √n configuration ships).
 * Returns the `nprobe` global sub-cell ids (coarse·k2 + sub) within the
 * nearest coarse branch, ordered by (squared L2, id) — [[NearestCells]]'
 * total order, restricted to one branch.
 */
case class TwoLevelCells(child: Expression, coarse: Array[Float], sub: Array[Float],
    dim: Int, k2: Int, nprobe: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def k1: Int = coarse.length / dim

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if dim >= 1 && k2 >= 1 && nprobe >= 1 &&
          coarse.length % dim == 0 && sub.length == k1 * k2 * dim =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"two_level_cells needs array<float|double> input, k1*dim coarse and " +
        s"k1*k2*dim sub centroids, got ${child.dataType}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val d = math.min(x.numElements(), dim)
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) { xs(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i); i += 1 }
    // stage 1: nearest coarse branch (ties -> lowest id, strict <)
    var bestC = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k1) {
      var dist = 0.0
      val base = c * dim
      var j = 0
      while (j < d) { val diff = xs(j) - coarse(base + j); dist += diff * diff; j += 1 }
      if (dist < bestD) { bestD = dist; bestC = c }
      c += 1
    }
    // stage 2: nprobe nearest sub-cells within the branch slice
    val np = math.min(nprobe, k2)
    val bd = new Array[Double](np)
    val bc = new Array[Int](np)
    var cnt = 0
    var s = 0
    val slice = bestC * k2 * dim
    while (s < k2) {
      var dist = 0.0
      val base = slice + s * dim
      var j = 0
      while (j < d) { val diff = xs(j) - sub(base + j); dist += diff * diff; j += 1 }
      if (cnt < np || dist < bd(cnt - 1)) {
        var pos = if (cnt < np) cnt else cnt - 1
        while (pos > 0 && bd(pos - 1) > dist) { bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1 }
        bd(pos) = dist; bc(pos) = bestC * k2 + s
        if (cnt < np) cnt += 1
      }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val co = ctx.addReferenceObj("coarse", coarse, "float[]")
    val su = ctx.addReferenceObj("sub", sub, "float[]")
    val getter = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d"); val xs = ctx.freshName("xs"); val np = ctx.freshName("np")
      val bd = ctx.freshName("bd"); val bc = ctx.freshName("bc"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val dist = ctx.freshName("dist"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff"); val pos = ctx.freshName("pos")
      val bestC = ctx.freshName("bestC"); val bestD = ctx.freshName("bestD")
      val s = ctx.freshName("s"); val slice = ctx.freshName("slice")
      s"""
        |int $d = java.lang.Math.min($a.numElements(), $dim);
        |double[] $xs = new double[$d];
        |for (int $i = 0; $i < $d; $i++) { $xs[$i] = ${getter(a, i)}; }
        |int $bestC = 0;
        |double $bestD = Double.MAX_VALUE;
        |for (int $c = 0; $c < $k1; $c++) {
        |  double $dist = 0.0;
        |  int $base = $c * $dim;
        |  for (int $j = 0; $j < $d; $j++) {
        |    double $diff = $xs[$j] - $co[$base + $j];
        |    $dist += $diff * $diff;
        |  }
        |  if ($dist < $bestD) { $bestD = $dist; $bestC = $c; }
        |}
        |int $np = java.lang.Math.min($nprobe, $k2);
        |double[] $bd = new double[$np];
        |int[] $bc = new int[$np];
        |int $cnt = 0;
        |int $slice = $bestC * $k2 * $dim;
        |for (int $s = 0; $s < $k2; $s++) {
        |  double $dist = 0.0;
        |  int $base = $slice + $s * $dim;
        |  for (int $j = 0; $j < $d; $j++) {
        |    double $diff = $xs[$j] - $su[$base + $j];
        |    $dist += $diff * $diff;
        |  }
        |  if ($cnt < $np || $dist < $bd[$cnt - 1]) {
        |    int $pos = ($cnt < $np) ? $cnt : $cnt - 1;
        |    while ($pos > 0 && $bd[$pos - 1] > $dist) {
        |      $bd[$pos] = $bd[$pos - 1]; $bc[$pos] = $bc[$pos - 1]; $pos--;
        |    }
        |    $bd[$pos] = $dist; $bc[$pos] = $bestC * $k2 + $s;
        |    if ($cnt < $np) $cnt++;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($bc, $cnt));
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_two_level_cells"
}
