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
 * `nprobe1` widens stage 1 to the top-`nprobe1` coarse branches
 * (standard FAISS coarse-nprobe practice): the output is each probed
 * branch's `nprobe` nearest sub-cells, CONCATENATED in branch-rank
 * order — (nprobe1·k1 + nprobe1·k2)·d work per row. Two properties the
 * index lifecycle depends on (spec-pinned):
 *
 *  - **placement invariance**: element 1 is the nearest branch's best
 *    sub-cell regardless of nprobe1, so an index written under any
 *    probe width places vectors identically;
 *  - **probe monotonicity**: the nprobe1 = b output is a strict prefix
 *    of the b+1 output, so widening the coarse probe only ever ADDS
 *    searched cells — recall is monotone in nprobe1.
 *
 * Both codebooks ride inside the expression (flattened floats,
 * plan-shipped once — at k = 16k cells, d = 64 that is ~4 MB, the same
 * order as the flat centroid table the √n configuration ships).
 * Within a branch, sub-cells are ordered by (squared L2, global id) —
 * [[NearestCells]]' total order, restricted to that branch's slice.
 */
case class TwoLevelCells(child: Expression, coarse: Array[Float], sub: Array[Float],
    dim: Int, k2: Int, nprobe: Int, nprobe1: Int = 1)
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
        if dim >= 1 && k2 >= 1 && nprobe >= 1 && nprobe1 >= 1 &&
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
    // stage 1: top-nprobe1 coarse branches, ascending distance
    // (ties -> lowest id: ascending scan + strict comparisons)
    val nb = math.min(nprobe1, k1)
    val cbd = new Array[Double](nb)
    val cbc = new Array[Int](nb)
    var ccnt = 0
    var c = 0
    while (c < k1) {
      var dist = 0.0
      val base = c * dim
      var j = 0
      while (j < d) { val diff = xs(j) - coarse(base + j); dist += diff * diff; j += 1 }
      if (ccnt < nb || dist < cbd(ccnt - 1)) {
        var pos = if (ccnt < nb) ccnt else ccnt - 1
        while (pos > 0 && cbd(pos - 1) > dist) { cbd(pos) = cbd(pos - 1); cbc(pos) = cbc(pos - 1); pos -= 1 }
        cbd(pos) = dist; cbc(pos) = c
        if (ccnt < nb) ccnt += 1
      }
      c += 1
    }
    // stage 2: per probed branch (in rank order), the nprobe nearest
    // sub-cells of that branch's slice — concatenated, so widening
    // nprobe1 appends and never reorders
    val np = math.min(nprobe, k2)
    val out = new Array[Int](ccnt * np)
    val bd = new Array[Double](np)
    val bc = new Array[Int](np)
    var b = 0
    var outLen = 0
    while (b < ccnt) {
      val branch = cbc(b)
      val slice = branch * k2 * dim
      var cnt = 0
      var s = 0
      while (s < k2) {
        var dist = 0.0
        val base = slice + s * dim
        var j = 0
        while (j < d) { val diff = xs(j) - sub(base + j); dist += diff * diff; j += 1 }
        if (cnt < np || dist < bd(cnt - 1)) {
          var pos = if (cnt < np) cnt else cnt - 1
          while (pos > 0 && bd(pos - 1) > dist) { bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1 }
          bd(pos) = dist; bc(pos) = branch * k2 + s
          if (cnt < np) cnt += 1
        }
        s += 1
      }
      var t = 0
      while (t < cnt) { out(outLen) = bc(t); outLen += 1; t += 1 }
      b += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
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
      val s = ctx.freshName("s"); val slice = ctx.freshName("slice")
      val nb = ctx.freshName("nb"); val cbd = ctx.freshName("cbd"); val cbc = ctx.freshName("cbc")
      val ccnt = ctx.freshName("ccnt"); val b = ctx.freshName("b"); val branch = ctx.freshName("branch")
      val out = ctx.freshName("out"); val outLen = ctx.freshName("outLen"); val t = ctx.freshName("t")
      s"""
        |int $d = java.lang.Math.min($a.numElements(), $dim);
        |double[] $xs = new double[$d];
        |for (int $i = 0; $i < $d; $i++) { $xs[$i] = ${getter(a, i)}; }
        |int $nb = java.lang.Math.min($nprobe1, $k1);
        |double[] $cbd = new double[$nb];
        |int[] $cbc = new int[$nb];
        |int $ccnt = 0;
        |for (int $c = 0; $c < $k1; $c++) {
        |  double $dist = 0.0;
        |  int $base = $c * $dim;
        |  for (int $j = 0; $j < $d; $j++) {
        |    double $diff = $xs[$j] - $co[$base + $j];
        |    $dist += $diff * $diff;
        |  }
        |  if ($ccnt < $nb || $dist < $cbd[$ccnt - 1]) {
        |    int $pos = ($ccnt < $nb) ? $ccnt : $ccnt - 1;
        |    while ($pos > 0 && $cbd[$pos - 1] > $dist) {
        |      $cbd[$pos] = $cbd[$pos - 1]; $cbc[$pos] = $cbc[$pos - 1]; $pos--;
        |    }
        |    $cbd[$pos] = $dist; $cbc[$pos] = $c;
        |    if ($ccnt < $nb) $ccnt++;
        |  }
        |}
        |int $np = java.lang.Math.min($nprobe, $k2);
        |int[] $out = new int[$ccnt * $np];
        |int $outLen = 0;
        |double[] $bd = new double[$np];
        |int[] $bc = new int[$np];
        |for (int $b = 0; $b < $ccnt; $b++) {
        |  int $branch = $cbc[$b];
        |  int $slice = $branch * $k2 * $dim;
        |  int $cnt = 0;
        |  for (int $s = 0; $s < $k2; $s++) {
        |    double $dist = 0.0;
        |    int $base = $slice + $s * $dim;
        |    for (int $j = 0; $j < $d; $j++) {
        |      double $diff = $xs[$j] - $su[$base + $j];
        |      $dist += $diff * $diff;
        |    }
        |    if ($cnt < $np || $dist < $bd[$cnt - 1]) {
        |      int $pos = ($cnt < $np) ? $cnt : $cnt - 1;
        |      while ($pos > 0 && $bd[$pos - 1] > $dist) {
        |        $bd[$pos] = $bd[$pos - 1]; $bc[$pos] = $bc[$pos - 1]; $pos--;
        |      }
        |      $bd[$pos] = $dist; $bc[$pos] = $branch * $k2 + $s;
        |      if ($cnt < $np) $cnt++;
        |    }
        |  }
        |  for (int $t = 0; $t < $cnt; $t++) { $out[$outLen] = $bc[$t]; $outLen++; }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($out, $outLen));
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_two_level_cells"
}
