package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd nprobe-nearest-centroid selection — the probe-cell choice
 * of the IVF ANN family (`Similarity.knnJoinIvf`/`knnJoinIvf2`).
 *
 * The centroid table rides INSIDE the expression as a flattened float
 * array (k × dim, ~360 KB at k=1414 — plan-shipped once, like the
 * broadcast literal row it replaces). Returns the `nprobe` cell ids
 * ordered by (squared L2 distance, cell id) — the same total order the
 * HOF formulation's `array_sort` over (d, cell) structs produced.
 *
 * The HOF it replaces (`transform(cents, ...)` with an
 * `aggregate(zip_with(...))` distance per cell) allocated two arrays
 * per cell per row: at sf100 that is 2M rows × 1414 cells — the
 * allocation storm that pushed the two-level join past the 1800 s
 * watchdog. Here the k×d distance loop is generated Java with a
 * bounded insertion buffer; distances accumulate in double (the HOF
 * summed float squares into a double accumulator — a least-significant
 * -bit divergence that can reorder near-tied cells; both paths are
 * approximate and recall-tested, not hash-compared).
 */
case class NearestCells(child: Expression, centroids: Array[Float], dim: Int, nprobe: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def k: Int = centroids.length / dim

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if dim >= 1 && nprobe >= 1 && centroids.length % dim == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<float|double> input and k*dim centroids, got ${child.dataType}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val d = math.min(x.numElements(), dim)
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) { xs(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i); i += 1 }
    val np = math.min(nprobe, k)
    val bd = new Array[Double](np) // best distances, ascending
    val bc = new Array[Int](np)    // their cells
    var cnt = 0
    var c = 0
    while (c < k) {
      var dist = 0.0
      val base = c * dim
      var j = 0
      while (j < d) { val diff = xs(j) - centroids(base + j); dist += diff * diff; j += 1 }
      if (cnt < np || dist < bd(cnt - 1)) {
        var pos = if (cnt < np) cnt else cnt - 1
        while (pos > 0 && bd(pos - 1) > dist) { bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1 }
        bd(pos) = dist; bc(pos) = c
        if (cnt < np) cnt += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cent = ctx.addReferenceObj("centroids", centroids, "float[]")
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
      s"""
        |int $d = java.lang.Math.min($a.numElements(), $dim);
        |double[] $xs = new double[$d];
        |for (int $i = 0; $i < $d; $i++) { $xs[$i] = ${getter(a, i)}; }
        |int $np = java.lang.Math.min($nprobe, $k);
        |double[] $bd = new double[$np];
        |int[] $bc = new int[$np];
        |int $cnt = 0;
        |for (int $c = 0; $c < $k; $c++) {
        |  double $dist = 0.0;
        |  int $base = $c * $dim;
        |  for (int $j = 0; $j < $d; $j++) {
        |    double $diff = $xs[$j] - $cent[$base + $j];
        |    $dist += $diff * $diff;
        |  }
        |  if ($cnt < $np || $dist < $bd[$cnt - 1]) {
        |    int $pos = ($cnt < $np) ? $cnt : $cnt - 1;
        |    while ($pos > 0 && $bd[$pos - 1] > $dist) {
        |      $bd[$pos] = $bd[$pos - 1]; $bc[$pos] = $bc[$pos - 1]; $pos--;
        |    }
        |    $bd[$pos] = $dist; $bc[$pos] = $c;
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

  override def prettyName: String = "graft_nearest_cells"
}
