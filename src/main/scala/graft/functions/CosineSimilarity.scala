package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen'd cosine similarity over two numeric arrays — a native
 * Catalyst `Expression` replacing the interpreted
 * `aggregate(zip_with(...))` folds on the similarity hot path
 * (higher-order functions never enter whole-stage codegen; this does).
 *
 * Semantics: single pass accumulating dot/norms in double, exactly the
 * summation order of the sequential folds it replaces (and of DuckDB's
 * `list_cosine_similarity` over double arrays) — bit-identical results,
 * so the existing oracles keep matching. NULL when either side is NULL
 * or a norm is zero. Array elements are assumed non-null (embedding
 * vectors; NULL elements read as 0).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine similarity needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def get(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, i, lt); val yv = get(y, i, rt)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(dt: DataType, arr: String, i: String) = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $x = ${getter(elemType(left), a, i)};
        |  double $y = ${getter(elemType(right), b, i)};
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Registration for graft's native functions: per-session temp-function
  * registration (library use) and a `SparkSessionExtensions` injector
  * (`spark.sql.extensions=graft.GraftExtensions`, cluster-wide use). */
object GraftFunctions {

  val cosineInfo = new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine")

  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_cosine takes 2 arguments, got ${other.size}")
  }

  val srpSignInfo = new ExpressionInfo(classOf[SrpSign].getName, "graft_srp_sign")

  /** `graft_srp_sign(vec, seed, words)` — seed/words must be literals
    * (the sign matrix is built at plan time, not per row). */
  val srpSignBuilder: Seq[Expression] => Expression = {
    case Seq(child, seedE, wordsE) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      (seedE, wordsE) match {
        case (Literal(s, LongType), Literal(w, IntegerType)) =>
          SrpSign(child, s.asInstanceOf[Long], w.asInstanceOf[Int])
        case (Literal(s, IntegerType), Literal(w, IntegerType)) =>
          SrpSign(child, s.asInstanceOf[Int].toLong, w.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "graft_srp_sign needs literal seed and words arguments")
      }
    case other => throw new IllegalArgumentException(
      s"graft_srp_sign takes 3 arguments, got ${other.size}")
  }

  val simHashInfo = new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash")

  /** `graft_simhash(token_hashes, words)` — words must be a literal (it
    * sizes the vote table at plan time). */
  val simHashBuilder: Seq[Expression] => Expression = {
    case Seq(child, wordsE) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      wordsE match {
        case Literal(w, IntegerType) => SimHashSig(child, w.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "graft_simhash needs a literal words argument")
      }
    case other => throw new IllegalArgumentException(
      s"graft_simhash takes 2 arguments, got ${other.size}")
  }

  val hammingTopKInfo = new ExpressionInfo(classOf[HammingTopK].getName, "graft_hamming_topk")

  /** `graft_hamming_topk(sigs, ids, flat_sigs, self_id, k)` — k must be
    * a literal (it sizes the selection buffer at plan time). */
  val hammingTopKBuilder: Seq[Expression] => Expression = {
    case Seq(q, ids, flat, self, kE) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      kE match {
        case Literal(k, IntegerType) => HammingTopK(q, ids, flat, self, k.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "graft_hamming_topk needs a literal k argument")
      }
    case other => throw new IllegalArgumentException(
      s"graft_hamming_topk takes 5 arguments, got ${other.size}")
  }

  val nfcInfo = new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")

  val nfcBuilder: Seq[Expression] => Expression = {
    case Seq(child) => NfcNormalize(child)
    case other => throw new IllegalArgumentException(
      s"graft_nfc takes 1 argument, got ${other.size}")
  }

  /** The single source of truth for graft's native-function surface.
    * Both registration paths (per-session `register`, cluster-wide
    * `GraftExtensions`) iterate THIS list, so a function added here is
    * exposed on both by construction — the graft_simhash
    * laptop-works/cluster-fails gap cannot recur. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", cosineInfo, cosineBuilder),
    ("graft_srp_sign", srpSignInfo, srpSignBuilder),
    ("graft_hamming_topk", hammingTopKInfo, hammingTopKBuilder),
    ("graft_simhash", simHashInfo, simHashBuilder),
    ("graft_nfc", nfcInfo, nfcBuilder))

  /** Idempotent per-session registration of graft's native functions. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
