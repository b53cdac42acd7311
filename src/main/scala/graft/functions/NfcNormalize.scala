package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_nfc(text)` — Unicode NFC canonical composition, the first
 * stage of corpus normalization (c38): combining sequences fold into
 * their precomposed forms ("e" + U+0301 → "é"), so byte-level dedup,
 * shingle hashing, and BPE alphabets see ONE spelling per grapheme.
 * Spark has no normalization built-in; a codegen'd Catalyst expression
 * keeps the hot path inside WholeStageCodegen (the house preference
 * order: native expression > UDF).
 *
 * Fast path: NFC-normalized input (the overwhelming case — most
 * real-world text is already NFC) is detected with
 * [[Normalizer.isNormalized]] and returned as-is, no allocation; the
 * String roundtrip is paid only by rows that actually need composing.
 */
object NfcNormalize {
  /** Static entry for both eval and codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs a string column, got $other")
  }

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.nfc($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
