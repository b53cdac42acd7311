package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The ID half of the BPE tokenizer ([[BpeEncode]] is the string half):
 * what a training loader actually consumes is integer ids against an
 * exported vocabulary, and what an inspection/debug path needs is the
 * inverse — ids back to text. Both directions are plan-shipped table
 * lookups (the NearestCells/ADC literal doctrine): the vocab rides
 * inside the expression, so encode and decode are map-only projections
 * with no join and no shuffle — at a production 100k-entry vocab that
 * is under a MB of plan.
 *
 * Word-boundary convention: [[BpeCodec.encode]] flattens each word's
 * tokens, which is lossless per WORD but erases the spaces between
 * them. The id stream therefore interleaves the reserved SPACE id
 * (vocab slot 0) between consecutive words — including empty words, so
 * runs of spaces and leading/trailing spaces round-trip exactly:
 * decode(encodeIds(text)) == text for every text whose characters are
 * in the vocab (the roundtrip identity the registry oracle checks).
 * A character outside the vocab encodes as [[BpeVocab.OovId]] — loud
 * (the roundtrip hash diverges) rather than silently dropped; a
 * production deployment widens the alphabet or byte-falls-back.
 */
final class BpeVocab(val merges: Array[String], val tokens: Array[String])
    extends Serializable {

  @transient private lazy val codec = new BpeCodec(merges)

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](tokens.length)
    var i = 0
    // first occurrence wins: two merge paths can compose the same
    // string (("a","bc") and ("ab","c") both yield "abc"); the lower id
    // is the canonical one and decode is unaffected (same string)
    while (i < tokens.length) { if (!m.containsKey(tokens(i))) m.put(tokens(i), i); i += 1 }
    m
  }

  /** text → ids: per-word BPE tokens mapped through the vocab, SPACE
    * id between consecutive words. */
  def encodeIds(text: UTF8String): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      if (i > 0) out += BpeVocab.SpaceId
      val toks = codec.encodeWord(words(i))
      var j = 0
      while (j < toks.length) {
        val id = ids.get(toks(j))
        out += (if (id == null) BpeVocab.OovId else id.intValue())
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ids → text: straight vocab concatenation (slot 0 is the space).
    * An OOV/out-of-range id decodes to the empty string — the encode
    * side already made the divergence loud. */
  def decode(idArr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = idArr.numElements()
    while (i < n) {
      val id = idArr.getInt(i)
      if (id >= 0 && id < tokens.length) sb.append(tokens(id))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object BpeVocab {
  /** Reserved id of the word separator — vocab slot 0 is " ". */
  val SpaceId = 0
  /** Loud out-of-vocabulary sentinel (never a valid slot). */
  val OovId: Int = -1
}

/** `graft_bpe_encode_ids` — string column → array<int> token ids. */
case class BpeEncodeIds(child: Expression, merges: Array[String],
                        tokens: Array[String])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val vocab = new BpeVocab(merges, tokens)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode_ids needs a string column, got $other")
  }

  override def nullSafeEval(t: Any): Any =
    vocab.encodeIds(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.encodeIds($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_encode_ids"
}

/** `graft_bpe_decode` — array<int> token ids → string. */
case class BpeDecode(child: Expression, tokens: Array[String])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  // decode needs no merge table — an empty-merges vocab is just the
  // id→token array
  @transient private lazy val vocab = new BpeVocab(Array.empty, tokens)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_decode needs an array<int> column, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    vocab.decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.decode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_decode"
}
