package graft.typedef

import java.math.{BigDecimal => JBigDecimal, BigInteger => JBigInteger}
import java.time.{Instant, LocalDate}
import java.time.format.{DateTimeFormatter, DateTimeParseException}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import graft.typedef.TypeDef._

/**
 * Options steering value-level type inference, mirroring the option map of
 * the reference (orca `src/orca/core.clj:241-245,260-262,278-303`):
 *
 *  - `coerceDateStrings` — ISO-8601 date strings infer as date
 *  - `coerceTimestampStrings` — ISO-8601 instant strings infer as timestamp
 *  - `coerceDecimalStrings` — numeric strings infer as decimal
 *    (tried in that order: date → timestamp → decimal, core.clj:299-303)
 *  - `minDecimalScale` / `minDecimalPrecision` — floors applied to inferred
 *    decimal props (core.clj:241-245)
 *  - `overrideStruct` — pins a struct field's typedef during inference
 *    (core.clj:260-262); keys are normalized field names
 */
final case class InferOptions(
    coerceDateStrings: Boolean = false,
    coerceTimestampStrings: Boolean = false,
    coerceDecimalStrings: Boolean = false,
    minDecimalScale: Option[Int] = None,
    minDecimalPrecision: Option[Int] = None,
    overrideStruct: Map[String, TypeDef] = Map.empty)

object InferOptions {
  val default: InferOptions = InferOptions()
}

/**
 * Value-level type inference with orca's semantics
 * (`src/orca/core.clj:116-303`). Key behaviors preserved:
 *
 *  - **Value-dependent integer narrowing** (core.clj:178-189): narrowing is
 *    by value, not JVM class — `10L` infers tinyint, `40000` infers int.
 *  - **Maps infer as STRUCT, not MAP** (core.clj:192-195,257-267); field
 *    names are normalized to strings (the reference keeps raw keys in the
 *    typedef and calls `name` at schema-build time, core.clj:350 — we
 *    normalize eagerly since our `TStruct` keys are Strings).
 *  - **Empty lists and nulls carry no type** (core.clj:126-131,216-218):
 *    `infer` returns None and struct fields holding them are dropped.
 *  - Heterogeneous arrays infer a *set* of child typedefs
 *    (core.clj:269-276), later collapsed by [[Merge.simplify]].
 */
object Infer {

  /** Raw type of a value, no props — orca's `data-type` (core.clj:116-218).
    * None for null and empty lists (they carry no type). */
  def dataType(v: Any): Option[TypeDef] = v match {
    case null                  => None
    case _: java.lang.Boolean  => Some(TBoolean)
    case _: Array[Char]        => Some(TChar(None))
    case _: java.lang.Character => Some(TChar(Some(1)))
    case _: JBigInteger        => Some(TBigInt)
    case _: scala.math.BigInt  => Some(TBigInt)
    case d: JBigDecimal        => Some(TDecimal(Some(d.scale), Some(d.precision)))
    case d: scala.math.BigDecimal => Some(TDecimal(Some(d.scale), Some(d.precision)))
    case _: java.lang.Float    => Some(TFloat)
    case _: java.lang.Double   => Some(TDouble)
    case n: java.lang.Number   => Some(narrow(n.longValue()))
    case _: LocalDate          => Some(TDate)
    case _: Instant            => Some(TTimestamp)
    case _: String             => Some(TString)
    case _: scala.Symbol       => Some(TString)
    case l: java.util.List[_]  => if (l.isEmpty) None else Some(TArray.empty)
    case s: scala.collection.Seq[_] => if (s.isEmpty) None else Some(TArray.empty)
    case _: java.util.Map[_, _] => Some(TStruct(ListMap.empty))
    case _: scala.collection.Map[_, _] => Some(TStruct(ListMap.empty))
    case _                     => None
  }

  /** Value-based integer narrowing, exactly core.clj:178-189. */
  def narrow(x: Long): TypeDef =
    if (x >= Byte.MinValue) {
      if (x <= Byte.MaxValue) TTinyInt
      else if (x <= Short.MaxValue) TSmallInt
      else if (x <= Int.MaxValue) TInt
      else TBigInt
    } else if (x >= Short.MinValue) TSmallInt
    else if (x >= Int.MinValue) TInt
    else TBigInt

  /** Normalize a struct key to a field name, like orca's `name`/`to-bytes`
    * path (SURVEY §7.4.2): Symbol → its name, String → itself, anything
    * else → toString. Collision risk (`10` vs `"10"`) documented there. */
  def fieldName(k: Any): String = k match {
    case s: scala.Symbol => s.name
    case s: String       => s
    case other           => String.valueOf(other)
  }

  /** orca's `typedef` / `infer-typedef` (core.clj:228-303): value → typedef
    * with props. None for valueless inputs (null, empty list). */
  def infer(v: Any, opts: InferOptions = InferOptions.default): Option[TypeDef] =
    v match {
      case s: String => Some(inferString(s, opts))
      case l: java.util.List[_] => inferArray(l.asScala.toSeq, opts)
      case s: scala.collection.Seq[_] => inferArray(s.toSeq, opts)
      case m: java.util.Map[_, _] =>
        Some(inferStruct(m.asScala.toSeq.map { case (k, vv) => (k: Any, vv: Any) }, opts))
      case m: scala.collection.Map[_, _] =>
        Some(inferStruct(m.toSeq.map { case (k, vv) => (k: Any, vv: Any) }, opts))
      case d: JBigDecimal => Some(inferDecimal(d.scale, d.precision, opts))
      case d: scala.math.BigDecimal => Some(inferDecimal(d.scale, d.precision, opts))
      case other => dataType(other)
    }

  /** Decimal props with optional floors (core.clj:241-245). */
  private def inferDecimal(scale: Int, precision: Int, opts: InferOptions): TypeDef =
    TDecimal(
      Some(opts.minDecimalScale.fold(scale)(math.max(scale, _))),
      Some(opts.minDecimalPrecision.fold(precision)(math.max(precision, _))))

  /** String coercions, tried date → timestamp → decimal (core.clj:299-303). */
  private def inferString(s: String, opts: InferOptions): TypeDef = {
    def tryDate: Option[TypeDef] =
      if (!opts.coerceDateStrings) None
      else
        try { LocalDate.parse(s, DateTimeFormatter.ISO_DATE); Some(TDate) }
        catch { case _: DateTimeParseException => None }
    def tryTimestamp: Option[TypeDef] =
      if (!opts.coerceTimestampStrings) None
      else
        try { Instant.parse(s); Some(TTimestamp) }
        catch { case _: DateTimeParseException => None }
    def tryDecimal: Option[TypeDef] =
      if (!opts.coerceDecimalStrings) None
      else
        try {
          val d = new JBigDecimal(s)
          Some(inferDecimal(d.scale, d.precision, opts))
        } catch { case _: NumberFormatException => None }
    tryDate.orElse(tryTimestamp).orElse(tryDecimal).getOrElse(TString)
  }

  /** Array inference (core.clj:269-276): nulls removed; 0 typed children →
    * empty set, 1 → singleton, >1 → heterogeneous set for later simplify. */
  private def inferArray(elems: Seq[Any], opts: InferOptions): Option[TypeDef] =
    if (elems.isEmpty) None // empty list carries no type (core.clj:129-130)
    else {
      val children = elems.filter(_ != null).flatMap(e => infer(e, opts)).toSet
      Some(TArray(children))
    }

  /** Struct inference (core.clj:257-267): overrides pin field types;
    * valueless fields are dropped. Field order = first-seen key order. */
  private def inferStruct(entries: Seq[(Any, Any)], opts: InferOptions): TypeDef = {
    var fields = ListMap.empty[String, TypeDef]
    entries.foreach { case (k, v) =>
      val fname = fieldName(k)
      opts.overrideStruct.get(fname) match {
        case Some(td) => fields = fields.updated(fname, td)
        case None =>
          if (dataType(v).isDefined)
            infer(v, opts).foreach(td => fields = fields.updated(fname, td))
      }
    }
    TStruct(fields)
  }
}
