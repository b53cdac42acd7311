package graft.typedef

import scala.collection.immutable.ListMap

import graft.typedef.TypeDef._

/**
 * The schema-merge algebra: unify per-row inferred typedefs into one
 * dataset typedef, mirroring orca's `merge-typedef` / `combine-typedef` /
 * `simplify-typedef` (`src/orca/core.clj:103-114,357-429`).
 *
 * Semantics preserved (SURVEY §2 A5/A6):
 *  - equal typedefs → same
 *  - integral ⊔ integral → widest (Hive lattice)
 *  - any coercible scalar pair → the conversion *target*
 *    (e.g. bigint⊔float→float, string⊔double→double — core.clj:103-114)
 *  - decimal ⊔ decimal → fieldwise max of {scale, precision}
 *    (core.clj:395-396; can produce prop combos neither input had — §7.4.3)
 *  - struct ⊔ struct → field union with recursive merge (core.clj:413-417)
 *  - array ⊔ array → merge children (core.clj:404-405)
 *  - decimal(props) ⊔ string → string (core.clj:428-429)
 *  - anything else throws [[UnmergeableException]] (core.clj:381-382)
 *
 * Inference is strict (throws) while encoding is lenient (error→NULL) —
 * two deliberate, separate failure doctrines (SURVEY §7.4.9).
 *
 * Faithful quirk (property-tested): Hive's lattice makes some pairs
 * MUTUALLY convertible (string↔double, string↔varchar, double↔varchar,
 * decimal↔varchar), and orca's `coerce` tries x→y before y→x
 * (core.clj:357-359) — so merge is order-dependent for exactly those
 * pairs (`merge(string, double) = double` but `merge(double, string) =
 * string`), which also makes the dataset-level left-fold sensitive to
 * row order when those types mix. Replicated, not "fixed".
 */
object Merge {

  final case class UnmergeableException(x: TypeDef, y: TypeDef)
      extends RuntimeException(s"unable to combine-typedef: $x vs $y")

  // Kind names follow the Hive type keywords used by the reference's
  // `implicit-conversions` table (core.clj:103-114).
  private[typedef] def kind(td: TypeDef): String = td match {
    case TBoolean       => "boolean"
    case TTinyInt       => "tinyint"
    case TSmallInt      => "smallint"
    case TInt           => "int"
    case TBigInt        => "bigint"
    case TFloat         => "float"
    case TDouble        => "double"
    case TString        => "string"
    case TVarchar       => "varchar"
    case TBinary        => "binary"
    case TDate          => "date"
    case TTimestamp     => "timestamp"
    case TChar(_)       => "char"
    case TDecimal(_, _) => "decimal"
    case TArray(_)      => "array"
    case TStruct(_)     => "struct"
    case TMap(_, _)     => "map"
    case TUnion(_)      => "union"
  }

  /** Hive's allowed-implicit-conversions table, verbatim from
    * core.clj:103-114 (itself from the Hive LanguageManual). */
  private val implicitConversions: Map[String, Set[String]] = Map(
    "tinyint"   -> Set("smallint", "int", "bigint", "float", "double", "decimal", "string", "varchar"),
    "smallint"  -> Set("int", "bigint", "float", "double", "decimal", "string", "varchar"),
    "int"       -> Set("bigint", "float", "double", "decimal", "string", "varchar"),
    "bigint"    -> Set("float", "double", "decimal", "string", "varchar"),
    "float"     -> Set("double", "decimal", "string", "varchar"),
    "double"    -> Set("decimal", "string", "varchar"),
    "decimal"   -> Set("string", "varchar"),
    "string"    -> Set("double", "decimal", "varchar"),
    "varchar"   -> Set("double", "decimal", "string"),
    "timestamp" -> Set("string", "varchar"),
    "date"      -> Set("string", "varchar"))

  private val integrals = Set("tinyint", "smallint", "int", "bigint")

  private val scalarOfKind: Map[String, TypeDef] = Map(
    "boolean"   -> TBoolean,
    "tinyint"   -> TTinyInt,
    "smallint"  -> TSmallInt,
    "int"       -> TInt,
    "bigint"    -> TBigInt,
    "float"     -> TFloat,
    "double"    -> TDouble,
    "string"    -> TString,
    "varchar"   -> TVarchar,
    "binary"    -> TBinary,
    "date"      -> TDate,
    "timestamp" -> TTimestamp,
    "char"      -> TChar(None),
    "decimal"   -> TDecimal(None, None))

  /** A typedef is "parameterized" when the reference would represent it as
    * a vector `[kind props]` rather than a bare keyword (core.clj:366-376
    * gates the coercible path on `(not (vector? x))`). */
  private def parameterized(td: TypeDef): Boolean = td match {
    case TDecimal(s, p) => s.isDefined || p.isDefined
    case TChar(l)       => l.isDefined
    case TArray(_) | TStruct(_) | TMap(_, _) | TUnion(_) => true
    case _ => false
  }

  /** orca's `coerce` (core.clj:357-359): the conversion target of a kind
    * pair per the Hive lattice, if one exists. */
  private[typedef] def coerceKinds(x: String, y: String): Option[String] =
    if (implicitConversions.getOrElse(x, Set.empty).contains(y)) Some(y)
    else if (implicitConversions.getOrElse(y, Set.empty).contains(x)) Some(x)
    else None

  /** orca's `merge-typedef`/`combine-typedef` dispatch (core.clj:366-429). */
  def merge(x: TypeDef, y: TypeDef): TypeDef = {
    val (kx, ky) = (kind(x), kind(y))
    if (x == y) x
    else if (kx == "array" && ky == "array") mergeArrays(x.asInstanceOf[TArray], y.asInstanceOf[TArray])
    else if (kx == "decimal" && ky == "decimal") mergeDecimals(x.asInstanceOf[TDecimal], y.asInstanceOf[TDecimal])
    else if (kx == "struct" && ky == "struct") mergeStructs(x.asInstanceOf[TStruct], y.asInstanceOf[TStruct])
    else if (integrals(kx) && integrals(ky))
      scalarOfKind(coerceKinds(kx, ky).getOrElse(throw UnmergeableException(x, y)))
    else if (!parameterized(x) && !parameterized(y) && coerceKinds(kx, ky).isDefined)
      scalarOfKind(coerceKinds(kx, ky).get)
    else if (Set(kx, ky) == Set("decimal", "string")) TString // core.clj:428-429
    else throw UnmergeableException(x, y)
  }

  def mergeAll(tds: Iterable[TypeDef]): TypeDef = {
    require(tds.nonEmpty, "mergeAll of empty collection")
    tds.reduceLeft(merge)
  }

  /** decimal ⊔ decimal → fieldwise max; absent props adopt the other
    * side's, like Clojure's `(merge-with max)` (core.clj:395-396). */
  private def mergeDecimals(x: TDecimal, y: TDecimal): TDecimal = {
    def maxOpt(a: Option[Int], b: Option[Int]): Option[Int] = (a, b) match {
      case (Some(av), Some(bv)) => Some(math.max(av, bv))
      case _                    => a.orElse(b)
    }
    TDecimal(maxOpt(x.scale, y.scale), maxOpt(x.precision, y.precision))
  }

  /** array ⊔ array → merge children (core.clj:404-405). Heterogeneous child
    * sets union (they collapse in [[simplify]]); an untyped `[::array]`
    * side adopts the other's children (benign extension — the reference
    * never merges empty arrays because empty lists infer no type). */
  private def mergeArrays(x: TArray, y: TArray): TArray =
    (x.children.toSeq, y.children.toSeq) match {
      case (Seq(cx), Seq(cy)) => TArray(Set(merge(cx, cy)))
      case (cs, Seq())        => TArray(cs.toSet)
      case (Seq(), cs)        => TArray(cs.toSet)
      case (cs, ds)           => TArray(cs.toSet ++ ds.toSet)
    }

  /** struct ⊔ struct → field union; common fields merge recursively
    * (x-side first, matching core.clj:413-417's `(merge-typedef (get x f
    * ft) ft)`). Field order: x's order, then y-only fields in y's order. */
  private def mergeStructs(x: TStruct, y: TStruct): TStruct = {
    var out = x.fields
    y.fields.foreach { case (f, yt) =>
      out = out.updated(f, x.fields.get(f).fold(yt)(xt => merge(xt, yt)))
    }
    TStruct(out)
  }

  /**
   * orca's `simplify-typedef` (core.clj:379,384,407-426): collapse
   * heterogeneous array child-sets via merge; prune empty structs (a
   * struct with no remaining fields simplifies to None and its parent
   * field is dropped). Scalars are unchanged.
   */
  def simplify(td: TypeDef): Option[TypeDef] = td match {
    case TArray(children) =>
      val simplified = children.toSeq.flatMap(simplify)
      if (simplified.isEmpty) Some(TArray(Set.empty[TypeDef]))
      else Some(TArray(Set(mergeAll(simplified))))
    case TStruct(fields) =>
      val out = fields.flatMap { case (f, t) => simplify(t).map(f -> _) }
      if (out.isEmpty) None else Some(TStruct(out))
    case other => Some(other)
  }

  /** Dataset-level fold: per-value inference → simplify → left-fold merge,
    * orca's `rows->typedef` (core.clj:431-437). Driver-side variant; the
    * distributed treeAggregate version lives in `graft.io.OrcIO`. */
  def rowsToTypeDef(rows: Iterable[Any], opts: InferOptions = InferOptions.default): Option[TypeDef] = {
    val tds = rows.iterator.flatMap(r => Infer.infer(r, opts)).flatMap(simplify).toSeq
    if (tds.isEmpty) None else Some(mergeAll(tds))
  }
}
