package graft.typedef

import scala.collection.immutable.ListMap

import org.apache.orc.TypeDescription
import org.apache.spark.sql.types._

/**
 * Schema IR mirroring the reference's "typedef" data structure
 * (orca `src/orca/core.clj:228-355`): a keyword (scalar) or a vector
 * (parameterized / nested type). We model it as a sealed ADT.
 *
 * Three representations bridge through this IR:
 *   Hive schema string  ⇄  TypeDef  ⇄  Spark `DataType`
 * plus ORC `TypeDescription` (the reference's physical schema type,
 * `src/orca/core.clj:305-355`).
 */
sealed trait TypeDef extends Serializable

object TypeDef {
  // ---- scalars -------------------------------------------------------
  case object TBoolean   extends TypeDef
  case object TTinyInt   extends TypeDef
  case object TSmallInt  extends TypeDef
  case object TInt       extends TypeDef
  case object TBigInt    extends TypeDef
  case object TFloat     extends TypeDef
  case object TDouble    extends TypeDef
  case object TString    extends TypeDef
  case object TVarchar   extends TypeDef
  case object TBinary    extends TypeDef
  case object TDate      extends TypeDef
  case object TTimestamp extends TypeDef

  /** Char with optional length prop. The reference records
   * `{:length 1}` for a single Character (core.clj:145-148) but its
   * schema builder ignores the prop (core.clj:344) — we replicate. */
  final case class TChar(length: Option[Int] = None) extends TypeDef

  /** Decimal with optional scale/precision props, exactly the shape of
   * the reference's `[::decimal {:scale s :precision p}]`
   * (core.clj:159-162). Either may be absent when the typedef came
   * from a bare `::decimal` keyword. */
  final case class TDecimal(scale: Option[Int] = None, precision: Option[Int] = None) extends TypeDef

  /**
   * Array. The reference's inferred array typedef has three arities
   * (core.clj:269-276): `[::array]` (no typed children), `[::array td]`
   * (homogeneous) and `[::array #{td …}]` (heterogeneous child set,
   * collapsed later by simplify). We model all three as a Set.
   */
  final case class TArray(children: Set[TypeDef]) extends TypeDef
  object TArray {
    def apply(child: TypeDef): TArray = TArray(Set(child))
    val empty: TArray = TArray(Set.empty[TypeDef])
  }

  /** Struct; field order preserved (ListMap) for stable schema strings. */
  final case class TStruct(fields: ListMap[String, TypeDef]) extends TypeDef
  object TStruct {
    def of(fields: (String, TypeDef)*): TStruct = TStruct(ListMap(fields: _*))
  }

  final case class TMap(key: TypeDef, value: TypeDef) extends TypeDef

  /** Union: vestigial in the reference (schema builder only,
   * core.clj:352-355) — representable, never inferred, no Spark type. */
  final case class TUnion(children: Seq[TypeDef]) extends TypeDef

  // ---- Hive schema string / ORC TypeDescription bridge ---------------
  // (reference: typedef->schema core.clj:322-355, schema->typedef :305-320)

  /** TypeDef → ORC TypeDescription. Mirrors core.clj:322-355, including
   * the quirk that char length props are dropped (line 344). Arrays must
   * have exactly one child by now (post-simplify). */
  def toOrc(td: TypeDef): TypeDescription = td match {
    case TBoolean   => TypeDescription.createBoolean()
    case TTinyInt   => TypeDescription.createByte()
    case TSmallInt  => TypeDescription.createShort()
    case TInt       => TypeDescription.createInt()
    case TBigInt    => TypeDescription.createLong()
    case TFloat     => TypeDescription.createFloat()
    case TDouble    => TypeDescription.createDouble()
    case TString    => TypeDescription.createString()
    case TDate      => TypeDescription.createDate()
    case TTimestamp => TypeDescription.createTimestamp()
    case TBinary    => TypeDescription.createBinary()
    case TDecimal(s, p) =>
      // scale before precision: ORC validates precision >= current scale
      // (default scale 10), same order as the reference (core.clj:339-342)
      var d = TypeDescription.createDecimal()
      s.foreach(ss => d = d.withScale(ss))
      p.foreach(pp => d = d.withPrecision(pp))
      d
    case TVarchar   => TypeDescription.createVarchar()
    case TChar(_)   => TypeDescription.createChar() // length ignored, like the reference
    case TArray(cs) =>
      require(cs.size == 1, s"array typedef must have one child to build a schema, got $cs")
      TypeDescription.createList(toOrc(cs.head))
    case TMap(k, v) => TypeDescription.createMap(toOrc(k), toOrc(v))
    case TStruct(fields) =>
      val st = TypeDescription.createStruct()
      fields.foreach { case (name, ftd) => st.addField(name, toOrc(ftd)) }
      st
    case TUnion(cs) =>
      val u = TypeDescription.createUnion()
      cs.foreach(c => u.addUnionChild(toOrc(c)))
      u
  }

  /** ORC TypeDescription → TypeDef. Mirrors core.clj:305-320 but covers
   * the full category set (the reference omits date/decimal/etc. from
   * its reader-side bridge; we keep the superset for roundtripping). */
  def fromOrc(schema: TypeDescription): TypeDef = {
    import TypeDescription.Category._
    schema.getCategory match {
      case BOOLEAN   => TBoolean
      case BYTE      => TTinyInt
      case SHORT     => TSmallInt
      case INT       => TInt
      case LONG      => TBigInt
      case FLOAT     => TFloat
      case DOUBLE    => TDouble
      case STRING    => TString
      case DATE      => TDate
      case TIMESTAMP => TTimestamp
      case BINARY    => TBinary
      case DECIMAL   => TDecimal(Some(schema.getScale), Some(schema.getPrecision))
      case VARCHAR   => TVarchar
      case CHAR      => TChar(Some(schema.getMaxLength))
      case LIST      => TArray(fromOrc(schema.getChildren.get(0)))
      case MAP       => TMap(fromOrc(schema.getChildren.get(0)), fromOrc(schema.getChildren.get(1)))
      case STRUCT    =>
        val names = schema.getFieldNames
        val kids  = schema.getChildren
        var fields = ListMap.empty[String, TypeDef]
        var i = 0
        while (i < names.size()) { fields = fields + (names.get(i) -> fromOrc(kids.get(i))); i += 1 }
        TStruct(fields)
      case UNION =>
        val kids = schema.getChildren
        val b = Seq.newBuilder[TypeDef]
        var i = 0
        while (i < kids.size()) { b += fromOrc(kids.get(i)); i += 1 }
        TUnion(b.result())
      case other => throw new IllegalArgumentException(s"unsupported ORC category $other")
    }
  }

  /** Hive schema string (e.g. `struct<x:int,y:string>`) → TypeDef. */
  def parse(schemaStr: String): TypeDef = fromOrc(TypeDescription.fromString(schemaStr))

  /** TypeDef → Hive schema string, e.g. `decimal(2,1)`. */
  def print(td: TypeDef): String = toOrc(td).toString

  // ---- Spark DataType bridge ------------------------------------------

  /** TypeDef → Spark DataType. char/varchar map to StringType (Spark
   * treats them as string at runtime; the reference already drops char
   * length — SURVEY §7.4.4). */
  def toSparkType(td: TypeDef): DataType = td match {
    case TBoolean   => BooleanType
    case TTinyInt   => ByteType
    case TSmallInt  => ShortType
    case TInt       => IntegerType
    case TBigInt    => LongType
    case TFloat     => FloatType
    case TDouble    => DoubleType
    case TString    => StringType
    case TVarchar   => StringType
    case TChar(_)   => StringType
    case TBinary    => BinaryType
    case TDate      => DateType
    case TTimestamp => TimestampType
    case TDecimal(s, p) =>
      // ORC defaults: precision 38, scale 10. Cap at Spark's max (38).
      val prec = math.min(p.getOrElse(38), DecimalType.MAX_PRECISION)
      val sc   = math.min(s.getOrElse(10), prec)
      DecimalType(prec, sc)
    case TArray(cs) =>
      require(cs.size == 1, s"array typedef must be simplified to one child, got $cs")
      ArrayType(toSparkType(cs.head), containsNull = true)
    case TMap(k, v) => MapType(toSparkType(k), toSparkType(v), valueContainsNull = true)
    case TStruct(fields) =>
      StructType(fields.toSeq.map { case (n, t) => StructField(n, toSparkType(t), nullable = true) })
    case TUnion(_) =>
      throw new IllegalArgumentException("Spark has no union type (vestigial in the reference too)")
  }

  /** Spark DataType → TypeDef (inverse, for writer paths taking StructType). */
  def fromSparkType(dt: DataType): TypeDef = dt match {
    case BooleanType      => TBoolean
    case ByteType         => TTinyInt
    case ShortType        => TSmallInt
    case IntegerType      => TInt
    case LongType         => TBigInt
    case FloatType        => TFloat
    case DoubleType       => TDouble
    case StringType       => TString
    case BinaryType       => TBinary
    case DateType         => TDate
    case TimestampType    => TTimestamp
    case d: DecimalType   => TDecimal(Some(d.scale), Some(d.precision))
    case ArrayType(c, _)  => TArray(fromSparkType(c))
    case MapType(k, v, _) => TMap(fromSparkType(k), fromSparkType(v))
    case StructType(fs)   => TStruct(ListMap(fs.map(f => f.name -> fromSparkType(f.dataType)): _*))
    case other            => throw new IllegalArgumentException(s"unsupported Spark type $other")
  }
}
