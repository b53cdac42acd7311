package graft.io

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.sql.{Date => SqlDate, Timestamp => SqlTimestamp}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * Lenient, cell-granular encode: convert arbitrary JVM values to the
 * external row representation Spark expects for a target [[DataType]],
 * with **error → NULL, never job failure** — orca's `write-value`
 * doctrine (`src/orca/core.clj:443-450`).
 *
 * Conversion matrix mirrors orca's four conversion protocols
 * (`src/orca/core.clj:452-487`):
 *  - integral targets ← Number (by value), LocalDate (epoch day),
 *    Boolean (1/0)   [`to-long`, :472-480]
 *  - timestamp ← Instant, ISO-8601 string, epoch-millis Number
 *    [`to-instant`, :462-470]
 *  - date ← LocalDate, ISO date string [`to-date`, :482-487]
 *  - string ← anything via `str` [`to-bytes`, :452-460]
 *  - decimal ← anything via `str` then BigDecimal parse [:495-497]
 *
 * Documented divergences from the reference (SURVEY §7.4.5): Spark maps
 * cannot hold NULL keys, so map entries with a null key are dropped
 * (orca writes a NULL key slot, :593-608); booleans stay Boolean on
 * read (orca reads them back as 0/1, :499-504).
 */
object Lenient {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Convert `v` to the external value for `dt`; null when inconvertible
    * (logged at WARN like core.clj:450, never thrown). */
  def convert(v: Any, dt: DataType): Any =
    if (v == null) null
    else
      try convertStrict(v, dt)
      catch {
        case e: Exception =>
          log.warn(s"unable to write $v as $dt: ${e.getMessage}")
          null
      }

  private def toLong(v: Any): Long = v match {
    case n: java.lang.Number  => n.longValue()
    case d: LocalDate         => d.toEpochDay
    case b: java.lang.Boolean => if (b) 1L else 0L
    case other => throw new IllegalArgumentException(s"no long conversion for $other")
  }

  private def toInstant(v: Any): Instant = v match {
    case i: Instant          => i
    case t: SqlTimestamp     => t.toInstant
    case s: String           => Instant.parse(s)
    case n: java.lang.Number => Instant.ofEpochMilli(n.longValue())
    case other => throw new IllegalArgumentException(s"no instant conversion for $other")
  }

  private def toLocalDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case d: SqlDate   => d.toLocalDate
    case s: String    => LocalDate.parse(s, DateTimeFormatter.ISO_DATE)
    case other => throw new IllegalArgumentException(s"no date conversion for $other")
  }

  private def stringify(v: Any): String = v match {
    case s: String       => s
    case s: scala.Symbol => s.name
    case other           => String.valueOf(other)
  }

  private def convertStrict(v: Any, dt: DataType): Any = dt match {
    case ByteType    => toLong(v).toByte
    case ShortType   => toLong(v).toShort
    case IntegerType => toLong(v).toInt
    case LongType    => toLong(v)
    case BooleanType => v match {
      case b: java.lang.Boolean => b
      case n: java.lang.Number  => n.longValue() != 0L
      case other => throw new IllegalArgumentException(s"no boolean conversion for $other")
    }
    case FloatType  => v match {
      case n: java.lang.Number => n.floatValue()
      case other => throw new IllegalArgumentException(s"no float conversion for $other")
    }
    case DoubleType => v match {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"no double conversion for $other")
    }
    case d: DecimalType =>
      // any value stringifies then parses, like HiveDecimalWritable(str v)
      // (core.clj:495-497); scale adjusted to the target (Hive HALF_UP);
      // precision overflow → conversion failure → NULL (lenient doctrine —
      // Spark would otherwise fail the whole write downstream)
      val bd = new JBigDecimal(stringify(v)).setScale(d.scale, RoundingMode.HALF_UP)
      if (bd.precision > d.precision)
        throw new IllegalArgumentException(s"decimal $bd overflows ${d.sql}")
      bd
    case StringType => stringify(v)
    case BinaryType => v match {
      case b: Array[Byte] => b
      case other          => stringify(other).getBytes(StandardCharsets.UTF_8)
    }
    case DateType      => SqlDate.valueOf(toLocalDate(v))
    case TimestampType =>
      SqlTimestamp.from(toInstant(v)) // core.clj:537-538
    case ArrayType(elem, _) => v match {
      case l: java.util.List[_]       => l.asScala.toSeq.map(convert(_, elem))
      case s: scala.collection.Seq[_] => s.toSeq.map(convert(_, elem))
      case other => throw new IllegalArgumentException(s"no array conversion for $other")
    }
    case MapType(kt, vt, _) =>
      val entries: Seq[(Any, Any)] = v match {
        case m: java.util.Map[_, _]        => m.asScala.toSeq.map { case (k, vv) => (k: Any, vv: Any) }
        case m: scala.collection.Map[_, _] => m.toSeq.map { case (k, vv) => (k: Any, vv: Any) }
        case other => throw new IllegalArgumentException(s"no map conversion for $other")
      }
      // null keys dropped: Spark maps cannot hold them (divergence note above)
      entries.collect {
        case (k, vv) if k != null && convert(k, kt) != null => (convert(k, kt), convert(vv, vt))
      }.toMap
    case st: StructType => v match {
      // struct cells look fields up by name; missing → NULL recursively
      // (core.clj:575-579)
      case m: java.util.Map[_, _] =>
        structFromMap(m.asScala.toMap.map { case (k, vv) => graft.typedef.Infer.fieldName(k) -> (vv: Any) }, st)
      case m: scala.collection.Map[_, _] =>
        structFromMap(m.map { case (k, vv) => graft.typedef.Infer.fieldName(k) -> (vv: Any) }.toMap, st)
      case r: Row => structFromMap(st.fieldNames.zip(r.toSeq).toMap, st)
      case other => throw new IllegalArgumentException(s"no struct conversion for $other")
    }
    case other => throw new IllegalArgumentException(s"unsupported target type $other")
  }

  private def structFromMap(m: Map[String, Any], st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => convert(m.getOrElse(f.name, null), f.dataType)))

  /** Encode one logical row (map-shaped → by field name, seq/Row-shaped →
    * positional zip) to a Spark [[Row]] for `schema` — orca's `RowWriter`
    * protocol (core.clj:610-620). */
  def encodeRow(row: Any, schema: StructType): Row = row match {
    case m: java.util.Map[_, _] =>
      structFromMap(m.asScala.toMap.map { case (k, v) => graft.typedef.Infer.fieldName(k) -> (v: Any) }, schema)
    case m: scala.collection.Map[_, _] =>
      structFromMap(m.map { case (k, v) => graft.typedef.Infer.fieldName(k) -> (v: Any) }.toMap, schema)
    case r: Row => Row.fromSeq(schema.fields.toSeq.zip(r.toSeq).map { case (f, v) => convert(v, f.dataType) })
    case s: scala.collection.Seq[_] =>
      // positional rows zip with columns; short rows pad with NULL (core.clj:617-620)
      Row.fromSeq(schema.fields.toSeq.zipAll(s.toSeq.take(schema.length), null, null)
        .map { case (f, v) => if (f == null) null else convert(v, f.dataType) })
    case other =>
      throw new IllegalArgumentException(s"unsupported row shape ${other.getClass}")
  }
}
