package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.typedef.{Infer, InferOptions, Merge, TypeDef}

/**
 * ORC read/write + distributed schema inference — the Spark-native
 * counterpart of the reference's three entry points
 * (`read-vectors` / `write-rows` / `rows->typedef`,
 * `src/orca/core.clj:79-89,622-671,431-437`).
 *
 * Where orca materializes whole files on one thread, everything here is
 * a lazy distributed `DataFrame` / `RDD` program: reads are Spark's
 * vectorized ORC scans, writes shard across executors, and inference is
 * a per-partition fold + tree merge (no driver-side row loop) — the
 * 100 TB design rule (SURVEY §7.4.10).
 */
object OrcIO {

  /**
   * Write options mirroring orca's option map (`src/orca/core.clj:624-638`):
   * `:overwrite? :stripe-size :row-index-stride :enforce-buffer-size?
   * :orc-memory-pool :batch-size`. Stripe size and row-index stride map to
   * ORC writer options; batch size and the memory pool are handled by
   * Spark's vectorized writer / executor memory management and are
   * accepted for API fidelity (`:table-properties` was dead in the
   * reference too, core.clj:624).
   */
  final case class WriteOptions(
      overwrite: Boolean = false,
      stripeSize: Option[Long] = None,
      rowIndexStride: Option[Int] = None,
      bufferSize: Option[Int] = None,
      enforceBufferSize: Boolean = false,
      orcMemoryPool: Double = 0.5,
      batchSize: Int = 1024)

  object WriteOptions { val default: WriteOptions = WriteOptions() }

  /** A1 `orc-read`: the whole-file columnar read, as a lazy distributed
    * scan instead of orca's in-memory frame (core.clj:79-89). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** A1 read with a caller-known schema (round-14 optimization): ORC
    * schema inference is a footer-reading Spark job per DataFrame
    * construction; a caller that just wrote the files (the a2
    * roundtrip) already knows the schema and can skip it.
    * `expected` must be the write schema with every field marked
    * nullable — exactly what inference would return (file formats
    * don't persist nullability) — so the constructed relation is
    * bit-identical to [[readOrc]]'s. */
  def readOrcAs(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    def nullableOf(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nullableOf(f.dataType), nullable = true)))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = nullableOf(a.elementType), containsNull = true)
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = nullableOf(m.keyType), valueType = nullableOf(m.valueType),
          valueContainsNull = true)
      case other => other
    }
    spark.read.schema(nullableOf(expected).asInstanceOf[StructType]).orc(path)
  }

  private def applyOptions[T](w: DataFrameWriter[T], opts: WriteOptions): DataFrameWriter[T] = {
    var out = w.mode(if (opts.overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
    opts.stripeSize.foreach(s => out = out.option("orc.stripe.size", s.toString))
    opts.rowIndexStride.foreach(s => out = out.option("orc.row.index.stride", s.toString))
    // the ORC writer's compression-chunk buffer (orca's :buffer-size knob)
    opts.bufferSize.foreach(s => out = out.option("orc.compress.size", s.toString))
    if (opts.enforceBufferSize) out = out.option("orc.buffer.size.enforce", "true")
    // hive.exec.orc.memory.pool in the reference (core.clj:629-630);
    // the ORC writer's own knob is orc.memory.pool
    if (opts.orcMemoryPool != 0.5) out = out.option("orc.memory.pool", opts.orcMemoryPool.toString)
    out
  }

  /** A2 `orc-write` for an already-typed DataFrame. */
  def writeOrc(df: DataFrame, path: String, opts: WriteOptions = WriteOptions.default): Unit =
    applyOptions(df.write.format("orc"), opts).save(path)

  /** Lenient row encode (A8): arbitrary JVM rows + target schema →
    * DataFrame. Cell conversion failures become NULL, never job failures
    * (core.clj:443-450). */
  def rowsToDF(spark: SparkSession, rows: RDD[Any], schema: StructType): DataFrame =
    spark.createDataFrame(rows.map(Lenient.encodeRow(_, schema)), schema)

  def rowsToDF(spark: SparkSession, rows: Seq[Any], schema: StructType): DataFrame =
    rowsToDF(spark, spark.sparkContext.parallelize(rows, math.max(1, math.min(rows.size, 4))), schema)

  /** A2 `write-rows` (core.clj:662-671): row seq + Hive schema string →
    * ORC file. Schema string validated up front like the reference's
    * `TypeDescription/fromString` precondition (core.clj:626). */
  def writeRows(spark: SparkSession, path: String, rows: Seq[Any], schemaStr: String,
      opts: WriteOptions = WriteOptions.default): Unit =
    writeOrc(rowsToDF(spark, rows, structOf(schemaStr)), path, opts)

  /** Distributed variant for unbounded row sources. */
  def writeRows(spark: SparkSession, path: String, rows: RDD[Any], schemaStr: String,
      opts: WriteOptions): Unit =
    writeOrc(rowsToDF(spark, rows, structOf(schemaStr)), path, opts)

  private def structOf(schemaStr: String): StructType =
    TypeDef.toSparkType(TypeDef.parse(schemaStr)).asInstanceOf[StructType]

  /** A7 `rows->typedef` (core.clj:431-437), distributed: per-partition
    * infer + simplify + local fold, then tree-merge of one typedef per
    * partition — map-side combine keeps the shuffle at one record per
    * partition regardless of data size.
    *
    * Semantics note (property-discovered, see Merge scaladoc): the merge
    * algebra is order-dependent in two corners — mutually-convertible
    * pairs (string↔double) and absorbing chains (string⊔int⊔date folds
    * to string sequentially, but int⊔date alone throws). There the
    * tree-merge may produce a different (or failing) result than the
    * reference's strictly sequential fold, depending on partitioning.
    * On order-free domains (everything else) the two agree exactly. */
  def inferTypeDef(rows: RDD[_], opts: InferOptions = InferOptions.default): Option[TypeDef] = {
    val perPartition: RDD[TypeDef] = rows.mapPartitions { it =>
      var acc: Option[TypeDef] = None
      it.foreach { v =>
        Infer.infer(v, opts).flatMap(Merge.simplify) match {
          case Some(td) => acc = Some(acc.fold(td)(Merge.merge(_, td)))
          case None     =>
        }
      }
      acc.iterator
    }
    perPartition.treeReduce2(Merge.merge)
  }

  implicit private class TreeReduceOpt[T: scala.reflect.ClassTag](val rdd: RDD[T]) {
    /** treeReduce that tolerates an empty RDD by returning None. */
    def treeReduce2(f: (T, T) => T): Option[T] = {
      val parts = rdd.mapPartitions(it => if (it.hasNext) Iterator.single(it.reduce(f)) else Iterator.empty)
        .collect() // ≤ one element per partition — driver-safe at any scale
      if (parts.isEmpty) None else Some(parts.reduce(f))
    }
  }

  def inferSchema(rows: RDD[_], opts: InferOptions = InferOptions.default): Option[StructType] =
    inferTypeDef(rows, opts).flatMap(Merge.simplify).map(TypeDef.toSparkType(_) match {
      case st: StructType => st
      case other          => new StructType().add("value", other)
    })

  /** A10 `stats` (core.clj:220-226): count includes NULLs (orca counts
    * every row), sum/min/max exclude them — hence count(*), not count(col). */
  def stats(df: DataFrame, colName: String): DataFrame =
    df.agg(
      count(lit(1)).as("count"),
      sum(col(colName)).as("sum"),
      min(col(colName)).as("min"),
      max(col(colName)).as("max"))

  /** A11 frame utilities (core.clj:679-683) — test-only driver-side
    * materialization; never used inside Tier B/C operators. */
  def frameVecs(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)
  def frameMaps(df: DataFrame): Seq[Map[String, Any]] = {
    val names = df.schema.fieldNames.toSeq
    df.collect().toSeq.map(r => names.zip(r.toSeq).toMap)
  }

  /** A9 opt-in orca-compat collect (SURVEY §7.4.5): reproduces the
    * reference's read-side value asymmetries for behavioral-fidelity
    * tests — booleans read back as 0/1 (core.clj:499-504: the Long
    * vector reader has no BOOLEAN branch), floats widen to Double
    * (:512-519), binary decodes as UTF-8 String (:521-525), dates as
    * LocalDate, timestamps as Instant (:531-534), structs as maps that
    * OMIT null fields (:566-571), and empty maps read as null
    * (:583-591). The normal DataFrame surface returns proper Spark
    * types; this shim exists only where exact orca frames are needed. */
  def orcaCompatMaps(df: DataFrame): Seq[Map[String, Any]] = {
    def conv(v: Any): Any = v match {
      case null                     => null
      case b: java.lang.Boolean     => if (b) 1L else 0L
      case f: java.lang.Float       => f.toDouble
      case b: Array[Byte]           => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case d: java.sql.Date         => d.toLocalDate
      case t: java.sql.Timestamp    => t.toInstant
      case r: Row =>
        r.schema.fieldNames.zip(r.toSeq).collect { case (n, fv) if fv != null => n -> conv(fv) }.toMap
      case m: scala.collection.Map[_, _] =>
        if (m.isEmpty) null
        else m.map { case (k, vv) => conv(k) -> conv(vv) }.toMap
      case s: scala.collection.Seq[_] => s.map(conv)
      case other                    => other
    }
    frameMaps(df).map(_.map { case (k, v) => k -> conv(v) })
  }
}
