package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.io.OrcIO
import graft.ops.Relational
import graft.typedef.{InferOptions, Merge, TypeDef}

/**
 * JSON ingestion driven by graft's own inference algebra (SURVEY §1.2:
 * the closest Spark analogue is `JsonInferSchema`, but ours carries
 * orca's value-dependent narrowing and option set): parse JSON to JVM
 * maps on executors, run the distributed per-partition infer +
 * tree-merge, then hand Spark the resulting schema for a vectorized
 * typed read. Two surfaces:
 *
 *  - [[readJson]]: whole-file JSON-lines source with graft-inferred schema
 *  - [[inferJsonColumn]]: schema discovery for a JSON *string column*
 *    (e.g. `events.props`) → `from_json` with the inferred StructType
 */
object JsonInfer {

  // Jackson ships with Spark; one mapper per executor thread is fine
  @transient private lazy val mapper = new ObjectMapper()

  /** Parse one JSON document to plain JVM values (java.util.Map /
    * java.util.List / Number / String / Boolean / null) — the input
    * shape the typedef inference understands. Unparseable → null
    * (lenient doctrine, like A8). */
  def parseLenient(s: String): Any =
    try mapper.readValue(s, classOf[Object])
    catch { case _: Exception => null }

  /** Distributed schema inference over JSON strings: parse per
    * partition, infer + simplify per value, tree-merge. Narrowing is
    * value-dependent (a column of 0..100 infers tinyint). */
  def inferJsonRdd(rows: RDD[String], opts: InferOptions = InferOptions.default): Option[StructType] =
    OrcIO.inferSchema(rows.map(parseLenient), opts)

  /** JSON-lines file → DataFrame with graft-inferred schema (instead of
    * Spark's sampling-based inference). */
  def readJson(spark: SparkSession, path: String,
      opts: InferOptions = InferOptions.default): DataFrame = {
    val lines = spark.sparkContext.textFile(path)
    val schema = inferJsonRdd(lines, opts)
      .getOrElse(throw new IllegalArgumentException(s"no inferrable rows in $path"))
    spark.read.schema(schema).json(path)
  }

  /** Schema discovery for a JSON string column. */
  def inferJsonColumn(df: DataFrame, colName: String,
      opts: InferOptions = InferOptions.default): Option[StructType] =
    inferJsonRdd(df.select(col(colName)).rdd.map(_.getString(0)), opts)

  /** c7 query: discover the schema of `events.props` with the typedef
    * algebra, then parse with it — value-identical to b18's per-path
    * extraction (same oracle), but through a typed struct the engine
    * can prune and push into. */
  def jsonPropsInferred(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.table(spark, dir, "events")
    val schema = inferJsonColumn(events, "props")
      .getOrElse(throw new IllegalStateException("props column yielded no schema"))
    events
      .select(col("event_id"), from_json(col("props"), schema).as("p"))
      .select(col("event_id"), col("p.k").cast("int").as("k"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c7_json_infer" -> (jsonPropsInferred _))

  val oracleSql: Map[String, String] = Map(
    "c7_json_infer" ->
      """SELECT event_id, cast(json_extract(props, '$.k') as int) AS k
        |FROM events ORDER BY event_id""".stripMargin)
}
