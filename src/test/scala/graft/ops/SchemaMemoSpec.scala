package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The round-14 schema memo (`Relational.cachedSchemaParquet`) changed
  * how every table/index read constructs: the inferred schema is
  * memoized per (conf posture, path, file-listing signature) and later
  * constructions skip the footer-inference job. These tests pin the
  * properties that make that safe: the memoized relation is identical
  * to the inferred one, and a rewrite at the same path is picked up —
  * never served a stale schema. */
class SchemaMemoSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("memoized read is identical to the inferred read (schema and rows)") {
    val inferred = spark.read.parquet(s"$dir/customer.parquet")
    // second construction goes through the memo (first call filled it)
    Relational.table(spark, dir, "customer")
    val memoized = Relational.table(spark, dir, "customer")
    assert(memoized.schema === inferred.schema,
      s"memoized schema drifted:\n${memoized.schema}\nvs inferred:\n${inferred.schema}")
    assert(memoized.exceptAll(inferred).isEmpty && inferred.exceptAll(memoized).isEmpty,
      "memoized relation rows differ from the inferred read")
  }

  test("a rewrite at the same path re-infers — the memo never serves a stale schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_memo_spec_").toString
    val path = s"$tmp/t.parquet"
    spark.range(3).select(col("id").as("a")).write.parquet(path)
    val first = Relational.cachedSchemaParquet(spark, path)
    assert(first.schema.fieldNames.toSeq === Seq("a"))
    // rewrite with a DIFFERENT schema at the same path
    spark.range(3).select(col("id").as("a"), lit("x").as("b"))
      .write.mode("overwrite").parquet(path)
    val second = Relational.cachedSchemaParquet(spark, path)
    assert(second.schema.fieldNames.toSeq === Seq("a", "b"),
      s"stale memoized schema served after rewrite: ${second.schema}")
    assert(second.count() === 3L)
  }

  test("a missing path still fails like a plain read, and does not poison the memo") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_memo_spec_miss_").toString
    val path = s"$tmp/never_written.parquet"
    intercept[Exception] { Relational.cachedSchemaParquet(spark, path).count() }
    // now write it — the earlier failure must not have cached anything
    spark.range(2).select(col("id").as("z")).write.parquet(path)
    assert(Relational.cachedSchemaParquet(spark, path).schema.fieldNames.toSeq === Seq("z"))
  }
}
