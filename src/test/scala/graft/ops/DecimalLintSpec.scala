package graft.ops

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Guard rail for the decimal-literal trap class (round-11 verdict item
  * 7 — it bit three times: b12c round 8/9, c18b round 10, b51 dodged it
  * round 11). In Spark SQL a bare literal like `10000.0` parses as
  * DECIMAL(5,1), so `bigint / 10000.0` yields DECIMAL(26,4) where
  * DuckDB's same division yields DOUBLE — the values agree but the
  * driver's TYPED hash diverges (b12c), and decimal intermediates
  * under ln/division drift in the 4th decimal at scale (c18b). The
  * repo convention is `cast(<lit> as double)` in every Spark-side SQL
  * text (`msumSpark`), and this spec ENFORCES it structurally: the
  * OPTIMIZED plan of every lintable registry query must contain no
  * DecimalType-typed expression anywhere — literal, arithmetic, or
  * output column. Checking plan types instead of regexing source text
  * makes the lint immune to comments/oracle strings (where bare
  * decimal literals are legitimate: DuckDB promotes decimal division
  * to DOUBLE) and catches the DataFrame-API spelling of the same trap
  * (`lit(BigDecimal(...))`) that no text walk would see.
  *
  * Scope: every registry key whose DataFrame CONSTRUCTION is
  * side-effect-free (plan-only — nothing executes). Keys that fit
  * models / build indexes / run streams at construction time are
  * skipped by prefix: their SQL surface is DataFrame-API code already
  * covered by their own hash-matched oracles, and constructing them
  * here would re-run minutes of fitting per lint. The skip list is
  * prefixes, not names, so NEW keys lint by default. */
class DecimalLintSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** Constructor-eager families (fit/build/replay on construction). */
  private val eagerPrefixes = Seq(
    "c2_", "c22", "c27", "c28", "c29", "c3_", "c32", "c33", "c9_",
    "c21_", "c24b", "c14", "c37", "c31", "c15b", "a2_", "a7_", "c5_", "c6_",
    "c43b")

  private def decimalNodes(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach { node =>
      node.expressions.foreach(_.foreach { e =>
        // some expression nodes (WindowSpecDefinition) have no dataType
        val dt = scala.util.Try(e.dataType).toOption
        if (e.resolved && dt.exists(_.isInstanceOf[DecimalType]))
          bad += s"${e.getClass.getSimpleName}:${e.sql.take(80)}"
      })
    }
    bad.toSeq.distinct
  }

  test("no registry query carries DECIMAL-typed expressions (the b12c/c18b trap class)") {
    val keys = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => eagerPrefixes.exists(k.startsWith))
    assert(keys.size >= 80, s"lint scope collapsed to ${keys.size} keys — check the skip list")
    val offenders = keys.flatMap { k =>
      val bad = decimalNodes(graft.SparkEntry.queries(k)(spark, dir))
      if (bad.isEmpty) Nil
      else Seq(s"$k: ${bad.take(3).mkString("; ")}")
    }
    assert(offenders.isEmpty,
      "DECIMAL-typed expressions found — cast the literal to double " +
        "(`cast(10000.0 as double)` / lit(10000.0), the msumSpark convention), " +
        s"or the driver's typed hash will diverge from DuckDB:\n${offenders.mkString("\n")}")
  }

  test("the lint actually fires on the planted trap spelling") {
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val trapped = spark.sql(
      "SELECT sum(cast(round(l_quantity * 10000, 0) as bigint)) / 10000.0 AS q FROM lineitem")
    assert(decimalNodes(trapped).nonEmpty, "lint failed to flag bigint / 10000.0")
    val fixed = spark.sql(
      "SELECT sum(cast(round(l_quantity * 10000, 0) as bigint)) / cast(10000.0 as double) AS q FROM lineitem")
    assert(decimalNodes(fixed).isEmpty, "lint flagged the cast-to-double convention")
  }
}
