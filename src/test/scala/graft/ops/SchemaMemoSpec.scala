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

  /** Round-15 (round-14 advice): the memo bound evicts only the
    * LEAST-RECENTLY-USED entry instead of clearing everything. Pin the
    * eviction path: an evicted entry re-infers (one footer job) and
    * still reads correctly; a surviving hot entry stays job-free at
    * construction. Jobs are counted through a listener with an RDD
    * sentinel action (listener events are FIFO, so once the sentinel
    * arrives every earlier job is counted). */
  test("LRU eviction: evicted paths re-infer correctly, hot paths stay memoized") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_memo_spec_lru_").toString
    val paths = (1 to 3).map { i =>
      val p = s"$tmp/t$i.parquet"
      spark.range(2).select(col("id").as(s"c$i")).write.parquet(p)
      p
    }
    val savedMax = Relational.schemaMemoMax
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sentinelSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(js.properties).exists(
            _.getProperty("spark.job.description") == "graft_memo_sentinel"))
          sentinelSeen.set(true)
        else { jobs.incrementAndGet(); () }
      }
    }
    // MARKED sentinel (FIFO bus): once its start event arrives, every
    // job the body ran is counted — a bare count-wait could return
    // early while body events are still in flight
    def jobsDuring(body: => Unit): Int = {
      jobs.set(0)
      sentinelSeen.set(false)
      body
      spark.sparkContext.setJobDescription("graft_memo_sentinel")
      spark.sparkContext.parallelize(Seq(1)).count()
      spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!sentinelSeen.get() && System.nanoTime() < deadline) Thread.sleep(20)
      jobs.get()
    }
    try {
      Relational.schemaMemoMax = 2
      // deterministic start: the shared session's memo already holds other
      // suites' entries, and eviction removes one ELDEST entry per put —
      // without a clear, t1 would survive behind them
      Relational.schemaMemoClear()
      spark.sparkContext.addSparkListener(listener)
      // fill: t1, t2 memoized; t2 then t3 touch keeps t2+t3 live, evicts t1
      Relational.cachedSchemaParquet(spark, paths(0))
      Relational.cachedSchemaParquet(spark, paths(1))
      Relational.cachedSchemaParquet(spark, paths(2))
      // t3 is hot: construction must run NO job (memo hit, schema passed explicitly)
      assert(jobsDuring(Relational.cachedSchemaParquet(spark, paths(2))) === 0,
        "hot memo entry re-ran schema inference")
      // t1 was evicted (LRU at bound 2): construction re-infers (>=1 job)
      // and still returns the right schema — eviction costs a job, never
      // correctness
      val evicted = {
        val n = jobsDuring {
          val df = Relational.cachedSchemaParquet(spark, paths(0))
          assert(df.schema.fieldNames.toSeq === Seq("c1"))
        }
        n
      }
      assert(evicted >= 1, "evicted entry did not re-infer (memo unbounded?)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Relational.schemaMemoMax = savedMax
    }
  }
}
