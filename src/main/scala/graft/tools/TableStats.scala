package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Per-relation truth for the planner: register the SF dir's parquet
 * tables in the session catalog and ANALYZE them (row counts + column
 * stats + equi-height histograms), so Catalyst's cost-based estimation
 * can SHRINK filtered dimension lists below the broadcast threshold.
 *
 * Why this exists (round-11 EXPLAIN finding 2): without column stats a
 * filter never shrinks a non-CBO size estimate — column PRUNING does,
 * but the 2–3-column projection of a 20M-row dim still estimates tens
 * of MB, so the Q8/Q9/Q19/Q20 shapes fell back to SortMergeJoin at
 * sf100 and shuffled the fact table on partkey repeatedly (q20: 17.1 GB
 * for a query that shuffles 0.23 GB at sf10). Round 11 patched this
 * with a static 64 MB threshold — correct at sf100, measured to
 * backfire at 256 MB (fact-side aggregates became single-threaded
 * driver broadcast builds) — i.e. a posture, not per-relation truth.
 * ANALYZE gives the planner the truth instead: equality/IN/range
 * predicates scale the row count by 1/ndv or histogram mass, and the
 * estimated byte size of a filtered, pruned dim list lands near its
 * actual size, making the broadcast decision scale-invariant (this is
 * exactly what a production warehouse does — Spark's own docs, and
 * every Hive/Trino deployment, run ANALYZE after load).
 *
 * Mechanics: `CREATE TABLE … USING parquet LOCATION` registers an
 * external table over the SAME files the registry reads (no copy);
 * `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` scans once and
 * stores stats in the in-memory session catalog. [[graft.ops.Relational.table]]
 * resolves through the catalog when `graft.catalog.statsDir` names the
 * dir, so every registry query — and the temp views the SQL shapes
 * create over it — carries the stats into planning. Limits, stated
 * honestly: stats die with the session (an external metastore would
 * persist them); LIKE '%…%' predicates get no CBO shrink (estimation
 * unsupported), so contains-filtered dims (q9's part list) still rely
 * on pruned-width estimates.
 *
 * Usage as a main (plan rehearsal): runMain graft.tools.TableStats
 * <dir> <query>[,query…] — registers + analyzes, then prints each
 * query's join operators and per-side size estimates at the DEFAULT
 * broadcast threshold, with CBO on.
 */
object TableStats {

  /** The relational tables the TPC-H surface reads. */
  val relationalTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** Register `tables` from `dir` as external catalog tables and
    * ANALYZE them with column stats; flips the conf that routes
    * [[graft.ops.Relational.table]] through the catalog and enables
    * CBO for the session. Idempotent per (session, dir). */
  def register(spark: SparkSession, dir: String,
               tables: Seq[String] = relationalTables): Unit = {
    if (spark.conf.getOption("graft.catalog.statsDir").contains(dir)) return
    // equi-height histograms make range predicates (p_size BETWEEN …)
    // estimate by actual mass, not the uniform-interval heuristic
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("graft.catalog.statsDir", dir)
  }

  /** One line per join in the optimized+planned query: the physical
    * join kind and each side's CBO size estimate — the evidence a
    * broadcast-decision rehearsal needs. */
  def joinReport(spark: SparkSession, name: String, dir: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    // sparkPlan, NOT executedPlan: under AQE the executed plan is an
    // AdaptiveSparkPlanExec shell with no children until runtime, and
    // the PLAN-TIME join choice is the one that matters anyway (AQE's
    // SMJ→BHJ conversion fires after the map stage wrote its shuffle —
    // measured useless for this class, round-11 EXPLAIN finding 2)
    // string-scrape rather than a typed walk: on the PRE-prepared plan
    // `subqueries` still holds logical placeholders (typed access
    // class-casts), and the join node names in the rendered plan are
    // stable identifiers
    val rendered = df.queryExecution.sparkPlan.toString
    "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)\\s+\\S*\\s*\\[?[^,\\n]*,?[^\\n]*?(Inner|LeftSemi|LeftAnti|LeftOuter|RightOuter|FullOuter|Cross)".r
      .findAllMatchIn(rendered).map { m =>
        val kind = m.group(1) match {
          case "BroadcastHashJoin" => "BHJ"
          case "SortMergeJoin"     => "SMJ"
          case _                   => "SHJ"
        }
        s"$kind(${m.group(2)})"
      }.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val queries = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "1024"))
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B knobs: SPARK_GRAFT_NO_STATS=1 skips ANALYZE (the no-stats
    // baseline); SPARK_GRAFT_BCAST sets the static threshold (the
    // round-11 64 MB posture, for comparison)
    sys.env.get("SPARK_GRAFT_BCAST").foreach(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    if (!sys.env.get("SPARK_GRAFT_NO_STATS").exists(_ == "1")) {
      val t0 = System.nanoTime()
      register(spark, dir)
      System.err.println(f"[stats] ANALYZE of ${relationalTables.size} tables took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    queries.foreach { q =>
      println(s"""{"query":"$q","joins":[${joinReport(spark, q, dir).map("\"" + _ + "\"").mkString(",")}]}""")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "1"))
        System.err.println(graft.SparkEntry.queries(q)(spark, dir)
          .queryExecution.sparkPlan.toString)
    }
    spark.stop()
  }
}
