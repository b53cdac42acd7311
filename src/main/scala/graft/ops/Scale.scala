package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale machinery the optimizer can't derive on its own (SURVEY §7.4.10,
 * builder contract "Partitioning & shuffle"):
 *
 *  - **Salted join** for skewed keys: spread a hot key across `buckets`
 *    sub-partitions by salting the big side deterministically and
 *    replicating the small side per salt. AQE's skew-join splits
 *    oversized partitions after a shuffle exists; salting removes the
 *    hot partition up front and composes with any join type.
 *  - **Bucketed join** for co-located repeat joins: persist both sides
 *    bucketed by the join key → Spark plans a sort-merge join with NO
 *    shuffle exchange on either side (asserted in PlanSpec). At 100 TB
 *    this turns every repeated fact⋈fact join on the bucket key into a
 *    local merge.
 *
 * Both register as queries whose oracle is the PLAIN join result —
 * the scale path must be value-identical to the naive one.
 */
object Scale {

  /** Pin a frame's lineage: reliable `checkpoint()` onto
    * `graft.checkpoint.dir` when the conf names a cluster-visible path,
    * `localCheckpoint()` otherwise. localCheckpoint stores blocks on
    * executors — fine on local[n], unrecoverable on a real cluster if
    * an executor dies mid-job (truncated lineage cannot recompute) —
    * so every production-sized intermediate pin routes through here
    * (c14 cluster iteration, the c43c lexical fit) and the knob flips
    * them all to durable storage at once. */
  private[graft] def pin(df: DataFrame): DataFrame = {
    val reliableDir = df.sparkSession.conf.getOption("graft.checkpoint.dir")
    reliableDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    if (reliableDir.isDefined) {
      // persist BEFORE the reliable checkpoint: Dataset.checkpoint()'s
      // eager count and ReliableRDDCheckpointData's file-write job are
      // two separate jobs — without a persisted intermediate the full
      // lineage (for the lex fit: the corpus explode + tf shuffle)
      // recomputes for the write, exactly the double corpus pass the
      // pin exists to prevent (Spark's own RDD.checkpoint guidance)
      df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val pinned = df.checkpoint()
      df.unpersist()
      pinned
    } else df.localCheckpoint()
  }

  /** Size a compute-heavy scan for parallelism WITHOUT a gratuitous
    * shuffle: repartition up to core parallelism ONLY when the source
    * arrives under-partitioned (the local single-file testdata shape —
    * shingle/gram/signature work at file-count parallelism starves
    * every core but a few, watched at sf1). A production 100 TB scan
    * arrives thousands-partitioned and passes through UNTOUCHED:
    * repartitioning it would shuffle every corpus text byte before the
    * first projection, contradicting the zero-corpus-side-exchange
    * design of the gram/shingle family. This is the `a2_roundtrip`
    * sizing doctrine (SparkEntry) applied to the whole family;
    * PlanSpec pins no-Exchange on a many-partitioned source. */
  def sizeForCompute(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Exchange-bearing frames pass through WITHOUT the partition probe:
    // their output parallelism is already the shuffle.partitions config
    // (sized to cores), and — the sharper reason — `df.rdd` under AQE
    // EXECUTES the plan's query stages eagerly to fix the final plan,
    // so probing a joined/aggregated frame would run its shuffles twice
    // (once here, once in the real query). Callers size the raw SCAN
    // before any join for exactly this reason. For exchange-free frames
    // (scans/projections) `.rdd` is pure planning — no job runs.
    if (hasExchange(df)) df
    else if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** True when the physical plan carries any exchange NODE — a
    * node-type walk, not a string match (a stray "Exchange" anywhere in
    * a rendered plan must not silently disable the sizing this helper
    * exists for). A shuffle exchange means output parallelism is
    * already the shuffle.partitions config; and under AQE, `.rdd` on
    * ANY exchange-bearing plan executes its query stages eagerly — the
    * zero-jobs-during-sizing contract (PlanSpec). Broadcast-only plans
    * (a broadcast join whose probe side is a scan) are DELIBERATELY
    * passed through as well: probing one would build the broadcast
    * relation as a job, and every caller sizes the raw scan BEFORE any
    * join, so a broadcast-bearing frame arriving here is a caller
    * contract breach to surface in review — not a sizing opportunity
    * worth an eager job. Two AQE leaf wrappers hide subtrees from a
    * naive traversal and get descended explicitly:
    * AdaptiveSparkPlanExec (children = Nil; its `inputPlan` is
    * PRE-EnsureRequirements and carries no exchanges yet, so the walk
    * reads its current plan, which does) and QueryStageExec (wraps an
    * already-materialized exchange). */
  private def hasExchange(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    def walk(p: SparkPlan): Boolean = p.exists {
      case _: Exchange => true
      case _: QueryStageExec => true // wraps a materialized exchange
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => false
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Size a small-row (8-byte id column) WRITE: repartition up for
    * parallelism when under-partitioned; when the source arrives far
    * more-partitioned than cores, coalesce — shuffle-FREE — to bound
    * the output file count (a fragmented ids sidecar is exactly what
    * its read-guard cost model forbids; see appendToIvfIndex). */
  def sizeForWrite(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (hasExchange(df)) df // see sizeForCompute: no .rdd probe on AQE stages
    else {
      val n = df.rdd.getNumPartitions
      if (n < cores) df.repartition(cores)
      else if (n > cores * 4) df.coalesce(cores * 4)
      else df
    }
  }

  /** Deterministic salt: hash of the whole row spreads a hot key's rows
    * across buckets without RNG state (reproducible on any cluster). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets)).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded,
      salted(bigKey) === expanded(smallKey) && salted("__salt") === expanded("__salt"))
      .drop("__salt")
  }

  // b20 — the b4 join executed through the salt path; same oracle as b4
  def joinSalted(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Relational.table(spark, dir, "orders"),
      Relational.table(spark, dir, "customer"),
      "o_custkey", "c_custkey", buckets = 8)
      .select(col("o_orderkey"), col("c_name"), round(col("o_totalprice"), 4).as("total"))
      .orderBy("o_orderkey")

  /** Persist both sides bucketed+sorted by the join key (in-session
    * catalog; on a real cluster these are long-lived bucketed tables). */
  def bucketedTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    Relational.table(spark, dir, "orders").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").mode(SaveMode.Overwrite).saveAsTable("graft_orders_b")
    Relational.table(spark, dir, "customer").write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").mode(SaveMode.Overwrite).saveAsTable("graft_customer_b")
    (spark.table("graft_orders_b"), spark.table("graft_customer_b"))
  }

  // b21 — the b4 join over bucketed tables (shuffle-free sort-merge);
  // same oracle as b4
  def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val (orders, customer) = bucketedTables(spark, dir)
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), round(col("o_totalprice"), 4).as("total"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b20_join_salted" -> (joinSalted _),
    "b21_join_bucketed" -> (joinBucketed _))

  private val b4Oracle =
    """SELECT o_orderkey, c_name, round(o_totalprice, 4) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "b20_join_salted" -> b4Oracle,
    "b21_join_bucketed" -> b4Oracle)
}
