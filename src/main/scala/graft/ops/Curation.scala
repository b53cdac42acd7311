package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Tier C — training-data curation operators beyond the dedup/similarity
 * core (SURVEY §2 Tier C extensions): benchmark decontamination,
 * deterministic stratified sampling, near-dup clustering (connected
 * components), and token-budget sequence packing. Like the rest of the
 * tier these have no counterpart in the reference (its README scopes it
 * to the encode half of an analytics stack); they are the operations a
 * 100 TB pretraining-corpus pipeline runs between "raw corpus" and
 * "training shards".
 *
 * Scale doctrine per op:
 *  - decontaminate: the benchmark side is small by construction (eval
 *    sets are thousands of docs, not billions) → broadcast it — as
 *    8-byte xxhash64 gram keys, not raw 13-token strings, so a real
 *    eval suite (10k docs × ~1k grams) broadcasts ~80 MB instead of
 *    ~1 GB. The corpus n-grams then never hash-shuffle at all.
 *  - sampleStratified: a pure map (overflow-free multiplicative-hash
 *    bucket + per-stratum threshold) — no shuffle, no RNG state,
 *    reproducible on any cluster and any partitioning.
 *  - dedupCluster: exact duplicates contract to one representative per
 *    text BEFORE any pairwise work (d-fold duplication would otherwise
 *    cost d² per clique); candidate edges come from the banded-MinHash
 *    path (no O(n²)); label propagation shuffles only (id, label) pairs and
 *    converges in O(component diameter) rounds — near-dup clusters are
 *    shallow (dup chains, not long paths), so this beats the constant
 *    factors of large-star/small-star until diameters grow past ~10.
 *    Each round checkpoints to truncate lineage; exiting the round cap
 *    unconverged THROWS (a silent exit would return wrong labels).
 *  - packSequences: one window per (lang, shard) stratum — shard is a
 *    deterministic doc_id range bucket, so the majority language never
 *    lands on a single task chain; packing is embarrassingly parallel
 *    across composite strata.
 */
object Curation {

  // ------------------------------------------------- C12 decontamination

  /** Token n-gram size for contamination checks: 13 is the published
    * standard for pretraining-corpus decontamination (long enough that
    * natural re-use is rare, short enough to survive light edits). */
  private val ngramN = 13

  /** C12 — benchmark decontamination: flag every corpus document sharing
    * at least one 13-token-gram with the held-out eval slice (here: the
    * deterministic `doc_id % 20 = 0` split of `documents`, standing in
    * for an external benchmark table). Docs shorter than 13 tokens carry
    * no grams and can never be flagged — mirrored exactly in the oracle.
    *
    * Both sides compare xxhash64(gram) longs, not gram strings: the
    * broadcast build carries 8 bytes per eval gram and the streamed
    * corpus rows carry 8-byte keys into the join. A 64-bit collision
    * flags a doc spuriously with probability ~n_grams²/2⁶⁴ (≪1e-9 even
    * at 100 TB gram counts); CurationSpec proves zero collisions across
    * the whole test corpus. The oracle compares the strings directly —
    * identical output absent collisions.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // gram work must scale with cores, not input file count
    val grams = Relational.table(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(expr(
        s"""transform(array(split(text, ' ')), toks ->
           |  CASE WHEN size(toks) >= $ngramN THEN
           |    array_distinct(transform(sequence(0, size(toks) - $ngramN),
           |      i -> xxhash64(concat_ws(' ', slice(toks, i + 1, $ngramN)))))
           |  ELSE array() END)[0]""".stripMargin)).as("gram_h"))
    val evalGrams = grams.filter(col("doc_id") % 20 === 0)
      .select(col("gram_h")).distinct()
    grams.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram_h")).as("n_shared"))
      .orderBy("doc_id")
  }

  // -------------------------------------------- C13 stratified sampling

  /** Modulus for the pre-multiply reduction: any doc_id maps into
    * [0, 1e9+7), so the Knuth multiply stays < 2.66e18 — inside long
    * range for EVERY input id (the unreduced form overflows at
    * doc_id ≳ 3.5e9, exactly when a corpus gets large; Spark would wrap
    * or throw under ANSI while DuckDB errors, breaking engine parity). */
  private val bucketMod = 1000000007L
  private val knuth = 2654435761L

  /** Overflow-free deterministic bucket in [0, 100): reduce mod a prime,
    * Knuth-multiply, take bits 16+ (the low bits of a multiplicative
    * hash are the weak ones — and using them directly would make the
    * bucket a relabeled `doc_id % 100`, correlating with any id-assignment
    * pattern). Pure integer ops with identical semantics in Spark and
    * DuckDB for non-negative ids — the oracle evaluates the same text. */
  private[ops] def bucketExpr(idCol: String) =
    expr(s"((($idCol % $bucketMod) * $knuth) div 65536) % 100")

  private def bucketSql(idCol: String) =
    s"((($idCol % $bucketMod) * $knuth) // 65536) % 100"

  /** C13 — deterministic stratified sampling: per-stratum keep rates
    * applied through an overflow-free multiplicative-hash bucket of the
    * row key, so the sample is reproducible across engines,
    * partitionings, and reruns (no RNG state — the property `df.sample`
    * cannot give). Downsamples the majority stratum (en → 10%) and
    * keeps 40% of the rest — the shape of a language-rebalancing pass
    * over a crawl corpus. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "documents")
      .withColumn("bucket", bucketExpr("doc_id"))
      .filter(col("bucket") < when(col("lang") === "en", 10).otherwise(40))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  // ------------------------------------------- C14 near-dup clustering

  /** C14 — near-duplicate clustering: connected components over the
    * near-dup pair graph (J ≥ 0.8 on 3-gram shingles), labeling every
    * involved doc with the minimum doc_id reachable through dup edges.
    * This is the step that turns pairwise dedup into "keep one doc per
    * dup CLUSTER": pairwise removal of the higher id can drop both b
    * and c of a chain a~b, b~c while cluster-level removal keeps
    * exactly one.
    *
    * Exact duplicates are CONTRACTED first ([[Similarity.exactDupGroups]]):
    * label propagation runs over near-dup edges among unique-text
    * representatives only, then labels broadcast back onto all group
    * members. Identical texts are J = 1 pairs, so components are
    * unchanged — but the pairwise path materializes Θ(d²) edges per
    * d-copy clique (the sf10 ×100-replicated corpus, 5000 cliques of
    * 100, holds ~25M edges and timed out at 1800 s) while the
    * contracted path's graph scales with unique texts (same corpus:
    * 5000 nodes, seconds). A doc is in the output iff it has a dup
    * edge: grp_n > 1 (exact dup) or its rep carries a near-dup edge;
    * the component minimum is the min over reps (every doc_id ≥ its
    * rep), so cluster ids are identical to the uncontracted result. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val groups = Similarity.exactDupGroups(spark, dir)
    val repLabels = clusterPairs(spark,
        Similarity.nearDupRepPairs(spark, dir).select(col("da"), col("db")))
      .withColumnRenamed("id", "rep")
    groups.join(repLabels, Seq("rep"), "left")
      .filter(col("label").isNotNull || col("grp_n") > 1)
      .select(col("doc_id"), coalesce(col("label"), col("rep")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Min-label propagation over DataFrames: labels start as own id; each
    * round takes the min of own and neighbors' labels until a fixpoint.
    * Rounds = component diameter (shallow for dup clusters). The edge
    * set is computed ONCE and persisted — only (id, label) pairs move
    * per round — and each round checkpoints to keep the plan flat (an
    * unbounded iterative lineage re-executes the LSH pipeline every
    * round and overflows the optimizer at scale).
    *
    * Exiting the round cap without a fixpoint THROWS: a component whose
    * diameter exceeds `maxRounds` (an adversarial dup chain at 100 TB)
    * would otherwise get silently wrong labels. Raise the cap via
    * `graft.cluster.maxRounds` (diameter-many rounds always suffice).
    *
    * Durability: `localCheckpoint` stores blocks on executors — fine on
    * local[n], unrecoverable on a real cluster if an executor dies
    * mid-iteration (truncated lineage cannot recompute). Set
    * `graft.checkpoint.dir` to a cluster-visible path to switch every
    * iteration pin to reliable `checkpoint()` on that FS.
    */
  def clusterPairs(spark: SparkSession, pairDf: DataFrame,
                   maxRoundsDefault: Int = 50): DataFrame = {
    val maxRounds = spark.conf.getOption("graft.cluster.maxRounds")
      .map(_.toInt).getOrElse(maxRoundsDefault)
    val reliableDir = spark.conf.getOption("graft.checkpoint.dir")
    reliableDir.foreach(spark.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val pairs = pin(pairDf.toDF("da", "db"))
    val edges = pairs.unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
    var labels = edges.select(col("da").as("id")).distinct()
      .withColumn("label", col("id"))
    labels = pin(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val fromNeighbors = edges.join(labels, edges("da") === labels("id"))
        .select(edges("db").as("id"), col("label"))
      val next = pin(labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label")))
      converged = next.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).isEmpty
      labels = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedupCluster: label propagation did not reach a fixpoint in $maxRounds rounds — " +
          "a component's diameter exceeds the cap and its labels would be WRONG; " +
          "raise spark.conf graft.cluster.maxRounds (diameter-many rounds always converge)")
    labels
  }

  // --------------------------------------------- C15 sequence packing

  private val packBudget = 512

  /** Docs per packing shard (contiguous doc_id ranges). 128 splits even
    * the sf0.01 corpus into multiple shards per language; override via
    * `graft.pack.shardSpan` to match the target shard token budget. */
  private val shardSpanDefault = 128L

  /** C15 — token-budget sequence packing (concat-then-chunk): per
    * stratum (lang, shard), documents concatenate in doc_id order and
    * the token stream is cut every 512 tokens; a doc's training sequence
    * is the chunk its first token lands in, and `straddles` marks docs
    * split across a boundary. `shard` is a deterministic contiguous
    * doc_id range bucket (`doc_id div span`), so the majority language
    * of a crawl corpus (en ≈ most of it) spreads across many window
    * partitions instead of one task chain sorting most of the corpus —
    * the packing a sequence-building pipeline does per training shard,
    * expressed as pure windowed SQL (no stateful loop). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val span = spark.conf.getOption("graft.pack.shardSpan")
      .map(_.toLong).getOrElse(shardSpanDefault)
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Relational.table(spark, dir, "documents")
      .withColumn("shard", expr(s"doc_id div ${span}L"))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        expr(s"(end_off - n_tokens) div $packBudget").as("seq_id"),
        expr(s"((end_off - 1) div $packBudget) != ((end_off - n_tokens) div $packBudget)")
          .as("straddles"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c12_decontaminate" -> (decontaminate _),
    "c13_sample_stratified" -> (sampleStratified _),
    "c14_dedup_cluster" -> (dedupCluster _),
    "c15_pack_sequences" -> (packSequences _))

  val oracleSql: Map[String, String] = Map(
    // the oracle joins on the gram STRINGS; equality with the hashed
    // Spark path holds absent xxhash64 collisions (spec-proven at test
    // scale, probabilistically negligible beyond it)
    "c12_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= $ngramN THEN
         |    list_distinct(list_transform(generate_series(1, len(toks) - ${ngramN - 1}),
         |      i -> array_to_string(toks[i:i+${ngramN - 1}], ' ')))
         |  ELSE [] END) AS gram FROM t),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
         |SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared
         |FROM g JOIN ev USING (gram) WHERE g.doc_id % 20 != 0
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "c13_sample_stratified" ->
      s"""SELECT doc_id, lang, ${bucketSql("doc_id")} AS bucket
         |FROM documents
         |WHERE ${bucketSql("doc_id")} < CASE WHEN lang = 'en' THEN 10 ELSE 40 END
         |ORDER BY doc_id""".stripMargin,
    // transitive closure of the exact near-dup pair graph (same pair CTE
    // as the c8 oracle); UNION (distinct) in the recursive member
    // guarantees termination on cyclic dup graphs
    "c14_dedup_cluster" ->
      """WITH RECURSIVE
        |toks2 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t) - 2),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END) AS shingles FROM toks2),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |np AS (SELECT da, db FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |  WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 4) >= 0.8),
        |edges AS (SELECT da AS src, db AS dst FROM np UNION ALL SELECT db, da FROM np),
        |reach AS (
        |  SELECT src AS id, src AS node FROM edges
        |  UNION
        |  SELECT r.id, e.dst FROM reach r JOIN edges e ON r.node = e.src)
        |SELECT id AS doc_id, min(node) AS cluster_id FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "c15_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, lang, doc_id // $shardSpanDefault AS shard,
         |  len(string_split(text, ' ')) AS n_tokens FROM documents),
         |o AS (SELECT doc_id, lang, shard, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS end_off FROM t)
         |SELECT doc_id, lang, shard, n_tokens,
         |  CAST((end_off - n_tokens) // $packBudget AS BIGINT) AS seq_id,
         |  ((end_off - 1) // $packBudget) != ((end_off - n_tokens) // $packBudget) AS straddles
         |FROM o ORDER BY doc_id""".stripMargin)
}
