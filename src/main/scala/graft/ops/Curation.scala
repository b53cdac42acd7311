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
 *    sets are thousands of docs, not billions) → broadcast it; the
 *    corpus n-grams then never shuffle at all.
 *  - sampleStratified: a pure map (multiplicative-hash bucket + per-
 *    stratum threshold) — no shuffle, no RNG state, reproducible on any
 *    cluster and any partitioning.
 *  - dedupCluster: candidate edges come from the banded-MinHash path
 *    (no O(n²)); label propagation shuffles only (id, label) pairs and
 *    converges in O(component diameter) rounds — near-dup clusters are
 *    shallow (dup chains, not long paths), so this beats the constant
 *    factors of large-star/small-star until diameters grow past ~10.
 *    Each round localCheckpoints to truncate lineage.
 *  - packSequences: one window per stratum — packing is embarrassingly
 *    parallel across (lang) partitions; at 100 TB the same window runs
 *    per training-shard key instead of one global order.
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
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // gram work must scale with cores, not input file count
    val grams = Relational.table(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(expr(
        s"""transform(array(split(text, ' ')), toks ->
           |  CASE WHEN size(toks) >= $ngramN THEN
           |    array_distinct(transform(sequence(0, size(toks) - $ngramN),
           |      i -> concat_ws(' ', slice(toks, i + 1, $ngramN))))
           |  ELSE array() END)[0]""".stripMargin)).as("gram"))
    val evalGrams = grams.filter(col("doc_id") % 20 === 0)
      .select(col("gram")).distinct()
    grams.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"))
      .orderBy("doc_id")
  }

  // -------------------------------------------- C13 stratified sampling

  /** C13 — deterministic stratified sampling: per-stratum keep rates
    * applied through a multiplicative-hash bucket of the row key, so the
    * sample is reproducible across engines, partitionings, and reruns
    * (no RNG state — the property `df.sample` cannot give). The Knuth
    * multiplier is odd and coprime to the modulus, so sequential ids
    * cover all 100 buckets uniformly. Downsamples the majority stratum
    * (en → 10%) and keeps 40% of the rest — the shape of a language-
    * rebalancing pass over a crawl corpus. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "documents")
      .withColumn("bucket", pmod(col("doc_id") * lit(2654435761L), lit(100)))
      .filter(col("bucket") < when(col("lang") === "en", 10).otherwise(40))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  // ------------------------------------------- C14 near-dup clustering

  /** C14 — near-duplicate clustering: connected components over the
    * near-dup pair graph (edges = the banded-MinHash → exact-Jaccard
    * pairs of [[Similarity.dedupNgramScaled]]), labeling every involved
    * doc with the minimum doc_id reachable through dup edges. This is
    * the step that turns pairwise dedup into "keep one doc per dup
    * CLUSTER": pairwise removal of the higher id can drop both b and c
    * of a chain a~b, b~c while cluster-level removal keeps exactly one.
    *
    * Min-label propagation over DataFrames: labels start as own id; each
    * round takes the min of own and neighbors' labels until a fixpoint.
    * Rounds = component diameter (shallow for dup clusters). The edge
    * set is computed ONCE and persisted — only (id, label) pairs move
    * per round — and each round localCheckpoints to keep the plan flat
    * (an unbounded iterative lineage re-executes the LSH pipeline every
    * round and overflows the optimizer at scale).
    */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.dedupNgramScaled(spark, dir)
      .select(col("da"), col("db")).localCheckpoint()
    val edges = pairs.unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
    var labels = edges.select(col("da").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val fromNeighbors = edges.join(labels, edges("da") === labels("id"))
        .select(edges("db").as("id"), col("label"))
      val next = labels.unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).isEmpty
      labels = next
      rounds += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  // --------------------------------------------- C15 sequence packing

  private val packBudget = 512

  /** C15 — token-budget sequence packing (concat-then-chunk): per
    * stratum (lang), documents concatenate in doc_id order and the token
    * stream is cut every 512 tokens; a doc's training sequence is the
    * chunk its first token lands in, and `straddles` marks docs split
    * across a boundary. One running-sum window per stratum — the packing
    * a sequence-building pipeline does per shard, expressed as pure
    * windowed SQL (no stateful loop). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Relational.table(spark, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
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
      """SELECT doc_id, lang, (doc_id * 2654435761) % 100 AS bucket
        |FROM documents
        |WHERE (doc_id * 2654435761) % 100 < CASE WHEN lang = 'en' THEN 10 ELSE 40 END
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
      s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |o AS (SELECT doc_id, lang, n_tokens,
         |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS end_off FROM t)
         |SELECT doc_id, lang, n_tokens,
         |  CAST((end_off - n_tokens) // $packBudget AS BIGINT) AS seq_id,
         |  ((end_off - 1) // $packBudget) != ((end_off - n_tokens) // $packBudget) AS straddles
         |FROM o ORDER BY doc_id""".stripMargin)
}
