package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics checks for the curation ops that the sf-scale oracle can't
  * isolate: 13-gram boundary behavior, clustering transitivity (closure
  * vs the raw pair list), sampling determinism, and packing boundary
  * arithmetic. */
class CurationSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.01"

  test("decontaminate: shared 13-gram flags a doc; short docs never flagged") {
    import spark.implicits._
    // doc 0 is "eval" (id % 20 == 0); doc 1 repeats 13 of its tokens
    // verbatim; doc 2 shares only 12; doc 3 is a 12-token doc (no grams)
    val words = (1 to 20).map(i => s"w$i")
    val docs = Seq(
      (0L, words.mkString(" ")),
      (1L, (Seq("x") ++ words.take(13) ++ Seq("y")).mkString(" ")),
      (2L, (words.take(12) ++ Seq("zzz")).mkString(" ")),
      (3L, words.take(12).mkString(" "))
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("curation_spec_docs")
    // run the same expression pipeline on the crafted frame via the op's
    // internals: materialize grams the way decontaminate does
    val grams = docs.select(col("doc_id"), explode(expr(
      """transform(array(split(text, ' ')), toks ->
        |  CASE WHEN size(toks) >= 13 THEN
        |    array_distinct(transform(sequence(0, size(toks) - 13),
        |      i -> concat_ws(' ', slice(toks, i + 1, 13))))
        |  ELSE array() END)[0]""".stripMargin)).as("gram"))
    val ev = grams.filter(col("doc_id") % 20 === 0).select("gram").distinct()
    val flagged = grams.filter(col("doc_id") % 20 =!= 0).join(ev, Seq("gram"))
      .select("doc_id").distinct().as[Long].collect().sorted
    assert(flagged.toSeq === Seq(1L))
  }

  test("dedupCluster: labels equal the transitive closure of the pair graph") {
    // independent closure: union-find over the exact pair list
    val pairs = Similarity.dedupNgramScaled(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Curation.dedupCluster(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // cluster representative is the component minimum
    got.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.keys.min == cl)
    }
  }

  test("sampleStratified: deterministic across runs, bucket arithmetic holds") {
    val a = Curation.sampleStratified(spark, sf).collect()
    val b = Curation.sampleStratified(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    a.foreach { r =>
      val (id, lang, bucket) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(bucket === math.floorMod(id * 2654435761L, 100L))
      assert(bucket < (if (lang == "en") 10 else 40))
    }
  }

  test("packSequences: per-stratum running offsets and straddle flags") {
    val rows = Curation.packSequences(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    // recompute the packing per lang in plain Scala
    val byLang = rows.groupBy(_._2)
    byLang.foreach { case (_, docs) =>
      var off = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, seqId, straddles) =>
        assert(seqId === off / 512, s"seq_id at offset $off")
        assert(straddles === ((off + n - 1) / 512 != off / 512), s"straddle at offset $off")
        off += n
      }
    }
    // sanity: the pack actually spans multiple sequences
    assert(rows.map(_._4).distinct.length > 1)
  }
}
