package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{IndexMeta, Relational, Similarity}

/**
 * PQ sidecar maintenance-economics rehearsal (BASELINE.md round-8
 * table): measures the round-7 verdict's lead item — append repair
 * must be Θ(batch), not a full re-encode. Timeline on one dir:
 *
 *   1. build the IVF index on the 95% slice (vec_id ≢ 7 mod 20)
 *   2. addPqToIndex — FULL derive (fit books + encode corpus), timed
 *   3. probe annIvfPqIndexed, timed (warm reference)
 *   4. appendToIvfIndex the held-out 5%
 *   5. addPqToIndex — DELTA repair (frozen books, census-diff encode),
 *      timed; asserts the books generation did NOT move
 *   6. probe again, timed (now over base + delta codes)
 *   7. wipe the sidecar (pqmeta/books/codes) and addPqToIndex again —
 *      the FULL re-derive over the appended layout, timed: what every
 *      repair cost before round 8
 *
 * One JSON line per dir. Usage:
 *   runMain graft.tools.PqLifecycle <sfDir> [sfDir...]
 */
object PqLifecycle {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val idx = s"${System.getProperty("java.io.tmpdir")}/graft_pq_lifecycle_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${spark.sparkContext.applicationId}"
      val e = Relational.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      val n = e.count()
      val (_, tBuild) = timed(Similarity.buildIvfIndexFrom(
        spark, e.filter(col("vec_id") % 20 =!= 7), idx))
      val (_, tPqFull) = timed(Similarity.addPqToIndex(spark, idx))
      val (p1, tProbe1) = timed(
        Similarity.annIvfPqIndexed(spark, dir, idx).collect().length)
      val (_, tAppend) = timed(Similarity.appendToIvfIndex(spark, idx,
        e.filter(col("vec_id") % 20 === 7)))
      val booksBefore = Similarity.livePqMeta(spark, idx).get.booksGen
      val (_, tRepairDelta) = timed(Similarity.addPqToIndex(spark, idx))
      val metaAfter = Similarity.livePqMeta(spark, idx).get
      require(metaAfter.booksGen == booksBefore,
        "delta repair refit the books — measurement void")
      require(metaAfter.codesGens.size == 2,
        s"delta repair produced ${metaAfter.codesGens.size} codes gens")
      val (p2, tProbe2) = timed(
        Similarity.annIvfPqIndexed(spark, dir, idx).collect().length)
      // what the repair cost before round 8: full re-derive on the
      // appended layout (wipe the sidecar so addPqToIndex refits)
      IndexMeta.list(spark, idx)
        .filter { st =>
          val nm = st.getPath.getName
          nm.startsWith("pqmeta.g") || nm.startsWith("books.g") || nm.startsWith("codes.g")
        }
        .foreach(st => IndexMeta.delete(spark, st.getPath.toString))
      val (_, tRederiveFull) = timed(Similarity.addPqToIndex(spark, idx))
      println(f"""{"dir":"$dir","vectors":$n,"build_sec":$tBuild%.1f,""" +
        f""""pq_full_sec":$tPqFull%.1f,"probe_sec":$tProbe1%.1f,""" +
        f""""append_sec":$tAppend%.1f,"repair_delta_sec":$tRepairDelta%.1f,""" +
        f""""probe_after_delta_sec":$tProbe2%.1f,""" +
        f""""rederive_full_sec":$tRederiveFull%.1f,""" +
        f""""probe_rows":[$p1,$p2]}""")
      IndexMeta.delete(spark, idx)
    }
    spark.stop()
  }
}
