package graft.tools

import org.apache.spark.sql.SparkSession

/** Spark-JOB count per registry-key construction and execution — the
  * round-15 evidence tool for serving-path action folds (each eager
  * action a query function runs at construction time is one driver
  * round-trip per serving batch; folding them is the optimization).
  *
  * Usage: JobCountProbe <sfDir> <reps> key[,key...]
  *
  * Prints, per key: jobs during construction (the eager pins / heads /
  * collects), jobs during the noop-sink execution, and wall seconds,
  * for each rep (rep 1 includes one-time index fits; later reps are the
  * steady-state serving shape).
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val keys = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sentinelSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    // SPARK_GRAFT_JOBS_VERBOSE=1: one line per job with its duration and
    // first non-Spark callsite — attributes each driver round-trip to
    // the serving-path action that issued it
    val verbose = sys.env.get("SPARK_GRAFT_JOBS_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(js.properties).exists(
            _.getProperty("spark.job.description") == "graft_jobcount_sentinel"))
          sentinelSeen.set(true)
        else {
          jobs.incrementAndGet()
          if (verbose) {
            val site = Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
            starts.put(js.jobId, (System.nanoTime(), site)); ()
          }
        }
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          System.err.println(f"[job] id=${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $site")
        }
    })
    // every earlier job's start event precedes the sentinel's (FIFO bus),
    // so once the MARKED sentinel is seen the count is complete — waiting
    // on a bare count could return early while body events are in flight
    def settled(): Int = {
      sentinelSeen.set(false)
      spark.sparkContext.setJobDescription("graft_jobcount_sentinel")
      spark.sparkContext.parallelize(Seq(1)).count()
      spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!sentinelSeen.get() && System.nanoTime() < deadline) Thread.sleep(10)
      jobs.get()
    }
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)
      (1 to reps).foreach { rep =>
        jobs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val constructJobs = settled()
        jobs.set(0)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val execJobs = settled()
        val t2 = System.nanoTime()
        println(f"[jobs] $key%-28s rep=$rep construct_jobs=$constructJobs%3d " +
          f"exec_jobs=$execJobs%3d construct_s=${(t1 - t0) / 1e9}%7.3f exec_s=${(t2 - t1) / 1e9}%7.3f")
      }
    }
    spark.stop()
  }
}
