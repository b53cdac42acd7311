package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.ops.Relational

/**
 * Custom stateful sessionization over the events stream:
 * `KeyValueGroupedDataset.flatMapGroupsWithState` with event-time
 * timeout — the state-store path for session semantics that
 * `session_window` (graft.ops.Relational B17) can't express when the
 * session carries custom per-session state (here: event counts and
 * value sums folded incrementally).
 *
 * Contract: sessions close when a 30-minute gap elapses, emitted in
 * append mode either when a later event closes them or when the
 * event-time watermark times the state out. Sessions still open at the
 * watermark frontier stay in the store — at stream end that is at most
 * one open session per user (asserted against the batch session_window
 * result in StreamingSpec).
 */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp, n_events: Int, sum_value: Double)

  val gapMs: Long = 30L * 60 * 1000

  /** Fold a batch of events for one user into open/closed sessions.
    * Events inside a trigger arrive unordered → sort by time first. */
  private[streaming] def sessionFunc(
      userId: Long, events: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(Session(userId, new Timestamp(s.startMs), s.n, s.sum))
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.lastMs < gapMs =>
          open = Some(s.copy(lastMs = t, n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed += Session(userId, new Timestamp(s.startMs), s.n, s.sum)
          open = Some(SessionState(t, t, 1, e.value))
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // time out once the watermark passes the session's close boundary
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Streaming sessionization of the events table (file-source replay,
    * one AvailableNow pass). Returns the emitted (closed) sessions as a
    * batch DataFrame. */
  def sessionizeEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val sinkName = "graft_sessionize_sink"
    val rawStream = spark.readStream.schema(rawSchema).parquet(s"$dir/events.parque[t]")
    val stream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        rawStream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => rawStream
    }
    val q = stream
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[Event]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessionFunc)
      .writeStream.queryName(sinkName).outputMode("append").format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy("user_id", "session_start", "n_events")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b19_sessionize_stateful" -> (sessionizeEvents _))
  // no oracle: append-mode emission excludes sessions still open at the
  // watermark frontier (≤ 1 per user at stream end) — subset equality
  // vs the batch session_window result is asserted in StreamingSpec
}
