package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Relational

/** Stateful sessionization parity: the flatMapGroupsWithState stream
  * must emit exactly the batch session_window sessions, minus at most
  * one still-open session per user at the watermark frontier. */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("stateful sessionize ⊆ batch session_window; only frontier sessions missing") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.get(2).asInstanceOf[Number].longValue())
    val batch = Relational.eventsSession(spark, dir).collect().map(key).toSet
    val stream = Sessionize.sessionizeEvents(spark, dir).collect().map(key).toSet
    val extra = stream -- batch
    assert(extra.isEmpty, s"stream emitted ${extra.size} sessions the batch result lacks: ${extra.take(3)}")
    val missing = batch -- stream
    val users = batch.map(_._1).size
    assert(missing.size <= users,
      s"stream missed ${missing.size} sessions but only $users users can hold an open session")
    assert(stream.nonEmpty && stream.size >= batch.size - users)
  }
}
