package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Event-time sessionization: the streamed flatMapGroupsWithState result
  * (after every gap has passed the watermark) must equal the batch
  * window-over-(conv, ts) twin on the same turns. */
class StreamingSessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val GapMs = 60_000L // 1 minute inactivity closes a session

  /** Timestamps sit well past the epoch: Spark's initial watermark is 0,
    * and rows at-or-before the watermark are dropped as late. */
  private def turn(conv: String, idx: Int, sec: Long, text: String) =
    (conv, idx, "user", text, "none", new Timestamp((86400 + sec) * 1000))

  /** Three conversations: c1 has an IN-CONVERSATION gap (two sessions),
    * c2 is a single burst, c3 is a lone turn. */
  private val turns = Seq(
    turn("c1", 0, 0, "first question about spark plans"),
    turn("c1", 1, 20, "a follow up"),
    turn("c1", 2, 40, "closing remark"),
    // 10-minute silence -> new session for c1
    turn("c1", 3, 640, "resumed conversation next topic"),
    turn("c1", 4, 660, "and its answer"),
    turn("c2", 0, 5, "single burst turn one"),
    turn("c2", 1, 15, "single burst turn two"),
    turn("c3", 0, 30, "lone turn"))

  private val cols =
    Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("streamed sessions equal the batch twin, state drained by timeout") {
    import spark.implicits._
    val batchDf = turns.toDF(cols: _*)
    val expect = StreamingSessions.sessionsBatch(batchDf, GapMs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    // sanity: c1 split into two sessions by the 10-minute gap
    assert(expect.count(_._1 == "c1") == 2)
    assert(expect.size == 4)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    val sessions = StreamingSessions.sessions(
      mem.toDF().toDF(cols: _*), GapMs)
    val q = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      // feed in event-time order across three micro-batches, then push
      // the watermark far past every gap with sentinel turns in their
      // own conversation; one more batch lets the timeouts fire
      turns.sortBy(_._6.getTime).grouped(3).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      mem.addData(turn("wm", 0, 100000, "watermark push"))
      q.processAllAvailable()
      mem.addData(turn("wm", 1, 200000, "watermark push two"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .filterNot(_._1 == "wm").toSet
    assert(got == expect)
  }

  test("an in-batch gap splits even before any timeout fires") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    val q = StreamingSessions.sessions(mem.toDF().toDF(cols: _*), GapMs)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_split")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      // both sides of the gap arrive in ONE batch: the first session
      // must be emitted immediately (split in the fold), not via timeout
      mem.addData(Seq(
        turn("c9", 0, 0, "early words here"),
        turn("c9", 1, 10, "still early"),
        turn("c9", 2, 500, "much later")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("c9", 2L, 5L)))
  }
}
