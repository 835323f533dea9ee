package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Dedup-at-ingest: the streamed dropDuplicatesWithinWatermark result
  * must equal the batch first-per-fingerprint twin when rows are fed in
  * event-time order, and duplicates must be dropped WITHIN a micro-batch
  * too. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def turn(conv: String, idx: Int, sec: Long, text: String) =
    (conv, idx, "user", text, "none", new Timestamp((86400 + sec) * 1000))

  /** Duplicate content across conversations and within one; fingerprint
    * normalizes case/punctuation, so "Spark PLAN!" duplicates
    * "spark plan". */
  private val turns = Seq(
    turn("c1", 0, 0, "spark plan"),
    turn("c1", 1, 10, "unique follow up"),
    turn("c2", 0, 20, "Spark PLAN!"), // dup of c1/0 (normalized)
    turn("c2", 1, 30, "another unique turn"),
    turn("c3", 0, 40, "spark plan"), // dup again
    turn("c3", 1, 50, "unique follow up"), // dup of c1/1
    turn("c3", 2, 60, "genuinely new content"))

  private val cols =
    Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getInt(1), r.getString(3))

  test("streamed dedup equals the batch first-per-fingerprint twin") {
    import spark.implicits._
    val batchDf = turns.toDF(cols: _*)
    val expect = StreamingDedup.dedupBatch(batchDf)
      .collect().map(key).toSet
    // sanity: 7 turns, 3 duplicates dropped
    assert(expect.size == 4)
    assert(expect.map(_._3) == Set("spark plan", "unique follow up",
      "another unique turn", "genuinely new content"))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    // horizon (2 min) covers the whole 60 s fixture, so streamed ==
    // batch twin exactly
    val out = StreamingDedup.dedup(mem.toDF().toDF(cols: _*), "2 minutes")
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      // batch 1 carries an in-batch duplicate pair (c1/0 + c2/0): the
      // state op must drop the second row of the SAME micro-batch
      mem.addData(turns.take(3)); q.processAllAvailable()
      mem.addData(turns.drop(3)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("dedup_out").collect().map(key).toSet
    assert(got == expect)
  }

  test("a duplicate beyond the watermark horizon is treated as new") {
    // the documented trade: state is evicted once the watermark passes
    // firstSeen + delay, so c3/0 ("spark plan", 40 s after the
    // original, horizon 10 s) re-emits — bounded state, not history
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    val out = StreamingDedup.dedup(mem.toDF().toDF(cols: _*), "10 seconds")
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out_ttl")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      mem.addData(turns.take(3)); q.processAllAvailable()
      mem.addData(turns.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out_ttl").collect().map(key).toSet
    assert(got.contains(("c3", 0, "spark plan")))
    assert(!got.contains(("c2", 0, "Spark PLAN!"))) // in-horizon dup still dropped
  }
}
