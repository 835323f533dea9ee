package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Watermarked windowed term counts: the streamed Append-mode output
  * (after the watermark closes every window) must equal the batch twin
  * on the same turns, and a row later than the watermark must be
  * DROPPED — the state-bound contract. */
class TrendingTermsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def turn(sec: Long, text: String) =
    ("c0", 0, "user", text, "none", new Timestamp((86400 + sec) * 1000))

  private val cols =
    Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  // two 1-minute windows, out-of-order arrivals inside the delay
  private val turns = Seq(
    turn(5, "spark merge spark"),
    turn(50, "merge plans"),
    turn(20, "the spark planner"), // stopword dropped, late-but-in-delay
    turn(70, "second window spark"),
    turn(95, "window terms again"))

  test("streamed windowed counts equal the batch twin; late rows drop") {
    import spark.implicits._
    val expect = TrendingTerms.counts(turns.toDF(cols: _*), "1 minute", "30 seconds")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // sanity: "spark" counted 3× in window 1, 1× in window 2
    assert(expect.count(_._2 == "spark") == 2)
    assert(expect.exists(t => t._2 == "spark" && t._3 == 3L))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    val out = TrendingTerms.counts(mem.toDF().toDF(cols: _*),
      "1 minute", "30 seconds")
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("trend_out")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      mem.addData(turns.take(2)); q.processAllAvailable()
      mem.addData(turns.slice(2, 3)); q.processAllAvailable()
      mem.addData(turns.drop(3)); q.processAllAvailable()
      // push the watermark far past both windows so they close...
      mem.addData(turn(100000, "watermark push")); q.processAllAvailable()
      // ...then a row 27 hours late: must be dropped, not resurrected
      mem.addData(turn(10, "spark resurrection attempt"))
      q.processAllAvailable()
      mem.addData(turn(200000, "watermark push two")); q.processAllAvailable()
      val got = spark.table("trend_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .filter(t => !t._2.contains("watermark") && t._2 != "push" &&
          t._2 != "two")
        .toSet
      assert(got == expect)
    } finally q.stop()
  }

  test("topK ranks closed windows deterministically") {
    import spark.implicits._
    val counts = TrendingTerms.counts(
      turns.toDF(cols: _*), "1 minute", "30 seconds")
    val top = TrendingTerms.topK(counts, 2).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val w1 = top.filter(_._1.getTime == 86400 * 1000L)
    assert(w1.map(t => (t._2, t._4)).toSeq ==
      Seq(("spark", 1L), ("merge", 2L))) // 3×spark, 2×merge
    top.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }
}
