package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.index.{IndexBuilder, SegmentStore}
import graft.model.Transcripts

/** NRT/streaming invariants (SURVEY.md §2.8): a stream of micro-batches
  * indexed through the sink must produce the exact index of a one-shot
  * batch build, and batch replay (checkpoint recovery) must be a no-op. */
class StreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("micro-batch appends equal the one-shot build; replay is idempotent") {
    import spark.implicits._
    val turns = Transcripts.synthetic(spark, 600, seed = 11L, partitions = 4)
      .as[graft.model.TranscriptTurn].collect().toSeq
      .sortBy(t => (t.conv_id, t.turn_idx))
    val chunks = {
      val convs = turns.map(_.conv_id).distinct.sorted
      val cut1 = convs(convs.length / 3)
      val cut2 = convs(2 * convs.length / 3)
      Seq(turns.filter(_.conv_id < cut1),
        turns.filter(t => t.conv_id >= cut1 && t.conv_id < cut2),
        turns.filter(_.conv_id >= cut2))
    }

    val root = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.model.TranscriptTurn]
    val q = StreamingIndexSink.start(mem.toDF(), root, numPartitions = 4,
      checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val opened = SegmentStore.open(spark, root)
    val direct = IndexBuilder.build(
      spark.createDataFrame(turns), 4)
    assert(opened.numDocs == direct.numDocs)

    def dump(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(_.toSeq.map { case s: Seq[_] => s.toList; case x => x })
        .toSeq.sortBy(_.mkString("|"))
    assert(dump(opened.docs, "docid", "conv_id", "turn_idx", "text") ==
      dump(direct.docs, "docid", "conv_id", "turn_idx", "text"))
    assert(dump(opened.postings, "term", "docid", "tf", "positions") ==
      dump(direct.postings, "term", "docid", "tf", "positions"))

    // replay of an already-committed batch must not change the manifest
    val before = SegmentStore.latest(root).get
    StreamingIndexSink.appendBatch(
      spark.createDataFrame(chunks.head), root, 4, batchId = 0L)
    assert(SegmentStore.latest(root).get == before)

    // and compaction after streaming still preserves the index
    IndexBuilder.forceMerge(spark, root, 4)
    val merged = SegmentStore.open(spark, root)
    assert(dump(merged.postings, "term", "docid", "tf") ==
      dump(direct.postings, "term", "docid", "tf"))
  }
}
