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

  test("deduplicating ingest drops repeated texts across micro-batches") {
    import spark.implicits._
    val base = Transcripts.synthetic(spark, 200, seed = 21L, partitions = 2)
      .as[graft.model.TranscriptTurn].collect().toSeq
      .sortBy(t => (t.conv_id, t.turn_idx))
    val half = base.length / 2
    val first = base.take(half)
    // second batch: fresh rows PLUS exact text copies of first-batch
    // rows under new conv ids (the duplicate shape dedup-at-ingest
    // exists for)
    val dupes = first.take(20).zipWithIndex.map { case (t, i) =>
      t.copy(conv_id = s"zdup$i", turn_idx = 0)
    }
    val second = base.drop(half) ++ dupes

    val root = java.nio.file.Files
      .createTempDirectory("graft_sdedup_").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sdedup_ckpt_").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[graft.model.TranscriptTurn]
    val q = StreamingIndexSink.startDedup(mem.toDF(), root,
      numPartitions = 2, checkpointDir = ckpt,
      watermarkDelay = "3650 days",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      mem.addData(first); q.processAllAvailable()
      mem.addData(second); q.processAllAvailable()
    } finally q.stop()

    val opened = SegmentStore.open(spark, root)
    // distinct text fingerprints of the union = indexed doc count
    // (same normalization as the sink's fp column: plain token regex)
    val tokRe = "[a-z0-9]+".r
    val distinctTexts = (first ++ second)
      .map(t => tokRe.findAllIn(t.text.toLowerCase).mkString(" "))
      .distinct.size
    assert(opened.numDocs == distinctTexts)
    // none of the duplicate conv ids made it in
    assert(opened.docs.filter(org.apache.spark.sql.functions
      .col("conv_id").startsWith("zdup")).count() == 0)
  }
}
