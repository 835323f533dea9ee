package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.ops.{MediaRow, Multimodal}

/** Decode-at-ingest: streamed output must equal the batch twin on the
  * same rows, and a corrupt payload must be QUARANTINED (err set,
  * identity kept) instead of failing the trigger — the poison-pill
  * property that makes the stream restartable. */
class StreamingMediaDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Real generator blobs for all three kinds + one corrupt payload
    * that claims to be an image. */
  private def fixture: Seq[MediaRow] =
    (0L until 9L).map(id => Multimodal.encodeRow(id, s"media payload $id")) :+
      MediaRow(99L, "image", "definitely not a bitmap".getBytes("UTF-8"))

  test("streamed decode equals the batch twin; corrupt row quarantined") {
    import spark.implicits._
    val rows = fixture

    val expect = StreamingMediaDecode.decodeSafe(
      spark.createDataset(rows)).collect()
      .map(r => (r.doc_id, r.kind, r.n_bytes, r.width, r.height,
        r.frames, r.n_samples, r.mean_val, r.err == null)).toSet

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[MediaRow]
    val q = StreamingMediaDecode.decodeSafe(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("media_decode_out")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      // the corrupt row rides in the SAME micro-batch as good rows:
      // its failure must not poison them
      mem.addData(rows.take(5)); q.processAllAvailable()
      mem.addData(rows.drop(5)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("media_decode_out").as[MediaDecodedOr]
      .collect()
      .map(r => (r.doc_id, r.kind, r.n_bytes, r.width, r.height,
        r.frames, r.n_samples, r.mean_val, r.err == null)).toSet
    assert(got == expect)

    val bad = spark.table("media_decode_out").as[MediaDecodedOr]
      .collect().filter(_.err != null)
    assert(bad.map(_.doc_id).toSeq == Seq(99L))
    assert(bad.head.err.contains("not a BMP"))
    assert(bad.head.n_bytes == "definitely not a bitmap".length.toLong)
    // and every good row decoded (9 goods, 1 quarantine)
    assert(got.size == 10 && got.count(_._9) == 9)
  }

  test("unknown kind is quarantined, not fatal") {
    import spark.implicits._
    val out = StreamingMediaDecode.decodeSafe(spark.createDataset(
      Seq(MediaRow(7L, "hologram", Array[Byte](1, 2, 3))))).collect()
    assert(out.length == 1 && out.head.err != null)
    assert(out.head.err.contains("hologram"))
  }
}
