package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.analysis.Analyzers
import graft.model.{TranscriptTurn, Transcripts}
import graft.search._

/** Streamed percolation must equal the batch sweep, which must equal the
  * per-row single-doc evaluator — three paths, one membership contract. */
class StreamingPercolatorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("streamed percolation equals batch sweep equals MemoryIndex") {
    import spark.implicits._
    val turns = Transcripts.synthetic(spark, 400, seed = 7L, partitions = 4)
      .as[TranscriptTurn].collect().toSeq
    val queries: Seq[(String, Query)] = Seq(
      "q_term" -> TermQ("table"),
      "q_bool" -> BoolQ(must = Seq(TermQ("merge")),
        mustNot = Seq(TermQ("error"))),
      "q_role" -> BoolQ(must = Seq(TermQ("query"),
        KeywordQ("role", "assistant"))))

    // ground truth: the single-doc evaluator row by row
    val expect = turns.flatMap { t =>
      val mi = MemoryIndex.of(t.text, Analyzers.Standard,
        fields = Map("role" -> t.role))
      queries.collect { case (qid, q) if mi.matches(q) =>
        (t.conv_id, t.turn_idx, qid) }
    }.toSet
    // every registered query must actually fire on this corpus
    assert(queries.forall { case (qid, _) => expect.exists(_._3 == qid) })

    val batch = StreamingPercolator
      .percolate(spark.createDataFrame(turns), queries).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(batch == expect)

    // stream the same turns in three micro-batches
    val out = Files.createTempDirectory("graft_perc_out_").toString
    val ckpt = Files.createTempDirectory("graft_perc_ckpt_").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[TranscriptTurn]
    val q = StreamingPercolator.start(mem.toDF(), queries, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      turns.grouped((turns.length + 2) / 3).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
        r.getAs[String]("query_id"))).toSet
    assert(streamed == expect)
  }
}
