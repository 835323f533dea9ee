package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkFixture
import graft.model.Transcripts

class DocIdsSpec extends AnyFunSuite {

  test("scalable assign == single-partition window row_number") {
    val spark = SparkFixture.spark
    val df = Transcripts.synthetic(spark, 2000, seed = 7, partitions = 8)
    val keys = Seq(col("conv_id"), col("turn_idx"))
    val a = DocIds.assign(df, keys, 8).docs
      .select("docid", "conv_id", "turn_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val b = DocIds.assignWindow(df, keys)
      .select("docid", "conv_id", "turn_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._1).toSeq == (0L until 2000L))
  }

  test("synthetic generator is deterministic across parallelism") {
    val spark = SparkFixture.spark
    val x = Transcripts.synthetic(spark, 500, seed = 42, partitions = 2)
      .orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    val y = Transcripts.synthetic(spark, 500, seed = 42, partitions = 16)
      .orderBy("conv_id", "turn_idx").collect().map(_.toString).toSeq
    assert(x == y)
  }
}
