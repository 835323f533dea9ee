package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's input row: one transcript turn = one Lucene "document"
  * (BASELINE.json input_hint; reference analog: Document of Fields,
  * /root/reference/src/core/Document/Document.cs:42). */
final case class TranscriptTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

/** Deterministic transcripts tables.
  *
  * The driver's testdata has no transcripts parquet, so the canonical
  * table is *derived* from `documents.parquet` by a fixed, pure mapping
  * that is expressed identically in Spark (here) and in ANSI SQL for the
  * DuckDB oracle ([[graft.OracleSql.transcriptsCte]]): every 8 consecutive
  * doc_ids form one conversation; role/tool/ts are pure functions of
  * doc_id. Both engines therefore see the exact same rows.
  */
object Transcripts {

  /** Spark-side derivation — keep in lockstep with OracleSql.transcriptsCte. */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.select(
      expr("concat('c', lpad(cast(doc_id div 8 as string), 6, '0'))").as("conv_id"),
      expr("cast(doc_id % 8 as int)").as("turn_idx"),
      expr(
        """case when doc_id % 8 = 0 then 'system'
          |     when doc_id % 8 = 6 then 'tool'
          |     when doc_id % 2 = 1 then 'assistant'
          |     else 'user' end""".stripMargin).as("role"),
      col("text"),
      expr("case when doc_id % 8 = 6 then source else cast(null as string) end")
        .as("tool"),
      expr("timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,cast(doc_id as int),0)")
        .as("ts"))
  }

  /** Seeded synthetic generator for unit tests and the scaling bench
    * (FIXTURES.md §1): Zipfian vocabulary with marker terms of known df,
    * natural stopword traffic, 2-50-turn conversations, 5-400-token turns.
    * Pure function of (seed, i) — identical at any parallelism. */
  def synthetic(spark: SparkSession, numTurns: Long, seed: Long = 42L,
      partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val vocabB = spark.sparkContext.broadcast(Vocab.words)
    spark.range(0, numTurns, 1, partitions).mapPartitions { it =>
      val vocab = vocabB.value
      it.map { r =>
        val i: Long = r
        val rnd = new scala.util.Random(seed * 1000003L + i * 7919L)
        val convId = f"c${i / 16}%08d"
        val turnIdx = (i % 16).toInt
        val role =
          if (turnIdx == 0) "system"
          else if (rnd.nextInt(10) == 0) "tool"
          else if (turnIdx % 2 == 1) "user" else "assistant"
        val nTok = 5 + rnd.nextInt(120)
        val sb = new StringBuilder
        var k = 0
        while (k < nTok) {
          if (k > 0) sb.append(' ')
          // Zipf-ish: rank ~ floor(V * u^3) biases to low ranks
          val u = rnd.nextDouble()
          val idx = math.min(vocab.length - 1, (vocab.length * u * u * u).toInt)
          sb.append(vocab(idx))
          // marker terms with controlled df
          if (k == 2 && rnd.nextInt(20) == 0) sb.append(" error")
          if (k == 3 && rnd.nextInt(200) == 0) sb.append(" deploy")
          if (k == 4 && rnd.nextInt(2) == 0) sb.append(" the")
          k += 1
        }
        TranscriptTurn(convId, turnIdx, role, sb.toString,
          if (role == "tool") Some(s"tool${rnd.nextInt(8)}") else None,
          new Timestamp(1735689600000L + i * 60000L))
      }
    }.toDF()
  }

  /** The synthetic corpus's vocabulary (Zipf rank order: index 0 is the
    * hottest term) — exposed so benchmark workload generators can draw
    * query terms with known frequency structure instead of duplicating
    * the generator. */
  def vocabulary: Array[String] = Vocab.words
}

private object Vocab {
  /** ~2k deterministic pseudo-words + common English (incl. stopwords). */
  val words: Array[String] = {
    val common = Array("the", "a", "and", "of", "to", "in", "is", "it",
      "that", "was", "for", "on", "are", "with", "as", "at", "be", "this",
      "error", "warning", "info", "debug", "query", "table", "spark",
      "index", "merge", "batch", "stream", "agent", "tool", "model",
      "token", "data", "user", "system", "run", "test", "build", "deploy")
    val synth = (0 until 2000).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      val len = 3 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    common ++ synth
  }
}
