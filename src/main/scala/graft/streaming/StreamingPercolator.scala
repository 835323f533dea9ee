package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.analysis.Analyzers
import graft.search.{MemoryIndex, Query}

/** Continuous percolation: match a registry of standing queries against
  * every turn of an ingest stream — the production use of the single-doc
  * evaluator (contrib Memory, MemoryIndex.cs:97: "a query percolator ...
  * match queries against each incoming document"), turned into a
  * Structured Streaming transform.
  *
  * Shape at scale: stateless and MAP-ONLY — each turn is analyzed ONCE
  * into a [[MemoryIndex]] (the whole point of the primitive: one
  * inversion amortized across the registry), then every registered query
  * is evaluated in-memory. No shuffle, no state store, so the stage
  * scales linearly with executors and the streaming query runs in plain
  * append mode. The registry rides the task closure (fine to ~10⁵
  * compiled ASTs); a registry too large for one executor's heap shards
  * by query id into parallel percolate() streams, still shuffle-free.
  */
object StreamingPercolator {

  /** One percolation sweep (batch or micro-batch): emit a row per
    * (turn, matching registered query). The turn's `role` is exposed to
    * [[graft.search.KeywordQ]] clauses as a keyword field, like the
    * per-field analysis the batch searcher applies. */
  def percolate(turns: DataFrame, queries: Seq[(String, Query)],
      kind: Analyzers.Kind = Analyzers.Standard): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.select(col("conv_id"), col("turn_idx"), col("role"), col("text"))
      .as[(String, Int, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (cid, tix, role, text) =>
          val mi = MemoryIndex.of(text, kind, fields = Map("role" -> role))
          queries.collect { case (qid, q) if mi.matches(q) => (cid, tix, qid) }
        }
      }
      .toDF("conv_id", "turn_idx", "query_id")
  }

  /** Scored percolation sweep: like [[percolate]] but each alert
    * carries the single-doc relevance (the reference MemoryIndex
    * Search float — [[MemoryIndex.score]], engine-validated on a
    * singleton corpus), so downstream alerting can RANK which standing
    * queries a turn serves best instead of treating all matches alike.
    * Same map-only scale shape: one inversion per turn amortized
    * across the registry, no shuffle, no state. */
  def percolateScored(turns: DataFrame, queries: Seq[(String, Query)],
      kind: Analyzers.Kind = Analyzers.Standard): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.select(col("conv_id"), col("turn_idx"), col("role"), col("text"))
      .as[(String, Int, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (cid, tix, role, text) =>
          val mi = MemoryIndex.of(text, kind, fields = Map("role" -> role))
          queries.flatMap { case (qid, q) =>
            mi.score(q).map(s => (cid, tix, qid, s))
          }
        }
      }
      .toDF("conv_id", "turn_idx", "query_id", "score")
  }

  /** Start the continuous sweep: matches append to a parquet alert log.
    * Exactly-once courtesy of the stateless transform + the parquet
    * sink's per-batch commit protocol (replays rewrite the same files). */
  def start(turns: DataFrame, queries: Seq[(String, Query)],
      outDir: String, checkpointDir: String,
      kind: Analyzers.Kind = Analyzers.Standard,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    percolate(turns, queries, kind).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
