package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.IndexBuilder

/** Structured-Streaming index sink: one micro-batch = one committed
  * segment (SURVEY.md §2.8).
  *
  * Reference analog: near-real-time indexing — IndexWriter accumulates an
  * in-RAM segment and `GetReader` exposes it
  * (/root/reference/src/core/Index/IndexWriter.cs:351-371); our
  * micro-batch append plays the flush role and the manifest commit plays
  * `Commit`. Readers opening the store between batches always see a
  * consistent snapshot (two-phase manifest), and docids of each batch are
  * re-based past the store's maxDoc (MergeDocIDRemapper analog).
  *
  * Exactly-once note: appendSegment is idempotent per batch only if the
  * caller keys segments by batch — we do: the Spark checkpoint replays a
  * failed batch with the same batchId, and a segment whose lineage
  * records that batchId is skipped (same mechanism as the batch build's
  * resume path). Compaction runs out-of-band (IndexBuilder.compact), the
  * ConcurrentMergeScheduler analog.
  */
object StreamingIndexSink {

  /** Start indexing a streaming DataFrame of transcript turns. */
  def start(turns: DataFrame, root: String, numPartitions: Int,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    turns.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), root, numPartitions, batchId)
      }
      .start()

  /** Deduplicating ingest: exact dedup BEFORE indexing — turns whose
    * normalized-token fingerprint already arrived within the watermark
    * horizon are dropped via Structured Streaming's
    * `dropDuplicatesWithinWatermark`, so the dedup state is BOUNDED by
    * the watermark (the at-scale requirement: an unbounded seen-set
    * would grow with the corpus; a horizon-bounded one grows with the
    * ingest window). The streaming twin of the batch
    * `TrainOps.dedupExact`; duplicates farther apart than the horizon
    * are left to the out-of-band batch dedup, exactly like merges are
    * left to the out-of-band compactor. The dedup transform itself is
    * [[StreamingDedup.dedup]] (shared standalone op with the batch twin
    * and its own spec); this method is the "dedup then index" wiring. */
  def startDedup(turns: DataFrame, root: String, numPartitions: Int,
      checkpointDir: String, watermarkDelay: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    StreamingDedup.dedup(turns, watermarkDelay)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), root, numPartitions, batchId)
      }
      .start()
  }

  /** Idempotent micro-batch append: skip if this batchId already owns a
    * committed segment (replay after crash). The batchId is stamped into
    * the segment's lineage record in the SAME manifest commit, so there
    * is no window where the segment is live but unstamped. */
  def appendBatch(batch: DataFrame, root: String, numPartitions: Int,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    // token scan, not startsWith: compaction rewrites a merged segment's
    // lineage to "merged=[...] streamBatch=i streamBatch=j ..." carrying
    // the original markers mid-string (doMerge), and the replay guard
    // must still see them
    val already = graft.index.SegmentStore.latest(root)
      .exists(_.segments.exists(
        _.lineage.split(' ').contains(s"streamBatch=$batchId")))
    if (!already)
      IndexBuilder.appendSegment(batch.sparkSession, batch, root,
        numPartitions, lineageTag = s"streamBatch=$batchId")
  }
}
