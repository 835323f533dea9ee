package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TrainOps

/** Dedup-at-ingest for the transcript stream: drop every turn whose
  * content fingerprint (normalized token stream → 60-bit hash, the
  * [[graft.ops.TrainOps.fingerprint]] key) was already seen within the
  * watermark horizon, keeping the FIRST arrival.
  *
  * The reference is batch-only (SURVEY §2.8); this is the streaming twin
  * of the exact-dedup pipeline op — the filter a training-data ingest
  * runs BEFORE documents reach the index/corpus, where duplicate storms
  * (reposts, retries, crawl loops) are the norm.
  *
  * Spark-first: this is a thin composition over Spark's own
  * `dropDuplicatesWithinWatermark` state operator — no custom
  * mapGroupsWithState needed (contrast [[StreamingSessions]], whose
  * gap-split semantics genuinely exceed the built-ins). State is one row
  * per DISTINCT fingerprint inside the horizon, evicted by the
  * watermark, so the state store is bounded by distinct-rate × horizon,
  * not by history — the standard trade: a duplicate arriving later than
  * the horizon is treated as new. At 100 TB the op is one uniform hash
  * shuffle on the 60-bit key (same layout as the batch dedupExact).
  */
object StreamingDedup {

  /** First-arrival dedup of a STREAMING turns frame within
    * `watermarkDelay`. Append-mode: each surviving row is emitted by the
    * micro-batch that first carries its fingerprint. */
  def dedup(turns: DataFrame, watermarkDelay: String): DataFrame =
    turns
      .withWatermark("ts", watermarkDelay)
      .withColumn("fp", TrainOps.fingerprintCol(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** The batch twin the spec pins: the first row per fingerprint, in
    * event-time order (conv_id, turn_idx tie-break — deterministic on
    * equal timestamps, where the streaming side's winner is
    * arrival-order instead). */
  def dedupBatch(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
      .orderBy(col("ts"), col("conv_id"), col("turn_idx"))
    turns
      .withColumn("fp", TrainOps.fingerprintCol(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("fp", "rn")
  }
}
