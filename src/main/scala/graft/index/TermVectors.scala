package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-doc forward term index — the term-vectors table
  * (.tvx/.tvd/.tvf analog, /root/reference/src/core/Index/
  * TermVectorsWriter.cs): (docid, term, tf, positions) RANGE-PARTITIONED
  * BY DOCID, so fetching one doc's vector prunes to a single file via
  * parquet min/max stats instead of scanning the term-ordered postings.
  * MoreLikeThis/highlighting re-analyze stored text today (fine for
  * top-k-sized fetches); this table is the scale path when docs are huge
  * or vectors are fetched in bulk. */
object TermVectors {

  /** Derive the forward table from the logical postings view. */
  def build(idx: InvertedIndex, numPartitions: Int): DataFrame =
    idx.postings
      .select(col("docid"), col("term"), col("tf"), col("positions"))
      .repartitionByRange(numPartitions, col("docid"))
      .sortWithinPartitions(col("docid"), col("term"))

  /** Persist under the store root (out-of-band job, like a compaction). */
  def write(root: String, idx: InvertedIndex, numPartitions: Int): Unit =
    build(idx, numPartitions).write.mode("overwrite")
      .parquet(s"$root/tvec")

  /** One doc's vector; the docid predicate reaches the parquet scan
    * (range partitioning makes it prune to ~one file). */
  def vectorOf(spark: SparkSession, root: String, docid: Long): DataFrame =
    spark.read.parquet(s"$root/tvec").filter(col("docid") === docid)
}
