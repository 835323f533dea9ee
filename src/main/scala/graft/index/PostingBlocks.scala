package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Block row as persisted (one term's ≤128 postings, compressed).
  * Skip/WAND stats travel as plain columns so pruning predicates stay in
  * whole-stage codegen and reach Parquet row-group stats. */
final case class BlockRow(
    term: String,
    n: Int,
    min_docid: Long,
    max_docid: Long,
    max_tf: Long,
    min_len: Long,
    docs: Array[Byte],
    lens: Array[Byte],
    pos: Array[Byte])

/** Decoded posting row (the logical postings view the query layer sees). */
final case class PostingRow(
    term: String,
    docid: Long,
    tf: Long,
    len: Long,
    positions: Seq[Int])

/** Posting blocks: the at-rest representation of the inverted lists.
  *
  * Build: range-shuffle on (term, docid) — a hot term's postings span
  * MULTIPLE partitions split by docid range (the north rule's explicit
  * skew handling: no single reducer ever owns a whole hot term), then
  * per-partition streaming chunking into ≤128-posting compressed blocks.
  * Blocks at a partition boundary may be short; correctness never
  * depends on exact block fill.
  *
  * Reference analog: FreqProxTermsWriter flush + FormatPostings* encode
  * (/root/reference/src/core/Index/FreqProxTermsWriter.cs:70-157).
  */
object PostingBlocks {

  /** postings: (term, docid, tf, len, positions) → block table. */
  def fromPostings(postings: DataFrame, numPartitions: Int): Dataset[BlockRow] = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings
      .select(col("term"), col("docid"), col("tf").cast("long"),
        col("len").cast("long"), col("positions").cast("array<int>"))
      .as[(String, Long, Long, Long, Seq[Int])]
      .repartitionByRange(numPartitions, col("term"), col("docid"))
      .sortWithinPartitions(col("term"), col("docid"))
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[BlockRow] {
          override def hasNext: Boolean = in.hasNext
          override def next(): BlockRow = {
            val term = in.head._1
            val chunk = new scala.collection.mutable.ArrayBuffer[Codec.Posting](
              Codec.BlockSize)
            while (in.hasNext && in.head._1 == term &&
                chunk.size < Codec.BlockSize) {
              val (_, d, tf, len, ps) = in.next()
              chunk += Codec.Posting(d, tf, len, ps.toArray)
            }
            val b = Codec.encode(term, chunk.iterator).next()
            BlockRow(b.term, b.n, b.minDocid, b.maxDocid, b.maxTf,
              b.minLen, b.docs, b.lens, b.pos)
          }
        }
      }
  }

  /** Decode a block table back to the logical postings view. */
  def toPostings(blocks: DataFrame): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.as[BlockRow].flatMap { r =>
      Codec.decode(Codec.Block(r.term, r.n, r.min_docid, r.max_docid,
        r.max_tf, r.min_len, r.docs, r.lens, r.pos))
        .map(p => PostingRow(r.term, p.docid, p.tf, p.len,
          p.positions.toSeq))
    }.toDF()
  }
}
