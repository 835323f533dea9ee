package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense docID assignment over a stable key ordering.
  *
  * Reference analog: per-segment dense int docIDs assigned in arrival
  * order (/root/reference/src/core/Index/DocumentsWriter.cs:103-137),
  * re-based on merge. Ours are assigned by the stable (conv_id, turn_idx)
  * global order (north rule).
  *
  * Scale note: a naive `row_number() OVER (ORDER BY ...)` collapses the
  * whole table into ONE partition — a non-starter at 10^12 rows. Instead:
  * range-shuffle on the key (globally ordered partition ranges), count
  * rows per partition, compute cumulative offsets on the driver (tiny:
  * one long per partition), and emit offset + local rank per partition.
  * Result is bit-identical to the global row_number but fully parallel.
  */
object DocIds {

  def assign(df: DataFrame, keys: Seq[Column], numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
    val rdd = sorted.rdd
    rdd.cache()
    // one count per partition; driver-side scan is O(numPartitions)
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(pid -> it.size.toLong)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val withId = rdd.mapPartitionsWithIndex { (pid, it) =>
      var next = offsetsB.value(pid)
      it.map { row =>
        val id = next; next += 1
        org.apache.spark.sql.Row.fromSeq(id +: row.toSeq)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("docid",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        sorted.schema.fields.toSeq)
    val out = spark.createDataFrame(withId, schema)
    rdd.unpersist(blocking = false)
    out
  }

  /** Small-data variant (tests / oracle parity checks): the classic
    * single-partition window — correct, not scalable. */
  def assignWindow(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.withColumn("docid",
      row_number().over(Window.orderBy(keys: _*)).cast("long") - 1L)
      .select(col("docid") +: df.columns.map(col).toSeq: _*)
}
