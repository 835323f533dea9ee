package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Event-time windowed term analytics over the transcript stream — the
  * canonical Structured-Streaming watermark + window aggregation the
  * reference has no analog for (it is a batch index; SURVEY §2.8 maps
  * NRT to streaming). One op, two uses: live "trending terms" per
  * window, and a per-window df feed an NRT dashboard can diff against
  * the persisted dictionary.
  *
  * Scale shape: tokenize is map-only (the codegen'd analyzer column
  * chain), the aggregation is a (window, term) hash agg — partial
  * map-side combine, then one shuffle keyed by (window, term); the
  * watermark bounds state to the open windows only, so state size is
  * O(windows held open × distinct terms per window) regardless of
  * stream length.
  */
object TrendingTerms {

  /** Tumbling-window term counts: (window_start, term, n, n_docs).
    * Works on a streaming OR batch frame (the batch twin is the spec's
    * oracle): same plan, Spark routes it to the stateful operator only
    * under a stream. */
  def counts(turns: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame = {
    val tok = turns
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        explode(filter(Analyzer.rawTokensCol(col("text")),
          t => Analyzer.keepTokenCol(t))).as("term"))
    tok.groupBy(window(col("ts"), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("term"),
        col("n"))
  }

  /** Top-k trending terms per closed window — a batch post-pass over
    * [[counts]] output (rank inside a window is not incrementally
    * maintainable under late data; the stream emits counts, the
    * consumer ranks closed windows). Deterministic (n desc, term asc)
    * tie-break. Two-level rank (the curateTopK pattern): a window over
    * window_start alone would funnel a whole window's vocabulary-scale
    * term set through ONE reducer; level 1 prunes to k rows per
    * (window, input partition) first, so the final rank sees at most
    * k·P rows per window. */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("n").desc, col("term").asc)
    val lvl1 = Window.partitionBy(col("window_start"), col("cell"))
      .orderBy(ord: _*)
    val pruned = counts.withColumn("cell", spark_partition_id())
      .withColumn("r1", row_number().over(lvl1))
      .filter(col("r1") <= k).drop("r1", "cell")
    val w = Window.partitionBy(col("window_start")).orderBy(ord: _*)
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("window_start"), col("rank"))
  }
}
