package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.index.{IndexBuilder, InvertedIndex}
import graft.model.Transcripts
import graft.search._

/** Session-scoped index cache: Verify/Bench run dozens of queries against
  * the same sfDir — the inverted index is built once and its tables kept
  * persisted (the reference's point-in-time IndexReader analog,
  * /root/reference/src/core/Index/IndexReader.cs:65). */
object Engine {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, InvertedIndex]

  def index(spark: SparkSession, sfDir: String): InvertedIndex =
    cache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$sfDir", {
      val parts = math.max(spark.sparkContext.defaultParallelism, 4)
      IndexBuilder.build(Transcripts.fromDocuments(spark, sfDir), parts)
    })

  def searcher(spark: SparkSession, sfDir: String): Searcher =
    new Searcher(index(spark, sfDir))

  /** Top-k result in the driver-compare shape: (rank, docid, score) with
    * score rounded to 4 decimals (cross-engine float guard) and rank by
    * the mandatory (score desc, docid asc) order. The row_number window
    * runs over k already-collected rows — not a scale concern. */
  def topK(spark: SparkSession, sfDir: String, q: Query, k: Int): DataFrame =
    searcher(spark, sfDir).topK(q, k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("score").desc, col("docid").asc)).cast("long"))
      .select(col("rank"), col("docid"),
        round(col("score"), 4).as("score"))

  def countQ(spark: SparkSession, sfDir: String, q: Query): DataFrame =
    searcher(spark, sfDir).score(q)
      .agg(count(lit(1)).as("hits"))
}
