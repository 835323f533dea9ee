package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted term-dictionary trigram index — the SpellChecker n-gram
  * index shape (/root/reference/src/contrib/SpellChecker/Spell/
  * SpellChecker.cs:60) applied to FUZZY candidate generation: any term
  * within k edits of a query contains one of the query's k+1 pigeonhole
  * pieces exactly (Navarro's partition lemma), and a contained piece of
  * length >= 3 implies a shared trigram — so a gram-range scan of this
  * table has guaranteed recall and bounds the candidate scan to the
  * matched grams' row groups instead of the full dictionary (at 10^9
  * terms the difference between a point lookup and a full scan).
  *
  * Layout: (gram, term, df), range-partitioned + sorted by gram so a
  * `gram IN (...)` predicate prunes to ~one parquet row group per gram.
  */
object Trigrams {

  /** Trigram expansion of the dictionary: one row per distinct
    * (gram, term). Terms shorter than 3 chars contribute themselves
    * (Suggest.trigramsOf semantics). */
  def fromDict(termDict: DataFrame): DataFrame =
    termDict.select(col("term"), col("df"),
      explode(array_distinct(transform(
        sequence(lit(0), greatest(length(col("term")) - 3, lit(0))),
        i => col("term").substr(i + lit(1), lit(3))))).as("gram"))

  def write(root: String, termDict: DataFrame, numPartitions: Int): Unit =
    fromDict(termDict)
      .repartitionByRange(numPartitions, col("gram"))
      .sortWithinPartitions(col("gram"), col("term"))
      .write.mode("overwrite").parquet(s"$root/trigram")

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/trigram")

  def exists(root: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(root, "trigram"))
}
