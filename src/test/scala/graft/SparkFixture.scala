package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (reference analog:
  * LuceneTestCase's shared RAM directory defaults,
  * test/core/Util/LuceneTestCase.cs:48). */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
