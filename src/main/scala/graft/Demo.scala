package graft

import org.apache.spark.sql.SparkSession

import graft.search._

/** Tiny CLI surface: parse a query string, search the transcripts index
  * derived from an sf dir, print the top-k. Usage:
  *   graft.Demo [sfDir] [queryString] [k]
  * Mirrors the reference's demo apps (src/demo/ SearchFiles analog).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val qs = if (args.length > 1) args(1) else "table"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = QueryParser.parse(qs)
    println(s"query AST: $q")
    val hits = Engine.topK(spark, sfDir, q, k)
    hits.show(k, truncate = false)
    spark.stop()
  }
}
