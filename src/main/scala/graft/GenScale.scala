package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N corpus scaler for the scale-stress pass: generates
  * documents / embeddings / events tables with the SAME shape and
  * marginal statistics as a source sf dir (empirical unigram
  * distribution, token-length distribution, lang/source marginals,
  * exact-duplicate rate, label/event-type/user cardinalities scaled),
  * entirely as pure functions of (seed, row id) — identical at any
  * parallelism, no data copied. The TPC-H tables are NOT generated:
  * no gate query reads them (they carry no text), and the stress pass
  * sweeps the gate queries. Everything is distributed generation —
  * the driver holds only CAPPED marginal tables collected from the
  * source (top-50k unigrams, ≤100k sampled token lengths, the small
  * lang/source CDFs): pointing this at an arbitrarily large source
  * cannot blow the driver. */
object GenScale extends Serializable {

  private def sampleCdf(cdf: Array[(Double, String)], u: Double): String = {
    var lo = 0; var hi = cdf.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cdf(mid)._1 < u) lo = mid + 1 else hi = mid
    }
    cdf(lo)._2
  }

  private def cdfOf(df: DataFrame, colName: String): Array[(Double, String)] = {
    val counts = df.groupBy(colName).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum.toDouble
    var acc = 0.0
    counts.map { case (v, c) => acc += c / total; (acc, v) }
  }

  /** Generate the scaled corpus under outDir. Returns gen wall secs. */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      scale: Int, seed: Long = 94L): Double = {
    val t0 = System.nanoTime()
    import spark.implicits._

    // ---- documents ----
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = src.count() * scale
    // empirical unigram distribution over the whitespace tokens, capped
    // at the 50k most frequent terms (the gate corpus has ~31 + doc-id
    // tokens; on an arbitrary source the full map would be a driver
    // bottleneck — the dropped tail is the sub-1-occurrence-in-50k mass,
    // irrelevant to a stress corpus's term statistics)
    val uni = src.select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t")).limit(50000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val uniTotal = uni.map(_._2).sum.toDouble
    val uniCdf = { var acc = 0.0; uni.map { case (w, c) =>
      acc += c / uniTotal; (acc, w) } }
    // token-length sample, capped likewise (deterministic: first 100k
    // in doc order — lengths are not ordered by doc_id in any way that
    // would bias a marginal distribution)
    val lens = src.orderBy("doc_id")
      .select(size(split(col("text"), " ")).as("n"))
      .limit(100000).collect().map(_.getInt(0))
    val langCdf = cdfOf(src, "lang")
    val sourceCdf = cdfOf(src, "source")
    // duplicate rate: fraction of rows whose text equals an earlier row
    val nSrc = src.count()
    val dupEvery = {
      val distinct = src.select(countDistinct(col("text"))).collect()(0).getLong(0)
      val dups = nSrc - distinct
      if (dups <= 0) Long.MaxValue else math.max(2L, nSrc / dups)
    }
    val uniB = spark.sparkContext.broadcast(uniCdf)
    val lensB = spark.sparkContext.broadcast(lens)
    val langB = spark.sparkContext.broadcast(langCdf)
    val srcB = spark.sparkContext.broadcast(sourceCdf)
    def genText(id: Long): String = {
      val rnd = new scala.util.Random(seed * 1000003L + id * 6364136223846793005L)
      val ls = lensB.value
      val n = ls(rnd.nextInt(ls.length))
      val cdf = uniB.value
      val sb = new StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(sampleCdf(cdf, rnd.nextDouble()))
        k += 1
      }
      sb.toString
    }
    spark.range(0, nDocs, 1, 64).map { r =>
      val id: Long = r
      val rnd = new scala.util.Random(seed ^ (id * 2862933555777941757L))
      // exact duplicates at the source rate: a marked doc re-generates
      // its predecessor's text (pure function of id, so no dependency)
      val textId =
        if (id > 0 && dupEvery != Long.MaxValue &&
          rnd.nextInt(dupEvery.toInt) == 0) id - 1 else id
      val text = genText(textId)
      (id, text,
        sampleCdf(langB.value, rnd.nextDouble()),
        sampleCdf(srcB.value, rnd.nextDouble()),
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // ---- embeddings ----
    val nVec = spark.read.parquet(s"$srcDir/embeddings.parquet").count() * scale
    val dim = graft.ops.TrainOps.AnnDim
    spark.range(0, nVec, 1, 64).map { id =>
      val rnd = new scala.util.Random(seed * 777767777L + id * 104729L)
      (id, Seq.fill(dim)((rnd.nextGaussian() * 0.12).toFloat), rnd.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // ---- events ----
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val nEv = ev.count() * scale
    val nUsers = ev.select(countDistinct(col("user_id"))).collect()(0)
      .getLong(0).toInt * scale // keep events-per-user constant
    val typeCdf = cdfOf(ev, "event_type")
    val typeB = spark.sparkContext.broadcast(typeCdf)
    val epoch = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    spark.range(0, nEv, 1, 64).map { id =>
      val rnd = new scala.util.Random(seed * 15485863L + id * 32452843L)
      (id,
        new java.sql.Timestamp(epoch +
          (rnd.nextDouble() * 30L * 86400000L).toLong),
        rnd.nextInt(nUsers).toLong,
        sampleCdf(typeB.value, rnd.nextDouble()),
        rnd.nextDouble() * 560.0,
        s"""{"k": ${rnd.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    (System.nanoTime() - t0) / 1e9
  }

  /** Ad-hoc CLI: GenScale <srcSfDir> <outDir> [scale] [seed]. */
  def main(args: Array[String]): Unit = {
    Jvm.reexecIfOversizedHeap("graft.GenScale", args)
    Jvm.routeJvmLogToStderr()
    val src = args(0); val out = args(1)
    val scale = if (args.length > 2) args(2).toInt else 10
    val seed = if (args.length > 3) args(3).toLong else 94L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sec = generate(spark, src, out, scale, seed)
    println(f"""{"gen_sec":$sec%.1f,"out":"$out","scale":$scale}""")
    spark.stop()
  }
}
