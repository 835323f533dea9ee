package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture

/** The partition-local JVM twins (h60Jvm, toksJvm) must be bit-identical
  * to the Catalyst-column forms TrainOps/the DuckDB oracle use — the
  * simhash gate rests on it. */
class TrainOpsSpec extends AnyFunSuite {

  test("h60Jvm == h60 column for varied inputs") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val samples = Seq("", "a", "table", "spark merge", "0", "zz9",
      "the quick brown fox", "0:some shingle text", "c000123")
    val fromCol = samples.toDF("s")
      .select(TrainOps.h60(col("s")).as("h")).collect().map(_.getLong(0))
    val fromJvm = samples.map(TrainOps.h60Jvm)
    assert(fromCol.toSeq == fromJvm)
  }

  test("toksJvm == regexp_extract_all column") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val samples = Seq("", "Key AGG row-scan 42x", "  spaced   out  ",
      "punct!@#only", "MiXeD9case8runs")
    val fromCol = samples.toDF("s")
      .select(regexp_extract_all(lower(col("s")), lit("[a-z0-9]+"), lit(0))
        .as("t")).collect().map(_.getSeq[String](0).toVector)
    assert(fromCol.toSeq == samples.map(TrainOps.toksJvm))
  }

  /** Temp dir holding a documents.parquet with planted near-dups:
    * 1↔2 identical, 3 a heavy-overlap edit of 1, the rest distinct. */
  private lazy val plantedDir: String = {
    val spark = SparkFixture.spark
    import spark.implicits._
    val base = "the query planner merges sorted runs into a single " +
      "segment before the final compaction pass emits blocks"
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, base + " with an extra trailing clause appended here"),
      (4L, "completely unrelated words about stream checkpoint offsets " +
        "and watermark state eviction policies during replay"),
      (5L, "another disjoint doc concerning broadcast dictionaries and " +
        "prefix seeks over the persisted term table layout")
    ) ++ (6L to 20L).map(i =>
      (i, s"filler doc number $i with unique token u$i v$i w$i x$i y$i " +
        s"z$i padding terms alpha$i beta$i gamma$i delta$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dd").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedupNgramJaccard finds planted near-dups and nothing else") {
    val spark = SparkFixture.spark
    val rows = TrainOps.dedupNgramJaccard(spark, plantedDir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical pair at jac 1.0; the edited doc pairs with both copies
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 2 && j == 1.0 })
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 3 && j >= 0.5 })
    assert(pairs.exists { case (a, b, j) => a == 2 && b == 3 && j >= 0.5 })
    // no cross-pairs with the disjoint docs
    assert(pairs.forall { case (a, b, _) => a <= 3 && b <= 3 })
  }

  /** In-JVM exact top-k overlap mirror: all pair intersections over the
    * per-doc distinct-shingle sets, (overlap desc, a, b) order. */
  private def bruteTopk(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> TrainOps.toksJvm(t).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).sortBy(_._1)
    (for {
      i <- sets.indices; j <- (i + 1) until sets.size
      ov = sets(i)._2.intersect(sets(j)._2).size if ov > 0
    } yield (sets(i)._1, sets(j)._1, ov.toLong))
      .sortBy { case (a, b, ov) => (-ov, a, b) }.take(k)
  }

  private def adaptiveTopk(dir: String, k: Int): Seq[(Long, Long, Long)] =
    TrainOps.topkOverlapAdaptive(SparkFixture.spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("topkOverlapAdaptive is exact through hot (over-cap) shingles") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // 70 docs share a boilerplate opening whose shingles are over the
    // df-cap: the capped topkOverlap candidate rule cannot pair
    // boilerplate-only docs, but the EXACT top-k includes them — the
    // adaptive path must rank them correctly anyway
    val boiler = "standard header boilerplate applies to this record"
    val near = boiler + " alpha beta gamma delta epsilon zeta eta theta"
    val docs = (100L to 169L).map(i =>
      (i, s"$boiler filler$i unique$i only$i")) ++ Seq(
      (200L, near), (201L, near + " iota"))
    val dir = java.nio.file.Files.createTempDirectory("graft-adtopk").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exp = bruteTopk(docs, 10)
    assert(adaptiveTopk(dir, 10) == exp)
    // sanity on the plant itself: the near-dup pair leads, a
    // boilerplate-only pair is in the k — proof the hot path matters
    assert(exp.head._1 == 200L && exp.head._2 == 201L)
    assert(exp.tail.forall { case (a, b, _) => a < 200L && b < 200L })
  }

  test("topkOverlapAdaptive matches brute force on a random corpus") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val docs = (1L to 40L).map { i =>
      val n = 5 + rnd.nextInt(25)
      (i, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-adrnd").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(adaptiveTopk(dir, 10) == bruteTopk(docs, 10))
    assert(adaptiveTopk(dir, 25) == bruteTopk(docs, 25))
    // k beyond the total pair count: the loop devolves to t=1 (full
    // prefixes — every overlapping pair generated) and returns them all
    val all = bruteTopk(docs, Int.MaxValue)
    assert(adaptiveTopk(dir, all.size + 100) == all)
  }

  test("docEmbed is integer-valued and bounded to EmbedDim") {
    val spark = SparkFixture.spark
    val emb = TrainOps.docEmbed(spark, plantedDir).collect()
    assert(emb.nonEmpty)
    assert(emb.forall(r => r.getInt(1) >= 0 && r.getInt(1) < TrainOps.EmbedDim))
    // identical docs 1 and 2 embed identically
    val v1 = emb.filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val v2 = emb.filter(_.getLong(0) == 2L).map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(v1 == v2 && v1.nonEmpty)
  }

  test("dedupEmbedCosine finds the planted pair via SRP buckets") {
    val spark = SparkFixture.spark
    val rows = TrainOps.dedupEmbedCosine(spark, plantedDir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical docs share every SRP band -> always a candidate; cos 1.0
    assert(pairs.exists { case (a, b, c) => a == 1 && b == 2 && c == 1.0 })
    // disjoint docs never reach the threshold even if bucketed together
    assert(pairs.forall { case (a, b, _) => a <= 3 && b <= 3 })
  }

  test("dedupNgramJaccard counts capped boilerplate shingles exactly") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // 70 docs share a boilerplate opening (df > ShingleDfCap = 64), so
    // its shingles are dropped from candidate generation — but a true
    // near-dup pair that ALSO shares them must still get the full
    // Jaccard (i = i_kept + i_capped)
    val boiler = "standard header boilerplate applies to this record"
    val near = boiler + " alpha beta gamma delta epsilon zeta eta theta"
    val docs = (100L to 169L).map(i =>
      (i, s"$boiler filler$i unique$i only$i")) ++ Seq(
      (200L, near),
      (201L, near + " iota"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cap").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def shingleSet(t: String): Set[String] =
      TrainOps.toksJvm(t).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val (sa, sb) = (shingleSet(near), shingleSet(near + " iota"))
    val expJac = BigDecimal(sa.intersect(sb).size.toDouble /
      sa.union(sb).size).setScale(4, BigDecimal.RoundingMode.HALF_UP)

    val rows = TrainOps.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.exists { case (a, b, j) =>
      a == 200L && b == 201L && BigDecimal(j) == expJac })
    // boilerplate-only overlap (any 100-series pair) must NOT pair up:
    // their only shared shingles are capped, so no candidate exists
    assert(rows.forall { case (a, b, _) => a >= 200L && b >= 200L })
  }

  test("dedupEmbedCosine drops degenerate mass-dup buckets, loudly") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // 300 identical docs -> identical vectors -> every SRP band bucket
    // holds 300 > SrpBucketCap: candidate gen declines the quadratic
    // (mass-dupes are dedupExact's job) and the diagnostic reports it
    val text = "identical mass duplicated record body with enough " +
      "distinct tokens to shingle and embed deterministically"
    val docs = (1L to 300L).map(i => (i, text))
    val dir = java.nio.file.Files.createTempDirectory("graft-srp").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(TrainOps.dedupEmbedCosine(spark, dir).collect().isEmpty)
    val (total, dropped) = TrainOps.srpBucketStats(spark, dir)
    assert(dropped > 0 && dropped <= total)
  }

  test("annSrp: duplicate of the query is found at rank 1, cos 1.0") {
    val spark = SparkFixture.spark
    import spark.implicits._
    def vec(id: Long): Seq[Float] =
      (0 until TrainOps.AnnDim).map(i =>
        ((TrainOps.h60Jvm(s"e:$id:$i") % 1000) / 500.0 - 1.0).toFloat)
    // vec 1 duplicates the query (vec 0): identical SRP bands in every
    // band -> always a candidate; exact rescore puts it first at 1.0
    val rows = (0L to 40L).map(id => (id, if (id == 1L) vec(0L) else vec(id)))
    val dir = java.nio.file.Files.createTempDirectory("graft-asrp").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = TrainOps.annSrp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty && out.head == ((1L, 1L, 1.0)))
    // every hit must actually share >= 1 band key with the query
    val qb = TrainOps.annSrpBands(vec(0L))
    out.foreach { case (_, id, _) =>
      val vb = TrainOps.annSrpBands(if (id == 1L) vec(0L) else vec(id))
      assert(vb.zip(qb).exists { case (x, y) => x == y })
    }
  }

  test("annHardNegatives excludes self and the near-positive band") {
    val spark = SparkFixture.spark
    import spark.implicits._
    def vec(id: Long): Seq[Float] =
      (0 until TrainOps.AnnDim).map(i =>
        ((TrainOps.h60Jvm(s"e:$id:$i") % 1000) / 500.0 - 1.0).toFloat)
    // vec 1 duplicates the query (cos 1.0) -> inside the 0.95 band,
    // must NOT appear as a negative; vec 2 is a slight perturbation
    // (still > 0.95) -> also excluded; the rest are random
    val near = vec(0L).zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.05f else x }
    val rows = (0L to 60L).map(id => (id,
      if (id == 1L) vec(0L) else if (id == 2L) near else vec(id)))
    val dir = java.nio.file.Files.createTempDirectory("graft-hneg").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = TrainOps.annHardNegatives(spark, dir, Seq(0L), k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.length == 5)
    // the planted positives never surface as negatives
    assert(!out.exists(x => x._1 == 0L || x._1 == 1L || x._1 == 2L))
    assert(out.forall(_._2 < 0.95))
    // and the list is the DESCENDING head of the remaining similarity
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.reverse.toSeq)
    // sanity: the perturbation really was in the excluded band
    val all = TrainOps.annHardNegatives(spark, dir, Seq(0L), k = 5,
      simHi = 1.1).collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(all.take(2).map(_._1).toSet == Set(1L, 2L))
    assert(all.head._2 == 1.0 && all(1)._2 > 0.95)
  }

  test("connectedComponents: chains, stars and singleton-free output") {
    val spark = SparkFixture.spark
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — exercises >1 propagation round),
    // star 10-{11,12,13}, lone pair 20-21; 99 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)).toDF("a", "b")
    val got = TrainOps.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = Seq(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 4L), (11L, 10L, 4L), (12L, 10L, 4L), (13L, 10L, 4L),
      (20L, 20L, 2L), (21L, 20L, 2L))
    assert(got == exp)
  }

  /** Corpus where doc 1 is gibberish (unique trigrams, each freq 1 <=
    * the absolute floor) and the rest share one repeated prose line
    * whose trigrams are all frequent. */
  private lazy val gibberishDir: String = {
    val spark = SparkFixture.spark
    import spark.implicits._
    val prose = "the planner merges sorted runs into one segment " * 4
    val docs = (2L to 30L).map((_, prose)) :+
      ((1L, "qzx jvq wqk xbv zzj pqv kqx vjz bqw jxq"))
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("lmRareScore flags the gibberish doc via the absolute floor") {
    val spark = SparkFixture.spark
    val rows = TrainOps.lmRareScore(spark, gibberishDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the gibberish doc: nearly all its trigrams are corpus-unique
    val (n1, rare1) = rows(1L)
    assert(n1 > 0 && rare1 > n1 / 2, s"gibberish ($n1, $rare1)")
    // prose docs: every trigram occurs in 29 docs x 4 repeats — none
    // rare under the floor (tiny corpus => ppm half is < floor)
    assert((2L to 30L).forall(id => rows(id)._2 == 0L))
  }

  test("substringDup counts cross-doc 8-gram sharing exactly") {
    val spark = SparkFixture.spark
    val rows = TrainOps.substringDup(spark, plantedDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // base text = 17 tokens -> 10 grams; docs 1 and 2 are identical so
    // every gram is shared; doc 3 appends 7 tokens (24 -> 17 grams) and
    // shares exactly the 10 windows that lie fully inside the base
    assert(rows(1L) == ((10L, 10L, 10L)))
    assert(rows(2L) == ((10L, 10L, 10L)))
    assert(rows(3L) == ((17L, 10L, 10L)))
    // the disjoint docs and the i-salted fillers share nothing: every
    // 8-token window of a filler contains an i-specific token
    assert((4L to 20L).forall(id => rows(id)._2 == 0L && rows(id)._3 == 0L))
    assert(rows(4L)._1 == 7L && rows(5L)._1 == 8L && rows(6L)._1 == 12L)
  }

  test("dedupClusters groups the planted near-dups into one cluster") {
    val spark = SparkFixture.spark
    // docs 1, 2, 3 pair up pairwise (1-2 identical, 3 an edit of both)
    // -> one component, canonical = 1, size 3; nothing else clusters
    val got = TrainOps.dedupClusters(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("simhash signatures are stable and 60-bit") {
    val spark = SparkFixture.spark
    // deterministic check against an independently-computed signature
    val sig = TrainOps.h60Jvm("table")
    assert(sig >= 0 && sig < (1L << 60))
    val votesKnown = {
      val votes = new Array[Int](60)
      Seq("key", "agg", "row").foreach { t =>
        val h = TrainOps.h60Jvm(t)
        (0 until 60).foreach(k =>
          if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1)
      }
      (0 until 60).map(k => if (votes(k) > 0) 1L << k else 0L).sum
    }
    assert(votesKnown >= 0 && votesKnown < (1L << 60))
  }

  /** Skewed multi-source corpus over many input partitions — exercises
    * the salted two-level top-k against the naive single-window plan. */
  private lazy val skewedDir: String = {
    val spark = SparkFixture.spark
    import spark.implicits._
    // "hot" owns 80% of docs; quality varies via text length/shape
    val docs = (1L to 200L).map { i =>
      val src = if (i % 5 != 0) "hot" else s"cold${i % 3}"
      val body = ("the scan " * (i % 17).toInt) +
        s"unique filler u$i v$i " + ("and aggregate rows " * (i % 7).toInt)
      (i, body, src)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-cur").toString
    docs.toDF("doc_id", "text", "source").repartition(9)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("curateTopK (salted two-level) == naive global window top-k") {
    val spark = SparkFixture.spark
    val got = TrainOps.curateTopK(spark, skewedDir, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // independent naive reference: full sort per source, driver-side
    val all = TrainOps.qualityScore(spark, skewedDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val srcs = spark.read.parquet(s"$skewedDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = srcs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(_._1).sortBy(d => (-all(d), d)).take(4).zipWithIndex
        .map { case (d, i) => (src, d, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._3))
    assert(got.toSeq == want)
  }

  test("split and sample are partition-count invariant and disjoint-stable") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("graft-spl").toString
    val docs = (1L to 300L).map(i => (i, s"doc body $i with words " * 3))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val dirB = java.nio.file.Files.createTempDirectory("graft-spl").toString
    docs.toDF("doc_id", "text").repartition(11)
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val a = TrainOps.splitCounts(spark, dirA).collect().map(_.toSeq)
    val b = TrainOps.splitCounts(spark, dirB).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_(1).asInstanceOf[Long]).sum == 300L)
    // append-stability: the first 150 docs keep their membership when
    // the corpus doubles (pure function of the id)
    val dirC = java.nio.file.Files.createTempDirectory("graft-spl").toString
    docs.take(150).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
    def keptIds(dir: String) = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("source", lit("s"))
      val t = java.nio.file.Files.createTempDirectory("graft-spl").toString
      d.write.mode("overwrite").parquet(s"$t/documents.parquet")
      TrainOps.stratifiedSample(spark, t, Nil, 0.3)
        .collect().map(_.getLong(1)).toSet
    }
    val half = keptIds(dirC)
    val full = keptIds(dirB)
    assert(half == full.filter(_ <= 150L))
  }

  test("hybrid RRF: fusion invariants over the sf0.001 corpus") {
    val spark = SparkFixture.spark
    val rows = TrainOps.hybridRrf(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 10)
    // ranks are 1..k and rrf is non-increasing with deterministic ties
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
    // every score is exactly the rank arithmetic (round-tripped at
    // 6dp with Spark ROUND's HALF_UP decimal semantics)
    def part(r: Long) = if (r > 0) 1.0 / (60.0 + r) else 0.0
    rows.foreach { case (_, _, rrf, l, v) =>
      assert(rrf == BigDecimal(part(l) + part(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    // the example doc itself never surfaces
    assert(!rows.exists(_._2 == 0L))
    // each hit came from at least one list
    assert(rows.forall(r => r._4 > 0 || r._5 > 0))
  }
}
