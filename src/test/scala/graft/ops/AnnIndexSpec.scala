package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persisted IVF index: storage must be invisible (same rows as
  * the on-the-fly k-means IVF), the commit must be idempotent, and the
  * probe filter must reach the scan as a PARTITION filter — the whole
  * point of the cell-partitioned layout. */
class AnnIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("persisted query == on-the-fly k-means IVF, build idempotent") {
    val spark = SparkFixture.spark
    val root = java.nio.file.Files
      .createTempDirectory("graft-annidx").toString
    val r1 = AnnIndex.build(spark, sf, root)
    assert(r1 == root)
    // second build with the same params reuses the committed manifest:
    // the cells directory is untouched (same mtimes)
    val cellsDir = new java.io.File(s"$root/cells")
    val before = cellsDir.lastModified()
    AnnIndex.build(spark, sf, root)
    assert(cellsDir.lastModified() == before)

    val onTheFly = TrainOps.annIvfKmeans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val qv = TrainOps.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0)
      .map(_.toDouble).toIndexedSeq
    val persisted = AnnIndex.query(spark, root, qv, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(persisted == onTheFly)
  }

  test("probe cells prune partitions in the physical plan") {
    val spark = SparkFixture.spark
    val root = AnnIndex.defaultRoot(sf)
    AnnIndex.build(spark, sf, root)
    val qv = IndexedSeq.fill(TrainOps.AnnDim)(0.1)
    val plan = AnnIndex.query(spark, root, qv, 0L, 10)
      .queryExecution.executedPlan.toString
    // the cell predicate must appear as a PartitionFilters entry on the
    // scan (partition pruning), not as a post-scan data Filter
    assert(plan.contains("PartitionFilters"), plan.take(800))
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"no cell partition filter: $pf")
  }

  test("regenerated data at the same path invalidates the manifest") {
    val spark = SparkFixture.spark
    import org.apache.spark.sql.functions._
    val e = TrainOps.embeddings(spark, sf)
    val dataDir = java.nio.file.Files
      .createTempDirectory("graft-annidx-regen").toString
    e.write.mode("overwrite").parquet(s"$dataDir/embeddings.parquet")
    val root = java.nio.file.Files
      .createTempDirectory("graft-annidx-regen-root").toString
    AnnIndex.build(spark, dataDir, root)
    val m1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/manifest.json")), "UTF-8")
    // same ids, same count, DIFFERENT content — the id-only
    // fingerprint this replaced would have matched
    e.withColumn("embedding", reverse(col("embedding")))
      .write.mode("overwrite").parquet(s"$dataDir/embeddings.parquet")
    AnnIndex.build(spark, dataDir, root)
    val m2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/manifest.json")), "UTF-8")
    assert(m1 != m2, "content change must change the manifest")
  }

  test("append: frozen centroids, new vectors immediately searchable") {
    val spark = SparkFixture.spark
    import org.apache.spark.sql.functions._
    // build on the first 450 vectors only
    val e = TrainOps.embeddings(spark, sf)
    val subDir = java.nio.file.Files
      .createTempDirectory("graft-annidx-sub").toString
    e.filter(col("vec_id") < 450).write.mode("overwrite")
      .parquet(s"$subDir/embeddings.parquet")
    val root = java.nio.file.Files
      .createTempDirectory("graft-annidx-app").toString
    AnnIndex.build(spark, subDir, root)
    // append the remaining 50
    AnnIndex.append(spark, root, e.filter(col("vec_id") >= 450))

    val qv = e.filter(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0)
      .map(_.toDouble).toIndexedSeq
    val got = AnnIndex.query(spark, root, qv, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // reference: the same frozen (450-trained) centroids assigning ALL
    // 500 vectors in one pass, no persisted store involved
    val cents = TrainOps.ivfTrainCentroids(
      spark.read.parquet(s"$subDir/embeddings.parquet"))
    val probed = TrainOps.ivfProbeCells(cents, qv, TrainOps.IvfProbes)
    val want = TrainOps.ivfAssignCellsIdx(e, cents)
      .filter(col("cell").isin(probed: _*) && col("vec_id") =!= 0L)
      .select(col("vec_id"),
        TrainOps.cosToQueryD(col("embedding"), qv).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSeq
    assert(got.map(t => (t._2, t._3)) == want)
    // the appended half actually participates (some vec_id >= 450 in
    // the union of probed cells)
    val cellsDf = spark.read.parquet(s"$root/cells")
    assert(cellsDf.filter(col("vec_id") >= 450).count() == 50)
  }

  test("query on an uncommitted root is a loud error") {
    val spark = SparkFixture.spark
    val e = intercept[IllegalArgumentException] {
      AnnIndex.query(spark,
        java.nio.file.Files.createTempDirectory("graft-annidx-empty")
          .toString, IndexedSeq.fill(TrainOps.AnnDim)(0.1), 0L, 10)
    }
    assert(e.getMessage.contains("no committed ann index"))
  }
}
