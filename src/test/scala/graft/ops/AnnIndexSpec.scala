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
