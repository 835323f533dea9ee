package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persisted spatial cell index: the tier must be invisible (same
  * rows as the full-scan k-NN), the covering-cell routing must reach
  * the scan as a PARTITION filter, and the cell enumeration must wrap
  * and clamp correctly at the map edges. */
class GeoIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("persisted radius query == full-scan nearest, as partition prune") {
    val spark = SparkFixture.spark
    import org.apache.spark.sql.functions.col
    val pts = Geo.syntheticCoords(
      TrainOps.docs(spark, sf).select(col("doc_id")))
    val root = java.nio.file.Files
      .createTempDirectory("graft-geoidx").toString
    GeoIndex.build(spark, pts, root)
    // idempotent: same params + corpus → the manifest short-circuits
    val cellsDir = new java.io.File(s"$root/cells")
    val before = cellsDir.lastModified()
    GeoIndex.build(spark, pts, root)
    assert(cellsDir.lastModified() == before)

    for ((lat0, lon0, r) <- Seq((10.0, 20.0, 2500.0), (55.0, -170.0, 3000.0),
        (-80.0, 0.0, 1500.0))) {
      val want = Geo.nearest(pts, "lat", "lon", lat0, lon0, r, 10)
        .select("doc_id", "dist_km").collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq
      val got = GeoIndex.radius(spark, root, lat0, lon0, r, 10)
        .select("doc_id", "dist_km").collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq
      assert(got == want, s"($lat0, $lon0, $r)")
    }

    val plan = GeoIndex.radius(spark, root, 10.0, 20.0, 2500.0, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"no cell partition filter: $pf")
  }

  test("covering cells wrap at the antimeridian and clamp at the poles") {
    // 3000 km at lat 55: dLon ≈ 47° — a query at lon -170 must cover
    // cells on BOTH sides of ±180
    val cells = GeoIndex.coveringCells(55.0, -170.0, 3000.0)
    val n = 24 // 360 / 15
    val lonCols = cells.map(_ % n).distinct.sorted
    assert(lonCols.exists(_ <= 1) && lonCols.exists(_ >= n - 2),
      s"no wrap: $lonCols")
    // near the pole cos(lat) → 0 blows the lon box past the map: the
    // enumeration must clamp to full lon range, never throw or miss
    val polar = GeoIndex.coveringCells(89.0, 0.0, 1000.0)
    assert(polar.map(_ % n).distinct.size == n)
    // and a full-planet radius covers every cell exactly once
    val all = GeoIndex.coveringCells(0.0, 0.0, 25000.0)
    assert(all == all.distinct && all.size == 12 * 24)
  }
}
