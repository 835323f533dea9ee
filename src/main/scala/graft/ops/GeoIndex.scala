package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted spatial cell index — the contrib Spatial prefix/tier
  * analog (reference dir src/contrib/Spatial: CartesianTierPlotter
  * plots each point into a fixed grid cell whose id becomes an indexed
  * field; a radius query enumerates the covering cell ids and only
  * those candidates reach the exact distance check). Spark-first, the
  * tier is a PARTITION COLUMN: the corpus is persisted partitioned by
  * an integer lat/lon grid cell, a radius query computes its covering
  * cell IN-list on the driver, and `cell IN (...)` prunes partitions
  * at the scan — at 100 TB a radius query reads the covered cells'
  * files instead of the planet (the [[AnnIndex]] pattern, reused).
  *
  * Cell routing is correctness-invisible: the cell ranges cover the
  * SAME bounding box [[Geo.nearest]] filters on (cell-of is monotone
  * per axis), and the exact equirectangular distance + radius check
  * re-runs on the survivors — so the persisted path satisfies the
  * same oracle as the scan path. Longitude cells wrap at ±180; a
  * high-latitude query whose box exceeds the map clamps to full
  * range (over-covering only ever costs I/O, never rows). */
object GeoIndex {

  private val ManifestName = "manifest.json"

  /** Grid resolution in degrees. 15° → 12×24 = 288 cells: coarse
    * enough that the gate corpus keeps real files per cell, fine
    * enough that the gate's 2500 km query prunes ~94% of cells. At
    * scale pick the tier like the reference does: cell width ≈ the
    * typical query radius. */
  val CellDeg = 15.0

  private def nLat(cellDeg: Double) = math.ceil(180.0 / cellDeg).toInt
  private def nLon(cellDeg: Double) = math.ceil(360.0 / cellDeg).toInt

  private def latIdx(lat: Double, cellDeg: Double): Int =
    math.min(nLat(cellDeg) - 1,
      math.max(0, math.floor((lat + 90.0) / cellDeg).toInt))
  private def lonIdx(lon: Double, cellDeg: Double): Int = {
    val n = nLon(cellDeg)
    val i = math.floor((lon + 180.0) / cellDeg).toInt
    ((i % n) + n) % n
  }

  /** Cell id column: latRow * nLon + lonCol (same clamping as the
    * driver-side [[latIdx]]/[[lonIdx]] so routing covers exactly). */
  private def cellCol(lat: Column, lon: Column, cellDeg: Double): Column = {
    val nLo = nLon(cellDeg)
    val la = least(lit(nLat(cellDeg) - 1),
      greatest(lit(0), floor((lat + 90.0) / cellDeg).cast("int")))
    val lo = pmod(floor((lon + 180.0) / cellDeg).cast("int"), lit(nLo))
    (la * nLo + lo).cast("int")
  }

  def defaultRoot(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val tag = Integer.toHexString(sfDir.hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft_geo_${safe}_$tag"
  }

  /** Persist `points` (id, lat, lon) partitioned by grid cell; no-op
    * when a manifest with the same params and corpus fingerprint is
    * already committed (the SegmentStore/[[AnnIndex]] idempotent-commit
    * discipline: manifest deleted before a rebuild, written last via
    * atomic rename). */
  def build(spark: SparkSession, points: DataFrame, root: String,
      cellDeg: Double = CellDeg, idCol: String = "doc_id"): String = {
    val fpRow = points.select(TrainOps.h60(concat(
        col(idCol).cast("string"), lit(":"),
        col("lat").cast("string"), lit(","),
        col("lon").cast("string"))).as("h"))
      .agg(count(lit(1)),
        expr("coalesce(bit_xor(h), CAST(0 AS BIGINT))")).collect()(0)
    val params = s"""{"cell_deg":$cellDeg,"id":"$idCol",""" +
      s""""corpus_n":${fpRow.getLong(0)},"corpus_h":${fpRow.getLong(1)}}"""
    val manifest = new java.io.File(root, ManifestName)
    if (manifest.isFile) {
      val have = new String(java.nio.file.Files.readAllBytes(
        manifest.toPath), "UTF-8")
      if (have == params) return root
      java.nio.file.Files.delete(manifest.toPath)
    }
    points.select(col(idCol), col("lat"), col("lon"))
      .withColumn("cell", cellCol(col("lat"), col("lon"), cellDeg))
      // cluster by cell BEFORE the partitioned write: without it every
      // task holding rows of a cell emits its own file — up to
      // tasks × cells small files (the ×10 scale-stress sweep measured
      // the build at 25× wall for 10× data, all in file open/commit).
      // Hash-clustered, each cell's rows land in one task → ≤ one file
      // per cell regardless of corpus size or parallelism
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root/cells")
    val tmp = new java.io.File(root, s"$ManifestName.tmp")
    java.nio.file.Files.createDirectories(tmp.toPath.getParent)
    java.nio.file.Files.write(tmp.toPath, params.getBytes("UTF-8"))
    if (!tmp.renameTo(manifest))
      sys.error(s"geo index commit failed: $root")
    root
  }

  /** Covering cell ids for the query's bounding box — the driver-side
    * twin of the reference's CartesianShapeFilter cell enumeration. */
  def coveringCells(lat0: Double, lon0: Double, radiusKm: Double,
      cellDeg: Double = CellDeg): Seq[Int] = {
    val cosLat0 = math.cos(math.toRadians(lat0))
    val dLat = radiusKm / Geo.KmPerDeg
    val dLon =
      if (cosLat0 <= 1e-9) 180.0
      else math.min(180.0, radiusKm / (Geo.KmPerDeg * cosLat0))
    val laLo = latIdx(lat0 - dLat, cellDeg)
    val laHi = latIdx(lat0 + dLat, cellDeg)
    val n = nLon(cellDeg)
    val loCells: Seq[Int] =
      if (2 * dLon >= 360.0 - cellDeg) 0 until n
      else {
        val lo = math.floor((lon0 - dLon + 180.0) / cellDeg).toInt
        val hi = math.floor((lon0 + dLon + 180.0) / cellDeg).toInt
        (lo to hi).map(i => ((i % n) + n) % n).distinct
      }
    (for (la <- laLo to laHi; lo <- loCells) yield la * n + lo).sorted
  }

  /** k nearest within radiusKm via the persisted index: the covering
    * cell IN-list is a PARTITION filter (only covered cells' files are
    * read), then the exact distance + radius check — same arithmetic,
    * same results, same oracle as [[Geo.nearest]]'s full scan. */
  def radius(spark: SparkSession, root: String, lat0: Double,
      lon0: Double, radiusKm: Double, k: Int,
      cellDeg: Double = CellDeg, idCol: String = "doc_id"): DataFrame = {
    require(new java.io.File(root, ManifestName).isFile,
      s"no committed geo index at $root")
    val cells = coveringCells(lat0, lon0, radiusKm, cellDeg)
    val cosLat0 = math.cos(math.toRadians(lat0))
    val dLat = radiusKm / Geo.KmPerDeg
    val dLon = radiusKm / (Geo.KmPerDeg * cosLat0)
    val dy = (col("lat") - lit(lat0)) * lit(Geo.KmPerDeg)
    // wrapped Δlon (the covering-cell enumeration already wraps; the
    // residual filter and distance must too, or a query at lon 179°
    // never sees a point at −179° even after its cell was read)
    val dx = Geo.wrapDlon(col("lon"), lon0) * lit(Geo.KmPerDeg * cosLat0)
    spark.read.parquet(s"$root/cells")
      .filter(col("cell").isin(cells: _*)) // partition-pruned
      .filter(col("lat").between(lat0 - dLat, lat0 + dLat) &&
        Geo.lonPred(col("lon"), lon0, dLon))
      .withColumn("dist_km", sqrt(dy * dy + dx * dx))
      .filter(col("dist_km") <= radiusKm)
      .orderBy(col("dist_km"), col(idCol))
      .limit(k)
  }

  /** Gate entry: build (or reuse) the persisted cell index over the
    * synthetic coordinates and answer the SAME query as geo_knn — the
    * cell tier must be invisible in the rows. */
  def knnGate(spark: SparkSession, sfDir: String, lat0: Double,
      lon0: Double, radiusKm: Double, k: Int): DataFrame = {
    val pts = Geo.syntheticCoords(
      TrainOps.docs(spark, sfDir).select(col("doc_id")))
    val root = build(spark, pts, defaultRoot(sfDir))
    radius(spark, root, lat0, lon0, radiusKm, k)
      .select(col("doc_id"), round(col("lat"), 4).as("lat"),
        round(col("lon"), 4).as("lon"),
        round(col("dist_km"), 4).as("dist_km"))
  }
}
