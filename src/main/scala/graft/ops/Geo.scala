package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** contrib Spatial analog (reference dir src/contrib/Spatial:
  * cartesian tiers + geohash candidate pruning, then exact distance
  * sort): distance k-NN as a bounding-box prefilter — a NATIVE range
  * predicate Catalyst pushes into the parquet scan, playing the tier /
  * geohash-bucket role — followed by the exact distance and a top-k.
  *
  * The distance is the equirectangular approximation
  * sqrt((Δlat·kmPerDeg)² + (Δlon·kmPerDeg·cos(lat₀))²) with cos(lat₀)
  * precomputed on the driver and inlined as a LITERAL into both the
  * Spark plan and the SQL oracle: the remaining arithmetic is +,·,√ —
  * all correctly-rounded IEEE, so the gate compare is bit-stable
  * (libm sin/cos differ across engines in final ULPs; haversine is a
  * drop-in swap where that tolerance is acceptable).
  *
  * The transcript corpus carries no geo columns, so the gate derives
  * deterministic md5-based coordinates from doc_id — the operator
  * itself takes any (lat, lon) columns.
  */
object Geo {

  val KmPerDeg = 111.2

  /** Antimeridian-wrapped Δlon in degrees: ((lon − lon0 + 540) mod 360)
    * − 180 ∈ [−180, 180). The dividend is always positive for
    * lon ∈ [−180, 180] (it lies in (180, 900)), so Spark's `%` and
    * DuckDB's `%` are both plain IEEE fmod on positives — bit-identical
    * across the two engines, the gate discipline. */
  def wrapDlon(lon: Column, lon0: Double): Column =
    (lon - lit(lon0) + lit(540.0)) % lit(360.0) - lit(180.0)

  /** The SQL twin of [[wrapDlon]] (same ops, same literals). */
  def wrapDlonSql(lonExpr: String, lon0: Double): String =
    s"(($lonExpr - ($lon0) + 540.0) % 360.0) - 180.0"

  /** |wrapΔlon| ≤ dLon as plain pushdown-able range predicate(s): one
    * BETWEEN when the box stays inside ±180, an OR of two ranges when
    * it crosses the seam (a query at lon 179° must see a point at
    * −179°, 2° away), no filter when the box spans the globe. A
    * superset of the exact wrapped-distance ≤ radius check that
    * follows, so it only ever prunes. */
  def lonPred(lon: Column, lon0: Double, dLon: Double): Column =
    if (dLon >= 180.0) lit(true)
    else {
      val lo = lon0 - dLon
      val hi = lon0 + dLon
      if (lo >= -180.0 && hi <= 180.0) lon.between(lo, hi)
      else if (lo < -180.0)
        lon.between(lo + 360.0, 180.0) || lon.between(-180.0, hi)
      else lon.between(lo, 180.0) || lon.between(-180.0, hi - 360.0)
    }

  /** k nearest docs within radiusKm of (lat0, lon0); `idCol` breaks
    * distance ties (any unique column of the input frame). */
  def nearest(docs: DataFrame, latCol: String, lonCol: String,
      lat0: Double, lon0: Double, radiusKm: Double, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    val cosLat0 = math.cos(math.toRadians(lat0))
    val dLat = radiusKm / KmPerDeg
    val dLon = radiusKm / (KmPerDeg * cosLat0)
    val dy = (col(latCol) - lit(lat0)) * lit(KmPerDeg)
    val dx = wrapDlon(col(lonCol), lon0) * lit(KmPerDeg * cosLat0)
    docs
      .filter(col(latCol).between(lat0 - dLat, lat0 + dLat) &&
        lonPred(col(lonCol), lon0, dLon))
      .withColumn("dist_km", sqrt(dy * dy + dx * dx))
      .filter(col("dist_km") <= radiusKm)
      .orderBy(col("dist_km"), col(idCol))
      .limit(k)
  }

  /** Deterministic synthetic coordinates for the gate: md5-derived
    * lat ∈ [−90, 90), lon ∈ [−180, 180) from doc_id. */
  def syntheticCoords(docs: DataFrame): DataFrame = {
    def h(tag: String): Column =
      TrainOps.h60(concat(col("doc_id").cast("string"), lit(tag)))
    docs.withColumn("lat",
      (h("lat") % 1800000L).cast("double") / 10000.0 - 90.0)
      .withColumn("lon",
        (h("lon") % 3600000L).cast("double") / 10000.0 - 180.0)
  }

  /** Gate entry: k-NN over the synthetic coordinates. */
  def knnGate(spark: SparkSession, sfDir: String,
      lat0: Double, lon0: Double, radiusKm: Double, k: Int): DataFrame =
    nearest(syntheticCoords(TrainOps.docs(spark, sfDir)
      .select(col("doc_id"))), "lat", "lon", lat0, lon0, radiusKm, k)
      .select(col("doc_id"), round(col("lat"), 4).as("lat"),
        round(col("lon"), 4).as("lon"),
        round(col("dist_km"), 4).as("dist_km"))

  /** The SQL twin of [[lonPred]] (same branch structure, same literals). */
  def lonPredSql(lonExpr: String, lon0: Double, dLon: Double): String =
    if (dLon >= 180.0) "TRUE"
    else {
      val lo = lon0 - dLon
      val hi = lon0 + dLon
      if (lo >= -180.0 && hi <= 180.0) s"$lonExpr BETWEEN $lo AND $hi"
      else if (lo < -180.0)
        s"($lonExpr BETWEEN ${lo + 360.0} AND 180.0" +
          s" OR $lonExpr BETWEEN -180.0 AND $hi)"
      else
        s"($lonExpr BETWEEN $lo AND 180.0" +
          s" OR $lonExpr BETWEEN -180.0 AND ${hi - 360.0})"
    }

  /** DuckDB twin of [[knnGate]] (cos(lat₀) inlined identically; Δlon
    * wrapped at the antimeridian exactly like the engine). */
  def knnOracle(lat0: Double, lon0: Double, radiusKm: Double,
      k: Int): String = {
    val cosLat0 = math.cos(math.toRadians(lat0))
    val dLat = radiusKm / KmPerDeg
    val dLon = radiusKm / (KmPerDeg * cosLat0)
    def h(tag: String) =
      s"CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'$tag'),1,15)) AS BIGINT)"
    val dlon = wrapDlonSql("lon", lon0)
    s"""WITH pts AS (
       |  SELECT doc_id,
       |    CAST(${h("lat")} % 1800000 AS DOUBLE) / 10000.0 - 90.0 AS lat,
       |    CAST(${h("lon")} % 3600000 AS DOUBLE) / 10000.0 - 180.0 AS lon
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, lat, lon,
       |    sqrt(((lat - $lat0) * $KmPerDeg) * ((lat - $lat0) * $KmPerDeg)
       |      + (($dlon) * (${KmPerDeg * cosLat0})) * (($dlon) * (${KmPerDeg * cosLat0}))) AS dist_km
       |  FROM pts
       |  WHERE lat BETWEEN ${lat0 - dLat} AND ${lat0 + dLat}
       |    AND ${lonPredSql("lon", lon0, dLon)})
       |SELECT doc_id, round(lat, 4) AS lat, round(lon, 4) AS lon,
       |       round(dist_km, 4) AS dist_km
       |FROM d WHERE dist_km <= $radiusKm
       |ORDER BY dist_km, doc_id
       |LIMIT $k""".stripMargin
  }
}
