package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column expressions.
  *
  * Re-expresses the reference's two haversine implementations
  * (backend/hybrid_search.py:13-33 — km, R=6371, asin form;
  * backend/tools/dataset_search.py:14-29 — miles, R=3959, atan2 form) as
  * pure Catalyst column expressions: codegen'd, no UDF, fully pushdown- and
  * whole-stage-codegen-friendly. Both constants are kept because the
  * reference uses both and oracle parity requires each form exactly.
  */
object geo {

  // ONE spherical model for the whole geo surface: the codegen
  // expression (plans.HaversineKm) owns the constant, and the Column
  // form, the grid-blocking cell sizing (GeoSearch.gridPairs), and the
  // DuckDB renderings all read it from there — two independently-defined
  // radii drifting apart would size grid cells on a different sphere
  // than the pair-qualifying distance, silently losing near-maxKm pairs
  // across cell boundaries.
  private val EarthRadiusKm    = graft.plans.HaversineKm.EarthRadiusKm
  private val EarthRadiusMiles = 3959.0

  /** Great-circle distance in km (asin form, R=6371). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(EarthRadiusKm) * lit(2.0) * asin(sqrt(a))
  }

  /** Great-circle distance in miles (atan2 form, R=3959). */
  def haversineMiles(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(EarthRadiusMiles) * lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** km → miles (backend/hybrid_search.py:122). */
  val kmToMilesFactor = 0.621371
  def kmToMiles(km: Column): Column = km * kmToMilesFactor

  /** Bounding-box pre-filter for a radius search: a cheap sargable predicate
    * (plain comparisons on lat/lon) that Parquet row-group stats and
    * partition pruning can use, evaluated BEFORE the trig. At 100 TB this is
    * the difference between scanning every row-group and skipping most:
    * haversine(…) <= r itself can never be pushed to the scan, but
    * lat BETWEEN a AND b can. One degree of latitude ≈ 110.574 km.
    *
    * The longitude window uses the cosine at the WORST latitude inside the
    * band (|center|+dLat), not at the center: a point at the radius's
    * poleward edge needs a wider window than the center latitude suggests,
    * and using the center cosine under-covers by ~0.5% at r=50 km — enough
    * to silently drop an in-radius row at bearing ≈ 89°. Must only ever
    * over-cover (the exact haversine predicate refines); the over-coverage
    * property is asserted in PropertiesSpec.
    */
  def inBoundingBoxKm(lat: Column, lon: Column, centerLat: Double, centerLon: Double,
                      radiusKm: Double): Column = {
    val (dLat, dLonOpt) = bboxDeltas(centerLat, radiusKm)
    val latBox = lat.between(centerLat - dLat, centerLat + dLat)
    dLonOpt match {
      // near a pole every longitude can be in range — lat-only prune
      case None => latBox
      // a lon window crossing the antimeridian can't be one BETWEEN — keep
      // only the lat prune there rather than silently under-cover
      case Some(dLon) if centerLon - dLon < -180.0 || centerLon + dLon > 180.0 => latBox
      case Some(dLon) => latBox && lon.between(centerLon - dLon, centerLon + dLon)
    }
  }

  /** shared box-policy constants — ONE source of truth for the scalar
    * ([[bboxDeltas]]) and column ([[bboxJoinCondition]]) forms */
  val KmPerDegreeLat = 110.574
  val KmPerDegreeLonAtEquator = 111.320
  val PoleCutoffDeg = 89.0

  /** bbox deltas as plain numbers (shared with tests / the optimizer rule).
    * The lon delta is None when the lat band reaches within 1° of a pole
    * (|center|+dLat ≥ 89): there a fixed lon window computed at any clamped
    * latitude would UNDER-cover (points near the pole span all longitudes),
    * so callers must fall back to the lat-only prune — the box predicate's
    * contract is strictly over-cover-only (the exact haversine refines). */
  def bboxDeltas(centerLat: Double, radiusKm: Double): (Double, Option[Double]) = {
    val dLat = radiusKm / KmPerDegreeLat
    val worstLat = math.abs(centerLat) + dLat
    if (worstLat >= PoleCutoffDeg) (dLat, None)
    else (dLat, Some(radiusKm / (KmPerDegreeLonAtEquator * math.cos(math.toRadians(worstLat)))))
  }

  /** Column-level bounding-box JOIN condition for a per-row radius (the
    * range-join prune of [[graft.operators.GeoSearch.nearestK]]): right
    * rows outside the box around (leftLat, leftLon) can be skipped before
    * the haversine refine. Same policy, same constants as [[bboxDeltas]] —
    * the per-row lon window is sized at the WORST latitude inside each
    * row's band, drops to lat-only within 1° of a pole (all longitudes
    * reachable) and across the antimeridian (one BETWEEN can't wrap).
    * Over-cover-only, like every box predicate here: the exact haversine
    * refines survivors, so results never change, only the pair count.
    */
  def bboxJoinCondition(leftLat: Column, leftLon: Column,
                        rightLat: Column, rightLon: Column,
                        maxKm: Double): Column = {
    val dLat = maxKm / KmPerDegreeLat
    val worstLat = abs(leftLat) + lit(dLat)
    val dLon = lit(maxKm) / (lit(KmPerDegreeLonAtEquator) * cos(radians(worstLat)))
    val crossesAm = (leftLon - dLon < -180.0) || (leftLon + dLon > 180.0)
    rightLat.between(leftLat - dLat, leftLat + dLat) &&
      (worstLat >= PoleCutoffDeg || crossesAm ||
        rightLon.between(leftLon - dLon, leftLon + dLon))
  }

  /** Deterministic synthetic coordinates derived from an integer key —
    * the driver testdata has no geo columns, so geo operators are exercised
    * on coordinates that both Spark and the DuckDB oracle derive from the
    * same exact integer arithmetic (SURVEY.md §7.5).
    * lat ∈ [32.0, 33.0), lon ∈ [-117.5, -115.5).
    */
  def synthLat(key: Column): Column = lit(32.0) + (key % 200) * 0.005
  def synthLon(key: Column): Column = lit(-117.5) + ((key * 37) % 400) * 0.005

  /** Same derivation as SQL text, for oracle queries. */
  def synthLatSql(key: String): String = s"(32.0 + ($key % 200) * 0.005)"
  def synthLonSql(key: String): String = s"(-117.5 + (($key * 37) % 400) * 0.005)"

  /** Haversine-km as SQL text (DuckDB + Spark SQL compatible), for oracles. */
  def haversineKmSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"(6371.0 * 2.0 * asin(sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2))))"

  /** Miles/atan2 form as SQL text (X2, dataset_search.py:14-29 — R=3959,
    * atan2(sqrt(a), sqrt(1-a))), kept exactly like its [[haversineMiles]]
    * Column twin; `tools/ref_parity.py` checks it against the reference's
    * own Python. */
  def haversineMilesSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val a = s"(pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2))"
    s"(3959.0 * 2.0 * atan2(sqrt($a), sqrt(1.0 - $a)))"
  }
}
