package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.geo

/** Geospatial search operators (reference: backend/hybrid_search.py:61-102,
  * :200-253; backend/main.py:466-475).
  *
  * The reference's radius search is a PostGIS `ST_DWithin` + `ST_Distance`
  * query; its nearest-transit lookup is an N+1 loop issuing one radius query
  * per result row. Both are re-expressed as single declarative plans:
  *  - radius search = sargable bounding-box prune (pushed to the Parquet
  *    scan) + exact haversine refine + distributed top-k
  *    (`TakeOrderedAndProject`, no global sort);
  *  - nearest-k-per-row = one range join + per-key window, replacing the
  *    N+1 loop with a plan that scales to any number of left rows.
  */
object GeoSearch {

  /** All rows within `radiusKm` of (centerLat, centerLon), with a
    * `distance_km` column, nearest first, at most `limit` rows.
    * The bounding-box prefilter is what makes this scan-prunable at scale;
    * the haversine refine keeps it exact.
    */
  def radiusSearch(df: DataFrame, latCol: Column, lonCol: Column,
                   centerLat: Double, centerLon: Double,
                   radiusKm: Double, limit: Int,
                   tieBreak: Seq[String] = Nil): DataFrame =
    df.filter(geo.inBoundingBoxKm(latCol, lonCol, centerLat, centerLon, radiusKm))
      .withColumn("distance_km",
        geo.haversineKm(latCol, lonCol, lit(centerLat), lit(centerLon)))
      .filter(col("distance_km") <= radiusKm)
      .orderBy(col("distance_km") +: tieBreak.map(col): _*)
      .limit(limit)

  /** All point PAIRS within `maxKm` of each other — the LARGE×LARGE
    * spatial join ([[nearestK]]'s bbox-per-row prune works when one side
    * is small; a corpus-vs-itself distance join needs blocking, exactly
    * like LSH bands bound the text-dedup quadratic). Grid blocking: each
    * point hashes to a square cell of side ≥ maxKm; one side replicates to
    * its 3×3 neighborhood, the other stays in its home cell, so every
    * qualifying pair meets in exactly one cell (the home cell of the
    * second point) — no post-join dedup, no pair counted twice (a_id <
    * b_id). The shuffle is keyed by cell: pair search never leaves a
    * cell's neighborhood, and skew equals physical point density (salt a
    * mega-cell upstream like any hot key).
    *
    * `maxAbsLat` bounds the data's latitude range and sizes the cell so a
    * longitude degree is never wider than a cell anywhere in the data
    * (cells sized at the equator would under-block near the poles);
    * callers with global data should partition into latitude bands. Keys
    * must be non-null and unique. Returns (a_id, b_id, distance_km).
    */
  def gridPairs(df: DataFrame, keyCol: String, latCol: String, lonCol: String,
                maxKm: Double, maxAbsLat: Double): DataFrame = {
    require(maxAbsLat < 89.0, "grid blocking needs a bounded latitude range")
    val r = graft.plans.HaversineKm.EarthRadiusKm
    // cell side from the SAME spherical model that qualifies pairs — the
    // flat km-per-degree constants under-size the cell by ~0.1% and a
    // near-maxKm east-west pair just across a cell boundary would land two
    // cells apart and silently vanish. Exact bounds: a meridian arc of
    // maxKm spans toDegrees(maxKm/R) of latitude; at |lat| ≤ maxAbsLat a
    // haversine distance ≤ maxKm spans at most
    // 2·asin(sin(maxKm/2R)/cos(maxAbsLat)) of longitude (maximized with
    // both endpoints at ±maxAbsLat). A hair of float margin on top.
    val lonBound = 2.0 * math.toDegrees(math.asin(
      math.min(1.0, math.sin(maxKm / (2.0 * r)) / math.cos(math.toRadians(maxAbsLat)))))
    val cellDeg = math.max(math.toDegrees(maxKm / r), lonBound) * (1.0 + 1e-9)
    require(cellDeg < 30.0,
      "maxKm/maxAbsLat give cells >= 30 deg — the antimeridian wrap's " +
        "replica-disjointness argument needs small cells; band the data instead")
    // |lat| <= maxAbsLat is a DATA contract, not just a parameter: a row
    // beyond it needs a wider lon cell than the one sized above, and its
    // near-maxKm east-west pairs would land outside the 3x3 neighborhood
    // and silently vanish — the loud assert rides the load-bearing cell
    // id so the optimizer cannot prune it
    val latGuard = coalesce(assert_true(abs(col(latCol)) <= lit(maxAbsLat),
      lit(s"gridPairs: |lat| exceeds maxAbsLat=$maxAbsLat — the cell " +
        "sizing under-blocks beyond it and near-maxKm pairs would be " +
        "lost silently; raise maxAbsLat or band the data")).cast("long"),
      lit(0L))
    val pts = df.select(col(keyCol).as("id"), col(latCol).as("lat"), col(lonCol).as("lon"),
      (floor(col(latCol) / cellDeg).cast("long") + latGuard).as("cla"),
      floor(col(lonCol) / cellDeg).cast("long").as("clo"))
    // antimeridian: lon +179.9 and -179.9 are km apart but cells apart —
    // the replicated side adds a ±360°-shifted copy for points within
    // 2 cells of the seam, whose neighbor cells cover the other side's
    // home cells. A pair still meets exactly once: the home side never
    // shifts, and a shifted replica's cell range is ~360/cellDeg cells
    // away from the unshifted one's (disjoint for cellDeg < 30), so only
    // one replica can land on any given home cell.
    // replicas derive from pts (not a re-projection of the raw df): the
    // home cell ids and the guard live in ONE projection, so an edit
    // cannot desynchronize home and replica cells and break the
    // meets-exactly-once argument
    val shifted = pts.filter(abs(col("lon")) > 180.0 - 2.0 * cellDeg)
      .withColumn("clo",
        floor((col("lon") + when(col("lon") > 0, -360.0).otherwise(360.0)) / cellDeg)
          .cast("long"))
    val a = pts.unionByName(shifted)
      .toDF("a_id", "a_lat", "a_lon", "a_cla", "a_clo")
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), i -> struct(i div 3 - 1 AS dy, i % 3 - 1 AS dx))")))
      .select(col("a_id"), col("a_lat"), col("a_lon"),
        (col("a_cla") + col("d.dy")).as("cla"), (col("a_clo") + col("d.dx")).as("clo"))
      .hint("shuffle_hash")
    val b = pts.toDF("b_id", "b_lat", "b_lon", "cla", "clo").hint("shuffle_hash")
    a.join(b, Seq("cla", "clo"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("distance_km",
        geo.haversineKm(col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon")))
      .filter(col("distance_km") <= maxKm)
      .select(col("a_id"), col("b_id"), col("distance_km"))
  }

  /** For every left row, the `k` nearest right rows within `maxKm`
    * (reference: per-service top-3 transit stops within 1 km,
    * backend/main.py:466-475). One range join + window instead of N queries.
    * `leftKey` must be unique per left row. The join condition carries the
    * bounding-box predicate so Catalyst can plan a pruned join rather than a
    * full cartesian product.
    */
  def nearestK(left: DataFrame, right: DataFrame,
               leftKey: String, leftLat: String, leftLon: String,
               rightKey: String, rightLat: String, rightLon: String,
               k: Int, maxKm: Double,
               keepUnmatched: Boolean = false): DataFrame = {
    // per-row bbox prune with the pole/antimeridian policy shared with the
    // scalar form and the optimizer rule (geo.bboxJoinCondition — one
    // source of truth for the constants and the 89° cutoff).
    //
    // keepUnmatched = false is the SQL-inner shape the oracle pins (a
    // left row with no right row within maxKm disappears); the REFERENCE
    // semantics (backend/main.py:466-475 — a possibly-EMPTY transit list
    // attached to EVERY search result) are keepUnmatched = true: the
    // distance qualifier moves INTO the left join's condition, so a
    // match-less left row survives with null neighbor columns and
    // rank_nearest 1 instead of being silently dropped from the API
    // response. [[graft.api.Facade.withNearestTransit]] uses true.
    val qualCond = geo.bboxJoinCondition(left(leftLat), left(leftLon),
      right(rightLat), right(rightLon), maxKm) &&
      geo.haversineKm(left(leftLat), left(leftLon),
        right(rightLat), right(rightLon)) <= maxKm
    val joined =
      if (keepUnmatched)
        left.join(right, qualCond, "left")
          .withColumn("distance_km",
            geo.haversineKm(left(leftLat), left(leftLon),
              right(rightLat), right(rightLon)))
      else
        left.join(right,
          geo.bboxJoinCondition(left(leftLat), left(leftLon),
            right(rightLat), right(rightLon), maxKm))
          .withColumn("distance_km",
            geo.haversineKm(left(leftLat), left(leftLon),
              right(rightLat), right(rightLon)))
          .filter(col("distance_km") <= maxKm)
    // rightKey breaks distance ties — equidistant rows would otherwise make
    // row_number() nondeterministic across runs/engines
    val w = Window.partitionBy(left(leftKey))
      .orderBy(col("distance_km"), right(rightKey))
    joined.withColumn("rank_nearest", row_number().over(w))
      .filter(col("rank_nearest") <= k)
  }
}
