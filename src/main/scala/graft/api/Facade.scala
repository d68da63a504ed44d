package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{geo, vectors}
import graft.operators.{GeoSearch, VectorSearch}

/** Thin facades mirroring the reference's three entry points (SURVEY.md §3)
  * as DataFrame-in / DataFrame-out pipelines. A caller of the reference's
  * REST API can express every request against these with the same
  * parameters and defaults.
  */
object Facade {

  /** Entry point 1 — POST /search/health-services
    * (backend/main.py:426-487 → backend/hybrid_search.py:36-197).
    *
    * `services` needs (id, lat, lon, embedding?); `query` is an optional
    * 1-row frame holding the query embedding in column `qe` (the reference
    * embeds the query string via RPC; offline callers use
    * [[vectors.embedStub]]). Distance-only when absent
    * (hybrid_search.py:104-127). Defaults match main.py:430-432: 50 km
    * radius, top-10, weight 0.5, x3 over-fetch.
    */
  def searchHealthServices(services: DataFrame,
                           lat: Double, lon: Double,
                           query: Option[DataFrame] = None,
                           maxDistanceKm: Double = 50.0,
                           limit: Int = 10,
                           semanticWeight: Double = 0.5,
                           idCol: String = "id",
                           embCol: String = "embedding"): DataFrame =
    query match {
      case None =>
        GeoSearch.radiusSearch(services, col("lat"), col("lon"),
          lat, lon, maxDistanceKm, limit, tieBreak = Seq(idCol))
      case Some(q) =>
        val cand = GeoSearch.radiusSearch(services, col("lat"), col("lon"),
            lat, lon, maxDistanceKm, limit * 3, tieBreak = Seq(idCol))
          .crossJoin(broadcast(q))
        VectorSearch.hybridRerank(cand, embCol, "qe", "distance_km",
          maxDistanceKm, semanticWeight, limit, tieBreak = Seq(idCol))
    }

  /** Entry point 1, step 2 — nearest transit per result
    * (backend/main.py:466-475: top-3 stops within 1 km per service, as one
    * range join instead of N radius queries). */
  def withNearestTransit(results: DataFrame, stops: DataFrame,
                         idCol: String = "id", stopIdCol: String = "stop_id",
                         k: Int = 3, maxKm: Double = 1.0): DataFrame = {
    // preserve the service→user distance the search produced: nearestK
    // writes its own distance_km (service→stop) and would overwrite it
    val left =
      if (results.columns.contains("distance_km"))
        results.withColumnRenamed("distance_km", "service_distance_km")
      else results
    // keepUnmatched: the reference attaches a possibly-EMPTY transit
    // list to EVERY search result (main.py:466-475) — a service with no
    // stop within maxKm must stay in the response with null stop
    // columns, not vanish from the API output
    GeoSearch.nearestK(
      left, stops.withColumnRenamed("lat", "stop_lat").withColumnRenamed("lon", "stop_lon"),
      idCol, "lat", "lon", stopIdCol, "stop_lat", "stop_lon", k, maxKm,
      keepUnmatched = true)
  }

  /** D2/F10/U1/X2/O4 — `search_web`'s local path
    * (backend/tools/dataset_search.py:32-101): keyword lists route the
    * query to dataset(s) — no keyword hit searches ALL — selected frames
    * union (schemas may differ per dataset), each row gets
    * `distance_miles` (X2 miles haversine, rounded 2) when caller coords
    * and row coords exist, missing-coordinate rows sort LAST (the
    * reference's `float('inf')` default), top `maxResults`. Keyword lists
    * are verbatim from dataset_search.py:51-58. */
  val datasetRoutes: Seq[(String, Seq[String])] = Seq(
    "healthcare_resources" -> Seq("health", "medical", "clinic", "doctor",
      "hospital", "mental"),
    "shelters" -> Seq("shelter", "housing", "sleep", "bed", "emergency shelter"),
    "food_banks" -> Seq("food", "meal", "hungry", "eat", "pantry", "kitchen"))

  def routeDatasets(query: String): Seq[String] = {
    val q = query.toLowerCase
    val hits = datasetRoutes.collect {
      case (name, kws) if kws.exists(q.contains) => name
    }
    if (hits.isEmpty) datasetRoutes.map(_._1) else hits
  }

  /** `datasets` maps route name → frame with `lat`/`lon` double columns
    * (NULL when a resource has no coordinates). `tieBreak` orders
    * equal-distance rows deterministically (the reference relies on file
    * order, which a distributed union does not have). */
  def searchLocalDatasets(datasets: Map[String, DataFrame], query: String,
                          lat: Option[Double] = None, lon: Option[Double] = None,
                          maxResults: Int = 5,
                          tieBreak: Seq[String] = Nil): DataFrame = {
    val selected = routeDatasets(query).flatMap(datasets.get)
    require(selected.nonEmpty, "no routed dataset present in the map")
    val unioned = selected.reduce(_.unionByName(_, allowMissingColumns = true))
    (lat, lon) match {
      case (Some(la), Some(lo)) =>
        unioned.withColumn("distance_miles",
            round(geo.haversineMiles(col("lat"), col("lon"), lit(la), lit(lo)), 2))
          .orderBy(asc_nulls_last("distance_miles") +: tieBreak.map(col): _*)
          .limit(maxResults)
      case _ => unioned.limit(maxResults)
    }
  }

  /** POST /conversations/{id}/search-messages (backend/main.py:360-423 →
    * backend/embeddings.py:138-193): cosine KNN over one conversation's
    * message embeddings with the reference defaults (threshold 0.7,
    * top-5). The pgvector `<=>` + HNSW index becomes a brute-force scan
    * of the conversation's slice — exact, and the slice is one
    * conversation, not the corpus; corpus-wide search is
    * [[graft.operators.AnnIndex]]. */
  def searchMessages(messages: DataFrame, conversationId: Long,
                     queryVec: Seq[Float],
                     threshold: Double = 0.7, k: Int = 5,
                     embCol: String = "embedding"): DataFrame =
    VectorSearch.knn(
      messages.filter(col("conversation_id") === conversationId),
      embCol, queryVec, k, threshold)

  /** Entry point 2's terminal report — end-of-conversation batch aggregate
    * over one conversation's messages (backend/main.py:312-336). */
  def conversationReport(messages: DataFrame, conversationId: Long): DataFrame =
    messages.filter(col("conversation_id") === conversationId)
      .agg(
        count(lit(1)).as("n_messages"),
        min(col("ts")).as("started_at"),
        max(col("ts")).as("ended_at"),
        sum(when(col("role") === "user", 1).otherwise(0)).as("n_user"),
        sum(when(col("lat").isNotNull, 1).otherwise(0)).as("n_located"))

  /** Entry point 3 — GET /api/health/dashboard/{user_id}
    * (backend/health_api.py:421-471): the 7-query fan-out as independent
    * scalar aggregates over pre-filtered frames, one row out. Callers pass
    * the user's medication doses / symptoms / plans / vitals frames; the
    * adherence block mirrors health_api.py:517-555. */
  def dashboard(doses: DataFrame, symptoms: DataFrame, plans: DataFrame): DataFrame = {
    val meds = doses.agg(
      count(lit(1)).as("n_doses"),
      sum(when(col("status") === "taken", 1).otherwise(0)).as("n_taken"),
      sum(when(col("status") === "missed", 1).otherwise(0)).as("n_missed"))
      .withColumn("adherence_pct",
        when(col("n_doses") > 0, round(col("n_taken") * 100.0 / col("n_doses"), 1))
          .otherwise(lit(0.0)))
    val sym = symptoms.agg(count(lit(1)).as("n_recent_symptoms"))
    val pl = plans.filter(col("status") === "active").agg(count(lit(1)).as("n_active_plans"))
    meds.crossJoin(sym).crossJoin(pl)
  }
}
