package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Facade
import graft.functions.vectors
import graft.sources.CsvClean

/** SURVEY.md §7.2's minimum end-to-end slice: entry point 1 on the
  * reference's own CSVs — services within 50 km of downtown San Diego,
  * top-10 by distance, each with its 3 nearest stops within 1 km — plus
  * the semantic re-rank variant with the deterministic embedder. */
class FacadeSpec extends AnyFunSuite {
  import TestSpark._

  val servicesCsv =
    "/root/reference/backend/datasets/Behavioral_Health_Services_San_Diego_County_1657686067853346365.csv"
  val stopsCsv =
    "/root/reference/backend/datasets/Public_Transit_Stops%2C_San_Diego_County.csv"

  lazy val services = CsvClean.healthServices(spark, servicesCsv)
    .withColumn("id", monotonically_increasing_id())
    .withColumn("embedding", vectors.embedStub("embedding_text", 16))
    .cache()

  lazy val stops = CsvClean.normalizeHeaders(CsvClean.readCsv(spark, stopsCsv))
    .select(col("stop_id"),
      col("stop_lat").cast("double").as("lat"),
      col("stop_lon").cast("double").as("lon"))
    .filter(col("lat").isNotNull && col("lon").isNotNull)
    .cache()

  test("distance-only search: top-10 within 50km, ordered by distance") {
    val res = Facade.searchHealthServices(services, 32.7157, -117.1611).collect()
    assert(res.length == 10)
    val d = res.map(_.getAs[Double]("distance_km"))
    assert(d.forall(_ <= 50.0) && d.sameElements(d.sorted))
  }

  test("hybrid search: semantic re-rank changes ordering, keeps radius") {
    val q = services.limit(1)
      .select(vectors.embedStub("embedding_text", 16).as("qe"))
    val res = Facade.searchHealthServices(services, 32.7157, -117.1611,
      query = Some(q)).collect()
    assert(res.length == 10)
    val scores = res.map(_.getAs[Double]("combined_score"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(res.forall(_.getAs[Double]("distance_km") <= 50.0))
    assert(res.forall { r =>
      val s = r.getAs[Double]("similarity"); s >= -1.0001 && s <= 1.0001
    })
  }

  test("nearest transit join: <=3 stops within 1km per result, one plan") {
    val top = Facade.searchHealthServices(services, 32.7157, -117.1611)
    val withStops = Facade.withNearestTransit(top, stops).collect()
    assert(withStops.nonEmpty)
    val perService = withStops.groupBy(_.getAs[Long]("id")).view.mapValues(_.length)
    assert(perService.values.forall(_ <= 3))
    // matched rows qualify by distance; a service with NO stop in range
    // may ride along with null stop columns (the reference attaches a
    // possibly-empty list to every result)
    assert(withStops.filter(!_.isNullAt(withStops.head.fieldIndex("distance_km")))
      .forall(_.getAs[Double]("distance_km") <= 1.0))
    assert(withStops.forall(_.getAs[Int]("rank_nearest") <= 3))
    // EVERY search result survives the enrichment — main.py:466-475
    // attaches nearby_transit (possibly []) per result; the old inner
    // join silently DROPPED services with no stop within 1 km from the
    // API response
    assert(withStops.map(_.getAs[Long]("id")).distinct.length ==
        top.count(),
      "a service without nearby transit vanished from the response")
    import spark.implicits._
    val lonely = Seq((999L, 0.0, 0.0)).toDF("id", "lat", "lon")
    val enriched = Facade.withNearestTransit(lonely, stops).collect()
    assert(enriched.length == 1 && enriched.head.getAs[Long]("id") == 999L &&
        enriched.head.isNullAt(enriched.head.fieldIndex("stop_id")),
      "match-less service did not survive with null stop columns")
  }

  test("message KNN: conversation-scoped, thresholded, top-k, sim-ordered") {
    import spark.implicits._
    val q = Seq(1.0f, 0.0f, 0.0f)
    val msgs = Seq(
      (1L, 100L, Seq(1.0f, 0.0f, 0.0f)),   // sim 1.0
      (2L, 100L, Seq(0.9f, 0.1f, 0.0f)),   // high sim
      (3L, 100L, Seq(0.0f, 1.0f, 0.0f)),   // sim 0 -> below threshold
      (4L, 200L, Seq(1.0f, 0.0f, 0.0f)))   // other conversation
      .toDF("message_id", "conversation_id", "embedding")
    val got = Facade.searchMessages(msgs, 100L, q)
      .select("message_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L)) // scoped, thresholded, ordered by sim desc
  }

  test("dashboard fan-out: one row of scalar aggregates") {
    import spark.implicits._
    val doses = Seq(("taken"), ("taken"), ("missed"), ("scheduled"))
      .toDF("status")
    val symptoms = Seq(1, 2, 3).toDF("x")
    val plans = Seq("active", "active", "completed").toDF("status")
    val row = Facade.dashboard(doses, symptoms, plans).head()
    assert(row.getAs[Long]("n_doses") == 4)
    assert(row.getAs[Double]("adherence_pct") == 50.0)
    assert(row.getAs[Long]("n_recent_symptoms") == 3)
    assert(row.getAs[Long]("n_active_plans") == 2)
  }

  test("dataset routing + union + miles sort mirrors dataset_search.py") {
    import spark.implicits._
    // reference keyword routing (dataset_search.py:51-62)
    assert(Facade.routeDatasets("mental health support") == Seq("healthcare_resources"))
    assert(Facade.routeDatasets("where can I SLEEP") == Seq("shelters"))
    assert(Facade.routeDatasets("food and shelter") == Seq("shelters", "food_banks"))
    assert(Facade.routeDatasets("help me please").length == 3) // no hit -> all
    val hc = Seq((1L, "clinic A", Some(32.71), Some(-117.16)),
      (2L, "clinic B", Some(32.90), Some(-117.10)),
      (3L, "clinic no-coords", None, None))
      .toDF("id", "name", "lat", "lon")
    val sh = Seq((10L, "shelter X", Some(32.72), Some(-117.15)))
      .toDF("id", "name", "lat", "lon")
    val got = Facade.searchLocalDatasets(
      Map("healthcare_resources" -> hc, "shelters" -> sh, "food_banks" -> sh.limit(0)),
      "help me please", Some(32.7157), Some(-117.1611),
      maxResults = 4, tieBreak = Seq("id"))
      .select("id", "distance_miles").collect()
    // all three datasets searched, sorted by miles, missing coords LAST
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 10L, 2L, 3L))
    assert(got.last.isNullAt(1))
    val d = got.head.getDouble(1)
    assert(d > 0.0 && d < 1.0, s"clinic A should be well under a mile, got $d")
  }
}
