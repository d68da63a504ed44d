package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Health
import graft.core.Health._

/** FIXTURES.md §C5: the dashboard pack on synthesized health-tracking
  * fixtures (the reference ships these tables empty). Hand-computed
  * expectations. */
class HealthSpec extends AnyFunSuite {
  import TestSpark._

  def ts(s: String) = Timestamp.valueOf(s)

  lazy val meds = {
    import spark.implicits._
    Seq(
      Medication(1, 7, "metformin", Seq("08:00", "20:00"), isActive = true),
      Medication(2, 7, "lisinopril", Seq("09:00"), isActive = true),
      Medication(3, 7, "old-med", Seq("10:00"), isActive = false)).toDS()
  }

  lazy val doses = {
    import spark.implicits._
    Seq(
      Dose(1, 1, ts("2024-01-01 08:00:00"), "taken"),
      Dose(2, 1, ts("2024-01-01 20:00:00"), "taken"),
      Dose(3, 1, ts("2024-01-02 08:00:00"), "missed"),
      Dose(4, 2, ts("2024-01-01 09:00:00"), "taken"),
      Dose(5, 2, ts("2024-01-02 09:00:00"), "scheduled"),
      Dose(6, 3, ts("2024-01-01 10:00:00"), "missed")).toDS() // inactive med
  }

  lazy val symptoms = {
    import spark.implicits._
    Seq(
      SymptomLog(1, 7, "headache", 4, ts("2024-01-05 10:00:00")),
      SymptomLog(2, 7, "headache", 7, ts("2024-01-06 10:00:00")),
      SymptomLog(3, 7, "nausea", 2, ts("2024-01-06 12:00:00")),
      SymptomLog(4, 7, "headache", 9, ts("2024-02-01 10:00:00"))).toDS() // outside window
  }

  lazy val vitals = {
    import spark.implicits._
    Seq(
      VitalSign(1, 7, "blood_pressure", Some(120), Some(80), None, ts("2024-01-01 08:00:00")),
      VitalSign(2, 7, "blood_pressure", Some(150), Some(95), None, ts("2024-01-02 08:00:00")),
      VitalSign(3, 7, "glucose", None, None, Some(150.0), ts("2024-01-01 09:00:00")),
      VitalSign(4, 7, "glucose", None, None, Some(200.0), ts("2024-01-02 09:00:00")),
      VitalSign(5, 8, "glucose", None, None, Some(90.0), ts("2024-01-03 09:00:00"))).toDS()
  }

  test("A1 symptom trends over a window") {
    val rows = Health.symptomTrends(symptoms,
      ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")).collect()
    assert(rows.length == 2)
    val headache = rows.find(_.getString(0) == "headache").get
    assert(headache.getAs[Long]("n") == 2)
    assert(headache.getAs[Double]("avg_severity") == 5.5)
    assert(headache.getAs[Int]("max_severity") == 7)
  }

  test("A3 adherence counts only active meds, struct result") {
    val s = Health.adherence(doses, meds, userId = 7)
    // active meds: 5 doses; 3 taken, 1 missed, 1 scheduled
    assert(s == AdherenceStats(5, 3, 1, 60.0))
  }

  test("D5 typed Aggregator computes the same stats as the struct-of-aggregates") {
    import spark.implicits._
    // whole-dataset aggregation (all 6 doses, incl. the inactive med's)
    val all = doses.select(Health.AdherenceAgg.toColumn).head()
    assert(all.nTotal == doses.count())
    assert(all == AdherenceStats(all.nTotal, all.nTaken, all.nMissed,
      math.round(all.nTaken * 1000.0 / all.nTotal) / 10.0))
    // per-group: one stats row per medication, mergeable buffers
    val perMed = doses.groupByKey(_.medicationId)
      .agg(Health.AdherenceAgg.toColumn.name("stats"))
      .collect().toMap
    assert(perMed(1L) == AdherenceStats(3, 2, 1, 66.7))
    assert(perMed.values.map(_.nTotal).sum == doses.count())
  }

  test("W1 latest vital per type in one pass") {
    val rows = Health.latestVitals(vitals, userId = 7).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L))
  }

  test("J1/F2 upcoming doses joins active meds in window") {
    val rows = Health.upcomingDoses(doses, meds, 7,
      ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "lisinopril")
  }

  test("X16 abnormality rules per measurement type") {
    val flagged = Health.withAbnormalFlag(vitals.toDF())
      .orderBy("id").collect().map(_.getAs[Boolean]("is_abnormal")).toSeq
    assert(flagged == Seq(false, true, false, true, false))
  }

  test("T4 reminder schedule: days x times cross product") {
    val rows = Health.reminderSchedule(meds, "2024-03-01", days = 7).collect()
    // active meds: 2 times + 1 time = 3 per day x 7 days
    assert(rows.length == 21)
    assert(rows.head.getAs[Timestamp]("scheduledTime") == ts("2024-03-01 08:00:00"))
    assert(rows.last.getAs[Timestamp]("scheduledTime") == ts("2024-03-07 09:00:00"))
  }
}
