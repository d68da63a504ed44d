package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The health-tracking analytics pack (reference: backend/health_api.py,
  * models in backend/health_models.py) on typed Datasets — the case
  * classes mirror FIXTURES.md §A7 (the reference's SQLAlchemy models /
  * Pydantic schemas). Mutable CRUD state becomes append-only logs with
  * latest-state views (SURVEY.md §7.4 decision 3).
  */
object Health {

  case class Medication(id: Long, userId: Long, name: String,
                        reminderTimes: Seq[String], isActive: Boolean)
  case class Dose(id: Long, medicationId: Long, scheduledTime: Timestamp,
                  status: String) // scheduled | taken | missed | skipped
  case class SymptomLog(id: Long, userId: Long, symptom: String,
                        severity: Int, loggedAt: Timestamp)
  case class VitalSign(id: Long, userId: Long, measurementType: String,
                       systolic: Option[Int], diastolic: Option[Int],
                       value: Option[Double], measuredAt: Timestamp)

  case class AdherenceStats(nTotal: Long, nTaken: Long, nMissed: Long,
                            adherencePct: Double)

  /** D5 as a genuine typed Aggregator (SURVEY §7.3 stretch (c)): the
    * adherence computation as a mergeable (total, taken, missed) buffer —
    * map-side combinable like any built-in agg, usable per-group via
    * `ds.groupByKey(...).agg(AdherenceAgg.toColumn)`. Same numbers as the
    * struct-of-aggregates form in [[adherence]] (asserted in HealthSpec);
    * the Aggregator earns its keep when the result type is reused across
    * groupings or composed with other typed columns. */
  object AdherenceAgg
      extends org.apache.spark.sql.expressions.Aggregator[Dose, (Long, Long, Long), AdherenceStats] {
    override def zero: (Long, Long, Long) = (0L, 0L, 0L)
    override def reduce(b: (Long, Long, Long), d: Dose): (Long, Long, Long) =
      (b._1 + 1,
        b._2 + (if (d.status == "taken") 1L else 0L),
        b._3 + (if (d.status == "missed") 1L else 0L))
    override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    override def finish(b: (Long, Long, Long)): AdherenceStats =
      AdherenceStats(b._1, b._2, b._3,
        if (b._1 > 0) math.round(b._2 * 1000.0 / b._1) / 10.0 else 0.0)
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
    override def outputEncoder: org.apache.spark.sql.Encoder[AdherenceStats] =
      org.apache.spark.sql.Encoders.product[AdherenceStats]
  }

  /** A1: per-symptom trend over a window — count, avg severity (1 decimal,
    * health_api.py:216-236), max severity. */
  def symptomTrends(symptoms: Dataset[SymptomLog],
                    from: Timestamp, to: Timestamp): DataFrame =
    symptoms.filter(s => !s.loggedAt.before(from) && s.loggedAt.before(to))
      .groupBy(col("symptom"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("severity")), 1).as("avg_severity"),
        max(col("severity")).as("max_severity"))
      .orderBy("symptom")

  /** A3: adherence over a dose window (health_api.py:517-555) — one
    * aggregate pass returning the typed stats struct. */
  def adherence(doses: Dataset[Dose], meds: Dataset[Medication],
                userId: Long): AdherenceStats = {
    val activeMeds = meds.filter(_.isActive).toDF()
      .select(col("id").as("medId"), col("userId").as("medUserId"))
    val row = doses.join(broadcast(activeMeds),
        doses("medicationId") === col("medId") && col("medUserId") === userId)
      .agg(count(lit(1)).as("n"),
        sum(when(doses("status") === "taken", 1).otherwise(0)).as("taken"),
        sum(when(doses("status") === "missed", 1).otherwise(0)).as("missed"))
      .head()
    // sum() over zero rows is NULL — a user with no active-med doses gets
    // 0% adherence (health_api.py behavior), not an unboxing NPE
    def long(name: String): Long =
      if (row.isNullAt(row.fieldIndex(name))) 0L else row.getAs[Long](name)
    val n = long("n")
    val taken = long("taken")
    AdherenceStats(n, taken, long("missed"),
      if (n > 0) math.round(taken * 1000.0 / n) / 10.0 else 0.0)
  }

  /** W1: latest vital per measurement type — the reference's six
    * ORDER BY measured_at DESC LIMIT 1 queries (health_api.py:285-304) as
    * one window pass. */
  def latestVitals(vitals: Dataset[VitalSign], userId: Long): DataFrame = {
    val w = Window.partitionBy(col("measurementType"))
      .orderBy(desc("measuredAt"), desc("id"))
    vitals.filter(_.userId == userId).toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("measurementType")
  }

  /** J1/F2/A4: upcoming doses in [from, to) for a user's active meds. */
  def upcomingDoses(doses: Dataset[Dose], meds: Dataset[Medication],
                    userId: Long, from: Timestamp, to: Timestamp): DataFrame =
    doses.filter(col("status") === "scheduled" &&
        col("scheduledTime") >= from && col("scheduledTime") < to)
      .join(broadcast(meds.filter(m => m.isActive && m.userId == userId).toDF()
        .select(col("id").as("medId"), col("name"))),
        col("medicationId") === col("medId"))
      .select("id", "medicationId", "name", "scheduledTime")
      .orderBy("scheduledTime", "id")

  /** X16: the per-type abnormality rule chain (health_api.py:500-514). */
  def withAbnormalFlag(vitals: DataFrame): DataFrame =
    vitals.withColumn("is_abnormal",
      when(col("measurementType") === "blood_pressure",
        col("systolic") < 90 || col("systolic") > 140 ||
          col("diastolic") < 60 || col("diastolic") > 90)
        .when(col("measurementType") === "glucose",
          col("value") < 70 || col("value") > 180)
        .when(col("measurementType") === "temperature",
          col("value") < 96.8 || col("value") > 100.4)
        .when(col("measurementType") === "heart_rate",
          col("value") < 60 || col("value") > 100)
        .when(col("measurementType") === "oxygen_saturation", col("value") < 95)
        .otherwise(lit(false)))

  /** T4: reminder-schedule generation (health_api.py:478-497) — days ×
    * reminder_times cross product via explode, "HH:mm" strings to
    * timestamps. */
  def reminderSchedule(meds: Dataset[Medication], startDay: String,
                       days: Int): DataFrame =
    meds.filter(_.isActive).toDF()
      .select(col("id").as("medicationId"), col("reminderTimes"))
      .withColumn("day", explode(expr(
        s"sequence(DATE '$startDay', DATE '$startDay' + INTERVAL ${days - 1} DAYS, INTERVAL 1 DAY)")))
      .withColumn("t", explode(col("reminderTimes")))
      .select(col("medicationId"),
        to_timestamp(concat(col("day").cast("string"), lit(" "), col("t")),
          "yyyy-MM-dd HH:mm").as("scheduledTime"))
      .orderBy("medicationId", "scheduledTime")
}
