package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) views over an append-only change log.
  *
  * The reference mutates rows in place (health tracking PATCH/DELETE,
  * health_api.py:72-100); SURVEY §7.4 re-models that as append-only logs +
  * derived views, which is also the only shape that works at 100 TB
  * (immutable parquet, no point updates). This operator derives the classic
  * warehouse SCD-2 history — one row per (key, change) with a validity
  * interval — and point-in-time snapshots from it.
  *
  * Scale shape: one shuffle on the key, one partitioned window (lead).
  * No global sort, no driver state; a key's history lands in one partition,
  * which is exactly the locality a snapshot query needs anyway.
  */
object Scd2 {

  /** History view: `valid_from` = the change's timestamp, `valid_to` = the
    * key's NEXT change (exclusive bound; NULL while current), `is_current`.
    * `tieBreak` orders simultaneous changes per key deterministically
    * (e.g. a monotonic log id) — required, because two changes with equal
    * timestamps would otherwise produce a nondeterministic interval chain.
    */
  def fromChangeLog(log: DataFrame, key: String, ts: String,
                    tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy((ts +: tieBreak).map(col): _*)
    log
      // a change without a timestamp is not a change — unfiltered it would
      // sort first and donate a NULL valid_from AND make the real first
      // version's interval start ambiguous (same dirty-input stance as
      // IntervalJoin's malformed-interval guard: skip, don't corrupt)
      .filter(col(ts).isNotNull)
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time snapshot of a history view built by [[fromChangeLog]]:
    * the one version of each key whose interval contains `at`
    * (valid_from <= at < valid_to, open-ended while current). */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
