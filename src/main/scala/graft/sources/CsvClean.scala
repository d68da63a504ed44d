package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingest operators (reference: backend/import_datasets.py).
  *
  * The reference reads county open-data CSVs with pandas
  * (`encoding='utf-8-sig'`, BOM-tolerant — import_datasets.py:24-27),
  * normalizes headers (:32), then loops rows casting/truncating per column
  * (:48-63). Here the whole path is declarative: one multiline-aware CSV
  * scan (the `Services` cells contain embedded newlines), a header rename,
  * and a single projection of casts — columnar, pushdown-friendly, no
  * per-row Python.
  */
object CsvClean {

  /** S1: BOM-tolerant, multiline-quoted CSV scan. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** S2: strip whitespace + UTF-8 BOM remnants from header names
    * (import_datasets.py:32). */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.strip.replace("﻿", "")): _*)

  /** S3: cast a column to a type with a null-guard; strings truncate to 255
    * chars exactly like the reference's `str(...)[:255]`
    * (import_datasets.py:51-61). */
  def castTruncate(df: DataFrame, specs: Map[String, String]): DataFrame =
    specs.foldLeft(df) { case (d, (c, t)) =>
      if (t == "string255") d.withColumn(c, substring(col(c), 1, 255))
      else d.withColumn(c, col(c).cast(t))
    }

  /** S8: drop rows with missing coordinates (convert_csv_to_json.py:26-27). */
  def dropMissingCoords(df: DataFrame, latCol: String, lonCol: String): DataFrame =
    df.filter(col(latCol).isNotNull && col(lonCol).isNotNull)

  /** X9: embedding-text construction — trimmed concat of descriptive fields
    * (import_datasets.py:38-39). */
  def withEmbeddingText(df: DataFrame, cols: Seq[String], out: String = "embedding_text"): DataFrame =
    df.withColumn(out, trim(concat_ws(" ", cols.map(c => coalesce(col(c), lit(""))): _*)))

  /** The health-services ingest end-to-end (S1→S2→S3→S8→X9): the reference's
    * import_health_datasets (import_datasets.py:17-96) minus the external
    * embedding RPC and the Postgres sink. */
  def healthServices(spark: SparkSession, path: String): DataFrame = {
    val raw = normalizeHeaders(readCsv(spark, path))
    val cast = castTruncate(raw, Map(
      "LONG" -> "double", "LAT" -> "double",
      "Program" -> "string255", "Address" -> "string255",
      "Phone" -> "string255", "Description" -> "string255"))
    withEmbeddingText(dropMissingCoords(cast, "LAT", "LONG"),
      Seq("Program", "Description", "Services", "Population"))
      .withColumnRenamed("LAT", "lat").withColumnRenamed("LONG", "lon")
  }

  /** X11: split a multi-line cell into a trimmed, non-empty array
    * (convert_csv_to_json.py:30-32). */
  def splitLines(c: String): org.apache.spark.sql.Column =
    filter(transform(split(col(c), "\n"), s => trim(s)), s => s =!= "")

  /** Ingest data-quality report: one pass, one row — total rows plus the
    * count violating each named rule (a rule is a Column predicate that is
    * TRUE when the row is BAD). The reference prints row counts after
    * import and nothing else (import_datasets.py:95,168,221); at 100 TB an
    * ingest without per-rule violation counts is an ingest nobody can
    * debug. Conditional aggregation — map-side combinable, no shuffle of
    * the data itself, so the report is (nearly) free next to the write it
    * accompanies.
    */
  def qualityReport(df: DataFrame,
                    rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"n_$name")
      }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** [[qualityReport]] as ZERO extra passes: attaches the same counters to
    * the frame via `Dataset.observe`, so they accumulate WHILE the next
    * action (typically the ingest write) runs and arrive on the returned
    * [[org.apache.spark.sql.Observation]] afterwards. At 100 TB this is
    * the difference between one scan and two — the separate-pass report
    * re-reads the corpus just to count violations; observed metrics ride
    * the write for free (AccumulatorV2 under the hood, merged on the
    * driver per task, exactly-once per successful action).
    *
    * Usage:
    * {{{
    *   val (obs, framed) = CsvClean.observedQuality(clean, rules)
    *   framed.write.parquet(out)          // the ingest itself
    *   val m = obs.get                    // Map(n_rows -> ..., n_<rule> -> ...)
    * }}}
    */
  def observedQuality(df: DataFrame,
                      rules: Seq[(String, org.apache.spark.sql.Column)])
      : (org.apache.spark.sql.Observation, DataFrame) = {
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"n_$name")
      }
    (obs, df.observe(obs, aggs.head, aggs.tail: _*))
  }
}
