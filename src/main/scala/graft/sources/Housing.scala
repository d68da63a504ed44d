package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Housing-elements pipeline and document search
  * (reference: backend/convert_housing_to_json.py:29-87 — CSV → nested JSON;
  * backend/search_housing.py:30-86 — predicate + substring search over the
  * documents; demo searches :88-152).
  *
  * The reference materializes 17,358 nested JSON records once and then
  * linear-scans them in Python per query. Here the nested shape is a
  * DataFrame projection and every search is a pushdown-friendly filter —
  * the 9.3 MB corpus is incidental; the same plan runs on 9.3 TB.
  */
object Housing {

  /** A4 CSV → the nested record shape of FIXTURES.md §A4 / the reference's
    * housing_elements.json (convert_housing_to_json.py:31-50), including
    * X10's lowercase searchable_text. */
  def fromCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = CsvClean.normalizeHeaders(CsvClean.readCsv(spark, path))
    raw.select(
      col("OBJECTID").cast("long").as("id"),
      col("Jurisdiction").as("jurisdiction"),
      col("APN").as("apn"),
      coalesce(col("Vacancy"), lit("Unknown")).as("vacancy_status"),
      col("Units").cast("long").as("units"),
      struct(
        col("Zoning").as("code"),
        col("ZoningSimplified").as("simplified"),
        col("Min_Density").cast("double").as("min_density"),
        col("Max_Density").cast("double").as("max_density")).as("zoning"),
      col("Links").as("info_link"),
      struct(
        col("Shape__Area").cast("double").as("square_feet"),
        col("Shape__Length").cast("double").as("perimeter_feet")).as("area"),
      lower(concat_ws(" ",
        col("Jurisdiction"), col("ZoningSimplified"), col("Vacancy"),
        col("Zoning"))).as("searchable_text"))
  }

  /** search_housing.py:30-86 as one declarative filter chain. All-None
    * arguments scan everything; `limit` mirrors the early-exit scan (O5).
    * Semantics preserved exactly: substring on searchable_text (F9),
    * case-insensitive equality for jurisdiction/zoning (F8), exact
    * 'Vacant' check (F11), inclusive unit bounds (F7). */
  def search(docs: DataFrame,
             query: Option[String] = None,
             jurisdiction: Option[String] = None,
             zoningType: Option[String] = None,
             vacantOnly: Boolean = false,
             minUnits: Option[Long] = None,
             maxUnits: Option[Long] = None,
             limit: Int = 100): DataFrame = {
    val preds: Seq[Column] = Seq(
      query.map(q => col("searchable_text").contains(q.toLowerCase)),
      jurisdiction.map(j => lower(col("jurisdiction")) === j.toLowerCase),
      zoningType.map(z => lower(col("zoning.simplified")) === z.toLowerCase),
      if (vacantOnly) Some(col("vacancy_status") === "Vacant") else None,
      minUnits.map(col("units") >= _),
      maxUnits.map(col("units") <= _)).flatten
    preds.foldLeft(docs)(_ filter _).limit(limit)
  }

  /** The precomputed summary block (A5, convert_housing_to_json.py:55-69). */
  def summary(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("total_records"),
      sum(col("units")).as("total_units"),
      min(col("units")).as("min_units"),
      max(col("units")).as("max_units"),
      countDistinct(col("jurisdiction")).as("n_jurisdictions"),
      count(when(col("vacancy_status") === "Vacant", 1)).as("n_vacant"))
}
