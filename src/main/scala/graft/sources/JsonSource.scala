package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-JSON source and sink (reference: backend/search_housing.py:7-9,
  * backend/convert_housing_to_json.py:29-87, backend/datasets/
  * convert_csv_to_json.py:35-53).
  *
  * The reference materializes CSVs into nested JSON documents
  * ({zoning:{...}, area:{...}, searchable_text}) plus a precomputed summary
  * block, then searches them with in-memory Python loops. Here the same
  * documents are first-class DataFrames: multiline JSON scan, struct
  * construction on write, and the summary as one aggregate pass (A5).
  */
object JsonSource {

  /** S5: scan a multiline JSON document file. Arrays of records (the
    * healthcare/transit files) land one row per element; a wrapped corpus
    * ({metadata, summary, data:[...]}) should be followed by
    * [[explodeWrapped]]. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S5 (wrapped form): {metadata, summary, data:[...]} → one row per
    * data element (search_housing.py loads `data` the same way). */
  def explodeWrapped(df: DataFrame, dataCol: String = "data"): DataFrame =
    df.select(explode(col(dataCol)).as("rec")).select("rec.*")

  /** S7: build the reference's nested housing record shape
    * (convert_housing_to_json.py:31-50): flat columns → {id, zoning{...},
    * area{...}, searchable_text}. X10: searchable_text = lowercase concat. */
  def nestHousing(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      struct(
        col("jurisdiction"), col("zoning_type"), col("vacancy_status")).as("zoning"),
      struct(col("units"), col("shape_area")).as("area"),
      lower(concat_ws(" ",
        col("jurisdiction"), col("zoning_type"), col("vacancy_status"),
        col("units").cast("string"))).as("searchable_text"))

  /** A5: the precomputed summary block (convert_housing_to_json.py:55-69):
    * one aggregate pass instead of five pandas passes. */
  def summaryStats(df: DataFrame, unitsCol: String, jurisdictionCol: String,
                   vacancyCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      sum(col(unitsCol)).cast("long").as("total_units"),
      countDistinct(col(jurisdictionCol)).as("n_jurisdictions"),
      count(when(col(vacancyCol) === "Vacant", 1)).as("n_vacant"),
      min(col(unitsCol)).as("min_units"),
      max(col(unitsCol)).as("max_units"),
      avg(col(unitsCol)).as("avg_units"))

  /** S7 sink: write nested records as JSON lines (the reference writes one
    * big json.dump array; JSONL is the distributed-friendly equivalent —
    * deviation documented). */
  def writeNestedJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S7 flat variant + X12: the transit-stops CSV → the reference's
    * transit_stops.json record shape (convert_csv_to_json.py:81-99:
    * {id, name, agency, coordinates{...}, wheelchair_accessible, stop_code}),
    * with the '1'-flag boolean decode and the S8 coordinate row-skip. */
  def transitStops(spark: SparkSession, csvPath: String): DataFrame = {
    val raw = CsvClean.normalizeHeaders(CsvClean.readCsv(spark, csvPath))
    CsvClean.dropMissingCoords(
        raw.withColumn("stop_lat", col("stop_lat").cast("double"))
          .withColumn("stop_lon", col("stop_lon").cast("double")),
        "stop_lat", "stop_lon")
      .select(
        col("stop_UID").as("id"),
        col("stop_name").as("name"),
        col("stop_agency").as("agency"),
        struct(col("stop_lat").as("latitude"), col("stop_lon").as("longitude"))
          .as("coordinates"),
        (col("wheelchair_boarding") === "1").as("wheelchair_accessible"),
        col("stop_code"))
  }
}
