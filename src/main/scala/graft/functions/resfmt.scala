package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X18: deterministic resource-list formatting — the markdown block the
  * reference assembles for every chat answer
  * (backend/tools/dataset_search.py:104-134 `format_results_for_llm`).
  *
  * Presentation layer, so golden-tested (ResfmtSpec pins the exact string
  * the reference function emits on a 3-resource fixture), not
  * DuckDB-oracled: the formatting itself never touches more rows than one
  * response's `max_results` (the reference caps at 10), so the global
  * row_number window here is a ≤10-row frame, not a corpus-wide sort — the
  * heavy lifting (search, ranking, distance) happened upstream in the
  * distributed plan and this is the last-mile projection.
  *
  * Field semantics mirror the reference line by line: Type falls back
  * category → type → 'N/A'; Address/Phone/Hours default 'N/A'; Distance /
  * Services / Requirements / Description lines render only when present
  * (NULL = the dict key absent); Services joins with ', '.
  */
object resfmt {

  private def line(prefix: String, c: Column): Column =
    concat(lit("   " + prefix + ": "), c, lit("\n"))
  private def optLine(prefix: String, c: Column): Column =
    when(c.isNotNull, line(prefix, c)).otherwise(lit(""))

  /** Adds `idx` (1-based, in `orderCol` ascending order) and `formatted`
    * (one resource's markdown block, dataset_search.py:113-131). Run on
    * the ALREADY-LIMITED result page, never a full corpus — the lone
    * unpartitioned window is by design a ≤max_results frame. */
  def blocks(results: DataFrame, orderCol: String): DataFrame =
    results
      .withColumn("idx", row_number().over(Window.orderBy(col(orderCol))))
      .withColumn("formatted", concat(
        format_string("%d. **%s**\n", col("idx"), col("name")),
        line("Type", coalesce(col("category"), col("type"), lit("N/A"))),
        line("Address", coalesce(col("address"), lit("N/A"))),
        line("Phone", coalesce(col("phone"), lit("N/A"))),
        line("Hours", coalesce(col("hours"), lit("N/A"))),
        when(col("distance_miles").isNotNull,
          concat(lit("   Distance: "), col("distance_miles").cast("string"),
            lit(" miles from you\n"))).otherwise(lit("")),
        when(col("services").isNotNull,
          concat(lit("   Services: "), array_join(col("services"), ", "),
            lit("\n"))).otherwise(lit("")),
        optLine("Requirements", col("requirements")),
        optLine("Description", col("description")),
        lit("\n")))

  /** The whole message: header + blocks in order, or the reference's
    * verbatim empty-result sentence (dataset_search.py:108-109). One row,
    * one `message` column. */
  def formatResultsForLlm(results: DataFrame, orderCol: String): DataFrame =
    blocks(results, orderCol)
      .agg(count(lit(1)).as("n"),
        collect_list(struct(col("idx"), col("formatted"))).as("bs"))
      .select(
        when(col("n") === 0, lit("No results found in local database."))
          .otherwise(concat(
            lit("Found the following resources in our local database:\n\n"),
            array_join(transform(array_sort(col("bs")),
              b => b.getField("formatted")), "")))
          .as("message"))
}
