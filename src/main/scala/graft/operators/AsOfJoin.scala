package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * `right.ts <= left.ts` within the same key — the time-series/feature
  * lookup Spark has no built-in operator for (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`, kdb `aj`). The reference app has no time-series joins, but
  * its latest-per-group loops (backend/health_api.py:285-304) are the
  * degenerate "as of now" case of exactly this operator.
  *
  * Implementation is the union+window trick, not a range join: tag both
  * sides, union them, and carry the last-seen right payload forward with a
  * `last(_, ignoreNulls)` window ordered by (ts, side). One shuffle keyed
  * by the join key, one partitioned window pass — at 100 TB this scales
  * like any windowed aggregation, while the naive range-join formulation
  * (`l.ts >= r.ts` + row_number) builds and then discards a per-left-row
  * candidate set that grows with history length.
  *
  * Contract: right rows must be unique per (key, ts) — pre-aggregate the
  * right side if needed — otherwise "the" row at a timestamp is undefined
  * in every engine (DuckDB's ASOF picks one arbitrarily; this operator
  * would pick the last in window order). Ties left.ts == right.ts match
  * (>= semantics), like DuckDB's `ON l.k = r.k AND l.ts >= r.ts`.
  */
object AsOfJoin {

  /** Left rows with a struct column `asof` holding the matched right row's
    * `payloadCols` (NULL struct when no right row precedes). */
  def asOfLatest(left: DataFrame, right: DataFrame,
                 key: String, leftTs: String, rightTs: String,
                 payloadCols: Seq[String]): DataFrame = {
    // a NULL right timestamp or key must never match (SQL `l.ts >= r.ts`
    // and `l.k = r.k` are NULL there): an unfiltered NULL ts would sort
    // NULLS FIRST, ahead of every real row, and window partitionBy groups
    // NULL keys TOGETHER (unlike an equi-join) — either way a payload
    // would be carried into left rows the oracle says have no match
    val r = right.filter(col(rightTs).isNotNull && col(key).isNotNull).select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__payload"))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts, so an
    // equal-timestamp right row IS visible to the left row (>= semantics)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload")
  }
}
