package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * pipeline runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, by extension, on a real cluster at any scale: nothing
  * here assumes local mode or data size.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs via
    * `nanosAsLong` — and plain TIMESTAMP(MICROS) without timezone, which
    * Spark reads as TIMESTAMP_NTZ. The loader is schema-aware so either
    * file works and downstream always sees one thing: a session-zone
    * TIMESTAMP in micros (the session timezone is pinned to UTC in
    * [[Graft.session]], so the NTZ→TZ cast is value-preserving and
    * matches what DuckDB computes from the same bytes).
    *
    * KNOWN SIDE EFFECT: `nanosAsLong` is a session conf, not a per-read
    * option (verified: `spark.read.option("nanosAsLong", ...)` is ignored
    * and the read still fails), so this loader flips it session-wide for
    * any later nanos-parquet read. The project's session builders
    * (Bench/Verify/tests) set it at build time so behavior never depends
    * on whether events() ran first; the set here is a safety net for
    * external sessions.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df // already a session-zone timestamp
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
