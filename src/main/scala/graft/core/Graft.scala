package graft.core

import org.apache.spark.sql.SparkSession

/** One-call session bootstrap — the "switch from the reference" entry point.
  *
  * A user of the reference talks to Postgres views and SQL; this gives the
  * same experience on the lake: `Graft.session()` builds a SparkSession with
  * the engine's Catalyst extensions (native haversine_km / cosine_sim /
  * dot_product functions + the bounding-box pushdown rule) and
  * `registerAll` publishes every test table as a temp view, so
  * `spark.sql("SELECT ... FROM lineitem")` works exactly like the
  * reference's `SELECT ... FROM health_services` — with the DataFrame
  * operator library layered on top for everything SQL can't say.
  */
object Graft {

  /** Session with the engine extensions installed and the settings every
    * entry point (Bench/Verify/tests) agrees on. `shufflePartitions`
    * should track the cluster's core count — the 200 default is wrong in
    * both directions (too many for local, usually too few at 100 TB). */
  def session(master: String = "local[*]", shufflePartitions: Int = 32,
              appName: String = "graft",
              extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Auto-size exchanges instead of hand-tuning a partition knob: every
      // shuffle STARTS wide (initialPartitionNum) and AQE coalesces down to
      // ~64 MB targets at runtime. Small queries end up with few post-
      // coalesce partitions (no task-overhead tax), while a 60×-scale
      // stress workload keeps the width it needs — the SCALE.md M=60
      // join-window/exact-dedup knee was exactly a 32-partition sort spill
      // that SPARK_GRAFT_SHUFFLE=256 used to paper over by hand.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(shufflePartitions, 256).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
    val s = extraConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** All table names [[registerAll]] publishes (TESTDATA.md's inventory). */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Publish every table in `dir` as a temp view named after itself, so SQL
    * and DataFrame users see one catalog. `events` goes through the
    * nanos-safe loader like everywhere else. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
