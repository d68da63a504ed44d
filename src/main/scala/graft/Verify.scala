package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Graft.session(s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-verify",
      extraConf = Map("spark.ui.enabled" -> "false"))
    new java.io.File(outDir).mkdirs()
    // dev-only: SPARK_GRAFT_ONLY=q_a,q_b dumps just those queries (the
    // driver never sets it, so the gate always covers the full catalog)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // a typo'd name would otherwise yield zero dumps + an empty oracle map
    // and check_oracle would print "0 pass, 0 fail" with exit 0 — a silent
    // green. Unknown names must fail loudly.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the catalog: ${unknown.mkString(", ")}")
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the oracle map honors SPARK_GRAFT_ONLY like the dumps: otherwise a
    // filtered dev run leaves a full-catalog oracle_sql.json and
    // check_oracle reports FAIL for every query that was never dumped
    val json = SparkEntry.oracleSql
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Round 4 lost 23 events-based queries silently: their dumps crashed,
    // the catch above only printed to stderr, and the correctness artifact
    // reported all-pass over the SHRUNKEN dumped set. The failures manifest
    // makes a coverage regression machine-visible, and a nonzero exit makes
    // it loud even to a caller that only checks rc.
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries failed to dump: " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
