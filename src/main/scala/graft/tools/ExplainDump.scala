package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: writes `.explain("formatted")` for the named catalog queries
  * to `plans/r15/<query>_<tag>.txt` — the before/after plan evidence an
  * optimization round commits alongside its bench numbers.
  *
  *   sbt "runMain graft.tools.ExplainDump <tag> q_a q_b ..."
  *
  * Uses the same session shape as Bench (SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS) so the dumped plan is the one the bench times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <tag> <query>...")
    val tag = args.head
    val names = args.tail.toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in the catalog: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Graft.session(s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-explain",
      extraConf = Map("spark.ui.enabled" -> "false"))
    val outDir = Paths.get("plans", "r15")
    Files.createDirectories(outDir)
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"wrote plans/r15/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
