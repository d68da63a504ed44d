package graft
import org.apache.spark.sql.functions._
object ProfileTmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val li = graft.core.Tables.lineitem(spark, dir)
    li.count() // warm
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"TIMING $name: ${(System.nanoTime()-t0)/1e9}")
    }
    def split() = {
      val e = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val a = li.agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
      e.crossJoin(a)
    }
    time("split-1st") { split().write.mode("overwrite").format("noop").save() }
    time("split-2nd") { split().write.mode("overwrite").format("noop").save() }
    li.agg(countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.01).as("a1"),
      approx_count_distinct(col("l_suppkey"), 0.01).as("a2"))
      .queryExecution.executedPlan.toString.linesIterator.take(12).foreach(l => println("PLAN " + l))
    spark.stop()
  }
}
