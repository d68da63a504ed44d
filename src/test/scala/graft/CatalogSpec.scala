package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("every catalog query runs and returns rows on sf0.001") {
    graft.queries.Catalog.everything.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every oracle key has a matching query key") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("knn returns at most 5 rows, sorted by similarity desc") {
    val rows = graft.queries.Catalog.byName("q_knn").fn(spark, sf)
      .collect().map(_.getDouble(2))
    assert(rows.length <= 5 && rows.sameElements(rows.sorted.reverse))
  }

  test("geo radius distances are within the radius") {
    val rows = graft.queries.Catalog.byName("q_geo_radius").fn(spark, sf)
      .collect().map(_.getDouble(1))
    assert(rows.nonEmpty && rows.forall(_ <= 20.0))
  }
}
