package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.geo

/** Specs for the custom Catalyst surface (graft.plans): the native
  * haversine expression and the bounding-box injection rule. TestSpark's
  * session installs GraftExtensions, so these run against the same session
  * the whole catalog runs on. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("haversine_km function registered and matches the composed column version") {
    val df = graft.core.Tables.customer(spark, sf).limit(200)
      .select(col("c_custkey"),
        geo.synthLat(col("c_custkey")).as("lat"),
        geo.synthLon(col("c_custkey")).as("lon"))
    val both = df.select(
      expr("haversine_km(CAST(lat AS DOUBLE), CAST(lon AS DOUBLE), 32.5D, -116.5D)").as("native"),
      geo.haversineKm(col("lat"), col("lon"), lit(32.5), lit(-116.5)).as("composed"))
    both.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"native=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  // lat/lon as real parquet columns — the rule matches Attribute coords,
  // the shape that matters at scale (derived-column coords collapse into
  // the filter expression and stay un-boxed; dedicated geo tables don't)
  lazy val geoPath: String = {
    val path = "/root/repo/target/tmp/geo_parquet"
    graft.core.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        geo.synthLat(col("c_custkey")).cast("double").as("lat"),
        geo.synthLon(col("c_custkey")).cast("double").as("lon"))
      .write.mode("overwrite").parquet(path)
    path
  }

  test("X2 miles variant agrees with km * 0.621371 within formula tolerance") {
    // two formulas from the reference (asin/R=6371 km vs atan2/R=3959 mi)
    // are mathematically the same up to the radius constants
    val df = spark.range(1, 50).toDF("k")
      .select(geo.synthLat(col("k")).as("lat"), geo.synthLon(col("k")).as("lon"))
      .select(
        geo.haversineKm(col("lat"), col("lon"), lit(32.7), lit(-117.1)).as("km"),
        geo.haversineMiles(col("lat"), col("lon"), lit(32.7), lit(-117.1)).as("mi"))
    df.collect().foreach { r =>
      val (km, mi) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(geo.kmToMilesFactor * km - mi) <= 0.001 * math.max(mi, 1e-9),
        s"km=$km mi=$mi")
    }
  }

  test("qdist_sq native kernel matches the cross-dialect fold fragment exactly") {
    // the kernel powers q_kmeans_iter's argmin; the fold fragment is what
    // the DuckDB oracle runs — exact integers, so equality is ==, not a
    // tolerance
    import graft.functions.{text, SparkDialect => S}
    val quant = S.transform(S.castDoubleArray("embedding"), "x",
      "CAST(floor(x * 10000.0 + 0.5) AS BIGINT)")
    val dist = S.fold(S.seq("1", S.size("qa")), "CAST(0 AS BIGINT)",
      "acc", "i",
      s"acc + (${S.elementAt("qa", "i")} - ${S.elementAt("qb", "i")}) * " +
        s"(${S.elementAt("qa", "i")} - ${S.elementAt("qb", "i")})")
    val e = graft.core.Tables.embeddings(spark, sf).limit(40)
      .select(col("vec_id"), expr(quant).as("qa"))
    val pairs = e.crossJoin(e.select(col("qa").as("qb")).limit(5))
      .select(expr("qdist_sq(qa, qb)").as("native"), expr(dist).as("fold"))
    pairs.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} != ${r.getLong(1)}")
    }
    assert(text.P == "1000000007") // fragment constants stay in sync
    // ARRAY<DOUBLE> must FAIL analysis, not silently truncate toward zero:
    // the registry widens only integral element types to BIGINT, so
    // un-quantized embeddings reach checkInputDataTypes intact
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      graft.core.Tables.embeddings(spark, sf).limit(1)
        .select(expr("qdist_sq(CAST(embedding AS ARRAY<DOUBLE>), " +
          "CAST(embedding AS ARRAY<DOUBLE>))")).collect()
    }
    assert(err.getMessage.contains("ARRAY<BIGINT>"), err.getMessage)
    // integral literals still widen (SQL array literals parse as ARRAY<INT>)
    assert(spark.sql("SELECT qdist_sq(array(1, 2), array(3, 4)) AS d")
      .head().getLong(0) == 8L)
  }

  test("BoundingBoxRule injects sargable lat/lon range predicates") {
    val df = spark.read.parquet(geoPath)
    val q = df.filter(expr("haversine_km(lat, lon, 32.5D, -116.5D) <= 20.0D"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("haversine_km"), "radius predicate kept")
    assert(optimized.contains("lat#") && optimized.contains(">="),
      s"expected injected lat lower bound in:\n$optimized")
    // results identical to the un-assisted plan (box only over-covers)
    val expected = df
      .filter(geo.haversineKm(col("lat"), col("lon"), lit(32.5), lit(-116.5)) <= 20.0)
      .count()
    assert(q.count() == expected)
  }

  test("TextNorm native expressions: SQL-callable, kernel-identical, codegen-inlined") {
    import spark.implicits._
    val rows = Seq(
      " a\t b  Café ",
      "<p>x &amp; y</p><script>var z = 1 < 2;</script>",
      "HTTPS://Ex.COM:443/a//b?utm_source=t&id=9#f",
      null
    ).toDF("s")
    // three-way agreement: SQL function == compiled kernel, null-safe
    val got = rows.selectExpr("normalize_text(s)", "html_to_text(s)",
      "canonical_url(s)").collect()
    val kern = rows.collect().map(_.getString(0)).map { s =>
      if (s == null) (null, null, null)
      else (graft.functions.TextNorm.normalize(s),
        graft.functions.TextNorm.htmlToText(s),
        graft.functions.TextNorm.canonicalizeUrl(s))
    }
    got.zip(kern).foreach { case (r, (a, b, c)) =>
      assert(r.getString(0) == a && r.getString(1) == b && r.getString(2) == c,
        s"SQL function diverged from kernel: $r vs ($a, $b, $c)")
    }
    // the Column dispatch routes through the registered function (no UDF
    // node), and the projection stays inside WholeStageCodegen. (A local
    // Seq relation won't do here: ConvertToLocalRelation folds the whole
    // projection at optimization time — itself proof the expression is
    // interpretable — so assert over a range source that actually plans.)
    val planned = spark.range(4).selectExpr("CAST(id AS STRING) AS s")
    val plan = planned.select(graft.functions.TextNorm.normalizeCol(col("s")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("normalize_text"),
      s"expected the native expression, not a UDF, in:\n$plan")
    // "*(1) Project" is simpleString's WholeStageCodegen marker: the
    // projection carrying normalize_text compiled into stage 1
    assert(plan.contains("*(1) Project"),
      s"expected the projection inside a codegen stage in:\n$plan")
    // non-STRING input fails analysis (no coercing cast by design)
    val e = intercept[Exception] {
      rows.selectExpr("normalize_text(1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("bounding box reaches the parquet scan as a pushed filter") {
    val q = spark.read.parquet(geoPath)
      .filter(expr("haversine_km(lat, lon, 32.5D, -116.5D) <= 20.0D"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      (physical.contains("GreaterThanOrEqual(lat") || physical.contains("gteq(lat")),
      s"expected lat bound pushed to scan in:\n${physical.take(2500)}")
  }
}
