package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{geo, text, vectors}
import graft.operators.{GeoSearch, VectorSearch}

/** One catalog entry: a Spark pipeline and its DuckDB oracle twin,
  * co-located so names and output columns cannot drift apart.
  *
  * Determinism contract (driver hash-compares the two result sets):
  *  - every query ends in an ORDER BY over a unique key tuple, mirrored in
  *    the SQL, so row order is identical even if the driver does not sort;
  *  - aggregate doubles are rounded, or made exact via the cents trick
  *    (`sum(cast(round(x*100) as bigint))`) so floating accumulation order
  *    cannot flip a digit between engines;
  *  - DuckDB integer sums are cast back to BIGINT (DuckDB widens to
  *    HUGEINT, Spark stays long).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

object Catalog {
  import Tables._

  private val HavC = geo.haversineKmSql(
    geo.synthLatSql("c_custkey"), geo.synthLonSql("c_custkey"), "32.5", "-116.5")

  val all: Seq[Q] = Seq(

    Q("q_filter_eq_range",
      "F1/F2: equality + timestamp-range filter, projected (health_api.py:137-140 shape)",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_returnflag = 'A'
             |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      lineitem(s, dir)
        .filter(col("l_returnflag") === "A" &&
          col("l_shipdate") >= expr("TIMESTAMP '1998-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1999-01-01 00:00:00'"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_filter_substr",
      "F3/F9: case-insensitive substring containment (health_api.py:204, search_housing.py:43)",
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
             |WHERE contains(lower(text), 'spark')
             |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      documents(s, dir)
        .filter(lower(col("text")).contains("spark"))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },

    Q("q_filter_in_range",
      "F5/F6/F7: IN-list + numeric range + NOT NULL (embeddings.py:191, search_housing.py:59-63)",
      Some("""SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
             |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |  AND c_acctbal BETWEEN 0.0 AND 5000.0
             |  AND c_name IS NOT NULL
             |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
          col("c_acctbal").between(0.0, 5000.0) && col("c_name").isNotNull)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    },

    Q("q_join_agg",
      "J1/F2/F4/A3: fact⋈dim join with time window + grouped multi-agg " +
        "(doses⋈medications adherence shape, health_api.py:517-555); dim side broadcast",
      Some("""SELECT o_orderpriority,
             |  count(*) AS n,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |  CAST(floor(avg(l_extendedprice) * 100.0 + 0.5) AS BIGINT) AS avg_price_x100,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'F'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)) { (s, dir) =>
      val o = orders(s, dir).filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP '1999-01-01 00:00:00'"))
      lineitem(s, dir)
        .join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          // fixed-point, not round(): avg of 2-decimal prices is an
          // integer ratio — the engine-unstable case (see text.fixedPoint)
          floor(avg(col("l_extendedprice")) * 100.0 + 0.5).cast("long").as("avg_price_x100"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"))
        .orderBy("o_orderpriority")
    },

    Q("q_semi_join",
      "J2 as left_semi: customers having an 'F' order (EXISTS shape, embeddings.py:185-193)",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      customer(s, dir)
        .join(orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_anti_join",
      "J2 as left_anti: customers with no order since 2001 (NOT EXISTS shape)",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      customer(s, dir)
        .join(orders(s, dir)
            .filter(col("o_orderdate") >= expr("TIMESTAMP '2001-01-01 00:00:00'")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_latest_per_group",
      "W1: latest-per-group via window (6-query loop at health_api.py:285-304 → one pass)",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders)
             |WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    },

    Q("q_event_trend",
      "A1: grouped trend over a time window: count/avg/max per type (health_api.py:216-236)",
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(floor(avg(value) * 10.0 + 0.5) AS BIGINT) AS avg_value_x10,
             |  max(value) AS max_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
             |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)) { (s, dir) =>
      events(s, dir)
        .filter(col("ts") >= expr("TIMESTAMP '2024-01-05 00:00:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-20 00:00:00'"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          floor(avg(col("value")) * 10.0 + 0.5).cast("long").as("avg_value_x10"),
          max(col("value")).as("max_value"))
        .orderBy("event_type")
    },

    Q("q_summary_stats",
      "A5/A9: one-pass dataset summary: count, sum, min/max/avg, sorted distinct set " +
        "(convert_housing_to_json.py:55-69)",
      Some("""SELECT count(*) AS n,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             |  CAST(floor(avg(l_quantity) * 100.0 + 0.5) AS BIGINT) AS avg_qty_x100,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
             |FROM lineitem""".stripMargin)) { (s, dir) =>
      lineitem(s, dir).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        floor(avg(col("l_quantity")) * 100.0 + 0.5).cast("long").as("avg_qty_x100"),
        countDistinct(col("l_partkey")).as("n_parts"),
        array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"))
    },

    Q("q_top_customers",
      "A6: group-by revenue + top-10 (convert_housing_to_json.py:109-111 shape); " +
        "exact cents arithmetic so both engines agree bit-for-bit",
      Some("""SELECT c_custkey, c_name,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue_cents DESC, c_custkey
             |LIMIT 10""".stripMargin)) { (s, dir) =>
      orders(s, dir)
        .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("c_custkey"))
        .limit(10)
    },

    Q("q_topk_derived",
      "O2/O3: top-k by derived column — distributed TakeOrderedAndProject, no full sort " +
        "(hybrid_search.py:194-197)",
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice * (1 - l_discount), 2) AS net
             |FROM lineitem
             |ORDER BY net DESC, l_orderkey, l_linenumber
             |LIMIT 20""".stripMargin)) { (s, dir) =>
      lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))
        .orderBy(desc("net"), col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    Q("q_geo_radius",
      "G1/X1: radius search — bbox prune + exact haversine refine " +
        "(hybrid_search.py:61-102); coords derived from keys (no geo in testdata)",
      Some(s"""SELECT c_custkey, round(d, 2) AS dist_km FROM (
              |  SELECT c_custkey, $HavC AS d FROM customer)
              |WHERE d <= 20.0
              |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      val withCoords = customer(s, dir)
        .withColumn("lat", geo.synthLat(col("c_custkey")))
        .withColumn("lon", geo.synthLon(col("c_custkey")))
      withCoords
        .filter(geo.inBoundingBoxKm(col("lat"), col("lon"), 32.5, -116.5, 20.0))
        .withColumn("d", geo.haversineKm(col("lat"), col("lon"), lit(32.5), lit(-116.5)))
        .filter(col("d") <= 20.0)
        .select(col("c_custkey"), round(col("d"), 2).as("dist_km"))
        .orderBy("c_custkey")
    },

    Q("q_geo_radius_miles",
      "X2/X3: the reference's SECOND haversine — miles, R=3959, atan2 form " +
        "(dataset_search.py:14-29) — kept as its own exact formula because " +
        "oracle parity forbids collapsing it into km * 0.621371 " +
        "(SURVEY §7.4 decision 4); same bbox-prune + refine shape as " +
        "q_geo_radius",
      Some {
        val havMi = geo.haversineMilesSql(
          geo.synthLatSql("c_custkey"), geo.synthLonSql("c_custkey"),
          "32.5", "-116.5")
        s"""SELECT c_custkey, ${text.fixedPoint("d", 3)} AS dist_mi_x1000 FROM (
           |  SELECT c_custkey, $havMi AS d FROM customer)
           |WHERE d <= 15.0
           |ORDER BY c_custkey""".stripMargin
      }) { (s, dir) =>
      val withCoords = customer(s, dir)
        .withColumn("lat", geo.synthLat(col("c_custkey")))
        .withColumn("lon", geo.synthLon(col("c_custkey")))
      withCoords
        // 15 mi ≈ 24.14 km; the km-derived bbox still over-covers (exact
        // refine below), keeping the one bbox policy for both formulas
        .filter(geo.inBoundingBoxKm(col("lat"), col("lon"), 32.5, -116.5, 15.0 / geo.kmToMilesFactor))
        .withColumn("d", geo.haversineMiles(col("lat"), col("lon"), lit(32.5), lit(-116.5)))
        .filter(col("d") <= 15.0)
        .select(col("c_custkey"), expr(text.fixedPoint("d", 3)).as("dist_mi_x1000"))
        .orderBy("c_custkey")
    },

    Q("q_knn",
      "G6/X4: cosine KNN with threshold, query-by-example vec_id=0 " +
        "(embeddings.py:138-193; pgvector `<=>`)",
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
              |SELECT vec_id, label, round(sim, 4) AS sim FROM (
              |  SELECT e.vec_id, e.label,
              |    ${vectors.cosineSimSql("e.embedding", "q.qe")} AS sim
              |  FROM embeddings e CROSS JOIN q
              |  WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL)
              |WHERE sim >= 0.2
              |ORDER BY sim DESC, vec_id
              |LIMIT 5""".stripMargin)) { (s, dir) =>
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
        .crossJoin(broadcast(q))
        .withColumn("sim", vectors.cosineSim(col("embedding"), col("qe")))
        .filter(col("sim") >= 0.2)
        .select(col("vec_id"), col("label"), round(col("sim"), 4).as("sim"))
        .orderBy(desc("sim"), col("vec_id"))
        .limit(5)
    },

    Q("q_union_dedup",
      "U1/U2/A8: union of overlapping slices + dedup (chatbot.py:296-316)",
      Some("""SELECT doc_id, lang, source, n_chars
             |FROM (SELECT * FROM documents WHERE doc_id < 300
             |      UNION
             |      SELECT * FROM documents WHERE doc_id >= 200 AND doc_id < 500)
             |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val d = documents(s, dir)
      d.filter(col("doc_id") < 300)
        .unionByName(d.filter(col("doc_id") >= 200 && col("doc_id") < 500))
        .distinct()
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }
  )

  /** full catalog: core relational/geo/vector + text/dedup + analytics +
    * training-data-curation families */
  lazy val everything: Seq[Q] =
    all ++ TextQueries.all ++ AnalyticsQueries.all ++ PipelineQueries.all ++
      WarehouseQueries.all

  lazy val byName: Map[String, Q] = everything.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    everything.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    everything.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Flagship: the reference's headline hybrid geo+semantic search
    * (entry point 1, SURVEY.md §3) end-to-end on sf0.001. */
  def flagship(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = embeddings(spark, dir)
      .withColumn("lat", geo.synthLat(col("vec_id")))
      .withColumn("lon", geo.synthLon(col("vec_id")))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val candidates = GeoSearch
      .radiusSearch(e, col("lat"), col("lon"), 32.5, -116.5, 50.0, 30)
      .crossJoin(broadcast(q))
    VectorSearch.hybridRerank(candidates, "embedding", "qe",
        "distance_km", maxDistance = 50.0, weight = 0.5, limit = 10)
      .select("vec_id", "label", "distance_km", "similarity", "combined_score")
  }
}
