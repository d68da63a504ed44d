package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.{geo, text, vectors, DuckDialect => D, SparkDialect => S}
import graft.operators.{BloomPrune, Scd2, Sketches}

/** Warehouse/product-analytics extensions beyond the reference's operator
  * set: ordered event funnels, cohort retention, inter-event gap stats
  * (lag/lead — the one window family the reference never uses, SURVEY
  * §2.5), bloom-pruned semi-joins (runtime-filter shape), SCD-2 validity
  * intervals over append-only change logs, and a count-min frequency
  * sketch. Each is the batch form of a pipeline every large-scale event
  * platform runs daily; all but the sketch are DuckDB-oracle-checked.
  */
object WarehouseQueries {

  val all: Seq[Q] = Seq(

    Q("q_funnel",
      "Ordered 3-stage funnel over the event stream: first view, then first " +
        "click AFTER that view, then first purchase AFTER that click, per " +
        "user; output = users surviving each stage. Ordering makes this a " +
        "real funnel (a user who purchased before ever viewing does not " +
        "count) — the per-user min-timestamp tables are tiny next to the " +
        "event log, so each stage is one shuffle-light join back onto events",
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS vt FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS ct
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND e.ts > v.vt
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS pt
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > c.ct
             |  GROUP BY e.user_id)
             |SELECT stage, n_users FROM (
             |  SELECT 'stage1_view' AS stage, count(*) AS n_users FROM v
             |  UNION ALL SELECT 'stage2_click', count(*) FROM c
             |  UNION ALL SELECT 'stage3_purchase', count(*) FROM p)
             |ORDER BY stage""".stripMargin)) { (s, dir) =>
      val ev = events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("vt"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("vt"))
        .groupBy("user_id").agg(min("ts").as("ct"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("ct"))
        .groupBy("user_id").agg(min("ts").as("pt"))
      v.select(lit("stage1_view").as("stage"), count(lit(1)).as("n_users"))
        .unionAll(c.select(lit("stage2_click"), count(lit(1))))
        .unionAll(p.select(lit("stage3_purchase"), count(lit(1))))
        .orderBy("stage")
    },

    Q("q_retention",
      "Cohort retention: users grouped by first-active day, counted again " +
        "at day offsets 0/1/7/14 — the engagement matrix behind every " +
        "growth dashboard. Two aggregations over one scan shape: distinct " +
        "(user, day) activity joined to per-user cohort day",
      Some("""WITH first AS (
             |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
             |  FROM events GROUP BY user_id),
             |activity AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
             |  FROM events)
             |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
             |  CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
             |  count(*) AS n_users
             |FROM activity a JOIN first f ON a.user_id = f.user_id
             |WHERE date_diff('day', f.cohort, a.day) IN (0, 1, 7, 14)
             |GROUP BY 1, 2
             |ORDER BY cohort_day, day_offset""".stripMargin)) { (s, dir) =>
      val ev = events(s, dir)
      val first = ev.groupBy("user_id")
        .agg(min(expr(S.dayTrunc("ts"))).cast("date").as("cohort"))
      val activity = ev
        .select(col("user_id"), expr(S.dayTrunc("ts")).cast("date").as("day"))
        .distinct()
      activity.join(first, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
        .filter(col("day_offset").isin(0L, 1L, 7L, 14L))
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    Q("q_inter_event",
      "Inter-event gap stats per user via lag(): count / max / avg seconds " +
        "between consecutive events — the lag/lead window family (the " +
        "reference never uses frame navigation; SURVEY §2.5). One shuffle " +
        "on user_id, one partitioned window, gaps never leave their partition",
      Some(s"""SELECT user_id, count(*) AS n_gaps,
              |  CAST(max(gap_s) AS BIGINT) AS max_gap_s,
              |  ${text.fixedPoint("avg(gap_s)", 2)} AS avg_gap_s_x100
              |FROM (
              |  SELECT user_id,
              |    ${D.epochSeconds("ts")} - ${D.epochSeconds(
                     "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} AS gap_s
              |  FROM events WHERE user_id < 100)
              |WHERE gap_s IS NOT NULL
              |GROUP BY user_id
              |ORDER BY user_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir).filter(col("user_id") < 100)
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .filter(col("gap_s").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          max(col("gap_s")).cast("long").as("max_gap_s"),
          expr(text.fixedPoint("avg(gap_s)", 2)).as("avg_gap_s_x100"))
        .orderBy("user_id")
    },

    Q("q_bloom_join",
      "Bloom-pruned semi-join (operators/BloomPrune): the MACHINERY customer " +
        "keys compact into a broadcast Bloom filter that prunes the orders " +
        "scan BEFORE the shuffle; the exact semi-join then removes the " +
        "~fpp false positives, so the result is exactly the plain semi-join " +
        "the oracle runs. The explicit form of Spark's runtime bloom filter " +
        "— at 100 TB the prune cuts the fact shuffle to the match rate",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'MACHINERY')
             |ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      val build = customer(s, dir).filter(col("c_mktsegment") === "MACHINERY")
      BloomPrune.semiJoin(orders(s, dir), "o_custkey", build, "c_custkey",
          expectedItems = 100000L, fpp = 0.03)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    Q("q_scd2",
      "SCD-2 history (operators/Scd2): each customer's order log becomes a " +
        "validity-interval dimension — valid_from = the change, valid_to = " +
        "the next change (exclusive, NULL while current). The append-only " +
        "re-model of the reference's in-place mutations (health_api.py:72-100; " +
        "SURVEY §7.4): one shuffle on the key, one lead() window",
      Some("""SELECT o_custkey, o_orderkey,
             |  strftime(CAST(valid_from AS DATE), '%Y-%m-%d') AS valid_from,
             |  coalesce(strftime(CAST(valid_to AS DATE), '%Y-%m-%d'), '9999-12-31') AS valid_to,
             |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |                            ORDER BY o_orderdate, o_orderkey) AS valid_to
             |  FROM orders WHERE o_custkey < 50)
             |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin)) { (s, dir) =>
      Scd2.fromChangeLog(
          orders(s, dir).filter(col("o_custkey") < 50)
            .select("o_custkey", "o_orderkey", "o_orderdate"),
          key = "o_custkey", ts = "o_orderdate", tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(col("valid_to"), "yyyy-MM-dd"), lit("9999-12-31"))
            .as("valid_to"),
          col("is_current").cast("long").as("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },

    Q("q_range_frame",
      "RANGE-frame window: trailing-7-day event count and spend per user at " +
        "every event — a range frame over epoch seconds (peers included by " +
        "VALUE, not row position, so same-second events agree between " +
        "engines). The frame family q_sessionize's ROWS windows don't " +
        "cover; cents trick keeps the frame sum exact",
      Some(s"""SELECT event_id, user_id,
              |  count(*) OVER w AS n_7d,
              |  CAST(sum(cents) OVER w AS BIGINT) AS spend_7d_cents
              |FROM (
              |  SELECT event_id, user_id, ${D.epochSeconds("ts")} AS epoch_s,
              |    CAST(round(value * 100) AS BIGINT) AS cents
              |  FROM events WHERE user_id < 20)
              |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
              |             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("epoch_s")
        .rangeBetween(-518400L, 0L)
      events(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("cents")).over(w).as("spend_7d_cents"))
        .orderBy("event_id")
    },

    Q("q_ntile",
      "ntile quartiles within each market segment by account balance " +
        "(unique (balance, key) order -> deterministic buckets), rolled up " +
        "to per-segment-quartile stats — partitioned, so no global-window " +
        "single-partition collapse",
      Some("""SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
             |  count(*) AS n, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
             |FROM (
             |  SELECT c_mktsegment, c_acctbal,
             |    ntile(4) OVER (PARTITION BY c_mktsegment
             |                   ORDER BY c_acctbal, c_custkey) AS quartile
             |  FROM customer)
             |GROUP BY c_mktsegment, quartile
             |ORDER BY c_mktsegment, quartile""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      customer(s, dir)
        .select(col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"))
        .groupBy(col("c_mktsegment"), col("quartile").cast("long").as("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy("c_mktsegment", "quartile")
    },

    Q("q_string_agg",
      "Ordered string aggregation: per-nation comma-joined sorted supplier " +
        "list — collect_list is order-nondeterministic after a shuffle, so " +
        "the sort happens in the array domain (array_sort) before joining; " +
        "DuckDB's string_agg(... ORDER BY) is the same contract",
      Some("""SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)) { (s, dir) =>
      supplier(s, dir)
        .join(broadcast(nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",")
          .as("suppliers"))
        .orderBy("n_name")
    },

    Q("q_entrypoint1",
      "The reference's headline endpoint END-TO-END as one hash-checked " +
        "plan, driven through api.Facade itself: radius prune + x3 " +
        "over-fetch + cosine re-rank to top-10 (hybrid_search.py:36-197), " +
        "then <=3 nearest transit stops per result in ONE range join " +
        "(main.py:466-475's N+1 loop). Services = embeddings w/ synthetic " +
        "coords, stops = suppliers; services with no stop in range drop " +
        "(inner nearest-k, mirrored in the oracle)",
      Some {
        val lat = geo.synthLatSql("vec_id"); val lon = geo.synthLonSql("vec_id")
        val sLat = geo.synthLatSql("(s_suppkey * 13)")
        val sLon = geo.synthLonSql("(s_suppkey * 13)")
        val havSvc = geo.haversineKmSql(lat, lon, "32.5", "-116.5")
        val havStop = geo.haversineKmSql("t.lat", "t.lon", "s.lat", "s.lon")
        s"""WITH pts AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
           |         $lat AS lat, $lon AS lon
           |  FROM embeddings),
           |q AS (SELECT emb AS qe FROM pts WHERE vec_id = 0),
           |cand AS (
           |  SELECT vec_id, emb, lat, lon, $havSvc AS distance_km
           |  FROM pts WHERE $havSvc <= 50.0
           |  ORDER BY distance_km, vec_id LIMIT 30),
           |top AS (
           |  SELECT vec_id, lat, lon, distance_km,
           |    ${vectors.cosineSimSql("emb", "q.qe")} * 0.5 +
           |      (1.0 - distance_km / 50.0) * 0.5 AS combined
           |  FROM cand CROSS JOIN q
           |  ORDER BY combined DESC, vec_id LIMIT 10),
           |stops AS (SELECT s_suppkey, $sLat AS lat, $sLon AS lon FROM supplier),
           |ranked AS (
           |  SELECT vec_id, combined, service_d, s_suppkey, d_stop,
           |    row_number() OVER (PARTITION BY vec_id
           |                       ORDER BY d_stop, s_suppkey) AS rk
           |  FROM (
           |    SELECT t.vec_id, t.combined, t.distance_km AS service_d,
           |           s.s_suppkey, $havStop AS d_stop
           |    FROM top t JOIN stops s ON true)
           |  WHERE d_stop <= 50.0)
           |SELECT vec_id, ${text.fixedPoint("combined", 4)} AS combined_x10k,
           |  ${text.fixedPoint("service_d", 2)} AS service_dist_x100,
           |  s_suppkey AS stop_id, CAST(rk AS BIGINT) AS transit_rank,
           |  ${text.fixedPoint("d_stop", 2)} AS stop_dist_x100
           |FROM ranked WHERE rk <= 3
           |ORDER BY vec_id, transit_rank""".stripMargin
      }) { (s, dir) =>
      val services = embeddings(s, dir).select(
        col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"),
        geo.synthLat(col("vec_id")).as("lat"),
        geo.synthLon(col("vec_id")).as("lon"))
      val q = services.filter(col("id") === 0).select(col("emb").as("qe"))
      val results = graft.api.Facade.searchHealthServices(
        services, 32.5, -116.5, query = Some(q),
        maxDistanceKm = 50.0, limit = 10, semanticWeight = 0.5,
        idCol = "id", embCol = "emb")
      val stops = supplier(s, dir).select(
        col("s_suppkey").as("stop_id"),
        geo.synthLat(col("s_suppkey") * 13).as("lat"),
        geo.synthLon(col("s_suppkey") * 13).as("lon"))
      graft.api.Facade.withNearestTransit(results, stops,
          idCol = "id", stopIdCol = "stop_id", k = 3, maxKm = 50.0)
        .select(col("id").as("vec_id"),
          expr(text.fixedPoint("combined_score", 4)).as("combined_x10k"),
          expr(text.fixedPoint("service_distance_km", 2)).as("service_dist_x100"),
          col("stop_id"),
          col("rank_nearest").cast("long").as("transit_rank"),
          expr(text.fixedPoint("distance_km", 2)).as("stop_dist_x100"))
        .orderBy("vec_id", "transit_rank")
    },

    Q("q_promo_share",
      "TPC-H Q14 shape over the one dim the catalog had not joined yet: " +
        "per-brand promo revenue share in a ship-date window — fact⋈part " +
        "broadcast join, conditional cents sums, fixed-point ratio of two " +
        "exact integers",
      Some(s"""SELECT p_brand, count(*) AS n,
              |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
              |  CAST(sum(cents) AS BIGINT) AS total_cents,
              |  ${text.fixedPoint(
                   "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)" +
                     " / CAST(sum(cents) AS DOUBLE)", 2)} AS promo_pct_x100
              |FROM (
              |  SELECT l_partkey,
              |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
              |    AND l_shipdate <  TIMESTAMP '1997-12-01 00:00:00')
              |JOIN part ON l_partkey = p_partkey
              |GROUP BY p_brand
              |ORDER BY p_brand""".stripMargin)) { (s, dir) =>
      val li = lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-09-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-12-01 00:00:00'"))
        .select(col("l_partkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("cents"))
      val promoCents = sum(when(col("p_type") === "PROMO", col("cents"))
        .otherwise(0L))
      li.join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          promoCents.as("promo_cents"),
          sum(col("cents")).as("total_cents"),
          expr(text.fixedPoint(
            "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)" +
              " / CAST(sum(cents) AS DOUBLE)", 2)).as("promo_pct_x100"))
        .orderBy("p_brand")
    },

    Q("q_set_ops",
      "INTERSECT / EXCEPT (the set-op family the reference never uses — " +
        "U1/U2 cover union only): customers ordering in both 1997 and 1998 " +
        "vs 1997-only, tagged and unioned. Spark plans both as hash " +
        "semi/anti joins over distinct keys — one keyed shuffle each side, " +
        "no row-pair blowup",
      Some("""WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
             |y98 AS (SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             |    AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
             |SELECT tag, o_custkey FROM (
             |  SELECT 'both_years' AS tag, o_custkey
             |  FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
             |  UNION ALL
             |  SELECT 'only_1997', o_custkey
             |  FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98))
             |ORDER BY tag, o_custkey""".stripMargin)) { (s, dir) =>
      def year(y: Int) = orders(s, dir)
        .filter(col("o_orderdate") >= expr(s"TIMESTAMP '$y-01-01 00:00:00'") &&
          col("o_orderdate") < expr(s"TIMESTAMP '${y + 1}-01-01 00:00:00'"))
        .select("o_custkey").distinct()
      val y97 = year(1997); val y98 = year(1998)
      y97.intersect(y98).select(lit("both_years").as("tag"), col("o_custkey"))
        .unionAll(y97.except(y98).select(lit("only_1997").as("tag"), col("o_custkey")))
        .orderBy("tag", "o_custkey")
    },

    Q("q_grouping_sets",
      "GROUPING SETS ((returnflag), (linestatus)): two independent subtotal " +
        "groupings in ONE pass over the fact — the general form behind " +
        "q_rollup/q_cube; absent dimensions surface as NULL and ship as " +
        "'ALL' (neither column is nullable in the data, so the marker is " +
        "unambiguous)",
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY rf, ls""".stripMargin)) { (s, dir) =>
      lineitem(s, dir)
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    Q("q_session_window",
      "Native session windows: groupBy(session_window(ts, '30 minutes')) — " +
        "the DECLARATIVE form of q_sessionize's lag+running-sum (and the " +
        "streaming flatMapGroupsWithState state machine): Catalyst plans " +
        "the gap-merge itself, one shuffle on the user key. Oracle = the " +
        "explicit lag formulation aggregated to the same (user, session " +
        "start, count) rows — two independent session constructions must " +
        "agree exactly",
      // boundary semantics matter: session_window's intervals are
      // half-open, so a gap of EXACTLY the 30-min threshold starts a new
      // session (>=), where q_sessionize's own lag twin uses > on
      // floor-to-second diffs on BOTH engines. This oracle therefore
      // compares full-precision epochs with >= — a floored strict > would
      // only agree while no gap lands exactly on 1800 s
      Some(s"""SELECT user_id,
              |  strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
              |  n_events
              |FROM (
              |  SELECT user_id, min(ts) AS session_start, count(*) AS n_events
              |  FROM (
              |    SELECT user_id, ts,
              |      sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |    FROM (
              |      SELECT user_id, ts, event_id,
              |        CASE WHEN epoch(ts) -
              |          epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              |          >= 1800.0 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              |        THEN 1 ELSE 0 END AS is_new
              |      FROM events WHERE user_id < 60))
              |  GROUP BY user_id, sid)
              |ORDER BY user_id, session_start""".stripMargin)) { (s, dir) =>
      events(s, dir).filter(col("user_id") < 60)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    Q("q_unpivot",
      "UNPIVOT (melt): the wide per-priority aggregate turned back into " +
        "(priority, measure, value) rows — the inverse of q_pivot, " +
        "Dataset.unpivot ⇄ DuckDB UNPIVOT. Wide-to-long is a projection " +
        "(no shuffle beyond the feeding aggregate); value columns cast to " +
        "one type up front, as unpivot requires",
      Some("""SELECT o_orderpriority, measure, CAST(value AS BIGINT) AS value
             |FROM (
             |  SELECT o_orderpriority,
             |    count(*) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |  FROM orders GROUP BY o_orderpriority)
             |UNPIVOT (value FOR measure IN (n_orders, total_cents))
             |ORDER BY o_orderpriority, measure""".stripMargin)) { (s, dir) =>
      orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("total_cents")), "measure", "value")
        .orderBy("o_orderpriority", "measure")
    },

    Q("q_skew_stats",
      "Join-key skew diagnostics: the distribution of per-key group sizes " +
        "(rows per o_custkey) — min/median/p99/max and the max/median " +
        "ratio. This is the measurement that DECIDES between a plain " +
        "shuffle join, AQE skew-split and explicit salting " +
        "(operators/Skew); running it is one keyed count plus one tiny " +
        "aggregate over the counts (|keys| rows, not |rows|). Counts are " +
        "integer-valued doubles, so interpolated percentiles stay " +
        "engine-exact at dyadic-safe points; the x100 ratio ships " +
        "fixed-point",
      Some(s"""SELECT count(*) AS n_keys,
              |  CAST(min(n) AS BIGINT) AS min_sz,
              |  ${text.fixedPoint("quantile_cont(CAST(n AS DOUBLE), 0.50)", 1)} AS p50_sz_x10,
              |  ${text.fixedPoint("quantile_cont(CAST(n AS DOUBLE), 0.75)", 1)} AS p75_sz_x10,
              |  CAST(max(n) AS BIGINT) AS max_sz,
              |  ${text.fixedPoint(
                   "CAST(max(n) AS DOUBLE) / quantile_cont(CAST(n AS DOUBLE), 0.50)", 2)} AS skew_x100
              |FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)""".stripMargin)) { (s, dir) =>
      orders(s, dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"),
          min(col("n")).cast("long").as("min_sz"),
          expr(text.fixedPoint("percentile(CAST(n AS DOUBLE), 0.50)", 1)).as("p50_sz_x10"),
          expr(text.fixedPoint("percentile(CAST(n AS DOUBLE), 0.75)", 1)).as("p75_sz_x10"),
          max(col("n")).cast("long").as("max_sz"),
          expr(text.fixedPoint(
            "CAST(max(n) AS DOUBLE) / percentile(CAST(n AS DOUBLE), 0.50)", 2)).as("skew_x100"))
    },

    Q("q_null_safe_join",
      "Null-safe equality join: Spark `<=>` ⇄ DuckDB IS NOT DISTINCT FROM " +
        "— the NULL bucket on each side matches ITSELF instead of matching " +
        "nothing (a plain equi-join silently drops it). Scale note: <=> " +
        "hashes all NULL keys to one partition, so a null-heavy key is a " +
        "skew hazard — exactly what q_skew_stats measures and " +
        "operators/Skew salts",
      Some("""WITH a AS (
             |  SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS k,
             |    count(*) AS n_a
             |  FROM events WHERE user_id % 2 = 0 GROUP BY 1),
             |b AS (
             |  SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS k,
             |    count(*) AS n_b
             |  FROM events WHERE user_id % 2 = 1 GROUP BY 1)
             |SELECT coalesce(CAST(a.k AS VARCHAR), 'NULL') AS k, n_a, n_b
             |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
             |ORDER BY k""".stripMargin)) { (s, dir) =>
      def side(pred: org.apache.spark.sql.Column, out: String) =
        events(s, dir).filter(pred)
          .groupBy(when(col("user_id") % 7 === 0, lit(null))
            .otherwise(col("user_id") % 5).as("k"))
          .agg(count(lit(1)).as(out))
      val a = side(col("user_id") % 2 === 0, "n_a")
      val b = side(col("user_id") % 2 === 1, "n_b")
        .withColumnRenamed("k", "kb")
      a.join(b, col("k") <=> col("kb"))
        .select(coalesce(col("k").cast("string"), lit("NULL")).as("k"),
          col("n_a"), col("n_b"))
        .orderBy("k")
    },

    Q("q_k_anonymity",
      "k-anonymity audit over quasi-identifiers — q_pii_scrub removes " +
        "DIRECT identifiers; this measures the re-identification risk " +
        "that remains when 'anonymous' rows are still unique on the " +
        "combination of innocuous columns (Sweeney's k-anonymity): " +
        "customers grouped by the (nation, mktsegment, acctbal-rounded-" +
        "to-100s) quasi-identifier, equivalence classes bucketed by " +
        "size — k=1 rows ARE re-identifiable — with class counts, row " +
        "counts and the row share per bucket. The release gate a " +
        "curation pipeline runs before shipping 'de-identified' data. " +
        "Scale shape: ONE map-side-combined aggregate on the QI key " +
        "(class table is classes-sized), then a 4-row bucket rollup " +
        "with the scalar total broadcast back — same cost as a " +
        "group-by at any corpus size",
      Some(s"""WITH qi AS (
              |  SELECT c_nationkey, c_mktsegment,
              |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
              |    count(*) AS k
              |  FROM customer
              |  GROUP BY 1, 2, 3),
              |b AS (SELECT CASE WHEN k = 1 THEN '1_unique'
              |               WHEN k < 5 THEN '2_small_2_4'
              |               WHEN k < 10 THEN '3_medium_5_9'
              |               ELSE '4_large_10_plus' END AS k_bucket,
              |        k
              |      FROM qi),
              |t AS (SELECT CAST(sum(k) AS BIGINT) AS total FROM b)
              |SELECT k_bucket, count(*) AS n_classes,
              |  CAST(sum(k) AS BIGINT) AS n_rows,
              |  ${graft.functions.text.fixedPoint(
                  "CAST(sum(k) AS DOUBLE) / greatest(total, 1)", 4)}
              |    AS row_share_x10k
              |FROM b CROSS JOIN t
              |GROUP BY k_bucket, total
              |ORDER BY k_bucket""".stripMargin)) { (s, dir) =>
      val qi = customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 100).cast("long").as("bal_bucket"))
        .agg(count(lit(1)).as("k"))
      val b = qi.select(
        when(col("k") === 1, "1_unique")
          .when(col("k") < 5, "2_small_2_4")
          .when(col("k") < 10, "3_medium_5_9")
          .otherwise("4_large_10_plus").as("k_bucket"), col("k"))
      val t = b.agg(sum("k").cast("long").as("total"))
      b.crossJoin(broadcast(t))
        .groupBy("k_bucket", "total")
        .agg(count(lit(1)).as("n_classes"), sum("k").cast("long").as("n_rows"))
        .select(col("k_bucket"), col("n_classes"), col("n_rows"),
          expr(graft.functions.text.fixedPoint(
            "CAST(n_rows AS DOUBLE) / greatest(total, 1)", 4))
            .as("row_share_x10k"))
        .orderBy("k_bucket")
    },

    Q("q_dq_audit",
      "Data-quality expectations (the dbt-test / Great-Expectations family " +
        "as one query): six checks over the lineitem fact — two range " +
        "gates, a NOT NULL, an accepted-values set, FK integrity against " +
        "orders, and key uniqueness on (l_orderkey, l_linenumber) — each " +
        "reported as (check, n_violations, n_checked). The four row-level " +
        "checks fold into ONE conditional-aggregate scan pass (map-side " +
        "combined, zero extra reads however many expectations pile on); " +
        "FK is a single left join counting unmatched; uniqueness is one " +
        "keyed aggregate counting rows beyond the first per key. The " +
        "testdata genuinely fails uniqueness (~12k excess rows at sf0.01, " +
        "a generator artifact) — the audit reports it instead of hiding it",
      Some("""WITH scan AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
             |    CAST(sum(CASE WHEN l_returnflag IS NULL
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
             |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS v_vals
             |  FROM lineitem),
             |fk AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
             |         AS BIGINT) AS v
             |  FROM lineitem l LEFT JOIN orders o
             |    ON l.l_orderkey = o.o_orderkey),
             |uniq AS (
             |  SELECT CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(c - 1) AS BIGINT) AS v
             |  FROM (SELECT count(*) AS c FROM lineitem
             |        GROUP BY l_orderkey, l_linenumber))
             |SELECT 'accepted_values_returnflag' AS "check", v_vals AS n_violations, n AS n_checked FROM scan
             |UNION ALL SELECT 'fk_lineitem_orders', v, n FROM fk
             |UNION ALL SELECT 'not_null_returnflag', v_null, n FROM scan
             |UNION ALL SELECT 'range_discount_0_10pct', v_disc, n FROM scan
             |UNION ALL SELECT 'range_quantity_1_50', v_qty, n FROM scan
             |UNION ALL SELECT 'unique_orderkey_linenumber', v, n FROM uniq
             |ORDER BY "check"""".stripMargin)) { (s, dir) =>
      val li = lineitem(s, dir)
      val scan = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)
          .otherwise(0)).cast("long").as("v_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)
          .otherwise(0)).cast("long").as("v_disc"),
        sum(when(col("l_returnflag").isNull, 1).otherwise(0))
          .cast("long").as("v_null"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0))
          .cast("long").as("v_vals"))
        .selectExpr(
          "stack(4, " +
            "'accepted_values_returnflag', v_vals, " +
            "'not_null_returnflag', v_null, " +
            "'range_discount_0_10pct', v_disc, " +
            "'range_quantity_1_50', v_qty) AS (check, n_violations)",
          "n AS n_checked")
      val fk = li
        .join(orders(s, dir).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0))
            .cast("long").as("n_violations"))
        .select(lit("fk_lineitem_orders").as("check"),
          col("n_violations"), col("n_checked"))
      val uniq = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).cast("long").as("n_checked"),
          sum(col("c") - 1).cast("long").as("n_violations"))
        .select(lit("unique_orderkey_linenumber").as("check"),
          col("n_violations"), col("n_checked"))
      scan.select("check", "n_violations", "n_checked")
        .unionByName(fk).unionByName(uniq)
        .orderBy("check")
    },

    Q("q_rollup_incremental",
      "Incremental materialized-view maintenance: a standing daily rollup " +
        "covers history, the newest slice (orders from 1998 on) arrives as " +
        "a batch, and the refresh merges BATCH-ROLLUP into STANDING-ROLLUP " +
        "by re-aggregating two partial-aggregate tables — history is never " +
        "rescanned, which at 100 TB is the difference between a refresh " +
        "touching day-sized data and recomputing the lake (both rollups " +
        "here derive in-query since testdata has no persisted store; in " +
        "production the standing side reads back from the lake and the " +
        "merge plan is identical). Every metric crossing the merge is " +
        "MERGEABLE (counts and cent-sums add; min/max combine); the " +
        "average is derived AFTER the merge from merged sums — the " +
        "classic non-mergeable-metric trap. The oracle recomputes the " +
        "rollup from scratch over all rows: scratch == merged IS the " +
        "correctness contract of incremental view maintenance (the " +
        "clustersIncremental pinned-equality pattern, SQL-expressible)",
      Some(s"""SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
              |  o_orderstatus AS status,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              |    AS cents,
              |  CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              |    AS max_cents,
              |  ${text.fixedPoint(
                  "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)" +
                    " / count(*)", 2)} AS avg_cents_x100
              |FROM orders
              |GROUP BY day, status
              |ORDER BY day, status""".stripMargin)) { (s, dir) =>
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("day", "status")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          max(col("cents")).as("max_cents"))
      val o = orders(s, dir)
      val standing = partial(o.filter(col("o_orderdate") < lit("1998-01-01")))
      val batch = partial(o.filter(col("o_orderdate") >= lit("1998-01-01")))
      standing.unionByName(batch)
        .groupBy("day", "status")
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("cents")).cast("long").as("cents"),
          max(col("max_cents")).cast("long").as("max_cents"))
        .withColumn("avg_cents_x100",
          expr(text.fixedPoint("CAST(cents AS DOUBLE) / n", 2)))
        .select("day", "status", "n", "cents", "max_cents", "avg_cents_x100")
        .orderBy("day", "status")
    },

    Q("q_running_total",
      "Cumulative revenue per customer over order time — the running-sum " +
        "window every ledger/balance pipeline runs (q_sessionize uses the " +
        "same frame for flags; this is the cents-exact value form). " +
        "Partitioned frame: a customer's history accumulates inside one " +
        "partition, cents keep the prefix sums exact under any re-ordering " +
        "of upstream partials",
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(cents) OVER (PARTITION BY o_custkey
             |                        ORDER BY o_orderdate, o_orderkey
             |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       AS BIGINT) AS running_cents
             |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |      FROM orders WHERE o_custkey < 100)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, dir).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("cents")).over(w).cast("long").as("running_cents"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_date_features",
      "Calendar feature extraction: year/quarter/month/day-name per order " +
        "date, aggregated to order counts — the date-function family " +
        "beyond day-truncation. Day-of-week ships as the NAME: the two " +
        "engines number weekdays differently (DuckDB dow 0=Sunday, Spark " +
        "dayofweek 1=Sunday) and the name sidesteps the off-by-one " +
        "entirely",
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |  CAST(month(o_orderdate) AS BIGINT) AS m,
             |  dayname(o_orderdate) AS dow,
             |  count(*) AS n
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY y, q, m, dow""".stripMargin)) { (s, dir) =>
      orders(s, dir)
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1998-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1999-01-01 00:00:00'"))
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_format(col("o_orderdate"), "EEEE").as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "q", "m", "dow")
    },

    Q("q_rank_family",
      "rank / dense_rank / percent_rank within each market segment by " +
        "account balance — the tie-aware rank family (q_ntile buckets, " +
        "q_latest_per_group row_numbers; this completes §2.5): equal " +
        "balances share a rank and open gaps, and all three are pure " +
        "functions of the VALUE ordering, so ties cannot make them " +
        "nondeterministic. percent_rank is an integer ratio — fixed-point",
      Some(s"""SELECT c_custkey, c_mktsegment,
              |  CAST(rank() OVER w AS BIGINT) AS rnk,
              |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
              |  ${text.fixedPoint("percent_rank() OVER w", 4)} AS pct_x10k
              |FROM customer
              |WHERE c_custkey <= 500
              |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
              |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      customer(s, dir).filter(col("c_custkey") <= 500)
        .select(col("c_custkey"), col("c_mktsegment"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          expr(text.fixedPoint("percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)", 4))
            .as("pct_x10k"))
        .orderBy("c_custkey")
    },

    Q("q_outliers",
      "Anomaly counts per event type: values beyond 3 population sigmas. " +
        "The z-test runs ENTIRELY in exact integers — |v-mean| > 3·std " +
        "⟺ (n·v - sx)² > 9·(n·sxx - sx²) after multiplying through by n² " +
        "— so there is no sqrt, no double, and no accumulation-order noise " +
        "at all; moments ride DECIMAL/HUGEINT (squared-cents sums pass " +
        "2^63, the q_corr_stats lesson). Two passes over events: tiny " +
        "moment aggregate broadcast back onto the scan. Headroom bound: " +
        "Spark's side runs in decimal(38,0), so (n·v - sx)² must stay " +
        "under 10^38, i.e. n·v_max < ~10^19 — good for ~10^14 events of " +
        "cent-values up to 10^5, enough for any per-type group at 100 TB; " +
        "past that, under non-ANSI mode the overflow NULLs the when() and " +
        "silently undercounts, so re-scale v (e.g. whole units, not " +
        "cents) before the moments rather than flipping ANSI per-query",
      Some("""WITH c AS (
             |  SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS v
             |  FROM events),
             |m AS (
             |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(v) AS HUGEINT) AS sx,
             |    CAST(sum(v * v) AS HUGEINT) AS sxx
             |  FROM c GROUP BY event_type)
             |SELECT c.event_type, CAST(m.n AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN (m.n * c.v - m.sx) * (m.n * c.v - m.sx)
             |                     > 9 * (m.n * m.sxx - m.sx * m.sx)
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM c JOIN m ON c.event_type = m.event_type
             |GROUP BY c.event_type, m.n
             |ORDER BY c.event_type""".stripMargin)) { (s, dir) =>
      val c = events(s, dir).select(col("event_type"),
        round(col("value") * 100).cast("decimal(38,0)").as("v"))
      val m = c.groupBy("event_type")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("v")).cast("decimal(38,0)").as("sx"),
          sum(col("v") * col("v")).cast("decimal(38,0)").as("sxx"))
      val dev = col("n") * col("v") - col("sx")
      c.join(broadcast(m), "event_type")
        .groupBy(col("event_type"), col("n"))
        .agg(sum(when(dev * dev > lit(9) * (col("n") * col("sxx") - col("sx") * col("sx")), 1)
          .otherwise(0)).cast("long").as("n_outliers"))
        .select(col("event_type"), col("n").cast("long").as("n"), col("n_outliers"))
        .orderBy("event_type")
    },

    Q("q_cms_heavy",
      "Count-min frequency sketch (operators/Sketches): per-supplier " +
        "frequency probes for suppliers 1-20 from one mergeable " +
        "fixed-size sketch over lineitem — the heavy-hitter probe that " +
        "replaces an exact full-key-universe shuffle at 100 TB. " +
        "Oracle-checkable form: the raw estimate is engine-specific, so " +
        "the output carries the EXACT per-key count plus `est_ok` = the " +
        "CMS contract (overcount-only AND est-true <= ceil(eps*N)); the " +
        "sketch is seeded, so the boolean is deterministic per dataset " +
        "and the DuckDB twin is the exact GROUP BY plus literal TRUE. " +
        "The exact side exists only to grade the sketch — at 100 TB a " +
        "user probes the sketch alone (same stance as q_approx_distinct). " +
        "TRIAGE: est_ok=false on new data means the CMS bound (tune " +
        "eps/delta), NOT an engine bug — true_n beside it still matches",
      Some("""SELECT l_suppkey AS suppkey, count(*) AS true_n, TRUE AS est_ok
             |FROM lineitem
             |WHERE l_suppkey BETWEEN 1 AND 20
             |GROUP BY 1
             |ORDER BY suppkey""".stripMargin)) { (s, dir) =>
      val eps = 0.0001
      val li = lineitem(s, dir)
      val est = li
        .agg(Sketches.cms(eps, 0.99, seed = 42,
            queryKeys = (1L to 20L))(col("l_suppkey")).as("ests"),
          count(lit(1)).as("n_total"))
        .select(explode(col("ests")).as("ke"), col("n_total"))
        .select(col("ke.key").as("suppkey"), col("ke.est").as("est_n"),
          col("n_total"))
      li.filter(col("l_suppkey").between(1, 20))
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(count(lit(1)).as("true_n"))
        .join(broadcast(est), "suppkey")
        .select(col("suppkey"), col("true_n"),
          (col("est_n") >= col("true_n") &&
            (col("est_n") - col("true_n")) <= ceil(col("n_total") * eps))
            .as("est_ok"))
        .orderBy("suppkey")
    },

    Q("q_mg_heavy",
      "Misra-Gries heavy hitters (operators/Sketches.MgAgg): WHICH keys " +
        "exceed n/k of a 100 TB column, with a DETERMINISTIC bound — " +
        "no hashing, no seed, no failure probability (count-min's " +
        "complement: CMS estimates known probe keys, MG discovers the " +
        "frequent ones). k=8 counters over a key column engineered with " +
        "two planted heavy keys (-1/-2 = first/second line of each order, " +
        "~25%/21% of rows at every SF) above a long partkey tail. The " +
        "candidate SET is encounter-order-dependent, so the deterministic " +
        "output is the production probe pattern: exact counts ONLY for " +
        "the <= k candidates (semi-join, map-side-combinable k-key " +
        "aggregate — never the full key-universe shuffle), filtered by " +
        "the true threshold; MG's superset guarantee (every key above " +
        "n/(k+1) survives the summary) makes that filter exact, and the " +
        "undercount bound (est <= true, true - est <= n/(k+1)) holds for " +
        "any merge order, so bound_ok is stably TRUE. Oracle = the exact " +
        "GROUP BY + HAVING twin + literal TRUE",
      Some("""WITH c AS (
             |  SELECT CASE WHEN l_linenumber <= 2 THEN -l_linenumber
             |              ELSE l_partkey END AS key
             |  FROM lineitem),
             |t AS (SELECT count(*) AS n_total FROM c)
             |SELECT key, count(*) AS true_n, TRUE AS bound_ok
             |FROM c, t
             |GROUP BY key, n_total
             |HAVING count(*) > n_total / 8.0
             |ORDER BY key""".stripMargin)) { (s, dir) =>
      val k = 8
      val keyed = lineitem(s, dir).select(
        when(col("l_linenumber") <= 2, -col("l_linenumber").cast("long"))
          .otherwise(col("l_partkey")).as("key"))
      val summary = keyed
        .agg(Sketches.misraGries(k)(col("key")).as("cands"),
          count(col("key")).as("n_total"))
        .select(explode(col("cands")).as("ke"), col("n_total"))
        .select(col("ke.key").as("key"), col("ke.est").as("est_n"),
          col("n_total"))
      keyed
        .join(broadcast(summary.select("key")), Seq("key"), "left_semi")
        .groupBy("key").agg(count(lit(1)).as("true_n"))
        .join(broadcast(summary), "key")
        .filter(col("true_n") > col("n_total") / lit(k.toDouble))
        .select(col("key"), col("true_n"),
          (col("est_n") <= col("true_n") &&
            (col("true_n") - col("est_n")).cast("double") <=
              col("n_total").cast("double") / (k + 1)).as("bound_ok"))
        .orderBy("key")
    },

    Q("q_snapshot_diff",
      "Snapshot reconciliation: FULL OUTER join of two corpus snapshots " +
        "(synthesized from customer by key rule — %31 keys absent from " +
        "old = 'added', %37 absent from new = 'removed', %13 get a cents " +
        "bump = 'changed'), classified row-by-row and rolled up to " +
        "status counts + key checksums. The daily sanity diff every " +
        "warehouse runs between loads: ONE co-partitioned shuffle join " +
        "on the key — both sides arrive hash-partitioned by c_custkey, " +
        "and the classification is a codegen'd projection on top. Values " +
        "compare in exact cents, never doubles",
      Some("""WITH old_s AS (
             |  SELECT c_custkey AS k,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
             |  FROM customer WHERE c_custkey % 31 <> 0),
             |new_s AS (
             |  SELECT c_custkey AS k,
             |    CAST(round(c_acctbal * 100) AS BIGINT)
             |      + CASE WHEN c_custkey % 13 = 0 THEN 100 ELSE 0 END AS v
             |  FROM customer WHERE c_custkey % 37 <> 0)
             |SELECT status, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(k) AS BIGINT) AS key_sum
             |FROM (
             |  SELECT coalesce(o.k, n.k) AS k, CASE
             |    WHEN o.k IS NULL THEN 'added'
             |    WHEN n.k IS NULL THEN 'removed'
             |    WHEN o.v <> n.v THEN 'changed'
             |    ELSE 'unchanged' END AS status
             |  FROM old_s o FULL OUTER JOIN new_s n ON o.k = n.k)
             |GROUP BY status ORDER BY status""".stripMargin)) { (s, dir) =>
      val cents = round(col("c_acctbal") * 100).cast("long")
      val oldS = customer(s, dir).filter(col("c_custkey") % 31 =!= 0)
        .select(col("c_custkey").as("ok"), cents.as("ov"))
      val newS = customer(s, dir).filter(col("c_custkey") % 37 =!= 0)
        .select(col("c_custkey").as("nk"),
          (cents + when(col("c_custkey") % 13 === 0, 100).otherwise(0)).as("nv"))
      oldS.join(newS, col("ok") === col("nk"), "full_outer")
        .select(coalesce(col("ok"), col("nk")).as("k"),
          when(col("ok").isNull, "added")
            .when(col("nk").isNull, "removed")
            .when(col("ov") =!= col("nv"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("key_sum"))
        .orderBy("status")
    },

    Q("q_cdc_apply",
      "CDC batch apply (the MERGE INTO shape): a change batch of deletes " +
        "(%10 keys) and upserts (%7 keys, balance doubled) lands on the " +
        "customer snapshot as anti-join-then-union — delete keys drop, " +
        "upsert rows replace, everything else passes through; reported " +
        "as per-segment counts + exact cents. At 100 TB the change batch " +
        "is day-sized vs a corpus-sized snapshot: both the delete and " +
        "replace probes broadcast, so the snapshot is scanned once with " +
        "no shuffle before the final rollup",
      Some("""WITH del AS (
             |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 10 = 0),
             |ups AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) * 2 AS cents
             |  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 10 <> 0),
             |keep AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer
             |  WHERE c_custkey % 10 <> 0 AND c_custkey % 7 <> 0),
             |applied AS (
             |  SELECT * FROM keep UNION ALL SELECT * FROM ups)
             |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS cents_sum
             |FROM applied GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)) { (s, dir) =>
      val cents = round(col("c_acctbal") * 100).cast("long")
      val snap = customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
      // the change batch, as a real CDC feed would deliver it: (key, op,
      // payload) — derived from the snapshot so the test stays data-driven
      val del = snap.filter(col("c_custkey") % 10 === 0).select(col("c_custkey"))
      val ups = snap.filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("cents") * 2).as("cents"))
      snap
        .join(broadcast(del), Seq("c_custkey"), "left_anti")
        .join(broadcast(ups.select(col("c_custkey"))), Seq("c_custkey"), "left_anti")
        .unionByName(ups)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("cents_sum"))
        .orderBy("c_mktsegment")
    },

    Q("q_fuzzy_join",
      "Entity-resolution (approximate string) join: probe names with a " +
        "deterministic last-char typo match back to the part catalog at " +
        "levenshtein <= 2. The quadratic is bounded the same way as every " +
        "pair search here — a blocking key (8-char name prefix) turns the " +
        "all-pairs edit-distance scan into an equi-join, and the O(len^2) " +
        "levenshtein runs only on bucket-mates. MDM/dedup shape: returns " +
        "ALL candidates within distance, ranked by key, because entity " +
        "resolution wants the candidate set, not one winner",
      Some("""WITH probe AS (
             |  SELECT p_partkey AS probe_key,
             |    substr(p_name, 1, length(p_name) - 1) || 'x' AS probe_name
             |  FROM part WHERE p_partkey % 50 = 0)
             |SELECT probe_key, p_partkey AS match_key,
             |  CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
             |FROM probe JOIN part
             |  ON substr(probe_name, 1, 8) = substr(p_name, 1, 8)
             |WHERE levenshtein(probe_name, p_name) <= 2
             |ORDER BY probe_key, match_key""".stripMargin)) { (s, dir) =>
      val probe = part(s, dir).filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey").as("probe_key"),
          concat(expr("substr(p_name, 1, length(p_name) - 1)"), lit("x"))
            .as("probe_name"))
      probe.join(part(s, dir),
          substring(col("probe_name"), 1, 8) === substring(col("p_name"), 1, 8))
        .filter(levenshtein(col("probe_name"), col("p_name")) <= 2)
        .select(col("probe_key"), col("p_partkey").as("match_key"),
          levenshtein(col("probe_name"), col("p_name")).cast("long").as("dist"))
        .orderBy("probe_key", "match_key")
    }
  )
}
