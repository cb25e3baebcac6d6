package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** SURVEY.md §2.4 — every join shape the reference uses (J1–J11).
  *
  * Scale rules baked in: dimension sides are `broadcast()` (reference joins
  * its five small dims everywhere, SURVEY §4); the as-of join is the
  * single-shuffle union-and-window from [[Ops.asOfJoin]] rather than a
  * per-row correlated lookup; anti/semi joins are native `left_anti` /
  * `left_semi` so Catalyst plans them as broadcast/hash joins instead of
  * NOT-IN nested loops.
  */
object JoinQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: fact ⋈ broadcast dim with decimal normalization
    // (reference: LS_Opening ⋈ pool_config ls_opening.rs:385-388).
    "q_j1_broadcast_dim" -> { (s, dir) =>
      // Exact integer units on the hot sum (the earn-APR pattern): cents
      // for qty/price/discount, so revenue = Σ priceU·(100−discU) is a
      // LONG sum at scale 4 — exact-double only below 2^53 (~6e14
      // unscaled single-group at sf0.1, linear in SF, crossing 2^53
      // around sf10; past it the long→double cast rounds silently, ANSI
      // only catches 2^63). Ops.exactDouble guards the cast; above the
      // ceiling, fall back to the decimal form.
      val qtyU = (dec("l_quantity") * 100).cast("long")
      val priceU = (dec("l_extendedprice") * 100).cast("long")
      val discU = (dec("l_discount") * 100).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          (Ops.exactDouble(sum(qtyU)) / 1e2).as("sum_qty"),
          (Ops.exactDouble(sum(priceU * (lit(100L) - discU))) / 1e4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    // J2: left outer join keeping zero-activity keys
    // (reference: openings ⋈ closings ls_opening.rs:269-274).
    "q_j2_left_outer" -> { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec("o_totalprice")), lit(0).cast("decimal(28,2)"))
            .cast("double").as("total_spent"))
    },
    // J3: full outer join aligning two daily series
    // (reference: daily opened vs closed ls_opening.rs:1373-1382).
    "q_j3_full_outer" -> { (s, dir) =>
      val ordered = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_ordered"))
      val shipped = Tables.lineitem(s, dir)
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("n_shipped"))
      ordered.join(shipped, Seq("day"), "full_outer")
        .select(col("day").cast("date").as("day"),
          coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
          coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
    },
    // J4: cross join against a 1-row scalar aggregate
    // (reference: CROSS JOIN LatestAggregation ls_state.rs:213-215).
    "q_j4_cross_scalar" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val latest = o.agg(max(col("o_orderdate")).as("max_date"))
      o.crossJoin(latest)
        .filter(col("o_orderdate") > col("max_date") - expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_recent"))
    },
    // J5: as-of join — latest 'view' event per user at-or-before each
    // 'purchase' (reference: LATERAL top-1 price ≤ ts, ls_opening.rs:1460-1467).
    "q_j5_asof" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value").as("purchase_value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("value").as("view_value"))
      Ops.asOfJoin(purchases, views, "user_id", "v_user", "ts", "v_ts", Seq("view_value"))
        .select(col("event_id"), col("user_id"), col("purchase_value"), col("view_value"))
    },
    // As-of join with TOLERANCE (pandas merge_asof parity): each purchase
    // takes the latest prior view price only if it is ≤30 min stale —
    // merge_asof semantics: a too-old NEAREST match nulls out rather than
    // falling back further. Same one-shuffle union+window plan; the
    // matched timestamp rides the carried payload. Second-truncated ts so
    // the 1800 s boundary compare is engine-exact on the ns source.
    "q_x_asof_tolerance" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .withColumn("ts", date_trunc("second", col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      // second-truncation can create same-(user, second) view ties, which
      // asOfJoin and the oracle's ASOF JOIN would each resolve arbitrarily
      // — reduce to one deterministic tick per (user, second) first (the
      // max-value rule, mirrored in the oracle)
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .agg(max(col("value")).as("view_value"))
      Ops.asOfJoin(purchases, views, "user_id", "v_user", "ts", "v_ts",
        Seq("view_value"), toleranceSeconds = Some(1800.0))
        .select(col("event_id"), col("user_id"), col("purchase_value"), col("view_value"))
    },
    // Point-in-interval RANGE JOIN, bucketized (Ops.pointInIntervalJoin):
    // every purchase landing inside an error-incident window ([error ts,
    // +30 min), same user). The naive theta join has no equi key and
    // plans BroadcastNestedLoopJoin — O(n·m) and broadcast-bound; the
    // bucket rewrite (explode intervals to touched 30-min buckets,
    // equi-join on bucket, exact post-filter) is a plain shuffle join.
    // Match count per purchase can exceed 1 (overlapping incidents) —
    // inner-join semantics, counted in the rollup.
    "q_x_range_join" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .withColumn("ts", date_trunc("second", col("ts")))
      val incidents = e.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("user_id"),
          col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Ops.pointInIntervalJoin(purchases, "ts", incidents, "lo", "hi", 1800L,
        equiKeys = Seq("user_id"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_incidents"), min(col("incident_id")).as("first_incident"))
    },
    // J6: anti-join — keys with no counterpart
    // (reference: active leases via NOT EXISTS ×4, ls_state.rs:77-126).
    "q_j6_anti" -> { (s, dir) =>
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    // J7: semi-join — existence without multiplying rows
    // (reference: EXISTS "is position open" ls_opening.rs:1453-1458).
    "q_j7_semi" -> { (s, dir) =>
      val recent = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      Tables.part(s, dir)
        .join(recent, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
    },
    // J8: correlated scalar subquery, rewritten as agg + left join
    // (reference: latest withdraw ts inside COALESCE, lp_lender_state.rs:54-60).
    "q_j8_latest_scalar" -> { (s, dir) =>
      val lastOrder = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order_ts"))
      Tables.customer(s, dir)
        .join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("last_order_ts"), lit("1970-01-01 00:00:00").cast("timestamp"))
            .as("last_order_ts"))
    },
    // J9: multi-way analytic join (6 tables) — revenue per nation in a region
    // and date range (reference: get_positions 5–8-table join ls_state.rs:799-941).
    "q_j9_multiway" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,6)"))
          .cast("double").as("revenue"))
    },
    // J10: join USING a shared column name (reference: raw_message.rs:143).
    "q_j10_using" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("orderkey"), col("l_quantity"), col("l_extendedprice"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("orderkey"), col("o_orderpriority"))
      li.join(o, Seq("orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
    },
    // J11/W1: gap detection via LEAD — synthesize gaps by dropping every
    // orderkey divisible by 100 (reference: missing block ranges block.rs:29-74).
    "q_j11_gap_lead" -> { (s, dir) =>
      val present = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 100 =!= 0)
        .select(col("o_orderkey"))
      // Distributed LEAD (Ops.leadGlobal): range-bucketed windows + a tiny
      // per-bucket handoff replace the single-partition global window, so
      // the gap scan stays shuffle-parallel at any table size (the range
      // anti-join twin below is the S4 repair form over the same gaps).
      graft.functions.Ops.leadGlobal(present, "o_orderkey")
        .filter(col("next_o_orderkey") > col("o_orderkey") + 1)
        .select((col("o_orderkey") + 1).as("gap_start"),
          (col("next_o_orderkey") - 1).as("gap_end"))
    },
    // S4/J11 scale form: missing ids via range anti-join — spark.range is a
    // partitioned generator and the anti-join shuffles on the id, so there is
    // no global window and no single-partition stage at any table size
    // (reference: recover_missing_blocks synchronization.rs:33-136). The only
    // driver materialization is the 2-value min/max bound.
    "q_j11_gap_range" -> { (s, dir) =>
      val present = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 100 =!= 0)
        .select(col("o_orderkey"))
      val bounds = present.agg(min("o_orderkey"), max("o_orderkey")).head()
      if (bounds.isNullAt(0)) {
        // empty present set → no range to repair (oracle yields zero rows too)
        s.range(0, 0).toDF("missing_id")
      } else {
        val (lo, hi) = (bounds.getAs[Number](0).longValue, bounds.getAs[Number](1).longValue)
        s.range(lo, hi + 1).toDF("missing_id")
          .join(present, col("missing_id") === col("o_orderkey"), "left_anti")
      }
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_j1_broadcast_dim" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q_j2_left_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q_j3_full_outer" ->
      """WITH ordered AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_ordered
        |  FROM orders GROUP BY 1),
        |shipped AS (
        |  SELECT date_trunc('day', l_shipdate) AS day, count(*) AS n_shipped
        |  FROM lineitem GROUP BY 1)
        |SELECT coalesce(ordered.day, shipped.day) AS day,
        |  coalesce(n_ordered, 0) AS n_ordered,
        |  coalesce(n_shipped, 0) AS n_shipped
        |FROM ordered FULL OUTER JOIN shipped ON ordered.day = shipped.day""".stripMargin,
    "q_j4_cross_scalar" ->
      """SELECT o_orderstatus, count(*) AS n_recent
        |FROM orders CROSS JOIN (SELECT max(o_orderdate) AS max_date FROM orders) latest
        |WHERE o_orderdate > max_date - INTERVAL 90 DAY
        |GROUP BY o_orderstatus""".stripMargin,
    "q_j5_asof" ->
      """SELECT p.event_id, p.user_id, p.value AS purchase_value, v.view_value
        |FROM (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id AS v_user, date_trunc('microseconds', ts) AS v_ts, value AS view_value
        |      FROM events WHERE event_type = 'view') v
        |ON p.user_id = v.v_user AND p.ts >= v.v_ts""".stripMargin,
    // ASOF LEFT JOIN then null-out stale matches — exactly merge_asof's
    // tolerance (only the nearest prior row is ever considered)
    "q_x_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, p.value AS purchase_value,
        |  CASE WHEN v.v_ts >= p.ts - INTERVAL 30 MINUTE THEN v.view_value END AS view_value
        |FROM (SELECT event_id, user_id, date_trunc('second', ts) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id AS v_user, date_trunc('second', ts) AS v_ts,
        |        max(value) AS view_value
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
        |ON p.user_id = v.v_user AND p.ts >= v.v_ts""".stripMargin,
    // the portable formulation is the plain theta join; DuckDB's IEJoin
    // handles it — the Spark side exists precisely because Spark's doesn't
    "q_x_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, date_trunc('second', ts) AS ts
        |  FROM events),
        |inc AS (SELECT event_id AS incident_id, user_id, ts AS lo,
        |    ts + INTERVAL 30 MINUTE AS hi FROM e WHERE event_type = 'error'),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, count(*) AS n_incidents,
        |  min(i.incident_id) AS first_incident
        |FROM p JOIN inc i ON p.user_id = i.user_id AND p.ts >= i.lo AND p.ts < i.hi
        |GROUP BY p.event_id, p.user_id""".stripMargin,
    "q_j6_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_j7_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q_j8_latest_scalar" ->
      """SELECT c_custkey,
        |  coalesce((SELECT max(o_orderdate) FROM orders WHERE o_custkey = c_custkey),
        |           TIMESTAMP '1970-01-01 00:00:00') AS last_order_ts
        |FROM customer""".stripMargin,
    "q_j9_multiway" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_j10_using" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_lines
        |FROM (SELECT l_orderkey AS orderkey, l_quantity, l_extendedprice FROM lineitem) li
        |JOIN (SELECT o_orderkey AS orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F') o
        |USING (orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_j11_gap_lead" ->
      """WITH present AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 100 <> 0),
        |w AS (SELECT o_orderkey, lead(o_orderkey) OVER (ORDER BY o_orderkey) AS next_key FROM present)
        |SELECT o_orderkey + 1 AS gap_start, next_key - 1 AS gap_end
        |FROM w WHERE next_key > o_orderkey + 1""".stripMargin,
    "q_j11_gap_range" ->
      """WITH present AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 100 <> 0),
        |bounds AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM present),
        |ids AS (SELECT unnest(generate_series(lo, hi)) AS missing_id FROM bounds)
        |SELECT missing_id FROM ids
        |WHERE NOT EXISTS (SELECT 1 FROM present WHERE o_orderkey = missing_id)""".stripMargin
  )
}
