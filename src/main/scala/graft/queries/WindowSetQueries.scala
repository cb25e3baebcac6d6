package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** SURVEY.md §2.6–2.8 — window functions (W2–W6), sorts/limits/top-k
  * (O1–O3), and the UNION ALL family (U1–U6).
  *
  * `latestPerKey` (W5) is the reference's single most common idiom
  * (`DISTINCT ON`); all uses here pin a unique tiebreak so results are
  * deterministic. Pagination (O1) establishes a total order before
  * offset/limit for the same reason.
  */
object WindowSetQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W5: DISTINCT ON — latest order per customer with unique tiebreak
    // (reference: latest state per contract ls_state.rs:467-471 + 6 sites).
    "q_w5_latest_per_key" -> { (s, dir) =>
      Ops.latestPerKey(Tables.orders(s, dir), Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    },
    // W2: RANK()=1 latest-per-pool variant — same shape, rank() flavor on a
    // tie-free order (reference: lp_pool_state.rs:287-309).
    "q_w2_rank_latest" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts").desc, col("event_id").desc)
      ev(s, dir)
        .withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("event_id"), col("ts"), col("value"))
    },
    // W3: running total per key (reference: cumulative buyback
    // tr_profit.rs:105-174). Partitioned by user — scales horizontally.
    "q_w3_running_total" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          sum(dec("value")).over(w).cast("double").as("cum_value"))
    },
    // W6: cumulative over ordered hours — the reference writes it as an
    // inequality join + GROUP BY (ls_state.rs:586-595); expressed here as a
    // window over the hourly rollup (same semantics, one shuffle less).
    "q_w6_hourly_cumulative" -> { (s, dir) =>
      val hourly = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourly.select(col("event_type"), col("hour"), col("n"),
        sum(col("n")).over(w).as("cum_n"))
    },
    // O1: keyset pagination — ORDER BY ... DESC OFFSET/LIMIT with a unique
    // tiebreak (reference: ls_opening.rs:324,766-767).
    "q_o1_pagination" -> { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .offset(20).limit(10)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    },
    // O2: argmax — top event by value per type, ORDER BY ... LIMIT 1 per
    // group (reference: latest price mp_asset.rs:89-123).
    "q_o2_argmax" -> { (s, dir) =>
      Ops.latestPerKey(ev(s, dir), Seq("event_type"),
        Seq(col("value").desc, col("event_id").asc))
        .select(col("event_type"), col("event_id"), col("value"))
    },
    // O3: global presentation sort (reference: ORDER BY "Loan" DESC
    // ls_opening.rs:444-446). Top-20 suppliers by revenue — sort + limit is
    // executed as a TakeOrdered top-k, not a full global sort.
    "q_o3_topk_sorted" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(sum(dec("l_extendedprice")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_suppkey").asc)
        .limit(20)
    },
    // U2: per-entity history — UNION ALL with type tags and NULL padding
    // (reference: repay ∪ market-close ∪ liquidation ls_opening.rs:830-870).
    "q_u2_union_history" -> { (s, dir) =>
      val placed = Tables.orders(s, dir).select(
        col("o_orderkey").as("okey"),
        lit("placed").as("typ"),
        dec("o_totalprice").cast("double").as("amount"),
        col("o_orderpriority").as("priority"))
      val shipped = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("okey"),
        lit("shipped").as("typ"),
        dec("l_extendedprice").cast("double").as("amount"),
        lit(null).cast("string").as("priority"))
      placed.unionByName(shipped)
        .filter(col("okey") < 100)
    },
    // U1: total flow across multiple streams → one scalar
    // (reference: total tx value across 5 flow types ls_opening.rs:723-731).
    "q_u1_total_flows" -> { (s, dir) =>
      val e = ev(s, dir)
      val streams = Seq("purchase", "click", "view", "signup", "error").map(t =>
        e.filter(col("event_type") === t).select(dec("value").as("amt")))
      streams.reduce(_ unionByName _)
        .agg(sum(col("amt")).cast("double").as("total_value"), count(lit(1)).as("n_events"))
    },
    // U4: closed-loans union — close-position rows ∪ repayment rows on an
    // aligned schema, rolled up per contract with the MAX(CASE close-flag)
    // timestamp and kept only when a close row exists
    // (reference: Closed_Loans/RepaidLeases ls_repayment.rs:224-260). The
    // 'error' stream plays close-position, 'purchase' plays repayments.
    "q_u4_closed_union" -> { (s, dir) =>
      val e = ev(s, dir)
      val closes = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), dec("value").as("amount"), lit(true).as("is_close"))
      val repays = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), dec("value").as("amount"), lit(false).as("is_close"))
      closes.unionByName(repays)
        .groupBy(col("user_id"))
        .agg(sum(col("amount")).cast("double").as("total_flow"),
          max(when(col("is_close"), col("ts"))).as("close_ts"),
          count(when(col("is_close"), 1)).as("n_close"))
        .filter(col("n_close") > 0)
    },
    // U5: interest-events union — three tagged streams on one schema with a
    // per-row interest split, newest-first keyset page
    // (reference: RepaymentEvents ∪ CloseEvents ∪ LiquidationEvents
    // ls_repayment.rs:414-477). Tag sort keeps equal-ts rows deterministic.
    "q_u5_interest_union" -> { (s, dir) =>
      val e = ev(s, dir)
      def stream(t: String, tag: String) = e.filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), col("ts"), lit(tag).as("evt"),
          round(col("value") * 0.7, 6).as("loan_interest"),
          round(col("value") * 0.3, 6).as("margin_interest"))
      stream("purchase", "repayment")
        .unionByName(stream("signup", "close"))
        .unionByName(stream("error", "liquidation"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .offset(10).limit(50)
    },
    // U6: two-sided ledger with tags, kept as rows (reference: deposits ∪
    // withdrawals lp_deposit.rs:161-190).
    // Batch sessionization (the classic gap-based form): per user, a new
    // session starts when >30 min separate consecutive events; session id
    // = running count of session starts. One user-keyed shuffle carries
    // both windows (the LAG gap probe and the running sum share the same
    // partitioning + ordering, so Catalyst plans ONE Exchange + one
    // WindowExec pair); the per-session rollup reuses the partitioning.
    // Sessionizes on second-truncated timestamps so the ns-precision
    // source (Spark truncates, DuckDB keeps — TESTDATA gotcha) can't
    // flip a gap at the 30-minute boundary; event_id breaks same-second
    // ties deterministically.
    "q_x_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("ts"))
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("is_new",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wRun).cast("int"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("duration_sec"))
    },
    // Distribution-position window functions: percent_rank (=(rank−1)/(n−1))
    // and cume_dist (=peers≤/n) of each event's value within its type —
    // both are small-integer ratios, so the doubles are engine-identical;
    // event_id makes the order total (ties on equal value break
    // deterministically). One shuffle; both functions share the window.
    "q_x_percent_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(dec("value"), col("event_id"))
      ev(s, dir)
        .select(col("event_id"), col("event_type"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    },
    // LOCF gap filling (last observation carried forward): the value is
    // NULL on error events, and each user's series fills forward from the
    // last non-null via IGNORE NULLS last_value — the time-series repair
    // move (sensor dropouts, sparse price ticks). Leading NULLs (a user
    // whose history starts with errors) stay NULL by definition. One
    // user-keyed shuffle; second-truncated ts for ns-source parity.
    "q_x_locf" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts"),
          when(col("event_type") === "error", lit(null).cast("decimal(18,2)"))
            .otherwise(dec("value")).as("v"))
        .select(col("event_id"), col("user_id"), col("ts"),
          // double at the boundary: decimal output columns are banned by
          // the export contract (OutputTypeSpec — driver hash defect on
          // trailing-zero decimal text); the carried decimal is exact,
          // the cast is the last step
          last(col("v"), ignoreNulls = true).over(w).cast("double").as("filled"))
    },
    // Linear interpolation between surrounding observations — the LOCF
    // sibling for numeric series: a NULL (error event) takes
    // pv + (nv−pv)·(t−pt)/(nt−pt) from the nearest non-null neighbors on
    // each side (IGNORE NULLS last over mirrored RUNNING frames on ONE
    // partitioning), edge rows fall back to the single available side,
    // and a same-second neighbor pair guards the 0/0. All arithmetic is
    // the identical double expression tree on both engines; timestamps
    // second-truncated so (t−pt) is an exact integral double.
    // Scale note: the next-neighbor side is `last IGNORE NULLS` over the
    // REVERSED sort's running frame, not `first` over (currentRow,
    // unboundedFollowing) — Spark executes an unbounded-FOLLOWING frame
    // by rescanning current→end for every row (O(n²) per partition;
    // measured 6.7× time at 10× data, the probe set's worst), while the
    // running frame streams in O(n). (ts, event_id) is a total order, so
    // the desc sort is the exact reverse and the value is identical; same
    // partitioning → one Exchange, two in-place sorts.
    "q_x_interpolate" -> { (s, dir) =>
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNextRev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val obs = when(col("v").isNotNull,
        struct(col("ts").cast("double").as("t"), col("v").as("v")))
      ev(s, dir)
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(dec("value").cast("double")).as("v"))
        .select(col("event_id"), col("user_id"), col("ts"), col("v"),
          last(obs, ignoreNulls = true).over(wPrev).as("p"),
          last(obs, ignoreNulls = true).over(wNextRev).as("nx"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("v").isNotNull, col("v"))
            .when(col("p").isNull, col("nx").getField("v"))
            .when(col("nx").isNull, col("p").getField("v"))
            .when(col("nx").getField("t") === col("p").getField("t"),
              col("p").getField("v"))
            .otherwise(col("p").getField("v") +
              (col("nx").getField("v") - col("p").getField("v")) *
              ((col("ts").cast("double") - col("p").getField("t")) /
                (col("nx").getField("t") - col("p").getField("t"))))
            .as("filled"))
    },
    "q_u6_ledger" -> { (s, dir) =>
      val e = ev(s, dir)
      val dep = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"), lit("in").as("kind"), col("value").as("amount"))
      val wd = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"), lit("out").as("kind"), col("value").as("amount"))
      dep.unionByName(wd)
    },
    // INTERSECT ALL — multiset semantics: each (user, day) row of the
    // view activity grid survives min(view-multiplicity, click-
    // multiplicity) times. Spark rewrites intersectAll into one
    // full-width hash aggregate carrying both sides' counts plus a
    // replicating generator (RewriteIntersectAll) — a single shuffle on
    // the row key, the same cost class as the U-family unions; no
    // driver-side set logic. Completes the bag-algebra trio the U
    // entries started (UNION ALL / INTERSECT ALL / EXCEPT ALL).
    "q_x_intersect_all" -> { (s, dir) =>
      val e = ev(s, dir)
      def grid(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      grid("view").intersectAll(grid("click"))
    },
    // EXCEPT ALL — the multiset complement: view-days minus click-days
    // with multiplicity subtraction (a user with 3 views and 1 click on
    // a day keeps 2 rows). Same single-shuffle rewrite class as
    // intersectAll.
    "q_x_except_all" -> { (s, dir) =>
      val e = ev(s, dir)
      def grid(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      grid("view").exceptAll(grid("click"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_w5_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q_w2_rank_latest" ->
      s"""WITH $evCte
         |SELECT event_type, event_id, ts, value FROM (
         |  SELECT *, rank() OVER (PARTITION BY event_type
         |    ORDER BY ts DESC, event_id DESC) AS rk
         |  FROM ev) WHERE rk = 1""".stripMargin,
    "q_w3_running_total" ->
      s"""WITH $evCte
         |SELECT user_id, event_id, ts,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
         |FROM ev WHERE event_type = 'purchase'""".stripMargin,
    "q_w6_hourly_cumulative" ->
      s"""WITH $evCte,
         |hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
         |  FROM ev GROUP BY 1, 2)
         |SELECT event_type, hour, n,
         |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
         |FROM hourly""".stripMargin,
    // (rank−1)/(n−1) and peers/n are exact small-integer ratios — the
    // divisions land on identical doubles in both engines
    "q_x_percent_rank" ->
      s"""WITH $evCte,
         |e2 AS (SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS v FROM ev)
         |SELECT event_id, event_type,
         |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
         |FROM e2 WINDOW w AS (PARTITION BY event_type ORDER BY v, event_id)""".stripMargin,
    "q_x_locf" ->
      s"""WITH $evCte,
         |e2 AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts,
         |    CASE WHEN event_type = 'error' THEN NULL
         |    ELSE CAST(value AS DECIMAL(18,2)) END AS v
         |  FROM ev)
         |SELECT event_id, user_id, ts,
         |  CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS filled
         |FROM e2""".stripMargin,
    // second-truncated ts makes (t−pt) an exact integral double; the
    // interpolation expression tree mirrors the Spark side operation for
    // operation so the doubles are bit-identical
    "q_x_interpolate" ->
      s"""WITH $evCte,
         |e2 AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts,
         |    CASE WHEN event_type = 'error' THEN NULL
         |    ELSE CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) END AS v
         |  FROM ev),
         |o AS (SELECT *, CASE WHEN v IS NOT NULL
         |    THEN {t: CAST(epoch(ts) AS DOUBLE), v: v} END AS ob FROM e2),
         |f AS (SELECT *,
         |  last_value(ob IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         |  first_value(ob IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
         |  FROM o)
         |SELECT event_id, user_id, ts,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN p IS NULL THEN nx.v
         |       WHEN nx IS NULL THEN p.v
         |       WHEN nx.t = p.t THEN p.v
         |       ELSE p.v + (nx.v - p.v) *
         |            ((CAST(epoch(ts) AS DOUBLE) - p.t) / (nx.t - p.t)) END AS filled
         |FROM f""".stripMargin,
    // epoch() on second-truncated timestamps is integral, so the gap
    // comparison and duration arithmetic are exact in both engines
    "q_x_sessionize" ->
      s"""WITH $evCte,
         |e2 AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts FROM ev),
         |g AS (SELECT *, epoch(ts) - epoch(lag(ts) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s FROM e2),
         |sg AS (SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS is_new
         |  FROM g),
         |sess AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
         |    AS session_id FROM sg)
         |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events,
         |  CAST(epoch(max(ts)) - epoch(min(ts)) AS BIGINT) AS duration_sec
         |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q_o1_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10 OFFSET 20""".stripMargin,
    "q_o2_argmax" ->
      s"""WITH $evCte
         |SELECT event_type, event_id, value FROM (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY value DESC, event_id ASC) AS rn
         |  FROM ev) WHERE rn = 1""".stripMargin,
    "q_o3_topk_sorted" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY revenue DESC, l_suppkey ASC LIMIT 20""".stripMargin,
    "q_u2_union_history" ->
      """SELECT o_orderkey AS okey, 'placed' AS typ,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
        |  o_orderpriority AS priority
        |FROM orders WHERE o_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey AS okey, 'shipped' AS typ,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
        |  CAST(NULL AS VARCHAR) AS priority
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,
    "q_u1_total_flows" ->
      s"""WITH $evCte
         |SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         |  count(*) AS n_events
         |FROM ev
         |WHERE event_type IN ('purchase','click','view','signup','error')""".stripMargin,
    "q_u4_closed_union" ->
      s"""WITH $evCte,
         |flows AS (
         |  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS amount, true AS is_close
         |  FROM ev WHERE event_type = 'error'
         |  UNION ALL
         |  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS amount, false AS is_close
         |  FROM ev WHERE event_type = 'purchase')
         |SELECT user_id, CAST(sum(amount) AS DOUBLE) AS total_flow,
         |  max(CASE WHEN is_close THEN ts END) AS close_ts,
         |  count(CASE WHEN is_close THEN 1 END) AS n_close
         |FROM flows GROUP BY user_id
         |HAVING count(CASE WHEN is_close THEN 1 END) > 0""".stripMargin,
    "q_u5_interest_union" ->
      s"""WITH $evCte,
         |streams AS (
         |  SELECT event_id, user_id, ts, 'repayment' AS evt,
         |    round(value * 0.7, 6) AS loan_interest, round(value * 0.3, 6) AS margin_interest
         |  FROM ev WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT event_id, user_id, ts, 'close' AS evt,
         |    round(value * 0.7, 6), round(value * 0.3, 6)
         |  FROM ev WHERE event_type = 'signup'
         |  UNION ALL
         |  SELECT event_id, user_id, ts, 'liquidation' AS evt,
         |    round(value * 0.7, 6), round(value * 0.3, 6)
         |  FROM ev WHERE event_type = 'error')
         |SELECT * FROM streams
         |ORDER BY ts DESC, event_id DESC LIMIT 50 OFFSET 10""".stripMargin,
    "q_u6_ledger" ->
      s"""WITH $evCte
         |SELECT user_id, event_id, ts, 'in' AS kind, value AS amount
         |FROM ev WHERE event_type = 'signup'
         |UNION ALL
         |SELECT user_id, event_id, ts, 'out' AS kind, value AS amount
         |FROM ev WHERE event_type = 'error'""".stripMargin,
    "q_x_intersect_all" ->
      s"""WITH $evCte
         |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
         |FROM ev WHERE event_type = 'view'
         |INTERSECT ALL
         |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
         |FROM ev WHERE event_type = 'click'""".stripMargin,
    "q_x_except_all" ->
      s"""WITH $evCte
         |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
         |FROM ev WHERE event_type = 'view'
         |EXCEPT ALL
         |SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
         |FROM ev WHERE event_type = 'click'""".stripMargin
  )
}
