package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** SURVEY.md §2.10 — the reference's Rust-side business derivations (B1–B11)
  * re-expressed as pure column expressions. No UDFs anywhere: every formula
  * is built-in `Column` arithmetic, so it stays inside whole-stage codegen.
  *
  * Rounding parity (B4): multiply in DECIMAL (exact), round half-away-from-
  * zero on positive values — Spark's HALF_UP and DuckDB's ROUND agree there;
  * order of rounding mirrors the reference (round each term, then subtract).
  */
object DerivationQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1+B2: in_stable_by_date — as-of price lookup then amount × price
    // (reference: configuration.rs:578-628). The 'view' stream plays the
    // price series; missing price falls back to 1.0 (first-price fallback,
    // ls_opening.rs:1577-1584).
    "q_b2_in_stable" -> { (s, dir) =>
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value").as("amount"))
      val prices = e.filter(col("event_type") === "view")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("price"))
      Ops.asOfJoin(purchases, prices, "user_id", "p_user", "ts", "p_ts", Seq("price"))
        .select(col("event_id"), col("user_id"),
          (col("amount") * coalesce(col("price"), lit(1.0))).as("in_stable"))
    },
    // B4: opening-fee with order-of-rounding pinned — round each decimal
    // term to 0 dp, THEN subtract (reference: configuration.rs:701-756).
    "q_b4_fee_rounding" -> { (s, dir) =>
      val fee = round((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") + dec("l_tax"))).cast("decimal(30,4)"), 0) -
        round((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(30,4)"), 0)
      Tables.lineitem(s, dir)
        .withColumn("fee", fee)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("fee")).cast("double").as("total_fee"), count(lit(1)).as("n"))
    },
    // B5: branch-dependent price formula — Long vs Short liquidation price
    // (reference: wasm_ls_open.rs:20-49; SQL twin ls_opening.rs:1481-1484).
    "q_b5_branch_price" -> { (s, dir) =>
      val tp = col("o_totalprice")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(
            when(col("o_orderstatus") === "O", (tp / 0.9) / (tp * 0.2 + tp) * 1.05)
              .when(col("o_orderstatus") === "F", (tp * 0.2 + tp) / (tp / 0.9))
              .otherwise(lit(0.0)), 6).as("liq_price"))
        .filter(col("o_orderkey") < 1000)
    },
    // B6–B9 shape: PnL = value − debt − Σflows + fee over a multi-join
    // (reference: ls_loan_closing.rs:460-567). Here: order total minus net
    // lineitem value plus tax component, exact in DECIMAL.
    "q_b6_pnl" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(30,4)")).as("net_value"),
          sum((dec("l_extendedprice") * dec("l_tax")).cast("decimal(30,4)")).as("tax_paid"))
      Tables.orders(s, dir)
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"),
          (dec("o_totalprice") - coalesce(col("net_value"), lit(0).cast("decimal(30,4)"))
            + coalesce(col("tax_paid"), lit(0).cast("decimal(30,4)")))
            .cast("double").as("pnl"))
        .filter(col("o_orderkey") < 300)
    },
    // B7: PnL short branch — the debt leg is valued through a price at
    // valuation time: pnl = amount − debt×lpn_price − Σrepaid − downpayment
    // + fee (reference: get_pnl_short ls_loan_closing.rs:569-684, formula at
    // :670). The customer dim supplies the per-order price factor; exact
    // DECIMAL sums feed a per-row double formula.
    "q_b7_pnl_short" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(30,4)")).as("debt"),
          sum((dec("l_extendedprice") * dec("l_tax")).cast("decimal(30,4)")).as("repaid"))
      val price = Tables.customer(s, dir)
        .select(col("c_custkey"), (lit(1.0) + col("c_acctbal") / 100000.0).as("lpn_price"))
      Tables.orders(s, dir)
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .join(broadcast(price), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          round(col("o_totalprice")
            - coalesce(col("debt").cast("double"), lit(0.0)) * col("lpn_price")
            - coalesce(col("repaid").cast("double"), lit(0.0))
            - col("o_totalprice") * 0.2
            + col("o_totalprice") * 0.01, 6).as("pnl_short"))
        .filter(col("o_orderkey") < 300)
    },
    // B8: PnL liquidated branch — no market legs survive liquidation:
    // pnl = −(Σrepaid + downpayment) (reference: get_pnl_liquidated
    // ls_loan_closing.rs:743-802, formula at :791).
    "q_b8_pnl_liquidated" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum((dec("l_extendedprice") * dec("l_tax")).cast("decimal(30,4)")).as("repaid"))
      Tables.orders(s, dir)
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"),
          round(-(coalesce(col("repaid").cast("double"), lit(0.0))
            + col("o_totalprice") * 0.2), 6).as("pnl_liquidated"))
        .filter(col("o_orderkey") < 300)
    },
    // B10: snapshot-delta identity tax = state_now + rewards − profit −
    // state_prev via lag over ordered snapshots (reference: pl_state.rs:160-166,
    // entities.md:345). Daily per-user value plays the snapshot series.
    "q_b10_lag_identity" -> { (s, dir) =>
      val daily = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(dec("value")).as("state"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      daily
        .select(col("user_id"), col("day").cast("date").as("day"),
          col("state").cast("double").as("state"),
          (col("state") - lag(col("state"), 1).over(w)).cast("double").as("delta"))
    },
    // B11: utilization and earn rate — borrowed/NULLIF(tvl,0), then
    // (rate − margin) × utilization (reference: lp_pool_state.rs:463-517).
    "q_b11_utilization" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(
          sum(when(col("l_returnflag") === "R", dec("l_extendedprice"))).cast("double").as("borrowed"),
          sum(dec("l_extendedprice")).cast("double").as("tvl"),
          (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_rate"))
        .select(col("l_suppkey"),
          (coalesce(col("borrowed"), lit(0.0)) / nullif(col("tvl"), lit(0.0))).as("utilization"),
          ((col("avg_rate") - 0.01) * (coalesce(col("borrowed"), lit(0.0)) / nullif(col("tvl"), lit(0.0))))
            .as("earn_rate"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_b2_in_stable" ->
      s"""WITH $evCte
         |SELECT p.event_id, p.user_id,
         |  p.value * coalesce(v.price, 1.0) AS in_stable
         |FROM (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase') p
         |ASOF LEFT JOIN
         |     (SELECT user_id AS p_user, ts AS p_ts, value AS price FROM ev WHERE event_type = 'view') v
         |ON p.user_id = v.p_user AND p.ts >= v.p_ts""".stripMargin,
    "q_b4_fee_rounding" ->
      """SELECT l_returnflag,
        |  CAST(sum(
        |    round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,4)), 0) -
        |    round(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4)), 0)
        |  ) AS DOUBLE) AS total_fee,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_b5_branch_price" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(CASE WHEN o_orderstatus = 'O' THEN (o_totalprice / 0.9) / (o_totalprice * 0.2 + o_totalprice) * 1.05
        |             WHEN o_orderstatus = 'F' THEN (o_totalprice * 0.2 + o_totalprice) / (o_totalprice / 0.9)
        |             ELSE 0.0 END, 6) AS liq_price
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,
    "q_b6_pnl" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS net_value,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS tax_paid
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) - coalesce(net_value, 0) + coalesce(tax_paid, 0) AS DOUBLE) AS pnl
        |FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 300""".stripMargin,
    "q_b7_pnl_short" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS debt,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS repaid
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey,
        |  round(o_totalprice
        |    - coalesce(CAST(debt AS DOUBLE), 0.0) * (1.0 + c_acctbal / 100000.0)
        |    - coalesce(CAST(repaid AS DOUBLE), 0.0)
        |    - o_totalprice * 0.2
        |    + o_totalprice * 0.01, 6) AS pnl_short
        |FROM orders
        |LEFT JOIN li ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey < 300""".stripMargin,
    "q_b8_pnl_liquidated" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS repaid
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey,
        |  round(-(coalesce(CAST(repaid AS DOUBLE), 0.0) + o_totalprice * 0.2), 6) AS pnl_liquidated
        |FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 300""".stripMargin,
    "q_b10_lag_identity" ->
      s"""WITH $evCte,
         |daily AS (
         |  SELECT user_id, date_trunc('day', ts) AS day,
         |         sum(CAST(value AS DECIMAL(18,2))) AS state
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT user_id, day, CAST(state AS DOUBLE) AS state,
         |  CAST(state - lag(state, 1) OVER (PARTITION BY user_id ORDER BY day) AS DOUBLE) AS delta
         |FROM daily""".stripMargin,
    "q_b11_utilization" ->
      """WITH agg AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS borrowed,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_rate
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey,
        |  coalesce(borrowed, 0.0) / nullif(tvl, 0.0) AS utilization,
        |  (avg_rate - 0.01) * (coalesce(borrowed, 0.0) / nullif(tvl, 0.0)) AS earn_rate
        |FROM agg""".stripMargin
  )
}
