package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Literal 1:1 twins of three reference DAO queries, transliterated onto the
  * testdata star schema clause by clause (CTE structure, COALESCE shapes,
  * window flavor, pagination) rather than re-expressed by operator shape —
  * closing the endpoint-corpus gap the shape queries leave: the composite
  * structure of a real page is what gets tested here, not an isolated
  * operator.
  *
  * Schema transliteration (one mapping used by all three):
  *   LS_Opening → orders (contract = o_orderkey, owner = o_custkey),
  *   pool_config → customer dim (decimals from c_nationkey, type from
  *   c_mktsegment), the repayment/close/liquidation event tables → lineitem
  *   split by l_returnflag (R/A/N), LP_Pool_State → lineitem per supplier,
  *   TR_Profit → purchase events.
  *
  * One pinned deviation, recorded per SURVEY §7.4#5: the reference's
  * `ORDER BY timestamp DESC OFFSET/LIMIT` page order is ambiguous on tied
  * timestamps (ship dates tie heavily), so the page sort carries the full
  * output tuple as tiebreak — a total order both engines agree on.
  */
object LiteralTwinQueries {

  /** ContractInfo CTE (ls_repayment.rs:416-424): openings ⋈ config dim with
    * a COALESCE'd position type and the per-contract decimals divisor.
    */
  private def contractInfo(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey").as("ci_contract_id"),
        col("o_custkey").as("position_owner"),
        coalesce(nullif(col("c_mktsegment"), lit("")), lit("Long")).as("position_type"),
        (col("c_nationkey") + 1).cast("double").as("stable_decimals"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // get_interest_events page, clause-for-clause (ls_repayment.rs:414-477):
    // ContractInfo ⋈ each of three event CTEs, the
    // (COALESCE(prev,0)+COALESCE(curr,0))/decimals interest split per leg, a
    // > $3 time cursor, UNION ALL, re-join to ContractInfo, newest-first
    // OFFSET 20 LIMIT 50 page.
    "q_lit_interest_page" -> { (s, dir) =>
      val ci = contractInfo(s, dir)
      val cursor = lit("1997-01-01").cast("timestamp")
      def events(flag: String, tag: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag && col("l_shipdate") > cursor)
        .join(ci, col("l_orderkey") === col("ci_contract_id"))
        .select(
          col("l_shipdate").as("timestamp"),
          col("l_orderkey").as("contract_id"),
          ((coalesce(col("l_extendedprice"), lit(0.0)) + coalesce(col("l_tax"), lit(0.0)))
            / col("stable_decimals")).as("loan_interest_repaid"),
          ((coalesce(col("l_discount"), lit(0.0)) + coalesce(col("l_quantity"), lit(0.0)))
            / col("stable_decimals")).as("margin_interest_repaid"),
          lit(tag).as("event_type"))
      val all = events("R", "repayment")
        .unionByName(events("A", "close"))
        .unionByName(events("N", "liquidation"))
      all.join(ci, col("contract_id") === col("ci_contract_id"))
        .select(col("timestamp"), col("contract_id"), col("position_owner"),
          col("position_type"), col("event_type"),
          col("loan_interest_repaid"), col("margin_interest_repaid"))
        .orderBy(col("timestamp").desc, col("contract_id").desc, col("event_type").desc,
          col("loan_interest_repaid").desc, col("margin_interest_repaid").desc)
        .offset(20).limit(50)
    },
    // get_total_value_locked, clause-for-clause (lp_pool_state.rs:287-309):
    // RANK() — not row_number — over (pool ORDER BY ts DESC), keep rank=1
    // (ALL rows tied at the latest timestamp contribute, the literal
    // semantics), SUM(tvl/decimals) to one scalar. Per-row quotients are
    // rounded to 6dp and summed as exact decimals so the scalar is
    // shuffle-order-independent.
    "q_lit_total_supplied" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate").desc)
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice").cast("double").as("tvl"),
          (col("s_nationkey") + 1).cast("double").as("lpn_decimals"))
        .withColumn("rank", rank().over(w))
        .filter(col("rank") === 1)
        .agg(sum(round(col("tvl") / col("lpn_decimals"), 6).cast("decimal(28,6)"))
          .cast("double").as("total_supplied"))
    },
    // buyback/profit time series, clause-for-clause (tr_profit.rs:214-231):
    // day-truncated SUM(amnt)/1e6 plus the SUM(SUM(amnt)) OVER (ORDER BY
    // day) agg-of-agg cumulative, under the reference's amount sanity filter
    // (amnt < bound). Sums are exact decimals; the /1e6 scaling happens once
    // in double.
    "q_lit_profit_series" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") < 300)
        .groupBy(date_trunc("day", col("ts")).as("time"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("d"))
      val w = Window.orderBy(col("time"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("time"),
        (col("d").cast("double") / 1000000.0).as("daily"),
        (sum(col("d")).over(w).cast("double") / 1000000.0).as("cumulative"))
    }
  )

  private val ciCte =
    """ci AS (SELECT o_orderkey AS ci_contract_id, o_custkey AS position_owner,
      |  coalesce(nullif(c_mktsegment, ''), 'Long') AS position_type,
      |  CAST(c_nationkey + 1 AS DOUBLE) AS stable_decimals
      |FROM orders JOIN customer ON o_custkey = c_custkey)""".stripMargin

  private def evCte(name: String, flag: String, tag: String): String =
    s"""$name AS (SELECT l_shipdate AS "timestamp", l_orderkey AS contract_id,
       |  (coalesce(l_extendedprice, 0) + coalesce(l_tax, 0)) / stable_decimals AS loan_interest_repaid,
       |  (coalesce(l_discount, 0) + coalesce(l_quantity, 0)) / stable_decimals AS margin_interest_repaid,
       |  '$tag' AS event_type
       |FROM lineitem JOIN ci ON l_orderkey = ci_contract_id
       |WHERE l_returnflag = '$flag' AND l_shipdate > TIMESTAMP '1997-01-01')""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_lit_interest_page" ->
      s"""WITH $ciCte,
         |${evCte("re", "R", "repayment")},
         |${evCte("ce", "A", "close")},
         |${evCte("le", "N", "liquidation")},
         |allev AS (SELECT * FROM re UNION ALL SELECT * FROM ce UNION ALL SELECT * FROM le)
         |SELECT e."timestamp", e.contract_id, ci.position_owner, ci.position_type,
         |  e.event_type, e.loan_interest_repaid, e.margin_interest_repaid
         |FROM allev e JOIN ci ON ci.ci_contract_id = e.contract_id
         |ORDER BY e."timestamp" DESC, e.contract_id DESC, e.event_type DESC,
         |  e.loan_interest_repaid DESC, e.margin_interest_repaid DESC
         |OFFSET 20 LIMIT 50""".stripMargin,
    "q_lit_total_supplied" ->
      """WITH ranked AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS tvl,
        |    CAST(s_nationkey + 1 AS DOUBLE) AS lpn_decimals,
        |    RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate DESC) AS rank
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey)
        |SELECT CAST(sum(CAST(round(tvl / lpn_decimals, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_supplied
        |FROM ranked WHERE rank = 1""".stripMargin,
    "q_lit_profit_series" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type, value FROM events),
        |daily AS (SELECT date_trunc('day', ts) AS "time",
        |    sum(CAST(value AS DECIMAL(18,2))) AS d
        |  FROM ev WHERE event_type = 'purchase' AND value < 300 GROUP BY 1)
        |SELECT "time",
        |  CAST(d AS DOUBLE) / 1000000.0 AS daily,
        |  CAST(sum(d) OVER (ORDER BY "time"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0 AS cumulative
        |FROM daily""".stripMargin
  )
}
