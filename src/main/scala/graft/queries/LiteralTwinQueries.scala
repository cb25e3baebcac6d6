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

  /** Bit-deterministic half-up round: floor(x·10ⁿ+0.5)/10ⁿ in pure double —
    * identical IEEE op sequence in Spark and DuckDB (native double ROUND
    * implementations diverge on near-tie magnitudes).
    */
  private def rnd(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10.0, n)
    floor(c * p + 0.5) / p
  }

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
    // get_all_positions, clause-for-clause (ls_state.rs:946-1083) — the
    // reference's most-executed page. Every CTE of the original appears
    // under the same name and shape: Latest_States (DISTINCT ON contract,
    // newest snapshot inside the freshness window), Repayments (5-leg sum /
    // stable decimals, grouped by contract × decimals, with the original's
    // redundant LEFT JOIN opening + INNER JOIN pool chain), Joined_States
    // (three currency_registry roles — asset / collateral / lpn — POWER(10,
    // digits) divisors, the COALESCE'd Long/Short type and the CASE'd
    // display symbol), SymbolsInUse, LongProtocols, Latest_Prices (DISTINCT
    // ON symbol over the fresh price ticks restricted to symbols in use and
    // Long protocols), and the final page with PnL, PnL%, and the two-branch
    // liquidation price.
    //
    // Role mapping (extends the file-header table): LS_State → lineitem
    // snapshots (contract = l_orderkey, ts = l_shipdate, principal =
    // l_extendedprice, amount = l_quantity, margin legs = l_discount/l_tax,
    // interest legs = l_linenumber/l_quantity), LS_Repayment → lineitem
    // R-rows, currency_registry → nation (ticker = n_nationkey,
    // decimal_digits = n_regionkey+1), MP_Asset → lineitem price ticks
    // (symbol = l_partkey%25, protocol = l_suppkey%7, price =
    // l_extendedprice), pool_config → customer (pool = c_custkey, lpn
    // symbol = c_nationkey, protocol = c_custkey%7, Long/Short/NULL from
    // c_mktsegment so both CASE branches and the COALESCE fire). Two pinned
    // deviations: NOW()-relative freshness windows become fixed cutoffs
    // (determinism), and DISTINCT ON gets the usual value-deterministic
    // tiebreak (SURVEY §7.4#5); LongProtocols is DISTINCT because customer
    // plays a 1500-row pool_config — multiplicity the 5-row original never
    // has, collapsed before the price join so the twin keeps the original's
    // join cardinality.
    "q_lit_positions" -> { (s, dir) =>
      val stateCutoff = lit("1996-01-01").cast("timestamp")
      val priceCutoff = lit("1995-06-01").cast("timestamp")
      // pool_config role
      val pc = Tables.customer(s, dir).select(
        col("c_custkey").as("pool_id"),
        when(col("c_mktsegment") === "MACHINERY", lit(null).cast("string"))
          .when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), lit("Long"))
          .otherwise(lit("Short")).as("position_type"),
        col("c_nationkey").as("lpn_symbol"),
        ((col("c_nationkey") % 4) + 1).cast("double").as("lpn_decimals"),
        ((col("c_nationkey") % 3) + 1).cast("double").as("stable_currency_decimals"),
        pmod(col("c_custkey"), lit(7)).as("protocol"),
        (col("c_acctbal") > 0).as("is_active"))
      // currency_registry role, aliased per join (asset / cltr / lpn)
      def cr(role: String) = broadcast(Tables.nation(s, dir).select(
        col("n_nationkey").cast("bigint").as(s"${role}_ticker"),
        (col("n_regionkey") + 1).cast("int").as(s"${role}_decimal_digits")))
      // LS_Opening role
      val opening = Tables.orders(s, dir).select(
        col("o_orderkey").as("ls_contract_id"),
        col("o_custkey").as("ls_address_id"),
        col("o_orderdate").as("ls_timestamp"),
        pmod(col("o_orderkey"), lit(25)).as("ls_asset_symbol"),
        pmod(col("o_custkey"), lit(25)).as("ls_cltr_symbol"),
        col("o_totalprice").as("ls_cltr_amnt_stable"),
        col("o_custkey").as("ls_loan_pool_id"))
      // Latest_States: DISTINCT ON (contract) newest snapshot in the window
      // tiebreak covers every projected measure — (orderkey, linenumber,
      // shipdate) is NOT unique in this testdata, so the pinned total order
      // extends to the payload columns (value-deterministic pick)
      val wLS = Window.partitionBy(col("st_contract_id"))
        .orderBy(col("st_timestamp").desc, col("st_line").desc,
          col("st_principal_stable").desc, col("st_amnt_stable").desc,
          col("st_prev_margin_stable").desc, col("st_current_margin_stable").desc)
      val latestStates = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > stateCutoff)
        .select(
          col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_linenumber").as("st_line"),
          col("l_extendedprice").as("st_principal_stable"),
          col("l_quantity").as("st_amnt_stable"),
          col("l_discount").as("st_prev_margin_stable"),
          col("l_tax").as("st_current_margin_stable"),
          col("l_linenumber").cast("double").as("st_prev_interest_stable"),
          col("l_quantity").as("st_current_interest_stable"))
        .withColumn("rn", row_number().over(wLS)).filter(col("rn") === 1).drop("rn")
      // Repayments: 5-leg stable sum / pool stable decimals (decimal-cast
      // per the repo's exact-sum convention, divided once per group)
      val repayments = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_contract_id"),
          (col("l_discount") + col("l_linenumber") + col("l_tax") +
            col("l_quantity") + col("l_extendedprice")).as("r_total"))
        .join(latestStates.select(col("st_contract_id")),
          col("r_contract_id") === col("st_contract_id"))
        .join(opening, col("r_contract_id") === col("ls_contract_id"), "left")
        .join(broadcast(pc), col("ls_loan_pool_id") === col("pool_id"))
        .groupBy(col("r_contract_id"), col("stable_currency_decimals"))
        .agg((sum(col("r_total").cast("decimal(18,2)")).cast("double") /
          col("stable_currency_decimals")).as("repayment_stable"))
        .select(col("r_contract_id"), col("repayment_stable"))
      // Joined_States: state ⋈ opening ⋈ pool ⋈ the three registry roles
      val posType = coalesce(col("position_type"), lit("Long"))
      val js = latestStates
        .join(opening, col("st_contract_id") === col("ls_contract_id"))
        .join(broadcast(pc), col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("asset"), col("ls_asset_symbol") === col("asset_ticker"))
        .join(cr("cltr"), col("ls_cltr_symbol") === col("cltr_ticker"))
        .join(cr("lpn"), col("lpn_symbol").cast("bigint") === col("lpn_ticker"))
        .filter(col("st_amnt_stable") > 0)
        .select(
          col("ls_timestamp").as("time"),
          col("ls_address_id").as("user_addr"),
          col("ls_contract_id").as("contract_id"),
          posType.as("position_type_eff"),
          when(posType === "Long", col("ls_asset_symbol"))
            .otherwise(col("lpn_symbol").cast("bigint")).as("symbol"),
          col("ls_asset_symbol").as("asset"),
          (col("st_principal_stable") / pow(lit(10.0), col("lpn_decimal_digits"))).as("loan"),
          (col("ls_cltr_amnt_stable") / pow(lit(10.0), col("cltr_decimal_digits"))).as("down_payment"),
          (col("st_amnt_stable") / pow(lit(10.0), col("asset_decimal_digits"))).as("lease_value"),
          ((col("st_prev_margin_stable") + col("st_current_margin_stable")) /
            col("lpn_decimals")).as("margin_interest"),
          ((col("st_prev_interest_stable") + col("st_current_interest_stable")) /
            col("lpn_decimals")).as("loan_interest"),
          ((col("st_prev_margin_stable") + col("st_prev_interest_stable") +
            col("st_current_margin_stable") + col("st_current_interest_stable") +
            col("st_principal_stable")) / col("lpn_decimals")).as("loan_token_amount"))
      // SymbolsInUse / LongProtocols / Latest_Prices
      val symbolsInUse = js.select(col("symbol").as("siu_symbol")).distinct()
      val longProtocols = pc
        .filter(col("position_type") === "Long" && col("is_active"))
        .select(col("protocol")).distinct()
      val wP = Window.partitionBy(col("mp_asset_symbol"))
        .orderBy(col("mp_ts").desc, col("mp_price").desc)
      val latestPrices = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > priceCutoff)
        .select(
          pmod(col("l_partkey"), lit(25)).as("mp_asset_symbol"),
          col("l_extendedprice").as("mp_price"),
          col("l_shipdate").as("mp_ts"),
          pmod(col("l_suppkey"), lit(7)).as("mp_protocol"))
        .join(broadcast(symbolsInUse), col("mp_asset_symbol") === col("siu_symbol"))
        .join(broadcast(longProtocols), col("mp_protocol") === col("protocol"))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
        .select(col("mp_asset_symbol"), col("mp_price").as("current_price"))
      // final page: PnL, PnL%, two-branch liquidation price
      val pnl = col("lease_value") - col("loan") - col("down_payment") -
        col("margin_interest") - col("loan_interest") -
        coalesce(col("repayment_stable"), lit(0.0))
      js.join(latestPrices, col("symbol") === col("mp_asset_symbol"), "left")
        .join(repayments, col("contract_id") === col("r_contract_id"), "left")
        .select(
          date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("date"),
          col("position_type_eff").as("type"),
          col("symbol"), col("asset"), col("contract_id"), col("user_addr"),
          col("loan"), col("down_payment"), col("lease_value"),
          pnl.as("pnl"),
          // pinned deviation: ROUND(x, n) is computed as floor(x·10ⁿ+0.5)/10ⁿ
          // in pure IEEE double — both engines evaluate it bit-identically,
          // where native double ROUND diverges on near-tie magnitudes
          rnd(pnl / col("down_payment") * 100.0, 2).as("pnl_pct"),
          col("current_price"),
          when(col("position_type_eff") === "Long",
            rnd(((col("loan") / 0.9) / col("lease_value")) * col("current_price"), 4))
            .when(col("position_type_eff") === "Short",
              rnd(col("lease_value") / (col("loan_token_amount") / 0.9), 4))
            .as("liquidation_price"))
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
    "q_lit_positions" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    c_nationkey AS lpn_symbol,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals,
        |    c_custkey % 7 AS protocol,
        |    c_acctbal > 0 AS is_active
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |opening AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_orderdate AS ls_timestamp,
        |    o_orderkey % 25 AS ls_asset_symbol,
        |    o_custkey % 25 AS ls_cltr_symbol,
        |    o_totalprice AS ls_cltr_amnt_stable,
        |    o_custkey AS ls_loan_pool_id
        |  FROM orders),
        |latest_states AS (SELECT * FROM (
        |    SELECT l_orderkey AS st_contract_id, l_shipdate AS st_timestamp,
        |      l_extendedprice AS st_principal_stable, l_quantity AS st_amnt_stable,
        |      l_discount AS st_prev_margin_stable, l_tax AS st_current_margin_stable,
        |      CAST(l_linenumber AS DOUBLE) AS st_prev_interest_stable,
        |      l_quantity AS st_current_interest_stable,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_shipdate DESC, l_linenumber DESC, l_extendedprice DESC,
        |          l_quantity DESC, l_discount DESC, l_tax DESC) AS rn
        |    FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-01-01') WHERE rn = 1),
        |repayments AS (
        |  SELECT r.r_contract_id,
        |    CAST(SUM(CAST(r.r_total AS DECIMAL(18,2))) AS DOUBLE) / pc.stable_currency_decimals
        |      AS repayment_stable
        |  FROM (SELECT l_orderkey AS r_contract_id,
        |          l_discount + l_linenumber + l_tax + l_quantity + l_extendedprice AS r_total
        |        FROM lineitem WHERE l_returnflag = 'R') r
        |  JOIN latest_states ls ON ls.st_contract_id = r.r_contract_id
        |  LEFT JOIN opening o ON o.ls_contract_id = r.r_contract_id
        |  JOIN pc ON pc.pool_id = o.ls_loan_pool_id
        |  GROUP BY r.r_contract_id, pc.stable_currency_decimals),
        |js AS (
        |  SELECT o.ls_timestamp AS "time", o.ls_address_id AS user_addr,
        |    o.ls_contract_id AS contract_id,
        |    COALESCE(pc.position_type, 'Long') AS position_type_eff,
        |    CASE WHEN COALESCE(pc.position_type, 'Long') = 'Long' THEN o.ls_asset_symbol
        |         ELSE CAST(pc.lpn_symbol AS BIGINT) END AS symbol,
        |    o.ls_asset_symbol AS asset,
        |    s.st_principal_stable / POWER(10, cr_lpn.decimal_digits) AS loan,
        |    o.ls_cltr_amnt_stable / POWER(10, cr_cltr.decimal_digits) AS down_payment,
        |    s.st_amnt_stable / POWER(10, cr_asset.decimal_digits) AS lease_value,
        |    (s.st_prev_margin_stable + s.st_current_margin_stable) / pc.lpn_decimals AS margin_interest,
        |    (s.st_prev_interest_stable + s.st_current_interest_stable) / pc.lpn_decimals AS loan_interest,
        |    (s.st_prev_margin_stable + s.st_prev_interest_stable + s.st_current_margin_stable
        |     + s.st_current_interest_stable + s.st_principal_stable) / pc.lpn_decimals AS loan_token_amount
        |  FROM latest_states s
        |  JOIN opening o ON s.st_contract_id = o.ls_contract_id
        |  JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |  JOIN cr cr_asset ON cr_asset.ticker = o.ls_asset_symbol
        |  JOIN cr cr_cltr ON cr_cltr.ticker = o.ls_cltr_symbol
        |  JOIN cr cr_lpn ON cr_lpn.ticker = CAST(pc.lpn_symbol AS BIGINT)
        |  WHERE s.st_amnt_stable > 0),
        |siu AS (SELECT DISTINCT symbol AS siu_symbol FROM js),
        |long_protocols AS (SELECT DISTINCT protocol FROM pc
        |  WHERE position_type = 'Long' AND is_active),
        |latest_prices AS (SELECT mp_asset_symbol, mp_price AS current_price FROM (
        |    SELECT a.mp_asset_symbol, a.mp_price,
        |      row_number() OVER (PARTITION BY a.mp_asset_symbol
        |        ORDER BY a.mp_ts DESC, a.mp_price DESC) AS rn
        |    FROM (SELECT l_partkey % 25 AS mp_asset_symbol, l_extendedprice AS mp_price,
        |            l_shipdate AS mp_ts, l_suppkey % 7 AS mp_protocol
        |          FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-06-01') a
        |    JOIN siu ON a.mp_asset_symbol = siu.siu_symbol
        |    JOIN long_protocols lp ON a.mp_protocol = lp.protocol) WHERE rn = 1)
        |SELECT strftime(js."time", '%Y-%m-%dT%H:%M:%SZ') AS "date",
        |  js.position_type_eff AS "type",
        |  js.symbol, js.asset, js.contract_id, js.user_addr,
        |  js.loan, js.down_payment, js.lease_value,
        |  js.lease_value - js.loan - js.down_payment - js.margin_interest - js.loan_interest
        |    - COALESCE(rp.repayment_stable, 0) AS pnl,
        |  floor((js.lease_value - js.loan - js.down_payment - js.margin_interest
        |    - js.loan_interest - COALESCE(rp.repayment_stable, 0)) / js.down_payment * 100.0
        |    * 100.0 + 0.5) / 100.0 AS pnl_pct,
        |  p.current_price,
        |  CASE WHEN js.position_type_eff = 'Long'
        |         THEN floor(((js.loan / 0.9) / js.lease_value) * p.current_price
        |                    * 10000.0 + 0.5) / 10000.0
        |       WHEN js.position_type_eff = 'Short'
        |         THEN floor(js.lease_value / (js.loan_token_amount / 0.9)
        |                    * 10000.0 + 0.5) / 10000.0
        |  END AS liquidation_price
        |FROM js
        |LEFT JOIN latest_prices p ON js.symbol = p.mp_asset_symbol
        |LEFT JOIN repayments rp ON js.contract_id = rp.r_contract_id""".stripMargin,
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
