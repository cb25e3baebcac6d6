package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ops
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
    * implementations diverge on near-tie magnitudes). After the r6 purge the
    * ONLY remaining call sites are true ratios (pnl%, liquidation price,
    * bucket percent — quotients with data-dependent denominators that no
    * finite decimal can represent) and the POWER(·,365) daily-compounding
    * legs (transcendental — libm-bound on both engines regardless). Every
    * divisor-normalization ("amount / 10^d", "amount / m") rounds through
    * the exact-decimal helpers below on BOTH the Spark and the oracle side.
    */
  private def rnd(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10.0, n)
    floor(c * p + 0.5) / p
  }

  /** Exact-decimal 6dp half-up round of a micro-unit (×10⁶) decimal term:
    * floor(x + 0.5) to an integer in pure decimal, scale back by the exact
    * literal 10⁻⁶. Decimal multiplies/adds are exact at these widths, so no
    * IEEE near-tie exists for a different libm/FMA build to break — the fix
    * for the r4 `q_lit_wallet_tx_volume` driver-only hash flap (exact .5
    * ties in `floor(x·1e6+0.5)` double arithmetic). floor(x+0.5) rather
    * than round(x, 0): micro terms DO land on exact .5 (scale-2 amount ×
    * 10¹ divisor), and while Spark pins decimal ROUND to HALF_UP, DuckDB's
    * decimal round tie behavior is an implementation detail that has
    * changed across releases — decimal floor is truncation toward −∞ in
    * every version of both engines (amounts here are positive, so
    * floor(x+0.5) IS half-up).
    */
  private[graft] def microRound6(micro: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (floor(micro + lit(new java.math.BigDecimal("0.5")).cast("decimal(1,1)"))
      .cast("decimal(20,0)") *
      lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)"))
      .cast("decimal(28,6)")

  /** 10^(6−d) as an exact decimal (d ∈ 1..5 on this schema): turns the
    * reference's `amount / POWER(10, decimal_digits)` into a micro-unit
    * multiply with no division.
    */
  private[graft] def pow10micro(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pow(lit(10.0), lit(6) - d).cast("decimal(6,0)")

  /** 10⁶/m as an exact-width decimal for the small-integer pool divisor
    * m ∈ 1..4 — the VERDICT-prescribed "exact DECIMAL reciprocal". 10⁶/3 is
    * non-terminating, so that one entry is the scale-6 truncation
    * 333333.333333; both engines consume the identical literal, so results
    * still agree bit-for-bit (the ≤2·10⁻⁷ USDC deviation from the true
    * quotient is a pinned semantic of the twin, recorded in PLANS.md).
    */
  private[graft] def microRecip(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def d(sv: String) = lit(new java.math.BigDecimal(sv)).cast("decimal(13,6)")
    when(m === 1, d("1000000.000000"))
      .when(m === 2, d("500000.000000"))
      .when(m === 3, d("333333.333333"))
      .when(m === 4, d("250000.000000"))
      .otherwise(lit(null).cast("decimal(13,6)"))   // = the NULLIF(m, 0) guard
  }

  /** 10⁻ᵈ (d ∈ 1..5) as an exact scale-8 decimal: turns the reference's
    * `amount / POWER(10, d)` pinned to ::numeric(38,8) into one exact
    * multiply. Amounts are 2dp, so the product's true scale is 2+d ≤ 7 and
    * the final (20,8) cast is lossless — the 8dp "round" is an identity,
    * now computed with zero double ops.
    */
  private[graft] def pow10inv8(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def l(sv: String) = lit(new java.math.BigDecimal(sv)).cast("decimal(9,8)")
    when(d === 1, l("0.10000000")).when(d === 2, l("0.01000000"))
      .when(d === 3, l("0.00100000")).when(d === 4, l("0.00010000"))
      .when(d === 5, l("0.00001000"))
      .otherwise(lit(null).cast("decimal(9,8)"))
  }

  /** Oracle-SQL twin of [[microRecip]]: 10⁶/m as the same exact decimal
    * literals, for interpolation into oracleSql entries.
    */
  private[queries] def recipSql(expr: String): String =
    s"""(CASE CAST($expr AS INT)
       |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
       |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
       |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
       |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END)""".stripMargin

  /** Oracle-SQL twin of [[microRound6]]: floor(micro + 0.5) in exact
    * decimal, scaled back by the exact 10⁻⁶ literal.
    */
  private[queries] def microSql(inner: String): String =
    s"""CAST(CAST(floor($inner
       |      + 0.5) AS DECIMAL(20,0))
       |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))""".stripMargin

  /** Export-contract shadow of a 6dp decimal money scalar: the exact
    * integer count of 10⁻⁶ units as BIGINT. Hash-safe (no decimal type in
    * the output) and magnitude-safe: exact for values up to ~9.2e12
    * stable units, far past any endpoint scalar at sf100. The (26,6)
    * operand pin keeps the ×10⁶ multiply within precision 38 under BOTH
    * engines' widening rules (Spark p+8, DuckDB p+7).
    */
  private[graft] def microUnitsLong(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.cast("decimal(26,6)") *
      lit(new java.math.BigDecimal("1000000")).cast("decimal(7,0)")).cast("long")

  /** Engine-identical DOUBLE display value, derived from the BIGINT micro
    * units rather than cast straight from the decimal: int64→double and
    * the ÷10⁶ each round once, identically, on any IEEE engine. A direct
    * decimal→double cast does NOT once the unscaled value passes 2^53 —
    * DuckDB goes int128→double then ÷10⁶ (two roundings) where Spark's
    * BigDecimal.doubleValue rounds once; observed as a 1-ulp split on the
    * tx-value/total-supplied scalars at sf0.1 (…066185 vs …066180).
    */
  private[graft] def microUnitsDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    microUnitsLong(c).cast("double") / 1000000.0

  /** Oracle-SQL twins of [[microUnitsLong]] / [[microUnitsDouble]]. */
  private[queries] def microUnitsLongSql(expr: String): String =
    s"CAST(CAST($expr AS DECIMAL(26,6)) * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)"

  private[queries] def microUnitsDoubleSql(expr: String): String =
    s"CAST(${microUnitsLongSql(expr)} AS DOUBLE) / 1000000.0"

  /** pool_config role (shared by the positions and realized-PnL twins):
    * customer plays the pool dim — Long/Short/NULL position type from the
    * market segment (so COALESCE defaults and both CASE branches fire),
    * per-pool decimal divisors from the nation key, protocol from a key
    * cohort, label (the reference's short-display symbol) from the name.
    */
  private[queries] def poolConfig(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey").as("pool_id"),
      when(col("c_mktsegment") === "MACHINERY", lit(null).cast("string"))
        .when(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), lit("Long"))
        .otherwise(lit("Short")).as("position_type"),
      col("c_nationkey").as("lpn_symbol"),
      ((col("c_nationkey") % 4) + 1).cast("double").as("lpn_decimals"),
      ((col("c_nationkey") % 3) + 1).cast("double").as("stable_currency_decimals"),
      pmod(col("c_custkey"), lit(7)).as("protocol"),
      (col("c_acctbal") > 0).as("is_active"),
      col("c_name").as("label"),
      // nullable display protocol (negative balances → NULL) so the
      // utilization twin's `protocol IS NOT NULL` guard and COALESCE fire
      when(col("c_acctbal") < 0, lit(null).cast("string"))
        .otherwise(concat(lit("proto-"), pmod(col("c_custkey"), lit(7)).cast("string")))
        .as("protocol_label"))

  /** currency_registry role, columns prefixed per join alias: nation plays
    * the registry (ticker = nation key, decimal_digits = region key + 1).
    */
  private[queries] def currencyRegistry(s: SparkSession, dir: String, role: String): DataFrame =
    broadcast(Tables.nation(s, dir).select(
      col("n_nationkey").cast("bigint").as(s"${role}_ticker"),
      (col("n_regionkey") + 1).cast("int").as(s"${role}_decimal_digits")))

  /** LS_Opening role: orders, with derived symbol keys into the registry. */
  private[queries] def lsOpening(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey").as("ls_contract_id"),
      col("o_custkey").as("ls_address_id"),
      col("o_orderdate").as("ls_timestamp"),
      pmod(col("o_orderkey"), lit(25)).as("ls_asset_symbol"),
      pmod(col("o_custkey"), lit(25)).as("ls_cltr_symbol"),
      col("o_totalprice").as("ls_cltr_amnt_stable"),
      col("o_totalprice").as("ls_loan_amnt"),
      col("o_custkey").as("ls_loan_pool_id"),
      col("o_orderpriority").as("open_tx_hash"),
      col("o_orderstatus").as("ls_status"),
      pmod(col("o_orderkey"), lit(200)).as("ls_interest"),
      // LPN leg (historically-opened twin): amount reuses the order total,
      // the per-row LPN decimals divisor derives from the contract key
      col("o_totalprice").as("ls_lpn_loan_amnt"),
      (pmod(col("o_orderkey"), lit(4)) + 1).cast("double").as("ls_lpn_decimals"))

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

  /** Shared ledger body of get_realized_pnl_by_wallet and its
    * `_with_window` variant (ls_opening.rs:1683-1793, 1795-1915): identical
    * CTE chain; the variants differ only in the openings time WHERE and the
    * page suffix.
    */
  private[queries] def realizedPnlWalletLedger(s: SparkSession, dir: String,
      timeWhere: org.apache.spark.sql.Column): DataFrame = {
      // all stable legs pinned to DECIMAL(28,6): additions then stay under
      // precision 38 on BOTH engines (DuckDB addition width is hard-capped)
      val dec0 = lit(0).cast("decimal(28,6)")
      def cr(role: String) = currencyRegistry(s, dir, role)
      val openings = lsOpening(s, dir)
        .filter(timeWhere)
        .join(broadcast(poolConfig(s, dir)), col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("wd"), col("ls_cltr_symbol") === col("wd_ticker"))
        .select(col("ls_contract_id").as("o_contract"),
          col("ls_address_id").as("user"),
          col("ls_timestamp").as("opening_date"),
          col("ls_asset_symbol").as("leased_asset"),
          col("ls_cltr_symbol").as("down_payment_asset"),
          microRound6(col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("wd_decimal_digits"))).as("down_payment_stable"),
          coalesce(col("lpn_symbol").cast("string"), lit("USDC_NOBLE")).as("lpn_symbol"))
      val openIds = openings.select(col("o_contract"))
      // no cohort semi-join here: loanClose INNER-joins openings on the
      // same key below, so a pre-filter would only recompute the openings
      // dimension chain a third time for rows the join drops anyway
      val loanClose = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("lc_contract"), col("o_orderdate").as("close_ts"))
      // Fused event scan (r8, the VERDICT r6 #7 sketch): the collect (A),
      // repay (R) and liquidation (N) legs previously each scanned
      // lineitem, semi-joined the wallet's contracts, joined the registry
      // and aggregated — 3 scans + 3 shuffle chains. One filtered scan +
      // one conditional aggregation computes all three leg families; the
      // per-(contract, symbol) partials then finish per contract in a
      // second (much smaller) aggregation. Values are bit-identical: all
      // legs are exact decimals and exact decimal addition is associative,
      // so summing per-symbol partials before the per-contract sum cannot
      // change a cell.
      //
      // Per-leg arithmetic, unchanged from the unfused form:
      //  - collects stay exact DECIMAL end-to-end (r7, VERDICT r6 #2):
      //    amounts are 2dp so sum × 10⁻ᵈ has true scale 2+d ≤ 7 and the
      //    (28,8) pin is lossless on both engines (Spark multiply (30,10),
      //    DuckDB (29,10) — both under precision 38);
      //  - repay/liq legs round per ROW (microRound6) then sum, collects
      //    sum per (contract, symbol) then round — the reference's order,
      //    preserved per leg inside the conditional aggregates.
      val flagRows = Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R", "N"))
        .select(col("l_orderkey").as("f_contract"),
          col("l_returnflag").as("f_flag"),
          pmod(col("l_partkey"), lit(25)).as("f_symbol"),
          col("l_quantity").as("f_amount"),
          col("l_extendedprice").as("f_pay"))
        .join(openIds, col("f_contract") === col("o_contract"), "left_semi")
        .join(cr("wc"), col("f_symbol") === col("wc_ticker"))
      val perSymbol = flagRows
        .groupBy(col("f_contract"), col("f_symbol"), col("wc_decimal_digits"))
        .agg(
          sum(when(col("f_flag") === "A", col("f_amount").cast("decimal(18,2)")))
            .as("a_amount_sum"),
          sum(when(col("f_flag") === "A", col("f_pay").cast("decimal(18,2)")))
            .as("a_stable_sum"),
          sum(when(col("f_flag") === "R", microRound6(col("f_pay").cast("decimal(20,2)") *
            pow10micro(col("wc_decimal_digits"))))).as("rep_part"),
          sum(when(col("f_flag") === "R", 1L).otherwise(0L)).as("rep_n"),
          sum(when(col("f_flag") === "N", microRound6(col("f_pay").cast("decimal(20,2)") *
            pow10micro(col("wc_decimal_digits"))))).as("lq_part"),
          sum(when(col("f_flag") === "N", 1L).otherwise(0L)).as("lq_n"))
        .select(col("f_contract"), col("f_symbol"),
          // a (contract, symbol) group belongs to the collect family only
          // if it has A rows — null sums keep non-A groups out, exactly as
          // the unfused per-flag scans did
          when(col("a_amount_sum").isNotNull,
            (col("a_amount_sum").cast("decimal(20,2)") *
              pow10inv8(col("wc_decimal_digits"))).cast("decimal(28,8)"))
            .as("amount_lpn_units"),
          when(col("a_stable_sum").isNotNull,
            microRound6(col("a_stable_sum").cast("decimal(20,2)") *
              pow10micro(col("wc_decimal_digits")))).as("amount_stable"),
          // the ARRAY_AGG[1] first-symbol pick (A8) must range over collect
          // symbols only; symbols are 0..24, so 1000 is a clean +∞ sentinel
          // and min_by stays deterministic (real keys are unique per group,
          // sentinel rows all carry null lpn units)
          when(col("a_amount_sum").isNotNull, col("f_symbol"))
            .otherwise(lit(1000)).as("a_symbol_key"),
          col("rep_part"), col("rep_n"), col("lq_part"), col("lq_n"))
      val perContract = perSymbol
        .groupBy(col("f_contract"))
        .agg(
          min(when(col("a_symbol_key") < 1000, col("a_symbol_key"))).as("returned_lpn"),
          min_by(col("amount_lpn_units"), col("a_symbol_key"))
            .as("returned_amount_lpn_units"),
          sum(col("amount_stable")).cast("decimal(28,6)").as("returned_amount_stable"),
          sum(col("rep_part")).cast("decimal(28,6)").as("rep_stable"),
          sum(col("rep_n")).as("rep_events"),
          sum(col("lq_part")).cast("decimal(28,6)").as("lq_stable"),
          sum(col("lq_n")).as("lq_events"))
      openings
        .join(loanClose, col("o_contract") === col("lc_contract"))
        .join(perContract, col("o_contract") === col("f_contract"), "left")
        // every money column: exact decimal arithmetic above, DOUBLE out
        // (export contract — the driver hash mangles decimal cells with
        // trailing fractional zeros / sub-1-at-scale-8, both of which this
        // ledger structurally produces: COALESCE-0 legs and (28,8) LPN units)
        .select(col("o_contract").as("contract_id"), col("user"),
          col("leased_asset"), col("down_payment_asset"), col("opening_date"),
          col("close_ts").as("close_timestamp"),
          col("down_payment_stable").cast("double").as("down_payment_stable"),
          coalesce(col("rep_stable"), dec0).cast("double")
            .as("manual_repayments_stable"),
          (col("down_payment_stable") + coalesce(col("rep_stable"), dec0))
            .cast("double").as("total_outflow_stable"),
          coalesce(col("lq_stable"), dec0).cast("double").as("liquidations_stable"),
          coalesce(col("lq_events"), lit(0L)).as("liquidation_events"),
          col("returned_lpn"),
          col("returned_amount_lpn_units").cast("double")
            .as("returned_amount_lpn_units"),
          coalesce(col("returned_amount_stable"), dec0).cast("double")
            .as("returned_amount_stable"),
          (coalesce(col("returned_amount_stable"), dec0) -
            (col("down_payment_stable") + coalesce(col("rep_stable"), dec0)))
            .cast("double").as("realized_pnl_stable"))
        .orderBy(col("close_timestamp").desc, col("contract_id").desc)
  }

  /** Shared body of get_liquidations and get_liquidations_with_window
    * (ls_liquidation.rs:100-158, 160-209): identical SELECT; the variants
    * differ only in the dynamic time WHERE on the liquidation timestamp.
    */
  private def liquidationsLedger(s: SparkSession, dir: String,
      timeWhere: org.apache.spark.sql.Column): DataFrame = {
      val liq = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "N" && timeWhere)
        .select(col("l_shipdate").as("timestamp"),
          pmod(col("l_partkey"), lit(25)).as("ticker"),
          col("l_orderkey").as("contract_id"),
          col("l_linestatus").as("transaction_type"),
          col("l_extendedprice").as("payment_stable"),
          (col("l_linestatus") === "F").as("closed_loan"),
          col("l_quantity").as("liquidation_price"))
      liq
        .join(lsOpening(s, dir), col("contract_id") === col("ls_contract_id"), "left")
        .join(currencyRegistry(s, dir, "ld"), col("ls_cltr_symbol") === col("ld_ticker"))
        .join(broadcast(poolConfig(s, dir)), col("ls_loan_pool_id") === col("pool_id"))
        .select(col("timestamp"), col("ticker"), col("contract_id"),
          col("ls_address_id").as("user"), col("transaction_type"),
          (col("payment_stable") / col("stable_currency_decimals")).as("liquidation_amount"),
          col("closed_loan"),
          (col("ls_cltr_amnt_stable") / pow(lit(10.0), col("ld_decimal_digits")))
            .as("down_payment"),
          (col("ls_loan_amnt") / col("lpn_decimals")).as("loan"),
          col("liquidation_price"))
        .orderBy(col("timestamp").desc, col("contract_id").desc,
          col("ticker").desc, col("liquidation_amount").desc)
  }

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
        // export contract, magnitude-safe form: this scalar exceeds ~1e10
        // at sf1, where its unscaled value passes 2^53 and a direct
        // decimal→double cast double-rounds on DuckDB — so emit the exact
        // BIGINT micro units plus the DOUBLE derived from them
        .agg(sum(round(col("tvl") / col("lpn_decimals"), 6).cast("decimal(28,6)"))
          .as("ts_dec"))
        .select(microUnitsLong(col("ts_dec")).as("total_supplied_micro"),
          microUnitsDouble(col("ts_dec")).as("total_supplied"))
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
      val pc = poolConfig(s, dir)
      def cr(role: String) = currencyRegistry(s, dir, role)
      val opening = lsOpening(s, dir)
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
          // rnd (floor(x·10⁴+0.5), both engines verbatim) is a DETERMINISTIC
          // function of x's bits here: at an exactly-representable half the
          // +0.5 add is exact (so both engines floor identically), and away
          // from halves the margin dwarfs the add's rounding. The r5 tie
          // probe found sub-ulp rounds at ~1e10 magnitudes — those rows'
          // only exposure is upstream divergence of x itself, the same
          // exposure as every unrounded double column on this page (green
          // under the driver/judge/local builds all rounds). The genuinely
          // flip-capable class — algebraic .5 ties from power-of-ten
          // divisors — cannot occur in these incommensurate quotients; see
          // the PLANS.md rnd audit.
          when(col("position_type_eff") === "Long",
            rnd(((col("loan") / 0.9) / col("lease_value")) * col("current_price"), 4))
            .when(col("position_type_eff") === "Short",
              rnd(col("lease_value") / (col("loan_token_amount") / 0.9), 4))
            .as("liquidation_price"))
    },
    // get_realized_pnl_data, clause-for-clause (ls_opening.rs:980-1161):
    // the wallet's accounting export. Every CTE of the original appears
    // under the same name and shape: openings (wallet filter + derived
    // pos_type with the USDC/USDC_NOBLE Short default), repayments
    // (stable-decimals sum), collects (per-registry-decimals normalized
    // sum), liqs (full liquidations), closing_ts, the three close-tx-hash
    // MAX tables, closable_positions (EXISTS collects OR EXISTS liqs —
    // composed as a semi-join on the union of both id sets), opening_rows /
    // closing_rows with the constant USDC/fee/label columns and the CONCAT'd
    // Long/Short descriptions, UNION ALL, and the 4-key final sort.
    //
    // Role mapping additions: LS_Loan_Collect → lineitem A-rows (symbol =
    // l_partkey%25), LS_Liquidation → lineitem N-rows, LS_Close_Position →
    // lineitem A-rows, loan_close = (l_linestatus = 'F'), Tx_Hash =
    // CAST(l_partkey AS STRING), LS_Loan_Closing → F-status orders (one
    // close ts per contract, as the reference assumes), the USDC/USDC_NOBLE
    // ticker set → {0, 13}. Pinned deviations: the bound $1 wallet address
    // becomes the key cohort o_custkey % 100 = 7 (a single custkey leaves
    // the page near-empty on this schema), and the collect normalization
    // sums bit-deterministic 6dp-rounded decimals (the repo's exact-sum
    // convention) instead of raw doubles.
    "q_lit_realized_pnl" -> { (s, dir) =>
      val usdcSet = Seq(0L, 13L)
      val pcDf = poolConfig(s, dir)
      def cr(role: String) = currencyRegistry(s, dir, role)
      // openings: wallet cohort + pool join + derived pos_type/short_symbol
      val openings = lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .join(broadcast(pcDf), col("ls_loan_pool_id") === col("pool_id"))
        .select(col("ls_contract_id"), col("ls_timestamp"), col("ls_asset_symbol"),
          col("ls_loan_amnt"), col("ls_cltr_symbol"), col("ls_cltr_amnt_stable"),
          col("open_tx_hash"),
          coalesce(col("position_type"),
            when(col("ls_asset_symbol").isin(usdcSet: _*), lit("Short"))
              .otherwise(lit("Long"))).as("pos_type"),
          col("label").as("short_symbol"),
          col("stable_currency_decimals"))
        .localCheckpoint()
      val openIds = openings.select(col("ls_contract_id"))
      // ONE lineitem scan (the r8 wallet-ledger fusion shape): all six
      // per-contract legs of the original — repayments (R), collects (A),
      // liquidations (N, status F), and the three close-tx MAX tables
      // (R/A/N, status F) — are keyed by l_orderkey and cohort-restricted,
      // so one isin(R,A,N) scan + one cohort semi-join + the broadcast
      // registry join (complete dim: c_symbol ∈ 0..24 always hits, so the
      // inner join is row-preserving) + ONE conditional aggregation
      // produce every per-contract column the original computed with six
      // scans and six shuffle chains. Each conditional sum/max ranges over
      // exactly the original leg's row set, and the collect sum's exact
      // 6dp micro-decimals are multiset-order-independent — every
      // aggregate is bit-identical to the per-leg form.
      val statusF = col("status") === "F"
      val perContract = Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("R", "A", "N"))
        .select(col("l_orderkey").as("k_contract_id"),
          col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
          col("l_extendedprice").as("amt"),
          pmod(col("l_partkey"), lit(25)).as("c_symbol"),
          col("l_partkey").cast("string").as("tx"))
        .join(openIds, col("k_contract_id") === col("ls_contract_id"), "left_semi")
        .join(cr("col"), col("c_symbol") === col("col_ticker"))
        .groupBy(col("k_contract_id"))
        .agg(
          sum(when(col("flag") === "R", col("amt").cast("decimal(18,2)")))
            .as("repaid_sum"),
          sum(when(col("flag") === "A", microRound6(col("amt").cast("decimal(20,2)") *
            pow10micro(col("col_decimal_digits")))))
            .cast("double").as("total_collect_normalized"),
          max(when(col("flag") === "A", lit(1))).as("has_collect"),
          max(when(col("flag") === "N" && statusF, lit(1))).as("has_liq"),
          max(when(col("flag") === "R" && statusF, col("tx"))).as("rct_tx"),
          max(when(col("flag") === "A" && statusF, col("tx"))).as("cpt_tx"),
          max(when(col("flag") === "N" && statusF, col("tx"))).as("lqt_tx"))
      // closing timestamps: one per contract
      val closingTs = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("ct_contract_id"), col("o_orderdate").as("close_ts"))
      // closable: EXISTS collects OR EXISTS liqs, with every per-contract
      // aggregate already attached (contracts with no R/A/N rows at all
      // can't be closable, so the inner join loses nothing)
      val closable = openings
        .join(perContract, col("ls_contract_id") === col("k_contract_id"))
        .filter(col("has_collect") === 1 || col("has_liq") === 1)
        .localCheckpoint()
      val isUsdc = col("ls_asset_symbol").isin(usdcSet: _*)
      val assetStr = col("ls_asset_symbol").cast("string")
      val openingRows = closable
        .join(cr("cl2"), col("ls_cltr_symbol") === col("cl2_ticker"))
        .join(cr("as2"), col("ls_asset_symbol") === col("as2_ticker"))
        .select(
          col("ls_timestamp").as("date"),
          col("ls_contract_id").as("position_id"),
          (col("ls_cltr_amnt_stable") / pow(lit(10.0), col("cl2_decimal_digits")) +
            coalesce(col("repaid_sum").cast("double") /
              col("stable_currency_decimals"), lit(0.0))).as("sent_amount"),
          lit("USDC").as("sent_currency"),
          (col("ls_loan_amnt") / pow(lit(10.0), col("as2_decimal_digits"))).as("received_amount"),
          when(isUsdc, lit("USDC")).otherwise(assetStr).as("received_currency"),
          lit(0.0).as("fee_amount"),
          lit("USDC").as("fee_currency"),
          lit("margin trading").as("label"),
          when(col("pos_type") === "Short",
            concat(coalesce(col("short_symbol"), lit("Unknown")), lit(" short opening")))
            .otherwise(concat(assetStr, lit(" long opening"))).as("description"),
          col("open_tx_hash").as("tx_hash"))
      val closingRows = closable
        .join(closingTs, col("ls_contract_id") === col("ct_contract_id"))
        .join(cr("as3"), col("ls_asset_symbol") === col("as3_ticker"))
        .select(
          col("close_ts").as("date"),
          col("ls_contract_id").as("position_id"),
          (col("ls_loan_amnt") / pow(lit(10.0), col("as3_decimal_digits"))).as("sent_amount"),
          when(isUsdc, lit("USDC")).otherwise(assetStr).as("sent_currency"),
          coalesce(col("total_collect_normalized"), lit(0.0)).as("received_amount"),
          lit("USDC").as("received_currency"),
          lit(0.0).as("fee_amount"),
          lit("USDC").as("fee_currency"),
          lit("margin trading").as("label"),
          when(coalesce(col("total_collect_normalized"), lit(0.0)) > 0,
            when(col("pos_type") === "Short",
              concat(coalesce(col("short_symbol"), lit("Unknown")), lit(" short closing")))
              .otherwise(concat(assetStr, lit(" long closing"))))
            .otherwise(
              when(col("pos_type") === "Short",
                concat(coalesce(col("short_symbol"), lit("Unknown")), lit(" short liquidation")))
                .otherwise(concat(assetStr, lit(" long liquidation")))).as("description"),
          coalesce(col("rct_tx"), col("cpt_tx"), col("lqt_tx")).as("tx_hash"))
      openingRows.unionByName(closingRows)
        .orderBy(col("date"), col("position_id"), col("sent_currency"), col("received_currency"))
    },
    // get_total_tx_value, clause-for-clause (ls_opening.rs:686-748): five
    // normalized volume CTEs (opened leases with down-payment + loan,
    // deposits, withdrawals, market closes, repayments — each divided by its
    // own decimals source, two via NULLIF guards), UNION ALL, one scalar
    // SUM. Role additions: LP_Deposit → purchase events, LP_Withdraw →
    // signup events (pool = user id). Pinned deviation: per-row volumes are
    // 6dp-rounded (bit-deterministic rnd) and summed as exact decimals so
    // the scalar is shuffle-order-independent.
    "q_lit_total_tx_value" -> { (s, dir) =>
      val pcDf = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      // every leg rounds in exact micro-unit decimals — the events leg's
      // 1..3 divisor is provably tie-free in double too, but the twin
      // convention is zero double ops in any rounded term
      val openedLeases = lsOpening(s, dir)
        .join(pcDf, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("cl"), col("ls_cltr_symbol") === col("cl_ticker"))
        .select(microRound6(
          col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("cl_decimal_digits")) +
            col("ls_loan_amnt").cast("decimal(20,2)") *
              microRecip(col("stable_currency_decimals"))).as("volume"))
      // Scan fusion (the r8 wallet-ledger shape): the reference's four flow
      // CTEs (deposits, withdrawals, closes, repayments) pair up into two
      // scans because each pair's per-row volume formula is identical and
      // the registry dim is role-agnostic — UNION ALL of two equal-projection
      // legs ≡ one leg with an IN filter. 5 scans → 3; the scalar SUM over
      // exact decimals is multiset-order-independent, so the result is
      // bit-identical to the per-CTE form.
      val lpFlows = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "signup"))
        .join(pcDf, col("user_id") === col("pool_id"))
        .select(microRound6(col("value").cast("decimal(20,2)") *
          microRecip(nullif(col("stable_currency_decimals"), lit(0.0)))).as("volume"))
      val lsPays = Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R"))
        .join(cr("pay"), pmod(col("l_partkey"), lit(25)) === col("pay_ticker"))
        .select(microRound6(col("l_extendedprice").cast("decimal(20,2)") *
          pow10micro(col("pay_decimal_digits"))).as("volume"))
      openedLeases
        .unionByName(lpFlows)
        .unionByName(lsPays)
        // export contract, magnitude-safe form: at sf0.1 the scalar is
        // ~2.5e10, whose unscaled value (×10⁶) exceeds 2^53 — a direct
        // decimal→double cast double-rounds on DuckDB (observed …066185 vs
        // …066180 for the exact …066183), so emit BIGINT micro units plus
        // the DOUBLE derived from them
        .agg(sum(col("volume")).as("txv_dec"))
        .select(microUnitsLong(col("txv_dec")).as("tx_value_micro"),
          microUnitsDouble(col("txv_dec")).as("tx_value"))
    },
    // get_lease_history, clause-for-clause (ls_opening.rs:824-881): three
    // tagged branches (repay / market-close / liquidation) with NULL-padded
    // columns where a branch lacks them, UNION ALL, time-ascending order.
    // Role mapping: the three event tables are the R/A/N lineitem splits;
    // symbol = l_partkey%25, amount = l_extendedprice, ls_amnt legs =
    // l_suppkey%25 / l_quantity, additional (the liquidation transaction
    // type) = l_linestatus. Pinned deviation: the bound $1 contract id
    // becomes the cohort l_orderkey % 500 = 17 so the page has mass.
    "q_lit_lease_history" -> { (s, dir) =>
      def branch(flag: String, tag: String, withAmnt: Boolean, withAdd: Boolean) = {
        val base = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === flag && pmod(col("l_orderkey"), lit(500)) === 17)
        base.select(
          pmod(col("l_partkey"), lit(25)).as("symbol"),
          col("l_extendedprice").as("amount"),
          (if (withAmnt) pmod(col("l_suppkey"), lit(25))
           else lit(null).cast("bigint")).as("ls_amnt_symbol"),
          (if (withAmnt) col("l_quantity") else lit(null).cast("double")).as("ls_amnt"),
          col("l_shipdate").as("time"),
          lit(tag).as("type"),
          (if (withAdd) col("l_linestatus") else lit(null).cast("string")).as("additional"))
      }
      branch("R", "repay", withAmnt = false, withAdd = false)
        .unionByName(branch("A", "market-close", withAmnt = true, withAdd = false))
        .unionByName(branch("N", "liquidation", withAmnt = true, withAdd = true))
        .orderBy(col("time").asc)
    },
    // get_leases_monthly, clause-for-clause (ls_opening.rs:881-921): the
    // Historically_Opened_Base CTE (DISTINCT ON contract — an identity here
    // as in the reference, where LS_Opening is contract-unique; the Short
    // label CASE, LEFT-joined dims, the two decimals divisors), then
    // SUM + SUM per month, newest first. Exact-decimal sum convention as
    // above.
    "q_lit_leases_monthly" -> { (s, dir) =>
      val base = lsOpening(s, dir)
        .join(broadcast(poolConfig(s, dir)), col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(currencyRegistry(s, dir, "cl"), col("ls_cltr_symbol") === col("cl_ticker"), "left")
        .select(
          col("ls_contract_id"),
          col("ls_address_id"),
          when(col("position_type") === "Short", col("label"))
            .otherwise(col("ls_asset_symbol").cast("string")).as("leased_asset"),
          date_trunc("month", col("ls_timestamp")).as("date"),
          microRound6(col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("cl_decimal_digits"))).as("down_payment_amount"),
          microRound6(col("ls_loan_amnt").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals"))).as("loan_amount"))
      base.groupBy(col("date"))
        .agg((sum(col("down_payment_amount")) + sum(col("loan_amount")))
          .cast("double").as("amount"))
        // DuckDB date_trunc('month', ts) is a DATE — match its arrow type
        .withColumn("date", col("date").cast("date"))
        .orderBy(col("date").desc)
    },
    // get_active_states, clause-for-clause (lp_lender_state.rs:45-67):
    // deposits newer than the depositor's latest CLOSING withdrawal in that
    // pool — the correlated `ORDER BY ts DESC LIMIT 1` scalar subquery with
    // a COALESCE(to_timestamp(0)) epoch default, grouped to (address, pool).
    // The LIMIT-1-on-ts-desc subquery is value-equal to MAX(ts), so the
    // Spark side composes it as a per-key MAX + left join (J8's rewrite) —
    // same rows, no per-row subquery execution. Role mapping: LP_Deposit →
    // O-status lineitem, LP_Withdraw → F-status lineitem (deposit_close =
    // returnflag 'R'), address = l_suppkey, pool = l_partkey % 25.
    "q_lit_active_states" -> { (s, dir) =>
      val dep = Tables.lineitem(s, dir).filter(col("l_linestatus") === "O")
        .select(col("l_suppkey").as("address"), pmod(col("l_partkey"), lit(25)).as("pool"),
          col("l_shipdate").as("dep_ts"))
      val closeWd = Tables.lineitem(s, dir)
        .filter(col("l_linestatus") === "F" && col("l_returnflag") === "R")
        .select(col("l_suppkey").as("w_address"), pmod(col("l_partkey"), lit(25)).as("w_pool"),
          col("l_shipdate").as("w_ts"))
        .groupBy(col("w_address"), col("w_pool"))
        .agg(max(col("w_ts")).as("last_close_ts"))
      dep.join(closeWd,
          col("address") === col("w_address") && col("pool") === col("w_pool"), "left")
        .filter(col("dep_ts") >
          coalesce(col("last_close_ts"), lit("1970-01-01").cast("timestamp")))
        .groupBy(col("address"), col("pool")).agg(lit(1).as("__one"))
        .select(col("address"), col("pool"))
    },
    // get_current_lenders, clause-for-clause (lp_lender_state.rs:159-195):
    // the LatestAggregation MAX(ts) CTE CROSS JOINed onto the state table
    // (keep only the globally newest snapshot), pool display =
    // COALESCE(label, pool id), and the lender's join date from a DISTINCT
    // ON (address) latest-deposit subquery, LEFT JOINed. Role mapping:
    // LP_Lender_State → lineitem (lender = l_suppkey, pool = l_partkey %
    // 25, stable = l_extendedprice), LP_Deposit → purchase events.
    "q_lit_current_lenders" -> { (s, dir) =>
      val lps = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("lender"), pmod(col("l_partkey"), lit(25)).as("pool_key"),
        col("l_shipdate").as("lp_ts"), col("l_extendedprice").as("lender_stable"))
      val latestAgg = lps.agg(max(col("lp_ts")).as("max_ts"))
      val wJ = Window.partitionBy(col("d_address"))
        .orderBy(col("d_ts").desc, col("d_id").desc)
      val uniqueLpd = Tables.events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id").as("d_address"), col("ts").as("d_ts"),
          col("event_id").as("d_id"))
        .withColumn("rn", row_number().over(wJ)).filter(col("rn") === 1)
        .select(col("d_address"), col("d_ts").as("joined"))
      lps
        .join(broadcast(poolConfig(s, dir)), col("pool_key") === col("pool_id"))
        .crossJoin(broadcast(latestAgg))
        .join(uniqueLpd, col("lender") === col("d_address"), "left")
        .filter(col("lp_ts") === col("max_ts"))
        .select(col("joined"),
          coalesce(col("label"), col("pool_key").cast("string")).as("pool"),
          col("lender"),
          (col("lender_stable") / col("lpn_decimals")).as("lent_stables"))
    },
    // get_prices, clause-for-clause (mp_asset.rs:61-88): the
    // arbitrary-minute-granularity bucket — date_trunc('hour', ts) +
    // (minute ÷ g)·g minutes (the reference builds the interval by string
    // concat; the arithmetic is transliterated) — MAX(price) per bucket for
    // one (symbol, protocol) under a time cursor, newest bucket first, with
    // the reference's bound params pinned (g = 15, symbol = 7, protocol =
    // 'view', cursor = 1997-01-01). MP_Asset → events price ticks (real
    // intra-day minutes; symbol = user_id % 25, protocol = event_type).
    "q_lit_price_series" -> { (s, dir) =>
      val bucket = expr(
        "date_trunc('hour', ts) + make_interval(0, 0, 0, 0, 0, " +
          "(CAST(date_part('minute', ts) AS INT) DIV 15) * 15, 0)")
      Tables.events(s, dir)
        .filter(pmod(col("user_id"), lit(25)) === 7 &&
          col("event_type") === "view" &&
          col("ts") >= lit("1997-01-01").cast("timestamp"))
        .groupBy(bucket.as("price_ts"))
        .agg(max(col("value")).as("price_in_stable"))
        .orderBy(col("price_ts").desc)
    },
    // get_realized_pnl, clause-for-clause (ls_loan_closing.rs:229-297): the
    // wallet's total realized PnL — openings for the wallet, per-contract
    // repayment and collect sums each normalized by their OWN payment-symbol
    // registry digits (cr_pay / cr_col / cr_cltr are three registry roles),
    // position_flows restricted to CLOSED contracts (INNER JOIN the closing
    // table), and the final (SUM(received) − SUM(sent))::double scalar.
    // Role mapping as in q_lit_realized_pnl; LS_Loan_Closing → F-status
    // orders. Pinned deviations: the wallet cohort o_custkey % 100 = 7, and
    // the reference's ::numeric(38,8) scale pins become bit-deterministic
    // 8dp rounds into DECIMAL(20,8) sums — small enough that no Spark decimal
    // op overflows precision 38 (an overflow silently SHRINKS scale and
    // rounds, while DuckDB keeps full scale: the (38,8) form lost the 8th
    // decimal in the final SUM−SUM).
    "q_lit_realized_pnl_total" -> { (s, dir) =>
      def cr(role: String) = currencyRegistry(s, dir, role)
      def dec38(amt: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
        (amt.cast("decimal(20,2)") * pow10inv8(d)).cast("decimal(20,8)")
      val openings = lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .select(col("ls_contract_id"), col("ls_cltr_symbol"), col("ls_cltr_amnt_stable"))
      val openIds = openings.select(col("ls_contract_id"))
      def paySum(flag: String, role: String, out: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .select(col("l_orderkey").as(s"${out}_contract_id"),
          col("l_extendedprice").as("amt"), pmod(col("l_partkey"), lit(25)).as("sym"))
        .join(openIds, col(s"${out}_contract_id") === col("ls_contract_id"), "left_semi")
        .join(cr(role), col("sym") === col(s"${role}_ticker"))
        .groupBy(col(s"${out}_contract_id"))
        .agg(sum(dec38(col("amt"), col(s"${role}_decimal_digits")))
          .as(s"${out}_total"))
      val repayments = paySum("R", "pay", "rp")
      val collects = paySum("A", "col", "cl")
      val closing = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("ct_contract_id"))
      val flows = openings
        .join(cr("cltr"), col("ls_cltr_symbol") === col("cltr_ticker"))
        .join(repayments, col("ls_contract_id") === col("rp_contract_id"), "left")
        .join(collects, col("ls_contract_id") === col("cl_contract_id"), "left")
        .join(closing, col("ls_contract_id") === col("ct_contract_id"))
        .select(
          (dec38(col("ls_cltr_amnt_stable"), col("cltr_decimal_digits")) +
            coalesce(col("rp_total"), lit(0).cast("decimal(20,8)"))).as("sent_open_usdc"),
          coalesce(col("cl_total"), lit(0).cast("decimal(20,8)")).as("received_close_usdc"))
      flows.agg((sum(col("received_close_usdc")) - sum(col("sent_open_usdc")))
        .cast("double").as("total_realized_pnl"))
    },
    // get_all_utilization_levels, clause-for-clause (lp_pool_state.rs:
    // 430-545): the pools dashboard. All seven CTEs appear under the same
    // name and shape: the two global MAX(ts) aggregations, LatestStates
    // (DISTINCT ON pool over the snapshot at the global max, pool dim
    // INNER-joined), LatestBorrowAPR (DISTINCT ON pool over openings,
    // interest/10), PoolUtilization (borrowed/tvl with the >0 guard),
    // AvgInterestPerPool (the date- AND protocol- AND symbol-dependent
    // margin CASE ladder, principal-weighted with a NULLIF guard),
    // EarnAPRCalc, and the final page with the POWER(…, 365) daily
    // compounding, COALESCE'd display protocol, `protocol IS NOT NULL`
    // guard, and protocol sort. Role additions: LP_Pool_State → lineitem
    // ticks (pool = l_partkey % 25, tvl = extendedprice, borrowed =
    // quantity, threshold = linenumber), LS_interest = o_orderkey % 200,
    // margin constants keyed to proto-3/proto-5 and lpn symbols {3,7}/11/
    // {15,19}, the 2024-12-22 margin cutover → 1997-06-01. Pinned
    // deviations: DISTINCT ON tiebreaks carry the projected payload
    // (value-determinism), the weighted sum uses the exact-decimal
    // convention, and earn_apr is 6dp-rounded (libm POWER differs in the
    // last ulp between engines).
    "q_lit_utilization_levels" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      val lps = Tables.lineitem(s, dir).select(
        pmod(col("l_partkey"), lit(25)).as("lp_pool"),
        col("l_shipdate").as("lp_ts"),
        col("l_extendedprice").as("tvl"),
        col("l_quantity").as("borrowed_st"),
        col("l_linenumber").as("min_util"))
      val latestPoolAgg = lps.agg(max(col("lp_ts")).as("pool_max_ts"))
      val lsState = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("st_contract"), col("l_shipdate").as("st_ts"),
        col("l_extendedprice").as("st_principal"))
      val latestLsAgg = lsState.agg(max(col("st_ts")).as("ls_max_ts"))
      val wP = Window.partitionBy(col("lp_pool")).orderBy(col("lp_ts").desc,
        col("tvl").desc, col("borrowed_st").desc, col("min_util").desc)
      val latestStates = lps
        .join(pcB, col("lp_pool") === col("pool_id"))
        .crossJoin(broadcast(latestPoolAgg))
        .filter(col("lp_ts") === col("pool_max_ts"))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
        .select(col("lp_pool"), col("tvl"), col("borrowed_st"), col("min_util"),
          col("lpn_decimals"), col("protocol_label"))
      val wB = Window.partitionBy(col("ls_loan_pool_id")).orderBy(
        col("ls_timestamp").desc, col("ls_interest").desc, col("ls_contract_id").desc)
      val latestBorrowApr = lsOpening(s, dir)
        .withColumn("rn", row_number().over(wB)).filter(col("rn") === 1)
        .select(col("ls_loan_pool_id").as("ba_pool"),
          (col("ls_interest") / 10.0).as("borrow_apr"))
      val poolUtil = lps
        .crossJoin(broadcast(latestPoolAgg))
        .filter(col("lp_ts") === col("pool_max_ts"))
        .select(col("lp_pool").as("pu_pool"),
          when(col("tvl") > 0, col("borrowed_st") / col("tvl"))
            .otherwise(lit(0.0)).as("utilization_rate"))
      // margin constants as exact scale-1 decimals: the weighted term
      // (interest‰/10 − margin)·principal is then a pure decimal product
      // of true scale 3 — the reference's 6dp round is an identity on it
      def mlit(sv: String) = lit(new java.math.BigDecimal(sv)).cast("decimal(2,1)")
      val margin =
        when(col("protocol_label").isin("proto-3", "proto-5"),
          when(col("ls_timestamp") >= lit("1997-06-01").cast("timestamp"), mlit("8.0"))
            .otherwise(mlit("4.0")))
          .when(col("lpn_symbol").isin(3, 7), mlit("2.5"))
          .when(col("lpn_symbol") === 11, mlit("4.0"))
          .when(col("lpn_symbol").isin(15, 19), mlit("2.0"))
          .otherwise(mlit("4.0"))
      val avgInterest = lsState
        .crossJoin(broadcast(latestLsAgg))
        .join(lsOpening(s, dir), col("st_contract") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .filter(col("st_ts") === col("ls_max_ts"))
        .groupBy(col("ls_loan_pool_id"))
        .agg((sum(((col("ls_interest").cast("decimal(5,0)") *
            lit(new java.math.BigDecimal("0.1")).cast("decimal(2,1)") - margin) *
            col("st_principal").cast("decimal(20,2)")).cast("decimal(28,6)"))
          .cast("double") /
          nullif(sum(col("st_principal").cast("decimal(18,2)")).cast("double"), lit(0.0)))
          .as("avg_net_interest"))
        .select(col("ls_loan_pool_id").as("ai_pool"), col("avg_net_interest"))
      val earnAprCalc = poolConfig(s, dir)
        .join(avgInterest, col("pool_id") === col("ai_pool"), "left")
        .join(poolUtil, col("pool_id") === col("pu_pool"), "left")
        .select(col("pool_id").as("ea_pool"),
          (coalesce(col("avg_net_interest"), lit(0.0)) *
            coalesce(col("utilization_rate"), lit(0.0))).as("apr_simple"))
      latestStates
        .join(latestBorrowApr, col("lp_pool") === col("ba_pool"), "left")
        .join(earnAprCalc, col("lp_pool") === col("ea_pool"), "left")
        .filter(col("protocol_label").isNotNull)
        .select(
          coalesce(col("protocol_label"), col("lp_pool").cast("string")).as("protocol"),
          when(col("tvl") > 0, col("borrowed_st") / col("tvl") * 100.0)
            .otherwise(lit(0.0)).as("utilization"),
          (col("tvl") / col("lpn_decimals")).as("supplied"),
          (col("borrowed_st") / col("lpn_decimals")).as("borrowed"),
          coalesce(col("borrow_apr"), lit(0.0)).as("borrow_apr"),
          when(col("apr_simple").isNotNull && col("apr_simple") > 0,
            rnd((pow(lit(1.0) + col("apr_simple") / 100.0 / 365.0, 365) - 1.0) * 100.0, 6))
            .otherwise(lit(0.0)).as("earn_apr"),
          (col("min_util") / 10.0).as("deposit_suspension"))
        .orderBy(col("protocol"))
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
      daily.select(col("time").cast("date").as("time"),
        (col("d").cast("double") / 1000000.0).as("daily"),
        (sum(col("d")).over(w).cast("double") / 1000000.0).as("cumulative"))
    },
    // get_tx_volume, clause-for-clause (raw_message.rs:119-172): the wallet
    // volume scalar — openings CTE (both normalized legs: down payment via
    // the registry divisor, loan via the pool divisor), repayments and
    // closes CTEs each joined back to the wallet's contracts and divided by
    // their own registry divisor, UNION ALL, one SUM. Wallet cohort
    // o_custkey%100=7 as in the realized-PnL twin. Every rounded per-row
    // term is pure decimal arithmetic in MICRO-units (amount ×10^(6−d) /
    // ×(10⁶/m) via exact literals, floor(· + 0.5) half-up, ×10⁻⁶) — no double
    // anywhere in a rounded term, so the r4 driver-only near-tie hash flap
    // cannot recur; the scalar stays DECIMAL (ulp rule, see
    // q_lit_total_tx_value).
    "q_lit_wallet_tx_volume" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val openings = lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("vd"), col("ls_cltr_symbol") === col("vd_ticker"))
        .select(col("ls_contract_id"),
          (col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("vd_decimal_digits"))).as("down_payment_usdc"),
          (col("ls_loan_amnt").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals"))).as("loan_usdc"))
      val openIds = openings.select(col("ls_contract_id"))
      def legVol(flag: String, role: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .select(col("l_orderkey").as("leg_contract"), col("l_extendedprice").as("amt"),
          pmod(col("l_partkey"), lit(25)).as("leg_symbol"))
        .join(openIds, col("leg_contract") === col("ls_contract_id"), "left_semi")
        .join(cr(role), col("leg_symbol") === col(s"${role}_ticker"))
        .select(microRound6(col("amt").cast("decimal(20,2)") *
          pow10micro(col(s"${role}_decimal_digits"))).as("vol"))
      openings
        .select(microRound6(col("down_payment_usdc") + col("loan_usdc")).as("vol"))
        .unionByName(legVol("R", "vp"))
        .unionByName(legVol("A", "vc"))
        // exact decimal sum, DOUBLE out (export contract)
        .agg(sum(col("vol")).cast("double").as("tx_volume"))
    },
    // get_win_rate, clause-for-clause (raw_message.rs:174-241): the wallet
    // win-percentage scalar — openings (no dims), repayments grouped per
    // (contract, pool stable decimals), collects grouped per contract with
    // the registry divisor, the finalized CTE's pnl = COALESCE(collected,0)
    // − (down payment + COALESCE(repaid,0)) restricted to closed contracts
    // (INNER JOIN LS_Loan_Closing → F-status orders), then
    // CASE WHEN COUNT(*)=0 THEN 0 ELSE count(pnl>0)/count(*)*100. All pnl
    // terms are 6dp-rounded decimals so the sign test is exact; the final
    // ratio divides two exact counts (reference's ::float/::float order).
    "q_lit_win_rate" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val openings = lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .select(col("ls_contract_id"), col("ls_cltr_symbol"),
          col("ls_cltr_amnt_stable"), col("ls_loan_pool_id"))
      val repayments = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_contract"), col("l_extendedprice").as("pay"))
        .join(openings.select(col("ls_contract_id"), col("ls_loan_pool_id")),
          col("r_contract") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .groupBy(col("r_contract"), col("stable_currency_decimals"))
        .agg(microRound6(sum(col("pay").cast("decimal(18,2)")).cast("decimal(24,2)") *
          microRecip(col("stable_currency_decimals")))
          .as("total_repaid_usdc"))
        .select(col("r_contract"), col("total_repaid_usdc"))
      val collects = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A")
        .select(col("l_orderkey").as("c_contract"), col("l_extendedprice").as("amt"),
          pmod(col("l_partkey"), lit(25)).as("c_symbol"))
        .join(openings.select(col("ls_contract_id")),
          col("c_contract") === col("ls_contract_id"), "left_semi")
        .join(cr("wc"), col("c_symbol") === col("wc_ticker"))
        .groupBy(col("c_contract"))
        .agg(sum(microRound6(col("amt").cast("decimal(20,2)") *
          pow10micro(col("wc_decimal_digits")))).as("total_collected_usdc"))
      val closings = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("ct_contract"))
      val dec0 = lit(0).cast("decimal(28,6)")
      val finalized = openings
        .join(cr("wl"), col("ls_cltr_symbol") === col("wl_ticker"))
        .join(broadcast(repayments), col("ls_contract_id") === col("r_contract"), "left")
        .join(broadcast(collects), col("ls_contract_id") === col("c_contract"), "left")
        .join(closings, col("ls_contract_id") === col("ct_contract"), "left_semi")
        .select((coalesce(col("total_collected_usdc"), dec0) -
          (microRound6(col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("wl_decimal_digits"))) +
            coalesce(col("total_repaid_usdc"), dec0))).as("pnl"))
      finalized.agg(
        when(count(lit(1)) === 0, lit(0.0))
          .otherwise(count(when(col("pnl") > 0, 1)).cast("double") /
            count(lit(1)).cast("double") * 100.0)
          .as("win_rate"))
    },
    // get_buckets, clause-for-clause (raw_message.rs:243-350): the wallet
    // PnL%-distribution page — the same openings/repayments/collects/
    // finalized chain as the win rate, then pnl_pct = realized/sent×100
    // (NULL when sent=0), the reference's exact CASE ladder into the
    // five-row inline bucket dim (en-dash labels preserved), LEFT JOIN …
    // USING(bucket) so empty buckets render 0, CROSS JOIN of the 1-row
    // total (broadcast nested-loop, not a cartesian), and the 2dp share.
    "q_lit_pnl_buckets" -> { (s, dir) =>
      import s.implicits._
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val buckets = Seq((1, "<0"), (2, "0-50"), (3, "51–100"),
        (4, "101–300"), (5, "301+")).toDF("ord", "bucket")
      val openings = lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .select(col("ls_contract_id"), col("ls_cltr_symbol"),
          col("ls_cltr_amnt_stable"), col("ls_loan_pool_id"))
      val repayments = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_contract"), col("l_extendedprice").as("pay"))
        .join(openings.select(col("ls_contract_id"), col("ls_loan_pool_id")),
          col("r_contract") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .groupBy(col("r_contract"), col("stable_currency_decimals"))
        .agg(microRound6(sum(col("pay").cast("decimal(18,2)")).cast("decimal(24,2)") *
          microRecip(col("stable_currency_decimals")))
          .as("total_repaid_usdc"))
        .select(col("r_contract"), col("total_repaid_usdc"))
      val collects = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A")
        .select(col("l_orderkey").as("c_contract"), col("l_extendedprice").as("amt"),
          pmod(col("l_partkey"), lit(25)).as("c_symbol"))
        .join(openings.select(col("ls_contract_id")),
          col("c_contract") === col("ls_contract_id"), "left_semi")
        .join(cr("bc"), col("c_symbol") === col("bc_ticker"))
        .groupBy(col("c_contract"))
        .agg(sum(microRound6(col("amt").cast("decimal(20,2)") *
          pow10micro(col("bc_decimal_digits")))).as("total_collected_usdc"))
      val closings = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("ct_contract"))
      val dec0 = lit(0).cast("decimal(28,6)")
      val sent = microRound6(col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
        pow10micro(col("bl_decimal_digits"))) + coalesce(col("total_repaid_usdc"), dec0)
      val finalized = openings
        .join(cr("bl"), col("ls_cltr_symbol") === col("bl_ticker"))
        .join(broadcast(repayments), col("ls_contract_id") === col("r_contract"), "left")
        .join(broadcast(collects), col("ls_contract_id") === col("c_contract"), "left")
        .join(closings, col("ls_contract_id") === col("ct_contract"), "left_semi")
        .select(sent.cast("double").as("sent_usdc"),
          (coalesce(col("total_collected_usdc"), dec0) - sent)
            .cast("double").as("realized_pnl_usdc"))
      val withPct = finalized.select(
        when(col("sent_usdc") === 0, lit(null).cast("double"))
          .otherwise(col("realized_pnl_usdc") / col("sent_usdc") * 100.0).as("pnl_pct"))
      val counts = withPct.filter(col("pnl_pct").isNotNull)
        .select(
          when(col("pnl_pct") < 0, lit("<0"))
            .when(col("pnl_pct") >= 0 && col("pnl_pct") < 50, lit("0-50"))
            .when(col("pnl_pct") >= 50 && col("pnl_pct") < 100, lit("51–100"))
            .when(col("pnl_pct") >= 100 && col("pnl_pct") <= 300, lit("101–300"))
            .when(col("pnl_pct") > 300, lit("301+")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
      buckets
        .join(broadcast(counts), Seq("bucket"), "left")
        .crossJoin(broadcast(tot))
        .select(col("ord"), col("bucket"),
          coalesce(col("cnt"), lit(0L)).as("positions"),
          when(col("total") > 0,
            rnd(lit(100.0) * coalesce(col("cnt"), lit(0L)) / col("total"), 2))
            .otherwise(lit(0.0)).as("share_percent"))
        .orderBy(col("ord")).drop("ord")
    },
    // get_liquidations_with_window, clause-for-clause
    // (ls_liquidation.rs:160-209): liquidation events LEFT-joined to their
    // opening, then INNER-joined to the registry and pool dims on the
    // opening's columns — the reference's literal shape, where those inner
    // joins silently drop liquidations without an opening (quirk kept
    // as-is), the two divisor flavors (pool stable decimals for the payment,
    // POWER-of-registry for the down payment, pool lpn for the loan), a
    // months-window cutoff, newest first. LS_Liquidation → lineitem N-rows
    // (payment = l_extendedprice, liquidation price = l_quantity,
    // loan_close = l_linestatus='F').
    "q_lit_liquidations" -> { (s, dir) =>
      liquidationsLedger(s, dir,
        col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))
    },
    // get_liquidations_with_window, clause-for-clause
    // (ls_liquidation.rs:160-209): the same export with the dual time
    // cursor (months -> fixed >= cutoff per P3, from -> strict >).
    "q_lit_liquidations_window" -> { (s, dir) =>
      liquidationsLedger(s, dir,
        col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
          col("l_shipdate") > lit("1997-09-01").cast("timestamp"))
    },
    // get_historical_lenders_with_window, clause-for-clause
    // (lp_deposit.rs:138-190): the Deposit ∪ Withdraw tagged union with the
    // INNER pool_config join, per-pool divisor, COALESCE'd pool label (the
    // nullable protocol_label plays the reference's nullable pc.label), a
    // time-window cutoff, newest first. LP_Deposit → purchase events,
    // LP_Withdraw → signup events (pool = user id), as in the tx-value twin.
    "q_lit_lender_history" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      val cutoff = lit("1997-01-01").cast("timestamp")
      def flow(et: String, tag: String) = Tables.events(s, dir)
        .filter(col("event_type") === et)
        .join(pcB, col("user_id") === col("pool_id"))
        .select(lit(tag).as("transaction_type"), col("ts").as("timestamp"),
          col("user_id").as("user"),
          (col("value") / col("lpn_decimals")).as("amount"),
          coalesce(col("protocol_label"), col("pool_id").cast("string")).as("pool"))
      flow("purchase", "Deposit").unionByName(flow("signup", "Withdraw"))
        .filter(col("timestamp") > cutoff)
        .orderBy(col("timestamp").desc, col("user").desc, col("transaction_type").desc)
    },
    // get_loans_by_token, clause-for-clause (ls_state.rs:195-241): the
    // LatestAggregation global-max-snapshot CTE (1-row MAX cross-joined —
    // broadcast nested loop, not a cartesian), states at that ts INNER-join
    // their opening, LEFT-join the pool dim, the Short display symbol
    // (lpn_symbol || ' (Short)'), SUM(principal/lpn_decimals) over positive
    // loans, smallest-value-first. Per-row 6dp-round + exact-decimal sum is
    // the repo's pinned determinism deviation for double SUMs.
    "q_lit_loans_by_token" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val opened = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_extendedprice").as("st_principal_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts"))
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        .select(
          // exact micro-unit quotient (×10⁶); filter and 6dp round both
          // read this decimal, so no double leg survives
          (col("st_principal_stable").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals"))).as("loan_micro"),
          when(col("position_type") === "Short",
            concat(col("lpn_symbol").cast("string"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("asset_type"))
      opened.filter(col("loan_micro") > 0)
        .groupBy(col("asset_type"))
        .agg(sum(microRound6(col("loan_micro")))
          .cast("double").as("value"))
        .select(col("asset_type").as("symbol"), col("value"))
        .orderBy(col("value").asc)
    },
    // get_position_buckets, clause-for-clause (ls_state.rs:243-289): the
    // loan-size histogram over the latest snapshot — the reference's exact
    // BETWEEN ladder is preserved including its gaps (a loan of 1999.5
    // falls between '1-1.9k' and '2-4.9k' into the NULL category, which
    // both engines then group and report).
    "q_lit_position_buckets" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val loans = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_extendedprice").as("st_principal_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts") && col("st_principal_stable") > 0)
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        // exact micro-unit quotient; the bucket CASE compares in micro
        // units (bounds ×10⁶) so the whole ladder is decimal-exact
        .select((col("st_principal_stable").cast("decimal(20,2)") *
          microRecip(col("lpn_decimals"))).as("loan"))
      val lc = col("loan")
      val M = 1000000L
      loans.select(
          when(lc < 1000 * M, lit("0-0.999k"))
            .when(lc.between(1000 * M, 1999 * M), lit("1-1.9k"))
            .when(lc.between(2000 * M, 4999 * M), lit("2-4.9k"))
            .when(lc.between(5000 * M, 9999 * M), lit("5-9.9k"))
            .when(lc.between(10000 * M, 14999 * M), lit("10-14.9k"))
            .when(lc >= 15000 * M, lit("15k+")).as("loan_category"), lc)
        .groupBy(col("loan_category"))
        .agg(count(col("loan")).as("loan_count"),
          sum(microRound6(lc)).cast("double").as("loan_size"))
    },
    // get_lease_value_stats, clause-for-clause (ls_state.rs:761-797):
    // Latest_States DISTINCT ON (contract) restricted to the global max
    // snapshot ts — every candidate ties on ts, so the pinned total order
    // extends to the payload (the repo's DISTINCT-ON determinism
    // convention) — joined to openings and the asset registry, AVG + MAX of
    // the normalized lease value per symbol. AVG is transliterated as
    // exact-decimal SUM / COUNT (pinned deviation: native double AVG is
    // accumulation-order-dependent).
    "q_lit_lease_value_stats" -> { (s, dir) =>
      def cr(role: String) = currencyRegistry(s, dir, role)
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val wLS = Window.partitionBy(col("st_contract_id"))
        .orderBy(col("st_timestamp").desc, col("st_line").desc, col("st_amnt_stable").desc)
      val latest = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_linenumber").as("st_line"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts"))
        .withColumn("rn", row_number().over(wLS)).filter(col("rn") === 1)
      latest
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(cr("lv"), col("ls_asset_symbol") === col("lv_ticker"))
        .filter(col("st_amnt_stable") > 0)
        .select(col("ls_asset_symbol").as("asset"),
          // micro units for the exact 6dp-round sum; the max output stays a
          // unit double via ONE exact-decimal→double conversion
          (col("st_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("lv_decimal_digits"))).as("lease_micro"))
        .groupBy(col("asset"))
        .agg((sum(microRound6(col("lease_micro"))).cast("double") /
          count(lit(1)).cast("double")).as("avg_value"),
          (max(col("lease_micro")) *
            lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)"))
            .cast("double").as("max_value"))
    },
    // get_leased_assets_total, clause-for-clause (ls_opening.rs:399-447):
    // the latest-snapshot Opened CTE with both LEFT dim joins, the
    // CONCAT(label, ' (Short)') display asset, the Lease_Value_Table
    // normalization by the asset registry digits, SUM per asset, biggest
    // first.
    "q_lit_leased_assets_total" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts") && col("st_amnt_stable") > 0)
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(cr("lt"), col("ls_asset_symbol") === col("lt_ticker"), "left")
        .select(
          when(col("position_type") === "Short", concat(col("label"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("asset"),
          (col("st_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("lt_decimal_digits"))).as("lease_micro"))
        .groupBy(col("asset"))
        .agg(sum(microRound6(col("lease_micro")))
          .cast("double").as("loan"))
        .orderBy(col("loan").desc)
    },
    // get_loans_granted, clause-for-clause (ls_opening.rs:1400-1423): the
    // all-history variant — every opening joined to its pool (INNER, per the
    // reference), the same CONCAT'd Short display asset, SUM of the
    // pool-normalized loan per asset, smallest first.
    "q_lit_loans_granted" -> { (s, dir) =>
      lsOpening(s, dir)
        .join(broadcast(poolConfig(s, dir)), col("ls_loan_pool_id") === col("pool_id"))
        .select(
          when(col("position_type") === "Short", concat(col("label"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("asset"),
          (col("ls_loan_amnt").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals"))).as("granted_micro"))
        .groupBy(col("asset"))
        .agg(sum(microRound6(col("granted_micro")))
          .cast("double").as("loan"))
        .orderBy(col("loan").asc)
    },
    // get_open_positions_by_token, clause-for-clause (ls_state.rs:292-340):
    // the market-value variant of the snapshot rollup — same Opened CTE,
    // but the Short display token uses lpn_symbol (not the label) and the
    // value normalizes amnt_stable by the asset registry digits, biggest
    // market value first.
    "q_lit_open_positions_by_token" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts") && col("st_amnt_stable") > 0)
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(cr("op"), col("ls_asset_symbol") === col("op_ticker"), "left")
        .select(
          when(col("position_type") === "Short",
            concat(col("lpn_symbol").cast("string"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("token"),
          (col("st_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("op_decimal_digits"))).as("lease_micro"))
        .groupBy(col("token"))
        .agg(sum(microRound6(col("lease_micro")))
          .cast("double").as("market_value"))
        .orderBy(col("market_value").desc)
    },
    // get_historically_opened, clause-for-clause (ls_opening.rs:1424-1495):
    // the paged opening-history export — Historically_Opened_Base (DISTINCT
    // ON contract is an identity here as in the reference, where LS_Opening
    // is contract-unique) with both INNER dim joins and the Short label
    // asset, the LEFT JOIN LATERAL as-of price re-expressed as the
    // single-shuffle union+window as-of join (Ops.asOfJoin — no per-row
    // lookup; prices pre-deduped to (symbol, ts) via MAX, the pinned tie
    // deviation for the reference's arbitrary LIMIT 1 among same-ts rows),
    // the EXISTS freshness flag as a distinct-semi LEFT join, the two-branch
    // liquidation-price CASE, and the newest-first OFFSET/LIMIT page.
    // Short rows look their price up by the display LABEL (the reference's
    // label tickers don't exist in this price table either way) → NULL
    // price, NULL Long-branch liquidation price — kept as-is.
    "q_lit_historically_opened" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val freshCutoff = lit("1998-11-01").cast("timestamp")
      val base = lsOpening(s, dir)
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("ho"), col("ls_cltr_symbol") === col("ho_ticker"))
        .select(
          col("ls_contract_id").as("contract_id"),
          col("ls_address_id").as("user"),
          when(col("position_type") === "Short", col("label"))
            .otherwise(col("ls_asset_symbol").cast("string")).as("leased_asset"),
          col("ls_timestamp").as("opening_date"),
          coalesce(col("position_type"), lit("Long")).as("position_type_eff"),
          (col("ls_cltr_amnt_stable") / pow(lit(10.0), col("ho_decimal_digits")))
            .as("down_payment_amount"),
          col("ls_cltr_symbol").as("down_payment_asset"),
          (col("ls_loan_amnt") / col("lpn_decimals")).as("loan"),
          (col("ls_lpn_loan_amnt") / col("ls_lpn_decimals")).as("total_position_lpn"))
      val prices = Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).cast("string").as("mp_symbol"),
          col("l_shipdate").as("mp_ts"), col("l_extendedprice").as("mp_price"))
        .groupBy(col("mp_symbol"), col("mp_ts"))
        .agg(max(col("mp_price")).as("price"))
      val withPrice = Ops.asOfJoin(base, prices, "leased_asset", "mp_symbol",
        "opening_date", "mp_ts", Seq("price"))
      val openIds = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= freshCutoff)
        .select(col("l_orderkey").as("open_contract")).distinct()
      withPrice
        .join(openIds, col("contract_id") === col("open_contract"), "left")
        .select(
          col("contract_id"), col("user"), col("leased_asset"), col("opening_date"),
          col("position_type_eff").as("position_type"),
          col("down_payment_amount"), col("down_payment_asset"),
          col("loan"), col("total_position_lpn"), col("price"),
          col("open_contract").isNotNull.as("open"),
          when(col("position_type_eff") === "Long",
            (col("loan") / 0.9) / (col("down_payment_amount") + col("loan")) * col("price"))
            .when(col("position_type_eff") === "Short",
              (col("down_payment_amount") + col("loan")) / (col("total_position_lpn") / 0.9))
            .as("liquidation_price"))
        .orderBy(col("opening_date").desc, col("contract_id").desc)
        .offset(30).limit(60)
    },
    // get_supplied_borrowed_series, clause-for-clause
    // (lp_pool_state.rs:117-142): the main dashboard chart — one pool
    // (bound $1 → pinned pool 7), INNER dim join, dual
    // SUM(stable/lpn_decimals) per raw snapshot timestamp, newest first.
    // LP_Pool_State role as in the utilization twin (lineitem:
    // pool = l_partkey%25, tvl = l_extendedprice, borrowed = l_quantity).
    // Per-row 6dp-round + exact-decimal sum is the repo's pinned double-SUM
    // determinism convention (divisors 1..4: tie-free per the PLANS audit).
    "q_lit_supplied_borrowed" -> { (s, dir) =>
      suppliedBorrowed(s, dir, col("lp_pool") === 7)
    },
    // get_supplied_borrowed_series_total, clause-for-clause
    // (lp_pool_state.rs:144-182): the IN-list variant summing across the
    // protocol set (bound list → pinned pools 2/7/11/19).
    "q_lit_supplied_borrowed_total" -> { (s, dir) =>
      suppliedBorrowed(s, dir, col("lp_pool").isin(2, 7, 11, 19))
    },
    // get_supplied_borrowed_series_total_with_window, clause-for-clause
    // (lp_pool_state.rs:229-280): IN-list + the `?from=` incremental cursor
    // (timestamp > $from; the NOW()-months branch is the same predicate with
    // a computed cutoff — P3's parameterized-asOf convention).
    "q_lit_supplied_borrowed_window" -> { (s, dir) =>
      suppliedBorrowed(s, dir,
        col("lp_pool").isin(2, 7, 11, 19) &&
          col("lp_ts") > lit("1997-06-01").cast("timestamp"))
    },
    // get_buyback_with_window, clause-for-clause (tr_profit.rs:105-174): the
    // per-event cumulative buyback — (amnt_nls/10⁶) summed over
    // ORDER BY timestamp with the default RANGE frame (peers share the
    // cumulative), `timestamp > $from` cursor, oldest first. TR_Profit →
    // purchase events as in the profit-series twin. The /10⁶ is the exact
    // decimal 10⁻⁶ multiply (no double division); the cumulative stays
    // DECIMAL end to end and the OUTPUT is that exact decimal final-cast
    // DOUBLE (export contract — the reference API emits JSON floats; both
    // sides pin DECIMAL(38,8), so the doubles are bit-equal).
    //
    // Scale shape: this fact grows with chain history (per-EVENT rows, not
    // a per-day rollup), so the naive `SUM OVER (ORDER BY time)` — one
    // window partition holding the whole table — is the plan that dies at
    // 100×. Ops.cumSumGlobal decomposes it: per-DAY buckets each run a
    // normal partitioned RANGE-frame cumulative, and a tiny per-bucket
    // handoff aggregate supplies each bucket's exclusive prefix. Decimal
    // addition is associative, so the decomposition is value-identical to
    // the single-partition form (peers share a day by construction).
    "q_lit_buyback" -> { (s, dir) =>
      val micro = lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)")
      val base = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("ts") > lit("1997-01-01").cast("timestamp"))
        .select(col("ts").as("time"),
          (col("value").cast("decimal(18,2)") * micro).as("v"))
      Ops.cumSumGlobal(base, "time", "v", "cum", date_trunc("day", col("time")))
        .select(col("time"),
          col("cum").cast("decimal(38,8)").cast("double").as("bought_back"))
        .orderBy(col("time").asc, col("bought_back").asc)
    },
    // get_revenue, clause-for-clause (tr_profit.rs:195-209): the
    // SUM(amnt_stable)/10⁶ treasury scalar — sum first, then the exact
    // decimal 10⁻⁶ multiply; DECIMAL out (ulp rule). The outlier-guarded
    // day series over the same fact is the existing q_lit_profit_series
    // twin (tr_profit.rs:214-231 incl. the `< 10000000000` guard, R13).
    "q_lit_revenue_total" -> { (s, dir) =>
      val micro = lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)")
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        // pinned intermediate width (both sides DECIMAL(38,8); Spark's
        // multiply widening gives (36,8), DuckDB's (35,8)), then the exact
        // value final-cast DOUBLE (export contract)
        .agg((sum(col("value").cast("decimal(18,2)")) * micro)
          .cast("decimal(38,8)").cast("double").as("revenue"))
    },
    // get_pnl_over_time, clause-for-clause (ls_state.rs:537-624): the
    // hourly unrealized-PnL series for one position — every CTE of the
    // original under the same name and shape: DP_Loan_Table and
    // Lease_Value_Table (state ⋈ opening ⋈ pool ⋈ its registry role, hourly
    // DATE_TRUNC), Lease_Hours (DISTINCT hours scaffold), Normalized_
    // Repayments (5-leg sum / pool decimals, unwindowed), Repayment_Summary
    // (the scaffold LEFT-joined on rep_hour <= hour — the W6 inequality-join
    // cumulative — grouped per (hour, contract)), then DISTINCT ON (hour) of
    // the 6-term PnL expression, hour-ascending. Pinned deviations: the
    // bound contract id becomes the cohort l_orderkey % 500 = 17 (mass), the
    // NOW()-24h freshness window a fixed cutoff, and DISTINCT ON carries the
    // (contract, pnl) value-deterministic tiebreak (SURVEY §7.4#5).
    "q_lit_pnl_over_time" -> { (s, dir) =>
      val cutoff = lit("1998-06-01").cast("timestamp")
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val opening = lsOpening(s, dir)
      val states = Tables.lineitem(s, dir)
        .filter(pmod(col("l_orderkey"), lit(500)) === 17 && col("l_shipdate") >= cutoff)
        .select(col("l_orderkey").as("st_contract_id"),
          date_trunc("hour", col("l_shipdate")).as("hour"),
          col("l_extendedprice").as("st_principal_stable"),
          col("l_quantity").as("st_amnt_stable"),
          col("l_discount").as("st_prev_margin_stable"),
          col("l_tax").as("st_current_margin_stable"),
          col("l_linenumber").cast("double").as("st_prev_interest_stable"),
          col("l_quantity").as("st_current_interest_stable"))
      val dpLoan = states
        .join(opening, col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("pcl"), col("ls_cltr_symbol") === col("pcl_ticker"))
        .select(col("st_contract_id").as("dp_contract"), col("hour").as("dp_hour"),
          (col("st_principal_stable") / col("lpn_decimals")).as("loan"),
          (col("ls_cltr_amnt_stable") / pow(lit(10.0), col("pcl_decimal_digits")))
            .as("down_payment"))
      val leaseValue = states
        .join(opening, col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("pas"), col("ls_asset_symbol") === col("pas_ticker"))
        .select(col("st_contract_id").as("lv_contract"), col("hour").as("lv_hour"),
          (col("st_amnt_stable") / pow(lit(10.0), col("pas_decimal_digits")))
            .as("lease_value"),
          ((col("st_prev_margin_stable") + col("st_current_margin_stable")) /
            col("lpn_decimals")).as("margin_interest"),
          ((col("st_prev_interest_stable") + col("st_current_interest_stable")) /
            col("lpn_decimals")).as("loan_interest"))
      val leaseHours = states.select(col("hour")).distinct()
      val normRepay = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && pmod(col("l_orderkey"), lit(500)) === 17)
        .select(col("l_orderkey").as("nr_contract"),
          date_trunc("hour", col("l_shipdate")).as("rep_hour"),
          (col("l_extendedprice").cast("decimal(18,2)") +
            col("l_quantity").cast("decimal(18,2)") +
            col("l_tax").cast("decimal(18,2)") +
            col("l_linenumber").cast("decimal(18,2)") +
            col("l_discount").cast("decimal(18,2)")).as("rep_raw"))
        .join(opening, col("nr_contract") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .select(col("nr_contract"), col("rep_hour"),
          (col("rep_raw").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals"))).as("rep_micro"))
      val repaySummary = leaseHours
        .join(normRepay, col("rep_hour") <= col("hour"), "left")
        .groupBy(col("hour"), col("nr_contract"))
        .agg(sum(microRound6(col("rep_micro")))
          .cast("double").as("cumulative_repayment"))
        .select(col("hour").as("rs_hour"), col("nr_contract").as("rs_contract"),
          col("cumulative_repayment"))
      val pnl = col("lease_value") - col("loan") - col("down_payment") -
        col("margin_interest") - col("loan_interest") -
        coalesce(col("cumulative_repayment"), lit(0.0))
      val joined = leaseValue
        .join(dpLoan, col("lv_contract") === col("dp_contract") &&
          col("lv_hour") === col("dp_hour"), "left")
        .join(repaySummary, col("lv_contract") === col("rs_contract") &&
          col("lv_hour") === col("rs_hour"), "left")
        .select(col("lv_hour").as("hour"), col("lv_contract").as("contract_id"),
          pnl.as("hourly_unrealized_pnl"))
      val wH = Window.partitionBy(col("hour"))
        .orderBy(col("contract_id").asc, col("hourly_unrealized_pnl").asc)
      joined.withColumn("rn", row_number().over(wH)).filter(col("rn") === 1).drop("rn")
        .orderBy(col("hour").asc)
    },
    // get_monthly_active_wallets_with_window, clause-for-clause
    // (ls_opening.rs:1184-1262): the two owner-resolution CTEs
    // (close-position and repayment events INNER-joined to their opening for
    // the wallet), the 5-stream UNION ALL (openings ∪ deposits ∪ withdrawals
    // ∪ owned closes ∪ owned repayments), TO_CHAR month bucket,
    // COUNT(DISTINCT address), `combined_timestamp > $from` cursor, month
    // ascending. LP flows → purchase/signup events as everywhere else.
    "q_lit_monthly_active" -> { (s, dir) =>
      val from = lit("1995-01-01").cast("timestamp")
      val opening = lsOpening(s, dir)
      val ownerIdx = opening.select(col("ls_contract_id"), col("ls_address_id"))
      def ownedLeg(flag: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .select(col("l_orderkey").as("leg_contract"), col("l_shipdate").as("ts"))
        .join(ownerIdx, col("leg_contract") === col("ls_contract_id"))
        .select(col("ts"), col("ls_address_id").as("address"))
      def lpLeg(eventType: String) = Tables.events(s, dir)
        .filter(col("event_type") === eventType)
        .select(col("ts"), col("user_id").as("address"))
      val combined = opening
        .select(col("ls_timestamp").as("ts"), col("ls_address_id").as("address"))
        .unionByName(lpLeg("purchase"))
        .unionByName(lpLeg("signup"))
        .unionByName(ownedLeg("A"))
        .unionByName(ownedLeg("R"))
      combined.filter(col("ts") > from)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(countDistinct(col("address")).as("unique_addresses"))
        .orderBy(col("month").asc)
    },
    // get_daily_opened_closed (ls_opening.rs:1299-1395), clause-for-clause:
    // the four Filtered* CTEs under one shared time filter, the DateSeries
    // generate_series scaffold spanning MIN..MAX over the union of per-CTE
    // extrema, Close_Loans (close ∪ repayment ∪ liquidation), the two daily
    // LEFT-join aggregates (closed: principal / STABLE decimals via the
    // opening's pool; opened: loan / LPN decimals), and the FULL OUTER JOIN
    // day alignment with its COALESCE triple. Divisors are 1..3 / 1..4 —
    // tie-free — so the per-row 6dp-round + exact-decimal sum convention
    // applies; COALESCE(...,0) keeps empty days as exact zero on both sides.
    "q_lit_daily_open_close" -> { (s, dir) =>
      val cutoff = lit("1996-06-01").cast("timestamp")
      val pcB = broadcast(poolConfig(s, dir))
      val opening = lsOpening(s, dir).filter(col("ls_timestamp") > cutoff)
        .localCheckpoint()
      // Scan fusion (the r9 tx-value lemma): the three close legs project
      // identically, so UNION ALL of A/R/N ≡ one isin-filtered scan; and
      // min/max over the per-leg extrema union ≡ min/max over the fused
      // frame (nulls from an empty leg never win a min/max). 6 lineitem
      // scans → 1, materialized once for both consumers.
      val closeLoans = Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R", "N") && col("l_shipdate") > cutoff)
        .select(col("l_orderkey").as("cl_contract"), col("l_shipdate").as("cl_ts"),
          col("l_extendedprice").as("cl_principal"))
        .localCheckpoint()
      val extrema = closeLoans.agg(min(col("cl_ts")).as("lo"), max(col("cl_ts")).as("hi"))
        .unionByName(opening.agg(min(col("ls_timestamp")).as("lo"),
          max(col("ls_timestamp")).as("hi")))
      val dateSeries = extrema
        .agg(to_date(min(col("lo"))).as("d0"), to_date(max(col("hi"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("date"))
      val dailyClosed = dateSeries
        .join(closeLoans, to_date(col("cl_ts")) === col("date"), "left")
        .join(lsOpening(s, dir).select(col("ls_contract_id"), col("ls_loan_pool_id")),
          col("cl_contract") === col("ls_contract_id"), "left")
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        .groupBy(col("date"))
        .agg(coalesce(
          sum(microRound6(col("cl_principal").cast("decimal(20,2)") *
            microRecip(col("stable_currency_decimals")))),
          lit(0).cast("decimal(38,6)")).cast("double").as("closed_loans"))
        .select(col("date").as("closed_date"), col("closed_loans"))
      val dailyOpened = dateSeries
        .join(opening, to_date(col("ls_timestamp")) === col("date"), "left")
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"), "left")
        .groupBy(col("date"))
        .agg(coalesce(
          sum(microRound6(col("ls_loan_amnt").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals")))),
          lit(0).cast("decimal(38,6)")).cast("double").as("opened_loans"))
        .select(col("date").as("opened_date"), col("opened_loans"))
      dailyClosed
        .join(dailyOpened, col("closed_date") === col("opened_date"), "full_outer")
        .select(
          coalesce(col("closed_date"), col("opened_date")).as("date"),
          coalesce(col("closed_loans"), lit(0.0)).as("closed_loans"),
          coalesce(col("opened_loans"), lit(0.0)).as("opened_loans"))
        .orderBy(col("date").asc)
    },
    // get_earn_apr, clause-for-clause (ls_opening.rs:520-577): the
    // Latest_Aggregation MAX-ts scalar, Last_Hour_States at that ts joined
    // to openings of the bound pool (pinned pool 7), the Last_Hour_Pool_
    // State `ORDER BY ts DESC LIMIT 1` utilization scalar (borrowed /
    // NULLIF(tvl,0); LIMIT-1 ties carry the usual value-deterministic
    // tiebreak), APRCalc = (AVG(interest)/10 − 4) × utilization, and the
    // 365-day compounding POWER. Pinned deviation: the final transcendental
    // is 6dp-rounded (rnd) — Java and C pow may differ in the last ulp and
    // the reference emits a raw double.
    "q_lit_earn_apr" -> { (s, dir) =>
      val lsState = Tables.lineitem(s, dir).select(
        col("l_orderkey").as("st_contract"), col("l_shipdate").as("st_ts"))
      val maxTs = lsState.agg(max(col("st_ts")).as("max_ts"))
      val lastHourStates = lsState.crossJoin(broadcast(maxTs))
        .filter(col("st_ts") === col("max_ts"))
      val utilization = Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("lp_pool"),
          col("l_shipdate").as("lp_ts"),
          col("l_extendedprice").as("tvl"), col("l_quantity").as("borrowed_st"))
        .filter(col("lp_pool") === 7)
        .orderBy(col("lp_ts").desc, col("tvl").desc, col("borrowed_st").desc)
        .limit(1)
        .select((col("borrowed_st") / nullif(col("tvl"), lit(0.0)))
          .as("utilization_rate"))
      val aprCalc = lastHourStates
        .join(lsOpening(s, dir), col("st_contract") === col("ls_contract_id"))
        .filter(col("ls_loan_pool_id") === 7)
        .agg((avg(col("ls_interest")) / 10.0 - 4.0).as("base"))
        .crossJoin(broadcast(utilization))
        .select((col("base") * col("utilization_rate")).as("apr"))
      aprCalc.select(
        rnd((pow(lit(1.0) + col("apr") / 100.0 / 365.0, 365) - 1.0) * 100.0, 6)
          .as("percent"))
    },
    // get_current_unrealized_pnl_by_address, clause-for-clause
    // (ls_state.rs:626-704): the R10 early-filter read — Address_Contracts
    // first (wallet cohort), Latest_States DISTINCT ON (contract) restricted
    // to those contracts at the global max snapshot ts with amnt > 0,
    // Repayments (5-leg sum / stable decimals, LEFT-opening + INNER-pool as
    // written), then ONE scalar SUM of the six-term PnL over the three
    // registry roles (asset / lpn-symbol / collateral). Every rounded term
    // is exact micro-unit decimal (the /10^d legs are tie-capable — see the
    // PLANS.md rnd audit), per-row 6dp, summed exactly; scalar stays DECIMAL
    // (ulp rule). DISTINCT ON carries the payload tiebreak (all candidates
    // tie on the max ts).
    "q_lit_unrealized_pnl_addr" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val opening = lsOpening(s, dir)
      val addrContracts = opening
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .select(col("ls_contract_id").as("ac_contract"))
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val wLS = Window.partitionBy(col("st_contract_id"))
        .orderBy(col("st_timestamp").desc, col("st_line").desc,
          col("st_principal_stable").desc, col("st_amnt_stable").desc,
          col("st_prev_margin_stable").desc, col("st_current_margin_stable").desc)
      val latestStates = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_linenumber").as("st_line"),
          col("l_extendedprice").as("st_principal_stable"),
          col("l_quantity").as("st_amnt_stable"),
          col("l_discount").as("st_prev_margin_stable"),
          col("l_tax").as("st_current_margin_stable"),
          col("l_linenumber").cast("double").as("st_prev_interest_stable"),
          col("l_quantity").as("st_current_interest_stable"))
        .join(addrContracts, col("st_contract_id") === col("ac_contract"), "left_semi")
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts") && col("st_amnt_stable") > 0)
        .withColumn("rn", row_number().over(wLS)).filter(col("rn") === 1).drop("rn")
      val repayments = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_contract"),
          (col("l_discount") + col("l_linenumber") + col("l_tax") +
            col("l_quantity") + col("l_extendedprice")).as("r_total"))
        .join(addrContracts, col("r_contract") === col("ac_contract"), "left_semi")
        .join(opening.select(col("ls_contract_id"), col("ls_loan_pool_id")),
          col("r_contract") === col("ls_contract_id"), "left")
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .groupBy(col("r_contract"), col("stable_currency_decimals"))
        .agg((sum(col("r_total").cast("decimal(18,2)")).cast("decimal(20,2)") *
          microRecip(col("stable_currency_decimals"))).as("total_repayment_micro"))
        .select(col("r_contract"), col("total_repayment_micro"))
      val pnlMicro =
        col("st_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("pa_decimal_digits")) -
        col("st_principal_stable").cast("decimal(20,2)") *
          pow10micro(col("pl_decimal_digits")) -
        col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("pcr_decimal_digits")) -
        (col("st_prev_margin_stable") + col("st_current_margin_stable"))
          .cast("decimal(20,2)") * microRecip(col("lpn_decimals")) -
        (col("st_prev_interest_stable") + col("st_current_interest_stable"))
          .cast("decimal(20,2)") * microRecip(col("lpn_decimals")) -
        coalesce(col("total_repayment_micro"), lit(0).cast("decimal(34,8)"))
      latestStates
        .join(opening, col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("pa"), col("ls_asset_symbol") === col("pa_ticker"))
        .join(cr("pcr"), col("ls_cltr_symbol") === col("pcr_ticker"))
        .join(cr("pl"), col("lpn_symbol").cast("bigint") === col("pl_ticker"))
        .join(repayments, col("st_contract_id") === col("r_contract"), "left")
        .agg(sum(microRound6(pnlMicro)).as("pnl_dec"))
        // export contract (can be negative; micro-BIGINT + derived DOUBLE
        // are sign-transparent)
        .select(microUnitsLong(col("pnl_dec")).as("total_pnl_micro"),
          microUnitsDouble(col("pnl_dec")).as("total_pnl"))
    },
    // get_unrealized_pnl, clause-for-clause (ls_state.rs:459-535): the
    // PLATFORM-wide scalar sibling of the by-address read above — same
    // Latest_Aggregation max-ts scalar, DISTINCT ON (contract) at that ts,
    // 5-leg Repayments rollup, six-term PnL sum over the three registry
    // roles, and the same asymmetric COALESCE (only the Repayment leg is
    // null-padded; a missing registry row still drops the contract via the
    // INNER joins). Two deliberate asymmetries vs the _addr sibling,
    // mirrored exactly from the reference SQL: (1) no Address_Contracts
    // restriction anywhere, and (2) the `LS_amnt_stable > 0` guard moves
    // OUT of Latest_States into the final Joined_States WHERE — the
    // DISTINCT ON picks per contract among ALL max-ts rows first and the
    // picked row is then guarded, so a contract whose picked row has
    // amnt = 0 drops entirely (where the _addr form would have picked its
    // next amnt>0 peer). Repayments joins Latest_States (not the wallet
    // cohort): contracts without a state at the max snapshot contribute no
    // repayment rollup.
    "q_lit_unrealized_pnl" -> { (s, dir) =>
      val pcB = broadcast(poolConfig(s, dir))
      def cr(role: String) = currencyRegistry(s, dir, role)
      val opening = lsOpening(s, dir)
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val wLS = Window.partitionBy(col("st_contract_id"))
        .orderBy(col("st_timestamp").desc, col("st_line").desc,
          col("st_principal_stable").desc, col("st_amnt_stable").desc,
          col("st_prev_margin_stable").desc, col("st_current_margin_stable").desc)
      val latestStates = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"),
          col("l_shipdate").as("st_timestamp"),
          col("l_linenumber").as("st_line"),
          col("l_extendedprice").as("st_principal_stable"),
          col("l_quantity").as("st_amnt_stable"),
          col("l_discount").as("st_prev_margin_stable"),
          col("l_tax").as("st_current_margin_stable"),
          col("l_linenumber").cast("double").as("st_prev_interest_stable"),
          col("l_quantity").as("st_current_interest_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_timestamp") === col("max_ts"))
        .withColumn("rn", row_number().over(wLS)).filter(col("rn") === 1).drop("rn")
      val repayments = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_contract"),
          (col("l_discount") + col("l_linenumber") + col("l_tax") +
            col("l_quantity") + col("l_extendedprice")).as("r_total"))
        .join(latestStates.select(col("st_contract_id").as("lsc")),
          col("r_contract") === col("lsc"), "left_semi")
        .join(opening.select(col("ls_contract_id"), col("ls_loan_pool_id")),
          col("r_contract") === col("ls_contract_id"), "left")
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .groupBy(col("r_contract"), col("stable_currency_decimals"))
        .agg((sum(col("r_total").cast("decimal(18,2)")).cast("decimal(20,2)") *
          microRecip(col("stable_currency_decimals"))).as("total_repayment_micro"))
        .select(col("r_contract"), col("total_repayment_micro"))
      val pnlMicro =
        col("st_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("pa_decimal_digits")) -
        col("st_principal_stable").cast("decimal(20,2)") *
          pow10micro(col("pl_decimal_digits")) -
        col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("pcr_decimal_digits")) -
        (col("st_prev_margin_stable") + col("st_current_margin_stable"))
          .cast("decimal(20,2)") * microRecip(col("lpn_decimals")) -
        (col("st_prev_interest_stable") + col("st_current_interest_stable"))
          .cast("decimal(20,2)") * microRecip(col("lpn_decimals")) -
        coalesce(col("total_repayment_micro"), lit(0).cast("decimal(34,8)"))
      latestStates
        .filter(col("st_amnt_stable") > 0)
        .join(opening, col("st_contract_id") === col("ls_contract_id"))
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("pa"), col("ls_asset_symbol") === col("pa_ticker"))
        .join(cr("pcr"), col("ls_cltr_symbol") === col("pcr_ticker"))
        .join(cr("pl"), col("lpn_symbol").cast("bigint") === col("pl_ticker"))
        .join(repayments, col("st_contract_id") === col("r_contract"), "left")
        .agg(sum(microRound6(pnlMicro)).as("pnl_dec"))
        .select(microUnitsLong(col("pnl_dec")).as("total_pnl_micro"),
          microUnitsDouble(col("pnl_dec")).as("total_pnl"))
    },
    // get_earnings, clause-for-clause (lp_pool_state.rs:312-392): the
    // lender-earnings scalar — LatestLenderState DISTINCT ON (pool) for the
    // wallet (cohort l_suppkey%100=7; payload tiebreak), Deposits and
    // Withdrawals summed per pool under the EXISTS(ts <= state ts) guard
    // (semi-join — LatestLenderState is pool-unique so no fanout), the
    // three-branch earnings CASE (Long: stable flows; Short: asset flows ×
    // the LATERAL latest Long-protocol price; ELSE 0), and the
    // SUM(GREATEST(e,0)) floor with its COALESCE-0 empty default. Lender/
    // deposit/withdraw roles as in the active-states and current-lenders
    // twins (l_linestatus O = deposit, F+R = withdraw). Earnings divisors
    // are 1..4 (tie-free) so the 6dp-round + exact-decimal sum convention
    // applies; scalar stays DECIMAL.
    "q_lit_earnings" -> { (s, dir) =>
      val pcAll = poolConfig(s, dir)
      // tiebreak covers every OUTPUT column (a residual tie is then
      // value-identical, so no lender-id tiebreak is needed — which also
      // dodges a DuckDB 1.0 wrong-result bug where a DISTINCT ON ordered by
      // a non-selected column breaks joins on the DISTINCT ON key)
      val wP = Window.partitionBy(col("ls_pool")).orderBy(col("ls_ts").desc,
        col("lender_stable").desc, col("lender_asset").desc)
      val lenderStates = Tables.lineitem(s, dir)
        .filter(pmod(col("l_suppkey"), lit(100)) === 7)
        .select(pmod(col("l_partkey"), lit(25)).as("ls_pool"),
          col("l_shipdate").as("ls_ts"),
          col("l_extendedprice").as("lender_stable"),
          col("l_quantity").as("lender_asset"))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1).drop("rn")
      val stateTs = lenderStates.select(col("ls_pool").as("g_pool"), col("ls_ts").as("g_ts"))
      // Scan fusion (the r9 tx-value lemma, conditional-agg form): the
      // deposit (status O) and withdrawal (status F + flag R) legs are
      // disjoint filters over the same cohort with identical projections
      // and the same semi-join + per-pool grouping, so one IN-style scan
      // with four conditional sums replaces two scans and two shuffle
      // chains. Each conditional sum ranges over exactly the original
      // leg's rows; a pool with only one leg gets nulls on the other —
      // the same nulls the former second left join produced.
      val flows = Tables.lineitem(s, dir)
        .filter(pmod(col("l_suppkey"), lit(100)) === 7 &&
          (col("l_linestatus") === "O" ||
            (col("l_linestatus") === "F" && col("l_returnflag") === "R")))
        .select(pmod(col("l_partkey"), lit(25)).as("f_pool"),
          col("l_shipdate").as("f_ts"),
          col("l_extendedprice").as("f_stable"), col("l_quantity").as("f_asset"),
          (col("l_linestatus") === "O").as("is_dep"))
        .join(stateTs, col("f_pool") === col("g_pool") && col("f_ts") <= col("g_ts"),
          "left_semi")
        .groupBy(col("f_pool"))
        .agg(
          sum(when(col("is_dep"), col("f_stable").cast("decimal(18,2)")))
            .cast("decimal(24,2)").as("deposited_stable"),
          sum(when(col("is_dep"), col("f_asset").cast("decimal(18,2)")))
            .cast("decimal(24,2)").as("deposited_asset"),
          sum(when(!col("is_dep"), col("f_stable").cast("decimal(18,2)")))
            .cast("decimal(24,2)").as("withdrawn_stable"),
          sum(when(!col("is_dep"), col("f_asset").cast("decimal(18,2)")))
            .cast("decimal(24,2)").as("withdrawn_asset"))
      val longProtocols = pcAll
        .filter(col("position_type") === "Long" && col("is_active"))
        .select(col("protocol").as("lp_protocol")).distinct()
      val wS = Window.partitionBy(col("mp_symbol"))
        .orderBy(col("mp_ts").desc, col("mp_price").desc)
      val latestPrices = Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("mp_symbol"),
          col("l_extendedprice").as("mp_price"), col("l_shipdate").as("mp_ts"),
          pmod(col("l_suppkey"), lit(7)).as("mp_protocol"))
        .join(broadcast(longProtocols), col("mp_protocol") === col("lp_protocol"))
        .withColumn("rn", row_number().over(wS)).filter(col("rn") === 1)
        .select(col("mp_symbol"), col("mp_price"))
      // exact micro-unit earnings (×10⁶); the Short branch multiplies the
      // asset residual by the 2dp price BEFORE the reciprocal so every
      // intermediate stays within precision 38 — exact decimal multiplies
      // commute, so the reordering vs the reference's /m·price is lossless
      val dep0 = lit(0).cast("decimal(24,2)")
      val netStable = col("lender_stable").cast("decimal(18,2)") -
        (coalesce(col("deposited_stable"), dep0) -
          coalesce(col("withdrawn_stable"), dep0))
      val netAsset = col("lender_asset").cast("decimal(18,2)") -
        (coalesce(col("deposited_asset"), dep0) -
          coalesce(col("withdrawn_asset"), dep0))
      val earnings =
        when(col("position_type") === "Long",
          (netStable.cast("decimal(24,2)") * microRecip(col("lpn_decimals")))
            .cast("decimal(36,10)"))
          .when(col("position_type") === "Short",
            ((netAsset.cast("decimal(20,2)") *
              coalesce(col("mp_price").cast("decimal(9,2)"),
                lit(0).cast("decimal(9,2)"))).cast("decimal(22,4)") *
              microRecip(col("lpn_decimals"))).cast("decimal(36,10)"))
          .otherwise(lit(0).cast("decimal(36,10)"))
      pcAll.filter(col("is_active"))
        .join(lenderStates, col("pool_id") === col("ls_pool"))
        .join(flows, col("pool_id") === col("f_pool"), "left")
        .join(latestPrices, col("lpn_symbol").cast("bigint") === col("mp_symbol") &&
          col("position_type") === "Short", "left")
        .agg(coalesce(
          sum(microRound6(greatest(earnings, lit(0).cast("decimal(36,10)")))),
          lit(0).cast("decimal(38,6)")).as("earn_dec"))
        // export contract
        .select(microUnitsLong(col("earn_dec")).as("total_earnings_micro"),
          microUnitsDouble(col("earn_dec")).as("total_earnings_in_stable"))
    },
    // get_min_max_from_range, clause-for-clause (mp_asset.rs:40-60): the
    // closed-range MIN/MAX price pair for one symbol (pinned symbol 7,
    // range [1996-01-01, 1997-01-01]). MIN/MAX of raw doubles — no sum, no
    // rounding — deterministic by construction.
    "q_lit_price_range" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("mp_symbol"),
          col("l_shipdate").as("mp_ts"), col("l_extendedprice").as("mp_price"))
        .filter(col("mp_symbol") === 7 &&
          col("mp_ts") >= lit("1996-01-01").cast("timestamp") &&
          col("mp_ts") <= lit("1997-01-01").cast("timestamp"))
        .agg(min(col("mp_price")).as("min_price"), max(col("mp_price")).as("max_price"))
    },
    // get_price (protocol variant), clause-for-clause (mp_asset.rs:89-123):
    // the newest price for (symbol, protocol) via ORDER BY ts DESC LIMIT 1
    // — pinned symbol 7 / protocol 3, with the usual value-deterministic
    // tiebreak on the payload (shipdate ties are dense).
    "q_lit_price_latest" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("mp_symbol"),
          pmod(col("l_suppkey"), lit(7)).as("mp_protocol"),
          col("l_shipdate").as("mp_ts"), col("l_extendedprice").as("mp_price"))
        .filter(col("mp_symbol") === 7 && col("mp_protocol") === 3)
        .orderBy(col("mp_ts").desc, col("mp_price").desc)
        .limit(1)
        .select(col("mp_price"))
    },
    // get_open_position_value, clause-for-clause (ls_state.rs:348-403): the
    // platform TVL-in-positions scalar — Opened (states at the global max
    // snapshot with amnt > 0, INNER opening, LEFT pool dim, LEFT asset
    // registry, the Short display-token CASE), Lease_Value_Table
    // normalizing by the asset digits, one SUM. Integer amounts / 10^d stay
    // at scale ≤ 5 (tie-free), so the 6dp-round + exact-decimal sum
    // convention applies; scalar stays DECIMAL.
    "q_lit_open_position_value" -> { (s, dir) =>
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("st_ts"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_ts") === col("max_ts") && col("st_amnt_stable") > 0)
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(broadcast(poolConfig(s, dir)),
          col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(currencyRegistry(s, dir, "ov"),
          col("ls_asset_symbol") === col("ov_ticker"), "left")
        .select(
          when(col("position_type") === "Short",
            concat(col("lpn_symbol").cast("string"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("token"),
          microRound6(col("st_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("ov_decimal_digits"))).as("lease_value"))
        // exact decimal sum, DOUBLE out (export contract)
        .agg(sum(col("lease_value")).cast("double").as("open_position_value"))
    },
    // get_open_interest, clause-for-clause (ls_state.rs:404-458): the same
    // Opened chain WITHOUT the amnt > 0 filter (the reference drops it
    // here), interest = the 4-leg margin/interest sum / 10^(asset digits).
    // 2dp legs make the quotient scale-7-capable (tie class) → exact
    // micro-unit decimals.
    "q_lit_open_interest" -> { (s, dir) =>
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("st_ts"),
          (col("l_discount") + col("l_linenumber") + col("l_tax") + col("l_quantity"))
            .as("interest"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_ts") === col("max_ts"))
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"))
        .join(broadcast(poolConfig(s, dir)),
          col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(currencyRegistry(s, dir, "oi"),
          col("ls_asset_symbol") === col("oi_ticker"), "left")
        .agg(sum(microRound6(col("interest").cast("decimal(20,2)") *
          pow10micro(col("oi_decimal_digits")))).as("oi_dec"))
        // export contract
        .select(microUnitsLong(col("oi_dec")).as("open_interest_micro"),
          microUnitsDouble(col("oi_dec")).as("open_interest"))
    },
    // get_historically_repaid, clause-for-clause (ls_repayment.rs:219-296):
    // Closed_Loans (close-position ∪ repayment with the loan_close flag and
    // each leg's own amount symbol), then RepaidLeases — openings LEFT JOIN
    // the union but INNER JOIN the amount-symbol registry (the original's
    // LEFT-then-INNER quirk, preserved: contracts with no events vanish),
    // INNER pool dim, grouped per contract with the COALESCE'd repaid sum
    // (micro-decimal: the /10^d legs are tie-capable), the A5 conditional
    // MAX close timestamp, and the yes/no closed flag.
    "q_lit_historically_repaid" -> { (s, dir) =>
      // Scan fusion (the r9 tx-value lemma): the A and R legs project
      // identically, so their UNION ALL is one isin-filtered scan.
      val closedLoans = Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_orderkey").as("cl_contract"), col("l_shipdate").as("cl_ts"),
          col("l_extendedprice").as("cl_amnt_stable"),
          (col("l_linestatus") === "F").as("cl_loan_close"),
          pmod(col("l_partkey"), lit(25)).as("cl_amount_symbol"))
      lsOpening(s, dir)
        .join(closedLoans, col("ls_contract_id") === col("cl_contract"), "left")
        .join(currencyRegistry(s, dir, "hr"),
          col("cl_amount_symbol") === col("hr_ticker"))
        .join(broadcast(poolConfig(s, dir)), col("pool_id") === col("ls_loan_pool_id"))
        .groupBy(col("ls_contract_id"), col("ls_asset_symbol"),
          col("ls_loan_amnt"), col("lpn_decimals"))
        .agg(
          coalesce(sum(microRound6(col("cl_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("hr_decimal_digits")))), lit(0).cast("decimal(38,6)"))
            .cast("double").as("total_repaid"),
          max(when(col("cl_loan_close"), col("cl_ts"))).as("close_timestamp"),
          sum(when(col("cl_loan_close"), 1).otherwise(0)).as("n_close"))
        .select(col("ls_contract_id").as("contract_id"),
          col("ls_asset_symbol").as("symbol"),
          (col("ls_loan_amnt") / col("lpn_decimals")).as("loan"),
          col("total_repaid"), col("close_timestamp"),
          when(col("n_close") > 0, lit("yes")).otherwise(lit("no")).as("loan_closed"))
    },
    // get_distributed, clause-for-clause (tr_rewards_distribution.rs:
    // 127-150): SUM(rewards amnt_nls)/10⁶ — TR_Rewards_Distribution → view
    // events; exact decimal internally, DOUBLE out (export contract).
    "q_lit_rewards_distributed" -> { (s, dir) =>
      val micro = lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)")
      Tables.events(s, dir)
        .filter(col("event_type") === "view")
        .agg((sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)") * micro)
          .cast("decimal(38,8)").cast("double").as("distributed"))
    },
    // get_borrow_apr_with_window, clause-for-clause (ls_opening.rs:337-377):
    // the APR page — interest permille / 10.0 for one pool (pinned pool 7)
    // under the `timestamp > $from` cursor, newest first. Permille/10 is
    // exact at scale 1 in double.
    "q_lit_borrow_apr" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(col("ls_loan_pool_id") === 7 &&
          col("ls_timestamp") > lit("1996-06-01").cast("timestamp"))
        .select((col("ls_interest") / 10.0).as("apr"), col("ls_timestamp"))
        .orderBy(col("ls_timestamp").desc, col("apr").desc)
        .select(col("apr"))
    },
    // get_borrow_apr_with_window, clause-for-clause (ls_opening.rs:337-377):
    // the same APR page under the DUAL dynamic cursor — the months branch
    // (NOW()-months -> fixed >= cutoff per P3) AND the from branch
    // (strict >) both present, exercising the two-condition WHERE builder.
    "q_lit_borrow_apr_window" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(col("ls_loan_pool_id") === 7 &&
          col("ls_timestamp") >= lit("1997-01-01").cast("timestamp") &&
          col("ls_timestamp") > lit("1996-06-01").cast("timestamp"))
        .select((col("ls_interest") / 10.0).as("apr"), col("ls_timestamp"))
        .orderBy(col("ls_timestamp").desc, col("apr").desc)
        .select(col("apr"))
    },
    // get_borrowed_by_protocols, clause-for-clause (ls_opening.rs:635-657):
    // one grouped query for every pool — COALESCE(SUM(loan/lpn_decimals),0)
    // per pool (divisors 1..4, tie-free → 6dp-round + exact-decimal sum).
    // Shape-covers get_borrowed / get_borrowed_total (same SELECT, WHERE =
    // one pool / none).
    "q_lit_borrowed_by_protocols" -> { (s, dir) =>
      lsOpening(s, dir)
        .join(broadcast(poolConfig(s, dir)), col("pool_id") === col("ls_loan_pool_id"))
        .groupBy(col("ls_loan_pool_id"))
        .agg(coalesce(
          sum(microRound6(col("ls_loan_amnt").cast("decimal(20,2)") *
            microRecip(col("lpn_decimals")))),
          lit(0).cast("decimal(38,6)")).cast("double").as("loan"))
        .select(col("ls_loan_pool_id").as("protocol"), col("loan"))
    },
    // get_position_value, clause-for-clause (ls_opening.rs:921-944): the
    // wallet's position-value series — states joined to the wallet's
    // openings and the asset registry, SUM(amnt/10^d) per snapshot ts inside
    // the freshness window (fixed cutoff per P3), ts ascending. Integer
    // amounts / 10^d are tie-free at 6dp.
    "q_lit_position_value" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("time"),
          col("l_quantity").as("st_amnt_stable"))
        .join(lsOpening(s, dir).filter(pmod(col("ls_address_id"), lit(100)) === 7),
          col("st_contract_id") === col("ls_contract_id"))
        .join(currencyRegistry(s, dir, "pv"), col("ls_asset_symbol") === col("pv_ticker"))
        .groupBy(col("time"))
        .agg(sum(microRound6(col("st_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("pv_decimal_digits")))).cast("double").as("amount"))
        .orderBy(col("time").asc)
    },
    // get_debt_value, clause-for-clause (ls_opening.rs:946-978): the debt
    // sibling — the 5-leg state sum / the pool's LPN decimals (1..4,
    // tie-free), same scaffold and window.
    "q_lit_debt_value" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp"))
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("time"),
          (col("l_extendedprice").cast("decimal(18,2)") +
            col("l_discount").cast("decimal(18,2)") +
            col("l_tax").cast("decimal(18,2)") +
            col("l_linenumber").cast("decimal(18,2)") +
            col("l_quantity").cast("decimal(18,2)")).as("debt"))
        .join(lsOpening(s, dir).filter(pmod(col("ls_address_id"), lit(100)) === 7),
          col("st_contract_id") === col("ls_contract_id"))
        .join(broadcast(poolConfig(s, dir)), col("pool_id") === col("ls_loan_pool_id"))
        .groupBy(col("time"))
        .agg(sum(microRound6(col("debt").cast("decimal(20,2)") *
          microRecip(col("lpn_decimals")))).cast("double").as("amount"))
        .orderBy(col("time").asc)
    },
    // get_historically_liquidated, clause-for-clause
    // (ls_liquidation.rs:228-267): openings LEFT-joined to their
    // liquidations but INNER-joined to both dims, the Short CONCAT display
    // asset, loan normalized by the pool divisor, SUM(liq amount / 10^d) per
    // (contract, asset, loan) — NULL (not zero) for never-liquidated
    // contracts, exactly as the original. The /10^d legs are tie-capable →
    // micro-decimal rounds.
    "q_lit_historically_liquidated" -> { (s, dir) =>
      val liq = Tables.lineitem(s, dir).filter(col("l_returnflag") === "N")
        .select(col("l_orderkey").as("lq_contract"),
          col("l_extendedprice").as("lq_amnt_stable"))
      lsOpening(s, dir)
        .join(liq, col("ls_contract_id") === col("lq_contract"), "left")
        .join(broadcast(poolConfig(s, dir)), col("ls_loan_pool_id") === col("pool_id"))
        .join(currencyRegistry(s, dir, "hl"), col("ls_asset_symbol") === col("hl_ticker"))
        .select(col("ls_contract_id"),
          when(col("position_type") === "Short", concat(col("label"), lit(" (Short)")))
            .otherwise(col("ls_asset_symbol").cast("string")).as("asset"),
          (col("ls_loan_amnt") / col("lpn_decimals")).as("loan"),
          microRound6(col("lq_amnt_stable").cast("decimal(20,2)") *
            pow10micro(col("hl_decimal_digits"))).as("liq_amount"))
        .groupBy(col("ls_contract_id"), col("asset"), col("loan"))
        .agg(sum(col("liq_amount")).cast("double").as("total_liquidated"))
        .select(col("ls_contract_id").as("contract_id"), col("asset"), col("loan"),
          col("total_liquidated"))
    },
    // get_realized_pnl_stats, clause-for-clause (ls_loan_closing.rs:80-105):
    // the platform realized-PnL scalar since a fixed date — closings (LS_pnl
    // = the closing amount) LEFT-joined to their opening but INNER-joined to
    // the asset registry, SUM(pnl / 10^d). Tie-capable /10^d → micro-decimal;
    // scalar stays DECIMAL.
    "q_lit_realized_pnl_stats" -> { (s, dir) =>
      val closings = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("c_contract"), col("o_totalprice").as("c_pnl"))
      closings
        .join(lsOpening(s, dir), col("c_contract") === col("ls_contract_id"), "left")
        .join(currencyRegistry(s, dir, "ps"), col("ls_asset_symbol") === col("ps_ticker"))
        .agg(sum(microRound6(col("c_pnl").cast("decimal(20,2)") *
          pow10micro(col("ps_decimal_digits")))).as("pnls_dec"))
        // export contract
        .select(microUnitsLong(col("pnls_dec")).as("total_adjusted_micro"),
          microUnitsDouble(col("pnls_dec")).as("total_adjusted_stable_amount"))
    },
    // get_first_block / get_last_block, clause-for-clause (block.rs:76-97):
    // ORDER BY id ASC/DESC LIMIT 1 over the synced-heights table (orders
    // keys play the block ids — unique, so LIMIT 1 is deterministic).
    "q_lit_first_block" -> { (s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey").as("id"))
        .orderBy(col("id").asc).limit(1)
    },
    "q_lit_last_block" -> { (s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey").as("id"))
        .orderBy(col("id").desc).limit(1)
    },
    // block.get_one, clause-for-clause (block.rs:98-109): the point SELECT
    // by primary key (bound $1 -> pinned id 77).
    "q_lit_block_one" -> { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey") === 77)
        .select(col("o_orderkey").as("id"), col("o_orderdate").as("created_at"))
    },
    // block.count, clause-for-clause (block.rs:110-120): the corpus COUNT(1).
    "q_lit_block_count" -> { (s, dir) =>
      Tables.orders(s, dir).agg(count(lit(1)).as("n_blocks"))
    },
    // block.is_synced_to_block, clause-for-clause (block.rs:122-133): the
    // SQL half of the sync check - COUNT(1) WHERE id <= $1 (pinned 750;
    // the id==count equality happens app-side in the reference).
    "q_lit_block_synced_count" -> { (s, dir) =>
      Tables.orders(s, dir).filter(col("o_orderkey") <= 750)
        .agg(count(lit(1)).as("n_synced"))
    },
    // action_history.get_last_by_type, clause-for-clause
    // (action_history.rs:26-40): newest row for one action type (ORDER BY
    // created_at DESC LIMIT 1; bound type -> pinned 'signup'). events.ts is
    // ns-precision, so created_at is second-truncated on output and the
    // sort carries the value-deterministic payload tiebreak (SURVEY S7.4#5).
    "q_lit_action_last" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .select(col("event_id").as("id"), col("event_type").as("action_type"),
          date_trunc("second", col("ts")).as("created_at"))
        .orderBy(col("created_at").desc, col("id").desc).limit(1)
    },
    // action_history.get_last_by_type_before, clause-for-clause
    // (action_history.rs:41-56): the same argmax under a created_at < $2
    // cursor (pinned 2024-01-15).
    "q_lit_action_last_before" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "signup" &&
          col("ts") < lit("2024-01-15").cast("timestamp"))
        .select(col("event_id").as("id"), col("event_type").as("action_type"),
          date_trunc("second", col("ts")).as("created_at"))
        .orderBy(col("created_at").desc, col("id").desc).limit(1)
    },
    // lp_withdraw.count_closed, clause-for-clause (lp_withdraw.rs:89-108):
    // COUNT over the half-open window with the deposit-close flag
    // (LP_Withdraw -> lineitem R-flag rows, close = linestatus F).
    "q_lit_withdraw_count_closed" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1998-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n_closed"))
    },
    // lp_withdraw.get_amnt_stable, clause-for-clause (lp_withdraw.rs:
    // 109-131): SUM(amnt_stable) over the same half-open window; exact
    // decimal out, width pinned on both sides (ulp rule).
    "q_lit_withdraw_sum" -> { (s, dir) =>
      // export contract: DOUBLE display + BIGINT cents (a 2dp sum is an
      // exact cent integer), same convention as q_lit_repayment_sums
      val cents100 = lit(new java.math.BigDecimal("100")).cast("decimal(3,0)")
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1998-01-01").cast("timestamp"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)").cast("double").as("withdrawn_stable"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * cents100)
            .cast("long")).as("withdrawn_cents"))
    },
    // lp_withdraw.get_by_tx, clause-for-clause (lp_withdraw.rs:132-145):
    // the point lookup by unique string key (Tx_Hash -> customer name).
    "q_lit_withdraw_by_tx" -> { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_name") === "Customer#000000007")
        .select(col("c_custkey").as("id"), col("c_name").as("tx_hash"),
          col("c_mktsegment").as("segment"))
    },
    // ls_close_position.get_by_contract, clause-for-clause
    // (ls_close_position.rs:89-104): every close event for one contract
    // (bound $1 -> pinned 77). Close events -> A-flag lineitem rows.
    "q_lit_close_by_contract" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "A" && col("l_orderkey") === 77)
        .select(col("l_orderkey").as("contract_id"),
          col("l_shipdate").as("close_ts"),
          col("l_extendedprice").as("amnt_stable"),
          (col("l_linestatus") === "F").as("loan_close"),
          col("l_linenumber").as("line"))
        .orderBy(col("close_ts").asc, col("line").asc, col("amnt_stable").asc)
    },
    // ls_closing.count, clause-for-clause (ls_closing.rs:57-74): COUNT(*)
    // over the closing events in a bound half-open window
    // (`LS_timestamp > $1 AND <= $2` → pinned 1996/1998, the house window).
    // Closing events → A-flag lineitem rows, LS_timestamp → l_shipdate
    // (the close_by_contract mapping). Closes the DAO read surface: this
    // and lp_pool.get_all below were the last two untwinned SELECTs.
    "q_lit_closing_count" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "A" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1998-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n_closings"))
    },
    // lp_pool.get_all, clause-for-clause (lp_pool.rs:24-29): the bare
    // `SELECT * FROM LP_Pool` dimension read. LP_Pool → the supplier dim
    // (LP_Pool_State is lineitem per supplier, so the pool registry IS the
    // supplier table): pool id = s_suppkey, symbol = the mod-25 ticker
    // space, status = the mod-2 active flag. No WHERE in the reference and
    // Vec order is heap order — the twin pins the key sort (SURVEY §7.4#5).
    "q_lit_pool_all" -> { (s, dir) =>
      Tables.supplier(s, dir)
        .select(col("s_suppkey").as("lp_pool_id"),
          pmod(col("s_suppkey"), lit(25)).as("lp_symbol"),
          pmod(col("s_suppkey"), lit(2)).cast("int").as("lp_status"))
        .orderBy(col("lp_pool_id").asc)
    },
    // ls_close_position.get_closed_by_contract, clause-for-clause
    // (ls_close_position.rs:106-119): the same point read restricted to the
    // loan-close row.
    "q_lit_closed_close_by_contract" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "A" && col("l_orderkey") === 77 &&
          col("l_linestatus") === "F")
        .select(col("l_orderkey").as("contract_id"),
          col("l_shipdate").as("close_ts"),
          col("l_extendedprice").as("amnt_stable"),
          col("l_linenumber").as("line"))
        .orderBy(col("close_ts").asc, col("line").asc, col("amnt_stable").asc)
    },
    // ls_opening.get, clause-for-clause (ls_opening.rs:579-592): the lease
    // point read — `SELECT * FROM LS_Opening WHERE LS_contract_id = $1`,
    // every column of the opening row (the handler feeds it straight to the
    // /ls-opening response). Bound id → pinned contract 77 (the close-read
    // twins' contract). Single row; the ORDER BY is vacuous but keeps the
    // output deterministic under the driver's sorted compare.
    "q_lit_lease_get" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(col("ls_contract_id") === 77)
        .orderBy(col("ls_contract_id").asc)
    },
    // ls_opening.get_leases, clause-for-clause (ls_opening.rs:659-686): the
    // IN-list batch read the position pages use to hydrate a set of
    // openings in one round trip — `WHERE LS_contract_id IN ($1..$n)`,
    // all columns. Bound list → pinned {7, 77, 777, 7777, 14777} (all
    // present from sf0.01 up — the order keys are dense 0..N).
    "q_lit_leases_in" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(col("ls_contract_id").isin(7, 77, 777, 7777, 14777))
        .orderBy(col("ls_contract_id").asc)
    },
    // ls_loan_collect.get_all, clause-for-clause (ls_loan_collect.rs:68-74):
    // `SELECT * FROM "LS_Loan_Collect"` — the backfill task's unfiltered
    // full-table read (the one remaining SELECT in the DAO layer without a
    // twin after r11). Mapping extends the event-table convention: the
    // loan-collect rows are the l_returnflag='R' AND l_linestatus='O'
    // lineitem slice (the R/A/N splits claim the repayment/close/
    // liquidation tables; linestatus picks the unclaimed quadrant),
    // contract = l_orderkey, symbol = l_partkey % 25, amount = l_quantity,
    // amount_stable = l_extendedprice. The reference emits no ORDER BY
    // (Vec order is Postgres heap order); the twin pins the full output
    // tuple as the sort so both engines page deterministically
    // (SURVEY §7.4#5).
    "q_lit_loan_collect_all" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "O")
        .select(col("l_orderkey").as("ls_contract_id"),
          pmod(col("l_partkey"), lit(25)).as("ls_symbol"),
          col("l_quantity").as("ls_amount"),
          col("l_extendedprice").as("ls_amount_stable"))
        .orderBy(col("ls_contract_id").asc, col("ls_symbol").asc,
          col("ls_amount").asc, col("ls_amount_stable").asc)
    },
    // ls_opening.get_leases_addresses, clause-for-clause
    // (ls_opening.rs:748-778): the /leases-search endpoint — the wallet's
    // contracts with an optional substring search over the contract id
    // text (`$2 IS NULL OR LS_contract_id::text ILIKE '%'||$2||'%'`),
    // newest-opening first, OFFSET/LIMIT page, contract-id column out.
    // Pins: wallet → the mod-10 = 7 address cohort (mass — the bound
    // address is an equality in the original; the cohort keeps the page
    // populated at sf0.01), search $2 → '42' (the non-null branch, the
    // endpoint's distinctive clause; the NULL branch degenerates to the
    // plain wallet page), OFFSET 5 LIMIT 20. LS_timestamp DESC carries
    // the value-deterministic contract-id tiebreak (SURVEY §7.4#5 —
    // opening dates tie within a wallet cohort).
    "q_lit_leases_search" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(10)) === 7 &&
          col("ls_contract_id").cast("string").ilike("%42%"))
        .orderBy(col("ls_timestamp").desc, col("ls_contract_id").desc)
        .offset(5).limit(20)
        .select(col("ls_contract_id"))
    },
    // protocol_registry.get_active, clause-for-clause
    // (protocol_registry.rs): the active-dim listing, name-sorted.
    "q_lit_protocol_active" -> { (s, dir) =>
      poolConfig(s, dir)
        .filter(col("is_active"))
        .select(col("label").as("protocol_name"),
          col("protocol").as("network"), col("pool_id").as("lpp_contract"))
        .orderBy(col("protocol_name").asc)
    },
    // protocol_registry.get_by_name, clause-for-clause: dim point read by
    // unique name key.
    "q_lit_protocol_by_name" -> { (s, dir) =>
      poolConfig(s, dir)
        .filter(col("label") === "Customer#000000011")
        .select(col("label").as("protocol_name"),
          col("protocol").as("network"), col("pool_id").as("lpp_contract"))
    },
    // protocol_registry.count_by_status, clause-for-clause: the
    // active/deprecated counter pair as one conditional aggregate.
    "q_lit_protocol_count_by_status" -> { (s, dir) =>
      poolConfig(s, dir).agg(
        count(when(col("is_active"), 1)).as("n_active"),
        count(when(!col("is_active"), 1)).as("n_deprecated"))
    },
    // currency_protocol.get_by_ticker, clause-for-clause
    // (currency_protocol.rs): per-protocol currency rows for one ticker,
    // protocol-sorted (nation plays the currency, region the group).
    "q_lit_currency_by_ticker" -> { (s, dir) =>
      Tables.nation(s, dir)
        .filter(col("n_nationkey") === 7)
        .select(col("n_nationkey").cast("bigint").as("ticker"),
          col("n_name").as("protocol"),
          col("n_regionkey").as("group"))
        .orderBy(col("protocol").asc)
    },
    // get_buyback_total, clause-for-clause (tr_profit.rs:176-193): the
    // SUM(amnt_nls)/10^6 treasury scalar — the NLS sibling of
    // q_lit_revenue_total (both TR_Profit columns map onto the purchase
    // value; the endpoints differ in which column they sum). Exact decimal
    // internally (width pinned on both sides), DOUBLE out (export contract).
    "q_lit_buyback_total" -> { (s, dir) =>
      val micro = lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)")
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .agg((sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)") * micro)
          .cast("decimal(38,8)").cast("double").as("bought_back_total"))
    },
    // get_incentives_pool, clause-for-clause (tr_state.rs:97-112): the
    // latest treasury snapshot's amnt/10^6 — ORDER BY ts DESC LIMIT 1 over
    // TR_State (-> click events), exact decimal multiply, value tiebreak;
    // DOUBLE out (export contract).
    "q_lit_incentives_pool" -> { (s, dir) =>
      val micro = lit(new java.math.BigDecimal("0.000001")).cast("decimal(7,6)")
      Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .select(date_trunc("second", col("ts")).as("tr_ts"),
          col("event_id"), col("value"))
        .orderBy(col("tr_ts").desc, col("event_id").desc)
        .limit(1)
        .select((col("value").cast("decimal(18,2)") * micro)
          .cast("decimal(25,8)").cast("double").as("incentives_pool"))
    },
    // raw_message.get, clause-for-clause (raw_message.rs:43-118): the
    // /api/txs wallet page with the full dynamic WHERE in its combine=true
    // branch — (from = $addr OR to = $addr) AND (type ANY($filters) OR
    // (type = MsgExecuteContract AND to ANY($earn_tos))) — newest-first
    // OFFSET/LIMIT page. Roles: from = user_id, to = event_id % 97,
    // type = event_type (earn type -> 'click'); pins: addr 7, filters
    // {purchase, signup}, earn tos {3, 5}, page OFFSET 5 LIMIT 25.
    "q_lit_txs_page" -> { (s, dir) =>
      val to = pmod(col("event_id"), lit(97))
      Tables.events(s, dir)
        .filter((col("user_id") === 7 || to === 7) &&
          (col("event_type").isin("purchase", "signup") ||
            (col("event_type") === "click" && to.isin(3, 5))))
        .select(col("event_id").as("id"), col("user_id").as("from"),
          to.as("to"), col("event_type").as("type"),
          date_trunc("second", col("ts")).as("created_at"),
          col("value"))
        .orderBy(col("created_at").desc, col("id").desc)
        .offset(5).limit(25)
    },
    // get_price_by_date (protocol variant), clause-for-clause
    // (mp_asset.rs:125-150): the first price AT-OR-AFTER a date —
    // `ts >= $3 ORDER BY ts ASC LIMIT 1` for (symbol, protocol), the
    // forward-looking sibling of the as-of join; pinned (7, 3, 1997-06-01)
    // with the value tiebreak.
    "q_lit_price_asof" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("mp_symbol"),
          pmod(col("l_suppkey"), lit(7)).as("mp_protocol"),
          col("l_shipdate").as("mp_ts"), col("l_extendedprice").as("mp_price"))
        .filter(col("mp_symbol") === 7 && col("mp_protocol") === 3 &&
          col("mp_ts") >= lit("1997-06-01").cast("timestamp"))
        .orderBy(col("mp_ts").asc, col("mp_price").asc)
        .limit(1)
        .select(col("mp_price"))
    },
    // get_total_value_locked, clause-for-clause (ls_state.rs:706-760): the
    // platform TVL scalar — Lease_Value (states at the global max snapshot,
    // LEFT opening then INNER registry — the quirk), Pool_Available
    // (DISTINCT ON pool over the IN-list pools, (tvl − borrowed) / lpn
    // decimals), and the two scalar-subquery sums added (lease sum has NO
    // COALESCE — an empty lease set yields NULL TVL, as the original).
    // Integer amounts and 1..4 divisors are tie-free → 6dp-round +
    // exact-decimal sums; scalar stays DECIMAL.
    "q_lit_tvl" -> { (s, dir) =>
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      val leaseValue = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("st_ts"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_ts") === col("max_ts"))
        .join(lsOpening(s, dir), col("st_contract_id") === col("ls_contract_id"), "left")
        .join(currencyRegistry(s, dir, "tv"), col("ls_asset_symbol") === col("tv_ticker"))
        .select(microRound6(col("st_amnt_stable").cast("decimal(20,2)") *
          pow10micro(col("tv_decimal_digits"))).as("lease_value"))
      val wP = Window.partitionBy(col("lp_pool"))
        .orderBy(col("lp_ts").desc, col("tvl").desc, col("borrowed_st").desc)
      val poolAvail = Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("lp_pool"),
          col("l_shipdate").as("lp_ts"),
          col("l_extendedprice").as("tvl"), col("l_quantity").as("borrowed_st"))
        .filter(col("lp_pool").isin(2, 7, 11, 19))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
        .join(broadcast(poolConfig(s, dir)), col("lp_pool") === col("pool_id"))
        .select(microRound6(
          (col("tvl").cast("decimal(20,2)") - col("borrowed_st").cast("decimal(20,2)")) *
            microRecip(col("lpn_decimals"))).as("available_assets"))
      val leaseSum = leaseValue.agg(sum(col("lease_value")).as("total_lease_value"))
      val availSum = poolAvail.agg(coalesce(sum(col("available_assets")),
        lit(0).cast("decimal(38,6)")).as("total_available"))
      leaseSum.crossJoin(broadcast(availSum))
        // exact decimal addition, DOUBLE out (export contract); an empty
        // lease set still yields NULL (no COALESCE — the original's quirk)
        .select((col("total_lease_value") + col("total_available"))
          .cast("double").as("tvl"))
    },
    // get_realized_pnl_by_wallet, clause-for-clause (ls_opening.rs:
    // 1683-1793): the wallet accounting page over the loan-collect path —
    // openings (1-year window → fixed cutoff) with the COALESCE'd LPN
    // display symbol, collects_by_symbol (per-symbol LPN/stable sums over
    // the registry digits), collects with the reference's ARRAY_AGG[1]
    // first-symbol pick (A8 — pinned symbol-ascending order; symbols are
    // unique per group so the pick is deterministic), loan_close, repays and
    // liqs (each a per-contract /10^d sum — micro-decimal), and the final
    // LEFT-join ledger with its COALESCE-0 columns and the
    // close-desc OFFSET 10 LIMIT 40 page (contract tiebreak). All rounded
    // legs exact-decimal; stable columns stay DECIMAL.
    "q_lit_realized_pnl_wallet" -> { (s, dir) =>
      realizedPnlWalletLedger(s, dir,
        col("ls_timestamp") >= lit("1996-01-01").cast("timestamp"))
        .offset(10).limit(40)
    },
    // get_realized_pnl_by_wallet_with_window, clause-for-clause
    // (ls_opening.rs:1795-1915): the same ledger with the dynamic dual time
    // cursor (months -> fixed >= cutoff per P3, from -> strict >) and no
    // pagination.
    "q_lit_realized_pnl_wallet_window" -> { (s, dir) =>
      realizedPnlWalletLedger(s, dir,
        col("ls_timestamp") >= lit("1996-01-01").cast("timestamp") &&
          col("ls_timestamp") > lit("1996-09-01").cast("timestamp"))
    },
    // get_sum, clause-for-clause (ls_repayment.rs:127-183): the PL_State
    // input contract — FIVE separate column SUMs over the OPEN interval
    // (> from AND < to; the openings counter below uses half-open — the
    // reference mixes them and the twins preserve each). Exact decimal sums
    // internally; the output carries each sum TWICE per the export
    // contract — as DOUBLE (display) and as a BIGINT cent count (the exact
    // integer 1e-2 units PL_State consumes: exactness is contractual here,
    // and a 2dp sum is always an exact cent integer).
    "q_lit_repayment_sums" -> { (s, dir) =>
      val cents100 = lit(new java.math.BigDecimal("100")).cast("decimal(3,0)")
      def leg(c: String, out: String) = Seq(
        sum(col(c).cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("double").as(out),
        sum((col(c).cast("decimal(18,2)") * cents100).cast("long"))
          .as(s"${out.stripSuffix("_stable")}_cents"))
      val legs =
        leg("l_discount", "prev_margin_stable") ++
          leg("l_linenumber", "prev_interest_stable") ++
          leg("l_tax", "current_margin_stable") ++
          leg("l_quantity", "current_interest_stable") ++
          leg("l_extendedprice", "principal_stable")
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .agg(legs.head, legs.tail: _*)
    },
    // count, clause-for-clause (ls_opening.rs:194-213): the per-interval
    // openings counter feeding PL_State (half-open window: > from AND <= to).
    "q_lit_opened_count" -> { (s, dir) =>
      lsOpening(s, dir)
        .filter(col("ls_timestamp") > lit("1996-01-01").cast("timestamp") &&
          col("ls_timestamp") <= lit("1998-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("opened_count"))
    }
  )

  /** Shared shape of the 4 supplied/borrowed endpoints (single pool,
    * IN-list, and their `?from=` window variants differ only in the WHERE).
    */
  private def suppliedBorrowed(s: SparkSession, dir: String,
      where: org.apache.spark.sql.Column): DataFrame = {
    val lps = Tables.lineitem(s, dir).select(
      pmod(col("l_partkey"), lit(25)).as("lp_pool"),
      col("l_shipdate").as("lp_ts"),
      col("l_extendedprice").as("tvl"),
      col("l_quantity").as("borrowed_st"))
    lps.join(broadcast(poolConfig(s, dir)), col("lp_pool") === col("pool_id"))
      .filter(where)
      .groupBy(col("lp_ts"))
      .agg(
        sum(microRound6(col("tvl").cast("decimal(20,2)") *
          microRecip(col("lpn_decimals")))).cast("double").as("supplied"),
        sum(microRound6(col("borrowed_st").cast("decimal(20,2)") *
          microRecip(col("lpn_decimals")))).cast("double").as("borrowed"))
      .select(col("lp_ts").as("timestamp"), col("supplied"), col("borrowed"))
      .orderBy(col("timestamp").desc)
  }

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

  private def liquidationsSql(timeWhere: String): String =
    s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |liq AS (
        |  SELECT l_shipdate AS "timestamp", l_partkey % 25 AS ticker,
        |    l_orderkey AS contract_id, l_linestatus AS transaction_type,
        |    l_extendedprice AS payment_stable, l_linestatus = 'F' AS closed_loan,
        |    l_quantity AS liquidation_price
        |  FROM lineitem
        |  WHERE l_returnflag = 'N' AND $timeWhere),
        |o AS (
        |  SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_custkey % 25 AS ls_cltr_symbol, o_totalprice AS ls_cltr_amnt_stable,
        |    o_totalprice AS ls_loan_amnt, o_custkey AS ls_loan_pool_id
        |  FROM orders)
        |SELECT liq."timestamp", liq.ticker, liq.contract_id,
        |  o.ls_address_id AS "user", liq.transaction_type,
        |  liq.payment_stable / pc.stable_currency_decimals AS liquidation_amount,
        |  liq.closed_loan,
        |  o.ls_cltr_amnt_stable / POWER(10, cr.decimal_digits) AS down_payment,
        |  o.ls_loan_amnt / pc.lpn_decimals AS loan,
        |  liq.liquidation_price
        |FROM liq
        |LEFT JOIN o ON o.ls_contract_id = liq.contract_id
        |JOIN cr ON cr.ticker = o.ls_cltr_symbol
        |JOIN pc ON pc.pool_id = o.ls_loan_pool_id
        |ORDER BY liq."timestamp" DESC, liq.contract_id DESC, liq.ticker DESC,
        |  liquidation_amount DESC""".stripMargin

  private[queries] def realizedPnlWalletSql(timeWhere: String, page: String): String =
    s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    c_nationkey AS lpn_symbol FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |openings AS (
        |  SELECT o_orderkey AS o_contract, o_custkey AS "user",
        |    o_orderdate AS opening_date,
        |    o_orderkey % 25 AS leased_asset,
        |    o_custkey % 25 AS down_payment_asset,
        |    CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS down_payment_stable,
        |    COALESCE(CAST(pc.lpn_symbol AS VARCHAR), 'USDC_NOBLE') AS lpn_symbol
        |  FROM orders
        |  JOIN pc ON o_custkey = pc.pool_id
        |  JOIN cr ON cr.ticker = o_custkey % 25
        |  WHERE $timeWhere),
        |collects_by_symbol AS (
        |  SELECT l_orderkey AS c_contract, l_partkey % 25 AS c_symbol,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(20,2))
        |      * (CASE cr.decimal_digits
        |          WHEN 1 THEN CAST('0.10000000' AS DECIMAL(9,8))
        |          WHEN 2 THEN CAST('0.01000000' AS DECIMAL(9,8))
        |          WHEN 3 THEN CAST('0.00100000' AS DECIMAL(9,8))
        |          WHEN 4 THEN CAST('0.00010000' AS DECIMAL(9,8))
        |          WHEN 5 THEN CAST('0.00001000' AS DECIMAL(9,8))
        |          ELSE CAST(NULL AS DECIMAL(9,8)) END) AS DECIMAL(28,8))
        |      AS amount_lpn_units,
        |    CAST(CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS amount_stable
        |  FROM lineitem
        |  JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND l_orderkey IN (SELECT o_contract FROM openings)
        |  GROUP BY l_orderkey, l_partkey % 25, cr.decimal_digits),
        |collects AS (
        |  SELECT c_contract,
        |    (list(c_symbol ORDER BY c_symbol))[1] AS returned_lpn,
        |    (list(amount_lpn_units ORDER BY c_symbol))[1] AS returned_amount_lpn_units,
        |    CAST(SUM(amount_stable) AS DECIMAL(28,6)) AS returned_amount_stable
        |  FROM collects_by_symbol GROUP BY c_contract),
        |loan_close AS (
        |  SELECT o_orderkey AS lc_contract, o_orderdate AS close_ts
        |  FROM orders WHERE o_orderstatus = 'F'
        |    AND o_orderkey IN (SELECT o_contract FROM openings)),
        |repays AS (
        |  SELECT l_orderkey AS rep_contract,
        |    CAST(SUM(CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DECIMAL(28,6))
        |      AS rep_stable,
        |    COUNT(*) AS rep_events
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'R'
        |    AND l_orderkey IN (SELECT o_contract FROM openings)
        |  GROUP BY l_orderkey),
        |liqs AS (
        |  SELECT l_orderkey AS lq_contract,
        |    CAST(SUM(CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DECIMAL(28,6))
        |      AS lq_stable,
        |    COUNT(*) AS lq_events
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'N'
        |    AND l_orderkey IN (SELECT o_contract FROM openings)
        |  GROUP BY l_orderkey)
        |SELECT o.o_contract AS contract_id, o."user", o.leased_asset,
        |  o.down_payment_asset, o.opening_date,
        |  lc.close_ts AS close_timestamp,
        |  CAST(o.down_payment_stable AS DOUBLE) AS down_payment_stable,
        |  CAST(COALESCE(r.rep_stable, CAST(0 AS DECIMAL(28,6))) AS DOUBLE)
        |    AS manual_repayments_stable,
        |  CAST(o.down_payment_stable + COALESCE(r.rep_stable, CAST(0 AS DECIMAL(28,6)))
        |    AS DOUBLE) AS total_outflow_stable,
        |  CAST(COALESCE(l.lq_stable, CAST(0 AS DECIMAL(28,6))) AS DOUBLE)
        |    AS liquidations_stable,
        |  COALESCE(l.lq_events, 0) AS liquidation_events,
        |  c.returned_lpn,
        |  CAST(c.returned_amount_lpn_units AS DOUBLE) AS returned_amount_lpn_units,
        |  CAST(COALESCE(c.returned_amount_stable, CAST(0 AS DECIMAL(28,6))) AS DOUBLE)
        |    AS returned_amount_stable,
        |  CAST(COALESCE(c.returned_amount_stable, CAST(0 AS DECIMAL(28,6)))
        |    - (o.down_payment_stable + COALESCE(r.rep_stable, CAST(0 AS DECIMAL(28,6))))
        |    AS DOUBLE) AS realized_pnl_stable
        |FROM openings o
        |JOIN loan_close lc ON lc.lc_contract = o.o_contract
        |LEFT JOIN collects c ON c.c_contract = o.o_contract
        |LEFT JOIN repays r ON r.rep_contract = o.o_contract
        |LEFT JOIN liqs l ON l.lq_contract = o.o_contract
        |ORDER BY lc.close_ts DESC, o.o_contract DESC$page""".stripMargin

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
      s"""WITH ranked AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS tvl,
        |    CAST(s_nationkey + 1 AS DOUBLE) AS lpn_decimals,
        |    RANK() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate DESC) AS rank
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        |supplied AS (
        |  SELECT sum(CAST(round(tvl / lpn_decimals, 6) AS DECIMAL(28,6))) AS ts_dec
        |  FROM ranked WHERE rank = 1)
        |SELECT ${microUnitsLongSql("ts_dec")} AS total_supplied_micro,
        |  ${microUnitsDoubleSql("ts_dec")} AS total_supplied
        |FROM supplied""".stripMargin,
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
    "q_lit_realized_pnl" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals,
        |    c_name AS label
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |openings AS (
        |  SELECT o_orderkey AS ls_contract_id, o_orderdate AS ls_timestamp,
        |    o_orderkey % 25 AS ls_asset_symbol, o_totalprice AS ls_loan_amnt,
        |    o_custkey % 25 AS ls_cltr_symbol, o_totalprice AS ls_cltr_amnt_stable,
        |    o_orderpriority AS open_tx_hash,
        |    COALESCE(pc.position_type,
        |      CASE WHEN o_orderkey % 25 IN (0, 13) THEN 'Short' ELSE 'Long' END) AS pos_type,
        |    pc.label AS short_symbol,
        |    pc.stable_currency_decimals
        |  FROM orders JOIN pc ON pc.pool_id = o_custkey
        |  WHERE o_custkey % 100 = 7),
        |repayments AS (
        |  SELECT l_orderkey AS r_contract_id,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / o.stable_currency_decimals AS total_repaid_stable
        |  FROM lineitem JOIN openings o ON o.ls_contract_id = l_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY l_orderkey, o.stable_currency_decimals),
        |collects AS (
        |  SELECT l_orderkey AS c_contract_id,
        |    CAST(SUM(CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS total_collect_normalized
        |  FROM lineitem c JOIN cr ON cr.ticker = c.l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = c.l_orderkey)
        |  GROUP BY l_orderkey),
        |liqs AS (
        |  SELECT l_orderkey AS lq_contract_id FROM lineitem
        |  WHERE l_returnflag = 'N' AND l_linestatus = 'F'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)),
        |closing_ts AS (
        |  SELECT o_orderkey AS ct_contract_id, o_orderdate AS close_ts
        |  FROM orders WHERE o_orderstatus = 'F'),
        |rct AS (SELECT l_orderkey AS rct_contract_id, MAX(CAST(l_partkey AS VARCHAR)) AS rct_tx
        |  FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)
        |  GROUP BY l_orderkey),
        |cpt AS (SELECT l_orderkey AS cpt_contract_id, MAX(CAST(l_partkey AS VARCHAR)) AS cpt_tx
        |  FROM lineitem WHERE l_returnflag = 'A' AND l_linestatus = 'F'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)
        |  GROUP BY l_orderkey),
        |lqt AS (SELECT l_orderkey AS lqt_contract_id, MAX(CAST(l_partkey AS VARCHAR)) AS lqt_tx
        |  FROM lineitem WHERE l_returnflag = 'N' AND l_linestatus = 'F'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)
        |  GROUP BY l_orderkey),
        |closable AS (
        |  SELECT * FROM openings o
        |  WHERE EXISTS (SELECT 1 FROM collects c WHERE c.c_contract_id = o.ls_contract_id)
        |     OR EXISTS (SELECT 1 FROM liqs l WHERE l.lq_contract_id = o.ls_contract_id)),
        |opening_rows AS (
        |  SELECT o.ls_timestamp AS "date", o.ls_contract_id AS position_id,
        |    o.ls_cltr_amnt_stable / POWER(10, cr_cltr.decimal_digits)
        |      + COALESCE(r.total_repaid_stable, 0.0) AS sent_amount,
        |    'USDC' AS sent_currency,
        |    o.ls_loan_amnt / POWER(10, cr_asset.decimal_digits) AS received_amount,
        |    CASE WHEN o.ls_asset_symbol IN (0, 13) THEN 'USDC'
        |         ELSE CAST(o.ls_asset_symbol AS VARCHAR) END AS received_currency,
        |    CAST(0.0 AS DOUBLE) AS fee_amount, 'USDC' AS fee_currency, 'margin trading' AS label,
        |    CASE WHEN o.pos_type = 'Short'
        |           THEN CONCAT(COALESCE(o.short_symbol, 'Unknown'), ' short opening')
        |         ELSE CONCAT(CAST(o.ls_asset_symbol AS VARCHAR), ' long opening')
        |    END AS description,
        |    o.open_tx_hash AS tx_hash
        |  FROM closable o
        |  LEFT JOIN repayments r ON r.r_contract_id = o.ls_contract_id
        |  JOIN cr cr_cltr ON cr_cltr.ticker = o.ls_cltr_symbol
        |  JOIN cr cr_asset ON cr_asset.ticker = o.ls_asset_symbol),
        |closing_rows AS (
        |  SELECT cts.close_ts AS "date", o.ls_contract_id AS position_id,
        |    o.ls_loan_amnt / POWER(10, cr_asset.decimal_digits) AS sent_amount,
        |    CASE WHEN o.ls_asset_symbol IN (0, 13) THEN 'USDC'
        |         ELSE CAST(o.ls_asset_symbol AS VARCHAR) END AS sent_currency,
        |    COALESCE(c.total_collect_normalized, 0.0) AS received_amount,
        |    'USDC' AS received_currency,
        |    CAST(0.0 AS DOUBLE) AS fee_amount, 'USDC' AS fee_currency, 'margin trading' AS label,
        |    CASE WHEN COALESCE(c.total_collect_normalized, 0.0) > 0
        |         THEN CASE WHEN o.pos_type = 'Short'
        |                THEN CONCAT(COALESCE(o.short_symbol, 'Unknown'), ' short closing')
        |              ELSE CONCAT(CAST(o.ls_asset_symbol AS VARCHAR), ' long closing') END
        |         ELSE CASE WHEN o.pos_type = 'Short'
        |                THEN CONCAT(COALESCE(o.short_symbol, 'Unknown'), ' short liquidation')
        |              ELSE CONCAT(CAST(o.ls_asset_symbol AS VARCHAR), ' long liquidation') END
        |    END AS description,
        |    COALESCE(rct.rct_tx, cpt.cpt_tx, lqt.lqt_tx) AS tx_hash
        |  FROM closable o
        |  JOIN closing_ts cts ON cts.ct_contract_id = o.ls_contract_id
        |  LEFT JOIN collects c ON c.c_contract_id = o.ls_contract_id
        |  LEFT JOIN rct ON rct.rct_contract_id = o.ls_contract_id
        |  LEFT JOIN cpt ON cpt.cpt_contract_id = o.ls_contract_id
        |  LEFT JOIN lqt ON lqt.lqt_contract_id = o.ls_contract_id
        |  JOIN cr cr_asset ON cr_asset.ticker = o.ls_asset_symbol)
        |SELECT "date", position_id, sent_amount, sent_currency, received_amount,
        |  received_currency, fee_amount, fee_currency, label, description, tx_hash
        |FROM (SELECT * FROM opening_rows UNION ALL SELECT * FROM closing_rows) x
        |ORDER BY "date", position_id, sent_currency, received_currency""".stripMargin,
    "q_lit_utilization_levels" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    c_nationkey AS lpn_symbol,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CASE WHEN c_acctbal < 0 THEN NULL
        |         ELSE CONCAT('proto-', CAST(c_custkey % 7 AS VARCHAR)) END AS protocol_label
        |  FROM customer),
        |lps AS (SELECT l_partkey % 25 AS lp_pool, l_shipdate AS lp_ts,
        |    l_extendedprice AS tvl, l_quantity AS borrowed_st,
        |    l_linenumber AS min_util FROM lineitem),
        |latest_pool_aggregation AS (SELECT MAX(lp_ts) AS pool_max_ts FROM lps),
        |ls_state AS (SELECT l_orderkey AS st_contract, l_shipdate AS st_ts,
        |    l_extendedprice AS st_principal FROM lineitem),
        |latest_ls_aggregation AS (SELECT MAX(st_ts) AS ls_max_ts FROM ls_state),
        |openings AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_loan_pool_id,
        |    o_orderdate AS ls_timestamp, o_orderkey % 200 AS ls_interest FROM orders),
        |latest_states AS (
        |  SELECT lp_pool, tvl, borrowed_st, min_util, lpn_decimals, protocol_label FROM (
        |    SELECT lps.*, pc.lpn_decimals, pc.protocol_label,
        |      row_number() OVER (PARTITION BY lp_pool ORDER BY lp_ts DESC,
        |        tvl DESC, borrowed_st DESC, min_util DESC) AS rn
        |    FROM lps
        |    JOIN pc ON lps.lp_pool = pc.pool_id
        |    CROSS JOIN latest_pool_aggregation la
        |    WHERE lps.lp_ts = la.pool_max_ts) WHERE rn = 1),
        |latest_borrow_apr AS (
        |  SELECT ls_loan_pool_id AS ba_pool, ls_interest / 10.0 AS borrow_apr FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ls_loan_pool_id
        |      ORDER BY ls_timestamp DESC, ls_interest DESC, ls_contract_id DESC) AS rn
        |    FROM openings) WHERE rn = 1),
        |pool_utilization AS (
        |  SELECT lp_pool AS pu_pool,
        |    CASE WHEN tvl > 0 THEN borrowed_st / tvl ELSE 0.0 END AS utilization_rate
        |  FROM lps CROSS JOIN latest_pool_aggregation la
        |  WHERE lps.lp_ts = la.pool_max_ts),
        |avg_interest_per_pool AS (
        |  SELECT o.ls_loan_pool_id AS ai_pool,
        |    CAST(SUM(CAST((CAST(o.ls_interest AS DECIMAL(5,0)) * CAST('0.1' AS DECIMAL(2,1)) -
        |        CASE WHEN pc.protocol_label IN ('proto-3', 'proto-5')
        |               THEN CASE WHEN o.ls_timestamp >= TIMESTAMP '1997-06-01'
        |                         THEN CAST('8.0' AS DECIMAL(2,1)) ELSE CAST('4.0' AS DECIMAL(2,1)) END
        |             WHEN pc.lpn_symbol IN (3, 7) THEN CAST('2.5' AS DECIMAL(2,1))
        |             WHEN pc.lpn_symbol = 11 THEN CAST('4.0' AS DECIMAL(2,1))
        |             WHEN pc.lpn_symbol IN (15, 19) THEN CAST('2.0' AS DECIMAL(2,1))
        |             ELSE CAST('4.0' AS DECIMAL(2,1)) END) * CAST(s.st_principal AS DECIMAL(20,2))
        |      AS DECIMAL(28,6))) AS DOUBLE) /
        |    NULLIF(CAST(SUM(CAST(s.st_principal AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        |      AS avg_net_interest
        |  FROM ls_state s
        |  CROSS JOIN latest_ls_aggregation la
        |  JOIN openings o ON s.st_contract = o.ls_contract_id
        |  JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |  WHERE s.st_ts = la.ls_max_ts
        |  GROUP BY o.ls_loan_pool_id),
        |earn_apr_calc AS (
        |  SELECT pc.pool_id AS ea_pool,
        |    COALESCE(ai.avg_net_interest, 0.0) * COALESCE(pu.utilization_rate, 0.0) AS apr_simple
        |  FROM pc
        |  LEFT JOIN avg_interest_per_pool ai ON pc.pool_id = ai.ai_pool
        |  LEFT JOIN pool_utilization pu ON pc.pool_id = pu.pu_pool)
        |SELECT
        |  COALESCE(ls.protocol_label, CAST(ls.lp_pool AS VARCHAR)) AS protocol,
        |  CASE WHEN ls.tvl > 0 THEN ls.borrowed_st / ls.tvl * 100.0 ELSE 0.0 END AS utilization,
        |  ls.tvl / ls.lpn_decimals AS supplied,
        |  ls.borrowed_st / ls.lpn_decimals AS borrowed,
        |  COALESCE(apr.borrow_apr, 0.0) AS borrow_apr,
        |  CASE WHEN ea.apr_simple IS NOT NULL AND ea.apr_simple > 0
        |       THEN floor((power(1.0 + ea.apr_simple / 100.0 / 365.0, 365) - 1.0) * 100.0
        |            * 1000000.0 + 0.5) / 1000000.0
        |       ELSE 0.0 END AS earn_apr,
        |  ls.min_util / 10.0 AS deposit_suspension
        |FROM latest_states ls
        |LEFT JOIN latest_borrow_apr apr ON ls.lp_pool = apr.ba_pool
        |LEFT JOIN earn_apr_calc ea ON ls.lp_pool = ea.ea_pool
        |WHERE ls.protocol_label IS NOT NULL
        |ORDER BY protocol""".stripMargin,
    "q_lit_realized_pnl_total" ->
      """WITH cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |openings AS (
        |  SELECT o_orderkey AS ls_contract_id, o_custkey % 25 AS ls_cltr_symbol,
        |    o_totalprice AS ls_cltr_amnt_stable
        |  FROM orders WHERE o_custkey % 100 = 7),
        |repayments AS (
        |  SELECT l_orderkey AS rp_contract_id,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * (CASE cr.decimal_digits
        |          WHEN 1 THEN CAST('0.10000000' AS DECIMAL(9,8))
        |          WHEN 2 THEN CAST('0.01000000' AS DECIMAL(9,8))
        |          WHEN 3 THEN CAST('0.00100000' AS DECIMAL(9,8))
        |          WHEN 4 THEN CAST('0.00010000' AS DECIMAL(9,8))
        |          WHEN 5 THEN CAST('0.00001000' AS DECIMAL(9,8))
        |          ELSE CAST(NULL AS DECIMAL(9,8)) END) AS DECIMAL(20,8))) AS rp_total
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)
        |  GROUP BY l_orderkey),
        |collects AS (
        |  SELECT l_orderkey AS cl_contract_id,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * (CASE cr.decimal_digits
        |          WHEN 1 THEN CAST('0.10000000' AS DECIMAL(9,8))
        |          WHEN 2 THEN CAST('0.01000000' AS DECIMAL(9,8))
        |          WHEN 3 THEN CAST('0.00100000' AS DECIMAL(9,8))
        |          WHEN 4 THEN CAST('0.00010000' AS DECIMAL(9,8))
        |          WHEN 5 THEN CAST('0.00001000' AS DECIMAL(9,8))
        |          ELSE CAST(NULL AS DECIMAL(9,8)) END) AS DECIMAL(20,8))) AS cl_total
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND EXISTS (SELECT 1 FROM openings o WHERE o.ls_contract_id = l_orderkey)
        |  GROUP BY l_orderkey),
        |position_flows AS (
        |  SELECT
        |    CAST(CAST(o.ls_cltr_amnt_stable AS DECIMAL(20,2))
        |      * (CASE cr_cltr.decimal_digits
        |          WHEN 1 THEN CAST('0.10000000' AS DECIMAL(9,8))
        |          WHEN 2 THEN CAST('0.01000000' AS DECIMAL(9,8))
        |          WHEN 3 THEN CAST('0.00100000' AS DECIMAL(9,8))
        |          WHEN 4 THEN CAST('0.00010000' AS DECIMAL(9,8))
        |          WHEN 5 THEN CAST('0.00001000' AS DECIMAL(9,8))
        |          ELSE CAST(NULL AS DECIMAL(9,8)) END) AS DECIMAL(20,8))
        |      + COALESCE(r.rp_total, CAST(0 AS DECIMAL(20,8))) AS sent_open_usdc,
        |    COALESCE(c.cl_total, CAST(0 AS DECIMAL(20,8))) AS received_close_usdc
        |  FROM openings o
        |  JOIN cr cr_cltr ON cr_cltr.ticker = o.ls_cltr_symbol
        |  LEFT JOIN repayments r ON r.rp_contract_id = o.ls_contract_id
        |  LEFT JOIN collects c ON c.cl_contract_id = o.ls_contract_id
        |  JOIN orders ct ON ct.o_orderkey = o.ls_contract_id AND ct.o_orderstatus = 'F')
        |SELECT CAST(SUM(received_close_usdc) - SUM(sent_open_usdc) AS DOUBLE)
        |  AS total_realized_pnl
        |FROM position_flows""".stripMargin,
    "q_lit_active_states" ->
      """WITH dep AS (SELECT l_suppkey AS address, l_partkey % 25 AS pool,
        |    l_shipdate AS dep_ts FROM lineitem WHERE l_linestatus = 'O')
        |SELECT a.address, a.pool
        |FROM dep a
        |WHERE a.dep_ts > COALESCE((
        |    SELECT b.l_shipdate
        |    FROM lineitem b
        |    WHERE b.l_linestatus = 'F' AND b.l_returnflag = 'R'
        |      AND b.l_suppkey = a.address AND b.l_partkey % 25 = a.pool
        |    ORDER BY b.l_shipdate DESC
        |    LIMIT 1
        |  ), to_timestamp(0))
        |GROUP BY a.address, a.pool""".stripMargin,
    "q_lit_current_lenders" ->
      """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value FROM events),
        |pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    c_name AS label
        |  FROM customer),
        |lps AS (SELECT l_suppkey AS lender, l_partkey % 25 AS pool_key,
        |    l_shipdate AS lp_ts, l_extendedprice AS lender_stable FROM lineitem),
        |latest_aggregation AS (SELECT MAX(lp_ts) AS max_ts FROM lps),
        |unique_lpd AS (
        |  SELECT d_address, d_ts AS joined FROM (
        |    SELECT user_id AS d_address, ts AS d_ts, event_id AS d_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev WHERE event_type = 'purchase') WHERE rn = 1)
        |SELECT unique_lpd.joined,
        |  COALESCE(pc.label, CAST(lps.pool_key AS VARCHAR)) AS pool,
        |  lps.lender,
        |  lps.lender_stable / pc.lpn_decimals AS lent_stables
        |FROM lps
        |JOIN pc ON pc.pool_id = lps.pool_key
        |CROSS JOIN latest_aggregation la
        |LEFT JOIN unique_lpd ON lps.lender = unique_lpd.d_address
        |WHERE lps.lp_ts = la.max_ts""".stripMargin,
    "q_lit_price_series" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, user_id, event_type, value FROM events)
        |SELECT
        |  date_trunc('hour', ts) + ((CAST(date_part('minute', ts) AS INTEGER) // 15) * 15)
        |    * INTERVAL 1 MINUTE AS price_ts,
        |  MAX(value) AS price_in_stable
        |FROM ev
        |WHERE user_id % 25 = 7 AND event_type = 'view' AND ts >= TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY price_ts DESC""".stripMargin,
    "q_lit_total_tx_value" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |opened_leases AS (
        |  SELECT CAST(CAST(floor(
        |      CAST(o_totalprice AS DECIMAL(20,2))
        |        * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0))
        |      + CAST(o_totalprice AS DECIMAL(20,2))
        |        * (CASE CAST(pc.stable_currency_decimals AS INT)
        |            WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |            WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |            WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |            WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |      + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS volume
        |  FROM orders
        |  JOIN pc ON o_custkey = pc.pool_id
        |  JOIN cr ON cr.ticker = o_custkey % 25),
        |lp_deposits AS (
        |  SELECT CAST(CAST(floor(CAST(value AS DECIMAL(20,2))
        |      * (CASE CAST(pc.stable_currency_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST(NULL AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS volume
        |  FROM events JOIN pc ON user_id = pc.pool_id
        |  WHERE event_type = 'purchase'),
        |lp_withdrawals AS (
        |  SELECT CAST(CAST(floor(CAST(value AS DECIMAL(20,2))
        |      * (CASE CAST(pc.stable_currency_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST(NULL AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS volume
        |  FROM events JOIN pc ON user_id = pc.pool_id
        |  WHERE event_type = 'signup'),
        |ls_close AS (
        |  SELECT CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS volume
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'),
        |ls_repayment AS (
        |  SELECT CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS volume
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'R')
        |, txv AS (SELECT SUM(volume) AS txv_dec
        |FROM (SELECT volume FROM opened_leases
        |  UNION ALL SELECT volume FROM lp_deposits
        |  UNION ALL SELECT volume FROM lp_withdrawals
        |  UNION ALL SELECT volume FROM ls_close
        |  UNION ALL SELECT volume FROM ls_repayment) combined)
        |SELECT ${microUnitsLongSql("txv_dec")} AS tx_value_micro,
        |  ${microUnitsDoubleSql("txv_dec")} AS tx_value
        |FROM txv""".stripMargin,
    "q_lit_lease_history" ->
      """SELECT * FROM (
        |  SELECT l_partkey % 25 AS symbol, l_extendedprice AS amount,
        |    CAST(NULL AS BIGINT) AS ls_amnt_symbol, CAST(NULL AS DOUBLE) AS ls_amnt,
        |    l_shipdate AS "time", 'repay' AS "type", CAST(NULL AS VARCHAR) AS additional
        |  FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey % 500 = 17
        |  UNION ALL
        |  SELECT l_partkey % 25, l_extendedprice, l_suppkey % 25, l_quantity,
        |    l_shipdate, 'market-close', CAST(NULL AS VARCHAR)
        |  FROM lineitem WHERE l_returnflag = 'A' AND l_orderkey % 500 = 17
        |  UNION ALL
        |  SELECT l_partkey % 25, l_extendedprice, l_suppkey % 25, l_quantity,
        |    l_shipdate, 'liquidation', l_linestatus
        |  FROM lineitem WHERE l_returnflag = 'N' AND l_orderkey % 500 = 17
        |) AS combined_data ORDER BY "time" ASC""".stripMargin,
    "q_lit_leases_monthly" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    c_name AS label
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |base AS (
        |  SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    CASE WHEN pc.position_type = 'Short' THEN pc.label
        |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS leased_asset,
        |    date_trunc('month', o_orderdate) AS "date",
        |    CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS down_payment_amount,
        |    CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS loan_amount
        |  FROM orders
        |  LEFT JOIN pc ON o_custkey = pc.pool_id
        |  LEFT JOIN cr ON cr.ticker = o_custkey % 25)
        |SELECT "date",
        |  CAST(SUM(down_payment_amount) + SUM(loan_amount) AS DOUBLE) AS amount
        |FROM base GROUP BY "date" ORDER BY "date" DESC""".stripMargin,
    "q_lit_profit_series" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type, value FROM events),
        |daily AS (SELECT date_trunc('day', ts) AS "time",
        |    sum(CAST(value AS DECIMAL(18,2))) AS d
        |  FROM ev WHERE event_type = 'purchase' AND value < 300 GROUP BY 1)
        |SELECT "time",
        |  CAST(d AS DOUBLE) / 1000000.0 AS daily,
        |  CAST(sum(d) OVER (ORDER BY "time"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0 AS cumulative
        |FROM daily""".stripMargin,
    "q_lit_wallet_tx_volume" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS INT) AS lpn_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |openings AS (
        |  SELECT o_orderkey AS contract_id,
        |    CAST(o_totalprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) AS down_payment_usdc,
        |    CAST(o_totalprice AS DECIMAL(20,2))
        |      * (CASE pc.lpn_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS loan_usdc
        |  FROM orders
        |  JOIN pc ON o_custkey = pc.pool_id
        |  JOIN cr ON cr.ticker = o_custkey % 25
        |  WHERE o_custkey % 100 = 7),
        |repayments AS (
        |  SELECT CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'R'
        |    AND l_orderkey IN (SELECT contract_id FROM openings)),
        |closes AS (
        |  SELECT CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND l_orderkey IN (SELECT contract_id FROM openings))
        |SELECT CAST(SUM(vol) AS DOUBLE) AS tx_volume FROM (
        |  SELECT CAST(CAST(floor(down_payment_usdc + loan_usdc + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol FROM openings
        |  UNION ALL SELECT vol FROM repayments
        |  UNION ALL SELECT vol FROM closes) x""".stripMargin,
    "q_lit_win_rate" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |openings AS (
        |  SELECT o_orderkey AS contract_id, o_custkey % 25 AS cltr_symbol,
        |    o_totalprice AS cltr_amnt_stable, o_custkey AS loan_pool_id
        |  FROM orders WHERE o_custkey % 100 = 7),
        |repayments AS (
        |  SELECT l_orderkey AS r_contract,
        |    CAST(CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
        |        * (CASE CAST(pc.stable_currency_decimals AS INT)
        |            WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |            WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |            ELSE CAST('333333.333333' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS total_repaid_usdc
        |  FROM lineitem
        |  JOIN openings o ON o.contract_id = l_orderkey
        |  JOIN pc ON pc.pool_id = o.loan_pool_id
        |  WHERE l_returnflag = 'R'
        |  GROUP BY l_orderkey, pc.stable_currency_decimals),
        |collects AS (
        |  SELECT l_orderkey AS c_contract,
        |    SUM(CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |        * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |        * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS total_collected_usdc
        |  FROM lineitem
        |  JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND l_orderkey IN (SELECT contract_id FROM openings)
        |  GROUP BY l_orderkey),
        |finalized AS (
        |  SELECT COALESCE(c.total_collected_usdc, CAST(0 AS DECIMAL(28,6)))
        |    - (CAST(CAST(floor(CAST(o.cltr_amnt_stable AS DECIMAL(20,2))
        |          * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |          * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))
        |       + COALESCE(r.total_repaid_usdc, CAST(0 AS DECIMAL(28,6)))) AS pnl
        |  FROM openings o
        |  JOIN cr ON cr.ticker = o.cltr_symbol
        |  LEFT JOIN repayments r ON r.r_contract = o.contract_id
        |  LEFT JOIN collects c ON c.c_contract = o.contract_id
        |  WHERE o.contract_id IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
        |SELECT CASE WHEN COUNT(*) = 0 THEN 0.0
        |  ELSE (CAST(COUNT(CASE WHEN pnl > 0 THEN 1 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) * 100.0 END AS win_rate
        |FROM finalized""".stripMargin,
    "q_lit_pnl_buckets" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |buckets AS (
        |  SELECT 1 AS ord, '<0' AS bucket UNION ALL
        |  SELECT 2, '0-50' UNION ALL
        |  SELECT 3, '51–100' UNION ALL
        |  SELECT 4, '101–300' UNION ALL
        |  SELECT 5, '301+'),
        |openings AS (
        |  SELECT o_orderkey AS contract_id, o_custkey % 25 AS cltr_symbol,
        |    o_totalprice AS cltr_amnt_stable, o_custkey AS loan_pool_id
        |  FROM orders WHERE o_custkey % 100 = 7),
        |repayments AS (
        |  SELECT l_orderkey AS r_contract,
        |    CAST(CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
        |        * (CASE CAST(pc.stable_currency_decimals AS INT)
        |            WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |            WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |            ELSE CAST('333333.333333' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS total_repaid_usdc
        |  FROM lineitem
        |  JOIN openings o ON o.contract_id = l_orderkey
        |  JOIN pc ON pc.pool_id = o.loan_pool_id
        |  WHERE l_returnflag = 'R'
        |  GROUP BY l_orderkey, pc.stable_currency_decimals),
        |collects AS (
        |  SELECT l_orderkey AS c_contract,
        |    SUM(CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |        * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |        * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS total_collected_usdc
        |  FROM lineitem
        |  JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND l_orderkey IN (SELECT contract_id FROM openings)
        |  GROUP BY l_orderkey),
        |finalized AS (
        |  SELECT
        |    CAST(CAST(CAST(floor(CAST(o.cltr_amnt_stable AS DECIMAL(20,2))
        |          * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |          * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))
        |      + COALESCE(r.total_repaid_usdc, CAST(0 AS DECIMAL(28,6))) AS DOUBLE) AS sent_usdc,
        |    CAST(COALESCE(c.total_collected_usdc, CAST(0 AS DECIMAL(28,6)))
        |      - (CAST(CAST(floor(CAST(o.cltr_amnt_stable AS DECIMAL(20,2))
        |            * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |            * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))
        |         + COALESCE(r.total_repaid_usdc, CAST(0 AS DECIMAL(28,6))))
        |      AS DOUBLE) AS realized_pnl_usdc
        |  FROM openings o
        |  JOIN cr ON cr.ticker = o.cltr_symbol
        |  LEFT JOIN repayments r ON r.r_contract = o.contract_id
        |  LEFT JOIN collects c ON c.c_contract = o.contract_id
        |  WHERE o.contract_id IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')),
        |with_pct AS (
        |  SELECT CASE WHEN sent_usdc = 0 THEN NULL
        |    ELSE (realized_pnl_usdc / sent_usdc) * 100.0 END AS pnl_pct
        |  FROM finalized),
        |counts AS (
        |  SELECT CASE
        |      WHEN pnl_pct < 0 THEN '<0'
        |      WHEN pnl_pct >= 0 AND pnl_pct < 50 THEN '0-50'
        |      WHEN pnl_pct >= 50 AND pnl_pct < 100 THEN '51–100'
        |      WHEN pnl_pct >= 100 AND pnl_pct <= 300 THEN '101–300'
        |      WHEN pnl_pct > 300 THEN '301+' END AS bucket,
        |    COUNT(*) AS cnt
        |  FROM with_pct WHERE pnl_pct IS NOT NULL GROUP BY 1),
        |tot AS (SELECT COALESCE(SUM(cnt), 0) AS total FROM counts)
        |SELECT b.bucket, COALESCE(c.cnt, 0) AS positions,
        |  CASE WHEN t.total > 0
        |    THEN floor(CAST(100.0 AS DOUBLE) * COALESCE(c.cnt, 0) / t.total
        |      * 100.0 + 0.5) / 100.0
        |    ELSE 0.0 END AS share_percent
        |FROM buckets b
        |LEFT JOIN counts c USING (bucket)
        |CROSS JOIN tot t
        |ORDER BY b.ord""".stripMargin,
    "q_lit_liquidations" ->
      liquidationsSql("l_shipdate >= TIMESTAMP '1997-06-01'"),
    "q_lit_liquidations_window" ->
      liquidationsSql(
        "l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate > TIMESTAMP '1997-09-01'"),
    "q_lit_lender_history" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, user_id, event_type, value FROM events),
        |pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CASE WHEN c_acctbal < 0 THEN NULL
        |         ELSE 'proto-' || CAST(c_custkey % 7 AS VARCHAR) END AS protocol_label
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT 'Deposit' AS transaction_type, ts AS "timestamp", user_id AS "user",
        |    value / pc.lpn_decimals AS amount,
        |    COALESCE(pc.protocol_label, CAST(pc.pool_id AS VARCHAR)) AS pool
        |  FROM ev JOIN pc ON user_id = pc.pool_id WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'Withdraw', ts, user_id, value / pc.lpn_decimals,
        |    COALESCE(pc.protocol_label, CAST(pc.pool_id AS VARCHAR))
        |  FROM ev JOIN pc ON user_id = pc.pool_id WHERE event_type = 'signup') combined
        |WHERE "timestamp" > TIMESTAMP '1997-01-01'
        |ORDER BY "timestamp" DESC""".stripMargin,
    "q_lit_loans_by_token" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CAST(c_nationkey AS BIGINT) AS lpn_symbol,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type
        |  FROM customer),
        |la AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened AS (
        |  SELECT CASE WHEN pc.position_type = 'Short'
        |              THEN CAST(pc.lpn_symbol AS VARCHAR) || ' (Short)'
        |              ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS asset_type,
        |    CAST(s.l_extendedprice AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS loan_micro
        |  FROM lineitem s CROSS JOIN la
        |  JOIN orders ON s.l_orderkey = o_orderkey
        |  LEFT JOIN pc ON pc.pool_id = o_custkey
        |  WHERE s.l_shipdate = la.max_ts)
        |SELECT asset_type AS symbol,
        |  CAST(SUM(CAST(CAST(floor(loan_micro + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS value
        |FROM opened WHERE loan_micro > 0
        |GROUP BY asset_type ORDER BY value ASC""".stripMargin,
    "q_lit_position_buckets" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer),
        |la AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened_loans AS (
        |  SELECT CAST(s.l_extendedprice AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS loan
        |  FROM lineitem s CROSS JOIN la
        |  JOIN orders ON s.l_orderkey = o_orderkey
        |  LEFT JOIN pc ON pc.pool_id = o_custkey
        |  WHERE s.l_shipdate = la.max_ts AND s.l_extendedprice > 0)
        |SELECT CASE
        |    WHEN loan < 1000000000 THEN '0-0.999k'
        |    WHEN loan BETWEEN 1000000000 AND 1999000000 THEN '1-1.9k'
        |    WHEN loan BETWEEN 2000000000 AND 4999000000 THEN '2-4.9k'
        |    WHEN loan BETWEEN 5000000000 AND 9999000000 THEN '5-9.9k'
        |    WHEN loan BETWEEN 10000000000 AND 14999000000 THEN '10-14.9k'
        |    WHEN loan >= 15000000000 THEN '15k+' END AS loan_category,
        |  COUNT(loan) AS loan_count,
        |  CAST(SUM(CAST(CAST(floor(loan + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS loan_size
        |FROM opened_loans GROUP BY loan_category""".stripMargin,
    "q_lit_lease_value_stats" ->
      """WITH cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |la AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT l_orderkey AS st_contract_id, l_shipdate AS st_timestamp,
        |      l_linenumber AS st_line, l_quantity AS st_amnt_stable,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_shipdate DESC, l_linenumber DESC, l_quantity DESC) AS rn
        |    FROM lineitem CROSS JOIN la WHERE l_shipdate = la.max_ts) t
        |  WHERE rn = 1),
        |js AS (
        |  SELECT o_orderkey % 25 AS asset,
        |    CAST(st_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) AS lease_micro
        |  FROM latest
        |  JOIN orders ON st_contract_id = o_orderkey
        |  JOIN cr ON cr.ticker = o_orderkey % 25
        |  WHERE st_amnt_stable > 0)
        |SELECT asset,
        |  CAST(SUM(CAST(CAST(floor(lease_micro + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_value,
        |  CAST(MAX(lease_micro) * CAST('0.000001' AS DECIMAL(7,6)) AS DOUBLE) AS max_value
        |FROM js GROUP BY asset""".stripMargin,
    "q_lit_leased_assets_total" ->
      """WITH pc AS (SELECT c_custkey AS pool_id, c_name AS label,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |la AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened AS (
        |  SELECT CASE WHEN pc.position_type = 'Short'
        |              THEN pc.label || ' (Short)'
        |              ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS asset,
        |    CAST(s.l_quantity AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) AS lease_micro
        |  FROM lineitem s CROSS JOIN la
        |  JOIN orders ON s.l_orderkey = o_orderkey
        |  LEFT JOIN pc ON pc.pool_id = o_custkey
        |  LEFT JOIN cr ON cr.ticker = o_orderkey % 25
        |  WHERE s.l_shipdate = la.max_ts AND s.l_quantity > 0)
        |SELECT asset,
        |  CAST(SUM(CAST(CAST(floor(lease_micro + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS loan
        |FROM opened GROUP BY asset ORDER BY loan DESC""".stripMargin,
    "q_lit_loans_granted" ->
      """WITH pc AS (SELECT c_custkey AS pool_id, c_name AS label,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type
        |  FROM customer)
        |SELECT CASE WHEN pc.position_type = 'Short'
        |           THEN pc.label || ' (Short)'
        |           ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS asset,
        |  CAST(SUM(CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS loan
        |FROM orders JOIN pc ON pc.pool_id = o_custkey
        |GROUP BY 1 ORDER BY loan ASC""".stripMargin,
    "q_lit_open_positions_by_token" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey AS BIGINT) AS lpn_symbol,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |la AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened AS (
        |  SELECT CASE WHEN pc.position_type = 'Short'
        |              THEN CAST(pc.lpn_symbol AS VARCHAR) || ' (Short)'
        |              ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS token,
        |    CAST(s.l_quantity AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) AS lease_micro
        |  FROM lineitem s CROSS JOIN la
        |  JOIN orders ON s.l_orderkey = o_orderkey
        |  LEFT JOIN pc ON pc.pool_id = o_custkey
        |  LEFT JOIN cr ON cr.ticker = o_orderkey % 25
        |  WHERE s.l_shipdate = la.max_ts AND s.l_quantity > 0)
        |SELECT token,
        |  CAST(SUM(CAST(CAST(floor(lease_micro + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS market_value
        |FROM opened GROUP BY token ORDER BY market_value DESC""".stripMargin,
    "q_lit_historically_opened" ->
      """WITH pc AS (SELECT c_custkey AS pool_id, c_name AS label,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |base AS (
        |  SELECT o_orderkey AS contract_id, o_custkey AS "user",
        |    CASE WHEN pc.position_type = 'Short' THEN pc.label
        |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS leased_asset,
        |    o_orderdate AS opening_date,
        |    COALESCE(pc.position_type, 'Long') AS position_type,
        |    o_totalprice / POWER(10, cr.decimal_digits) AS down_payment_amount,
        |    o_custkey % 25 AS down_payment_asset,
        |    o_totalprice / pc.lpn_decimals AS loan,
        |    o_totalprice / CAST(o_orderkey % 4 + 1 AS DOUBLE) AS total_position_lpn
        |  FROM orders
        |  JOIN pc ON pc.pool_id = o_custkey
        |  JOIN cr ON cr.ticker = o_custkey % 25),
        |prices AS (
        |  SELECT CAST(l_partkey % 25 AS VARCHAR) AS mp_symbol, l_shipdate AS mp_ts,
        |    MAX(l_extendedprice) AS price
        |  FROM lineitem GROUP BY 1, 2),
        |wp AS (
        |  SELECT b.*, p.price
        |  FROM base b ASOF LEFT JOIN prices p
        |    ON b.leased_asset = p.mp_symbol AND b.opening_date >= p.mp_ts),
        |open_ids AS (
        |  SELECT DISTINCT l_orderkey AS open_contract FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-11-01')
        |SELECT contract_id, "user", leased_asset, opening_date, position_type,
        |  down_payment_amount, down_payment_asset, loan, total_position_lpn, price,
        |  (open_contract IS NOT NULL) AS "open",
        |  CASE WHEN position_type = 'Long'
        |       THEN (loan / 0.9) / (down_payment_amount + loan) * price
        |       WHEN position_type = 'Short'
        |       THEN (down_payment_amount + loan) / (total_position_lpn / 0.9)
        |  END AS liquidation_price
        |FROM wp LEFT JOIN open_ids ON contract_id = open_contract
        |ORDER BY opening_date DESC, contract_id DESC
        |OFFSET 30 LIMIT 60""".stripMargin,
    "q_lit_supplied_borrowed" -> suppliedBorrowedSql("lp_pool = 7"),
    "q_lit_supplied_borrowed_total" ->
      suppliedBorrowedSql("lp_pool IN (2, 7, 11, 19)"),
    "q_lit_supplied_borrowed_window" ->
      suppliedBorrowedSql(
        "lp_pool IN (2, 7, 11, 19) AND lp_ts > TIMESTAMP '1997-06-01'"),
    "q_lit_buyback" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type,
        |    CAST(value AS DECIMAL(18,2)) * CAST('0.000001' AS DECIMAL(7,6)) AS v
        |  FROM events)
        |SELECT ts AS "time",
        |  CAST(CAST(SUM(v) OVER (ORDER BY ts) AS DECIMAL(38,8)) AS DOUBLE) AS bought_back
        |FROM ev
        |WHERE event_type = 'purchase' AND ts > TIMESTAMP '1997-01-01'
        |ORDER BY "time" ASC, bought_back ASC""".stripMargin,
    "q_lit_revenue_total" ->
      """SELECT CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(38,8)) AS DOUBLE) AS revenue
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_lit_pnl_over_time" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |o AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_loan_pool_id,
        |    o_orderkey % 25 AS ls_asset_symbol, o_custkey % 25 AS ls_cltr_symbol,
        |    o_totalprice AS ls_cltr_amnt_stable FROM orders),
        |states AS (
        |  SELECT l_orderkey AS st_contract_id,
        |    date_trunc('hour', l_shipdate) AS "hour",
        |    CAST(l_extendedprice AS DOUBLE) AS st_principal_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_amnt_stable,
        |    l_discount AS st_prev_margin_stable,
        |    l_tax AS st_current_margin_stable,
        |    CAST(l_linenumber AS DOUBLE) AS st_prev_interest_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_current_interest_stable
        |  FROM lineitem
        |  WHERE l_orderkey % 500 = 17 AND l_shipdate >= TIMESTAMP '1998-06-01'),
        |dp_loan AS (
        |  SELECT st_contract_id AS dp_contract, "hour" AS dp_hour,
        |    st_principal_stable / pc.lpn_decimals AS loan,
        |    o.ls_cltr_amnt_stable / POWER(10, cr.decimal_digits) AS down_payment
        |  FROM states
        |  JOIN o ON st_contract_id = o.ls_contract_id
        |  JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |  JOIN cr ON cr.ticker = o.ls_cltr_symbol),
        |lease_value AS (
        |  SELECT st_contract_id AS lv_contract, "hour" AS lv_hour,
        |    st_amnt_stable / POWER(10, cr.decimal_digits) AS lease_value,
        |    (st_prev_margin_stable + st_current_margin_stable)
        |      / pc.lpn_decimals AS margin_interest,
        |    (st_prev_interest_stable + st_current_interest_stable)
        |      / pc.lpn_decimals AS loan_interest
        |  FROM states
        |  JOIN o ON st_contract_id = o.ls_contract_id
        |  JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |  JOIN cr ON cr.ticker = o.ls_asset_symbol),
        |lease_hours AS (SELECT DISTINCT "hour" FROM states),
        |norm_repay AS (
        |  SELECT l_orderkey AS nr_contract,
        |    date_trunc('hour', l_shipdate) AS rep_hour,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) + CAST(l_quantity AS DECIMAL(18,2))
        |      + CAST(l_tax AS DECIMAL(18,2)) + CAST(l_linenumber AS DECIMAL(18,2))
        |      + CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS rep_micro
        |  FROM lineitem
        |  JOIN o ON l_orderkey = o.ls_contract_id
        |  JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |  WHERE l_returnflag = 'R' AND l_orderkey % 500 = 17),
        |repay_summary AS (
        |  SELECT h."hour" AS rs_hour, nr.nr_contract AS rs_contract,
        |    CAST(SUM(CAST(CAST(floor(nr.rep_micro + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS cumulative_repayment
        |  FROM lease_hours h
        |  LEFT JOIN norm_repay nr ON nr.rep_hour <= h."hour"
        |  GROUP BY h."hour", nr.nr_contract)
        |SELECT DISTINCT ON (lv.lv_hour)
        |  lv.lv_hour AS "hour", lv.lv_contract AS contract_id,
        |  (lv.lease_value - dp.loan - dp.down_payment - lv.margin_interest
        |    - lv.loan_interest - COALESCE(rs.cumulative_repayment, 0))
        |    AS hourly_unrealized_pnl
        |FROM lease_value lv
        |LEFT JOIN dp_loan dp
        |  ON lv.lv_contract = dp.dp_contract AND lv.lv_hour = dp.dp_hour
        |LEFT JOIN repay_summary rs
        |  ON lv.lv_contract = rs.rs_contract AND lv.lv_hour = rs.rs_hour
        |ORDER BY lv.lv_hour, lv.lv_contract, hourly_unrealized_pnl""".stripMargin,
    "q_lit_monthly_active" ->
      """WITH o AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_orderdate AS ls_timestamp FROM orders),
        |ev AS (SELECT date_trunc('microseconds', ts) AS ts, user_id, event_type
        |  FROM events),
        |market_close_with_owners AS (
        |  SELECT l_shipdate AS ts, o.ls_address_id AS address
        |  FROM lineitem JOIN o ON l_orderkey = o.ls_contract_id
        |  WHERE l_returnflag = 'A'),
        |repayment_with_owners AS (
        |  SELECT l_shipdate AS ts, o.ls_address_id AS address
        |  FROM lineitem JOIN o ON l_orderkey = o.ls_contract_id
        |  WHERE l_returnflag = 'R'),
        |combined_data AS (
        |  SELECT ls_timestamp AS ts, ls_address_id AS address FROM o
        |  UNION ALL
        |  SELECT ts, user_id FROM ev WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT ts, user_id FROM ev WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT ts, address FROM market_close_with_owners
        |  UNION ALL
        |  SELECT ts, address FROM repayment_with_owners)
        |SELECT strftime(ts, '%Y-%m') AS month,
        |  COUNT(DISTINCT address) AS unique_addresses
        |FROM combined_data
        |WHERE ts > TIMESTAMP '1995-01-01'
        |GROUP BY month
        |ORDER BY month ASC""".stripMargin,
    "q_lit_daily_open_close" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    CAST(c_nationkey % 3 + 1 AS DOUBLE) AS stable_currency_decimals
        |  FROM customer),
        |fo AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_loan_pool_id,
        |    o_orderdate AS ls_timestamp, o_totalprice AS ls_loan_amnt
        |  FROM orders WHERE o_orderdate > TIMESTAMP '1996-06-01'),
        |fa AS (SELECT l_orderkey AS cl_contract, l_shipdate AS cl_ts,
        |    l_extendedprice AS cl_principal FROM lineitem
        |  WHERE l_returnflag = 'A' AND l_shipdate > TIMESTAMP '1996-06-01'),
        |fr AS (SELECT l_orderkey AS cl_contract, l_shipdate AS cl_ts,
        |    l_extendedprice AS cl_principal FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_shipdate > TIMESTAMP '1996-06-01'),
        |fn AS (SELECT l_orderkey AS cl_contract, l_shipdate AS cl_ts,
        |    l_extendedprice AS cl_principal FROM lineitem
        |  WHERE l_returnflag = 'N' AND l_shipdate > TIMESTAMP '1996-06-01'),
        |date_series AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(MIN(lo) AS DATE), CAST(MAX(hi) AS DATE),
        |    INTERVAL '1 day')) AS DATE) AS "date"
        |  FROM (
        |    SELECT MIN(cl_ts) AS lo, MAX(cl_ts) AS hi FROM fa
        |    UNION ALL SELECT MIN(cl_ts), MAX(cl_ts) FROM fr
        |    UNION ALL SELECT MIN(cl_ts), MAX(cl_ts) FROM fn
        |    UNION ALL SELECT MIN(ls_timestamp), MAX(ls_timestamp) FROM fo
        |  ) combined_dates),
        |close_loans AS (
        |  SELECT * FROM fa UNION ALL SELECT * FROM fr UNION ALL SELECT * FROM fn),
        |all_o AS (SELECT o_orderkey AS ls_contract_id,
        |    o_custkey AS ls_loan_pool_id FROM orders),
        |daily_closed AS (
        |  SELECT ds."date" AS closed_date,
        |    CAST(COALESCE(SUM(CAST(CAST(floor(CAST(cl.cl_principal AS DECIMAL(20,2))
        |        * (CASE CAST(pc.stable_currency_decimals AS INT)
        |            WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |            WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |            ELSE CAST('333333.333333' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |        * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))),
        |      CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS closed_loans
        |  FROM date_series ds
        |  LEFT JOIN close_loans cl ON CAST(cl.cl_ts AS DATE) = ds."date"
        |  LEFT JOIN all_o o ON o.ls_contract_id = cl.cl_contract
        |  LEFT JOIN pc ON pc.pool_id = o.ls_loan_pool_id
        |  GROUP BY ds."date"),
        |daily_opened AS (
        |  SELECT ds."date" AS opened_date,
        |    CAST(COALESCE(SUM(CAST(CAST(floor(CAST(lo.ls_loan_amnt AS DECIMAL(20,2))
        |        * (CASE CAST(pc.lpn_decimals AS INT)
        |            WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |            WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |            WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |            ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |        * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))),
        |      CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS opened_loans
        |  FROM date_series ds
        |  LEFT JOIN fo lo ON CAST(lo.ls_timestamp AS DATE) = ds."date"
        |  LEFT JOIN pc ON lo.ls_loan_pool_id = pc.pool_id
        |  GROUP BY ds."date")
        |SELECT COALESCE(c.closed_date, op.opened_date) AS "date",
        |  COALESCE(c.closed_loans, 0) AS closed_loans,
        |  COALESCE(op.opened_loans, 0) AS opened_loans
        |FROM daily_closed c
        |FULL OUTER JOIN daily_opened op ON c.closed_date = op.opened_date
        |ORDER BY "date" ASC""".stripMargin,
    "q_lit_earn_apr" ->
      """WITH latest_aggregation AS (
        |  SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |last_hour_states AS (
        |  SELECT l_orderkey AS st_contract FROM lineitem
        |  WHERE l_shipdate = (SELECT max_ts FROM latest_aggregation)),
        |last_hour_pool_state AS (
        |  SELECT CAST(l_quantity AS DOUBLE)
        |      / NULLIF(CAST(l_extendedprice AS DOUBLE), 0.0) AS utilization_rate
        |  FROM lineitem
        |  WHERE l_partkey % 25 = 7
        |  ORDER BY l_shipdate DESC, l_extendedprice DESC, l_quantity DESC
        |  LIMIT 1),
        |o AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_loan_pool_id,
        |    o_orderkey % 200 AS ls_interest FROM orders),
        |apr_calc AS (
        |  SELECT (AVG(o.ls_interest) / 10.0 - 4)
        |    * (SELECT utilization_rate FROM last_hour_pool_state) AS apr
        |  FROM last_hour_states s
        |  JOIN o ON s.st_contract = o.ls_contract_id
        |  WHERE o.ls_loan_pool_id = 7)
        |SELECT floor((power(1 + (apr / 100 / 365), 365) - 1) * 100
        |  * 1000000.0 + 0.5) / 1000000.0 AS percent
        |FROM apr_calc""".stripMargin,
    "q_lit_unrealized_pnl_addr" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    c_nationkey AS lpn_symbol,
        |    CAST(c_nationkey % 4 + 1 AS INT) AS lpn_decimals,
        |    CAST(c_nationkey % 3 + 1 AS INT) AS stable_currency_decimals
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |o AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_custkey AS ls_loan_pool_id, o_orderkey % 25 AS ls_asset_symbol,
        |    o_custkey % 25 AS ls_cltr_symbol, o_totalprice AS ls_cltr_amnt_stable
        |  FROM orders),
        |address_contracts AS (
        |  SELECT ls_contract_id FROM o WHERE ls_address_id % 100 = 7),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |latest_states AS (
        |  SELECT DISTINCT ON (l_orderkey)
        |    l_orderkey AS st_contract_id,
        |    CAST(l_extendedprice AS DOUBLE) AS st_principal_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_amnt_stable,
        |    l_discount AS st_prev_margin_stable,
        |    l_tax AS st_current_margin_stable,
        |    CAST(l_linenumber AS DOUBLE) AS st_prev_interest_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_current_interest_stable
        |  FROM lineitem
        |  WHERE l_orderkey IN (SELECT ls_contract_id FROM address_contracts)
        |    AND l_shipdate = (SELECT max_ts FROM latest_aggregation)
        |    AND l_quantity > 0
        |  ORDER BY l_orderkey, l_linenumber DESC,
        |    l_extendedprice DESC, l_quantity DESC, l_discount DESC, l_tax DESC),
        |repayments AS (
        |  SELECT l_orderkey AS r_contract,
        |    CAST(SUM(CAST(l_discount + l_linenumber + l_tax + l_quantity
        |        + l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2))
        |      * (CASE pc.stable_currency_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |      AS total_repayment_micro
        |  FROM lineitem
        |  LEFT JOIN o ON o.ls_contract_id = l_orderkey
        |  JOIN pc ON pc.pool_id = o.ls_loan_pool_id
        |  WHERE l_returnflag = 'R'
        |    AND l_orderkey IN (SELECT ls_contract_id FROM address_contracts)
        |  GROUP BY l_orderkey, pc.stable_currency_decimals),
        |pnl AS (SELECT SUM(CAST(CAST(floor(
        |    CAST(s.st_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_asset.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(s.st_principal_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_lpn.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(o.ls_cltr_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_cltr.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(s.st_prev_margin_stable + s.st_current_margin_stable AS DECIMAL(20,2))
        |      * (CASE pc.lpn_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |  - CAST(s.st_prev_interest_stable + s.st_current_interest_stable AS DECIMAL(20,2))
        |      * (CASE pc.lpn_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |  - COALESCE(rp.total_repayment_micro, CAST(0 AS DECIMAL(34,8)))
        |  + 0.5) AS DECIMAL(20,0))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS pnl_dec
        |FROM latest_states s
        |JOIN o ON s.st_contract_id = o.ls_contract_id
        |JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |JOIN cr cr_asset ON cr_asset.ticker = o.ls_asset_symbol
        |JOIN cr cr_cltr ON cr_cltr.ticker = o.ls_cltr_symbol
        |JOIN cr cr_lpn ON cr_lpn.ticker = pc.lpn_symbol
        |LEFT JOIN repayments rp ON s.st_contract_id = rp.r_contract)
        |SELECT ${microUnitsLongSql("pnl_dec")} AS total_pnl_micro,
        |  ${microUnitsDoubleSql("pnl_dec")} AS total_pnl
        |FROM pnl""".stripMargin,
    "q_lit_unrealized_pnl" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    c_nationkey AS lpn_symbol,
        |    CAST(c_nationkey % 4 + 1 AS INT) AS lpn_decimals,
        |    CAST(c_nationkey % 3 + 1 AS INT) AS stable_currency_decimals
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |o AS (SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_custkey AS ls_loan_pool_id, o_orderkey % 25 AS ls_asset_symbol,
        |    o_custkey % 25 AS ls_cltr_symbol, o_totalprice AS ls_cltr_amnt_stable
        |  FROM orders),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |latest_states AS (
        |  SELECT DISTINCT ON (l_orderkey)
        |    l_orderkey AS st_contract_id,
        |    CAST(l_extendedprice AS DOUBLE) AS st_principal_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_amnt_stable,
        |    l_discount AS st_prev_margin_stable,
        |    l_tax AS st_current_margin_stable,
        |    CAST(l_linenumber AS DOUBLE) AS st_prev_interest_stable,
        |    CAST(l_quantity AS DOUBLE) AS st_current_interest_stable
        |  FROM lineitem
        |  WHERE l_shipdate = (SELECT max_ts FROM latest_aggregation)
        |  ORDER BY l_orderkey, l_linenumber DESC,
        |    l_extendedprice DESC, l_quantity DESC, l_discount DESC, l_tax DESC),
        |repayments AS (
        |  SELECT l_orderkey AS r_contract,
        |    CAST(SUM(CAST(l_discount + l_linenumber + l_tax + l_quantity
        |        + l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(20,2))
        |      * (CASE pc.stable_currency_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |      AS total_repayment_micro
        |  FROM lineitem
        |  LEFT JOIN o ON o.ls_contract_id = l_orderkey
        |  JOIN pc ON pc.pool_id = o.ls_loan_pool_id
        |  WHERE l_returnflag = 'R'
        |    AND l_orderkey IN (SELECT st_contract_id FROM latest_states)
        |  GROUP BY l_orderkey, pc.stable_currency_decimals),
        |pnl AS (SELECT SUM(CAST(CAST(floor(
        |    CAST(s.st_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_asset.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(s.st_principal_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_lpn.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(o.ls_cltr_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr_cltr.decimal_digits) AS DECIMAL(6,0))
        |  - CAST(s.st_prev_margin_stable + s.st_current_margin_stable AS DECIMAL(20,2))
        |      * (CASE pc.lpn_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |  - CAST(s.st_prev_interest_stable + s.st_current_interest_stable AS DECIMAL(20,2))
        |      * (CASE pc.lpn_decimals
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          WHEN 4 THEN CAST('250000.000000' AS DECIMAL(13,6)) END)
        |  - COALESCE(rp.total_repayment_micro, CAST(0 AS DECIMAL(34,8)))
        |  + 0.5) AS DECIMAL(20,0))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS pnl_dec
        |FROM latest_states s
        |JOIN o ON s.st_contract_id = o.ls_contract_id
        |JOIN pc ON o.ls_loan_pool_id = pc.pool_id
        |JOIN cr cr_asset ON cr_asset.ticker = o.ls_asset_symbol
        |JOIN cr cr_cltr ON cr_cltr.ticker = o.ls_cltr_symbol
        |JOIN cr cr_lpn ON cr_lpn.ticker = pc.lpn_symbol
        |LEFT JOIN repayments rp ON s.st_contract_id = rp.r_contract
        |WHERE s.st_amnt_stable > 0)
        |SELECT ${microUnitsLongSql("pnl_dec")} AS total_pnl_micro,
        |  ${microUnitsDoubleSql("pnl_dec")} AS total_pnl
        |FROM pnl""".stripMargin,
    "q_lit_earnings" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    c_nationkey AS lpn_symbol,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    c_custkey % 7 AS protocol,
        |    c_acctbal > 0 AS is_active
        |  FROM customer),
        |latest_lender_state AS (
        |  SELECT DISTINCT ON (l_partkey % 25)
        |    l_partkey % 25 AS ls_pool, l_shipdate AS ls_ts,
        |    CAST(l_extendedprice AS DOUBLE) AS lender_stable,
        |    CAST(l_quantity AS DOUBLE) AS lender_asset
        |  FROM lineitem
        |  WHERE l_suppkey % 100 = 7
        |  ORDER BY l_partkey % 25, l_shipdate DESC, l_extendedprice DESC,
        |    l_quantity DESC),
        |deposits AS (
        |  SELECT l_partkey % 25 AS d_pool,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS deposited_stable,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS deposited_asset
        |  FROM lineitem d
        |  WHERE l_linestatus = 'O' AND l_suppkey % 100 = 7
        |    AND EXISTS (SELECT 1 FROM latest_lender_state ls
        |      WHERE ls.ls_pool = d.l_partkey % 25 AND d.l_shipdate <= ls.ls_ts)
        |  GROUP BY l_partkey % 25),
        |withdrawals AS (
        |  SELECT l_partkey % 25 AS w_pool,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS withdrawn_stable,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS withdrawn_asset
        |  FROM lineitem w
        |  WHERE l_linestatus = 'F' AND l_returnflag = 'R' AND l_suppkey % 100 = 7
        |    AND EXISTS (SELECT 1 FROM latest_lender_state ls
        |      WHERE ls.ls_pool = w.l_partkey % 25 AND w.l_shipdate <= ls.ls_ts)
        |  GROUP BY l_partkey % 25),
        |long_protocols AS (
        |  SELECT DISTINCT protocol FROM pc
        |  WHERE position_type = 'Long' AND is_active),
        |latest_prices AS (
        |  SELECT DISTINCT ON (l_partkey % 25)
        |    l_partkey % 25 AS mp_symbol, l_shipdate AS mp_ts,
        |    CAST(l_extendedprice AS DOUBLE) AS mp_price
        |  FROM lineitem
        |  JOIN long_protocols lp ON l_suppkey % 7 = lp.protocol
        |  ORDER BY l_partkey % 25, l_shipdate DESC, l_extendedprice DESC),
        |pool_earnings AS (
        |  SELECT ap.pool_id,
        |    CASE
        |      WHEN ap.position_type = 'Long' THEN
        |        CAST(CAST(CAST(ls.lender_stable AS DECIMAL(18,2))
        |          - (COALESCE(dep.deposited_stable, CAST(0 AS DECIMAL(24,2)))
        |             - COALESCE(wdr.withdrawn_stable, CAST(0 AS DECIMAL(24,2))))
        |          AS DECIMAL(24,2))
        |        * (CASE CAST(ap.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS DECIMAL(36,10))
        |      WHEN ap.position_type = 'Short' THEN
        |        CAST(CAST(CAST(CAST(ls.lender_asset AS DECIMAL(18,2))
        |          - (COALESCE(dep.deposited_asset, CAST(0 AS DECIMAL(24,2)))
        |             - COALESCE(wdr.withdrawn_asset, CAST(0 AS DECIMAL(24,2))))
        |          AS DECIMAL(20,2))
        |        * CAST(COALESCE(lp.mp_price, 0) AS DECIMAL(9,2)) AS DECIMAL(22,4))
        |        * (CASE CAST(ap.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) AS DECIMAL(36,10))
        |      ELSE CAST(0 AS DECIMAL(36,10))
        |    END AS earnings_micro
        |  FROM pc ap
        |  JOIN latest_lender_state ls ON ap.pool_id = ls.ls_pool
        |  LEFT JOIN deposits dep ON ap.pool_id = dep.d_pool
        |  LEFT JOIN withdrawals wdr ON ap.pool_id = wdr.w_pool
        |  LEFT JOIN latest_prices lp
        |    ON ap.lpn_symbol = lp.mp_symbol AND ap.position_type = 'Short'
        |  WHERE ap.is_active),
        |earn AS (
        |  SELECT COALESCE(SUM(CAST(CAST(floor(GREATEST(earnings_micro, CAST(0 AS DECIMAL(36,10)))
        |    + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))),
        |  CAST(0 AS DECIMAL(38,6))) AS earn_dec
        |  FROM pool_earnings)
        |SELECT ${microUnitsLongSql("earn_dec")} AS total_earnings_micro,
        |  ${microUnitsDoubleSql("earn_dec")} AS total_earnings_in_stable
        |FROM earn""".stripMargin,
    "q_lit_price_range" ->
      """SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS min_price,
        |  MAX(CAST(l_extendedprice AS DOUBLE)) AS max_price
        |FROM lineitem
        |WHERE l_partkey % 25 = 7
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1997-01-01'""".stripMargin,
    "q_lit_price_latest" ->
      """SELECT CAST(l_extendedprice AS DOUBLE) AS mp_price
        |FROM lineitem
        |WHERE l_partkey % 25 = 7 AND l_suppkey % 7 = 3
        |ORDER BY l_shipdate DESC, l_extendedprice DESC
        |LIMIT 1""".stripMargin,
    "q_lit_open_position_value" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    c_nationkey AS lpn_symbol
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened AS (
        |  SELECT s.l_orderkey AS st_contract_id,
        |    CAST(s.l_quantity AS DOUBLE) AS st_amnt_stable,
        |    CASE WHEN pc.position_type = 'Short'
        |         THEN CAST(pc.lpn_symbol AS VARCHAR) || ' (Short)'
        |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS token,
        |    cr.decimal_digits AS asset_decimals
        |  FROM lineitem s
        |  CROSS JOIN latest_aggregation la
        |  JOIN orders o ON o.o_orderkey = s.l_orderkey
        |  LEFT JOIN pc ON o.o_custkey = pc.pool_id
        |  LEFT JOIN cr ON cr.ticker = o.o_orderkey % 25
        |  WHERE s.l_shipdate = la.max_ts AND s.l_quantity > 0),
        |lease_value_table AS (
        |  SELECT token,
        |    CAST(CAST(floor(CAST(st_amnt_stable AS DECIMAL(20,2))
        |        * CAST(POWER(10, 6 - asset_decimals) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS lease_value
        |  FROM opened)
        |SELECT CAST(SUM(lease_value) AS DOUBLE) AS open_position_value
        |FROM lease_value_table""".stripMargin,
    "q_lit_open_interest" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    c_nationkey AS lpn_symbol
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |opened AS (
        |  SELECT s.l_orderkey AS st_contract_id,
        |    (s.l_discount + s.l_linenumber + s.l_tax + s.l_quantity) AS interest,
        |    cr.decimal_digits AS asset_decimals
        |  FROM lineitem s
        |  CROSS JOIN latest_aggregation la
        |  JOIN orders o ON o.o_orderkey = s.l_orderkey
        |  LEFT JOIN pc ON o.o_custkey = pc.pool_id
        |  LEFT JOIN cr ON cr.ticker = o.o_orderkey % 25
        |  WHERE s.l_shipdate = la.max_ts),
        |oi AS (
        |  SELECT SUM(CAST(CAST(floor(CAST(interest AS DECIMAL(20,2))
        |    * CAST(POWER(10, 6 - asset_decimals) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS oi_dec
        |  FROM opened)
        |SELECT ${microUnitsLongSql("oi_dec")} AS open_interest_micro,
        |  ${microUnitsDoubleSql("oi_dec")} AS open_interest
        |FROM oi""".stripMargin,
    "q_lit_historically_repaid" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |closed_loans AS (
        |  SELECT l_orderkey AS cl_contract, l_shipdate AS cl_ts,
        |    l_extendedprice AS cl_amnt_stable, l_linestatus = 'F' AS cl_loan_close,
        |    l_partkey % 25 AS cl_amount_symbol
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT l_orderkey, l_shipdate, l_extendedprice, l_linestatus = 'F',
        |    l_partkey % 25
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT o_orderkey AS contract_id,
        |  o_orderkey % 25 AS symbol,
        |  o_totalprice / pc.lpn_decimals AS loan,
        |  CAST(COALESCE(SUM(CAST(CAST(floor(CAST(cl.cl_amnt_stable AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))),
        |    CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS total_repaid,
        |  MAX(CASE WHEN cl.cl_loan_close THEN cl.cl_ts END) AS close_timestamp,
        |  CASE WHEN SUM(CASE WHEN cl.cl_loan_close THEN 1 ELSE 0 END) > 0
        |    THEN 'yes' ELSE 'no' END AS loan_closed
        |FROM orders
        |LEFT JOIN closed_loans cl ON o_orderkey = cl.cl_contract
        |JOIN cr ON cr.ticker = cl.cl_amount_symbol
        |JOIN pc ON pc.pool_id = o_custkey
        |GROUP BY o_orderkey, o_orderkey % 25, o_totalprice, pc.lpn_decimals""".stripMargin,
    "q_lit_rewards_distributed" ->
      """SELECT CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(38,8)) AS DOUBLE) AS distributed
        |FROM events WHERE event_type = 'view'""".stripMargin,
    "q_lit_borrow_apr" ->
      """SELECT apr FROM (
        |  SELECT o_orderkey % 200 / 10.0 AS apr, o_orderdate
        |  FROM orders
        |  WHERE o_custkey = 7 AND o_orderdate > TIMESTAMP '1996-06-01'
        |  ORDER BY o_orderdate DESC, apr DESC) t""".stripMargin,
    "q_lit_borrow_apr_window" ->
      """SELECT apr FROM (
        |  SELECT o_orderkey % 200 / 10.0 AS apr, o_orderdate
        |  FROM orders
        |  WHERE o_custkey = 7 AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate > TIMESTAMP '1996-06-01'
        |  ORDER BY o_orderdate DESC, apr DESC) t""".stripMargin,
    "q_lit_borrowed_by_protocols" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer)
        |SELECT o_custkey AS protocol,
        |  CAST(COALESCE(SUM(CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))),
        |    CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS loan
        |FROM orders JOIN pc ON pc.pool_id = o_custkey
        |GROUP BY o_custkey""".stripMargin,
    "q_lit_position_value" ->
      """WITH cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation)
        |SELECT l_shipdate AS "time",
        |  CAST(SUM(CAST(CAST(floor(CAST(l_quantity AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS amount
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey AND o_custkey % 100 = 7
        |JOIN cr ON cr.ticker = o_orderkey % 25
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01'
        |GROUP BY l_shipdate
        |ORDER BY l_shipdate""".stripMargin,
    "q_lit_debt_value" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer)
        |SELECT l_shipdate AS "time",
        |  CAST(SUM(CAST(CAST(floor(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      + CAST(l_discount AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))
        |      + CAST(l_linenumber AS DECIMAL(18,2)) + CAST(l_quantity AS DECIMAL(18,2))
        |      AS DECIMAL(20,2))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS amount
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey AND o_custkey % 100 = 7
        |JOIN pc ON pc.pool_id = o_custkey
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01'
        |GROUP BY l_shipdate
        |ORDER BY l_shipdate""".stripMargin,
    "q_lit_historically_liquidated" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL
        |         WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'Long'
        |         ELSE 'Short' END AS position_type,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals,
        |    c_name AS label
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |liquidation_amounts AS (
        |  SELECT o_orderkey AS ls_contract_id,
        |    CASE WHEN pc.position_type = 'Short' THEN CONCAT(pc.label, ' (Short)')
        |         ELSE CAST(o_orderkey % 25 AS VARCHAR) END AS asset,
        |    o_totalprice / pc.lpn_decimals AS loan,
        |    CAST(CAST(floor(CAST(lsl.l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS liq_amount
        |  FROM orders
        |  LEFT JOIN (SELECT l_orderkey, l_extendedprice FROM lineitem
        |    WHERE l_returnflag = 'N') lsl ON o_orderkey = lsl.l_orderkey
        |  JOIN pc ON o_custkey = pc.pool_id
        |  JOIN cr ON cr.ticker = o_orderkey % 25)
        |SELECT ls_contract_id AS contract_id, asset, loan,
        |  CAST(SUM(liq_amount) AS DOUBLE) AS total_liquidated
        |FROM liquidation_amounts
        |GROUP BY ls_contract_id, asset, loan""".stripMargin,
    "q_lit_realized_pnl_stats" ->
      s"""WITH cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |closings AS (
        |  SELECT o_orderkey AS c_contract, o_totalprice AS c_pnl,
        |    o_orderkey % 25 AS asset_symbol
        |  FROM orders
        |  WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1997-01-01'),
        |pnls AS (
        |  SELECT SUM(CAST(CAST(floor(CAST(c.c_pnl AS DECIMAL(20,2))
        |    * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS pnls_dec
        |  FROM closings c
        |  LEFT JOIN orders o ON c.c_contract = o.o_orderkey
        |  JOIN cr ON cr.ticker = o.o_orderkey % 25)
        |SELECT ${microUnitsLongSql("pnls_dec")} AS total_adjusted_micro,
        |  ${microUnitsDoubleSql("pnls_dec")} AS total_adjusted_stable_amount
        |FROM pnls""".stripMargin,
    "q_lit_first_block" ->
      """SELECT o_orderkey AS id FROM orders ORDER BY id ASC LIMIT 1""".stripMargin,
    "q_lit_last_block" ->
      """SELECT o_orderkey AS id FROM orders ORDER BY id DESC LIMIT 1""".stripMargin,
    "q_lit_block_one" ->
      """SELECT o_orderkey AS id, o_orderdate AS created_at
        |FROM orders WHERE o_orderkey = 77""".stripMargin,
    "q_lit_block_count" ->
      """SELECT COUNT(1) AS n_blocks FROM orders""".stripMargin,
    "q_lit_block_synced_count" ->
      """SELECT COUNT(1) AS n_synced FROM orders WHERE o_orderkey <= 750""".stripMargin,
    "q_lit_action_last" ->
      """SELECT event_id AS id, event_type AS action_type,
        |  date_trunc('second', ts) AS created_at
        |FROM events WHERE event_type = 'signup'
        |ORDER BY date_trunc('second', ts) DESC, event_id DESC LIMIT 1""".stripMargin,
    "q_lit_action_last_before" ->
      """SELECT event_id AS id, event_type AS action_type,
        |  date_trunc('second', ts) AS created_at
        |FROM events
        |WHERE event_type = 'signup'
        |  AND date_trunc('microseconds', ts) < TIMESTAMP '2024-01-15'
        |ORDER BY date_trunc('second', ts) DESC, event_id DESC LIMIT 1""".stripMargin,
    "q_lit_withdraw_count_closed" ->
      """SELECT COUNT(1) AS n_closed FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_lit_withdraw_sum" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS withdrawn_stable,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS withdrawn_cents
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_lit_withdraw_by_tx" ->
      """SELECT c_custkey AS id, c_name AS tx_hash, c_mktsegment AS segment
        |FROM customer WHERE c_name = 'Customer#000000007'""".stripMargin,
    "q_lit_close_by_contract" ->
      """SELECT l_orderkey AS contract_id, l_shipdate AS close_ts,
        |  l_extendedprice AS amnt_stable, l_linestatus = 'F' AS loan_close,
        |  l_linenumber AS line
        |FROM lineitem WHERE l_returnflag = 'A' AND l_orderkey = 77
        |ORDER BY close_ts ASC, line ASC, amnt_stable ASC""".stripMargin,
    "q_lit_closing_count" ->
      """SELECT COUNT(1) AS n_closings FROM lineitem
        |WHERE l_returnflag = 'A'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_lit_pool_all" ->
      """SELECT s_suppkey AS lp_pool_id, s_suppkey % 25 AS lp_symbol,
        |  CAST(s_suppkey % 2 AS INT) AS lp_status
        |FROM supplier ORDER BY lp_pool_id ASC""".stripMargin,
    "q_lit_closed_close_by_contract" ->
      """SELECT l_orderkey AS contract_id, l_shipdate AS close_ts,
        |  l_extendedprice AS amnt_stable, l_linenumber AS line
        |FROM lineitem
        |WHERE l_returnflag = 'A' AND l_orderkey = 77 AND l_linestatus = 'F'
        |ORDER BY close_ts ASC, line ASC, amnt_stable ASC""".stripMargin,
    "q_lit_lease_get" ->
      """SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |  o_orderdate AS ls_timestamp,
        |  o_orderkey % 25 AS ls_asset_symbol, o_custkey % 25 AS ls_cltr_symbol,
        |  o_totalprice AS ls_cltr_amnt_stable, o_totalprice AS ls_loan_amnt,
        |  o_custkey AS ls_loan_pool_id, o_orderpriority AS open_tx_hash,
        |  o_orderstatus AS ls_status, o_orderkey % 200 AS ls_interest,
        |  o_totalprice AS ls_lpn_loan_amnt,
        |  CAST(o_orderkey % 4 + 1 AS DOUBLE) AS ls_lpn_decimals
        |FROM orders WHERE o_orderkey = 77
        |ORDER BY ls_contract_id ASC""".stripMargin,
    "q_lit_leases_in" ->
      """SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |  o_orderdate AS ls_timestamp,
        |  o_orderkey % 25 AS ls_asset_symbol, o_custkey % 25 AS ls_cltr_symbol,
        |  o_totalprice AS ls_cltr_amnt_stable, o_totalprice AS ls_loan_amnt,
        |  o_custkey AS ls_loan_pool_id, o_orderpriority AS open_tx_hash,
        |  o_orderstatus AS ls_status, o_orderkey % 200 AS ls_interest,
        |  o_totalprice AS ls_lpn_loan_amnt,
        |  CAST(o_orderkey % 4 + 1 AS DOUBLE) AS ls_lpn_decimals
        |FROM orders WHERE o_orderkey IN (7, 77, 777, 7777, 14777)
        |ORDER BY ls_contract_id ASC""".stripMargin,
    "q_lit_loan_collect_all" ->
      """SELECT l_orderkey AS ls_contract_id, l_partkey % 25 AS ls_symbol,
        |  l_quantity AS ls_amount, l_extendedprice AS ls_amount_stable
        |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'O'
        |ORDER BY ls_contract_id, ls_symbol, ls_amount, ls_amount_stable""".stripMargin,
    "q_lit_leases_search" ->
      """SELECT ls_contract_id FROM (
        |  SELECT o_orderkey AS ls_contract_id, o_custkey AS ls_address_id,
        |    o_orderdate AS ls_timestamp FROM orders) a
        |WHERE ls_address_id % 10 = 7
        |  AND CAST(ls_contract_id AS VARCHAR) ILIKE '%' || '42' || '%'
        |ORDER BY ls_timestamp DESC, ls_contract_id DESC
        |OFFSET 5 LIMIT 20""".stripMargin,
    "q_lit_protocol_active" ->
      """SELECT c_name AS protocol_name,
        |  CAST(c_custkey % 7 AS BIGINT) AS network, c_custkey AS lpp_contract
        |FROM customer WHERE c_acctbal > 0
        |ORDER BY protocol_name ASC""".stripMargin,
    "q_lit_protocol_by_name" ->
      """SELECT c_name AS protocol_name,
        |  CAST(c_custkey % 7 AS BIGINT) AS network, c_custkey AS lpp_contract
        |FROM customer WHERE c_name = 'Customer#000000011'""".stripMargin,
    "q_lit_protocol_count_by_status" ->
      """SELECT count(CASE WHEN c_acctbal > 0 THEN 1 END) AS n_active,
        |  count(CASE WHEN NOT (c_acctbal > 0) THEN 1 END) AS n_deprecated
        |FROM customer""".stripMargin,
    "q_lit_currency_by_ticker" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS ticker, n_name AS protocol,
        |  n_regionkey AS "group"
        |FROM nation WHERE n_nationkey = 7
        |ORDER BY protocol ASC""".stripMargin,
    "q_lit_buyback_total" ->
      """SELECT CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(38,8)) AS DOUBLE) AS bought_back_total
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_lit_incentives_pool" ->
      """SELECT CAST(CAST(CAST(value AS DECIMAL(18,2))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(25,8)) AS DOUBLE) AS incentives_pool
        |FROM events
        |WHERE event_type = 'click'
        |ORDER BY date_trunc('second', ts) DESC, event_id DESC
        |LIMIT 1""".stripMargin,
    "q_lit_txs_page" ->
      """SELECT id, "from", "to", "type", created_at, value FROM (
        |  SELECT event_id AS id, user_id AS "from", event_id % 97 AS "to",
        |    event_type AS "type", date_trunc('second', ts) AS created_at, value
        |  FROM events
        |  WHERE (user_id = 7 OR event_id % 97 = 7)
        |    AND (event_type IN ('purchase', 'signup')
        |         OR (event_type = 'click' AND event_id % 97 IN (3, 5)))
        |  ORDER BY created_at DESC, id DESC
        |  OFFSET 5 LIMIT 25) t""".stripMargin,
    "q_lit_price_asof" ->
      """SELECT CAST(l_extendedprice AS DOUBLE) AS mp_price
        |FROM lineitem
        |WHERE l_partkey % 25 = 7 AND l_suppkey % 7 = 3
        |  AND l_shipdate >= TIMESTAMP '1997-06-01'
        |ORDER BY l_shipdate ASC, l_extendedprice ASC
        |LIMIT 1""".stripMargin,
    "q_lit_tvl" ->
      """WITH pc AS (SELECT c_custkey AS pool_id,
        |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem),
        |lease_value AS (
        |  SELECT CAST(CAST(floor(CAST(s.l_quantity AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS lease_value
        |  FROM lineitem s
        |  LEFT JOIN orders o ON o.o_orderkey = s.l_orderkey
        |  JOIN cr ON cr.ticker = o.o_orderkey % 25
        |  WHERE s.l_shipdate = (SELECT max_ts FROM latest_aggregation)),
        |pool_available AS (
        |  SELECT CAST(CAST(floor(
        |      (CAST(lps.tvl AS DECIMAL(20,2)) - CAST(lps.borrowed_st AS DECIMAL(20,2)))
        |      * (CASE CAST(pc.lpn_decimals AS INT)
        |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
        |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
        |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
        |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END)
        |      + 0.5) AS DECIMAL(20,0))
        |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS available_assets
        |  FROM (
        |    SELECT DISTINCT ON (lp_pool) lp_pool, lp_ts, tvl, borrowed_st
        |    FROM (SELECT l_partkey % 25 AS lp_pool, l_shipdate AS lp_ts,
        |        CAST(l_extendedprice AS DOUBLE) AS tvl,
        |        CAST(l_quantity AS DOUBLE) AS borrowed_st
        |      FROM lineitem) t
        |    WHERE lp_pool IN (2, 7, 11, 19)
        |    ORDER BY lp_pool, lp_ts DESC, tvl DESC, borrowed_st DESC) lps
        |  JOIN pc ON pc.pool_id = lps.lp_pool),
        |lease_value_sum AS (
        |  SELECT SUM(lease_value) AS total_lease_value FROM lease_value),
        |pool_available_sum AS (
        |  SELECT COALESCE(SUM(available_assets), CAST(0 AS DECIMAL(38,6)))
        |    AS total_available FROM pool_available)
        |SELECT CAST((SELECT total_lease_value FROM lease_value_sum)
        |  + (SELECT total_available FROM pool_available_sum) AS DOUBLE) AS tvl""".stripMargin,
    "q_lit_realized_pnl_wallet" ->
      realizedPnlWalletSql("o_orderdate >= TIMESTAMP '1996-01-01'",
        "\n        |OFFSET 10 LIMIT 40"),
    "q_lit_realized_pnl_wallet_window" ->
      realizedPnlWalletSql(
        "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate > TIMESTAMP '1996-09-01'",
        ""),
    "q_lit_repayment_sums" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS prev_margin_stable,
        |  CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS prev_margin_cents,
        |  CAST(CAST(SUM(CAST(l_linenumber AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS prev_interest_stable,
        |  CAST(SUM(CAST(CAST(l_linenumber AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS prev_interest_cents,
        |  CAST(CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS current_margin_stable,
        |  CAST(SUM(CAST(CAST(l_tax AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS current_margin_cents,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS current_interest_stable,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS current_interest_cents,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS principal_stable,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS principal_cents
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_lit_opened_count" ->
      """SELECT COUNT(*) AS opened_count
        |FROM orders
        |WHERE o_orderdate > TIMESTAMP '1996-01-01'
        |  AND o_orderdate <= TIMESTAMP '1998-01-01'""".stripMargin
  )

  /** Oracle mirror of [[suppliedBorrowed]] — the 4 endpoint variants share
    * one text modulo the WHERE clause.
    */
  private def suppliedBorrowedSql(where: String): String =
    s"""WITH pc AS (SELECT c_custkey AS pool_id,
       |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer),
       |lps AS (SELECT l_partkey % 25 AS lp_pool, l_shipdate AS lp_ts,
       |    CAST(l_extendedprice AS DOUBLE) AS tvl,
       |    CAST(l_quantity AS DOUBLE) AS borrowed_st FROM lineitem)
       |SELECT lp_ts AS "timestamp",
       |  CAST(SUM(CAST(CAST(floor(CAST(tvl AS DECIMAL(20,2))
       |      * (CASE CAST(pc.lpn_decimals AS INT)
       |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
       |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
       |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
       |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
       |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS supplied,
       |  CAST(SUM(CAST(CAST(floor(CAST(borrowed_st AS DECIMAL(20,2))
       |      * (CASE CAST(pc.lpn_decimals AS INT)
       |          WHEN 1 THEN CAST('1000000.000000' AS DECIMAL(13,6))
       |          WHEN 2 THEN CAST('500000.000000' AS DECIMAL(13,6))
       |          WHEN 3 THEN CAST('333333.333333' AS DECIMAL(13,6))
       |          ELSE CAST('250000.000000' AS DECIMAL(13,6)) END) + 0.5) AS DECIMAL(20,0))
       |    * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6))) AS DOUBLE) AS borrowed
       |FROM lps JOIN pc ON lp_pool = pc.pool_id
       |WHERE $where
       |GROUP BY lp_ts
       |ORDER BY lp_ts DESC""".stripMargin
}
