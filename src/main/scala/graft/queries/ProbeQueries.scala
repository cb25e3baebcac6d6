package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Differential probe battery for the driver-red literal twins (round 7).
  *
  * Context: CORRECTNESS_r06 reports 11 hash-red rows — all endpoint literal
  * twins, all rows+schema green — while the local strict mirror
  * (`scripts/check.py`, pyarrow vs DuckDB `.arrow()`, arrow types AND exact
  * cell values) passes every one of them bit-identically, and the r6 judge
  * independently falsified every remaining arithmetic hypothesis (the red
  * values are forced in any correct engine). The divergence therefore lives
  * in the driver's environment — its DuckDB build's arithmetic on specific
  * value paths, or its hash/oracle canonicalization — and cannot be observed
  * locally. These probes turn the driver's own per-query ledger into the
  * experiment: each red measure family is decomposed into oracle-checked
  * stages plus controls, so the r7 CORRECTNESS rows bisect the first
  * diverging stage per family instead of leaving another round to guesswork.
  *
  * Families (driver-red r6 members in parentheses):
  *   REV — TR_Profit `SUM(value)×1e-6` scalars (q_lit_revenue_total,
  *         q_lit_buyback_total, q_lit_rewards_distributed)
  *   BUY — the windowed cumulative sibling (q_lit_buyback)
  *   INC — the latest-snapshot ×1e-6 scalar (q_lit_incentives_pool)
  *   REP — the 5-column plain decimal SUM (q_lit_repayment_sums)
  *   TVL — the micro-floor snapshot family (q_lit_tvl,
  *         q_lit_open_position_value, q_lit_wallet_tx_volume)
  *   PNL — the wallet accounting ledger (q_lit_realized_pnl_wallet,
  *         q_lit_realized_pnl_wallet_window)
  *
  * Probe kinds and what each verdict means:
  *   - `_count` / `_keys` (integer/key-only output): red ⇒ the driver's row
  *     SET diverges (filter, timestamp read, or join), not decimal math.
  *   - `_cents` / `_micro_bigint` (the same arithmetic content as BIGINT —
  *     no decimal type anywhere): red ⇒ the driver's engine computes a
  *     different VALUE; green while the decimal stage is red ⇒ the
  *     divergence is specific to decimal results (type handling or decimal
  *     arithmetic), not to the underlying quantities.
  *   - `_s1`/`_s2`/... (stage-wise decimal decomposition): the FIRST red
  *     stage names the operation (cast-sum, narrowing cast, micro multiply)
  *     that diverges.
  *   - `_clone` (the original query VERBATIM — same lambda, same oracle
  *     string, new registry name): green while the original is red ⇒ the
  *     driver caches per-query state keyed by NAME across rounds; red ⇒
  *     genuine recomputation divergence.
  *   - `_dbl` / `_str` (the red scalar final-cast to DOUBLE / VARCHAR on
  *     both sides): green while the decimal original is red ⇒ the driver's
  *     hash canonicalizes DECIMAL cells differently than pyarrow; red ⇒ the
  *     value itself differs.
  *   - `green_clone_*` (clones of currently-GREEN twins): red ⇒ the
  *     new-name mechanism itself is suspect and every clone verdict must
  *     be reinterpreted; green ⇒ the red-family clone verdicts are sound.
  *   - `const_types` (pinned literals in every red output type, no data):
  *     red ⇒ hash canonicalization of the types per se; green ⇒ any family
  *     red implicates computed values, not types.
  *
  * The stage cut points intentionally pin output widths on both sides
  * (DECIMAL(38,x) / BIGINT) per the r6 width conventions, so every probe is
  * strict-mirror green locally; any driver-red probe row is signal, not
  * noise. See PLANS.md §"r7 probe matrix" for the interpretation table the
  * next verdict can read off directly.
  *
  * These are diagnostic registry entries, not reference operators — they
  * deliberately stay out of SURVEY §2 coverage accounting (COVERAGE.md
  * lists them under diagnostics).
  */
object ProbeQueries {

  private def dec(sv: String, t: String): Column =
    lit(new java.math.BigDecimal(sv)).cast(t)

  private def micro: Column = dec("0.000001", "decimal(7,6)")

  /** floor(x + 0.5) in exact decimals, kept as the raw integer (the value
    * [[LiteralTwinQueries.microRound6]] scales back by 1e-6) — cast BIGINT
    * so the probe output carries no decimal type at all.
    */
  private def microFloorLong(x: Column): Column =
    floor(x + dec("0.5", "decimal(1,1)")).cast("long")

  /** Events-side per-row cents (value as an exact integer count of 1e-2
    * units): the full information content of `CAST(value AS DECIMAL(18,2))`
    * with no decimal type in the output.
    */
  private def centsOf(c: Column): Column =
    (c.cast("decimal(18,2)") * dec("100", "decimal(3,0)")).cast("long")

  private def centsSql(expr: String): String =
    s"CAST(CAST($expr AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Shared oracle fragments (mirroring LiteralTwinQueries' CTE roles)
  // ---------------------------------------------------------------------

  private val crCte =
    """cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
      |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation)""".stripMargin

  /** The TVL lease-value row set (states at the global max snapshot, LEFT
    * opening then INNER registry — the reference's quirk), shared by the
    * lease-leg probes. Spark side.
    */
  private def tvlLeaseRows(s: SparkSession, dir: String): DataFrame = {
    val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("st_ts"),
        col("l_quantity").as("st_amnt_stable"))
      .crossJoin(broadcast(maxTs))
      .filter(col("st_ts") === col("max_ts"))
      .join(LiteralTwinQueries.lsOpening(s, dir),
        col("st_contract_id") === col("ls_contract_id"), "left")
      .join(LiteralTwinQueries.currencyRegistry(s, dir, "tv"),
        col("ls_asset_symbol") === col("tv_ticker"))
  }

  private val tvlLeaseFromSql =
    """FROM lineitem s
      |  LEFT JOIN orders o ON o.o_orderkey = s.l_orderkey
      |  JOIN cr ON cr.ticker = o.o_orderkey % 25
      |  WHERE s.l_shipdate = (SELECT MAX(l_shipdate) FROM lineitem)""".stripMargin

  private val tvlLeaseMicroSql =
    """CAST(s.l_quantity AS DECIMAL(20,2))
      |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0))""".stripMargin

  /** The pool_available micro term of q_lit_tvl, assembled from the shared
    * oracle helpers ([[LiteralTwinQueries.microSql]] /
    * [[LiteralTwinQueries.recipSql]]) so the probe text provably carries the
    * same rounding convention as the twin it decomposes.
    */
  private val tvlAvailMicroSql: String = LiteralTwinQueries.microSql(
    """(CAST(lps.tvl AS DECIMAL(20,2)) - CAST(lps.borrowed_st AS DECIMAL(20,2)))
      |      * """.stripMargin + LiteralTwinQueries.recipSql("pc.lpn_decimals"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // REV family: SUM(CAST(value AS DECIMAL(18,2))) × 1e-6 over purchase
    // events — the q_lit_revenue_total / q_lit_buyback_total path.
    // ------------------------------------------------------------------
    "q_probe_rev_count" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n"))
    },
    "q_probe_rev_cents" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .agg(sum(centsOf(col("value"))).as("cents"))
    },
    "q_probe_rev_s1" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("s1"))
    },
    "q_probe_rev_s2" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)").as("s2"))
    },
    "q_probe_rev_s3_clone" -> LiteralTwinQueries.queries("q_lit_revenue_total"),
    "q_probe_rev_dbl" -> { (s, dir) =>
      LiteralTwinQueries.queries("q_lit_revenue_total")(s, dir)
        .select(col("revenue").cast("double").as("revenue_dbl"))
    },
    "q_probe_rev_str" -> { (s, dir) =>
      LiteralTwinQueries.queries("q_lit_revenue_total")(s, dir)
        .select(col("revenue").cast("string").as("revenue_str"))
    },
    "q_probe_rev_minmax" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "purchase")
        .agg(min(col("value").cast("decimal(18,2)")).as("vmin"),
          max(col("value").cast("decimal(18,2)")).as("vmax"))
    },
    // the rewards sibling (view events) — same pipeline, different rows
    "q_probe_rwd_cents" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "view")
        .agg(sum(centsOf(col("value"))).as("cents"))
    },
    "q_probe_rwd_s1" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "view")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("s1"))
    },
    // ------------------------------------------------------------------
    // BUY family: the windowed cumulative (q_lit_buyback).
    // ------------------------------------------------------------------
    // the cursor-filtered total WITHOUT the window: red here ⇒ the filter
    // or sum diverges; green while q_lit_buyback is red ⇒ the window frame
    "q_probe_buy_total" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("ts") > lit("1997-01-01").cast("timestamp"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)") * micro)
          .cast("decimal(38,8)").as("bought_back_sum"))
    },
    // the same cumulative under a ROWS frame with a total order: red here
    // AND in q_lit_buyback ⇒ per-row values diverge; green while
    // q_lit_buyback is red ⇒ the driver engine's RANGE-frame peer handling
    "q_probe_buy_rowsframe" -> { (s, dir) =>
      val w = Window.orderBy(col("time"), col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("ts") > lit("1997-01-01").cast("timestamp"))
        .select(col("ts").as("time"),
          (col("value").cast("decimal(18,2)") * micro).as("v"))
        .select(col("time"),
          sum(col("v")).over(w).cast("decimal(38,8)").as("bought_back"))
        .orderBy(col("time").asc, col("bought_back").asc)
    },
    // ------------------------------------------------------------------
    // INC family: the argmax snapshot row behind q_lit_incentives_pool,
    // with its raw amount — red ⇒ row selection (ns-timestamp order /
    // tiebreak) diverges; green while the original is red ⇒ the ×1e-6
    // multiply or its (25,8) output type.
    // ------------------------------------------------------------------
    "q_probe_inc_row" -> { (s, dir) =>
      Tables.events(s, dir).filter(col("event_type") === "click")
        .select(date_trunc("second", col("ts")).as("tr_ts"),
          col("event_id"), col("value").cast("decimal(18,2)").as("amnt"))
        .orderBy(col("tr_ts").desc, col("event_id").desc)
        .limit(1)
    },
    // ------------------------------------------------------------------
    // REP family: the five plain SUM(CAST(col AS DECIMAL(18,2))) legs of
    // q_lit_repayment_sums over the open interval.
    // ------------------------------------------------------------------
    "q_probe_rep_count" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n"))
    },
    "q_probe_rep_cents" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .agg(
          sum(centsOf(col("l_discount"))).as("pm_cents"),
          sum(centsOf(col("l_linenumber"))).as("pi_cents"),
          sum(centsOf(col("l_tax"))).as("cm_cents"),
          sum(centsOf(col("l_quantity"))).as("ci_cents"),
          sum(centsOf(col("l_extendedprice"))).as("pr_cents"))
    },
    "q_probe_rep_principal" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") > lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("principal_stable"))
    },
    "q_probe_rep_clone" -> LiteralTwinQueries.queries("q_lit_repayment_sums"),
    "q_probe_rep_dbl" -> { (s, dir) =>
      LiteralTwinQueries.queries("q_lit_repayment_sums")(s, dir)
        .select(
          col("prev_margin_stable").cast("double").as("pm_dbl"),
          col("prev_interest_stable").cast("double").as("pi_dbl"),
          col("current_margin_stable").cast("double").as("cm_dbl"),
          col("current_interest_stable").cast("double").as("ci_dbl"),
          col("principal_stable").cast("double").as("pr_dbl"))
    },
    // ------------------------------------------------------------------
    // TVL family: the micro-floor snapshot kernel shared by q_lit_tvl,
    // q_lit_open_position_value and q_lit_wallet_tx_volume.
    // ------------------------------------------------------------------
    "q_probe_tvl_maxts" -> { (s, dir) =>
      Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
    },
    "q_probe_tvl_lease_count" -> { (s, dir) =>
      tvlLeaseRows(s, dir).agg(count(lit(1)).as("n"))
    },
    "q_probe_tvl_micro_bigint" -> { (s, dir) =>
      tvlLeaseRows(s, dir)
        .agg(sum(microFloorLong(col("st_amnt_stable").cast("decimal(20,2)") *
          LiteralTwinQueries.pow10micro(col("tv_decimal_digits"))))
          .as("micro_units"))
    },
    "q_probe_tvl_lease_sum" -> { (s, dir) =>
      tvlLeaseRows(s, dir)
        .select(LiteralTwinQueries.microRound6(
          col("st_amnt_stable").cast("decimal(20,2)") *
            LiteralTwinQueries.pow10micro(col("tv_decimal_digits"))).as("lease_value"))
        .agg(sum(col("lease_value")).cast("decimal(38,6)").as("total_lease_value"))
    },
    "q_probe_tvl_avail_sum" -> { (s, dir) =>
      val wP = Window.partitionBy(col("lp_pool"))
        .orderBy(col("lp_ts").desc, col("tvl").desc, col("borrowed_st").desc)
      Tables.lineitem(s, dir)
        .select(pmod(col("l_partkey"), lit(25)).as("lp_pool"),
          col("l_shipdate").as("lp_ts"),
          col("l_extendedprice").as("tvl"), col("l_quantity").as("borrowed_st"))
        .filter(col("lp_pool").isin(2, 7, 11, 19))
        .withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
        .join(broadcast(LiteralTwinQueries.poolConfig(s, dir)),
          col("lp_pool") === col("pool_id"))
        .select(LiteralTwinQueries.microRound6(
          (col("tvl").cast("decimal(20,2)") - col("borrowed_st").cast("decimal(20,2)")) *
            LiteralTwinQueries.microRecip(col("lpn_decimals"))).as("available_assets"))
        .agg(coalesce(sum(col("available_assets")), lit(0).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("total_available"))
    },
    "q_probe_tvl_clone" -> LiteralTwinQueries.queries("q_lit_tvl"),
    "q_probe_tvl_dbl" -> { (s, dir) =>
      LiteralTwinQueries.queries("q_lit_tvl")(s, dir)
        .select(col("tvl").cast("double").as("tvl_dbl"))
    },
    // the open_position_value row set's micro integers — BIGINT shadow of
    // the second micro-floor endpoint (different joins, same kernel)
    "q_probe_opv_cents" -> { (s, dir) =>
      val maxTs = Tables.lineitem(s, dir).agg(max(col("l_shipdate")).as("max_ts"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("st_contract_id"), col("l_shipdate").as("st_ts"),
          col("l_quantity").as("st_amnt_stable"))
        .crossJoin(broadcast(maxTs))
        .filter(col("st_ts") === col("max_ts") && col("st_amnt_stable") > 0)
        .join(LiteralTwinQueries.lsOpening(s, dir),
          col("st_contract_id") === col("ls_contract_id"))
        .join(broadcast(LiteralTwinQueries.poolConfig(s, dir)),
          col("ls_loan_pool_id") === col("pool_id"), "left")
        .join(LiteralTwinQueries.currencyRegistry(s, dir, "ov"),
          col("ls_asset_symbol") === col("ov_ticker"), "left")
        .agg(sum(microFloorLong(col("st_amnt_stable").cast("decimal(20,2)") *
          LiteralTwinQueries.pow10micro(col("ov_decimal_digits"))))
          .as("micro_units"))
    },
    // the wallet-volume scalar decomposed per union leg: (leg, row count,
    // leg sum) — bisects WHICH of the three legs carries the divergence
    "q_probe_wtx_legs" -> { (s, dir) =>
      val pcB = broadcast(LiteralTwinQueries.poolConfig(s, dir))
      def cr(role: String) = LiteralTwinQueries.currencyRegistry(s, dir, role)
      val openings = LiteralTwinQueries.lsOpening(s, dir)
        .filter(pmod(col("ls_address_id"), lit(100)) === 7)
        .join(pcB, col("ls_loan_pool_id") === col("pool_id"))
        .join(cr("vd"), col("ls_cltr_symbol") === col("vd_ticker"))
        .select(col("ls_contract_id"),
          (col("ls_cltr_amnt_stable").cast("decimal(20,2)") *
            LiteralTwinQueries.pow10micro(col("vd_decimal_digits"))).as("down_payment_usdc"),
          (col("ls_loan_amnt").cast("decimal(20,2)") *
            LiteralTwinQueries.microRecip(col("lpn_decimals"))).as("loan_usdc"))
      val openIds = openings.select(col("ls_contract_id"))
      def legVol(flag: String, role: String, tag: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag)
        .select(col("l_orderkey").as("leg_contract"), col("l_extendedprice").as("amt"),
          pmod(col("l_partkey"), lit(25)).as("leg_symbol"))
        .join(openIds, col("leg_contract") === col("ls_contract_id"), "left_semi")
        .join(cr(role), col("leg_symbol") === col(s"${role}_ticker"))
        .select(lit(tag).as("leg"),
          LiteralTwinQueries.microRound6(col("amt").cast("decimal(20,2)") *
            LiteralTwinQueries.pow10micro(col(s"${role}_decimal_digits"))).as("vol"))
      openings
        .select(lit("open").as("leg"),
          LiteralTwinQueries.microRound6(col("down_payment_usdc") + col("loan_usdc"))
            .as("vol"))
        .unionByName(legVol("R", "vp", "repay"))
        .unionByName(legVol("A", "vc", "collect"))
        .groupBy(col("leg"))
        .agg(count(lit(1)).as("n"), sum(col("vol")).cast("decimal(38,6)").as("vol"))
        .orderBy(col("leg"))
    },
    // ------------------------------------------------------------------
    // PNL family: the wallet accounting ledger, key columns vs decimal
    // columns, plus the paged original verbatim.
    // ------------------------------------------------------------------
    "q_probe_pnl_keys" -> { (s, dir) =>
      LiteralTwinQueries.realizedPnlWalletLedger(s, dir,
        col("ls_timestamp") >= lit("1996-01-01").cast("timestamp"))
        .select(col("contract_id"), col("user"), col("leased_asset"),
          col("down_payment_asset"), col("opening_date"), col("close_timestamp"),
          col("returned_lpn"), col("liquidation_events"))
    },
    "q_probe_pnl_sums" -> { (s, dir) =>
      LiteralTwinQueries.realizedPnlWalletLedger(s, dir,
        col("ls_timestamp") >= lit("1996-01-01").cast("timestamp"))
        .agg(
          sum(col("down_payment_stable")).cast("decimal(38,6)").as("dp_sum"),
          sum(col("manual_repayments_stable")).cast("decimal(38,6)").as("rep_sum"),
          sum(col("liquidations_stable")).cast("decimal(38,6)").as("liq_sum"),
          sum(col("returned_amount_stable")).cast("decimal(38,6)").as("ret_sum"),
          sum(col("realized_pnl_stable")).cast("decimal(38,6)").as("pnl_sum"),
          sum(col("returned_amount_lpn_units")).cast("decimal(38,8)").as("lpn_sum"))
    },
    "q_probe_pnl_clone" -> LiteralTwinQueries.queries("q_lit_realized_pnl_wallet"),
    // ------------------------------------------------------------------
    // Type control: pinned CONSTANTS in every red output type — no table
    // data, no arithmetic. Red here ⇒ the driver's hash canonicalizes
    // these decimal types differently per se; green ⇒ type handling is
    // clean and any red family row implicates its VALUES' computation.
    // Magnitudes mirror the red scalars (incl. trailing zeros, a zero
    // with scale, a negative, and a sub-float64-precision 38,8 value).
    // ------------------------------------------------------------------
    // ------------------------------------------------------------------
    // Control-of-the-control: clones of currently-GREEN twins under new
    // names. If the driver red-flags these while their originals stay
    // green, the "new registry name in round N" mechanism itself is
    // implicated (e.g. per-name state warmed only for old names) and the
    // red-family clone verdicts must be read in that light. Chosen as the
    // green siblings structurally closest to red families: total_tx_value
    // (micro-floor union scalar next to wallet_tx_volume) and
    // withdraw_sum (plain decimal SUM next to repayment_sums).
    // ------------------------------------------------------------------
    "q_probe_green_clone_txv" -> LiteralTwinQueries.queries("q_lit_total_tx_value"),
    "q_probe_green_clone_wsum" -> LiteralTwinQueries.queries("q_lit_withdraw_sum"),
    "q_probe_const_types" -> { (s, _) =>
      import s.implicits._
      Seq(1).toDF("one").select(
        dec("261501.52098000", "decimal(38,8)").as("d38_8"),
        dec("184749971.55", "decimal(38,2)").as("d38_2"),
        dec("20893331.915740", "decimal(38,6)").as("d38_6"),
        dec("33.69000000", "decimal(25,8)").as("d25_8"),
        dec("0.000000", "decimal(28,6)").as("d28_6_zero"),
        dec("-12345.678900", "decimal(28,6)").as("d28_6_neg"),
        dec("12345678901234567.89012345", "decimal(38,8)").as("d38_8_wide"),
        lit(42L).as("i64"),
        lit(0.1).as("dbl"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_probe_rev_count" ->
      "SELECT COUNT(*) AS n FROM events WHERE event_type = 'purchase'",
    "q_probe_rev_cents" ->
      s"""SELECT CAST(SUM(${centsSql("value")}) AS BIGINT) AS cents
         |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_probe_rev_s1" ->
      """SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_probe_rev_s2" ->
      """SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS s2
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_probe_rev_s3_clone" -> LiteralTwinQueries.oracleSql("q_lit_revenue_total"),
    "q_probe_rev_dbl" ->
      s"""SELECT CAST(revenue AS DOUBLE) AS revenue_dbl
         |FROM (${LiteralTwinQueries.oracleSql("q_lit_revenue_total")}) t""".stripMargin,
    "q_probe_rev_str" ->
      s"""SELECT CAST(revenue AS VARCHAR) AS revenue_str
         |FROM (${LiteralTwinQueries.oracleSql("q_lit_revenue_total")}) t""".stripMargin,
    "q_probe_rev_minmax" ->
      """SELECT MIN(CAST(value AS DECIMAL(18,2))) AS vmin,
        |  MAX(CAST(value AS DECIMAL(18,2))) AS vmax
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_probe_rwd_cents" ->
      s"""SELECT CAST(SUM(${centsSql("value")}) AS BIGINT) AS cents
         |FROM events WHERE event_type = 'view'""".stripMargin,
    "q_probe_rwd_s1" ->
      """SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1
        |FROM events WHERE event_type = 'view'""".stripMargin,
    "q_probe_buy_total" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type, value
        |  FROM events)
        |SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2))
        |  * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(38,8)) AS bought_back_sum
        |FROM ev WHERE event_type = 'purchase' AND ts > TIMESTAMP '1997-01-01'""".stripMargin,
    "q_probe_buy_rowsframe" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type,
        |    CAST(value AS DECIMAL(18,2)) * CAST('0.000001' AS DECIMAL(7,6)) AS v
        |  FROM events)
        |SELECT ts AS "time",
        |  CAST(SUM(v) OVER (ORDER BY ts, v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,8))
        |    AS bought_back
        |FROM ev
        |WHERE event_type = 'purchase' AND ts > TIMESTAMP '1997-01-01'
        |ORDER BY "time" ASC, bought_back ASC""".stripMargin,
    "q_probe_inc_row" ->
      """SELECT date_trunc('second', ts) AS tr_ts, event_id,
        |  CAST(value AS DECIMAL(18,2)) AS amnt
        |FROM events
        |WHERE event_type = 'click'
        |ORDER BY date_trunc('second', ts) DESC, event_id DESC
        |LIMIT 1""".stripMargin,
    "q_probe_rep_count" ->
      """SELECT COUNT(*) AS n FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_probe_rep_cents" ->
      s"""SELECT
         |  CAST(SUM(${centsSql("l_discount")}) AS BIGINT) AS pm_cents,
         |  CAST(SUM(${centsSql("l_linenumber")}) AS BIGINT) AS pi_cents,
         |  CAST(SUM(${centsSql("l_tax")}) AS BIGINT) AS cm_cents,
         |  CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS ci_cents,
         |  CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS pr_cents
         |FROM lineitem
         |WHERE l_returnflag = 'R'
         |  AND l_shipdate > TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_probe_rep_principal" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |  AS principal_stable
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_probe_rep_clone" -> LiteralTwinQueries.oracleSql("q_lit_repayment_sums"),
    "q_probe_rep_dbl" ->
      s"""SELECT CAST(prev_margin_stable AS DOUBLE) AS pm_dbl,
         |  CAST(prev_interest_stable AS DOUBLE) AS pi_dbl,
         |  CAST(current_margin_stable AS DOUBLE) AS cm_dbl,
         |  CAST(current_interest_stable AS DOUBLE) AS ci_dbl,
         |  CAST(principal_stable AS DOUBLE) AS pr_dbl
         |FROM (${LiteralTwinQueries.oracleSql("q_lit_repayment_sums")}) t""".stripMargin,
    "q_probe_tvl_maxts" ->
      "SELECT MAX(l_shipdate) AS max_ts FROM lineitem",
    "q_probe_tvl_lease_count" ->
      s"""WITH $crCte
         |SELECT COUNT(*) AS n
         |$tvlLeaseFromSql""".stripMargin,
    "q_probe_tvl_micro_bigint" ->
      s"""WITH $crCte
         |SELECT CAST(SUM(CAST(floor($tvlLeaseMicroSql + 0.5) AS BIGINT)) AS BIGINT)
         |  AS micro_units
         |$tvlLeaseFromSql""".stripMargin,
    "q_probe_tvl_lease_sum" ->
      s"""WITH $crCte
         |SELECT CAST(SUM(${LiteralTwinQueries.microSql(tvlLeaseMicroSql)}) AS DECIMAL(38,6))
         |  AS total_lease_value
         |$tvlLeaseFromSql""".stripMargin,
    "q_probe_tvl_avail_sum" ->
      s"""WITH pc AS (SELECT c_custkey AS pool_id,
         |    CAST(c_nationkey % 4 + 1 AS DOUBLE) AS lpn_decimals FROM customer)
         |SELECT CAST(COALESCE(SUM($tvlAvailMicroSql),
         |  CAST(0 AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS total_available
         |FROM (
         |  SELECT DISTINCT ON (lp_pool) lp_pool, lp_ts, tvl, borrowed_st
         |  FROM (SELECT l_partkey % 25 AS lp_pool, l_shipdate AS lp_ts,
         |      CAST(l_extendedprice AS DOUBLE) AS tvl,
         |      CAST(l_quantity AS DOUBLE) AS borrowed_st
         |    FROM lineitem) t
         |  WHERE lp_pool IN (2, 7, 11, 19)
         |  ORDER BY lp_pool, lp_ts DESC, tvl DESC, borrowed_st DESC) lps
         |JOIN pc ON pc.pool_id = lps.lp_pool""".stripMargin,
    "q_probe_tvl_clone" -> LiteralTwinQueries.oracleSql("q_lit_tvl"),
    "q_probe_tvl_dbl" ->
      s"""SELECT CAST(tvl AS DOUBLE) AS tvl_dbl
         |FROM (${LiteralTwinQueries.oracleSql("q_lit_tvl")}) t""".stripMargin,
    "q_probe_opv_cents" ->
      """WITH pc AS (SELECT c_custkey AS pool_id, c_nationkey AS lpn_symbol
        |  FROM customer),
        |cr AS (SELECT CAST(n_nationkey AS BIGINT) AS ticker,
        |    CAST(n_regionkey + 1 AS INT) AS decimal_digits FROM nation),
        |latest_aggregation AS (SELECT MAX(l_shipdate) AS max_ts FROM lineitem)
        |SELECT CAST(SUM(CAST(floor(CAST(s.l_quantity AS DECIMAL(20,2))
        |    * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS BIGINT))
        |  AS BIGINT) AS micro_units
        |FROM lineitem s
        |CROSS JOIN latest_aggregation la
        |JOIN orders o ON o.o_orderkey = s.l_orderkey
        |LEFT JOIN pc ON o.o_custkey = pc.pool_id
        |LEFT JOIN cr ON cr.ticker = o.o_orderkey % 25
        |WHERE s.l_shipdate = la.max_ts AND s.l_quantity > 0""".stripMargin,
    "q_probe_wtx_legs" ->
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
        |legs AS (
        |  SELECT 'open' AS leg,
        |    CAST(CAST(floor(down_payment_usdc + loan_usdc + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol
        |  FROM openings
        |  UNION ALL
        |  SELECT 'repay' AS leg,
        |    CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'R'
        |    AND l_orderkey IN (SELECT contract_id FROM openings)
        |  UNION ALL
        |  SELECT 'collect' AS leg,
        |    CAST(CAST(floor(CAST(l_extendedprice AS DECIMAL(20,2))
        |      * CAST(POWER(10, 6 - cr.decimal_digits) AS DECIMAL(6,0)) + 0.5) AS DECIMAL(20,0))
        |      * CAST('0.000001' AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS vol
        |  FROM lineitem JOIN cr ON cr.ticker = l_partkey % 25
        |  WHERE l_returnflag = 'A'
        |    AND l_orderkey IN (SELECT contract_id FROM openings))
        |SELECT leg, COUNT(*) AS n, CAST(SUM(vol) AS DECIMAL(38,6)) AS vol
        |FROM legs GROUP BY leg ORDER BY leg""".stripMargin,
    "q_probe_pnl_keys" ->
      s"""SELECT contract_id, "user", leased_asset, down_payment_asset,
         |  opening_date, close_timestamp, returned_lpn, liquidation_events
         |FROM (${LiteralTwinQueries.realizedPnlWalletSql(
               "o_orderdate >= TIMESTAMP '1996-01-01'", "")}) t""".stripMargin,
    "q_probe_pnl_sums" ->
      s"""SELECT CAST(SUM(down_payment_stable) AS DECIMAL(38,6)) AS dp_sum,
         |  CAST(SUM(manual_repayments_stable) AS DECIMAL(38,6)) AS rep_sum,
         |  CAST(SUM(liquidations_stable) AS DECIMAL(38,6)) AS liq_sum,
         |  CAST(SUM(returned_amount_stable) AS DECIMAL(38,6)) AS ret_sum,
         |  CAST(SUM(realized_pnl_stable) AS DECIMAL(38,6)) AS pnl_sum,
         |  CAST(SUM(returned_amount_lpn_units) AS DECIMAL(38,8)) AS lpn_sum
         |FROM (${LiteralTwinQueries.realizedPnlWalletSql(
               "o_orderdate >= TIMESTAMP '1996-01-01'", "")}) t""".stripMargin,
    "q_probe_pnl_clone" -> LiteralTwinQueries.oracleSql("q_lit_realized_pnl_wallet"),
    "q_probe_green_clone_txv" -> LiteralTwinQueries.oracleSql("q_lit_total_tx_value"),
    "q_probe_green_clone_wsum" -> LiteralTwinQueries.oracleSql("q_lit_withdraw_sum"),
    "q_probe_const_types" ->
      """SELECT CAST('261501.52098000' AS DECIMAL(38,8)) AS d38_8,
        |  CAST('184749971.55' AS DECIMAL(38,2)) AS d38_2,
        |  CAST('20893331.915740' AS DECIMAL(38,6)) AS d38_6,
        |  CAST('33.69000000' AS DECIMAL(25,8)) AS d25_8,
        |  CAST('0.000000' AS DECIMAL(28,6)) AS d28_6_zero,
        |  CAST('-12345.678900' AS DECIMAL(28,6)) AS d28_6_neg,
        |  CAST('12345678901234567.89012345' AS DECIMAL(38,8)) AS d38_8_wide,
        |  CAST(42 AS BIGINT) AS i64,
        |  CAST(0.1 AS DOUBLE) AS dbl""".stripMargin
  )
}
