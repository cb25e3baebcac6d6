package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{LiteralTwinQueries, ProbeQueries}

/** Numeric identities between each probe stage and the red twin it
  * decomposes — the property the driver's per-query verdicts cannot check
  * but the experiment's interpretation DEPENDS on: a stage probe only
  * localizes a driver divergence if, in a correct engine, its value is an
  * exact function of the twin's. If a probe drifted (wrong filter, wrong
  * leg), a split verdict between stage and twin would be builder error
  * masquerading as driver signal. These identities are exact (integer /
  * decimal arithmetic), so assertions are equality, not tolerance.
  */
class ProbeConsistencySpec extends SparkSpec {

  private def probe(name: String): DataFrame = ProbeQueries.queries(name)(spark, sfDir)
  private def twin(name: String): DataFrame = LiteralTwinQueries.queries(name)(spark, sfDir)

  private def bd(df: DataFrame, colName: String): BigDecimal =
    BigDecimal(df.collect()(0).getAs[java.math.BigDecimal](colName))

  test("REV: cents probe == 100 × the decimal sum stage; stages agree with the twin") {
    val cents = probe("q_probe_rev_cents").collect()(0).getAs[Long]("cents")
    val s1 = bd(probe("q_probe_rev_s1"), "s1")
    assert(BigDecimal(cents) == s1 * 100,
      s"cents=$cents must equal 100×s1=$s1 exactly")
    val s2 = bd(probe("q_probe_rev_s2"), "s2")
    assert(s1 == s2, "the (28,2) narrowing stage must be value-lossless")
    val revenue = bd(twin("q_lit_revenue_total"), "revenue")
    assert(revenue == s2 * BigDecimal("0.000001"),
      s"twin revenue=$revenue must be s2×1e-6 exactly")
  }

  test("RWD: cents probe == 100 × the view-family sum stage; stage ×1e-6 == the twin") {
    val cents = probe("q_probe_rwd_cents").collect()(0).getAs[Long]("cents")
    val s1 = bd(probe("q_probe_rwd_s1"), "s1")
    assert(BigDecimal(cents) == s1 * 100)
    val distributed = bd(twin("q_lit_rewards_distributed"), "distributed")
    assert(distributed == s1 * BigDecimal("0.000001"))
  }

  test("TVL: micro-BIGINT probe == 1e6 × the lease-leg decimal sum; legs sum to the twin") {
    val micro = probe("q_probe_tvl_micro_bigint").collect()(0).getAs[Long]("micro_units")
    val leaseSum = bd(probe("q_probe_tvl_lease_sum"), "total_lease_value")
    assert(BigDecimal(micro) == leaseSum * 1000000,
      s"micro_units=$micro must equal 1e6×lease_sum=$leaseSum")
    val availSum = bd(probe("q_probe_tvl_avail_sum"), "total_available")
    val tvl = bd(twin("q_lit_tvl"), "tvl")
    assert(tvl == leaseSum + availSum,
      s"tvl=$tvl must be lease($leaseSum)+avail($availSum) exactly")
  }

  test("WTX: the per-leg decomposition sums to the wallet-volume scalar") {
    val legs = probe("q_probe_wtx_legs").collect()
      .map(r => BigDecimal(r.getAs[java.math.BigDecimal]("vol"))).sum
    val total = bd(twin("q_lit_wallet_tx_volume"), "tx_volume")
    assert(legs == total, s"leg sums $legs must equal tx_volume $total")
  }

  test("REP: cents probe == 100 × each decimal sum column of the twin") {
    val c = probe("q_probe_rep_cents").collect()(0)
    val t = twin("q_lit_repayment_sums").collect()(0)
    val pairs = Seq(
      "pm_cents" -> "prev_margin_stable", "pi_cents" -> "prev_interest_stable",
      "cm_cents" -> "current_margin_stable", "ci_cents" -> "current_interest_stable",
      "pr_cents" -> "principal_stable")
    pairs.foreach { case (cc, tc) =>
      assert(BigDecimal(c.getAs[Long](cc)) ==
        BigDecimal(t.getAs[java.math.BigDecimal](tc)) * 100,
        s"$cc must be exactly 100×$tc")
    }
  }

  test("BUY: the cursor total equals the windowed cumulative's final value (both frames)") {
    val total = bd(probe("q_probe_buy_total"), "bought_back_sum")
    def lastCum(df: DataFrame, c: String) = {
      val rows = df.collect()
      BigDecimal(rows.last.getAs[java.math.BigDecimal](c))
    }
    // q_lit_buyback is time-ascending with the cumulative as tiebreak, so
    // its last row carries the running total; same for the ROWS-frame probe
    assert(lastCum(twin("q_lit_buyback"), "bought_back") == total)
    assert(lastCum(probe("q_probe_buy_rowsframe"), "bought_back") == total)
  }

  test("INC: the argmax row probe carries the twin's scalar pre-multiply") {
    val amnt = bd(probe("q_probe_inc_row"), "amnt")
    val pool = bd(twin("q_lit_incentives_pool"), "incentives_pool")
    assert(pool == amnt * BigDecimal("0.000001"),
      s"incentives_pool=$pool must be amnt($amnt)×1e-6 exactly")
  }

  test("OPV: cents probe == 1e6 × the open-position-value scalar") {
    val micro = probe("q_probe_opv_cents").collect()(0).getAs[Long]("micro_units")
    val opv = bd(twin("q_lit_open_position_value"), "open_position_value")
    assert(BigDecimal(micro) == opv * 1000000)
  }

  test("PNL: the ledger's accounting identity holds over the summed columns") {
    // per ledger row: realized_pnl = returned(coalesced) − (down_payment +
    // repayments(coalesced)); summation is linear and every term is an
    // exact decimal, so the identity must survive the per-column sums the
    // probe reports — a drifted leg in the sums probe breaks it
    val sums = probe("q_probe_pnl_sums").collect()(0)
    def c(n: String) = BigDecimal(sums.getAs[java.math.BigDecimal](n))
    assert(c("pnl_sum") == c("ret_sum") - (c("dp_sum") + c("rep_sum")),
      "pnl_sum must equal ret_sum − dp_sum − rep_sum exactly")
    // the keys probe sees the same unpaged ledger: at least the paged
    // twin's page must be contained in it
    val keysN = probe("q_probe_pnl_keys").count()
    val pagedN = twin("q_lit_realized_pnl_wallet").count()
    assert(keysN >= pagedN, s"unpaged ledger ($keysN) ⊇ paged twin ($pagedN)")
  }
}
