package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{LiteralTwinQueries, ProbeQueries}

/** Static integrity guard for the r7 differential probe battery
  * (ProbeQueries); the numeric decomposition identities live in
  * [[ProbeConsistencySpec]].
  *
  * The probes are an EXPERIMENT run through the driver's correctness
  * ledger; their evidentiary value depends on invariants that ordinary
  * refactoring could silently break:
  *
  *  - the `_clone` controls must be the original twin VERBATIM — same
  *    Scala function object, same oracle SQL string. If a later edit to a
  *    twin re-bound only one side, a clone-vs-original verdict difference
  *    would measure builder drift, not driver caching.
  *  - every probe must carry an oracle (a rows-only probe bisects
  *    nothing).
  *  - probes must not silently disappear from the registry (name
  *    collisions on a Map merge).
  */
class ProbeSpec extends AnyFunSuite {

  private val clonePairs = Seq(
    "q_probe_rev_s3_clone" -> "q_lit_revenue_total",
    "q_probe_rep_clone"    -> "q_lit_repayment_sums",
    "q_probe_tvl_clone"    -> "q_lit_tvl",
    "q_probe_pnl_clone"    -> "q_lit_realized_pnl_wallet",
    // green-twin control clones (control-of-the-control)
    "q_probe_green_clone_txv"  -> "q_lit_total_tx_value",
    "q_probe_green_clone_wsum" -> "q_lit_withdraw_sum")

  test("clone controls are the original twins verbatim (lambda identity + oracle text)") {
    clonePairs.foreach { case (clone, orig) =>
      assert(ProbeQueries.queries(clone) eq LiteralTwinQueries.queries(orig),
        s"$clone must be the SAME function object as $orig")
      assert(ProbeQueries.oracleSql(clone) == LiteralTwinQueries.oracleSql(orig),
        s"$clone oracle SQL must be byte-identical to $orig's")
    }
  }

  test("every probe is oracled and reaches the merged registry") {
    val probes = ProbeQueries.queries.keySet
    assert(probes.forall(_.startsWith("q_probe_")))
    assert(ProbeQueries.oracleSql.keySet == probes,
      "every probe needs an oracle: " + (probes -- ProbeQueries.oracleSql.keySet))
    val merged = SparkEntry.queries.keySet
    assert(probes.subsetOf(merged),
      "probes lost in registry merge: " + (probes -- merged))
    // no probe name may shadow (or be shadowed by) a non-probe entry
    assert(SparkEntry.queries.size ==
      ProbeQueries.queries.size +
        (SparkEntry.queries.keySet -- probes).size)
  }

  test("dbl/str shadows derive from the clone's family oracle text") {
    // the DOUBLE/VARCHAR controls must wrap the ORIGINAL oracle verbatim,
    // so a red/green split between them and the original isolates the
    // output type, not a second-copy arithmetic drift
    assert(ProbeQueries.oracleSql("q_probe_rev_dbl")
      .contains(LiteralTwinQueries.oracleSql("q_lit_revenue_total")))
    assert(ProbeQueries.oracleSql("q_probe_rev_str")
      .contains(LiteralTwinQueries.oracleSql("q_lit_revenue_total")))
    assert(ProbeQueries.oracleSql("q_probe_tvl_dbl")
      .contains(LiteralTwinQueries.oracleSql("q_lit_tvl")))
    assert(ProbeQueries.oracleSql("q_probe_rep_dbl")
      .contains(LiteralTwinQueries.oracleSql("q_lit_repayment_sums")))
  }
}
