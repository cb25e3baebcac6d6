package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity guard: the driver's correctness gate only checks what
  * the registry exposes, so a silently-dropped entry (a Map key collision
  * from a module merge, a renamed query) would LOOK like a clean round while
  * shrinking coverage. Pin the exact census and the oracle contract.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries that legitimately carry no DuckDB oracle: approximate /
    * recall-traded paths whose exact twins ARE oracle-checked.
    */
  private val noOracleByDesign = Set(
    "q_a4_approx_active",   // HLL sketch (exact twin: q_a4_monthly_active)
    "q_x_ann_lsh",          // LSH ANN (exact twin: q_x_ann_topk)
    "q_x_ann_ivf",          // IVF ANN (exact twin: q_x_ann_topk)
    "q_x_ann_pq",           // PQ/ADC ANN (exact twin: q_x_ann_topk)
    "q_x_ann_ivfpq",        // IVF-PQ composite (exact twin: q_x_ann_topk)
    "q_x_embed_neardup_lsh", // embedding LSH (exact twin: q_x_embed_neardup)
    "q_x_mmr_lsh",          // LSH-pooled MMR (exact twin: q_x_mmr)
    "q_x_hard_negatives_lsh", // LSH hard negatives (exact twin: q_x_hard_negatives)
    "q_x_length_quantiles_approx", // t-digest (exact twin: q_x_length_quantiles)
    "q_x_semdedup_ivf",     // IVF cells (hash-checked twin: q_x_semdedup)
    "q_x_hll_rollup",       // DataSketches HLL rollup (exact twin: q_a4_monthly_active)
    "q_x_theta_sets",       // theta set algebra (exact twin: q_x_set_overlap)
    "q_x_reach_theta"       // HyperBall sketch reach (exact twin: q_x_reach_exact)
    // NOTE q_x_ann_index_serve is NOT here: the Lloyd TRAINING is
    // shuffle-order, but search through the PERSISTED index is
    // deterministic given the stored codebook — its oracle replays the
    // whole kernel from the same parquet (census-row argument, extended)
  )

  test("registry census: no entry silently dropped") {
    assert(SparkEntry.queries.size == 371,
      s"query registry changed size (${SparkEntry.queries.size}) — if intentional, " +
        "update this census AND the oracle accounting below")
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size - noOracleByDesign.size)
  }

  test("COVERAGE.md quotes the live census (doc-drift guard)") {
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), java.nio.charset.StandardCharsets.UTF_8)
    val n = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    assert(doc.contains(s"$n entries") && doc.contains(s"$o DuckDB-oracled"),
      s"COVERAGE.md census line is stale — update it to '$n entries, $o DuckDB-oracled'")
  }

  test("README quotes the live census (doc-drift guard)") {
    // README went stale once (said 220 at a 255 registry) — pin it the
    // same way COVERAGE.md is pinned
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val n = SparkEntry.queries.size
    assert(doc.contains(s"$n-query registry"),
      s"README.md registry count is stale — update it to '$n-query registry'")
  }

  test("every query is oracle-checked or a declared approximate path") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"oracles without a query: ${(oracles -- queries).toSeq.sorted.mkString(", ")}")
    val unchecked = queries -- oracles -- noOracleByDesign
    assert(unchecked.isEmpty,
      s"queries with neither oracle nor declared exemption: ${unchecked.toSeq.sorted.mkString(", ")}")
    assert(noOracleByDesign.subsetOf(queries))
  }
}
