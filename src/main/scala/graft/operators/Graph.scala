package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the label-flooding connected components
  * in [[Dedup.duplicateClusters]]. PageRank is the classic link-graph
  * quality signal (crawl prioritization / page-quality filtering descends
  * from it); here it runs over any edge list as a lazily-composed iterative
  * dataflow — no driver-side collect anywhere in the loop.
  */
object Graph {

  /** PageRank over a DIRECTED edge list (pass both directions for an
    * undirected graph). Damping 0.85, teleport over the full node set
    * (src ∪ dst), `iters` fixed iterations from a uniform start. Nodes
    * with no in-edges keep their teleport share every round (the
    * all-nodes left join below — without it a source-only node would
    * vanish after round 1). Dangling-node mass (out-degree 0) is DROPPED,
    * the common simplification: ranks then sum to < 1 on graphs with
    * sinks; symmetrized input has no sinks and sums to 1.
    *
    * Determinism contract (what makes this oracle-checkable): each node's
    * incoming contributions are summed by folding over the SOURCE-sorted
    * list — the sum order is pinned by data, not by shuffle arrival, so
    * the result is bit-identical across partitionings, cluster sizes, and
    * engines. `exactFold = false` swaps the fold for a plain `sum` — the
    * PRODUCTION tier at web scale, where a hub node's in-degree-sized
    * sort buffer would page: plain sum is a streaming partial aggregate
    * (map-side combine, O(1) state per node) at the price of last-ulp
    * shuffle-order nondeterminism. Identical plan shape otherwise;
    * GraphSpec pins the two tiers to ≤1e-12 rank disagreement.
    *
    * Scale shape: per iteration one join of ranks to edges on src (both
    * sides hash-partitioned on the same key — the exchange is reused) and
    * one dst-keyed aggregate. The per-node buffer is bounded by in-degree;
    * web-scale hubs would page this (or use the plain-sum tier). The whole
    * `iters`-round loop composes into ONE lazy plan by default;
    * `checkpointEvery = k` materializes the rank table every k rounds
    * (node-table-sized, tiny next to the edge joins) so a deep iteration
    * count doesn't compound plan depth — Catalyst re-optimizes the whole
    * lineage each action, and past ~10 unchecked rounds the PLANNING time
    * (not the data) becomes the bottleneck. Ranks are bit-identical with
    * or without checkpoints (GraphSpec pins it): a checkpoint replays the
    * same deterministic computation, it just cuts where the plan starts.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      exactFold: Boolean = true, checkpointEvery: Int = 0): DataFrame = {
    // materialize the edge list once — the iterations reference it 2·iters
    // times, and without the checkpoint each reference re-executes the
    // caller's whole edge-derivation subtree (measured 4.8 s → 2.6 s at
    // sf0.1 for the trading-graph query, whose edges are a distinct over
    // a fact join)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // NOT checkpointed: both join sides read the checkpointed e, so the
    // recomputed join is cheaper than eagerly materializing its output
    // (measured 3.8 s vs 5.8 s at sf0.1)
    val withDeg = e.join(deg, Seq("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nDf = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iters) {
      val contribs = ranks.join(withDeg, col("node") === col("src"))
        .select(col("dst"), col("src"), (col("rank") / col("deg")).as("c"))
      val sums =
        if (exactFold)
          contribs.groupBy(col("dst"))
            .agg(aggregate(sort_array(collect_list(struct(col("src"), col("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("s"))
        else
          contribs.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, col("node") === col("dst"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
