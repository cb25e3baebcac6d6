package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches a naive driver-side power iteration") {
    // small undirected graph: a 4-cycle with a chord plus a pendant pair
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 4)
      .as[(Long, Double)].collect().toMap

    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet.toSeq.sorted
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      rank = nodes.map { v =>
        // sum in source-sorted order — the operator's determinism contract
        val s = adj(v).sorted.foldLeft(0.0)((acc, u) => acc + rank(u) / adj(u).size)
        v -> ((1.0 - 0.85) / n + 0.85 * s)
      }.toMap
    }
    assert(got.keySet == rank.keySet)
    got.foreach { case (v, r) => assert(r == rank(v), s"node $v: $r vs ${rank(v)}") }
    // ranks form a probability-ish distribution (sums to ~1 on a graph
    // with no dangling nodes)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the chorded nodes (1, 3) outrank the plain cycle nodes (2, 4)
    assert(got(1L) > got(2L) && got(3L) > got(4L))
  }

  test("pageRank on a directed graph keeps source-only nodes and teleports over |V|") {
    // 1 → 2: node 1 receives nothing but must keep its teleport share;
    // n must be |V| = 2 (not the out-degree-node count); node 2's dangling
    // mass is dropped by documented design
    val got = Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (1.0 - 0.85) / 2)
    assert(got(2L) == (1.0 - 0.85) / 2 + 0.85 * 0.5)
  }

  test("plain-sum production tier agrees with the sorted-fold within 1e-12") {
    // the web-scale escape hatch for hub in-degree buffers: identical plan
    // shape, plain streaming sum instead of the source-sorted fold — rank
    // differences are pure float reassociation, bounded far below any
    // downstream threshold's resolution
    val r = new scala.util.Random(11)
    val edges0 = (1 to 600).map(_ => (r.nextInt(50).toLong, r.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    val sym = (edges0 ++ edges0.map(_.swap)).distinct.toDF("src", "dst")
    val exact = Graph.pageRank(sym, "src", "dst", iters = 4)
      .as[(Long, Double)].collect().toMap
    val plain = Graph.pageRank(sym, "src", "dst", iters = 4, exactFold = false)
      .as[(Long, Double)].collect().toMap
    assert(exact.keySet == plain.keySet)
    exact.foreach { case (v, rk) =>
      assert(math.abs(rk - plain(v)) <= 1e-12, s"node $v: $rk vs ${plain(v)}")
    }
  }

  test("checkpointed iteration is bit-identical to the single lazy plan") {
    // checkpointEvery cuts plan lineage, not the computation: every k-th
    // rank table is materialized and replayed, so deep iteration counts
    // stop compounding Catalyst planning time with zero value drift
    val r = new scala.util.Random(23)
    val edges0 = (1 to 300).map(_ => (r.nextInt(30).toLong, r.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val sym = (edges0 ++ edges0.map(_.swap)).distinct.toDF("src", "dst")
    val lazyPlan = Graph.pageRank(sym, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    val checked = Graph.pageRank(sym, "src", "dst", iters = 5, checkpointEvery = 2)
      .as[(Long, Double)].collect().toMap
    assert(lazyPlan == checked)
  }

  test("pageRank is bit-identical across repartitionings") {
    val r = new scala.util.Random(7)
    val edges0 = (1 to 400).map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val sym = (edges0 ++ edges0.map(_.swap)).distinct
    val a = Graph.pageRank(sym.toDF("src", "dst").repartition(1), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(sym.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
