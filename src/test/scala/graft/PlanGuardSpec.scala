package graft

import org.apache.spark.sql.functions.{count, first, lit}

/** Global plan-hygiene census over the ENTIRE query registry: no registered
  * query may plan a CartesianProduct, except the explicitly-labeled brute
  * baselines whose all-pairs contract is the point. This is the guard the
  * per-query plan audits in PLANS.md can't give — a future registry entry
  * (or an optimizer regression) that quietly plans a cross product fails
  * here before it fails at 100 TB.
  *
  * Plans are built (analyzed + physically planned), not executed — with the
  * known exceptions whose CONSTRUCTION runs real Spark jobs: the
  * corpus-count job inside auto-sized LSH plane derivation (metadata-cheap,
  * parquet footers), q_x_bpe_train / q_x_bpe_encode (BPE training's k
  * driver rounds — one argmax collect + localCheckpoint each — happen at
  * DataFrame build time), q_x_pagerank (an eager edge localCheckpoint
  * before the lazy iteration plan), q_x_kcore / q_x_concomp
  * (per-round localCheckpoints), q_x_semdedup_ivf / q_x_ann_ivf
  * (Lloyd codebook refinement localCheckpoints per iteration, plus the
  * sampled dim probe), and the MinHash candidate family (q_x_dedup_minhash
  * / _ngram / _simhash, q_x_dedup_clusters / _survivors, q_x_incr_neardup,
  * q_x_embed_neardup_lsh*: eager band/pair localCheckpoints shared by
  * their multi-consumer verify stages). The census therefore executes
  * those queries' driver loops per run; everything else stays plan-only.
  */
class PlanGuardSpec extends SparkSpec {

  /** All-pairs by documented contract (the exact baselines LSH paths are
    * recall-checked against).
    */
  private val bruteByDesign = Set("q_x_embed_neardup")

  test("no registered query plans a CartesianProduct or an unbounded-FOLLOWING frame") {
    // two hazards in one plan pass: CartesianProduct (O(n·m) join), and
    // ROWS/RANGE ... AND UNBOUNDED FOLLOWING window frames — Spark's
    // UnboundedFollowingWindowFunctionFrame rescans current→end for EVERY
    // row (O(n²) per partition; q_x_interpolate measured 6.7× time at 10×
    // data before its rewrite). A following-frame lookup is always
    // re-expressible as a running frame over the reversed sort when the
    // sort key is a total order — so a planned one is a bug, not a choice.
    // A frame is the rescan form iff its UPPER bound is unboundedfollowing
    // while the LOWER bound is anything but unboundedpreceding (the
    // whole-partition (unboundedpreceding, unboundedfollowing) frame is
    // the O(n) once-per-partition aggregate — benign). Matched on the
    // physical plan's specifiedwindowframe(...) rendering; the detector
    // itself is positively tested below.
    val rescanFrame =
      """specifiedwindowframe\([^,]+, (?!unboundedpreceding)[^,]+, unboundedfollowing""".r
    val cartesian = Seq.newBuilder[String]
    val following = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
      if (plan.contains("CartesianProduct") && !bruteByDesign(name)) cartesian += name
      if (rescanFrame.findFirstIn(plan).isDefined) following += name
    }
    assert(cartesian.result().isEmpty,
      s"cartesian product planned by: ${cartesian.result().mkString(", ")}")
    assert(following.result().isEmpty,
      s"unbounded-following frame planned by: ${following.result().mkString(", ")}")
    // detector sanity: a genuine (currentRow, unboundedFollowing) frame
    // must trip it, a whole-partition aggregate frame must not
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val tiny = Seq((1, 1)).toDF("k", "v")
    val bad = tiny.withColumn("x", first($"v").over(
      Window.partitionBy($"k").orderBy($"v")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .queryExecution.sparkPlan.toString
    assert(rescanFrame.findFirstIn(bad).isDefined, "detector missed a rescan frame")
    val ok = tiny.withColumn("x", count(lit(1)).over(Window.partitionBy($"k")))
      .queryExecution.sparkPlan.toString
    assert(rescanFrame.findFirstIn(ok).isEmpty, "detector flagged a whole-partition frame")
  }

  test("bucketized range join plans an equi join, never a nested loop") {
    // the whole point of Ops.pointInIntervalJoin: the naive theta join
    // plans BroadcastNestedLoopJoin; the bucket rewrite must not
    val plan = SparkEntry.queries("q_x_range_join")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "range join should plan a hash or sort-merge equi join")
  }

  test("interval-overlap join plans an equi join on the bucket key") {
    // same guard for the two-sided form (Ops.intervalOverlapJoin): the
    // session×burst pairing must ride the __b bucket equi key. The query
    // also contains ONE one-row broadcast scalar cross (the burst
    // threshold stats) — the documented acceptable BNLJ shape — so the
    // assertion targets the interval join itself, not the whole plan.
    val plan = SparkEntry.queries("q_x_burst_sessions")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    val equiOnBucket = raw"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[__b".r
    assert(equiOnBucket.findFirstIn(plan).isDefined,
      s"interval pairing is not an equi join on __b:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      "only the one-row stats broadcast may nested-loop")
  }
}
