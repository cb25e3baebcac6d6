package graft

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
  * DataFrame build time), and q_x_pagerank (an eager edge localCheckpoint
  * before the lazy iteration plan). The census therefore executes those
  * queries' driver loops per run; everything else stays plan-only.
  */
class PlanGuardSpec extends SparkSpec {

  /** All-pairs by documented contract (the exact baselines LSH paths are
    * recall-checked against).
    */
  private val bruteByDesign = Set("q_x_embed_neardup")

  test("no registered query plans a CartesianProduct (outside brute baselines)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (bruteByDesign(name)) None
      else {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"cartesian product planned by: ${offenders.mkString(", ")}")
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
}
