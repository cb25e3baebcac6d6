package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.sketches

/** Frequency sketches over the corpus — the approximate-counting family
  * sibling of the distinct (HLL), quantile (t-digest) and membership
  * (Bloom) tiers already in the repo.
  *
  * Two formulations of the SAME count-min sketch, deliberately:
  *
  *  - [[cmsHeavyHitters]] is purely relational: a CMS is nothing but
  *    `GROUP BY (row, bucket) COUNT(*)` over hashed buckets, so Spark's
  *    map-side partial aggregation IS the sketch — per-partition hash-agg
  *    state is bounded at depth·width entries regardless of corpus size,
  *    and the shuffle moves ≤ depth·width rows per partition instead of
  *    the vocabulary. No custom code in the hot path, whole-stage codegen
  *    end to end.
  *  - [[cmsRollup]] materializes per-group sketches as a STORED column
  *    (CmsAgg → array<long>), then re-aggregates them (LongVectorSumAgg)
  *    at a coarser grain without touching the raw corpus — the
  *    pre-aggregated-cube shape a 100 TB pipeline stores daily and rolls
  *    up monthly.
  *
  * Both use the md5-derived bucket hash (NativeKernels.cmsBucket), so every
  * counter and estimate is an exact integer the DuckDB oracle replays —
  * the approximate tier itself is hash-checkable.
  *
  * Estimate guarantees (standard CMS): est ≥ true count always (counters
  * only ever add); est ≤ true + εN with probability 1−δ for width = e/ε,
  * depth = ln(1/δ). SketchSpec pins both sides on the real corpus.
  *
  * Why CMS and not Misra-Gries/SpaceSaving: an MG summary's retained
  * items and lower bounds depend on how the input was partitioned, so the
  * same corpus gives different summaries at local[4] vs local[16] — it
  * cannot meet the registry's bit-identical-across-parallelism census.
  * CMS counters are plain sums: commutative, layout-blind, replayable.
  */
object Sketches {

  /** bucket_i(term) for the relational formulation — MUST stay in lockstep
    * with NativeKernels.cmsBucket (spec-pinned in SketchSpec).
    */
  private def bucketCol(term: Column, i: Column, width: Int): Column =
    pmod(TextOps.md5Long64(concat(lit("cms"), i.cast("string"), lit(":"), term)),
      lit(width.toLong))

  private def depthIndex(depth: Int): Column =
    explode(array((0 until depth).map(lit): _*))

  /** Top-k most frequent terms by CMS estimate, purely relational.
    *
    * Candidate terms are the distinct vocabulary (a dedup shuffle with
    * map-side combine — strictly narrower than the counting shuffle it
    * replaces, since no count column travels and duplicates die in the
    * map). The counter table is ≤ depth·width rows by construction, so it
    * broadcasts to the candidates regardless of corpus size.
    */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, depth: Int, width: Int,
      k: Int): DataFrame = {
    val terms = docs
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counters = terms
      .select(col("term"), depthIndex(depth).as("i"))
      .withColumn("bucket", bucketCol(col("term"), col("i"), width))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val candidates = terms.distinct()
      .select(col("term"), depthIndex(depth).as("i"))
      .withColumn("bucket", bucketCol(col("term"), col("i"), width))
    candidates
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("term"))
      .agg(min(col("c")).as("est_count"))
      .orderBy(col("est_count").desc, col("term").asc)
      .limit(k)
  }

  /** Daily CMS sketches over `keyCol`, stored as counter vectors, rolled up
    * to monthly by element-wise vector sum, then point-estimated for every
    * distinct key. The daily grain never re-reads raw data for the monthly
    * answer — the mergeable-sketch contract.
    *
    * The candidate set here is the key domain (event_type: configuration-
    * bounded), broadcast onto the month×sketch rows.
    */
  def cmsRollup(events: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sketches.cmsSketch(col(keyCol), depth, width).as("sketch"))
    val monthly = daily
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(sketches.longVectorSum(col("sketch")).as("msketch"))
    val candidates = events.select(col(keyCol).as("key")).distinct()
    // broadcast cross join: |candidates| is the key domain (single-digit
    // for event_type), |monthly| is the month count — both tiny vs corpus
    monthly
      .crossJoin(broadcast(candidates))
      .select(col("month"), col("key").as(keyCol),
        sketches.cmsEstimate(col("msketch"), col("key"), depth, width).as("est_events"))
  }

  /** Distinct-set ALGEBRA from two theta sketches built in one corpus pass:
    * |A|, |B|, |A ∩ B|, |A \ B| for the key sets of two segments (e.g.
    * "users who purchased" vs "users who clicked"). HLL sketches union but
    * cannot intersect; theta sketches answer overlap questions from stored
    * per-segment state. Below 2^lgK distinct keys the sketches are in
    * exact mode and every output is the exact count (SketchSpec pins
    * equality with the oracled exact twin q_x_set_overlap); estimation
    * mode is the 100 TB path, where the same stored sketches keep
    * answering every pairwise overlap without re-reading raw rows.
    */
  def thetaSetOverlap(events: DataFrame, keyCol: String, typeCol: String,
      aType: String, bType: String, lgK: Int = 12): DataFrame =
    events
      .agg(
        sketches.thetaSketch(when(col(typeCol) === aType, col(keyCol)), lgK).as("ska"),
        sketches.thetaSketch(when(col(typeCol) === bType, col(keyCol)), lgK).as("skb"))
      .select(
        sketches.thetaEstimate(col("ska")).as("n_a"),
        sketches.thetaEstimate(col("skb")).as("n_b"),
        sketches.thetaIntersect(col("ska"), col("skb")).as("n_both"),
        sketches.thetaDiff(col("ska"), col("skb")).as("n_a_only"))

  /** Daily DataSketches-HLL sketches over `keyCol` unioned to monthly
    * distinct estimates — the stored-sketch tier of q_a4_monthly_active
    * (approx_count_distinct answers one grain; stored HLL sketches answer
    * EVERY coarser grain later without re-reading raw data). Register-max
    * union is order-independent, so estimates are deterministic across
    * partitionings. No SQL oracle (engine-private sketch state); the exact
    * twin + SketchSpec error bound carry correctness.
    */
  def hllRollup(events: DataFrame, keyCol: String, lgK: Int = 12): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lgK).as("sk"))
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct"))

  /** Per-type KMV bottom-k sketch STATE over the registry's replayable
    * hash domain (md5 pmod 2⁶² under the "kmv:" salt — the
    * `q_x_kmv_distinct` chain): (event_type, kmv ascending long array,
    * ≤ k elements). ONE object-hash aggregate whose
    * [[org.apache.spark.sql.graft.KmvBottomKAgg]] buffers union+truncate
    * map-side — so the same definition serves batch builds and
    * complete-mode streaming upkeep (StreamJobs.kmvStream): set-union
    * state is slicing-insensitive, drained ≡ batch bit-for-bit.
    */
  def kmvState(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", k: Int = 64,
      domain: Long = 4611686018427387904L): DataFrame =
    events
      .select(col(typeCol),
        pmod(TextOps.md5Long64(
          concat(lit("kmv:"), col(keyCol).cast("string"))), lit(domain)).as("h"))
      .groupBy(col(typeCol))
      .agg(org.apache.spark.sql.graft.natives.kmvBottomK(col("h"), k).as("kmv"))

  /** Estimate finisher over [[kmvState]] rows: lossless below k (the
    * sketch IS the distinct set), else (k−1)·M div h_k with the max
    * retained hash as h_k — the `q_x_kmv_distinct` estimator, including
    * its divide-by-zero guard, applied to stored/drained sketch state.
    * An EMPTY sketch (a type whose key values are all NULL contributes no
    * hashes) must not reach element_at — index 0 throws at runtime — so
    * h_k is NULL there and the lossless branch reports 0 distinct.
    */
  def kmvEstimateFromState(state: DataFrame, k: Int = 64,
      domain: Long = 4611686018427387904L): DataFrame =
    state
      .select(col("event_type"), size(col("kmv")).cast("long").as("kmv_k"),
        when(size(col("kmv")) > 0,
          element_at(col("kmv"), size(col("kmv")))).as("h_k"))
      .withColumn("est_distinct", when(col("kmv_k") < k, col("kmv_k"))
        .otherwise(expr(
          s"cast((cast(kmv_k - 1 as decimal(38,0)) * ${domain}L) div greatest(h_k, 1L) as bigint)")))

  /** The relational CMS counter table of `keyCol`: (row i, bucket, count),
    * ≤ depth·width rows by construction, built by ONE keyed aggregate
    * whose map-side combine absorbs the raw volume. Counters are plain
    * additive sums, so the SAME definition serves batch estimation
    * ([[cmsJoinCardinality]]) and complete-mode streaming upkeep
    * (StreamJobs.cmsCountersStream): drained counters ≡ batch counters
    * bit-for-bit, and any estimate derived from them (point frequency,
    * inner-product join size) inherits the equality.
    */
  def cmsCounters(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = df
    .select(col(keyCol).cast("string").as("k"), depthIndex(depth).as("i"))
    .withColumn("bucket", bucketCol(col("k"), col("i"), width))
    .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("c"))

  /** CMS inner-product join-cardinality estimate beside its exact twin —
    * the pre-join sizing call (AGV/AMS-style): |A ⋈_k B| = Σ_k fA(k)·fB(k),
    * estimated per CMS row i as Σ_bucket cA[i][b]·cB[i][b] and tightened
    * by min over rows (never under the truth — CMS counters only collide
    * upward, so est ≥ exact always; the spec pins it). Shape: each side
    * collapses to a ≤ depth·width counter table (map-side combine absorbs
    * the raw volume), the inner product joins two sketch-sized tables, and
    * only the exact twin touches the keys themselves — one
    * count-per-key aggregate per side and a keyed equi-join of the two
    * count tables, which is exactly the work the estimate lets a 100 TB
    * planner AVOID; it rides along here so the row itself certifies the
    * estimator (overest_bp = exact overshoot in basis points).
    * The md5 bucket hash keeps every counter DuckDB-replayable.
    */
  def cmsJoinCardinality(a: DataFrame, b: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    def counters(df: DataFrame): DataFrame = cmsCounters(df, keyCol, depth, width)
    val est = counters(a).as("x")
      .join(counters(b).as("y"), Seq("i", "bucket"))
      .groupBy(col("i")).agg(sum(col("x.c") * col("y.c")).as("ip"))
      .agg(min(col("ip")).as("est_join"))
    def perKey(df: DataFrame, out: String) = df
      .groupBy(col(keyCol)).agg(count(lit(1)).as(out))
    val exact = perKey(a, "na").join(perKey(b, "nb"), keyCol)
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_join"))
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(exact).crossJoin(est)
      .withColumn("overest_bp",
        expr("(est_join - exact_join) * 10000 div greatest(exact_join, 1)"))
  }
}
