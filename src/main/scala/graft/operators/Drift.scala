package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift state + finishers, ONE definition for the batch
  * registry rows (`q_x_drift_chi2` / `q_x_drift_w1` / `q_x_drift_ks`) and
  * their streaming twins ([[graft.streaming.StreamJobs.driftBinCountsStream]]
  * / `driftCentsCountsStream`) — the
  * [[graft.functions.Ops.dailyTypeCents]] shared-kernel stance, so the live
  * monitor can't drift from the batch report.
  *
  * The STATE is the additive part: per-(type, bin) or per-(type, cents)
  * reference/current counter pairs. Every entry is an integer sum, so a
  * complete-mode streaming aggregate maintains the table exactly at any
  * micro-batch slicing (the q_x_incr_rollup merge ≡ recompute contract),
  * and each FINISHER — chi², 1-D Wasserstein, Kolmogorov–Smirnov — is a
  * bounded-keyspace fold over drained state that equals the batch row
  * bit-for-bit. Drift gates run continuously in a production training-data
  * pipeline; this split is what lets the gate fire mid-ingest while the
  * nightly audit reads the same numbers.
  *
  * Reference/current split: calendar first-half vs second-half of month
  * (`dayofmonth ≤ 15`), the registry rows' pinned cohort rule.
  */
object Drift {

  /** Additive (event_type, bin, o1, o2) counters over the fixed 50-unit
    * value grid (10 bins, top bin open) — the chi²/W1 state. One
    * map-side-combinable aggregate; keyspace ≤ |types|·10 at any volume.
    */
  def binCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        expr("least(cast(cast(value as decimal(18,2)) * 100 as bigint) div 5000, 9)")
          .as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(when(col("is_ref"), lit(1))).as("o1"),
        count(when(!col("is_ref"), lit(1))).as("o2"))

  /** Additive (event_type, c, o1, o2) counters over DISTINCT cents values
    * — the KS state. Keyspace is value-domain-bounded (the q_x_auc /
    * q_x_gini window argument), not row-bounded.
    */
  def centsCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("c"))
      .agg(count(when(col("is_ref"), lit(1))).as("o1"),
        count(when(!col("is_ref"), lit(1))).as("o2"))

  /** Two-sample chi-square from [[binCounts]] state. Rational in the
    * counts (no libm ln — the PSI/KL alternative floats); per-bin terms
    * folded in bin order so the double sum is bit-deterministic
    * cross-engine. An empty cohort contributes 0 for its side.
    */
  def chi2FromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.groupBy(col("event_type"))
      .agg(sum(col("o1")).as("n1"), sum(col("o2")).as("n2"))
    val term = {
      val e1 = ((col("o1") + col("o2")) * col("n1")).cast("double") /
        (col("n1") + col("n2")).cast("double")
      val e2 = ((col("o1") + col("o2")) * col("n2")).cast("double") /
        (col("n1") + col("n2")).cast("double")
      val t1 = when(col("n1") > 0,
        (col("o1").cast("double") - e1) * (col("o1").cast("double") - e1) / e1)
        .otherwise(lit(0.0))
      val t2 = when(col("n2") > 0,
        (col("o2").cast("double") - e2) * (col("o2").cast("double") - e2) / e2)
        .otherwise(lit(0.0))
      t1 + t2
    }
    counts.join(tot, Seq("event_type"))
      .select(col("event_type"), col("bin"), col("n1"), col("n2"), term.as("__t"))
      .groupBy(col("event_type"))
      .agg(min(col("n1")).as("n_ref"), min(col("n2")).as("n_cur"),
        count(lit(1)).cast("int").as("n_bins"),
        aggregate(sort_array(collect_list(struct(col("bin"), col("__t")))),
          lit(0.0), (acc, x) => acc + x.getField("__t")).as("chi2"))
  }

  /** 1-D Wasserstein (earth-mover on the bin grid) from [[binCounts]]
    * state: W1·n_ref·n_cur = Σ_k |cum₁ₖ·n₂ − cum₂ₖ·n₁| · gap_k with gap =
    * distance to the next OCCUPIED bin (absent bins carry the running
    * cumulative). All-integer numerator, one closing double division;
    * needs n_ref·n_cur < 2⁶³ (~3·10⁹ rows/side/type — past that, fold in
    * decimal(38,0)). Types with an empty cohort are excluded.
    */
  def w1FromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.groupBy(col("event_type"))
      .agg(sum(col("o1")).as("n1"), sum(col("o2")).as("n2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    counts
      .withColumn("c1", sum(col("o1")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("c2", sum(col("o2")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap", lead(col("bin"), 1, 10L).over(w) - col("bin"))
      .join(tot, Seq("event_type"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .groupBy(col("event_type"))
      .agg(min(col("n1")).as("n_ref"), min(col("n2")).as("n_cur"),
        sum(abs(col("c1") * col("n2") - col("c2") * col("n1")) * col("gap"))
          .as("w1_num"))
      .select(col("event_type"), col("n_ref"), col("n_cur"), col("w1_num"),
        (col("w1_num").cast("double") /
          (col("n_ref") * col("n_cur")).cast("double")).as("w1_bins"))
  }

  /** Additive per-type MOMENT state over the same ref/current split:
    * (n, Σc, Σc²) per cohort, the Welch-test substrate. Moments
    * accumulate in DECIMAL(38,0) (the q_x_variance convention — a LONG
    * Σc² crosses 2⁶³ around 3·10⁹ rows per cohort, inside design scale);
    * every entry is an additive sum, so the complete-mode streaming
    * upkeep ≡ the batch build at any slicing.
    */
  def momentCounts(events: DataFrame): DataFrame = {
    val c38 = col("c").cast("decimal(38,0)")
    events
      .select(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy(col("event_type"))
      .agg(count(when(col("is_ref"), lit(1))).as("n1"),
        count(when(!col("is_ref"), lit(1))).as("n2"),
        sum(when(col("is_ref"), c38)).as("s1"),
        sum(when(!col("is_ref"), c38)).as("s2"),
        sum(when(col("is_ref"), c38 * col("c"))).as("q1"),
        sum(when(!col("is_ref"), c38 * col("c"))).as("q2"))
  }

  /** Welch two-sample z from [[momentCounts]] state — the MEAN-level
    * significance number the distribution tiers can't give: χ²/W1/KS say
    * the SHAPE moved; Welch says whether the mean shift clears sampling
    * noise, which is what a mixture-rebalance acts on. Unequal variances
    * by construction (the two month halves share nothing), hence Welch,
    * not pooled. Every numerator is an exact DECIMAL(38,0) integer
    * (mean diff single-division cross-multiplied: (s1·n2 − s2·n1)/(n1·n2);
    * variance numerators n·q − s² stay under 38 digits to ~10¹⁶ Σcents);
    * the doubles are derived by the IDENTICAL expression tree on both
    * engines, so the oracle matches bit-for-bit (the q_x_variance / OLS
    * stance). Cohorts below 2 rows are excluded (variance undefined).
    * At these n the z threshold 1.96 ≈ the t quantile to 3 decimals —
    * the z form keeps the finisher libm-free except one sqrt.
    */
  def welchFromState(state: DataFrame): DataFrame = {
    val dmNum = (col("s1") * col("n2") - col("s2") * col("n1")).cast("double")
    val dm = dmNum / (col("n1") * col("n2")).cast("double")
    val v1 = (col("n1") * col("q1") - col("s1") * col("s1")).cast("double") /
      (col("n1") * (col("n1") - 1)).cast("double")
    val v2 = (col("n2") * col("q2") - col("s2") * col("s2")).cast("double") /
      (col("n2") * (col("n2") - 1)).cast("double")
    val z = dm / sqrt(v1 / col("n1").cast("double") + v2 / col("n2").cast("double"))
    state.filter(col("n1") > 1 && col("n2") > 1)
      .select(col("event_type"), col("n1").as("n_ref"), col("n2").as("n_cur"),
        dm.as("mean_diff_c"), z.as("welch_z"),
        (abs(z) > 1.96).as("significant"))
  }

  /** Additive per-type BIVARIATE moment state for CUPED: per user, x =
    * reference-half cents (the pre-period covariate), y = current-half
    * cents; per type the exact moments (n, Σx, Σy, Σxy, Σx², Σy²) over
    * the per-user pairs, DECIMAL(38,0) accumulation (the q_x_variance /
    * OLS convention). Two keyed aggregates: the user rollup absorbs the
    * events map-side, the moment fold is user-cardinality-sized. Note
    * the STREAMING boundary: only the (type, user) cents rollup is
    * additive across micro-batches — the squared terms are functions of
    * FINAL user totals, so the moment fold is a batch finisher over
    * drained user state (the goldenRecordsFromState split), not a
    * second streaming aggregate.
    */
  def cupedMoments(events: DataFrame): DataFrame =
    cupedMomentsFromUserState(cupedUserState(events))

  /** The ADDITIVE layer of [[cupedMoments]]: per (type, user) the
    * reference-half and current-half cents totals. Plain conditional
    * sums ⇒ ONE complete-mode streaming aggregate maintains this table
    * exactly (StreamJobs.cupedUserStateStream); the moment fold below is
    * the batch finisher over drained state.
    */
  def cupedUserState(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("user_id"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(coalesce(sum(when(col("is_ref"), col("c"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("is_ref"), col("c"))), lit(0L)).as("y"))

  /** The user-cardinality-sized moment fold of [[cupedMoments]], split
    * out so it can finish DRAINED streaming user state.
    */
  def cupedMomentsFromUserState(perUser: DataFrame): DataFrame = {
    val x38 = col("x").cast("decimal(38,0)")
    val y38 = col("y").cast("decimal(38,0)")
    perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x38).as("sx"), sum(y38).as("sy"),
        sum(x38 * col("y")).as("sxy"),
        sum(x38 * col("x")).as("sxx"),
        sum(y38 * col("y")).as("syy"))
  }

  /** CUPED variance-reduction report from [[cupedMoments]] state — the
    * third member of the experiment-analysis trio (q_x_bootstrap_ci =
    * assumption-free CI, q_x_drift_welch = mean significance, this =
    * how much sensitivity the pre-period covariate buys): θ =
    * cov(x,y)/var(x), adjusted mean ȳ' = ȳ − θ·(x̄ − x̄) = ȳ at the
    * full-population fit (CUPED's mean is unchanged by construction —
    * what changes is the VARIANCE: var(y') = var(y)·(1 − ρ²)), reported
    * as theta, rho², and the variance-reduction share. Every numerator
    * is the exact-integer cross-multiplied form cast to double by the
    * identical expression tree on both engines (n·Σxy − Σx·Σy etc. —
    * the OLS precedent); groups need ≥ 2 users and a non-degenerate
    * covariate.
    */
  def cupedFromState(state: DataFrame): DataFrame = {
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val varXN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val varYN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val theta = covN / varXN
    val rho2 = covN * covN / (varXN * varYN)
    state.filter(col("n") > 1)
      .filter((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
        (col("n") * col("syy") - col("sy") * col("sy")) > 0)
      .select(col("event_type"), col("n").as("n_users"),
        theta.as("theta"), rho2.as("rho2"),
        (lit(1.0) - rho2).as("var_ratio_adj"))
  }

  /** Additive per-type PROPORTION state over the shared split: cohort
    * sizes and high-value counts (cents ≥ `thresholdCents`, default =
    * the bin grid's first boundary). Four integer sums ⇒ streams exactly
    * like [[binCounts]].
    */
  def proportionCounts(events: DataFrame,
      thresholdCents: Long = 5000L): DataFrame =
    events
      .select(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        ((col("value").cast("decimal(18,2)") * 100).cast("long")
          >= thresholdCents).as("hi"))
      .groupBy(col("event_type"))
      .agg(count(when(col("is_ref"), lit(1))).as("n1"),
        count(when(col("is_ref") && col("hi"), lit(1))).as("k1"),
        count(when(!col("is_ref"), lit(1))).as("n2"),
        count(when(!col("is_ref") && col("hi"), lit(1))).as("k2"))

  /** Pooled two-proportion z from [[proportionCounts]] state — the RATE
    * member of the drift report: Welch asks "did the mean move", this
    * asks "did the high-value share move" (the conversion-rate question;
    * a share can shift while the mean stands still and vice versa).
    * z = (p̂1 − p̂2) / √(p̂(1−p̂)(1/n1 + 1/n2)) with the POOLED p̂ — the
    * null-hypothesis form. Integer counts, doubles via the identical
    * expression tree, one sqrt; degenerate pools (p̂ ∈ {0, 1}) and empty
    * cohorts report NULL z rather than a division by zero.
    */
  def propZFromCounts(counts: DataFrame): DataFrame = {
    val p1 = col("k1").cast("double") / col("n1").cast("double")
    val p2 = col("k2").cast("double") / col("n2").cast("double")
    val p = (col("k1") + col("k2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val z = (p1 - p2) / sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double")))
    counts.filter(col("n1") > 0 && col("n2") > 0)
      .select(col("event_type"),
        col("n1").as("n_ref"), col("k1").as("k_ref"),
        col("n2").as("n_cur"), col("k2").as("k_cur"),
        p1.as("p_ref"), p2.as("p_cur"),
        when(col("k1") + col("k2") > 0 &&
             col("k1") + col("k2") < col("n1") + col("n2"), z).as("prop_z"))
  }

  /** Kolmogorov–Smirnov from [[centsCounts]] state: exact integer sup of
    * |cum₁·n₂ − cum₂·n₁| with inclusive cumulatives per cohort over
    * distinct cents, one closing double division.
    */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = counts.groupBy(col("event_type"))
      .agg(sum(col("o1")).as("n_ref"), sum(col("o2")).as("n_cur"))
    counts.withColumn("cum1", sum(col("o1")).over(w))
      .withColumn("cum2", sum(col("o2")).over(w))
      .join(broadcast(tot), "event_type")
      .groupBy(col("event_type"), col("n_ref"), col("n_cur"))
      .agg(max(abs(col("cum1") * col("n_cur") - col("cum2") * col("n_ref")))
        .as("ks_num"))
      .select(col("event_type"), col("n_ref"), col("n_cur"), col("ks_num"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          col("ks_num").cast("double") /
            (col("n_ref") * col("n_cur")).cast("double")).as("ks"))
  }
}
