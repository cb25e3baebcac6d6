package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** Data-quality operators: the declarative constraint report (the
  * Deequ-style "unit tests for data" every ingest gate runs before
  * promoting a batch) and day-of-week seasonal anomaly detection over the
  * event stream. Both REPORT violations rather than assert — the gate
  * decision (fail the batch / quarantine rows) is the caller's, which is
  * what keeps the operators pure queries.
  */
object QualityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Constraint report over the star schema: one row per declared
    // constraint with checked/violation counts and the pass verdict.
    // Execution shape, not a constraint-per-scan loop: the four
    // single-column orders constraints (key uniqueness, null check,
    // value domain, range) evaluate in ONE wide aggregate over ONE scan
    // — each violation count is a conditional count, uniqueness is
    // rows − countDistinct — then reshape to report rows. Referential
    // integrity is the one constraint class that genuinely needs a
    // second table: orders→customer probes a broadcast dim;
    // lineitem→orders is the big-to-big LEFT ANTI, which shuffles both
    // sides on the key ONCE and scales with the fact tables. Total:
    // three scans of each fact table's constrained columns, zero
    // driver-side iteration.
    "q_x_dq_report" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      def report(name: String, checked: Column, viol: Column): Column =
        struct(lit(name).as("constraint_name"),
          checked.as("n_checked"), viol.as("n_violations"))
      val ordersWide = o.agg(
        report("orders.o_orderkey.unique", count(lit(1)),
          count(lit(1)) - countDistinct(col("o_orderkey"))).as("c1"),
        report("orders.o_custkey.not_null", count(lit(1)),
          count(when(col("o_custkey").isNull, lit(1)))).as("c2"),
        report("orders.o_orderstatus.domain", count(lit(1)),
          count(when(col("o_orderstatus").isNull ||
            !col("o_orderstatus").isin("O", "F", "P"), lit(1)))).as("c3"),
        report("orders.o_totalprice.positive", count(lit(1)),
          count(when(col("o_totalprice").isNull || col("o_totalprice") <= 0,
            lit(1)))).as("c4"))
        .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4"))).as("r"))
        .select(col("r.*"))
      val ordersRef = o.select(col("o_custkey")).join(
        broadcast(Tables.customer(s, dir).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("viol"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
        .select(lit("orders.o_custkey.ref_customer").as("constraint_name"),
          col("n").as("n_checked"), col("viol").as("n_violations"))
      val li = Tables.lineitem(s, dir)
      val liRef = li.select(col("l_orderkey")).join(
        o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("viol"))
        .crossJoin(broadcast(li.agg(count(lit(1)).as("n"))))
        .select(lit("lineitem.l_orderkey.ref_orders").as("constraint_name"),
          col("n").as("n_checked"), col("viol").as("n_violations"))
      val liRange = li.agg(count(lit(1)).as("n_checked"),
        count(when(col("l_quantity").isNull ||
          col("l_quantity") < 1 || col("l_quantity") > 50, lit(1)))
          .as("n_violations"))
        .select(lit("lineitem.l_quantity.range_1_50").as("constraint_name"),
          col("n_checked"), col("n_violations"))
      ordersWide.unionByName(ordersRef).unionByName(liRef).unionByName(liRange)
        .withColumn("passed", col("n_violations") === 0)
    },
    // Join-key skew diagnostic — the measurement that DECIDES between a
    // plain shuffle join, AQE skew splitting, and Ops.saltedJoin: the
    // top-10 heaviest keys with their corpus share and their ratio to
    // the mean key load, both in exact basis points (share_bp =
    // n·10⁴ div total; vs_mean_bp = n·n_keys·10⁴ div total — never
    // forms the mean, same move as the seasonal chart). One key-keyed
    // aggregate (map-side partial absorbs the raw volume), two
    // broadcast scalars, top-10 by (n DESC, key) — deterministic.
    "q_x_key_skew" -> { (s, dir) =>
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(tot))
        .orderBy(col("n").desc, col("user_id"))
        .limit(10)
        .select(col("user_id"), col("n"),
          expr("n * 10000 div total").as("share_bp"),
          expr("n * n_keys * 10000 div total").as("vs_mean_bp"))
    },
    // Per-stream freshness report: row count, newest event, and
    // staleness behind the globally newest event — the lag column an
    // ingest monitor alerts on (reference shape: the block-tail sync
    // status endpoints). Second-truncated per the ns rule; one rollup
    // plus one broadcast scalar.
    "q_x_freshness" -> { (s, dir) =>
      val perType = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(date_trunc("second", col("ts"))).as("newest"))
      perType
        .crossJoin(broadcast(perType.agg(max(col("newest")).as("global_newest"))))
        .select(col("event_type"), col("n"), col("newest"),
          (unix_timestamp(col("global_newest")) - unix_timestamp(col("newest")))
            .as("staleness_s"))
    },
    // Incident impact: user sessions overlapping error-burst windows —
    // composes three proven pieces. (1) the q_x_sessionize gap rule
    // verbatim (30-min, second-truncated, event_id tiebreak); (2) burst
    // windows = hours whose error count exceeds 1.25× the mean over
    // error-bearing hours (exact integer test 4·n·n_hours > 5·total — no
    // mean is ever formed), merged into maximal runs by the
    // gaps-and-islands move (the only unpartitioned window runs over
    // QUALIFYING HOURS — hour-grain rows, ~720/month at any corpus
    // size); (3) the session×burst pairing through
    // Ops.intervalOverlapJoin — bucketized, never BroadcastNestedLoop,
    // the two-sided range join a plain inequality join can't scale.
    "q_x_burst_sessions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = e
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .withColumn("is_new",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .withColumn("s_hi_open", col("session_end") + expr("INTERVAL 1 SECOND"))
      val hours = e.filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val stats = hours.agg(sum(col("n")).as("total"), count(lit(1)).as("n_hours"))
      val bursts = hours.crossJoin(broadcast(stats))
        .filter(col("n") * col("n_hours") * 4 > col("total") * 5)
        .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
        .withColumn("grp", expr("unix_timestamp(h) div 3600") - col("rn"))
        .groupBy(col("grp"))
        .agg(min(col("h")).as("burst_start"),
          (max(col("h")) + expr("INTERVAL 1 HOUR")).as("burst_end"))
        .select(col("burst_start"), col("burst_end"))
      Ops.intervalOverlapJoin(sessions, "session_start", "s_hi_open",
          bursts, "burst_start", "burst_end", bucketWidthSeconds = 3600L)
        .select(col("user_id"), col("session_id"),
          col("session_start"), col("session_end"),
          col("burst_start"), col("burst_end"))
    },
    // Day-of-week seasonal anomaly detection as a Poisson control chart:
    // a daily count more than 2σ from its (event_type, weekday) seasonal
    // mean μ (Poisson: σ = √μ) is flagged. A FIXED relative threshold
    // would stop firing as volume grows (noise shrinks ∝ 1/√n — a 10%
    // band that flags at sf0.01 is silent at 100 TB); the σ-scaled band
    // adapts. The test never forms μ or σ: with t = the dow slice's
    // total and d = its day count, "|n − t/d| > 2·√(t/d)" squares to the
    // integer test (n·d − t)² > 4·d·t — exact, hash-stable. Exactness
    // ceiling (the q_x_variance convention): the square needs
    // |n·d − t| < 3·10⁹, ample headroom since n·d ≈ t cancels all but
    // the fluctuation; past it, widen to DECIMAL. The
    // daily rollup absorbs the raw volume (one shuffle); the ≤ 7·|types|
    // seasonal table broadcasts back. The dow mean is the simplest
    // seasonal baseline — same report shape as q_x_outliers (z-score)
    // and q_x_outliers_mad (robust): three severity tiers of the same
    // contract.
    "q_x_seasonal_anomaly" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow", dayofweek(col("day")))
      val seasonal = daily.groupBy(col("event_type"), col("dow"))
        .agg(sum(col("n")).as("t"), count(lit(1)).as("d"))
      daily.join(broadcast(seasonal), Seq("event_type", "dow"))
        .filter((col("n") * col("d") - col("t")) * (col("n") * col("d") - col("t"))
          > col("d") * col("t") * 4)
        .select(col("event_type"), col("day"), col("dow"), col("n"),
          col("t").as("dow_total"), col("d").as("dow_days"))
    },
    // Distribution-drift monitor: two-sample chi-square per event type
    // between the month's first half (reference) and second half
    // (current) over fixed 50-unit value bins — the ingest-monitoring
    // gate that fires when a feed's value distribution shifts (schema
    // stays green, semantics drift). Chi-square instead of PSI/KL by
    // DESIGN: the statistic is rational in the counts (no libm ln), so
    // with expected counts formed as one integer-exact product per side
    // and the per-bin terms folded in bin order, the whole number is
    // bit-deterministic cross-engine. An empty cohort contributes 0 for
    // its side (the standard convention). One (type, bin) aggregate +
    // one type-keyed rollup — bounded key space at any volume.
    // Body extracted to the shared Drift kernel (r16): state + finisher
    // are one definition with the streaming twin.
    "q_x_drift_chi2" -> { (s, dir) =>
      graft.operators.Drift.chi2FromCounts(
        graft.operators.Drift.binCounts(Tables.events(s, dir)))
    },
    // Distribution drift, 1-D WASSERSTEIN tier (earth-mover distance on
    // the binned value grid) — the drift number the chi-square tier
    // can't give: χ² is magnitude-blind (mass moving one bin over and
    // mass moving nine bins over can score the same), while W1 IS the
    // total mass-times-distance moved, the quantity a data-mixture
    // rebalance actually acts on. On the shared 10-bin integer grid the
    // statistic is ALL-INTEGER: W1·n_ref·n_cur = Σ_k |cumRef_k·n_cur −
    // cumCur_k·n_ref| · gap_k (gap = distance to the next OCCUPIED bin —
    // absent bins carry the running cumulative, so the gap multiplier
    // replays them exactly without densifying). One exact double
    // division at the end (the q_x_bm25 single-division move). Bound:
    // needs n_ref·n_cur < 2⁶³ — fine to ~3·10⁹ rows per side per type;
    // past that, fold in decimal(38,0). Same (type, bin) aggregate +
    // 10-row-per-type windows as the χ² tier — bounded key space at any
    // volume; types with an empty cohort are excluded (W1 needs both
    // distributions).
    "q_x_drift_w1" -> { (s, dir) =>
      graft.operators.Drift.w1FromCounts(
        graft.operators.Drift.binCounts(Tables.events(s, dir)))
    },
    // Grouped BOOTSTRAP confidence interval for the per-type mean value —
    // "is the difference between two feeds' means real or noise?", the
    // uncertainty number a mixture-rebalance decision needs next to the
    // point estimate. POISSON bootstrap (the distributed form: no global
    // resample pass — each row draws its per-replicate multiplicity
    // independently), derandomized: replicate weight w(row, b) comes from
    // the md5 split-hash of (event_id, b) against the Poisson(1) CDF in
    // fixed ppm thresholds (tail capped at 5, CDF 0.999406 — the cap
    // shifts nothing at these n), so both engines replay the exact same
    // resamples. Replicate means are exact integer cents (one div per
    // replicate); the CI is the 2nd / (B−1)th ranked mean of B = 32
    // replicates (~2.5th/97.5th percentile at this B), ties broken by
    // replicate id. Scale shape: the B× explode happens BEFORE a
    // map-side-combinable (type, b) aggregate — the fan-out costs B×
    // scan-side compute (the bootstrap's irreducible price) but shuffles
    // only |types|·B keys; the rank window runs over B rows per type.
    // Body extracted to the shared Resample kernel (r16): additive
    // (type, replicate) state + ranked-cut finisher are one definition
    // with the streaming twin.
    "q_x_bootstrap_ci" -> { (s, dir) =>
      graft.operators.Resample.bootstrapCiFromState(
        graft.operators.Resample.bootstrapState(Tables.events(s, dir)))
    },
    // Welch two-sample z for the per-type mean over the shared drift
    // split — the MEAN-level significance tier the distribution trio
    // can't give: χ²/W1/KS say the shape moved, Welch says whether the
    // mean shift clears sampling noise (what a mixture-rebalance acts
    // on), and q_x_bootstrap_ci is its assumption-free cross-check.
    // Exact DECIMAL(38,0) moment numerators, doubles derived by the
    // identical expression tree on both engines (q_x_variance stance).
    "q_x_drift_welch" -> { (s, dir) =>
      graft.operators.Drift.welchFromState(
        graft.operators.Drift.momentCounts(Tables.events(s, dir)))
    },
    // Pooled two-proportion z over the shared drift split — the RATE
    // member of the report: did the high-value share move (Welch covers
    // the mean; a share can shift while the mean stands still).
    "q_x_drift_prop_z" -> { (s, dir) =>
      graft.operators.Drift.propZFromCounts(
        graft.operators.Drift.proportionCounts(Tables.events(s, dir)))
    },
    // CUPED variance reduction — the third member of the experiment-
    // analysis trio (bootstrap CI = assumption-free uncertainty, Welch =
    // mean significance, CUPED = how much sensitivity the pre-period
    // covariate buys): per user x = reference-half cents, y =
    // current-half cents; θ = cov/var(x), ρ², and the adjusted variance
    // share 1 − ρ² per type. Exact DECIMAL(38,0)/HUGEINT bivariate
    // moments, doubles via the identical expression tree (OLS stance).
    "q_x_cuped" -> { (s, dir) =>
      graft.operators.Drift.cupedFromState(
        graft.operators.Drift.cupedMoments(Tables.events(s, dir)))
    },
    // Snapshot DIFF between two as-of versions of the per-customer
    // latest-order state — the ops tool every SCD/backfill pipeline
    // needs ("what changed between yesterday's build and today's"):
    // FULL OUTER on the key, rows classified added / removed / changed
    // (same rows are suppressed — the diff should be small even when
    // the snapshots are huge, and everything downstream of the join is
    // change-set-sized). Each snapshot is one latestPerKey pass.
    "q_x_snapshot_diff" -> { (s, dir) =>
      def snap(cutoff: String) = Ops.latestPerKey(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") <= lit(cutoff).cast("timestamp")),
        Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").cast("decimal(18,2)").as("total"))
      val a = snap("1998-01-01")
      val b = snap("2000-01-01")
      a.as("a").join(b.as("b"),
          col("a.custkey") === col("b.custkey"), "full_outer")
        .select(
          coalesce(col("a.custkey"), col("b.custkey")).as("custkey"),
          when(col("a.custkey").isNull, lit("added"))
            .when(col("b.custkey").isNull, lit("removed"))
            .when(col("a.status") =!= col("b.status") ||
              col("a.total") =!= col("b.total"), lit("changed"))
            .otherwise(lit("same")).as("change_type"),
          col("a.status").as("status_before"), col("b.status").as("status_after"),
          // compared exactly as DECIMAL above; final-cast DOUBLE per the
          // export contract (driver hash is decimal-unsafe, DRIVER_BUG.md)
          col("a.total").cast("double").as("total_before"),
          col("b.total").cast("double").as("total_after"))
        .filter(col("change_type") =!= "same")
    },
    // Incremental aggregate maintenance: the standing rollup (month days
    // 1–15) MERGED with the new batch's rollup (days 16+) — the delta-
    // refresh every warehouse gold table lives by, demonstrated with the
    // mergeable-moment set (count/sum/min/max in exact cents; a distinct
    // count is exactly what CANNOT merge this way — that is the sketch
    // family's job, q_x_hll_rollup). The ORACLE is the direct full-table
    // aggregate — a genuinely different derivation, so the green row
    // proves merge(partials) ≡ recompute rather than replaying it.
    "q_x_incr_rollup" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_type"),
        dayofmonth(col("ts")).as("dom"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      def roll(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      roll(e.filter(col("dom") <= 15))
        .unionByName(roll(e.filter(col("dom") > 15)))
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("cents_sum")).as("cents_sum"),
          min(col("min_cents")).as("min_cents"),
          max(col("max_cents")).as("max_cents"))
    },
    // Winsorization (tail clipping) of the value feed at the exact p12.5 /
    // p87.5 per event type — the feature-robustification pass before any
    // mean-based downstream statistic. The percentile points are EIGHTHS
    // by design: (n−1)/8 positions and interpolation fractions are
    // binary-exact, so both engines produce the identical bound (the
    // length-quantiles quarter-fraction precedent). The clipped SUM needs
    // no ordered fold at all: bounds are eighth-multiples, so 8× the
    // clipped values are INTEGERS — summed exactly in any order (the
    // production shape: plain partial-aggregated sum, zero buffers) and
    // divided by 8 (exact) only at the end.
    "q_x_winsorize" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val bounds = e.groupBy(col("event_type"))
        .agg((expr("percentile(c, 0.125)") * 8).cast("long").as("lo8"),
          (expr("percentile(c, 0.875)") * 8).cast("long").as("hi8"))
      e.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_type"), col("lo8"), col("hi8"), col("c"),
          greatest(col("lo8"), least(col("hi8"), col("c") * 8)).as("c8"))
        .groupBy(col("event_type"))
        .agg(min(col("lo8")).as("__lo8"), min(col("hi8")).as("__hi8"),
          count(lit(1)).as("n"),
          count(when(col("c") * 8 < col("lo8"), lit(1))).as("n_lo_clipped"),
          count(when(col("c") * 8 > col("hi8"), lit(1))).as("n_hi_clipped"),
          sum(col("c8")).as("__s8"))
        .select(col("event_type"),
          (col("__lo8").cast("double") / 800).as("lo"),
          (col("__hi8").cast("double") / 800).as("hi"),
          col("n"), col("n_lo_clipped"), col("n_hi_clipped"),
          (col("__s8").cast("double") / 800).as("sum_clipped"))
    },
    // k-anonymity audit — the re-identification gate a dataset release
    // (or a training corpus carrying user-derived metadata) runs before
    // publication: every quasi-identifier combination (here nation ×
    // market segment × account-balance band) backed by fewer than k=3
    // individuals is reported with its size, the rows a suppression /
    // generalization pass must treat. One wide-key aggregate (map-side
    // combine does the heavy lifting; the QI key space is bounded, so
    // the post-shuffle table is small at any corpus size) + a HAVING.
    // The band edge uses floor on an IEEE double quotient — the same
    // bit-deterministic-on-both-engines argument as q_x_embed_quant.
    "q_x_k_anon" -> { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("group_size"))
        .filter(col("group_size") < 3)
    },
    // Two-sample Kolmogorov–Smirnov drift per stream — the BINLESS tier
    // completing the drift trio (χ² = binned association, W1 = binned
    // magnitude, KS = exact sup-norm on the raw value domain, the test
    // that catches a shape shift the fixed bins straddle). The statistic
    // stays integral by cross-multiplication: D·n₁·n₂ = max over values
    // of |cum₁·n₂ − cum₂·n₁| with inclusive cumulatives per cohort over
    // DISTINCT cents — the domain-bounded auc/gini window shape — and
    // ONE closing double division. Same ref/current split as
    // q_x_drift_chi2 (day ≤ 15), so the three tiers read as one report.
    "q_x_drift_ks" -> { (s, dir) =>
      graft.operators.Drift.ksFromCounts(
        graft.operators.Drift.centsCounts(Tables.events(s, dir)))
    },
    // Herfindahl–Hirschman concentration per event stream — Gini's
    // antitrust sibling over the per-USER volume shares: HHI = Σ sᵢ²
    // carried cross-multiplied as Σ vᵢ² / (Σv)² so no share ever floats
    // (numerator Σ vᵢ² exact BIGINT over cents, one closing division;
    // hhi ∈ (0, 1], 1 = one whale carries everything). One user-keyed
    // aggregate absorbs the events map-side; the squares fold over the
    // per-user totals, user-cardinality-sized.
    "q_x_hhi" -> { (s, dir) =>
      val byUser = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("c")).as("v"))
      byUser.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"), sum(col("v")).as("total_cents"),
          sum(col("v") * col("v")).as("sum_sq"))
        .select(col("event_type"), col("n_users"), col("total_cents"),
          col("sum_sq"),
          // denominator squared in DOUBLE: total² would overflow int64
          // around sf1 (total ~10¹⁰ cents). The total_cents→double cast
          // is exact while total ≤ 2⁵³ (~9·10¹⁵ cents); sum_sq can
          // exceed 2⁵³ much earlier, so ITS cast may round — cross-engine
          // equality still holds because both engines apply the same
          // IEEE-754 round-to-nearest, but hhi itself is then correct to
          // double precision, not exact (exactness would need the
          // numerator squared in DECIMAL(38,0))
          when(col("total_cents") > 0, col("sum_sq").cast("double") /
            (col("total_cents").cast("double") * col("total_cents").cast("double")))
            .as("hhi"))
    },
    // Gini concentration coefficient per event stream — "is the volume
    // carried by a few whales?", the inequality number behind source-
    // mixing and rate-limiting decisions. Exact rank formula
    // G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) with the numerator kept
    // BIGINT: ranks never materialize per row — the (type, value) group
    // sizes give each tied block's rank mass in closed form
    // (x·(2·n_v·cumBefore + n_v·(n_v+1)) doubled to stay integral,
    // invariant under tie order because tied values are equal), and the
    // cumulative runs over DISTINCT cents values — domain-bounded, the
    // q_x_auc shape. One double division at the end.
    "q_x_gini" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, dir).select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val g = v.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("nv"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumb", coalesce(sum(col("nv")).over(w), lit(0L)))
        .groupBy(col("event_type"))
        .agg(sum(col("nv")).as("n"), sum(col("c") * col("nv")).as("sx"),
          sum(col("c") * (col("nv") * col("cumb") * 2 +
            col("nv") * (col("nv") + 1))).as("r2x"))
        .select(col("event_type"), col("n"), col("sx"),
          (col("r2x") - (col("n") + 1) * col("sx")).as("gini_num"),
          ((col("r2x") - (col("n") + 1) * col("sx")).cast("double") /
            (col("n") * col("sx")).cast("double")).as("gini"))
    },
    // Benford first-digit audit per event stream — the fabricated-data /
    // unit-mixup tripwire: observed leading-digit counts vs the Benford
    // expectation carried as INTEGER ppm literals (log10(1+1/d) is a
    // public constant table, not a runtime transcendental — the FS-weight
    // stance), deviation as the exact cross-multiplied
    // |obs·10⁶ − ppm·n| so no rate is ever floated. Zero-count digits
    // are restored by a 9-row universe join (absent evidence IS
    // evidence of deviation). One digit-keyed aggregate behind map-side
    // combine; the keyspace is 9 × stream count at any corpus size.
    "q_x_benford" -> { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .filter(col("c") > 0)
        .withColumn("digit", substring(col("c").cast("string"), 1, 1).cast("long"))
      val ppm = array(Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L).map(lit): _*)
      val obs = d.groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("obs"))
      val universe = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          explode(sequence(lit(1L), lit(9L))).as("digit"))
        .withColumn("expected_ppm", element_at(ppm, col("digit").cast("int")))
      universe.join(obs, Seq("event_type", "digit"), "left")
        .select(col("event_type"), col("digit"),
          coalesce(col("obs"), lit(0L)).as("obs"), col("n"), col("expected_ppm"),
          abs(coalesce(col("obs"), lit(0L)) * lit(1000000L) -
            col("expected_ppm") * col("n")).as("dev"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // the DIRECT full-table aggregate — the independent derivation the
    // engine's merge-of-partials must equal
    "q_x_incr_rollup" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  min(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS min_cents,
        |  max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS max_cents
        |FROM events GROUP BY event_type""".stripMargin,
    // quantile_cont at the same exact-eighth points, the same 8x integer
    // clip, order-free integer sums, one final double division
    "q_x_winsorize" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |b AS (SELECT event_type,
        |    CAST(quantile_cont(c, 0.125) * 8 AS BIGINT) AS lo8,
        |    CAST(quantile_cont(c, 0.875) * 8 AS BIGINT) AS hi8
        |  FROM ev GROUP BY 1),
        |j AS (SELECT ev.event_type, b.lo8, b.hi8, ev.c,
        |    greatest(b.lo8, least(b.hi8, ev.c * 8)) AS c8
        |  FROM ev JOIN b USING (event_type))
        |SELECT event_type,
        |  CAST(min(lo8) AS DOUBLE) / 800 AS lo,
        |  CAST(min(hi8) AS DOUBLE) / 800 AS hi,
        |  count(*) AS n,
        |  count(CASE WHEN c * 8 < lo8 THEN 1 END) AS n_lo_clipped,
        |  count(CASE WHEN c * 8 > hi8 THEN 1 END) AS n_hi_clipped,
        |  CAST(sum(c8) AS DOUBLE) / 800 AS sum_clipped
        |FROM j GROUP BY event_type""".stripMargin,
    // the same integer-exact expected counts and bin-ordered term fold
    "q_x_drift_chi2" ->
      """WITH ev AS (SELECT event_type, (day(ts) <= 15) AS is_ref,
        |    least(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000, 9) AS bin
        |  FROM events),
        |c AS (SELECT event_type, bin,
        |    count(CASE WHEN is_ref THEN 1 END) AS o1,
        |    count(CASE WHEN NOT is_ref THEN 1 END) AS o2
        |  FROM ev GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(o1) AS BIGINT) AS n1,
        |    CAST(sum(o2) AS BIGINT) AS n2 FROM c GROUP BY 1),
        |terms AS (SELECT c.event_type, c.bin, t.n1, t.n2,
        |    CAST((c.o1 + c.o2) * t.n1 AS DOUBLE) / CAST(t.n1 + t.n2 AS DOUBLE) AS e1,
        |    CAST((c.o1 + c.o2) * t.n2 AS DOUBLE) / CAST(t.n1 + t.n2 AS DOUBLE) AS e2,
        |    CAST(c.o1 AS DOUBLE) AS d1, CAST(c.o2 AS DOUBLE) AS d2
        |  FROM c JOIN t USING (event_type)),
        |tt AS (SELECT event_type, bin, n1, n2,
        |    (CASE WHEN n1 > 0 THEN (d1 - e1) * (d1 - e1) / e1 ELSE CAST(0.0 AS DOUBLE) END)
        |    + (CASE WHEN n2 > 0 THEN (d2 - e2) * (d2 - e2) / e2 ELSE CAST(0.0 AS DOUBLE) END)
        |      AS term
        |  FROM terms)
        |SELECT event_type, min(n1) AS n_ref, min(n2) AS n_cur,
        |  CAST(count(*) AS INT) AS n_bins,
        |  list_reduce(list(term ORDER BY bin), (a, x) -> a + x) AS chi2
        |FROM tt GROUP BY event_type""".stripMargin,
    // the same cumulative grid, gap-weighted |cross-difference| sum, one
    // closing double division — all-integer until the last step
    "q_x_drift_w1" ->
      """WITH ev AS (SELECT event_type, (day(ts) <= 15) AS is_ref,
        |    least(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000, 9) AS bin
        |  FROM events),
        |c AS (SELECT event_type, bin,
        |    count(CASE WHEN is_ref THEN 1 END) AS o1,
        |    count(CASE WHEN NOT is_ref THEN 1 END) AS o2
        |  FROM ev GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(o1) AS BIGINT) AS n1,
        |    CAST(sum(o2) AS BIGINT) AS n2 FROM c GROUP BY 1),
        |cum AS (SELECT event_type, bin,
        |    CAST(sum(o1) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
        |    CAST(sum(o2) OVER (PARTITION BY event_type ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2,
        |    coalesce(lead(bin) OVER (PARTITION BY event_type ORDER BY bin), 10) - bin AS gap
        |  FROM c),
        |s AS (SELECT cum.event_type, t.n1 AS n_ref, t.n2 AS n_cur,
        |    CAST(sum(abs(c1 * t.n2 - c2 * t.n1) * gap) AS BIGINT) AS w1_num
        |  FROM cum JOIN t USING (event_type)
        |  WHERE t.n1 > 0 AND t.n2 > 0
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, n_ref, n_cur, w1_num,
        |  CAST(w1_num AS DOUBLE) / CAST(n_ref * n_cur AS DOUBLE) AS w1_bins
        |FROM s""".stripMargin,
    // both as-of snapshots replayed as rank-1 scans, full-outer diffed
    // the same four integer counts and the identical pooled-z tree
    "q_x_drift_prop_z" ->
      """WITH ev AS (SELECT event_type, (day(ts) <= 15) AS is_ref,
        |    (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 5000) AS hi
        |  FROM events),
        |m AS (SELECT event_type,
        |    CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS n1,
        |    CAST(count(CASE WHEN is_ref AND hi THEN 1 END) AS BIGINT) AS k1,
        |    CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT) AS n2,
        |    CAST(count(CASE WHEN NOT is_ref AND hi THEN 1 END) AS BIGINT) AS k2
        |  FROM ev GROUP BY 1)
        |SELECT event_type, n1 AS n_ref, k1 AS k_ref, n2 AS n_cur, k2 AS k_cur,
        |  CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p_ref,
        |  CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p_cur,
        |  CASE WHEN k1 + k2 > 0 AND k1 + k2 < n1 + n2 THEN
        |    (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |    / sqrt((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |         * (1.0 - CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |         * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
        |  END AS prop_z
        |FROM m WHERE n1 > 0 AND n2 > 0""".stripMargin,
    // the same per-user cohort rollup, HUGEINT bivariate moments, and
    // identical double expression tree (no sqrt — ρ² stays rational)
    "q_x_cuped" ->
      """WITH ev AS (SELECT event_type, user_id, (day(ts) <= 15) AS is_ref,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |pu AS (SELECT event_type, user_id,
        |    CAST(coalesce(sum(CASE WHEN is_ref THEN c END), 0) AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN NOT is_ref THEN c END), 0) AS BIGINT) AS y
        |  FROM ev GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM pu GROUP BY 1),
        |f AS (SELECT event_type, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
        |  FROM m WHERE n > 1 AND (n * sxx - sx * sx) > 0
        |    AND (n * syy - sy * sy) > 0)
        |SELECT event_type, n AS n_users,
        |  covn / varxn AS theta,
        |  covn * covn / (varxn * varyn) AS rho2,
        |  1.0 - covn * covn / (varxn * varyn) AS var_ratio_adj
        |FROM f""".stripMargin,
    // the same HUGEINT moment pieces and the identical double expression
    // tree (single-division mean diff, Welch variance terms, one sqrt)
    "q_x_drift_welch" ->
      """WITH ev AS (SELECT event_type, (day(ts) <= 15) AS is_ref,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |m AS (SELECT event_type,
        |    CAST(count(CASE WHEN is_ref THEN 1 END) AS BIGINT) AS n1,
        |    CAST(count(CASE WHEN NOT is_ref THEN 1 END) AS BIGINT) AS n2,
        |    sum(CASE WHEN is_ref THEN CAST(c AS HUGEINT) END) AS s1,
        |    sum(CASE WHEN NOT is_ref THEN CAST(c AS HUGEINT) END) AS s2,
        |    sum(CASE WHEN is_ref THEN CAST(c AS HUGEINT) * c END) AS q1,
        |    sum(CASE WHEN NOT is_ref THEN CAST(c AS HUGEINT) * c END) AS q2
        |  FROM ev GROUP BY 1),
        |f AS (SELECT event_type, n1, n2,
        |    CAST(s1 * n2 - s2 * n1 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS dm,
        |    CAST(n1 * q1 - s1 * s1 AS DOUBLE) / CAST(n1 * (n1 - 1) AS DOUBLE) AS v1,
        |    CAST(n2 * q2 - s2 * s2 AS DOUBLE) / CAST(n2 * (n2 - 1) AS DOUBLE) AS v2
        |  FROM m WHERE n1 > 1 AND n2 > 1)
        |SELECT event_type, n1 AS n_ref, n2 AS n_cur, dm AS mean_diff_c,
        |  dm / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS welch_z,
        |  abs(dm / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))) > 1.96
        |    AS significant
        |FROM f""".stripMargin,
    // the same derandomized Poisson weights (md5 split-hash vs the ppm
    // CDF thresholds), integer replicate means, and ranked-cut CI
    "q_x_bootstrap_ci" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
        |reps AS (SELECT event_type, c, event_id, unnest(range(0, 32)) AS b FROM ev),
        |h AS (SELECT event_type, c, b,
        |    CAST(concat('0x', substr(md5(concat('boot:', CAST(event_id AS VARCHAR),
        |      ':', CAST(b AS VARCHAR))), 1, 16)) AS UBIGINT) AS u0
        |  FROM reps),
        |u AS (SELECT event_type, c, b,
        |    ((CASE WHEN u0 >= CAST(9223372036854775808 AS UBIGINT)
        |      THEN CAST(CAST(u0 AS HUGEINT) - 18446744073709551616 AS BIGINT)
        |      ELSE CAST(u0 AS BIGINT) END % 1000000) + 1000000) % 1000000 AS u
        |  FROM h),
        |w AS (SELECT event_type, c, b,
        |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |         WHEN u < 996340 THEN 4 ELSE 5 END AS w
        |  FROM u),
        |m AS (SELECT event_type, b,
        |    CAST(sum(w * c) AS BIGINT) // CAST(sum(w) AS BIGINT) AS mean_c
        |  FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
        |r AS (SELECT event_type, b, mean_c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY mean_c, b) AS r,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM m)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_boot,
        |  min(mean_c) AS boot_min, max(mean_c) AS boot_max,
        |  max(CASE WHEN r = 2 THEN mean_c END) AS ci_lo_c,
        |  max(CASE WHEN r = cnt - 1 THEN mean_c END) AS ci_hi_c
        |FROM r GROUP BY 1""".stripMargin,
    "q_x_snapshot_diff" ->
      """WITH sa AS (SELECT o_custkey AS custkey, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS total
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01')
        |  WHERE rn = 1),
        |sb AS (SELECT o_custkey AS custkey, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS total
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate <= TIMESTAMP '2000-01-01')
        |  WHERE rn = 1),
        |d AS (SELECT coalesce(sa.custkey, sb.custkey) AS custkey,
        |    CASE WHEN sa.custkey IS NULL THEN 'added'
        |         WHEN sb.custkey IS NULL THEN 'removed'
        |         WHEN sa.status <> sb.status OR sa.total <> sb.total THEN 'changed'
        |         ELSE 'same' END AS change_type,
        |    sa.status AS status_before, sb.status AS status_after,
        |    CAST(sa.total AS DOUBLE) AS total_before,
        |    CAST(sb.total AS DOUBLE) AS total_after
        |  FROM sa FULL OUTER JOIN sb ON sa.custkey = sb.custkey)
        |SELECT * FROM d WHERE change_type <> 'same'""".stripMargin,
    "q_x_k_anon" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  count(*) AS group_size
        |FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 3""".stripMargin,
    "q_x_dq_report" ->
      """SELECT r.*, (r.n_violations = 0) AS passed FROM (
        |SELECT 'orders.o_orderkey.unique' AS constraint_name,
        |  count(*) AS n_checked,
        |  count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
        |UNION ALL
        |SELECT 'orders.o_custkey.not_null', count(*),
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END) FROM orders
        |UNION ALL
        |SELECT 'orders.o_orderstatus.domain', count(*),
        |  count(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |    OR o_orderstatus IS NULL THEN 1 END) FROM orders
        |UNION ALL
        |SELECT 'orders.o_totalprice.positive', count(*),
        |  count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 END)
        |FROM orders
        |UNION ALL
        |SELECT 'orders.o_custkey.ref_customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'lineitem.l_orderkey.ref_orders',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'lineitem.l_quantity.range_1_50', count(*),
        |  count(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |    THEN 1 END) FROM lineitem
        |) r""".stripMargin,
    "q_x_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c)
        |SELECT c.user_id, c.n,
        |  c.n * 10000 // t.total AS share_bp,
        |  c.n * t.n_keys * 10000 // t.total AS vs_mean_bp
        |FROM c CROSS JOIN t
        |ORDER BY c.n DESC, c.user_id LIMIT 10""".stripMargin,
    "q_x_freshness" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type FROM events),
        |per AS (SELECT event_type, count(*) AS n,
        |    max(date_trunc('second', ts)) AS newest FROM ev GROUP BY 1),
        |g AS (SELECT max(newest) AS global_newest FROM per)
        |SELECT per.event_type, per.n, per.newest,
        |  (epoch_us(g.global_newest) - epoch_us(per.newest)) // 1000000 AS staleness_s
        |FROM per CROSS JOIN g""".stripMargin,
    // plain overlap join replays the bucketized responsibility-rule join;
    // b.burst_start <= s.session_end ≡ the engine's b.lo < s_hi_open at
    // second grain
    "q_x_burst_sessions" ->
      """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type FROM events),
        |e2 AS (SELECT user_id, event_id, event_type, date_trunc('second', ts) AS ts FROM ev),
        |g AS (SELECT *, epoch(ts) - epoch(lag(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s FROM e2),
        |sg AS (SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |sess AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS session_id FROM sg),
        |sessions AS (SELECT user_id, session_id,
        |    min(ts) AS session_start, max(ts) AS session_end
        |  FROM sess GROUP BY 1, 2),
        |eh AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM e2 WHERE event_type = 'error' GROUP BY 1),
        |st AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_hours FROM eh),
        |q AS (SELECT h FROM eh CROSS JOIN st WHERE n * n_hours * 4 > total * 5),
        |i AS (SELECT h, CAST(epoch(h) AS BIGINT) // 3600
        |    - row_number() OVER (ORDER BY h) AS grp FROM q),
        |b AS (SELECT min(h) AS burst_start, max(h) + INTERVAL 1 HOUR AS burst_end
        |  FROM i GROUP BY grp)
        |SELECT user_id, session_id, session_start, session_end, burst_start, burst_end
        |FROM sessions s JOIN b
        |  ON s.session_start < b.burst_end AND b.burst_start <= s.session_end""".stripMargin,
    "q_x_seasonal_anomaly" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type FROM events),
        |daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    count(*) AS n FROM ev GROUP BY 1, 2),
        |d2 AS (SELECT *, CAST(dayofweek(day) + 1 AS INT) AS dow FROM daily),
        |seasonal AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS t,
        |    count(*) AS d FROM d2 GROUP BY 1, 2)
        |SELECT d2.event_type, d2.day, d2.dow, d2.n,
        |  s.t AS dow_total, s.d AS dow_days
        |FROM d2 JOIN seasonal s ON d2.event_type = s.event_type AND d2.dow = s.dow
        |WHERE (d2.n * s.d - s.t) * (d2.n * s.d - s.t) > s.d * s.t * 4""".stripMargin,
    // the same per-user volume rollup and cross-multiplied share squares
    "q_x_hhi" ->
      """WITH ev AS (SELECT event_type, user_id, value FROM events),
        |u AS (SELECT event_type, user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM ev GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n_users,
        |    CAST(sum(v) AS BIGINT) AS total_cents,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM u GROUP BY 1)
        |SELECT event_type, n_users, total_cents, sum_sq,
        |  CASE WHEN total_cents > 0 THEN CAST(sum_sq AS DOUBLE)
        |    / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
        |  END AS hhi
        |FROM m""".stripMargin,
    // the same per-cohort inclusive cumulatives over distinct cents and
    // cross-multiplied sup-norm
    "q_x_drift_ks" ->
      """WITH ev AS (SELECT event_type, (day(ts) <= 15) AS is_ref,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |g AS (SELECT event_type, c,
        |    count(CASE WHEN is_ref THEN 1 END) AS o1,
        |    count(CASE WHEN NOT is_ref THEN 1 END) AS o2
        |  FROM ev GROUP BY 1, 2),
        |cu AS (SELECT event_type, c, o1, o2,
        |    CAST(sum(o1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(o2) OVER w AS BIGINT) AS cum2
        |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT event_type, CAST(sum(o1) AS BIGINT) AS n_ref,
        |    CAST(sum(o2) AS BIGINT) AS n_cur FROM g GROUP BY 1)
        |SELECT cu.event_type, t.n_ref, t.n_cur,
        |  max(abs(cu.cum1 * t.n_cur - cu.cum2 * t.n_ref)) AS ks_num,
        |  CASE WHEN t.n_ref > 0 AND t.n_cur > 0
        |    THEN CAST(max(abs(cu.cum1 * t.n_cur - cu.cum2 * t.n_ref)) AS DOUBLE)
        |      / CAST(t.n_ref * t.n_cur AS DOUBLE) END AS ks
        |FROM cu JOIN t USING (event_type)
        |GROUP BY 1, 2, 3""".stripMargin,
    // the same tied-block rank mass in closed form over distinct cents
    "q_x_gini" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |v AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev),
        |g AS (SELECT event_type, c, count(*) AS nv FROM v GROUP BY 1, 2),
        |cu AS (SELECT event_type, c, nv,
        |    coalesce(sum(nv) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM g),
        |m AS (SELECT event_type, CAST(sum(nv) AS BIGINT) AS n,
        |    CAST(sum(c * nv) AS BIGINT) AS sx,
        |    CAST(sum(c * (2 * nv * cumb + nv * (nv + 1))) AS BIGINT) AS r2x
        |  FROM cu GROUP BY 1)
        |SELECT event_type, n, sx,
        |  r2x - (n + 1) * sx AS gini_num,
        |  CAST(r2x - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
        |FROM m""".stripMargin,
    // identical ppm literal table (VALUES), universe cross join, and
    // cross-multiplied integer deviation
    "q_x_benford" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |c AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev),
        |d AS (SELECT event_type,
        |    CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM c WHERE c > 0),
        |b AS (SELECT CAST(digit AS BIGINT) AS digit, CAST(ppm AS BIGINT) AS ppm
        |  FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
        |    (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |    AS t(digit, ppm)),
        |g AS (SELECT event_type, digit, count(*) AS obs FROM d GROUP BY 1, 2),
        |n AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1)
        |SELECT n.event_type, b.digit, coalesce(g.obs, 0) AS obs, n.n,
        |  b.ppm AS expected_ppm,
        |  abs(coalesce(g.obs, 0) * 1000000 - b.ppm * n.n) AS dev
        |FROM n CROSS JOIN b
        |LEFT JOIN g ON g.event_type = n.event_type AND g.digit = b.digit""".stripMargin
  )
}
