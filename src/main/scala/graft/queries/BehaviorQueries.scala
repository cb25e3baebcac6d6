package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Behavioral analytics over the event stream — the three classic
  * product-analytics operators every event warehouse ends up hand-writing
  * (the reference's events feed serves its protocol activity endpoints;
  * these are the same shapes generalized: ordered funnels, cohort
  * retention, and SCD2 dimension-history builds).
  *
  * All three are user-keyed: every shuffle in the module hashes on
  * `user_id`, so at 100 TB each stage scales with the user population and
  * consecutive user-keyed stages reuse one Exchange (Catalyst's
  * EnsureRequirements sees the child already hash-partitioned on the key).
  * No driver-side state anywhere.
  */
object BehaviorQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** Doubled median per `keyCol`: the middle value ×2 (odd count) or the
    * two middles' sum (even) — always an integer for integer inputs,
    * never an interpolated double, so median comparisons stay hash-exact
    * (compare 2·x against med2, not x against med2/2). Positional over
    * (valCol, tieCol); the per-key partitions bound the sorts.
    */
  private def doubledMedian(df: DataFrame, keyCol: String, valCol: String,
      tieCol: String, out: String): DataFrame = {
    require(!df.columns.exists(Set("__rn", "__cnt")),
      "doubledMedian reserves the __rn/__cnt column names")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol), col(tieCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === expr("(__cnt + 1) div 2") ||
        col("__rn") === expr("(__cnt + 2) div 2"))
      .groupBy(col(keyCol))
      .agg(expr(s"CASE WHEN count(*) = 1 THEN 2 * min($valCol) ELSE sum($valCol) END AS $out"))
  }
  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Marketing attribution, both classic models in one output: every
    // purchase credits its revenue to a click-touch day — LAST-touch via
    // the one-shuffle as-of join (nearest preceding click), FIRST-touch
    // via each user's earliest click (purchases before any click are
    // unattributed and dropped by both models, matching the inner-ASOF
    // oracle). Same-second click ties are harmless BY CONSTRUCTION: the
    // only value carried off the click is its DAY, identical across
    // tied rows — the JoinQueries.q_j5 tie lesson applied. Revenue in
    // exact cents; per-(model, day) rollup.
    "q_x_attribution" -> { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("cents"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"),
          date_trunc("day", col("ts")).as("cday"))
      val lastTouch = graft.functions.Ops.asOfJoin(
          purchases, clicks.select(col("user_id"), col("cts"), col("cday")),
          "user_id", "user_id", "ts", "cts", Seq("cday"))
        .filter(col("cday").isNotNull)
        .select(lit("last_touch").as("model"), col("cday").as("touch_day"),
          col("cents"))
      val firstClick = clicks.groupBy(col("user_id"))
        .agg(min(col("cts")).as("fts"))
      val firstTouch = purchases.join(firstClick, Seq("user_id"))
        .filter(col("ts") >= col("fts"))
        .select(lit("first_touch").as("model"),
          date_trunc("day", col("fts")).as("touch_day"), col("cents"))
      lastTouch.unionByName(firstTouch)
        .groupBy(col("model"), col("touch_day"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
    },
    // Point-in-time-correct feature assembly — the feature-store join
    // that keeps a training set leakage-free: each observation (purchase)
    // takes, AS OF ITS OWN TIMESTAMP, the newest values from two feature
    // streams updated on different cadences (the user's cumulative click
    // count, and their last viewed value) — never a feature computed
    // later than the label event. Two one-shuffle as-of joins; features
    // carry their own feature-time so staleness is inspectable. The
    // oracle replays both as inner/left ASOF joins. Exact integers
    // throughout (cumulative count; last view in cents).
    "q_x_pit_features" -> { (s, dir) =>
      import graft.functions.Ops
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val obs = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("cents").as("label_cents"))
      // BOTH feature streams collapse to (user, second) grain FIRST: the
      // as-of join picks one row among equal feature timestamps
      // arbitrarily, so tied rows must already agree (the q_j5 tie rule).
      // Stream 1: cumulative click count — per-second counts, then a
      // running sum over the now-UNIQUE per-user ts order.
      val clickCount = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("__k"))
        .withColumn("clicks_so_far", sum(col("__k")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("ts").as("fts1"), col("clicks_so_far"))
      // Stream 2: the user's last viewed value — within one second the
      // highest event_id wins (the within-second write order).
      val lastView = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("cents"), col("event_id")).as("last_view_cents"))
        .select(col("user_id"), col("ts").as("fts2"), col("last_view_cents"))
      val f1 = Ops.asOfJoin(obs, clickCount, "user_id", "user_id", "ts", "fts1",
        Seq("clicks_so_far"))
      Ops.asOfJoin(f1, lastView, "user_id", "user_id", "ts", "fts2",
        Seq("last_view_cents"))
        .select(col("user_id"), col("ts"), col("event_id"), col("label_cents"),
          coalesce(col("clicks_so_far"), lit(0L)).as("clicks_so_far"),
          col("last_view_cents"))
    },
    // Leave-one-out target encoding — the categorical-encoding pass that
    // replaces a category with the mean target of the OTHER members
    // ((S − x) div (n − 1), exact integer cents): encoding with the
    // plain category mean leaks each row's own label into its feature;
    // LOO is the standard fix, and it is exactly one broadcast of the
    // per-category (sum, count) moments back onto the rows — no
    // row-vs-row work at any scale. Singleton categories encode NULL
    // (there is no "other members" mean to borrow).
    "q_x_target_encode" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority").as("cat"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("t_cents"))
      val moments = o.groupBy(col("cat"))
        .agg(sum(col("t_cents")).as("__s"), count(lit(1)).as("__n"))
      o.join(broadcast(moments), Seq("cat"))
        .select(col("o_orderkey"), col("cat"), col("t_cents"),
          expr("case when __n > 1 then (__s - t_cents) div (__n - 1) end")
            .as("loo_mean_cents"),
          col("__n").as("cat_n"))
    },
    // Ordered conversion funnel view → click → purchase with a 7-day
    // conversion window anchored at the first view: a user counts for
    // step n only with a step-n event STRICTLY AFTER their step-(n−1)
    // time and within the window. Implemented as a cascade of per-user
    // min-timestamp aggregates — each stage is a user-keyed groupBy whose
    // input is the previous stage joined back to the (filtered, pruned)
    // event scan, so the whole funnel is a chain of user-hashed stages
    // with map-side partial mins and no window over raw events. The
    // per-step user sets shrink monotonically, so later stages get
    // cheaper, not costlier. Conversion ratios in integer basis points
    // (div) — exact, hash-stable.
    "q_x_funnel" -> { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val win = expr("INTERVAL 7 DAY")
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("users_view"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("users_click"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("users_purchase"))))
        .select(col("users_view"), col("users_click"), col("users_purchase"),
          expr("users_click * 10000 div users_view").as("click_conv_bp"),
          expr("users_purchase * 10000 div users_view").as("purchase_conv_bp"))
    },
    // Cohort retention: cohort = each user's first active day (any event),
    // cell (cohort_day, offset_days) = users from that cohort active
    // offset days later. Two shuffles total: one distinct over
    // (user, day) — the activity grid, tiny next to raw events — and one
    // user-partitioned whole-partition min window to attach the cohort
    // day (the benign O(n)-per-partition frame, not a rescan). Within a
    // cell a user contributes at most one activity row (one day = cohort
    // + offset), so count(*) IS count(DISTINCT user_id) — stated here so
    // the cheap form doesn't read as an error; the distinct expansion
    // Spark would otherwise plan is pure waste.
    "q_x_cohort_retention" -> { (s, dir) =>
      val act = ev(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      act.withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy(col("user_id"))))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("offset_days"))
        .agg(count(lit(1)).as("users"))
    },
    // Trailing 7-day rolling aggregates at daily grain — a RANGE frame
    // over the day NUMBER, not a ROWS frame: with gap days in a series,
    // ROWS BETWEEN 6 PRECEDING spans whatever 7 rows exist (a calendar
    // lie); RANGE BETWEEN 6 PRECEDING AND CURRENT ROW is the true
    // trailing week. Day numbers anchor at the epoch — the anchor
    // cancels in differences, so any fixed date works at any SF. The
    // window partitions by event_type over the DAILY rollup (≤ one row
    // per type×day — bounded regardless of raw volume; the rollup
    // absorbs the 100 TB). DECIMAL sums, double only at the edge.
    "q_x_rolling_7d" -> { (s, dir) =>
      val daily = ev(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))
        .withColumn("dn", datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
      val w = Window.partitionBy(col("event_type")).orderBy(col("dn"))
        .rangeBetween(-6, Window.currentRow)
      daily.select(col("event_type"), col("day"), col("n"),
        col("v").cast("double").as("v"),
        sum(col("n")).over(w).as("n_7d"),
        sum(col("v")).over(w).cast("double").as("v_7d"))
    },
    // Time-to-conversion distribution: per market segment, the EXACT
    // median view→click lag (µs) across converting users, via the same
    // doubled-median trick as q_x_outliers_mad (med2 = 2·median, always
    // an integer — report lag_med_us = med2/2 only at a display edge,
    // never in the comparison domain). Funnel stages reuse the
    // q_x_funnel cascade (user-keyed min aggregates); the segment dim
    // broadcasts; the median's per-segment sort is bounded by the
    // (already tiny) converting-user set. n_users rides along from the
    // same pass.
    "q_x_conversion_lag" -> { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), col("ts"), col("event_type"))
      val win = expr("INTERVAL 7 DAY")
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      val lagSeg = c
        .select(col("user_id"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("lag_us"))
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))), "user_id")
      val counts = lagSeg.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_users"))
      doubledMedian(lagSeg, "c_mktsegment", "lag_us", "user_id", "med2_lag_us")
        .join(broadcast(counts), "c_mktsegment")
        .select(col("c_mktsegment"), col("n_users"), col("med2_lag_us"))
    },
    // Rolling 7-day distinct active users (WAU) per day — EXACT sliding
    // distinct, which no window function gives (distinct doesn't compose
    // across frames: you cannot merge daily distinct counts). The scale
    // form: collapse raw events to the (user, day) activity grid FIRST
    // (the grid is orders of magnitude smaller than the event stream and
    // absorbs the 100 TB), then each grid row contributes to its 7
    // covering windows via a sequence-explode (bounded 7× expansion OF
    // THE GRID, not the events), then one distinct-count per window day.
    // Window days are clipped to days that actually appear (semi-join
    // with the day set) so the output domain equals the oracle's. The
    // approximate production tier at extreme scale: per-day HLL
    // sketches + 7-way merge (sketch union IS sliding-window-safe —
    // the q_x_hll_rollup machinery), traded exactly like A4.
    // Survival analysis (time-to-conversion) as a Nelson–Aalen risk
    // table: per user the days from first view to first subsequent
    // purchase, right-CENSORED at the corpus horizon for users who never
    // convert — the estimator family (KM/NA) that conversion-lag
    // averages get WRONG because they silently drop censored users. Per
    // duration t: the at-risk count (total − everyone who exited before
    // t — the q_x_auc exclusive-cumulative shape), conversions d_t,
    // censored exits c_t, and the cumulative hazard Σ d·10⁶ div n_risk
    // in integer micro-units (the per-term integer division is the
    // log-free stance: deterministic in both engines; the KM product
    // would force a float fold). The cumulative runs over the DURATION
    // DOMAIN (≤ corpus days — the risk table is calendar-sized, so its
    // one-partition window is bounded like the cumSumGlobal handoff).
    "q_x_survival" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("d"), col("ts"))
      val fv = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("fvts"),
          min(col("d")).as("fvd"))
      val fp = e.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("ts") >= col("fvts"))
        .groupBy(col("user_id")).agg(min(col("d")).as("fpd"))
      val horizon = e.agg(max(col("d")).as("mxd"))
      val durations = fv.join(fp, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("fpd").isNotNull, datediff(col("fpd"), col("fvd")))
            .otherwise(datediff(col("mxd"), col("fvd"))).cast("long").as("t"),
          col("fpd").isNotNull.as("converted"))
      val risk = durations.groupBy(col("t"))
        .agg(count(when(col("converted"), lit(1))).as("d_events"),
          count(when(!col("converted"), lit(1))).as("c_censored"))
      val total = durations.agg(count(lit(1)).as("n_total"))
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      risk.crossJoin(broadcast(total))
        .withColumn("n_at_risk", col("n_total") -
          coalesce(sum(col("d_events") + col("c_censored")).over(w), lit(0L)))
        .withColumn("na_term", expr("d_events * 1000000 div n_at_risk"))
        .withColumn("cum_hazard_micro", sum(col("na_term")).over(wc))
        .select(col("t"), col("n_at_risk"), col("d_events"),
          col("c_censored"), col("na_term"), col("cum_hazard_micro"))
    },
    // Longest consecutive-day activity streaks — the gaps-and-islands
    // classic at day grain (retention/gamification's "N-day streak"):
    // per user the distinct active days, island id = day − dense rank
    // (consecutive days share it — the day-grain sibling of
    // q_x_sessionize's epoch trick), longest island per user, top-20
    // overall under a total order. Per-user windows run over distinct
    // ACTIVE DAYS (calendar-bounded); the top-20 rides TakeOrdered.
    "q_x_streak" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val days = ev(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      days
        .withColumn("isl", expr("datediff(d, date '2024-01-01')") -
          row_number().over(w))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("streak_days"), min(col("d")).as("streak_start"),
          max(col("d")).as("streak_end"))
        .select(col("user_id"), col("streak_days"),
          col("streak_start"), col("streak_end"))
        .orderBy(col("streak_days").desc, col("user_id").asc,
          col("streak_start").asc)
        .limit(20)
    },
    // Leakage-safe churn LABEL construction — the supervised-learning
    // companion of q_x_cohort_retention (that row measures cohorts; this
    // one builds the per-entity training table): per (user, active
    // WEEK) the activity features and churned = "no activity in week
    // w+1", read strictly from the FUTURE side via lead() so no feature
    // peeks past the observation point. The censoring cut drops the
    // corpus's last week (its w+1 is unobservable — emitting a label
    // there would train on an artifact), via one broadcast max-week
    // scalar. The per-user window runs over active WEEKS — calendar-
    // bounded, never event-bounded. (Week grain because the synthetic
    // feed spans one month; the grain is the only fixture-specific
    // choice, the censor/lead mechanics are grain-free.)
    "q_x_churn_labels" -> { (s, dir) =>
      val weekly = ev(s, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .groupBy(col("user_id"), col("wk"))
        .agg(count(lit(1)).as("n_events"), sum(col("c")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("wk"))
      val mx = weekly.agg(max(col("wk")).as("mxw"))
      weekly
        .withColumn("next_w", lead(col("wk"), 1).over(w))
        .crossJoin(broadcast(mx))
        .filter(col("wk") < col("mxw"))
        .select(col("user_id"), col("wk").as("obs_week"),
          col("n_events"), col("cents"),
          (col("next_w").isNull || col("next_w") =!= date_add(col("wk"), 7))
            .as("churned"))
    },
    // Time-decayed activity leaderboard: each event contributes
    // 2²⁰ >> age_days — exponential half-life-one-day decay as a pure
    // INTEGER bit shift, no exp()/pow() anywhere, so the trending score
    // is hash-exact and micro-batch/partition order can't show through
    // (plain sum of per-row integers). The shift is guarded at ≥63:
    // Java's >> wraps the shift count mod 64, so an unguarded 64-day-old
    // event would contribute 2²⁰ again instead of 0 — the guard makes
    // "old" mean zero at ANY corpus age, identically in both engines.
    // Anchor = max event day via a broadcast scalar; top-10 under the
    // (score DESC, user ASC) total order rides TakeOrdered (no global
    // sort materializes).
    "q_x_decay_topk" -> { (s, dir) =>
      val e = ev(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
      val mx = e.agg(max(col("d")).as("mxd"))
      e.crossJoin(broadcast(mx))
        .withColumn("age", datediff(col("mxd"), col("d")))
        .withColumn("w", when(col("age") >= 63, lit(0L))
          .otherwise(expr("shiftright(cast(1048576 as bigint), cast(age as int))")))
        .groupBy(col("user_id"))
        .agg(sum(col("w")).as("decayed_score"), count(lit(1)).as("n_events"))
        .orderBy(col("decayed_score").desc, col("user_id").asc)
        .limit(10)
    },
    "q_x_rolling_wau" -> { (s, dir) =>
      val act = ev(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val contrib = act.select(col("user_id"),
        explode(expr("sequence(day, day + interval 6 day, interval 1 day)"))
          .as("wday"))
      val days = act.select(col("day").as("wday")).distinct()
      contrib.join(days, "wday")
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(col("wday").as("day"), col("wau"))
    },
    // NTILE quartiles of purchase spenders WITHIN their market segment —
    // partitioned on the dim attribute, so no global single-reducer sort
    // (a global ntile is the one window shape that cannot scale; rank
    // buckets within a partitioning key, or use percent_rank thresholds
    // when a global split is truly required). Order (total DESC, user)
    // is tie-free → deterministic bucket edges on both engines (NTILE's
    // big-buckets-first split is SQL-standard).
    "q_x_ntile" -> { (s, dir) =>
      val totals = ev(s, dir).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("tot"))
      val seg = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("tot").desc, col("user_id"))
      totals.join(broadcast(seg), "user_id")
        .select(col("user_id"), col("c_mktsegment"),
          col("tot").cast("double").as("total_value"),
          ntile(4).over(w).as("quartile"))
    },
    // Robust (median/MAD) outlier detection per event type, made EXACT:
    // medians computed positionally in integer cents via the
    // doubled-median trick — med2 = middle value ×2 (odd count) or the
    // two middles' sum (even), always an integer, never an interpolated
    // double — so the outlier test |v − med| > 3·MAD clears to the
    // integer comparison 2·dev2 > 3·mad4 (dev2 = 2|v−med|,
    // mad4 = doubled median of dev2 = 4·MAD, all in cents) and the
    // whole query is hash-exact. Two median passes = two type-keyed
    // windows + two tiny broadcast joins back; the per-type partitions
    // bound the sorts (5 types here; a high-cardinality group key is
    // the production shape). The σ-scaled z-score variant is
    // q_x_outliers; this one survives the 49%-corrupt group that wrecks
    // a mean/σ rule.
    "q_x_outliers_mad" -> { (s, dir) =>
      val base = ev(s, dir).select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      val med = doubledMedian(base, "event_type", "cents", "event_id", "med2")
      val dev = base.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
      val mad = doubledMedian(dev.select(col("event_type"), col("event_id"), col("dev2")),
        "event_type", "dev2", "event_id", "mad4")
      dev.join(broadcast(mad), "event_type")
        .filter(col("dev2") * 2 > col("mad4") * 3)
        .select(col("event_type"), col("event_id"), col("cents"),
          col("dev2"), col("mad4"))
    },
    // First-order Markov transition matrix over each user's event stream:
    // count (state → next-state) steps via a user-keyed LEAD, then the
    // per-from-state row of the stochastic matrix in integer basis points.
    // One user-keyed Exchange over three pruned columns carries the lead;
    // the transition aggregate collapses to ≤ |types|² rows, so the
    // row-probability window runs over a broadcast-sized frame — the raw
    // volume is absorbed before anything global happens. Ordering is
    // (µs-truncated ts, event_id) — total, so both engines walk identical
    // sequences. prob_bp = n·10⁴ div row-total: exact integer.
    "q_x_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_state"), col("next_type").as("to_state"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("from_state"))))
        .select(col("from_state"), col("to_state"), col("n"),
          expr("n * 10000 div row_total").as("prob_bp"))
    },
    // Market-basket association rules: brand pairs co-purchased within an
    // order, with support/confidence/lift in exact integer basis points.
    // The pair generator is an ORDERKEY-KEYED self-join over the distinct
    // (order, brand) item set — per-basket expansion is bounded by the
    // attribute's cardinality (≤ C(25,2) pairs per order regardless of
    // line count), and both join sides share one hash partitioning, so
    // the classic a-priori blowup never appears. Brand supports and the
    // basket total are broadcast back (25 rows + 1 row). Support floor
    // (≥10 baskets) mirrors a-priori pruning. Exactness ceiling like
    // q_x_bm25: lift's BIGINT numerator needs c_ab·n_baskets·10⁴ < 2⁶³ —
    // holds to ~10⁹ baskets; past that, hoist one factor to double.
    "q_x_basket_lift" -> { (s, dir) =>
      val items = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
        .select(col("okey"), col("p_brand").as("brand"))
        .distinct()
      val singles = items.groupBy(col("brand")).agg(count(lit(1)).as("c"))
      val total = items.agg(countDistinct(col("okey")).as("n_baskets"))
      items.as("x").join(items.as("y"), "okey")
        .filter(col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("brand_a"), col("y.brand").as("brand_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 10)
        .join(broadcast(singles.select(col("brand").as("brand_a"), col("c").as("c_a"))), "brand_a")
        .join(broadcast(singles.select(col("brand").as("brand_b"), col("c").as("c_b"))), "brand_b")
        .crossJoin(broadcast(total))
        .select(col("brand_a"), col("brand_b"), col("c_ab"),
          expr("c_ab * 10000 div n_baskets").as("support_bp"),
          expr("c_ab * 10000 div c_a").as("confidence_bp"),
          expr("c_ab * n_baskets * 10000 div (c_a * c_b)").as("lift_bp"))
    },
    // RFM segmentation (recency / frequency / monetary) of purchasers,
    // scored as quintiles WITHIN market segment — the partitioned form,
    // per the q_x_ntile rule: a global NTILE is the one window shape
    // that cannot scale (single-reducer sort); segment-relative scores
    // partition the sort and are the defensible product semantics
    // anyway (a whale in a small segment IS a 5). Recency anchors at
    // the global max event day (one broadcast scalar), so scores are
    // data-deterministic, not wall-clock-dependent. Monetary stays in
    // integer cents; each NTILE order carries user_id so ties are
    // total. rfm_code = r·100 + f·10 + m, the standard compact key.
    "q_x_rfm" -> { (s, dir) =>
      val p = ev(s, dir).filter(col("event_type") === "purchase")
      val anchor = broadcast(p.agg(max(date_trunc("day", col("ts"))).as("anchor_day")))
      val per = p.groupBy(col("user_id"))
        .agg(max(date_trunc("day", col("ts"))).as("last_day"),
          count(lit(1)).as("freq"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("bigint")).as("cents"))
        .crossJoin(anchor)
        .withColumn("recency_days", datediff(col("anchor_day"), col("last_day")))
      val seg = broadcast(Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
      def q(orderCols: Seq[Column], out: String)(df: DataFrame): DataFrame =
        df.withColumn(out, ntile(5).over(Window
          .partitionBy(col("c_mktsegment")).orderBy(orderCols: _*)))
      val scored = q(Seq(col("recency_days").asc, col("user_id").asc), "r_score")(
        q(Seq(col("freq").desc, col("user_id").asc), "f_score")(
          q(Seq(col("cents").desc, col("user_id").asc), "m_score")(
            per.join(seg, "user_id"))))
      scored.select(col("user_id"), col("c_mktsegment"),
        col("recency_days"), col("freq"), col("cents"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_code"))
    },
    // Consecutive event-type trigram census per user — the path-analysis
    // primitive ("which 3-step journeys dominate"): two LEADs on one
    // user-keyed window (one Exchange + one sort carry both), then a
    // ≤ |types|³ aggregate. The raw volume dies at the aggregate; no
    // top-k needed since the output is bounded by type cardinality.
    "q_x_path_trigrams" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n"))
    },
    // Inter-event gap distribution on a power-of-two (log₂) scale: per
    // event type, bucket = ⌊log₂(gap_s)⌋ computed EXACTLY as
    // length(bin(gap)) − 1 — integer string length, no floating log
    // whose libm rounding could flip a 2ᵏ boundary between engines
    // (gap 0 pins to bucket −1). Second-truncated ts (the ns-source
    // rule) with event_id tiebreak; one user-keyed window Exchange,
    // then a ≤ |types|·64 aggregate. Log-scale gap histograms are the
    // standard burstiness/heartbeat diagnostic over event streams.
    "q_x_gap_buckets" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts"))
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .filter(col("gap_s").isNotNull)
        .withColumn("bucket",
          when(col("gap_s") === 0, lit(-1))
            .otherwise(length(bin(col("gap_s"))) - 1).cast("int"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("gap_s")).as("min_gap_s"), max(col("gap_s")).as("max_gap_s"))
    },
    // SCD2 dimension-history build with change collapse: per user, the
    // event-type stream is compacted to validity-interval versions — a
    // new version opens only when the tracked attribute CHANGES (lag
    // compare), valid_to = next version's valid_from (lead after the
    // collapse), open interval = current. This is the dimension-table
    // maintenance operator (SCD type 2) the reference's SCD-1 upsert sink
    // (K5) is the destructive cousin of. One user-keyed Exchange: both
    // windows and the filter share the same partitioning AND sort, so
    // the collapse and the re-number plan as consecutive Window nodes
    // over one sort. (ts, event_id) is a total order — deterministic.
    "q_x_scd2" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("version", row_number().over(w).cast("int"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // the same first-view/first-purchase anchors, horizon censoring,
    // exclusive-cumulative risk set, and integer micro-unit hazard
    "q_x_survival" ->
      s"""WITH $evCte,
         |e AS (SELECT user_id, event_type,
         |    CAST(date_trunc('day', ts) AS DATE) AS d, ts FROM ev),
         |fv AS (SELECT user_id, min(ts) AS fvts, min(d) AS fvd
         |  FROM e WHERE event_type = 'view' GROUP BY 1),
         |fp AS (SELECT e.user_id, min(e.d) AS fpd
         |  FROM e JOIN fv ON e.user_id = fv.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts >= fv.fvts GROUP BY 1),
         |mx AS (SELECT max(d) AS mxd FROM e),
         |du AS (SELECT fv.user_id,
         |    CAST(CASE WHEN fp.fpd IS NOT NULL
         |      THEN datediff('day', fv.fvd, fp.fpd)
         |      ELSE datediff('day', fv.fvd, mx.mxd) END AS BIGINT) AS t,
         |    fp.fpd IS NOT NULL AS converted
         |  FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id, mx),
         |r AS (SELECT t,
         |    count(CASE WHEN converted THEN 1 END) AS d_events,
         |    count(CASE WHEN NOT converted THEN 1 END) AS c_censored
         |  FROM du GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM du),
         |k AS (SELECT t, d_events, c_censored,
         |    tot.n_total - coalesce(sum(d_events + c_censored) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
         |  FROM r, tot),
         |h AS (SELECT t, n_at_risk, d_events, c_censored,
         |    CAST(d_events * 1000000 // n_at_risk AS BIGINT) AS na_term
         |  FROM k)
         |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events,
         |  c_censored, na_term,
         |  CAST(sum(na_term) OVER (ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_hazard_micro
         |FROM h""".stripMargin,
    // the same day − rank island id and top-20 total-order cut
    "q_x_streak" ->
      s"""WITH $evCte,
         |d AS (SELECT DISTINCT user_id,
         |    CAST(date_trunc('day', ts) AS DATE) AS d FROM ev),
         |i AS (SELECT user_id, d,
         |    datediff('day', DATE '2024-01-01', d)
         |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
         |  FROM d),
         |st AS (SELECT user_id, isl, count(*) AS streak_days,
         |    min(d) AS streak_start, max(d) AS streak_end
         |  FROM i GROUP BY 1, 2)
         |SELECT user_id, streak_days, streak_start, streak_end
         |FROM st
         |ORDER BY streak_days DESC, user_id ASC, streak_start ASC
         |LIMIT 20""".stripMargin,
    // the same per-user week series, lead() future read, and
    // last-week censoring
    "q_x_churn_labels" ->
      s"""WITH $evCte,
         |wk AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev),
         |g AS (SELECT user_id, w, count(*) AS n_events,
         |    CAST(sum(c) AS BIGINT) AS cents FROM wk GROUP BY 1, 2),
         |l AS (SELECT user_id, w, n_events, cents,
         |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
         |  FROM g),
         |mx AS (SELECT max(w) AS mxw FROM g)
         |SELECT user_id, w AS obs_week, n_events, cents,
         |  (next_w IS NULL OR next_w <> w + 7) AS churned
         |FROM l, mx WHERE w < mxw""".stripMargin,
    // the same guarded bit-shift decay off the same max-day anchor
    "q_x_decay_topk" ->
      s"""WITH $evCte,
         |e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM ev),
         |m AS (SELECT max(d) AS mxd FROM e),
         |w AS (SELECT user_id,
         |    CASE WHEN datediff('day', d, mxd) >= 63 THEN 0
         |         ELSE CAST(1048576 AS BIGINT) >> datediff('day', d, mxd)
         |    END AS w
         |  FROM e, m)
         |SELECT user_id, CAST(sum(w) AS BIGINT) AS decayed_score,
         |  count(*) AS n_events
         |FROM w GROUP BY 1
         |ORDER BY decayed_score DESC, user_id ASC LIMIT 10""".stripMargin,
    // the same (sum, count) moments joined back; integer LOO division
    "q_x_target_encode" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS cat,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS t_cents
        |  FROM orders),
        |m AS (SELECT cat, CAST(sum(t_cents) AS BIGINT) AS s,
        |    count(*) AS n FROM o GROUP BY cat)
        |SELECT o.o_orderkey, o.cat, o.t_cents,
        |  CASE WHEN m.n > 1 THEN (m.s - o.t_cents) // (m.n - 1) END
        |    AS loo_mean_cents,
        |  m.n AS cat_n
        |FROM o JOIN m USING (cat)""".stripMargin,
    // both feature streams at (user, second) grain, running click count
    // over the unique per-user ts order, two chained ASOF LEFT joins
    "q_x_pit_features" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    date_trunc('second', date_trunc('microseconds', ts)) AS ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |obs AS (SELECT user_id, ts, event_id, cents AS label_cents
        |  FROM e WHERE event_type = 'purchase'),
        |cc AS (SELECT user_id, ts, count(*) AS k
        |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |ccc AS (SELECT user_id, ts AS fts1,
        |    CAST(sum(k) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS clicks_so_far
        |  FROM cc),
        |lv AS (SELECT user_id AS vu, ts AS fts2,
        |    arg_max(cents, event_id) AS last_view_cents
        |  FROM e WHERE event_type = 'view' GROUP BY 1, 2),
        |f1 AS (SELECT o.*, c.clicks_so_far FROM obs o
        |  ASOF LEFT JOIN ccc c ON o.user_id = c.user_id AND o.ts >= c.fts1)
        |SELECT f1.user_id, f1.ts, f1.event_id, f1.label_cents,
        |  coalesce(f1.clicks_so_far, 0) AS clicks_so_far,
        |  v.last_view_cents
        |FROM f1 ASOF LEFT JOIN lv v
        |  ON f1.user_id = v.vu AND f1.ts >= v.fts2""".stripMargin,
    // inner ASOF for last-touch (unattributed purchases drop on both
    // sides), per-user min click for first-touch, one tagged rollup
    "q_x_attribution" ->
      """WITH e AS (SELECT user_id, event_type, date_trunc('second', ts) AS ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM (SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, value
        |        FROM events)),
        |p AS (SELECT user_id, ts, cents FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS cu, ts AS cts, CAST(date_trunc('day', ts) AS TIMESTAMP) AS cday
        |  FROM e WHERE event_type = 'click'),
        |lt AS (SELECT 'last_touch' AS model, c.cday AS touch_day, p.cents
        |  FROM p ASOF JOIN c ON p.user_id = c.cu AND p.ts >= c.cts),
        |fc AS (SELECT cu, min(cts) AS fts FROM c GROUP BY cu),
        |ft AS (SELECT 'first_touch' AS model,
        |    CAST(date_trunc('day', f.fts) AS TIMESTAMP) AS touch_day, p.cents
        |  FROM p JOIN fc f ON p.user_id = f.cu WHERE p.ts >= f.fts),
        |u AS (SELECT * FROM lt UNION ALL SELECT * FROM ft)
        |SELECT model, touch_day, count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM u GROUP BY 1, 2""".stripMargin,
    "q_x_funnel" ->
      s"""WITH $evCte,
         |v AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
         |  FROM ev e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 7 DAY
         |  GROUP BY 1),
         |p AS (SELECT e.user_id, min(e.ts) AS t3
         |  FROM ev e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= c.t1 + INTERVAL 7 DAY
         |  GROUP BY 1)
         |SELECT (SELECT count(*) FROM v) AS users_view,
         |  (SELECT count(*) FROM c) AS users_click,
         |  (SELECT count(*) FROM p) AS users_purchase,
         |  (SELECT count(*) FROM c) * 10000 // (SELECT count(*) FROM v) AS click_conv_bp,
         |  (SELECT count(*) FROM p) * 10000 // (SELECT count(*) FROM v) AS purchase_conv_bp""".stripMargin,
    "q_x_cohort_retention" ->
      s"""WITH $evCte,
         |act AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM ev),
         |c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM act)
         |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS INT) AS offset_days,
         |  count(*) AS users
         |FROM c GROUP BY 1, 2""".stripMargin,
    "q_x_rolling_7d" ->
      s"""WITH $evCte,
         |daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |    count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS v
         |  FROM ev GROUP BY 1, 2),
         |d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', day) AS dn FROM daily)
         |SELECT event_type, day, n, CAST(v AS DOUBLE) AS v,
         |  CAST(sum(n) OVER w AS BIGINT) AS n_7d,
         |  CAST(sum(v) OVER w AS DOUBLE) AS v_7d
         |FROM d2 WINDOW w AS (PARTITION BY event_type ORDER BY dn
         |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_x_conversion_lag" ->
      s"""WITH $evCte,
         |v AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
         |  FROM ev e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 7 DAY
         |  GROUP BY 1),
         |lagseg AS (SELECT c.user_id, epoch_us(c.t2) - epoch_us(c.t1) AS lag_us,
         |    cu.c_mktsegment
         |  FROM c JOIN customer cu ON c.user_id = cu.c_custkey),
         |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY lag_us, user_id) AS rn,
         |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt FROM lagseg),
         |med AS (SELECT c_mktsegment,
         |    CAST(CASE WHEN count(*) = 1 THEN 2 * min(lag_us) ELSE sum(lag_us) END
         |      AS BIGINT) AS med2_lag_us
         |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 GROUP BY 1),
         |cnts AS (SELECT c_mktsegment, count(*) AS n_users FROM lagseg GROUP BY 1)
         |SELECT m.c_mktsegment, c.n_users, m.med2_lag_us
         |FROM med m JOIN cnts c ON m.c_mktsegment = c.c_mktsegment""".stripMargin,
    "q_x_rolling_wau" ->
      s"""WITH $evCte,
         |act AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
         |  FROM ev),
         |days AS (SELECT DISTINCT day FROM act)
         |SELECT d.day, count(DISTINCT a.user_id) AS wau
         |FROM days d JOIN act a
         |  ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
         |GROUP BY 1""".stripMargin,
    "q_x_ntile" ->
      s"""WITH $evCte,
         |t AS (SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS tot
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT t.user_id, c.c_mktsegment, CAST(t.tot AS DOUBLE) AS total_value,
         |  CAST(ntile(4) OVER (PARTITION BY c.c_mktsegment
         |    ORDER BY t.tot DESC, t.user_id) AS INT) AS quartile
         |FROM t JOIN customer c ON t.user_id = c.c_custkey""".stripMargin,
    "q_x_outliers_mad" ->
      s"""WITH $evCte,
         |base AS (SELECT event_type, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM ev),
         |r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt FROM base),
         |med AS (SELECT event_type,
         |    CAST(CASE WHEN count(*) = 1 THEN 2 * min(cents) ELSE sum(cents) END AS BIGINT) AS med2
         |  FROM r1 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 GROUP BY 1),
         |dev AS (SELECT b.event_type, b.event_id, b.cents, abs(b.cents * 2 - m.med2) AS dev2
         |  FROM base b JOIN med m ON b.event_type = m.event_type),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev2, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt FROM dev),
         |mad AS (SELECT event_type,
         |    CAST(CASE WHEN count(*) = 1 THEN 2 * min(dev2) ELSE sum(dev2) END AS BIGINT) AS mad4
         |  FROM r2 WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2 GROUP BY 1)
         |SELECT d.event_type, d.event_id, d.cents, d.dev2, m.mad4
         |FROM dev d JOIN mad m ON d.event_type = m.event_type
         |WHERE d.dev2 * 2 > m.mad4 * 3""".stripMargin,
    "q_x_transitions" ->
      s"""WITH $evCte,
         |steps AS (SELECT event_type AS from_state,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
         |  FROM ev),
         |m AS (SELECT from_state, to_state, count(*) AS n FROM steps
         |  WHERE to_state IS NOT NULL GROUP BY 1, 2)
         |SELECT from_state, to_state, n,
         |  n * 10000 // CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT)
         |    AS prob_bp
         |FROM m""".stripMargin,
    "q_x_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |singles AS (SELECT brand, count(*) AS c FROM items GROUP BY 1),
        |total AS (SELECT count(DISTINCT okey) AS n_baskets FROM items),
        |pairs AS (SELECT x.brand AS brand_a, y.brand AS brand_b, count(*) AS c_ab
        |  FROM items x JOIN items y ON x.okey = y.okey AND x.brand < y.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT p.brand_a, p.brand_b, p.c_ab,
        |  p.c_ab * 10000 // t.n_baskets AS support_bp,
        |  p.c_ab * 10000 // a.c AS confidence_bp,
        |  p.c_ab * t.n_baskets * 10000 // (a.c * b.c) AS lift_bp
        |FROM pairs p
        |JOIN singles a ON p.brand_a = a.brand
        |JOIN singles b ON p.brand_b = b.brand
        |CROSS JOIN total t""".stripMargin,
    "q_x_rfm" ->
      s"""WITH $evCte,
         |p AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase'),
         |anchor AS (SELECT CAST(max(date_trunc('day', ts)) AS TIMESTAMP) AS anchor_day FROM p),
         |per AS (SELECT user_id,
         |    CAST(max(date_trunc('day', ts)) AS TIMESTAMP) AS last_day,
         |    count(*) AS freq,
         |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
         |  FROM p GROUP BY 1),
         |j AS (SELECT per.*, c.c_mktsegment,
         |    CAST(date_diff('day', last_day, (SELECT anchor_day FROM anchor)) AS INT)
         |      AS recency_days
         |  FROM per JOIN customer c ON per.user_id = c.c_custkey),
         |s AS (SELECT *,
         |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
         |      ORDER BY recency_days ASC, user_id ASC) AS INT) AS r_score,
         |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
         |      ORDER BY freq DESC, user_id ASC) AS INT) AS f_score,
         |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment
         |      ORDER BY cents DESC, user_id ASC) AS INT) AS m_score
         |  FROM j)
         |SELECT user_id, c_mktsegment, recency_days, freq, cents,
         |  r_score, f_score, m_score,
         |  r_score * 100 + f_score * 10 + m_score AS rfm_code FROM s""".stripMargin,
    "q_x_path_trigrams" ->
      s"""WITH $evCte,
         |t AS (SELECT event_type AS step1,
         |    lead(event_type, 1) OVER w AS step2,
         |    lead(event_type, 2) OVER w AS step3
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT step1, step2, step3, count(*) AS n FROM t
         |WHERE step3 IS NOT NULL GROUP BY 1, 2, 3""".stripMargin,
    "q_x_gap_buckets" ->
      s"""WITH $evCte,
         |g AS (SELECT event_type, event_id,
         |    (epoch_us(date_trunc('second', ts))
         |      - epoch_us(lag(date_trunc('second', ts)) OVER (PARTITION BY user_id
         |        ORDER BY date_trunc('second', ts), event_id))) // 1000000 AS gap_s
         |  FROM ev),
         |b AS (SELECT event_type,
         |    CAST(CASE WHEN gap_s = 0 THEN -1 ELSE length(bin(gap_s)) - 1 END AS INT)
         |      AS bucket, gap_s
         |  FROM g WHERE gap_s IS NOT NULL)
         |SELECT event_type, bucket, count(*) AS n,
         |  min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
         |FROM b GROUP BY 1, 2""".stripMargin,
    "q_x_scd2" ->
      s"""WITH $evCte,
         |m AS (SELECT user_id, ts, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM ev),
         |ch AS (SELECT user_id, ts, event_id, event_type FROM m
         |  WHERE prev IS NULL OR prev <> event_type)
         |SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
         |  event_type AS state, ts AS valid_from, lead(ts) OVER w AS valid_to,
         |  (lead(ts) OVER w IS NULL) AS is_current
         |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  )
}
