package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming jobs mirroring the reference's live path (SURVEY
  * §2.11): watermarked tumbling-window aggregation (the hourly snapshot
  * cadence), keyed dedup (ON CONFLICT DO NOTHING in stream form), custom
  * per-key state via flatMapGroupsWithState (the LS_State recurrence), and a
  * foreachBatch idempotent sink.
  *
  * The reference repairs gaps by backfill rather than discarding late data
  * (synchronization.rs:42-52); the streaming tier therefore uses a generous
  * watermark for state cleanup, with the batch pipeline as reconciliation.
  */
object StreamJobs {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based event stream (one file per micro-batch in tests; in
    * production this is the block/event feed).
    */
  def fileEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Hourly tumbling counts/sums per event type with a 2h watermark —
    * the aggregation-interval snapshot (AGGREGATION_INTERVAL=1h).
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Keyed dedup within the watermark horizon — replay-safe ingestion
    * (reference K1: at-least-once + natural-key dedup).
    */
  def dedupByKey(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked streaming sessionization via the NATIVE session_window —
    * the streaming tier of the batch gap-sessionizer (q_x_sessionize):
    * a 1800 s session gap reproduces the batch `gap > 1800 ⇒ new session`
    * rule exactly. session_window merges while diff ≤ gap — the window
    * end TOUCHES inclusively (measured on Spark 4.1: diff 1800 at gap
    * 1800 merges, diff 1801 splits; the PropertySpec bridge pins both
    * boundaries), so gap must equal the batch rule's threshold, not
    * threshold+1. CAVEAT (ADVICE r13): the inclusive-touch boundary is a
    * MEASURED Spark 4.1 behavior, not a documented contract ("closes
    * after a gap of inactivity" says nothing about diff == gap) — if a
    * Spark upgrade flips the boundary to exclusive, the pinned
    * PropertySpec user-8/user-9 pair FAILS; triage that as a deliberate
    * upstream semantics change (re-pin gap to threshold+1 and re-measure
    * both boundaries), not as a test flake. Exactness also requires the SAME clock granularity as
    * the batch rule: q_x_sessionize second-truncates ts before the gap
    * test, so the stream truncates too — on the raw ns-precision feed a
    * boundary gap (1800.4 s raw → 1801 s truncated) would otherwise split
    * in batch but merge in streaming. Append mode emits a session once
    * the watermark passes its end — the batch pipeline reconciles the
    * open tail.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "1800 seconds").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Streaming sketch-column maintenance — the live tier of the batch
    * sketch family (operators.Sketches): per-day CMS event-type counters
    * and a theta user sketch, updated every micro-batch. The aggregate
    * buffers serialize into the state store, so a restart resumes the
    * sketches exactly; the emitted columns are the SAME mergeable vectors
    * and compact bytes the batch cmsRollup / thetaSetOverlap consume, and
    * because CMS counters are additive and theta unions layout-blind, the
    * drained stream equals the batch build bit-for-bit (StreamingSpec).
    */
  def dailySketches(events: DataFrame, depth: Int = 4, width: Int = 256,
      lgK: Int = 12): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        org.apache.spark.sql.graft.sketches
          .cmsSketch(col("event_type"), depth, width).as("type_counts"),
        org.apache.spark.sql.graft.sketches
          .thetaSketch(col("user_id"), lgK).as("user_sketch"))

  /** Streaming side of the q_x_drift_chi2 monitor: per (event_type, half,
    * value bin) COUNTS maintained from the stream in complete mode — the
    * state is a bounded integer grid (types × 2 × 10), and counts are
    * additive, so the drained table equals the batch bin census
    * bit-for-bit under any micro-batch slicing (StreamingSpec pins it).
    * The chi-square itself is a deterministic derivation OVER the counts,
    * so batch-computing it from the drained grid gives exactly
    * q_x_drift_chi2's statistic — monitor semantics with no approximate
    * tier. The bin rule is the batch rule verbatim (cents div 5000,
    * clamped to 10 bins; reference = month days 1–15).
    */
  def driftBinCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        expr("least(cast(cast(value as decimal(18,2)) * 100 as bigint) div 5000, 9)")
          .as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Point-in-time feature HISTORY tables — the compacted per-entity
    * form a feature store publishes for serving: one row per user
    * carrying the full (feature_time, value) history as a
    * feature-time-sorted array. Built with the SAME grain rules as the
    * batch training-set assembly (q_x_pit_features): both streams
    * collapse to (user, second) grain first, so feature timestamps are
    * unique per user and an as-of pick can never tie. Array size is
    * bounded by the user's update count inside the published horizon —
    * the standard compaction contract; a keyed groupBy + sort_array,
    * one shuffle each, run at publish time, not per lookup.
    */
  def pitClickHistory(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click")
      .select(col("user_id"), date_trunc("second", col("ts")).as("fts"))
      .groupBy(col("user_id"), col("fts"))
      .agg(count(lit(1)).as("__k"))
      .withColumn("clicks_so_far", sum(col("__k")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("fts"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("fts"), col("clicks_so_far"))))
        .as("click_hist"))

  def pitViewHistory(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "view")
      .select(col("user_id"), date_trunc("second", col("ts")).as("fts"),
        col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("fts"))
      .agg(max_by(col("cents"), col("event_id")).as("last_view_cents"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("fts"), col("last_view_cents"))))
        .as("view_hist"))

  /** STREAMING point-in-time feature serving — the live tier of
    * q_x_pit_features: each arriving observation (purchase) takes, AS OF
    * ITS OWN TIMESTAMP, the newest value from each static feature
    * history ([[pitClickHistory]]/[[pitViewHistory]]). The as-of pick is
    * a NARROW per-row array fold (filter fts ≤ ts, then array_max — the
    * struct order is (fts, value), so the max IS the latest eligible
    * update), attached by two STATELESS stream-static left joins on
    * user_id — no watermark, no state store, supported in append mode.
    * Because enrichment is per-row (a row's output depends only on
    * itself and the static snapshot), micro-batch slicing cannot show
    * through: the drained stream equals the batch as-of assembly
    * row-for-row (StreamingSpec pins it against q_x_pit_features).
    * At scale this is exactly feature-store online serving: the history
    * tables broadcast (entity-bounded) or shuffle-join on user_id, and
    * the lookup itself is codegen'd per row.
    */
  def pitFeaturesStream(obs: DataFrame, clickHist: DataFrame,
      viewHist: DataFrame): DataFrame = {
    def pick(hist: Column, ts: Column): Column =
      array_max(filter(hist, f => f.getField("fts") <= ts))
    obs
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
        col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("label_cents"))
      .join(clickHist, Seq("user_id"), "left")
      .withColumn("__c", pick(col("click_hist"), col("ts")))
      .join(viewHist, Seq("user_id"), "left")
      .withColumn("__v", pick(col("view_hist"), col("ts")))
      .select(col("user_id"), col("ts"), col("event_id"), col("label_cents"),
        coalesce(col("__c.clicks_so_far"), lit(0L)).as("clicks_so_far"),
        col("__v.last_view_cents").as("last_view_cents"))
  }

  /** Streaming target-encoding MOMENT maintenance — the live tier of
    * q_x_target_encode's category moments: per-category (Σ target, n)
    * kept exact by a streaming aggregate (sums and counts are additive,
    * so micro-batch merge order cannot show through — the
    * [[driftBinCounts]] argument, and the q_x_incr_rollup merge ≡
    * recompute contract). The LOO encode itself stays a batch-side
    * broadcast of these moments onto the rows; what streams is the
    * moment upkeep, which is the only corpus-sized work in the encoder.
    */
  def targetMomentsStream(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority").as("cat"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("t_sum"), count(lit(1)).as("t_n"))

  /** Streaming twin of q_x_embed_drift — live encoder-health monitoring:
    * embedding vectors stream in, the per-dimension cohort moments stream
    * out (complete mode). The transform IS
    * [[graft.operators.Similarity.embedDimMoments]] (one definition, so
    * the live monitor can't drift from the batch report), and every
    * statistic is an additive integer sum over the int8 quant domain, so
    * micro-batch merge order cannot show through — the
    * [[targetMomentsStream]] argument.
    */
  def embedDriftStream(embeddings: DataFrame): DataFrame =
    graft.operators.Similarity.embedDimMoments(embeddings)

  /** Streaming twin of q_x_embed_gram — live covariance/Gram upkeep for
    * whitening/PCA refresh and covariance-shift monitoring: the transform
    * IS [[graft.operators.Similarity.embedGram]] (one definition), and
    * every statistic is an additive exact integer over the int8 quant
    * domain, so micro-batch merge order cannot show through — the
    * [[embedDriftStream]] argument, one level up (second moments across
    * dim PAIRS, not just per-dim).
    */
  def embedGramStream(embeddings: DataFrame): DataFrame =
    graft.operators.Similarity.embedGram(embeddings)

  /** Streaming CMS counter upkeep — the live tier of the q_x_join_card
    * sizing sketch: one complete-mode aggregate maintains the (i, bucket,
    * count) table for a filtered key stream via the SAME
    * [[graft.operators.Sketches.cmsCounters]] kernel as the batch build.
    * Counters are additive integers, so the drained table equals the
    * batch counters bit-for-bit at any micro-batch slicing, and every
    * sketch READ (point-frequency min, inner-product join-cardinality)
    * derived from drained state equals its batch twin by construction.
    */
  def cmsCountersStream(events: DataFrame, eventType: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    graft.operators.Sketches.cmsCounters(
      events.filter(col("event_type") === eventType), "user_id", depth, width)

  /** Streaming Benford digit-counter upkeep — the live tier of
    * q_x_benford's observed side: one complete-mode aggregate maintains
    * the (event_type, leading digit) counts; additive integers ⇒ drained
    * counters ≡ the batch census bit-for-bit, and the ppm-deviation
    * report derived from drained state equals the registry row (the ppm
    * table is literal, n is the per-type counter sum — nothing else is
    * state). The live form is the fraud/unit-mixup tripwire: a feed
    * whose digit mix drifts from Benford mid-ingest alerts before the
    * batch audit ever runs.
    */
  def benfordCountsStream(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .filter(col("c") > 0)
      .withColumn("digit", substring(col("c").cast("string"), 1, 1).cast("long"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("obs"))

  /** Streaming drift-counter upkeep, bin tier — the live state of the
    * q_x_drift_chi2 / q_x_drift_w1 gates: one complete-mode aggregate
    * maintains the (event_type, bin, o1, o2) table via the SAME
    * [[graft.operators.Drift.binCounts]] kernel as the batch rows.
    * Counters are additive integers ⇒ drained state ≡ the batch table
    * bit-for-bit at any micro-batch slicing, and the χ²/W1 finishers
    * ([[graft.operators.Drift.chi2FromCounts]] / `w1FromCounts`) applied
    * to drained state equal the registry rows by construction. The live
    * form is the continuous drift gate: a feed whose value mix shifts
    * mid-ingest alerts before the nightly audit runs — and both read the
    * same numbers.
    */
  def driftBinCountsStream(events: DataFrame): DataFrame =
    graft.operators.Drift.binCounts(events)

  /** Streaming drift-counter upkeep, distinct-cents tier — the live state
    * of the q_x_drift_ks gate ([[graft.operators.Drift.centsCounts]], one
    * definition); the KS finisher over drained state equals the registry
    * row (the [[driftBinCountsStream]] argument, on the value-domain-
    * bounded keyspace the KS sup needs).
    */
  def driftCentsCountsStream(events: DataFrame): DataFrame =
    graft.operators.Drift.centsCounts(events)

  /** Streaming scene-change detection — the live tier of q_x_scene_change
    * ([[graft.operators.Multimodal.sceneCuts]], one definition): media
    * files stream in, cut tables stream out in APPEND mode — the
    * computation is stateless (a file's cuts depend only on its own
    * payload; the array-native kernel has no window, no state store, no
    * watermark), so the drained output equals the batch rows per file by
    * construction. The ingest-side shape of a video pipeline: segment
    * boundaries exist the moment the file lands.
    */
  def sceneChangeStream(media: DataFrame): DataFrame =
    graft.operators.Multimodal.sceneCuts(
      media.filter(col("kind") === "video"),
      chunkBytes = 32, stride = 2, threshold = 16)

  /** Streaming drift-moment upkeep — the live state of the q_x_drift_welch
    * mean-significance gate ([[graft.operators.Drift.momentCounts]], one
    * definition): per-type per-cohort (n, Σc, Σc²) in DECIMAL(38,0),
    * additive ⇒ drain ≡ batch, and the Welch finisher over drained state
    * equals the registry row — the mean-level member of the continuous
    * drift report ([[driftBinCountsStream]] argument).
    */
  def driftMomentsStream(events: DataFrame): DataFrame =
    graft.operators.Drift.momentCounts(events)

  /** Streaming bootstrap-state upkeep — live resampling uncertainty: one
    * complete-mode aggregate maintains the per-(type, replicate) weighted
    * sums via the SAME [[graft.operators.Resample.bootstrapState]] kernel
    * (derandomized Poisson weights are a pure row function, so micro-batch
    * replay draws the exact same resamples); additive ⇒ drain ≡ batch,
    * and [[graft.operators.Resample.bootstrapCiFromState]] over drained
    * state reproduces the registry CI. The live form keeps a current
    * error bar on every feed's mean without ever re-reading history.
    */
  def bootstrapStateStream(events: DataFrame): DataFrame =
    graft.operators.Resample.bootstrapState(events)

  /** Streaming CUPED user-state upkeep — the ADDITIVE layer of q_x_cuped
    * ([[graft.operators.Drift.cupedUserState]], one definition): per
    * (type, user) cohort cents totals as one complete-mode aggregate.
    * The squared moment terms are functions of FINAL user totals, so
    * they are NOT a second streaming aggregate — the batch finisher
    * ([[graft.operators.Drift.cupedMomentsFromUserState]] +
    * `cupedFromState`) runs over drained state and equals the registry
    * row (the goldenRecordsFromState split, spec-pinned).
    */
  def cupedUserStateStream(events: DataFrame): DataFrame =
    graft.operators.Drift.cupedUserState(events)

  /** Streaming proportion-counter upkeep — the live state of the
    * q_x_drift_prop_z rate gate ([[graft.operators.Drift
    * .proportionCounts]], one definition): four integer sums per type,
    * additive ⇒ drain ≡ batch, pooled-z finisher over drained state ≡
    * the registry row.
    */
  def propCountsStream(events: DataFrame): DataFrame =
    graft.operators.Drift.proportionCounts(events)

  /** Streaming calibration-state upkeep — the live tier of
    * q_x_calibration: one complete-mode aggregate maintains the
    * per-distinct-score (n, n_pos) counter table via the SAME
    * [[graft.operators.Eval.calibrationState]] kernel as the batch row.
    * The curve's equal-width bins need the GLOBAL score min/max, so the
    * binning lives in the finisher
    * ([[graft.operators.Eval.calibrationFromState]]) over drained state —
    * additive counters over the bounded score domain ⇒ drained ≡ batch
    * bit-for-bit, finisher output ≡ the registry row. The live form is
    * continuous ranker-health monitoring: score→label drift alerts
    * mid-ingest from the same numbers the batch report reads.
    */
  def calibrationStateStream(docs: DataFrame): DataFrame =
    graft.operators.Eval.calibrationState(docs)

  /** Streaming KMV distinct-sketch upkeep — the live tier of
    * q_x_kmv_distinct: ONE complete-mode object-hash aggregate maintains
    * the per-type bottom-64 distinct-hash sketch via the SAME
    * [[graft.operators.Sketches.kmvState]] kernel (mergeable
    * union+truncate buffers, ≤ k longs of state per type at ANY volume —
    * the bound the distinct-counter tier can't give). Set-union state is
    * slicing-insensitive ⇒ the drained sketch equals the batch bottom-k
    * bit-for-bit, and [[graft.operators.Sketches.kmvEstimateFromState]]
    * over drained state reproduces the registry row's (kmv_k, h_k,
    * est_distinct) exactly.
    */
  def kmvStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.kmvState(events)

  /** Streaming per-source cap upkeep — the live tier of q_x_source_cap:
    * ONE complete-mode object-hash aggregate maintains the per-source
    * top-K sketch via the SAME [[graft.operators.TextOps.sourceCapState]]
    * kernel (order-encoded longs, union+truncate buffers — ≤ K longs of
    * state per source at ANY volume). Set-union state is
    * slicing-insensitive ⇒ drained ≡ batch bit-for-bit, and
    * [[graft.operators.TextOps.sourceCapFromState]] over drained state
    * reproduces the registry row — a crawl pipeline knows each domain's
    * current cap survivors the moment docs land.
    */
  def sourceCapStream(docs: DataFrame): DataFrame =
    graft.operators.TextOps.sourceCapState(docs)

  /** Streaming temperature-mix state upkeep — the ADDITIVE layer of
    * q_x_temperature_mix ([[graft.operators.TextOps.temperatureMixDocState]],
    * one definition): per (source, doc) char totals as one complete-mode
    * aggregate. Budget shares and the hash-order admission cumulative are
    * functions of FINAL totals, so they are NOT a second streaming
    * aggregate — the batch finisher
    * ([[graft.operators.TextOps.temperatureMixFromState]]) over drained
    * state equals the registry row (the CUPED state/finisher split).
    */
  def temperatureMixStream(docs: DataFrame): DataFrame =
    graft.operators.TextOps.temperatureMixDocState(docs)

  /** Streaming daily-series upkeep — the live tier of the SHARED kernel
    * under q_x_cusum / q_x_autocorr / q_x_cross_corr / q_x_mase
    * ([[graft.functions.Ops.dailyTypeCents]], one definition): additive
    * integer (type, day) cents totals, so the drained table equals the
    * batch series bit-for-bit and every derived statistic (changepoint,
    * lag correlation, MASE ratio) inherits the equality. The live form
    * is the monitoring substrate: the day's running totals exist the
    * moment events land, and the batch detectors read the same table.
    */
  def dailyCentsStream(events: DataFrame): DataFrame =
    graft.functions.Ops.dailyTypeCents(events)

  /** Streaming daily-candle upkeep — the live tier of q_x_ohlc. Every
    * fold in [[graft.functions.Ops.ohlcBars]] is associative (open/close
    * are struct extrema over the (ts, event_id) total order; high/low/
    * count/volume are plain extrema and sums), so ONE complete-mode
    * aggregate maintains the candle table exactly and the drained result
    * equals the batch row bit-for-bit regardless of micro-batch slicing —
    * the q_x_incr_rollup merge ≡ recompute contract, applied to candles.
    */
  def ohlcStream(events: DataFrame): DataFrame =
    graft.functions.Ops.ohlcBars(
      events.filter(col("event_type") === "view")
        .select(pmod(col("user_id"), lit(25)).as("symbol"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          col("ts"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("c")),
      Seq("symbol", "day"), Seq(col("ts"), col("event_id")), "c")

  /** Streaming golden-record survivorship STATE — the live tier of
    * q_x_er_golden's merge (the [[targetMomentsStream]] stance: what
    * streams is the state upkeep, the finisher is a broadcast-sized batch
    * fold). Every survivorship rule in
    * [[graft.operators.Dedup.goldenRecords]] is an associative fold —
    * longest-text argmax is a struct max, member counts are sums,
    * provenance is a set union, the majority vote needs only per-(entity,
    * category) counts — so the state table keyed by (entity, category)
    * is maintained exactly by ONE streaming aggregate (complete mode;
    * micro-batch merge order cannot show through associative folds — the
    * q_x_incr_rollup merge ≡ recompute contract), and
    * [[goldenRecordsFromState]] finishes it to bit-identical golden rows.
    * The cluster table rides a broadcast stream-static join (dup members
    * only — the [[graft.operators.Dedup.survivors]] argument).
    */
  def goldenStateStream(docs: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      catCol: String = "lang", srcCol: String = "source"): DataFrame =
    docs
      .join(broadcast(clusters.select(col(idCol), col("cluster_id"))),
        Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col(idCol)))
      .groupBy(col("entity_id"), col(catCol))
      .agg(
        max(struct(length(col(textCol)).as("__l"), (-col(idCol)).as("__nid"),
          col(textCol).as("__t"))).as("__best"),
        count(lit(1)).as("__c"),
        collect_set(col(srcCol)).as("__srcs"))

  /** Batch finisher over the drained [[goldenStateStream]] table: merges
    * the per-(entity, category) state groups into one golden row per
    * entity with EXACTLY [[graft.operators.Dedup.goldenRecords]]'
    * output contract — max-of-maxes for the text argmax, summed member
    * counts, min(−count, value) for the majority vote, set-union
    * provenance. The state table is entity×category-sized (broadcast
    * class), so this fold costs nothing next to the stream it finishes.
    */
  def goldenRecordsFromState(state: DataFrame, textCol: String = "text",
      catCol: String = "lang"): DataFrame = {
    val allSrcs = array_distinct(flatten(collect_list(col("__srcs"))))
    state.groupBy(col("entity_id"))
      .agg(
        max(col("__best")).getField("__t").as(textCol),
        sum(col("__c")).as("n_members"),
        min(struct((-col("__c")).as("__nc"), col(catCol).as("__v")))
          .getField("__v").as(catCol),
        size(allSrcs).cast("long").as("n_sources"),
        array_join(array_sort(allSrcs), ",").as("sources"))
      .select(col("entity_id"), col("n_members"), col(textCol), col(catCol),
        col("n_sources"), col("sources"))
  }

  /** Streaming corpus term-frequency upkeep — the live tier behind the
    * rarity/surprisal gate (q_x_rarity_score) and every other
    * corpus-frequency consumer (BM25 idf, boilerplate caps): the tf
    * table is a pure additive count per term, so ONE complete-mode
    * streaming aggregate maintains it exactly (micro-batch merge order
    * cannot show through integer adds — the [[targetMomentsStream]]
    * stance: what streams is the corpus-sized statistic upkeep; the
    * per-doc scoring joins against the maintained table batch-side).
    * Uses the identical tokenizer as the batch rows (one definition).
    */
  def termFreqStream(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Streaming corpus-prep front door: the batch pipeline's quality gate +
    * order-invariant content dedup (q_x_pipeline_e2e's first two stages) as
    * a streaming stage over a `(doc_id, ingest_ts, text)` feed. The
    * fingerprint dedup state is bounded by the watermark horizon — at
    * firehose scale the state store holds one md5 per distinct document
    * seen inside the horizon, not the corpus; replayed or reshuffled
    * boilerplate inside the horizon drops exactly, and cross-horizon
    * dedup is the idempotent batch sink's job downstream
    * ([[graft.sink.Sinks.appendDedupParquet]] on the same fingerprint).
    * The output carries `text` through — surviving documents ARE the
    * corpus feed; without the content the downstream sink could not
    * materialize the corpus without a second join back by doc_id.
    */
  def corpusPrepStream(docs: DataFrame, stopwords: Seq[String],
      minQuality: Double = 0.5, horizon: String = "1 hour"): DataFrame =
    docs
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        graft.operators.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        graft.operators.TextOps.qualityScoreFromTokens(col("toks"), stopwords).as("quality"),
        graft.operators.TextOps.fingerprintMd5(col("text")).as("fp"))
      .filter(col("quality") >= minQuality)
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of q_x_rag_chunks — the retrieval-ingest chunker
    * running live: documents stream in, overlapping provenance-carrying
    * token windows stream out, ready for index upsert. The transform IS
    * [[graft.operators.TextOps.slidingChunks]] (one definition, so the
    * twin can't drift from the batch registry entry) and is a stateless
    * narrow map + explode: no watermark, no state store, and micro-batch
    * slicing cannot show through a per-row transform — StreamingSpec pins
    * the drained stream == the batch chunking row-for-row.
    */
  def ragChunksStream(docs: DataFrame, window: Int = 32,
      stride: Int = 24): DataFrame =
    graft.operators.TextOps.slidingChunks(docs, "text", window, stride)

  /** Streaming eval-contamination gate — the third ingest gate beside the
    * quality/fingerprint gate ([[corpusPrepStream]]) and the near-dup gate
    * ([[nearDupGateStream]]): never let benchmark data into the training
    * corpus. Each incoming document's distinct word-n-gram hashes (the
    * [[graft.operators.TextOps.contaminationMatrix]] kernel — one shared
    * hash domain, so the live gate and the batch audit can't disagree)
    * probe a BROADCAST static eval-set gram table; any hit emits a
    * rejection row (doc_id, eval_set) — admission is the sink's
    * anti-join downstream, the established gate stance. A doc sharing
    * many grams with one set would emit once per gram;
    * `dropDuplicatesWithinWatermark` on (doc_id, eval_set) collapses the
    * replays with horizon-bounded state, exactly like the other gates.
    * Stream-static join + bounded dedup — no stream-stream state.
    */
  def contaminationGateStream(incoming: DataFrame, bench: DataFrame,
      setCol: String = "eval_set", n: Int = 8,
      horizon: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.graft.natives.shingleHashes
    val bg = bench
      .select(col(setCol).as("eval_set"),
        explode(shingleHashes(col("text"), n)).as("__g"))
      .distinct()
    incoming
      .select(col("doc_id"), col("ingest_ts"),
        explode(array_distinct(shingleHashes(col("text"), n))).as("__g"))
      .join(broadcast(bg), Seq("__g"))
      .select(col("doc_id"), col("ingest_ts"), col("eval_set"))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("doc_id", "eval_set")
  }

  /** Streaming near-dup admission gate — the S-layer tier of
    * [[graft.operators.Dedup.crossNearDupMinHash]]: each incoming document
    * is MinHash-banded in ONE narrow pass (signature + shingle hashes
    * computed together, bands exploded — stateless), bucket-joined against
    * the STANDING corpus's precomputed band table (a stream-static
    * equi-join, no stream-stream state), and band collisions are verified
    * with the same exact word-shingle Jaccard as the batch operator (the
    * incoming doc carries its own shingle hashes; the standing doc's
    * attach via a second static join). Emits the REJECTION feed
    * (doc_id, old_id, jaccard ≥ threshold) — admission is the batch
    * sink's anti-join downstream, the corpusPrepStream stance. A pair
    * colliding in several bands would emit once per band;
    * `dropDuplicatesWithinWatermark` on (doc_id, old_id) collapses the
    * replays with state bounded by the horizon, exactly like the
    * fingerprint dedup above.
    */
  def nearDupGateStream(incoming: DataFrame, standing: DataFrame,
      numHashes: Int = 16, rowsPerBand: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.6, horizon: String = "1 hour"): DataFrame =
    nearDupGateStreamIndexed(incoming,
      graft.operators.Dedup
        .textBands(standing, "doc_id", "text", numHashes, rowsPerBand, shingleN),
      graft.operators.Dedup.textShingles(standing, "doc_id", "text", shingleN),
      numHashes, rowsPerBand, shingleN, threshold, horizon)

  /** [[nearDupGateStream]] against PRE-BUILT standing tables — the
    * persisted-index form ([[graft.serve.DedupIndex.readBands]] /
    * `readShingles`): the stream-static joins read the materialized band
    * and shingle tables, so the standing corpus is never re-sketched per
    * micro-batch (it was re-sketched per RUN even in the recompute form —
    * at 100 TB the index tables are the only viable static side). One
    * definition: the recompute gate delegates here with inline-built
    * tables, so indexed ≡ recompute by construction and the spec pins the
    * read-back path.
    */
  def nearDupGateStreamIndexed(incoming: DataFrame, standingBands: DataFrame,
      standingShingles: DataFrame,
      numHashes: Int = 16, rowsPerBand: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.6, horizon: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.graft.natives.{minhashSig, shingleHashes, sortedIntersectCount}
    val numBands = numHashes / rowsPerBand
    val bandCol = explode(array((0 until numBands).map { j =>
      struct(lit(j).as("band"),
        md5(concat_ws("|", (j * rowsPerBand until (j + 1) * rowsPerBand)
          .map(i => element_at(col("__sig"), i + 1)): _*)).as("bh"))
    }: _*))
    val nb = incoming
      .select(col("doc_id"), col("ingest_ts"),
        minhashSig(col("text"), numHashes, shingleN).as("__sig"),
        shingleHashes(col("text"), shingleN).as("__sa"))
      .filter(col("__sig").isNotNull)
      .select(col("doc_id"), col("ingest_ts"), col("__sa"), bandCol.as("b"))
      .select(col("doc_id"), col("ingest_ts"), col("__sa"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    val ob = standingBands.withColumnRenamed("doc_id", "old_id")
    val osh = standingShingles
      .select(col("doc_id").as("old_id"), col("ss").as("__sb"))
    nb.join(ob, Seq("band", "bh"))
      .join(osh, Seq("old_id"))
      .withColumn("common", sortedIntersectCount(col("__sa"), col("__sb")).cast("double"))
      .withColumn("jaccard", round(col("common") /
        (size(col("__sa")) + size(col("__sb")) - col("common")).cast("double"), 3))
      .filter(col("jaccard") >= threshold)
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("doc_id", "old_id")
      .select(col("doc_id"), col("old_id"), col("jaccard"), col("ingest_ts"))
  }

  /** Streaming cross-modal ALIGNMENT gate — the live tier of
    * [[graft.operators.Dedup.crossModalAlignmentAcross]]: each incoming
    * (caption, image) record's two modality neighborhoods are measured
    * against the STANDING corpus's precomputed band tables
    * ([[graft.operators.Dedup.textBands]] /
    * [[graft.operators.Multimodal.phashBands]] — or the same tables read
    * back from a persisted index), and weak agreement flags the record
    * before it reaches the mm dedup family (CLIP-score's decision role,
    * live at ingest like the text path's [[nearDupGateStream]]).
    *
    * STATELESS by construction — the state the batch form aggregates
    * (per-record neighbor counts) arrives here as BUCKET ARRAYS instead:
    * the standing band tables are pre-grouped to (band key → sorted
    * neighbor-id array) once (tiny next to the corpus, localCheckpointed
    * so micro-batches never re-aggregate), each incoming record LEFT-joins
    * its `numBands` text band hashes and 4 image bands against them
    * (stream-static equi-joins, no stream-side groupBy, no watermark
    * store), and the neighbor SETS are array-unions of the hit buckets —
    * so n_text/n_img/n_common are per-row array ops and the gate runs in
    * append mode with zero streaming state. Per-record output is the
    * batch operator's row shape exactly (plus ingest_ts).
    */
  def mmAlignmentGateStream(incoming: DataFrame, standingTextBands: DataFrame,
      standingPhashBands: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4,
      shingleN: Int = 3, tau: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graft.natives.minhashSig
    val numBands = numHashes / rowsPerBand
    val tb = standingTextBands
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("__nbrs"))
      .localCheckpoint()
    val pb = standingPhashBands
      .groupBy(col("band"), col("bv"))
      .agg(sort_array(collect_set(col("doc_id"))).as("__nbrs"))
      .localCheckpoint()
    def textBandHash(j: Int) =
      md5(concat_ws("|", (j * rowsPerBand until (j + 1) * rowsPerBand)
        .map(i => element_at(col("__sig"), i + 1)): _*))
    def imgBandValue(j: Int) =
      shiftright(col("ph"), j * 16).bitwiseAND(lit(65535L))
    val emptyNbrs = array().cast("array<bigint>")
    var cur = incoming.withColumn("__sig",
      minhashSig(col("text"), numHashes, shingleN))
    val tArrs = (0 until numBands).map { j =>
      val side = tb.filter(col("band") === j)
        .select(col("bh").as(s"__tbh$j"), col("__nbrs").as(s"__tn$j"))
      cur = cur.join(side, textBandHash(j) === col(s"__tbh$j"), "left")
      coalesce(col(s"__tn$j"), emptyNbrs)
    }
    val iArrs = (0 until 4).map { j =>
      val side = pb.filter(col("band") === j)
        .select(col("bv").as(s"__pbv$j"), col("__nbrs").as(s"__in$j"))
      cur = cur.join(side, imgBandValue(j) === col(s"__pbv$j"), "left")
      coalesce(col(s"__in$j"), emptyNbrs)
    }
    cur
      .select(col("doc_id"), col("ingest_ts"),
        array_distinct(concat(tArrs: _*)).as("__tset"),
        array_distinct(concat(iArrs: _*)).as("__iset"))
      .withColumn("n_text_nbrs", size(col("__tset")).cast("long"))
      .withColumn("n_img_nbrs", size(col("__iset")).cast("long"))
      .withColumn("n_common",
        size(array_intersect(col("__tset"), col("__iset"))).cast("long"))
      .withColumn("alignment",
        when(col("n_text_nbrs") + col("n_img_nbrs") === 0, lit(1.0))
          .otherwise(round(col("n_common").cast("double") /
            (col("n_text_nbrs") + col("n_img_nbrs") - col("n_common")).cast("double"), 3)))
      .withColumn("is_aligned", col("alignment") >= tau)
      .select(col("doc_id"), col("n_text_nbrs"), col("n_img_nbrs"),
        col("n_common"), col("alignment"), col("is_aligned"), col("ingest_ts"))
  }

  /** Streaming VECTOR admission gate — the live tier of
    * [[graft.serve.AnnIndex.admitNearDups]], completing the S-layer gate
    * symmetry (text near-dup, contamination, cross-modal alignment, and
    * now embeddings): each incoming vector ranks the persisted index's
    * STORED codebook (one-row broadcast, ranked inline so `ingest_ts`
    * rides through — [[graft.operators.Similarity.coarseRankExpr]] is the
    * same definition the batch assign uses), candidates are the standing
    * vectors sharing its `nProbe` best cells (stream-static join against
    * the read-back assignment table), and the exact-cosine verify emits
    * the rejection feed (vec_id, old_id, cos_sim ≥ threshold) — admission
    * is the sink's anti-join downstream, the established gate stance. A
    * pair sharing several probed cells would emit once per cell;
    * `dropDuplicatesWithinWatermark` collapses the replays with
    * horizon-bounded state, exactly like the text gate's band replays.
    */
  def annAdmitGateStream(incoming: DataFrame, codebook: DataFrame,
      assignments: DataFrame, corpus: DataFrame, threshold: Double,
      nProbe: Int = 4, horizon: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.graft.natives.cosineSim
    val staged = incoming.select(col("vec_id"), col("ingest_ts"),
      col("embedding").as("__qe"))
    staged.crossJoin(broadcast(codebook))
      .withColumn("sc", explode(slice(
        graft.operators.Similarity.coarseRankExpr("cb", "__qe"), 1, nProbe)))
      .select(col("vec_id"), col("ingest_ts"), col("__qe"),
        col("sc.cell").as("cell"))
      .join(assignments.select(col("id").as("old_id"), col("cell")), Seq("cell"))
      .join(corpus.select(col("vec_id").as("old_id"), col("embedding").as("__ce")),
        Seq("old_id"))
      .select(col("vec_id"), col("old_id"), col("ingest_ts"),
        cosineSim(col("__qe"), col("__ce")).as("cs"))
      .filter(col("cs") >= threshold)
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("vec_id", "old_id")
      .select(col("vec_id"), col("old_id"), round(col("cs"), 4).as("cos_sim"),
        col("ingest_ts"))
  }

  /** Stream-stream interval join: each purchase joined to the views of the
    * same user in the preceding hour — the streaming form of the batch as-of
    * enrichment (J5/B2). Watermarks bound both sides' state; late views past
    * the watermark are reconciled by the batch pipeline, matching the
    * reference's repair-by-backfill stance.
    */
  def enrichedPurchaseStream(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user"), col("value").as("amount"))
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", "2 hours")
      .select(col("ts").as("v_ts"), col("user_id").as("v_user"),
        col("value").as("price"))
    purchases.join(views,
      expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts <= p_ts"),
      "leftOuter")
      .select(col("p_event_id"), col("p_user"), col("p_ts"), col("amount"), col("price"))
  }

  case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
  case class SessionOut(user_id: Long, n_events: Long, total_value: Double)

  case class TransitionStep(user_id: Long, from_state: String, to_state: String)

  /** Streaming tier of the q_x_transitions Markov matrix: per user, the
    * state store holds only the LAST seen event type; each arriving
    * event emits one (from, to) step row. Downstream, the matrix is a
    * plain streaming aggregate over the steps — counts after any drain
    * equal the batch LEAD-based build under ordered arrival, because a
    * sequence's consecutive pairs are exactly "previous, current" at
    * each element (StreamingSpec pins count equality). Within-batch
    * disorder absorbed by the per-user per-batch sort, as in
    * [[scd2Stream]]; state is one string per user.
    */
  def transitionsStream(spark: SparkSession, events: DataFrame): Dataset[TransitionStep] = {
    import spark.implicits._
    events.selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[String]) => {
          val ordered = rows.toArray.sortBy(r => (r._2, r._3))
          val out = Seq.newBuilder[TransitionStep]
          var last = state.getOption
          ordered.foreach { case (_, _, _, tpe) =>
            last.foreach(prev => out += TransitionStep(user, prev, tpe))
            last = Some(tpe)
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  case class TickState(peak: Long, maxDdBp: Long)
  case class DrawdownRow(symbol: Long, peak_c: Long, max_drawdown_bp: Long)

  /** Streaming tier of the q_x_drawdown tail-risk metric: per symbol, the
    * state store holds ONLY (running peak cents, worst drawdown bp) — two
    * longs, no tick history — and each micro-batch folds its ticks in
    * event order and emits the symbol's updated row. Both stored numbers
    * are monotone non-decreasing, so the latest emission per symbol IS
    * the answer so far, and under per-symbol ordered arrival the drained
    * final state equals the batch q_x_drawdown aggregate exactly
    * (StreamingSpec pins it): the fold is the same left-to-right
    * running-max recurrence the batch bucket-and-handoff window
    * decomposes. Integer bp via Long division (truncation toward zero =
    * Spark `div` on the non-negative operands); a zero peak yields no
    * drawdown sample, mirroring the batch NULL-division skip.
    * Within-batch disorder absorbed by the per-batch sort, as in
    * [[transitionsStream]].
    */
  def drawdownStream(spark: SparkSession, events: DataFrame): Dataset[DrawdownRow] = {
    import spark.implicits._
    events.filter(col("event_type") === "view")
      .selectExpr("pmod(user_id, 25) AS symbol", "unix_micros(ts) AS us",
        "event_id", "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (sym: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[TickState]) => {
          val ordered = rows.toArray.sortBy(r => (r._2, r._3))
          if (ordered.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(TickState(Long.MinValue, 0L))
            ordered.foreach { case (_, _, _, c) =>
              val peak = math.max(st.peak, c)
              val dd = if (peak > 0) math.max(st.maxDdBp, (peak - c) * 10000L / peak)
                       else st.maxDdBp
              st = TickState(peak, dd)
            }
            state.update(st)
            Iterator(DrawdownRow(sym, st.peak, st.maxDdBp))
          }
        })
  }

  case class FunnelState(t1: Long, t2: Long, t3: Long) // -1 = step not reached
  case class FunnelConv(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  /** Streaming tier of the q_x_funnel ordered conversion funnel: per
    * user, track the first view (t1), the first qualifying click
    * (strictly after t1, within the 7-day window anchored at t1), and
    * the first qualifying purchase — and emit ONE conversion row the
    * moment the purchase lands. Under per-user event-time-ordered
    * arrival, greedy first-match IS the batch cascade's min-timestamp
    * semantics (the first qualifying event of an ordered stream is its
    * minimum), so the emitted rows equal the batch funnel's converted
    * users exactly — StreamingSpec drains a sliced stream and checks
    * set equality against a naive driver replay. Within-batch disorder
    * is absorbed by the per-user per-batch sort (bounded by the trigger
    * interval), as in [[scd2Stream]]; state is three longs per user —
    * O(users) store, no event history retained.
    */
  def funnelStream(spark: SparkSession, events: DataFrame): Dataset[FunnelConv] = {
    import spark.implicits._
    val winUs = 7L * 86400L * 1000000L
    events.selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[FunnelState]) => {
          val ordered = rows.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = Seq.newBuilder[FunnelConv]
          ordered.foreach { case (_, us, _, tpe) =>
            if (st.t3 < 0) tpe match {
              case "view" if st.t1 < 0 => st = st.copy(t1 = us)
              case "click" if st.t1 >= 0 && st.t2 < 0 &&
                  us > st.t1 && us <= st.t1 + winUs =>
                st = st.copy(t2 = us)
              case "purchase" if st.t2 >= 0 &&
                  us > st.t2 && us <= st.t1 + winUs =>
                st = st.copy(t3 = us)
                out += FunnelConv(user, st.t1, st.t2, us)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
        })
  }

  case class Scd2State(state: String, sinceUs: Long, version: Int)
  case class Scd2Closed(user_id: Long, version: Int, state: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Streaming tier of the batch q_x_scd2 dimension-history build: per
    * user, maintain the OPEN version (tracked attribute + since + version
    * number) in the state store and emit a version row the moment the
    * attribute CHANGES — closed versions stream out as they close, the
    * open version is always the state entry. Under per-user event-time
    * ordered arrival (the change-capture contract: a CDC feed delivers a
    * key's changes in order), the emitted rows equal the batch build's
    * closed versions exactly — StreamingSpec drains a 3-micro-batch
    * ts-sliced stream and checks set equality against q_x_scd2.
    *
    * Out-of-order arrival WITHIN a micro-batch is absorbed (each batch's
    * rows are sorted by (ts, event_id) before folding — the buffer is
    * per-user-per-batch, bounded by the trigger interval, not history);
    * out-of-order ACROSS batches is not — that is the batch tier's job
    * (same reconciliation split as userSessions vs the batch rules).
    */
  def scd2Stream(spark: SparkSession, events: DataFrame): Dataset[Scd2Closed] = {
    import spark.implicits._
    events.selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[Scd2State]) => {
          val ordered = rows.toArray.sortBy(r => (r._2, r._3))
          val closed = Seq.newBuilder[Scd2Closed]
          var cur = state.getOption
          ordered.foreach { case (_, us, _, tpe) =>
            cur match {
              case None => cur = Some(Scd2State(tpe, us, 1))
              case Some(c) if c.state != tpe =>
                closed += Scd2Closed(user, c.version, c.state, c.sinceUs, us)
                cur = Some(Scd2State(tpe, us, c.version + 1))
              case _ => () // same attribute value — the run continues
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
        })
  }

  /** Per-user running session state via flatMapGroupsWithState — the custom
    * stateful recurrence ("present in previous state or opened, not closed",
    * entities.md:183-186) in stream form. Emits an updated row per user per
    * batch; state for users idle past `idleTimeout` is evicted (processing-
    * time timeout), so long-running streams don't accumulate dead keys — the
    * batch reconciliation tier rebuilds any session that resumes later.
    */
  def userSessions(spark: SparkSession, events: DataFrame,
      idleTimeout: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events.selectExpr("user_id", "value", "cast(ts as long) as ts_s")
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (user: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.nEvents
            var total = prev.totalValue
            var last = prev.lastTs
            rows.foreach { case (_, v, t) =>
              n += 1; total += v; last = math.max(last, t)
            }
            state.update(SessionState(n, total, last))
            state.setTimeoutDuration(idleTimeout)
            Iterator(SessionOut(user, n, total))
          }
        })
  }

  /** Drive a streaming DataFrame into an idempotent parquet sink via
    * foreachBatch — the exactly-once write contract (§2.11): batch replay
    * dedups on the natural key instead of double-inserting.
    */
  def runToIdempotentSink(out: DataFrame, sinkPath: String, checkpoint: String,
      keys: Seq[String],
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val w = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sink.Sinks.appendDedupParquet(batch.toDF(), sinkPath, keys)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** S5 market-price poller: one poll cycle of the price feed as a bounded
    * stream — filter the price stream, normalize the decimal exponent (the
    * reference divides by 10^decimal_digits before storing, mp_asset
    * contract), and land idempotently keyed on the event id.
    * `Trigger.AvailableNow` drains everything available then stops = one
    * poll; schedule the cycle on the poll cadence (the reference's interval
    * timer — see [[graft.serve.Scheduling.catchUpDelaySeconds]]), or swap in
    * `Trigger.ProcessingTime` for a resident poller. Checkpoint + keyed
    * dedup make re-polls no-ops on already-seen prices.
    */
  def pricePollerOnce(spark: SparkSession, srcDir: String, sinkPath: String,
      checkpoint: String, decimalDigits: Int = 2):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val prices = fileEventStream(spark, srcDir)
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("ts"), col("user_id").as("asset_id"),
        (col("value") / math.pow(10, decimalDigits)).as("price"))
    runToIdempotentSink(prices, sinkPath, checkpoint, Seq("event_id"),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
  }

  /** S2 consumer retry + circuit breaker: wrap a foreachBatch body in
    * bounded in-place retries (the batch's epoch is only committed once the
    * body returns, so a retried batch is never lost and never doubled given
    * an idempotent sink). After `maxAttempts` consecutive failures of the
    * same batch the breaker opens: the wrapper rethrows and the query stops
    * — mirroring the reference consumer's abort-after-N-consecutive-errors
    * loop (etl-ingest/src/provider/event.rs:157-215). Restarting the query
    * resumes from the uncommitted batch.
    */
  def breakerForeachBatch(maxAttempts: Int, backoffMs: Long = 0L)(
      body: (Dataset[org.apache.spark.sql.Row], Long) => Unit):
      (Dataset[org.apache.spark.sql.Row], Long) => Unit = { (batch, batchId) =>
    var attempt = 1
    var done = false
    while (!done) {
      try { body(batch, batchId); done = true }
      catch {
        // NonFatal only: InterruptedException (query.stop()), OOM and other
        // VM errors must propagate immediately, not burn retry attempts
        case scala.util.control.NonFatal(_) if attempt < maxAttempts =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs)
        case scala.util.control.NonFatal(e) =>
          throw new IllegalStateException(
            s"circuit breaker open: batch $batchId failed $maxAttempts consecutive attempts", e)
      }
    }
  }

  /** Observes query terminations and latches the breaker state: once a query
    * dies with an exception (e.g. the breaker above rethrowing), `isOpen`
    * stays true so a supervising restart loop stops re-spawning a sick
    * consumer (reference: event.rs:20-29). Register with
    * `spark.streams.addListener`.
    */
  class BreakerListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile private var reason: Option[String] = None
    def isOpen: Boolean = reason.isDefined
    def openReason: Option[String] = reason
    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
      event.exception.foreach(e => reason = Some(e))
  }
}
