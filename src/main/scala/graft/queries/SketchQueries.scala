package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

/** Sketch-column queries: count-min frequency sketches (both fully
  * DuckDB-oracled — the md5 bucket hash makes every counter and estimate a
  * replayable integer) and the DataSketches HLL rollup tier (no oracle by
  * design; exact twin q_a4_monthly_active + SketchSpec error bound).
  *
  * Reference anchor: the serve layer's pre-aggregated/materialized hot
  * endpoints (SURVEY §2.12); sketch columns are the mergeable form of that
  * pre-aggregation for counting questions at 100 TB.
  */
object SketchQueries {

  private val Depth = 4
  private val TopkWidth = 2048
  private val RollupWidth = 256

  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  /** DuckDB replay of NativeKernels.cmsBucket: signed md5-prefix hash of
    * the `u` column in scope, pmod width.
    */
  private def bucketSql(width: Int): String =
    s"""((CASE WHEN u >= CAST(9223372036854775808 AS UBIGINT)
       |       THEN CAST(CAST(u AS HUGEINT) - 18446744073709551616 AS BIGINT)
       |       ELSE CAST(u AS BIGINT) END % $width) + $width) % $width""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-50 most frequent terms by count-min estimate — the relational CMS
    // (GROUP BY hashed bucket = the sketch; map-side combine bounds partial
    // state at depth×width). Exact-count twin: q_x_term_freq.
    "q_x_cms_topk" -> { (s, dir) =>
      Sketches.cmsHeavyHitters(Tables.documents(s, dir), "text",
        depth = Depth, width = TopkWidth, k = 50)
    },
    // Stored daily CMS sketches rolled up to monthly estimates per
    // event_type — sketch-as-a-column, merged WITHOUT re-reading raw rows.
    "q_x_cms_rollup" -> { (s, dir) =>
      Sketches.cmsRollup(Tables.events(s, dir), "event_type",
        depth = Depth, width = RollupWidth)
    },
    // Daily HLL sketches unioned to monthly distinct-user estimates — the
    // stored-sketch tier of q_a4_monthly_active (no oracle: DataSketches
    // binary state is engine-private; SketchSpec bounds the error at 5%
    // and pins daily-union ≡ direct-build).
    "q_x_hll_rollup" -> { (s, dir) =>
      Sketches.hllRollup(Tables.events(s, dir), "user_id")
    },
    // CMS inner-product join-cardinality estimate (views ⋈_user purchases)
    // beside the exact Σ fA·fB — the pre-join sizing call that decides
    // broadcast vs shuffle vs salt BEFORE paying for the join. Depth×width
    // counter tables only; the md5 bucket hash keeps the whole estimate an
    // oracle-replayable integer, and overest_bp certifies the estimator's
    // one-sided error on this corpus.
    "q_x_join_card" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      Sketches.cmsJoinCardinality(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        "user_id", depth = Depth, width = RollupWidth)
    },
    // KMV (k-minimum-values / bottom-k) distinct sketch — the one
    // approximate-distinct tier in the registry whose ESTIMATE is itself
    // hash-checkable (HLL/theta carry engine-private binary state; KMV's
    // state is just the k smallest md5 values, so DuckDB replays the
    // whole chain): per stream the k=64 smallest hashes of user_id over
    // a 2⁶² domain, est = (k−1)·M div h_k (exact HUGEINT/DECIMAL(38,0)
    // division), degenerating to the EXACT count when fewer than k
    // distinct hashes exist (the sketch is lossless below k). The exact
    // twin and the error in bp ride along, certifying the estimator on
    // this corpus. Scale shape: the rank-≤k filter is the W5
    // WindowGroupLimit pattern — each map task forwards at most k
    // hashes per stream, so the shuffle is k-bounded, and the sketch
    // column is mergeable by construction (union = re-take bottom-k).
    "q_x_kmv_distinct" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val K = 64
      val M = 4611686018427387904L // 2^62
      val ev = Tables.events(s, dir)
      val h = ev.select(col("event_type"),
          pmod(graft.operators.TextOps.md5Long64(
            concat(lit("kmv:"), col("user_id").cast("string"))), lit(M)).as("h"))
        .distinct()
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val sk = h.withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("h"))))
        .filter(col("rk") <= K)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("kmv_k"), max(col("h")).as("h_k"))
      sk.join(exact, "event_type")
        // greatest(h_k, 1): a key hashing to exactly 0 while ≥k distinct
        // hashes exist would otherwise divide by zero (astronomically
        // unlikely over the 2⁶² domain, but the estimator must not be
        // able to crash on any input); the twin SQL carries the same
        // guard so the chains stay replay-identical.
        .withColumn("est_distinct", when(col("kmv_k") < K, col("kmv_k"))
          .otherwise(expr(
            s"cast((cast(kmv_k - 1 as decimal(38,0)) * $M) div greatest(h_k, 1L) as bigint)")))
        .select(col("event_type"), col("n_exact"), col("kmv_k"), col("h_k"),
          col("est_distinct"),
          expr("abs(est_distinct - n_exact) * 10000 div n_exact").as("err_bp"))
    },
    // Exact distinct-set overlap of two behavioral segments — the oracled
    // twin of q_x_theta_sets (per-user flag rollup, then flag algebra).
    "q_x_set_overlap" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("a"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("b"))
        .agg(
          sum(col("a")).as("n_a"),
          sum(col("b")).as("n_b"),
          sum(col("a") * col("b")).as("n_both"),
          sum(col("a") * (lit(1) - col("b"))).as("n_a_only"))
    },
    // Theta-sketch set algebra over the same segments (no oracle:
    // DataSketches state; at test cardinalities the sketches are in exact
    // mode and SketchSpec pins equality with q_x_set_overlap).
    "q_x_theta_sets" -> { (s, dir) =>
      Sketches.thetaSetOverlap(Tables.events(s, dir), "user_id", "event_type",
        aType = "purchase", bType = "click")
    },
    // EXACT mergeable distinct counts via 64-bit bitmap words — the
    // ClickHouse/Doris bitmap-index move, and the exact tier between
    // q_a4_monthly_active (re-reads raw rows per window) and the HLL
    // rollup (approximate): store per-(day, word) bitmaps where word w
    // covers user ids [64w, 64w+64), count a day by summing popcounts,
    // and roll ANY coarser window up by bit_or-ing stored words — never
    // touching a raw row again, with zero error. State is |id space|/64
    // bits per day (dense ids; sparse ids dictionary-encode first), every
    // stage a map-side-combinable hash aggregate. The overall tier here
    // IS the re-aggregation (bit_or over the daily words), so the oracle
    // match proves the merge, not just the count.
    "q_x_bitmap_rollup" -> { (s, dir) =>
      val words = Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"),
          expr("shiftright(user_id, 6)").as("w"),
          expr("shiftleft(1L, cast(pmod(user_id, 64) as int))").as("m"))
        .groupBy(col("day"), col("w"))
        .agg(bit_or(col("m")).as("word"))
      val daily = words.groupBy(col("day"))
        .agg(sum(bit_count(col("word")).cast("long")).as("active_users"))
      val overall = words.groupBy(col("w")).agg(bit_or(col("word")).as("word"))
        .agg(sum(bit_count(col("word")).cast("long")).as("overall_active"))
      daily.crossJoin(broadcast(overall))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_x_cms_topk" ->
      s"""WITH t AS (
         |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents),
         |tt AS (SELECT term FROM t WHERE term <> ''),
         |d AS (SELECT unnest(range($Depth)) AS i),
         |r AS (
         |  SELECT term, i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', term)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM tt CROSS JOIN d),
         |rb AS (SELECT term, i, ${bucketSql(TopkWidth)} AS bucket FROM r),
         |counters AS (SELECT i, bucket, count(*) AS c FROM rb GROUP BY i, bucket),
         |cand AS (SELECT DISTINCT term FROM tt),
         |cb AS (
         |  SELECT term, i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', term)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM cand CROSS JOIN d),
         |cbb AS (SELECT term, i, ${bucketSql(TopkWidth)} AS bucket FROM cb),
         |est AS (
         |  SELECT cbb.term, min(counters.c) AS est_count
         |  FROM cbb JOIN counters USING (i, bucket) GROUP BY cbb.term)
         |SELECT term, est_count FROM est
         |ORDER BY est_count DESC, term ASC LIMIT 50""".stripMargin,
    // the same kmv hash domain (signed md5 pmod 2^62), bottom-k rank,
    // HUGEINT estimate division, and sub-k exact degeneration
    "q_x_kmv_distinct" ->
      s"""WITH $evCte,
         |hr AS (SELECT DISTINCT event_type,
         |    CAST(concat('0x', substr(md5(concat('kmv:', CAST(user_id AS VARCHAR))), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM ev),
         |hh AS (SELECT DISTINCT event_type,
         |    ((CASE WHEN u >= CAST(9223372036854775808 AS UBIGINT)
         |           THEN CAST(CAST(u AS HUGEINT) - 18446744073709551616 AS BIGINT)
         |           ELSE CAST(u AS BIGINT) END % 4611686018427387904)
         |      + 4611686018427387904) % 4611686018427387904 AS h
         |  FROM hr),
         |rk AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM hh),
         |sk AS (SELECT event_type, count(*) AS kmv_k, max(h) AS h_k
         |  FROM rk WHERE rk <= 64 GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM ev GROUP BY 1),
         |j AS (SELECT sk.event_type, ex.n_exact, sk.kmv_k, sk.h_k,
         |    CASE WHEN sk.kmv_k < 64 THEN sk.kmv_k
         |         ELSE CAST((CAST(sk.kmv_k - 1 AS HUGEINT) * 4611686018427387904)
         |           // greatest(sk.h_k, 1) AS BIGINT) END AS est_distinct
         |  FROM sk JOIN ex USING (event_type))
         |SELECT event_type, n_exact, kmv_k, h_k, est_distinct,
         |  abs(est_distinct - n_exact) * 10000 // n_exact AS err_bp
         |FROM j""".stripMargin,
    // the same per-side md5 counter tables, per-row inner products, min,
    // and the exact per-key product sum
    "q_x_join_card" ->
      s"""WITH $evCte,
         |d AS (SELECT unnest(range($Depth)) AS i),
         |a AS (SELECT CAST(user_id AS VARCHAR) AS k FROM ev
         |  WHERE event_type = 'view'),
         |b AS (SELECT CAST(user_id AS VARCHAR) AS k FROM ev
         |  WHERE event_type = 'purchase'),
         |ar AS (SELECT i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', k)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM a CROSS JOIN d),
         |ab AS (SELECT i, ${bucketSql(RollupWidth)} AS bucket FROM ar),
         |ac AS (SELECT i, bucket, count(*) AS c FROM ab GROUP BY 1, 2),
         |br AS (SELECT i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', k)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM b CROSS JOIN d),
         |bb AS (SELECT i, ${bucketSql(RollupWidth)} AS bucket FROM br),
         |bc AS (SELECT i, bucket, count(*) AS c FROM bb GROUP BY 1, 2),
         |ip AS (SELECT ac.i, CAST(sum(ac.c * bc.c) AS BIGINT) AS ip
         |  FROM ac JOIN bc ON ac.i = bc.i AND ac.bucket = bc.bucket GROUP BY 1),
         |est AS (SELECT min(ip) AS est_join FROM ip),
         |ex AS (SELECT coalesce(CAST(sum(va.n * vb.n) AS BIGINT), 0) AS exact_join
         |  FROM (SELECT k, count(*) AS n FROM a GROUP BY 1) va
         |  JOIN (SELECT k, count(*) AS n FROM b GROUP BY 1) vb USING (k)),
         |na AS (SELECT count(*) AS n_a FROM a),
         |nb AS (SELECT count(*) AS n_b FROM b)
         |SELECT na.n_a, nb.n_b, ex.exact_join, est.est_join,
         |  (est.est_join - ex.exact_join) * 10000 // greatest(ex.exact_join, 1)
         |    AS overest_bp
         |FROM na, nb, ex, est""".stripMargin,

    "q_x_cms_rollup" ->
      s"""WITH $evCte,
         |d AS (SELECT unnest(range($Depth)) AS i),
         |base AS (SELECT strftime(date_trunc('day', ts), '%Y-%m') AS month, event_type FROM ev),
         |r AS (
         |  SELECT month, event_type, i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', event_type)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM base CROSS JOIN d),
         |rb AS (SELECT month, i, ${bucketSql(RollupWidth)} AS bucket FROM r),
         |counters AS (SELECT month, i, bucket, count(*) AS c FROM rb GROUP BY month, i, bucket),
         |cand AS (SELECT DISTINCT event_type FROM ev),
         |months AS (SELECT DISTINCT month FROM base),
         |cb AS (
         |  SELECT month, event_type, i,
         |    CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR), ':', event_type)), 1, 16))
         |      AS UBIGINT) AS u
         |  FROM months CROSS JOIN cand CROSS JOIN d),
         |cbb AS (SELECT month, event_type, i, ${bucketSql(RollupWidth)} AS bucket FROM cb)
         |SELECT cbb.month, cbb.event_type,
         |  min(coalesce(counters.c, 0)) AS est_events
         |FROM cbb LEFT JOIN counters
         |  ON cbb.month = counters.month AND cbb.i = counters.i AND cbb.bucket = counters.bucket
         |GROUP BY cbb.month, cbb.event_type""".stripMargin,

    "q_x_set_overlap" ->
      s"""WITH $evCte,
         |f AS (
         |  SELECT user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a,
         |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS b
         |  FROM ev GROUP BY user_id)
         |SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         |  CAST(sum(a * b) AS BIGINT) AS n_both,
         |  CAST(sum(a * (1 - b)) AS BIGINT) AS n_a_only
         |FROM f""".stripMargin,
    // the oracle states the SEMANTIC (exact distinct per day + overall);
    // the engine side reaches it purely through bitmap-word algebra
    "q_x_bitmap_rollup" ->
      s"""WITH $evCte,
         |d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |    count(DISTINCT user_id) AS active_users
         |  FROM ev GROUP BY 1),
         |o AS (SELECT count(DISTINCT user_id) AS overall_active FROM ev)
         |SELECT day, active_users, overall_active FROM d CROSS JOIN o""".stripMargin
  )
}
