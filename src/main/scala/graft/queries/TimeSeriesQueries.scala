package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** Market-feed time-series analytics over the price-tick stream — the
  * portfolio-metric family the reference derives from its mp_asset price
  * feed (crates/etl-core/src/dao/postgre/mp_asset.rs:61-88 price series,
  * ls_state.rs PnL windows): time-weighted average price, maximum
  * drawdown, and realized volatility.
  *
  * All three run on the exact-integer house basis (value → DECIMAL(18,2)
  * → cents LONG; ratios in basis points via integer division mirrored as
  * DuckDB `//`), so every output is bit-deterministic. The per-symbol
  * sequential dependencies (previous tick, running peak) go through
  * Ops.lagPerKey / Ops.cumAggPerKey — the bucket-and-handoff forms — so
  * no instrument's full history ever sorts on a single reducer: at 100 TB
  * a hot symbol's feed is TBs on its own, exactly the shape a plain
  * `PARTITION BY symbol` window would serialize.
  */
object TimeSeriesQueries {

  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  /** Price ticks: the 'view' stream as a 25-instrument feed (symbol =
    * user_id mod 25, the q_lit_price_series role mapping), price in exact
    * cents. (ts, event_id) is the total tick order.
    */
  private def ticks(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "view")
      .select(pmod(col("user_id"), lit(25)).as("symbol"),
        col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))

  /** Ticks with the previous tick's (ts, price) attached — one
    * lagPerKey pass (day-bucketed) shared by TWAP and realized vol.
    */
  private def withPrev(s: SparkSession, dir: String): DataFrame =
    Ops.lagPerKey(
      ticks(s, dir).withColumn("tc", struct(col("ts"), col("c"))),
      Seq("symbol"), Seq(col("ts"), col("event_id")),
      "tc", "prev", date_trunc("day", col("ts")))

  private def dec38(c: Column): Column = c.cast("decimal(38,0)")

  private val tickCteSql =
    s"""$evCte,
       |t AS (SELECT user_id % 25 AS symbol, ts, event_id,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM ev WHERE event_type = 'view'),
       |l AS (SELECT symbol, ts, c,
       |    lag(ts) OVER w AS pts, lag(c) OVER w AS pc
       |  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Time-weighted average price per instrument: each inter-tick segment
    // [t_{i-1}, t_i) carries the PREVIOUS tick's price for its duration —
    // the irregular-sampling TWAP (a plain AVG over ticks overweights
    // bursts; TWAP is burst-invariant). Exact end to end: Σ(price·µs) in
    // DECIMAL(38,0) (DuckDB: HUGEINT — a year of µs × cents crosses 2⁶³
    // per segment at ~9·10⁴ cents), one integral division at the end
    // (both sides positive, so Spark `div` = DuckDB `//`).
    "q_x_twap" -> { (s, dir) =>
      withPrev(s, dir)
        .filter(col("prev").isNotNull)
        .select(col("symbol"),
          (unix_micros(col("ts")) - unix_micros(col("prev.ts"))).as("dur_us"),
          col("prev.c").as("pc"))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_segments"),
          sum(dec38(col("pc")) * col("dur_us")).as("pd"),
          sum(col("dur_us")).as("d"))
        .select(col("symbol"), col("n_segments"),
          expr("d div 1000000").as("total_dur_s"),
          expr("pd div d").as("twap_c"))
    },
    // Maximum drawdown per instrument: largest peak-to-trough loss as
    // exact basis points of the running peak — THE tail-risk number every
    // portfolio endpoint family carries. The running peak is
    // Ops.cumAggPerKey(max): per-(symbol, day) local running max + a
    // one-row-per-day handoff prefix max, so a hot instrument's history
    // never sorts on one reducer. (peak−c)·10⁴ div peak stays in BIGINT
    // (peak ≤ 10⁹ cents keeps the product < 2⁶³ by 9 orders).
    "q_x_drawdown" -> { (s, dir) =>
      Ops.cumAggPerKey(ticks(s, dir), Seq("symbol"),
          Seq(col("ts"), col("event_id")), "c", "peak",
          date_trunc("day", col("ts")), "max")
        .select(col("symbol"), col("c"), col("peak"),
          expr("((peak - c) * 10000) div peak").as("dd_bp"))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_ticks"),
          max(col("peak")).as("peak_c"),
          max(col("dd_bp")).as("max_drawdown_bp"))
    },
    // Realized volatility per instrument: sample variance of tick-to-tick
    // simple returns in exact basis points — the no-libm volatility
    // (log returns need ln(); bp simple returns stay integer, and the
    // variance runs the q_x_variance exact-moment form: n·Σr²−(Σr)² in
    // DECIMAL(38,0)/HUGEINT, ONE final double division). The bp return's
    // integer division must agree on NEGATIVE returns: Spark `div` and
    // DuckDB `//` both truncate toward zero (probed: −7//2 = −3 in both),
    // so bare div/… replays exactly; a floor-division form would diverge
    // on every losing tick.
    "q_x_realized_vol" -> { (s, dir) =>
      withPrev(s, dir)
        .filter(col("prev").isNotNull && col("prev.c") > 0)
        .select(col("symbol"), ((col("c") - col("prev.c")) * 10000L).as("num"),
          col("prev.c").as("pc"))
        .select(col("symbol"), expr("num div pc").as("r_bp"))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_returns"),
          sum(dec38(col("r_bp"))).as("s1"),
          sum(dec38(col("r_bp")) * col("r_bp")).as("s2"))
        .filter(col("n_returns") > 1)
        .select(col("symbol"), col("n_returns"),
          ((dec38(col("n_returns")) * col("s2") - col("s1") * col("s1")).cast("double") /
            (dec38(col("n_returns")) * (col("n_returns") - 1)).cast("double"))
            .as("var_bp2"))
    },
    // Daily OHLC candles per instrument — open/close as struct-extrema
    // AGGREGATES over the (ts, event_id) total tick order (Ops.ohlcBars),
    // not rank-1 windows: one map-side-combinable pass, so a hot symbol's
    // tick volume collapses per map task instead of serializing on a
    // reducer. Every fold is associative ⇒ StreamJobs.ohlcStream runs the
    // SAME kernel live and its drain ≡ this row by construction.
    "q_x_ohlc" -> { (s, dir) =>
      val t = ticks(s, dir)
        .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      Ops.ohlcBars(t, Seq("symbol", "day"), Seq(col("ts"), col("event_id")), "c")
    },
    // CUSUM changepoint per event stream: deviations stay mean-FREE
    // integers (n·x_t − Σx — the cross-multiplied idiom, no division),
    // their running sum peaks where the level shifts, and the
    // changepoint is the argmax of |cum| (ties → earliest day, pinned by
    // a struct extremum). The cumulative runs over the per-type DAILY
    // series — calendar-bounded, never corpus-bounded — after one
    // (type, day) aggregate absorbs the raw events map-side. The last
    // day's cum is identically 0 (n·Σx − n·Σx), a free internal check.
    "q_x_cusum" -> { (s, dir) =>
      val dl = dailyCents(s, dir)
      val tot = dl.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      dl.join(broadcast(tot), "event_type")
        .withColumn("dev", col("nd") * col("x") - col("sx"))
        .withColumn("cum", sum(col("dev")).over(w))
        .groupBy(col("event_type"), col("nd"))
        .agg(max(abs(col("cum"))).as("max_abs_dev"),
          min(struct((-abs(col("cum"))).as("__m"), col("d").as("__d")))
            .getField("__d").as("cp_day"))
        .select(col("event_type"), col("nd").as("n_days"),
          col("cp_day"), col("max_abs_dev"))
    },
    // Lag-1 / lag-7 autocorrelation of the daily series (the weekly-
    // seasonality detector beside q_x_seasonal_anomaly): Pearson r from
    // exact integer moments over calendar-aligned pairs — num and both
    // denominator pieces are BIGINTs (p·Σxy − ΣxΣy form), the only
    // floating steps are two IEEE-exact sqrts and one division, so the
    // double replays bit-for-bit. Series in whole units (cents div 100)
    // to keep p·Σx² far from the int64 edge at any plausible SF. Pairs
    // come from a calendar self-join (day + lag), so gaps in a type's
    // trading days drop pairs identically in both engines.
    "q_x_autocorr" -> { (s, dir) =>
      val dl = dailyCents(s, dir).withColumn("x", expr("x div 100"))
      def lagged(l: Int) = dl.as("a").join(dl.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.d") === date_add(col("a.d"), l))
        .select(col("a.event_type").as("event_type"), lit(l.toLong).as("lag"),
          col("a.x").as("xv"), col("b.x").as("yv"))
      lagged(1).unionByName(lagged(7))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("p"), sum(col("xv")).as("sx"),
          sum(col("yv")).as("sy"), sum(col("xv") * col("yv")).as("sxy"),
          sum(col("xv") * col("xv")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"))
        .select(col("event_type"), col("lag"), col("p").as("n_pairs"),
          (col("p") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("p") * col("sxx") - col("sx") * col("sx")).as("den1"),
          (col("p") * col("syy") - col("sy") * col("sy")).as("den2"))
        .withColumn("corr", when(col("den1") > 0 && col("den2") > 0,
          col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double")))))
    },
    // Lead–lag CROSS-correlation between the view and purchase daily
    // series — "does view volume lead purchase volume, and by how many
    // days?": Pearson r of (views_d, purchases_{d+k}) for k = 0..3 with
    // the q_x_autocorr exact-moment machinery generalized to two series
    // (Σy² now genuinely differs from Σx²). All BIGINT pieces, two IEEE
    // sqrts + one division per lag; calendar join ⇒ gaps drop pairs
    // identically in both engines.
    "q_x_cross_corr" -> { (s, dir) =>
      val dl = dailyCents(s, dir).withColumn("x", expr("x div 100"))
      val vx = dl.filter(col("event_type") === "view")
        .select(col("d"), col("x").as("xv"))
      val py = dl.filter(col("event_type") === "purchase")
        .select(col("d").as("dy"), col("x").as("yv"))
      def lagged(k: Int) = vx.join(py, col("dy") === date_add(col("d"), k))
        .select(lit(k.toLong).as("lag"), col("xv"), col("yv"))
      (0 to 3).map(lagged).reduce(_ unionByName _)
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("p"), sum(col("xv")).as("sx"),
          sum(col("yv")).as("sy"), sum(col("xv") * col("yv")).as("sxy"),
          sum(col("xv") * col("xv")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"))
        .select(col("lag"), col("p").as("n_pairs"),
          (col("p") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("p") * col("sxx") - col("sx") * col("sx")).as("den1"),
          (col("p") * col("syy") - col("sy") * col("sy")).as("den2"))
        .withColumn("corr", when(col("den1") > 0 && col("den2") > 0,
          col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double")))))
    },
    // Seasonal-naive vs naive-1 MEAN-error ratio (the MASE denominator
    // pair): mean|x_t − x_{t−7}| against mean|x_t − x_{t−1}| per stream,
    // cross-multiplied so no mean ever floats —
    // ratio_bp = Σ₇·n₁·10⁴ div (Σ₁·n₇); ratio < 10⁴ means last-week
    // beats yesterday as a forecast, i.e. the series has real weekly
    // structure (the actionable sibling of q_x_autocorr's lag-7 r). All
    // integers, one guarded division; calendar self-joins, gaps drop
    // pairs identically in both engines.
    "q_x_mase" -> { (s, dir) =>
      val dl = dailyCents(s, dir)
      def diffs(k: Int, nOut: String, sOut: String) = dl.as("a")
        .join(dl.as("b"), col("a.event_type") === col("b.event_type") &&
          col("b.d") === date_add(col("a.d"), k))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(count(lit(1)).as(nOut),
          sum(abs(col("b.x") - col("a.x"))).as(sOut))
      diffs(1, "n1", "sum_abs_d1").join(diffs(7, "n7", "sum_abs_d7"), "event_type")
        .select(col("event_type"), col("n1"), col("sum_abs_d1"),
          col("n7"), col("sum_abs_d7"),
          when(col("sum_abs_d1") > 0 && col("n7") > 0,
            expr("sum_abs_d7 * n1 * 10000 div (sum_abs_d1 * n7)")).as("ratio_bp"))
    }
  )

  /** Per-(event_type, day) cents totals — the shared daily series under
    * the CUSUM and autocorrelation rows. One keyed aggregate; map-side
    * combine absorbs the raw event volume at any scale.
    */
  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    Ops.dailyTypeCents(Tables.events(s, dir))

  private val dailyCteSql =
    s"""$evCte,
       |dd AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev),
       |dl AS (SELECT event_type, d, CAST(sum(c) AS BIGINT) AS x
       |  FROM dd GROUP BY 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_x_twap" ->
      s"""WITH $tickCteSql
         |SELECT symbol, count(*) AS n_segments,
         |  CAST(sum(epoch_us(ts) - epoch_us(pts)) // 1000000 AS BIGINT) AS total_dur_s,
         |  CAST(sum(CAST(pc AS HUGEINT) * (epoch_us(ts) - epoch_us(pts)))
         |    // sum(epoch_us(ts) - epoch_us(pts)) AS BIGINT) AS twap_c
         |FROM l WHERE pts IS NOT NULL
         |GROUP BY symbol""".stripMargin,
    "q_x_drawdown" ->
      s"""WITH $evCte,
         |t AS (SELECT user_id % 25 AS symbol, ts, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM ev WHERE event_type = 'view'),
         |r AS (SELECT symbol, c,
         |    max(c) OVER (PARTITION BY symbol ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM t)
         |SELECT symbol, count(*) AS n_ticks, max(peak) AS peak_c,
         |  max(((peak - c) * 10000) // peak) AS max_drawdown_bp
         |FROM r GROUP BY symbol""".stripMargin,
    "q_x_realized_vol" ->
      s"""WITH $tickCteSql,
         |r AS (SELECT symbol, ((c - pc) * 10000) // pc AS r_bp
         |  FROM l WHERE pts IS NOT NULL AND pc > 0),
         |m AS (SELECT symbol, count(*) AS n_returns,
         |    sum(CAST(r_bp AS HUGEINT)) AS s1,
         |    sum(CAST(r_bp AS HUGEINT) * r_bp) AS s2
         |  FROM r GROUP BY symbol)
         |SELECT symbol, n_returns,
         |  CAST(n_returns * s2 - s1 * s1 AS DOUBLE)
         |    / CAST(CAST(n_returns AS HUGEINT) * (n_returns - 1) AS DOUBLE) AS var_bp2
         |FROM m WHERE n_returns > 1""".stripMargin,
    // rank-1 windows replay the struct-extrema endpoints: first/last by
    // the identical (ts, event_id) total order
    "q_x_ohlc" ->
      s"""WITH $evCte,
         |t AS (SELECT user_id % 25 AS symbol,
         |    CAST(date_trunc('day', ts) AS DATE) AS day, ts, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         |  FROM ev WHERE event_type = 'view'),
         |w AS (SELECT symbol, day, c,
         |    row_number() OVER (PARTITION BY symbol, day
         |      ORDER BY ts, event_id) AS rna,
         |    row_number() OVER (PARTITION BY symbol, day
         |      ORDER BY ts DESC, event_id DESC) AS rnd
         |  FROM t)
         |SELECT symbol, day,
         |  min(CASE WHEN rna = 1 THEN c END) AS open_c,
         |  max(c) AS high_c, min(c) AS low_c,
         |  min(CASE WHEN rnd = 1 THEN c END) AS close_c,
         |  count(*) AS n_ticks, CAST(sum(c) AS BIGINT) AS vol_c
         |FROM w GROUP BY 1, 2""".stripMargin,
    // the same mean-free integer deviations, running sum, and
    // (|cum| DESC, day ASC) argmax
    "q_x_cusum" ->
      s"""WITH $dailyCteSql,
         |t AS (SELECT event_type, count(*) AS nd, CAST(sum(x) AS BIGINT) AS sx
         |  FROM dl GROUP BY 1),
         |v AS (SELECT dl.event_type, dl.d, t.nd, t.nd * dl.x - t.sx AS dev
         |  FROM dl JOIN t USING (event_type)),
         |cu AS (SELECT event_type, d, nd,
         |    CAST(sum(dev) OVER (PARTITION BY event_type ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM v),
         |rk AS (SELECT event_type, nd, d, abs(cum) AS ac,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY abs(cum) DESC, d ASC) AS rn,
         |    max(abs(cum)) OVER (PARTITION BY event_type) AS mx
         |  FROM cu)
         |SELECT event_type, nd AS n_days, d AS cp_day, mx AS max_abs_dev
         |FROM rk WHERE rn = 1""".stripMargin,
    // identical whole-unit series, calendar lag join, and exact-moment
    // Pearson pieces; the corr double goes through the same two IEEE
    // sqrts and one division
    "q_x_autocorr" ->
      s"""WITH $dailyCteSql,
         |d2 AS (SELECT event_type, d, x // 100 AS x FROM dl),
         |pr AS (SELECT a.event_type, l.lag, a.x AS xv, b.x AS yv
         |  FROM d2 a
         |  CROSS JOIN (VALUES (1), (7)) AS l(lag)
         |  JOIN d2 b ON b.event_type = a.event_type AND b.d = a.d + l.lag),
         |m AS (SELECT event_type, CAST(lag AS BIGINT) AS lag, count(*) AS p,
         |    CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         |    CAST(sum(xv * yv) AS BIGINT) AS sxy,
         |    CAST(sum(xv * xv) AS BIGINT) AS sxx,
         |    CAST(sum(yv * yv) AS BIGINT) AS syy
         |  FROM pr GROUP BY 1, 2)
         |SELECT event_type, lag, p AS n_pairs,
         |  p * sxy - sx * sy AS num,
         |  p * sxx - sx * sx AS den1,
         |  p * syy - sy * sy AS den2,
         |  CASE WHEN p * sxx - sx * sx > 0 AND p * syy - sy * sy > 0
         |    THEN CAST(p * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(p * sxx - sx * sx AS DOUBLE))
         |         * sqrt(CAST(p * syy - sy * sy AS DOUBLE)))
         |  END AS corr
         |FROM m""".stripMargin,
    // the two-series exact-moment pieces over the same calendar lag join
    "q_x_cross_corr" ->
      s"""WITH $dailyCteSql,
         |d2 AS (SELECT event_type, d, x // 100 AS x FROM dl),
         |vx AS (SELECT d, x AS xv FROM d2 WHERE event_type = 'view'),
         |py AS (SELECT d AS dy, x AS yv FROM d2 WHERE event_type = 'purchase'),
         |pr AS (SELECT l.lag, vx.xv, py.yv
         |  FROM vx CROSS JOIN (VALUES (0), (1), (2), (3)) AS l(lag)
         |  JOIN py ON py.dy = vx.d + l.lag),
         |m AS (SELECT CAST(lag AS BIGINT) AS lag, count(*) AS p,
         |    CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         |    CAST(sum(xv * yv) AS BIGINT) AS sxy,
         |    CAST(sum(xv * xv) AS BIGINT) AS sxx,
         |    CAST(sum(yv * yv) AS BIGINT) AS syy
         |  FROM pr GROUP BY 1)
         |SELECT lag, p AS n_pairs,
         |  p * sxy - sx * sy AS num,
         |  p * sxx - sx * sx AS den1,
         |  p * syy - sy * sy AS den2,
         |  CASE WHEN p * sxx - sx * sx > 0 AND p * syy - sy * sy > 0
         |    THEN CAST(p * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(p * sxx - sx * sx AS DOUBLE))
         |         * sqrt(CAST(p * syy - sy * sy AS DOUBLE)))
         |  END AS corr
         |FROM m""".stripMargin,
    // the same two calendar self-joins and the cross-multiplied
    // mean-error ratio
    "q_x_mase" ->
      s"""WITH $dailyCteSql,
         |d1 AS (SELECT a.event_type, count(*) AS n1,
         |    CAST(sum(abs(b.x - a.x)) AS BIGINT) AS s1
         |  FROM dl a JOIN dl b
         |    ON b.event_type = a.event_type AND b.d = a.d + 1 GROUP BY 1),
         |d7 AS (SELECT a.event_type, count(*) AS n7,
         |    CAST(sum(abs(b.x - a.x)) AS BIGINT) AS s7
         |  FROM dl a JOIN dl b
         |    ON b.event_type = a.event_type AND b.d = a.d + 7 GROUP BY 1)
         |SELECT d1.event_type, d1.n1, d1.s1 AS sum_abs_d1,
         |  d7.n7, d7.s7 AS sum_abs_d7,
         |  CASE WHEN d1.s1 > 0 AND d7.n7 > 0
         |    THEN d7.s7 * d1.n1 * 10000 // (d1.s1 * d7.n7) END AS ratio_bp
         |FROM d1 JOIN d7 USING (event_type)""".stripMargin
  )
}
