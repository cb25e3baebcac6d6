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
    }
  )

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
         |FROM m WHERE n_returns > 1""".stripMargin
  )
}
