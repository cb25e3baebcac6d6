package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** SURVEY.md §2.5 — the aggregation inventory (A1–A11).
  *
  * All sums over doubles go through DECIMAL (exact, order-independent) and
  * come out as doubles; ratios are computed as double/double at the end so
  * both engines do the identical IEEE division. Every agg here is a
  * map-side-combinable hash aggregate — no sort-based paths, no driver
  * collects — and the only global-order windows run over already-aggregated
  * (small) day/hour rollups.
  */
object AggQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  /** events with µs-truncated ts; oracle side mirrors this with a CTE. */
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: scalar COUNT/SUM bundle over a time range — the PL_State input
    // pattern (reference: ls_opening.rs:194-258 and 6 sibling DAOs).
    "q_a1_scalar_range" -> { (s, dir) =>
      ev(s, dir)
        .filter(col("ts") > lit("2024-01-08").cast("timestamp") &&
          col("ts") <= lit("2024-01-15").cast("timestamp"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
          sum(when(col("event_type") === "purchase", dec("value"))).cast("double").as("purchase_volume"),
          count(when(col("event_type") === "signup", 1)).as("n_signups"),
          countDistinct(col("user_id")).as("n_users"))
    },
    // A3: AVG/MAX/MIN stats per group (reference: ls_state.rs:761-797).
    // avg is sum(decimal)→double / count so both engines divide identically.
    "q_a3_stats" -> { (s, dir) =>
      Tables.part(s, dir)
        .groupBy(col("p_type"))
        .agg(
          (sum(dec("p_retailprice")).cast("double") / count(lit(1))).as("avg_price"),
          max(col("p_retailprice")).as("max_price"),
          min(col("p_retailprice")).as("min_price"),
          count(lit(1)).as("n_parts"))
    },
    // A4+U3: monthly active users over a UNION of activity streams
    // (reference: ls_opening.rs:1234-1251 five-stream COUNT(DISTINCT)).
    "q_a4_monthly_active" -> { (s, dir) =>
      val e = ev(s, dir)
      val streams = e.filter(col("event_type") === "purchase").select(col("ts"), col("user_id"))
        .unionByName(e.filter(col("event_type") === "signup").select(col("ts"), col("user_id")))
        .unionByName(e.filter(col("event_type") === "click").select(col("ts"), col("user_id")))
      streams
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    },
    // A4 at scale: HLL sketch distinct — the 100 TB tier of q_a4 where exact
    // per-month distinct would shuffle every user id. No SQL oracle (sketches
    // differ across engines); the driver records a rows-only check, and the
    // exact twin above is the correctness anchor.
    "q_a4_approx_active" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_active"))
    },
    // A5: conditional aggregation — MAX(CASE WHEN), SUM(CASE WHEN) → flag
    // (reference: ls_repayment.rs:252-265).
    "q_a5_conditional" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase_ts"),
          when(sum(when(col("event_type") === "error", 1).otherwise(0)) > 0, "yes")
            .otherwise("no").as("has_errors"),
          count(lit(1)).as("n_events"))
    },
    // A6: weighted average with NULLIF divide-guard
    // (reference: net-interest lp_pool_state.rs:474-495).
    "q_a6_weighted_avg" -> { (s, dir) =>
      // Integer-unit weighted sum (the earn-APR pattern): priceU·qtyU is a
      // scale-4 LONG (~3e13 per pool; lines-per-supplier is roughly
      // SF-invariant in this schema, so the margin to 2^53 holds across
      // SFs), so the 128-bit decimal sum becomes a long sum and every
      // double derives from the exact integer by one correctly-rounded
      // power-of-ten division — bit-identical to the decimal form below
      // 2^53, and Ops.exactDouble raises loudly rather than letting the
      // cast round silently past it.
      val qtyU = (dec("l_quantity") * 100).cast("long")
      val priceU = (dec("l_extendedprice") * 100).cast("long")
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(
          ((Ops.exactDouble(sum(priceU * qtyU)) / 1e4) /
            nullif(Ops.exactDouble(sum(qtyU)) / 1e2, lit(0.0))).as("weighted_avg_price"),
          count(lit(1)).as("n_lines"))
    },
    // A7+U8: bucketed histogram with a static bucket dimension LEFT JOINed so
    // empty buckets still appear (reference: ls_state.rs:243-289,
    // raw_message.rs:243-350).
    "q_a7_histogram" -> { (s, dir) =>
      import s.implicits._
      val buckets = Seq(
        (1, "0-100k"), (2, "100k-200k"), (3, "200k-300k"), (4, "300k-400k"), (5, "400k+")
      ).toDF("bucket_id", "bucket")
      val bucketed = Tables.orders(s, dir)
        .withColumn("bucket_id",
          when(col("o_totalprice") < 100000, 1)
            .when(col("o_totalprice") < 200000, 2)
            .when(col("o_totalprice") < 300000, 3)
            .when(col("o_totalprice") < 400000, 4)
            .otherwise(5))
        .groupBy(col("bucket_id")).agg(count(lit(1)).as("n"))
      buckets.join(bucketed, Seq("bucket_id"), "left")
        .select(col("bucket_id"), col("bucket"), coalesce(col("n"), lit(0L)).as("n_orders"))
    },
    // A8: ARRAY_AGG(x)[1] with pinned ordering → min_by on a unique tiebreak
    // (reference: first collected symbol ls_opening.rs:1722-1726; ordering
    // pinned per SURVEY §7.4#5).
    "q_a8_first_elem" -> { (s, dir) =>
      // l_linenumber is NOT unique per order in this dataset, so the tiebreak
      // folds the partkey into the ordering key (composite numeric key — both
      // engines support only scalar arg_min/min_by orderings). 2^33 keeps the
      // encoding order-correct for partkeys up to ~8.5e9 (TPC-H SF ~40k).
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(min_by(col("l_partkey"),
            col("l_linenumber").cast("long") * 8589934592L + col("l_partkey")).as("first_partkey"),
          count(lit(1)).as("n_lines"))
    },
    // A9: floor-at-zero aggregation (reference: SUM(GREATEST(earnings,0))
    // lp_pool_state.rs:390-392).
    "q_a9_greatest_floor" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(greatest(dec("value") - lit(50).cast("decimal(18,2)"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("sum_over_50"))
    },
    // A10+W4: aggregate-of-aggregate — daily revenue plus running cumulative
    // (reference: SUM(SUM(x)) OVER (ORDER BY day), tr_profit.rs:214-231).
    // The window runs over the ~2.4k-row daily rollup, not the fact table.
    "q_a10_daily_cumulative" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(dec("o_totalprice")).as("daily_rev"))
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("day"), col("daily_rev"),
          sum(col("daily_rev")).over(w).as("cum_rev"))
        .select(col("day").cast("date").as("day"),
          col("daily_rev").cast("double").as("daily_rev"),
          col("cum_rev").cast("double").as("cum_rev"))
    },
    // A11+U7: signed union-aggregate — net flow per user as Σ(+purchase)
    // −Σ(error) (reference: net lease amount via UNION ALL of ± amounts,
    // ls_loan_closing.rs:46-78).
    "q_a11_signed_union" -> { (s, dir) =>
      val e = ev(s, dir)
      val pos = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), dec("value").as("amt"))
      val neg = e.filter(col("event_type") === "error")
        .select(col("user_id"), (-dec("value")).as("amt"))
      pos.unionByName(neg)
        .groupBy(col("user_id"))
        .agg(sum(col("amt")).cast("double").as("net_value"))
    },
    // Sample variance per event type, exact-rational: values become exact
    // integer CENTS (the decimal(18,2) house cast × 100 → LONG), the
    // textbook (n·Σc² − (Σc)²)/(n(n−1)) runs in DECIMAL(38,0) — the
    // cross-products pass 2^63 around sf1 (n≈2·10⁴, Σc²≈2·10¹⁶ per
    // group), where DuckDB is already in HUGEINT — and ONE final double
    // division (÷10⁴ folded into the denominator) lands the result.
    // stddev is deliberately NOT emitted: sqrt is libm, not
    // bit-specified across engines; consumers take the root themselves.
    // Shuffle shape: three plain sums with map-side partial aggregation —
    // the mergeable-moments form (count/Σ/Σ²), same contract as
    // approx-sketch tiers.
    // 3σ outlier detection WITHOUT sqrt — the data-cleaning companion to
    // q_x_variance: |x−μ| > 3σ is squared into the all-integer test
    // (n−1)·(n·x−S1)² > 9·n·(n·S2−S1²) over exact cents, so the whole
    // derivation is exact arithmetic end-to-end (sqrt is libm and never
    // needed for a THRESHOLD decision). Group moments ride a broadcast
    // join back onto the rows; DECIMAL(38,0) carries the ~10²⁵ cross
    // terms (DuckDB: HUGEINT). Emits the outlier rows.
    // Exactness ceiling: the cross terms need ~n³·c² digits — (n−1)·dev²
    // passes DECIMAL(38,0)/HUGEINT around 3·10⁹ rows PER GROUP (≈10¹²
    // events over a few hundred types). Beyond that, divide the test
    // through by n (rational) or take the double var from q_x_variance
    // and the plain |x−μ| > 3σ — the exact-integer form is the
    // oracle-checkable tier, not the only one.
    "q_x_outliers" -> { (s, dir) =>
      val cents = (dec("value") * 100).cast("long")
      val rows = ev(s, dir).select(col("event_id"), col("event_type"), cents.as("c"))
      val moments = rows.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("s1"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
        .filter(col("n") > 1)
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val dev = d(col("n")) * d(col("c")) - col("s1")
      rows.join(broadcast(moments), Seq("event_type"))
        .filter((d(col("n")) - 1) * dev * dev >
          d(lit(9)) * d(col("n")) * (d(col("n")) * col("s2") - col("s1") * col("s1")))
        .select(col("event_id"), col("event_type"), col("c").as("cents"))
    },
    "q_x_variance" -> { (s, dir) =>
      val cents = (dec("value") * 100).cast("long")
      // moments accumulate in DECIMAL(38,0) (DuckDB: HUGEINT) — a LONG
      // Σc² crosses 2^63 around 3·10⁹ rows per group, inside the design
      // scale; the denominator likewise (n·(n−1)·10⁴ passes 2^63 at
      // n≈3·10⁷)
      ev(s, dir)
        .select(col("event_type"), cents.as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast("decimal(38,0)")).as("s1"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
        .filter(col("n") > 1)
        .select(col("event_type"), col("n"),
          ((col("n").cast("decimal(38,0)") * col("s2") -
            col("s1") * col("s1")).cast("double") /
            (col("n").cast("decimal(38,0)") * (col("n") - 1) * 10000L)
              .cast("double")).as("var_value"))
    },
    // Exact-moment OLS: covariance, regression slope and intercept of
    // price-on-quantity per return flag — the q_x_variance convention
    // extended to BIVARIATE moments (n, Σx, Σy, Σxy, Σx² in
    // DECIMAL(38,0)/HUGEINT; sqrt-free, so correlation's denominator is
    // deliberately NOT emitted — slope and covariance carry the same
    // information without libm). The three outputs are IEEE doubles
    // derived from exact integers by the identical expression tree on
    // both engines; intercept reuses the slope SUBEXPRESSION, so the two
    // divisions round once each, identically. One map-side-combinable
    // aggregate over 3 groups — the mergeable-moments shuffle shape.
    "q_x_regression" -> { (s, dir) =>
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_quantity").cast("bigint").as("x"),
          (dec("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
          sum(d38(col("x")) * col("y")).as("sxy"),
          sum(d38(col("x")) * col("x")).as("sxx"))
        .filter(col("n") > 1)
        .select(Seq(col("l_returnflag"), col("n")) ++ {
          val num = d38(col("n")) * col("sxy") - col("sx") * col("sy")
          val slope = num.cast("double") /
            (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
          Seq(
            (num.cast("double") /
              (d38(col("n")) * (col("n") - 1)).cast("double")).as("cov_c"),
            slope.as("slope_c_per_unit"),
            ((col("sy").cast("double") - slope * col("sx").cast("double")) /
              col("n").cast("double")).as("intercept_c"))
        }: _*)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_a1_scalar_range" ->
      s"""WITH $evCte
         |SELECT
         |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_volume,
         |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signups,
         |  count(DISTINCT user_id) AS n_users
         |FROM ev
         |WHERE ts > TIMESTAMP '2024-01-08' AND ts <= TIMESTAMP '2024-01-15'""".stripMargin,
    "q_a3_stats" ->
      """SELECT p_type,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  max(p_retailprice) AS max_price,
        |  min(p_retailprice) AS min_price,
        |  count(*) AS n_parts
        |FROM part GROUP BY p_type""".stripMargin,
    "q_a4_monthly_active" ->
      s"""WITH $evCte,
         |streams AS (
         |  SELECT ts, user_id FROM ev WHERE event_type = 'purchase'
         |  UNION ALL SELECT ts, user_id FROM ev WHERE event_type = 'signup'
         |  UNION ALL SELECT ts, user_id FROM ev WHERE event_type = 'click')
         |SELECT strftime(ts, '%Y-%m') AS month, count(DISTINCT user_id) AS active_users
         |FROM streams GROUP BY 1""".stripMargin,
    "q_a5_conditional" ->
      s"""WITH $evCte
         |SELECT user_id,
         |  max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase_ts,
         |  CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0
         |       THEN 'yes' ELSE 'no' END AS has_errors,
         |  count(*) AS n_events
         |FROM ev GROUP BY user_id""".stripMargin,
    "q_a6_weighted_avg" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE)
        |    / nullif(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS weighted_avg_price,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q_a7_histogram" ->
      """WITH buckets(bucket_id, bucket) AS (
        |  VALUES (1,'0-100k'),(2,'100k-200k'),(3,'200k-300k'),(4,'300k-400k'),(5,'400k+')),
        |bucketed AS (
        |  SELECT CASE WHEN o_totalprice < 100000 THEN 1
        |              WHEN o_totalprice < 200000 THEN 2
        |              WHEN o_totalprice < 300000 THEN 3
        |              WHEN o_totalprice < 400000 THEN 4
        |              ELSE 5 END AS bucket_id, count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT bucket_id, bucket, coalesce(n, 0) AS n_orders
        |FROM buckets LEFT JOIN bucketed USING (bucket_id)""".stripMargin,
    "q_a8_first_elem" ->
      """SELECT l_orderkey,
        |  arg_min(l_partkey, CAST(l_linenumber AS BIGINT) * 8589934592 + l_partkey) AS first_partkey,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    // NB: DuckDB's greatest() promotes DECIMAL args to DOUBLE (inexact sum);
    // the oracle uses the equivalent CASE WHEN to stay in DECIMAL.
    "q_a9_greatest_floor" ->
      s"""WITH $evCte
         |SELECT event_type,
         |  CAST(sum(CASE WHEN CAST(value AS DECIMAL(18,2)) - 50 > 0
         |                THEN CAST(value AS DECIMAL(18,2)) - 50
         |                ELSE CAST(0 AS DECIMAL(19,2)) END) AS DOUBLE) AS sum_over_50
         |FROM ev GROUP BY event_type""".stripMargin,
    "q_a10_daily_cumulative" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS daily_rev
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(daily_rev AS DOUBLE) AS daily_rev,
        |  CAST(sum(daily_rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
        |FROM daily""".stripMargin,
    "q_a11_signed_union" ->
      s"""WITH $evCte,
         |flows AS (
         |  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS amt FROM ev WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, -CAST(value AS DECIMAL(18,2)) AS amt FROM ev WHERE event_type = 'error')
         |SELECT user_id, CAST(sum(amt) AS DOUBLE) AS net_value
         |FROM flows GROUP BY user_id""".stripMargin,
    // the all-integer squared test; HUGEINT carries the ~10²⁵ cross terms
    // (a bare BIGINT product would overflow-throw around n·S2)
    "q_x_outliers" ->
      s"""WITH $evCte,
         |c AS (SELECT event_id, event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev),
         |m AS (SELECT event_type, count(*) AS n, sum(c) AS s1, sum(c*c) AS s2
         |  FROM c GROUP BY event_type HAVING count(*) > 1)
         |SELECT c.event_id, c.event_type, c.c AS cents
         |FROM c JOIN m USING (event_type)
         |WHERE CAST(m.n - 1 AS HUGEINT)
         |    * (CAST(m.n AS HUGEINT) * c.c - m.s1)
         |    * (CAST(m.n AS HUGEINT) * c.c - m.s1)
         |  > 9 * CAST(m.n AS HUGEINT)
         |    * (CAST(m.n AS HUGEINT) * m.s2 - CAST(m.s1 AS HUGEINT) * m.s1)""".stripMargin,
    // integer-cents moments; DuckDB's HUGEINT sums play Spark's
    // DECIMAL(38,0) — both exact, both correctly rounded to double once
    "q_x_variance" ->
      s"""WITH $evCte,
         |c AS (SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM ev)
         |SELECT event_type, count(*) AS n,
         |  CAST(count(*) * sum(c*c) - sum(c)*sum(c) AS DOUBLE)
         |    / CAST(CAST(count(*) AS HUGEINT) * (count(*) - 1) * 10000 AS DOUBLE) AS var_value
         |FROM c GROUP BY event_type HAVING count(*) > 1""".stripMargin,
    // bivariate moments in HUGEINT; the slope subexpression is repeated
    // literally inside intercept so both engines round the same way twice
    "q_x_regression" ->
      """WITH b AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS cov_c,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_c_per_unit,
        |  (CAST(sy AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_c
        |FROM m WHERE n > 1""".stripMargin
  )
}
