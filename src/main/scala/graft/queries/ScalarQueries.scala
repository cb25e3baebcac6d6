package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** SURVEY.md §2.9 — scalar function families: date/time (scaffold, minute
  * buckets), math (decimal shift, compound APR, rounding), conditional
  * ladders, string ops, JSON extraction (B12).
  *
  * Transcendental math (`pow`) is rounded to 6 decimals on output: libm
  * implementations may differ by 1 ulp between engines, and rounding washes
  * that out while keeping the semantics honest.
  */
object ScalarQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private val evCte =
    "ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value, props FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9 date: generate_series scaffold LEFT JOINed to daily counts so
    // zero-activity days appear (reference: ls_opening.rs:1321-1335).
    "q_s_date_scaffold" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val bounds = o.agg(
        date_trunc("day", min(col("o_orderdate"))).as("lo"),
        date_trunc("day", max(col("o_orderdate"))).as("hi"))
      val days = Ops.dateScaffold(bounds, col("lo"), col("hi"), "day")
      val daily = o.groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      days.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
    },
    // §2.9 date: fixed-size minute buckets via hour-trunc + floored minutes
    // (reference: mp_asset.rs:71 price downsampling).
    "q_s_minute_bucket" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("bucket",
          expr("date_trunc('hour', ts) + make_interval(0, 0, 0, 0, 0, (minute(ts) div 5) * 5, 0)"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("bucket_value"))
    },
    // B3: decimal-shift normalization amount * 10^(d1-d2)
    // (reference: mp_assets.rs:72-98; SQL twin POWER(10,dec) ls_opening.rs:434).
    "q_s_decimal_norm" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_partkey"),
          (col("l_extendedprice") * pow(lit(10.0), -(col("p_size") % 4).cast("double")))
            .as("normalized_amount"))
        .filter(col("l_orderkey") < 200)
    },
    // B11: compound APR (POWER(1+apr/36500,365)-1)*100
    // (reference: ls_opening.rs:501-503, lp_pool_state.rs:514-517).
    "q_s_apr_compound" -> { (s, dir) =>
      Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          round((pow(lit(1.0) + col("s_acctbal") / 3650000.0, 365) - 1.0) * 100.0, 6)
            .as("compound_apy"))
    },
    // §2.9 conditional + string: CASE ladder label, COALESCE chain, concat
    // with suffix (reference: '(Short)' labels ls_opening.rs:412-415,1407;
    // COALESCE chains ls_opening.rs:998,1123).
    "q_s_case_concat" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "Filled")
            .when(col("o_orderstatus") === "O", "Open")
            .otherwise("Pending").as("status_label"),
          concat(col("o_orderpriority"), lit(" (priority)")).as("tagged"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("?")).as("coalesced"))
        .filter(col("o_orderkey") < 500)
    },
    // §2.9 array: `value != ALL(array)` — membership negation over a real
    // array column (reference: currency != ALL(excluded_symbols) filters);
    // docs whose token array never contains the probe word.
    "q_s_array_notall" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
        .filter(!array_contains(col("toks"), "the"))
        .select(col("doc_id"), size(col("toks")).as("n_tokens"))
    },
    // B12: event attribute extraction from the JSON props payload
    // (reference: attr map → typed row event_parsing.rs:313-327; our props
    // column plays the raw attribute bag).
    "q_b12_json_props" -> { (s, dir) =>
      ev(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_s_date_scaffold" ->
      """WITH bounds AS (
        |  SELECT date_trunc('day', min(o_orderdate)) AS lo,
        |         date_trunc('day', max(o_orderdate)) AS hi FROM orders),
        |days AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds),
        |daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT day, coalesce(n, 0) AS n_orders
        |FROM days LEFT JOIN daily USING (day)""".stripMargin,
    "q_s_minute_bucket" ->
      s"""WITH $evCte
         |SELECT event_type,
         |  date_trunc('hour', ts) + to_minutes((extract(minute FROM ts)::INT // 5) * 5) AS bucket,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
         |FROM ev GROUP BY 1, 2""".stripMargin,
    "q_s_decimal_norm" ->
      """SELECT l_orderkey, l_partkey,
        |  l_extendedprice * power(10.0, -CAST(p_size % 4 AS DOUBLE)) AS normalized_amount
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_orderkey < 200""".stripMargin,
    "q_s_apr_compound" ->
      """SELECT s_suppkey,
        |  round((power(1.0 + s_acctbal / 3650000.0, 365) - 1.0) * 100.0, 6) AS compound_apy
        |FROM supplier""".stripMargin,
    "q_s_case_concat" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'Filled'
        |       WHEN o_orderstatus = 'O' THEN 'Open'
        |       ELSE 'Pending' END AS status_label,
        |  o_orderpriority || ' (priority)' AS tagged,
        |  coalesce(nullif(o_orderstatus, 'P'), '?') AS coalesced
        |FROM orders WHERE o_orderkey < 500""".stripMargin,
    "q_s_array_notall" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_tokens FROM w
        |WHERE NOT list_contains(ws, 'the')""".stripMargin,
    "q_b12_json_props" ->
      s"""WITH $evCte
         |SELECT event_type,
         |  CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_mod,
         |  count(*) AS n,
         |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k
         |FROM ev GROUP BY 1, 2""".stripMargin
  )
}
