package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2.3 — projections, filters, predicate patterns (P1–P7).
  *
  * The reference's `NOW()`-relative windows (P3) are parameterized on a
  * deterministic "as of" anchor = the dataset's max timestamp, obtained via a
  * 1-row cross join (same technique as its `CROSS JOIN LatestAggregation`,
  * J4) — never a driver-side collect.
  */
object FilterQueries {

  /** P7: the reference's dynamic WHERE builder (ls_opening.rs:1510-1531) —
    * compose a time-window predicate from optional (days-back, from) params
    * against an `asOf` anchor column.
    */
  def timeWindow(ts: Column, asOf: Column, daysBack: Option[Int], from: Option[Column]): Column = {
    val lower = (daysBack, from) match {
      case (_, Some(f))    => ts > f
      case (Some(d), None) => ts >= asOf - expr(s"INTERVAL $d DAYS")
      case (None, None)    => lit(true)
    }
    lower && ts <= asOf
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P2: explicit projection with aliases + closed time-range predicate
    // (reference: ls_state.rs:79-101 21-col list; ts > $1 AND ts <= $2).
    "q_p1_project_range" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
        .select(
          col("l_orderkey").as("okey"),
          col("l_partkey").as("pkey"),
          col("l_linenumber").as("line_no"),
          col("l_quantity").as("qty"),
          col("l_extendedprice").as("price"),
          col("l_shipdate").as("ship_ts"))
    },
    // P4+P6: IN-list + null-guard / threshold predicates
    // (reference: `IN (...)` ls_opening.rs:671; `> 0` guards ls_state.rs:229).
    "q_p4_inlist" -> { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    },
    // P5: case-insensitive pattern search with NULL-skip
    // (reference: ILIKE '%' || $2 || '%' ls_opening.rs:762-765).
    "q_p5_ilike" -> { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").isNotNull && lower(col("p_name")).contains("ge"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
    },
    // P3+P7: relative-time predicate off a deterministic asOf anchor
    // (reference: ts >= NOW() - INTERVAL 'n days' ls_opening.rs:348,934).
    "q_p3_relative_window" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(max(col("ts")).as("as_of"))
      ev.crossJoin(anchor)
        .filter(timeWindow(col("ts"), col("as_of"), Some(7), None))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_p1_project_range" ->
      """SELECT l_orderkey AS okey, l_partkey AS pkey, l_linenumber AS line_no,
        |  l_quantity AS qty, l_extendedprice AS price, l_shipdate AS ship_ts
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1997-01-01' AND l_shipdate <= TIMESTAMP '1997-12-31'""".stripMargin,
    "q_p4_inlist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice > 100000.0""".stripMargin,
    "q_p5_ilike" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE p_name IS NOT NULL AND lower(p_name) LIKE '%ge%'
        |GROUP BY p_brand""".stripMargin,
    "q_p3_relative_window" ->
      """WITH ev AS (SELECT event_type, value, date_trunc('microseconds', ts) AS ts FROM events),
        |anchor AS (SELECT max(ts) AS as_of FROM ev)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM ev CROSS JOIN anchor
        |WHERE ts >= as_of - INTERVAL 7 DAY AND ts <= as_of
        |GROUP BY event_type""".stripMargin
  )
}
