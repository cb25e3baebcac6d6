package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-introspection operators: per-column profiling (the "describe
  * my table" primitive every pipeline starts from) and UNPIVOT — the
  * inverse of q_x_pivot's wide rotation, completing the reshape pair.
  */
object ProfileQueries {

  /** Canonical cross-engine string form per type: doubles through
    * DECIMAL(18,2) (both engines print a decimal as plain digits, where
    * raw double→string formatting is engine-private), timestamps through
    * an explicit pattern, everything else via plain cast.
    */
  private def canon(c: Column, dt: String): Column = dt match {
    case "double" => c.cast("decimal(18,2)").cast("string")
    case "timestamp" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  private val profCols = Seq( // (name, type) of the orders columns profiled
    ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
    ("o_orderstatus", "string"), ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"), ("o_orderpriority", "string"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-column table profile: one output row per column with row/null/
    // distinct counts and canonical min/max strings. ONE pass over the
    // table: a single wide aggregate computes every column's metrics
    // (the multi-countDistinct plans one Expand — input ×6 in the
    // map stage, still one scan and one shuffle, vs six scans for six
    // queries), then the wide row explodes to the per-column layout.
    // Production tier at 100 TB: swap countDistinct for
    // approx_count_distinct (HLL partials, no Expand) — the A4 pattern;
    // exact here so the oracle can check every cell.
    "q_x_profile" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val aggs = count(lit(1)).as("n_rows") +: profCols.flatMap { case (c, dt) =>
        Seq(count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"),
          canon(min(col(c)), dt).as(s"${c}__min"),
          canon(max(col(c)), dt).as(s"${c}__max"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val structs = array(profCols.map { case (c, _) =>
        struct(lit(c).as("column_name"), col(s"${c}__nulls").as("n_null"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"))
      }: _*)
      wide.select(col("n_rows"), explode(structs).as("p"))
        .select(col("p.column_name"), col("n_rows"), col("p.n_null"),
          col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
    },
    // Equi-depth (equal-frequency) histogram of event values per type:
    // NTILE(10) deciles over integer cents with per-decile count and
    // exact [lo, hi] bounds — the complement of q_a7_histogram's
    // equi-WIDTH buckets (fixed edges, skewed counts; equi-depth gives
    // fixed counts, data-driven edges — what an optimizer's statistics
    // or a fair SLA banding wants). Partitioned by event_type so no
    // global single-reducer sort (the q_x_ntile rule); (cents,
    // event_id) is tie-free, and NTILE's big-buckets-first split is
    // SQL-standard on both engines. Production note at extreme
    // per-group cardinality: approx_percentile edges (the
    // length-quantiles trade) replace the positional sort.
    "q_x_equidepth" -> { (s, dir) =>
      val base = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))
      base.withColumn("decile", ntile(10).over(w))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
    },
    // UNPIVOT — melt the per-day wide event-type counts back to long
    // (day, event_type, n) rows via the stack generator: the exact
    // inverse of q_x_pivot's rotation, and the shape migrations need
    // when a source delivers metrics as columns. stack is a narrow
    // generator (no shuffle, no UDF) over the already-aggregated wide
    // table; absent combinations surface as explicit zeros, mirroring
    // the pivot twin's coalesce contract.
    "q_x_unpivot" -> { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(types.map(t =>
          count(when(col("event_type") === t, lit(1))).as(t)).head,
          types.map(t =>
            count(when(col("event_type") === t, lit(1))).as(t)).tail: _*)
      val stackArgs = types.map(t => s"'$t', $t").mkString(", ")
      wide.selectExpr("day",
        s"stack(${types.length}, $stackArgs) AS (event_type, n)")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_x_profile" -> {
      val rows = profCols.map { case (c, dt) =>
        val (mn, mx) = dt match {
          case "double" =>
            (s"CAST(CAST(min($c) AS DECIMAL(18,2)) AS VARCHAR)",
              s"CAST(CAST(max($c) AS DECIMAL(18,2)) AS VARCHAR)")
          case "timestamp" =>
            (s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
              s"strftime(max($c), '%Y-%m-%d %H:%M:%S')")
          case _ => (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        }
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  $mn AS min_value, $mx AS max_value FROM orders""".stripMargin
      }
      rows.mkString("\nUNION ALL\n")
    },
    "q_x_equidepth" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |base AS (SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM ev),
        |t AS (SELECT *, CAST(ntile(10) OVER (PARTITION BY event_type
        |    ORDER BY cents, event_id) AS INT) AS decile FROM base)
        |SELECT event_type, decile, count(*) AS n,
        |  min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM t GROUP BY 1, 2""".stripMargin,
    "q_x_unpivot" ->
      """WITH ev AS (SELECT date_trunc('microseconds', ts) AS ts, event_type FROM events),
        |wide AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |  FROM ev GROUP BY 1)
        |SELECT day, t.event_type, t.n FROM wide,
        |  LATERAL (VALUES ('click', click), ('error', error), ('purchase', purchase),
        |    ('signup', signup), ('view', view)) AS t(event_type, n)""".stripMargin
  )
}
