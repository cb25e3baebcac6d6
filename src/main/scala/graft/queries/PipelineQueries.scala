package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.EventPipeline
import graft.operators.Multimodal
import graft.sources.Tables

/** End-to-end ingest-pipeline query (parse → enrich → snapshot, SURVEY §3)
  * and the multimodal metadata rollup.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full write-path composition: raw events → typed purchase entities →
    // as-of price enrichment (in_stable) → daily per-user state snapshots
    // with running balances.
    "q_e2e_daily_state" -> { (s, dir) => EventPipeline.run(s, dir) },
    // Multimodal metadata rollup over the binary payload table: per kind,
    // object count and byte-size stats (decode stage is spec-tested; this
    // checks the schema/plumbing tier against the oracle).
    "q_x_mm_meta" -> { (s, dir) =>
      Multimodal.toMedia(Tables.documents(s, dir))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_objects"),
          sum(length(col("payload"))).as("total_bytes"),
          max(length(col("payload"))).as("max_bytes"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_e2e_daily_state" ->
      """WITH ev AS (SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, event_type, value FROM events),
        |purchases AS (SELECT event_id, user_id, ts, value AS amount FROM ev WHERE event_type = 'purchase'),
        |prices AS (SELECT user_id AS p_user, ts AS p_ts, value AS price FROM ev WHERE event_type = 'view'),
        |enr AS (SELECT p.event_id, p.user_id, p.ts, p.amount, v.price
        |  FROM purchases p ASOF LEFT JOIN prices v ON p.user_id = v.p_user AND p.ts >= v.p_ts),
        |daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(CAST(amount AS DECIMAL(18,2))) AS day_amount,
        |    sum(CAST(amount * coalesce(price, 1.0) AS DECIMAL(28,6))) AS day_stable,
        |    count(*) AS n_tx
        |  FROM enr GROUP BY 1, 2)
        |SELECT user_id, day, n_tx,
        |  CAST(day_amount AS DOUBLE) AS day_amount,
        |  CAST(sum(day_amount) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance,
        |  CAST(sum(day_stable) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance_stable
        |FROM daily""".stripMargin,
    "q_x_mm_meta" ->
      """SELECT list_extract(['image','audio','video'], CAST(doc_id % 3 AS INT) + 1) AS kind,
        |  count(*) AS n_objects,
        |  sum(octet_length(encode(text))) AS total_bytes,
        |  max(octet_length(encode(text))) AS max_bytes
        |FROM documents GROUP BY 1""".stripMargin
  )
}
