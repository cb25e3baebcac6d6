package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Ops

/** Batch ingest pipeline mirroring the reference's write path (SURVEY §3.1):
  * raw event stream → per-type typed entity frames → enrichment (as-of price,
  * in-stable derivation, precomputed columns) → snapshot rollups.
  *
  * The reference parses per-event attribute maps into typed rows
  * (event_parsing.rs:25-327) and enriches at WRITE time (precomputed columns,
  * migrations/V003) so queries stay cheap — we keep that design: enrichment
  * runs once in the ingest job, the silver table carries the derived columns.
  */
object EventPipeline {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Parse the raw attribute payload (JSON `props`) into typed columns and
    * split by event type — the B12 attr-map → typed-row step.
    */
  def parse(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"),
      from_json(col("props"), propsSchema).getField("k").as("attr_k"))

  /** Typed entity frame for one event type (the wasm-ls-open analog: one
    * entity table per event family).
    */
  def entity(parsed: DataFrame, eventType: String): DataFrame =
    parsed.filter(col("event_type") === eventType).drop("event_type")

  /** Write-time enrichment: attach the as-of "price" (latest view value per
    * user) to each purchase and derive the stable-denominated amount —
    * the in_stable precompute (B1/B2, reference configuration.rs:578-628).
    */
  def enrichPurchases(parsed: DataFrame): DataFrame = {
    val purchases = entity(parsed, "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value").as("amount"), col("attr_k"))
    val prices = entity(parsed, "view")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("price"))
    Ops.asOfJoin(purchases, prices, "user_id", "p_user", "ts", "p_ts", Seq("price"))
      .withColumn("in_stable", col("amount") * coalesce(col("price"), lit(1.0)))
  }

  /** Daily state snapshots per user: balance accumulated from enriched
    * purchases — the LS_State-style periodic snapshot (entities.md:181-200),
    * computed as agg + running window rather than a stateful store so it is
    * replayable and scale-friendly (SURVEY §7.4#7).
    */
  def dailyUserState(enriched: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = enriched
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(col("amount").cast("decimal(18,2)")).as("day_amount"),
        sum(col("in_stable").cast("decimal(28,6)")).as("day_stable"),
        count(lit(1)).as("n_tx"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DuckDB date_trunc('day', ts) is a DATE — match its arrow type
    daily.select(col("user_id"), col("day").cast("date").as("day"), col("n_tx"),
      col("day_amount").cast("double").as("day_amount"),
      sum(col("day_amount")).over(w).cast("double").as("balance"),
      sum(col("day_stable")).over(w).cast("double").as("balance_stable"))
  }

  /** Full pipeline: raw events → parsed → enriched purchases → daily state. */
  def run(spark: SparkSession, dir: String): DataFrame =
    dailyUserState(enrichPurchases(parse(graft.sources.Tables.events(spark, dir))))
}
