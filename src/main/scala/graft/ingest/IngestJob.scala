package graft.ingest

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sink.Sinks

/** End-to-end batch ETL driver mirroring the reference's full lifecycle
  * (SURVEY §3): raw events → typed entity tables (bronze→silver, idempotent
  * append) → snapshot/state tables (gold) → serving materializations.
  *
  * Usage: graft.ingest.IngestJob <sfDir> <warehouseDir>
  *
  * Layout written:
  *   <wh>/entities/<event_type>/   one idempotent append table per family
  *   <wh>/enriched_purchases/      silver with as-of price + in_stable
  *   <wh>/daily_user_state/        per-user snapshots (LS_State analog)
  *   <wh>/gold_pl_state/           platform rollup (PL_State analog)
  *
  * Facts are partitioned by event date — the time-partitioning every 100 TB
  * deployment needs for pruning; re-running the job is a no-op on the entity
  * tables (natural-key dedup, K1).
  */
object IngestJob {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, wh) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, wh)
    spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, wh: String): Unit = {
    // parsed feeds 6+ downstream actions — persist so the raw scan + JSON
    // parse run once, not once per action
    val parsed = EventPipeline.parse(graft.sources.Tables.events(spark, sfDir)).persist()
    try {
      // enforce the §7.4 decimal clamp at the door: amounts must stay far
      // enough under 1e38 that the clamp AND its sum accumulators are exact
      DecimalGuard.assertWithinClamp(parsed, "value")
      runStages(parsed, spark, sfDir, wh)
    } finally parsed.unpersist()
  }

  private def runStages(parsed: org.apache.spark.sql.DataFrame,
      spark: SparkSession, sfDir: String, wh: String): Unit = {
    // every stage persists an action_history-style run marker (RunLog) —
    // stage, start/finish, rows — so a restarted driver can size its first
    // tick from RunLog.catchUpDelaySeconds instead of cold-starting. The
    // row counts are read back from the written parquet (footer-metadata
    // counts, no data scan).
    def tableRows(path: String): Long = spark.read.parquet(path).count()

    // bronze→silver: one entity table per event family, idempotent append,
    // date-partitioned for pruning
    RunLog.timed(spark, wh, "entities") {
      Seq("purchase", "view", "click", "signup", "error").map { t =>
        Sinks.appendDedupParquet(
          EventPipeline.entity(parsed, t).withColumn("event_date", to_date(col("ts"))),
          s"$wh/entities/$t", Seq("event_id"), partitionCols = Seq("event_date"))
        tableRows(s"$wh/entities/$t")
      }.sum
    }

    // silver: enriched purchases (as-of price, in_stable precompute — R4:
    // enrich at write time so every read query skips the as-of join)
    val enriched = EventPipeline.enrichPurchases(parsed)
    RunLog.timed(spark, wh, "enriched_purchases") {
      enriched.withColumn("event_date", to_date(col("ts")))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_date")
        .parquet(s"$wh/enriched_purchases")
      tableRows(s"$wh/enriched_purchases")
    }

    // gold: state snapshots + platform rollup
    RunLog.timed(spark, wh, "daily_user_state") {
      EventPipeline.dailyUserState(enriched)
        .write.mode(SaveMode.Overwrite).parquet(s"$wh/daily_user_state")
      tableRows(s"$wh/daily_user_state")
    }
    RunLog.timed(spark, wh, "gold_pl_state") {
      graft.queries.PipelineQueries.queries("q_e2e_pl_state")(spark, sfDir)
        .write.mode(SaveMode.Overwrite).parquet(s"$wh/gold_pl_state")
      tableRows(s"$wh/gold_pl_state")
    }
  }
}
