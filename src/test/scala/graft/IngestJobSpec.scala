package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.IngestJob
import graft.sources.Tables

/** Drives the full batch write path (SURVEY §3: bronze → silver → gold) into
  * a temp warehouse and checks layout, counts, gold parity with the
  * oracle-verified registry queries, and idempotent re-runs.
  */
class IngestJobSpec extends SparkSpec {

  test("full lifecycle lands bronze/silver/gold; re-run is a no-op") {
    val wh = Files.createTempDirectory("graft_wh").toString
    IngestJob.run(spark, sfDir, wh)

    val events = Tables.events(spark, sfDir)
    val nPurchases = events.filter(col("event_type") === "purchase").count()

    // bronze: one date-partitioned entity table per family, exact row parity
    val purchase = spark.read.parquet(s"$wh/entities/purchase")
    assert(purchase.count() == nPurchases)
    assert(new java.io.File(s"$wh/entities/purchase").listFiles()
      .exists(_.getName.startsWith("event_date=")), "entity tables must be date-partitioned")
    for (t <- Seq("view", "click", "signup", "error")) {
      assert(spark.read.parquet(s"$wh/entities/$t").count() ==
        events.filter(col("event_type") === t).count(), s"entity $t count")
    }

    // silver: enriched purchases carry the precomputed in_stable column
    val enriched = spark.read.parquet(s"$wh/enriched_purchases")
    assert(enriched.count() == nPurchases)
    assert(enriched.columns.contains("in_stable"))

    // gold: the WRITTEN daily state is cell-identical to the oracle-verified
    // registry computation (catches write-path corruption — partition column
    // damage, schema drift, row loss — not just count equality)
    val daily = spark.read.parquet(s"$wh/daily_user_state")
    val registryDaily = graft.queries.PipelineQueries.queries("q_e2e_daily_state")(spark, sfDir)
      .select(daily.columns.map(col): _*)
    assert(daily.exceptAll(registryDaily).isEmpty && registryDaily.exceptAll(daily).isEmpty,
      "written daily_user_state must be cell-identical to the registry computation")
    // independent recomputation (different code path than the pipeline):
    // each user's final balance == Σ of their purchase values
    val finalBalance = daily.groupBy("user_id")
      .agg(max_by(col("balance"), col("day")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(finalBalance == direct, "final balances must equal independently-summed purchases")
    val gold = spark.read.parquet(s"$wh/gold_pl_state")
    assert(gold.count() ==
      graft.queries.PipelineQueries.queries("q_e2e_pl_state")(spark, sfDir).count())

    // run log: one persisted marker per stage (action_history analog)
    val runLog = spark.read.parquet(s"$wh/run_log")
    val stages = Seq("entities", "enriched_purchases", "daily_user_state", "gold_pl_state")
    assert(runLog.select("stage").distinct().collect().map(_.getString(0)).toSet == stages.toSet)
    assert(runLog.count() == stages.size, "exactly one marker per stage on first run")
    val enrRow = runLog.filter(col("stage") === "enriched_purchases").head()
    assert(enrRow.getAs[Long]("rows") == nPurchases)
    assert(enrRow.getAs[Long]("finished_ms") >= enrRow.getAs[Long]("started_ms"))

    // catch-up math driven from the persisted marker: just-finished → wait
    // out (almost) the full interval; cold stage → run immediately
    val last = graft.ingest.RunLog.lastFinishedMs(spark, wh, "gold_pl_state").get
    val delay = graft.ingest.RunLog.catchUpDelaySeconds(spark, wh, "gold_pl_state",
      intervalSeconds = 3600, nowEpochMs = last + 1000)
    assert(delay == 3599, s"expected 3599s remaining, got $delay")
    assert(graft.ingest.RunLog.catchUpDelaySeconds(spark, wh, "never_ran",
      intervalSeconds = 3600, nowEpochMs = last) == 0L, "unknown stage = cold start")
    // overdue marker → immediate catch-up
    assert(graft.ingest.RunLog.catchUpDelaySeconds(spark, wh, "gold_pl_state",
      intervalSeconds = 3600, nowEpochMs = last + 7200 * 1000) == 0L)

    // idempotent re-run: entity tables unchanged (K1 replay contract);
    // silver/gold are overwrite-refreshed, still exact; run log APPENDS one
    // marker per stage (history, not upsert)
    IngestJob.run(spark, sfDir, wh)
    assert(spark.read.parquet(s"$wh/entities/purchase").count() == nPurchases)
    assert(spark.read.parquet(s"$wh/enriched_purchases").count() == nPurchases)
    assert(spark.read.parquet(s"$wh/run_log").count() == 2L * stages.size)
    assert(graft.ingest.RunLog.lastFinishedMs(spark, wh, "gold_pl_state").get >= last,
      "re-run must advance (or hold) the last-finished marker")
  }

  test("decimal clamp guard: testdata passes, >1e30 amounts and cast overflows fail") {
    import spark.implicits._
    import graft.ingest.DecimalGuard.assertWithinClamp
    // the real corpus sits far under the clamp — must pass untouched
    assertWithinClamp(Tables.events(spark, sfDir), "value")
    // nulls are data, not violations
    assertWithinClamp(Seq[Option[Double]](None, Some(1.0)).toDF("value"), "value")
    // an amount past the documented 1e30 bound must be rejected...
    intercept[IllegalStateException](assertWithinClamp(Seq(1e31).toDF("value"), "value"))
    // ...and so must one the (38,0) cast itself overflows (u128 max ≈ 3.4e38)
    intercept[IllegalStateException](assertWithinClamp(Seq(1e39).toDF("value"), "value"))
    // boundary: just under the limit passes
    assertWithinClamp(Seq(9.99e29).toDF("value"), "value")
  }

  test("typed entity tier agrees with the untyped pipeline") {
    import spark.implicits._
    val typedTotal = graft.ingest.Entities.purchases(spark, sfDir)
      .groupByKey(_.user_id)
      .mapValues(_.value.getOrElse(0.0))
      .reduceGroups(_ + _)
      .collect().toMap
    val untyped = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(coalesce(col("value"), lit(0.0))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(typedTotal.keySet == untyped.keySet)
    typedTotal.foreach { case (u, t) => assert(math.abs(t - untyped(u)) < 1e-6) }
    // every family's typed view decodes (encoder/schema mismatches fail here,
    // not at a downstream caller)
    val ev = Tables.events(spark, sfDir)
    def n(t: String) = ev.filter(col("event_type") === t).count()
    assert(graft.ingest.Entities.views(spark, sfDir).count() == n("view"))
    assert(graft.ingest.Entities.clicks(spark, sfDir).count() == n("click"))
    assert(graft.ingest.Entities.signups(spark, sfDir).count() == n("signup"))
    assert(graft.ingest.Entities.errors(spark, sfDir).count() == n("error"))
  }
}
