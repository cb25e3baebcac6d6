package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derandomized Poisson-bootstrap state + finisher — the [[Drift]] stance
  * for resampling uncertainty: the STATE is the per-(type, replicate)
  * weighted-sum pair (additive ⇒ ONE complete-mode streaming aggregate
  * maintains it exactly), the finisher is a B-row-per-type ranked cut.
  *
  * Poisson bootstrap is THE distributed bootstrap: no global resample
  * pass — each row draws its per-replicate multiplicity independently, so
  * the B× fan-out happens BEFORE a map-side-combinable aggregate and only
  * |types|·B keys ever shuffle. Derandomized: the weight comes from the
  * md5 split-hash of (event_id, b) against the Poisson(1) CDF in fixed
  * ppm thresholds (tail capped at 5, CDF 0.999406 — the cap shifts
  * nothing at corpus n), so both engines — and every micro-batch replay —
  * draw the exact same resamples.
  */
object Resample {

  /** Poisson(1) CDF thresholds over a 10⁶ hash domain: w = #{thresholds
    * below u} capped at 5. Fixed ppm constants so the oracle replays the
    * draw bit-for-bit.
    */
  private val PoissonPpm = Seq(367879L, 735759L, 919699L, 981012L, 996340L)

  /** Additive bootstrap STATE: per (event_type, replicate b < B) the
    * weighted cents sum and total weight. Every entry is an integer sum
    * ⇒ complete-mode streaming upkeep ≡ the batch build at any slicing.
    */
  def bootstrapState(events: DataFrame, b: Int = 32): DataFrame = {
    val reps = events
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .select(col("event_type"), col("c"), col("event_id"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("u", pmod(TextOps.md5Long64(
        concat(lit("boot:"), col("event_id").cast("string"),
          lit(":"), col("b").cast("string"))), lit(1000000L)))
      // fold from the LARGEST threshold inward so the smallest matching
      // threshold wins (the innermost when must be u < 367879 → 0)
      .withColumn("w",
        PoissonPpm.zipWithIndex.reverse.foldLeft(lit(PoissonPpm.length.toLong)) {
          case (acc, (thr, i)) => when(col("u") < thr, i.toLong).otherwise(acc)
        })
    reps.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("c")).as("ws"), sum(col("w")).as("wn"))
  }

  /** Ranked-cut CI finisher over [[bootstrapState]] rows: exact integer
    * replicate means (one div each), CI = the 2nd / (cnt−1)th ranked mean
    * (~2.5th/97.5th percentile at B = 32), ties broken by replicate id.
    * Replicates that kept no weight are excluded (possible only at tiny
    * n — B·P(all zero) ≈ 32·e⁻ⁿ).
    */
  def bootstrapCiFromState(state: DataFrame): DataFrame = {
    val means = state.filter(col("wn") > 0)
      .withColumn("mean_c", expr("ws div wn"))
    val wR = Window.partitionBy(col("event_type"))
      .orderBy(col("mean_c"), col("b"))
    means
      .withColumn("r", row_number().over(wR))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_boot"),
        min(col("mean_c")).as("boot_min"), max(col("mean_c")).as("boot_max"),
        max(when(col("r") === 2, col("mean_c"))).as("ci_lo_c"),
        max(when(col("r") === col("cnt") - 1, col("mean_c"))).as("ci_hi_c"))
  }
}
