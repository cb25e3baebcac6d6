package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-eval state + finishers shared by the batch registry rows and
  * their streaming twins — the [[Drift]] stance applied to the eval
  * family: the STATE is the additive part, the finisher is a bounded fold
  * over drained state.
  */
object Eval {

  /** The eval family's shared scoring projection: documents → (source,
    * score = n_chars, pos = is-English label). One definition for the
    * batch rows (`EvalQueries.scored`) and the streaming state upkeep.
    */
  def scoredDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("source"),
      col("n_chars").cast("long").as("score"),
      when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("pos"))

  /** Additive calibration STATE: per DISTINCT score, (n, n_pos) counts.
    * The curve's equal-width bins depend on the GLOBAL min/max score —
    * not streamable as one fold — but the per-score counter table is
    * plain additive integers over the score DOMAIN (here ≤ ~500 distinct
    * values — the q_x_auc bounded-keyspace argument), so a complete-mode
    * streaming aggregate maintains it exactly and [[calibrationFromState]]
    * re-derives min/max AND the binning from drained state. The live
    * form answers "is the ranker's score→label relationship drifting"
    * continuously, off the same numbers as the batch report.
    */
  def calibrationState(docs: DataFrame): DataFrame =
    scoredDocs(docs).groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))

  /** Equal-width 10-bin calibration curve from [[calibrationState]] rows —
    * bit-identical to the q_x_calibration registry row: min/max come from
    * the state's distinct scores (a score exists in state iff some row
    * had it), bin counts are sums of per-score counts, and sum_score is
    * Σ score·n. One broadcast of the 2-scalar min/max row.
    */
  def calibrationFromState(state: DataFrame): DataFrame = {
    val mm = state.agg(min(col("score")).as("minc"), max(col("score")).as("maxc"))
    state.crossJoin(broadcast(mm))
      .withColumn("bin", expr("((score - minc) * 10) div (maxc - minc + 1)"))
      .groupBy(col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
        sum(col("score") * col("n")).as("sum_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 10000 div n").as("rate_bp"), col("sum_score"))
  }
}
