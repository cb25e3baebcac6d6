package graft.serve

/** Aggregation-loop scheduling math (SURVEY §2.11 catch-up scheduling).
  *
  * The reference sizes the FIRST timer tick from the last recorded
  * aggregation action: run immediately when more than one interval has
  * already elapsed (catch-up), otherwise wait out the remainder, and fall
  * back to a full interval on clock skew
  * (etl-ingest/src/main.rs:103-140). Pure arithmetic here — the caller owns
  * the actual timer (a driver loop, Airflow, cron); keeping the math
  * side-effect-free makes the contract testable.
  */
object Scheduling {

  /** Seconds until the first aggregation tick.
    *
    * @param intervalSeconds the aggregation cadence (reference: hours × 3600)
    * @param lastRunEpochMs  when the last aggregation action committed; None
    *                        when none was ever recorded (cold start → 0)
    * @param nowEpochMs      current time
    */
  def catchUpDelaySeconds(intervalSeconds: Long, lastRunEpochMs: Option[Long],
      nowEpochMs: Long): Long = {
    require(intervalSeconds > 0, s"intervalSeconds must be positive, got $intervalSeconds")
    lastRunEpochMs match {
      case None => 0L // never ran — aggregate immediately
      case Some(last) if nowEpochMs < last => intervalSeconds // clock skew → full interval
      case Some(last) =>
        math.max(intervalSeconds - (nowEpochMs - last) / 1000, 0L)
    }
  }
}
