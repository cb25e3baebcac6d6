package graft.serve

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serving-layer time-window parameter parsing — the reference's
  * `?period=3m|6m|12m|all` (default 3m) with optional `?from=` incremental
  * override (crates/etl-core/src/helpers/time_window.rs:79-100).
  *
  * Produces a Column predicate against an explicit `asOf` anchor so query
  * results stay deterministic (SURVEY §7.4#3: never a wall-clock NOW()).
  */
object TimeWindowParams {

  sealed trait Window
  case class Months(n: Int) extends Window
  case object All extends Window
  case class From(ts: Timestamp) extends Window

  /** Parse the period/from params. Matches the reference contract: `from`
    * wins when given; absent period defaults to 3 months; only 3m/6m/12m/all
    * are valid — anything else is an error, not a silent default.
    */
  def parse(period: Option[String], from: Option[Timestamp]): Window =
    (from, period) match {
      case (Some(ts), _)    => From(ts)
      case (_, None)        => Months(3)
      case (_, Some("all")) => All
      case (_, Some("3m"))  => Months(3)
      case (_, Some("6m"))  => Months(6)
      case (_, Some("12m")) => Months(12)
      case (_, Some(bad))   =>
        throw new IllegalArgumentException(s"invalid period '$bad' (want 3m|6m|12m|all)")
    }

  /** O4 limit clamping — the reference's pagination guard: absent limit
    * defaults, oversized limits clamp to the cap rather than erroring
    * (etl-api/src/controller/leases.rs:43-47); negative asks are a caller
    * bug and reject.
    */
  def clampLimit(limit: Option[Int], default: Int = 10, max: Int = 100): Int = {
    val n = limit.getOrElse(default)
    require(n >= 0, s"limit must be non-negative, got $n")
    math.min(n, max)
  }

  /** Predicate for `ts` within the parsed window ending at `asOf`. */
  def predicate(w: Window, ts: Column, asOf: Column): Column = w match {
    case Months(n) => ts > asOf - expr(s"INTERVAL $n MONTHS") && ts <= asOf
    case All       => ts <= asOf
    case From(f)   => ts > lit(f) && ts <= asOf
  }
}
