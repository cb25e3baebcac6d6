package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.sources.Tables

/** Typed entity tier (SURVEY §1.2): the event families as `Dataset[T]` with
  * case-class encoders. The DataFrame pipeline stays the execution surface
  * (same plans, Catalyst optimizes both identically); these views add
  * compile-time field safety for consumers composing per-entity logic —
  * exactly the split the reference gets from its sqlx row structs over SQL.
  */
case class PurchaseEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Option[Double], attr_k: Option[Int])

case class ViewEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Option[Double], attr_k: Option[Int])

case class ClickEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Option[Double], attr_k: Option[Int])

case class SignupEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Option[Double], attr_k: Option[Int])

case class ErrorEvent(event_id: Long, ts: Timestamp, user_id: Long,
    value: Option[Double], attr_k: Option[Int])

object Entities {

  private def typed[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, dir: String, eventType: String): Dataset[T] =
    EventPipeline.entity(EventPipeline.parse(Tables.events(spark, dir)), eventType).as[T]

  def purchases(spark: SparkSession, dir: String): Dataset[PurchaseEvent] = {
    import spark.implicits._
    typed[PurchaseEvent](spark, dir, "purchase")
  }

  def views(spark: SparkSession, dir: String): Dataset[ViewEvent] = {
    import spark.implicits._
    typed[ViewEvent](spark, dir, "view")
  }

  def clicks(spark: SparkSession, dir: String): Dataset[ClickEvent] = {
    import spark.implicits._
    typed[ClickEvent](spark, dir, "click")
  }

  def signups(spark: SparkSession, dir: String): Dataset[SignupEvent] = {
    import spark.implicits._
    typed[SignupEvent](spark, dir, "signup")
  }

  def errors(spark: SparkSession, dir: String): Dataset[ErrorEvent] = {
    import spark.implicits._
    typed[ErrorEvent](spark, dir, "error")
  }
}
