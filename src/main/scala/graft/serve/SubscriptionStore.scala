package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-push subscription registry — the service-edge tier the reference
  * keeps in `subscription` (crates/etl-core/src/dao/postgre/subscription.rs:
  * 1-141; push delivery in push.rs). A small mutable keyed table: natural
  * key (address, auth), an `active` flag flipped by the lifecycle rules, and
  * point reads by address.
  *
  * Spark-first shape: every mutation is a pure DataFrame → DataFrame
  * transform (unit-testable, composable into a batch that applies MANY
  * mutations in one pass — the set-oriented win over the reference's
  * row-at-a-time UPDATEs), and persistence goes through [[Materialize]]'s
  * versioned snapshot publish so readers never see a half-applied registry.
  * At dimension sizes (one row per device) the whole table is a broadcast
  * candidate; nothing here shuffles more than the registry itself.
  */
object SubscriptionStore {

  val schema: Seq[String] =
    Seq("address", "p256dh", "auth", "endpoint", "expiration", "ip", "user_agent", "active")

  /** INSERT-or-refresh of one (address, auth) subscription — the reference's
    * `insert` + `update` pair collapsed into a keyed upsert: an existing row
    * for the key is replaced (re-subscribe refreshes endpoint/expiration and
    * reactivates), anything else passes through.
    */
  def upsert(subs: DataFrame, sub: DataFrame): DataFrame = {
    val keep = subs.join(sub.select("address", "auth"), Seq("address", "auth"), "left_anti")
    keep.unionByName(sub.withColumn("active", lit(true)))
  }

  /** `UPDATE ... SET active = false WHERE endpoint = $1` — push delivery
    * failed, the endpoint is dead (subscription.rs:42-54).
    */
  def deactivateByEndpoint(subs: DataFrame, endpoint: String): DataFrame =
    subs.withColumn("active",
      when(col("endpoint") === endpoint, lit(false)).otherwise(col("active")))

  /** `UPDATE ... SET active = false WHERE address != $1 AND auth = $2` — the
    * one-device-one-address rule: a device (auth) re-registering under a new
    * address silences its rows under every OTHER address
    * (subscription.rs:56-70).
    */
  def deactivateByAuthAndNeAddress(subs: DataFrame, address: String, auth: String): DataFrame =
    subs.withColumn("active",
      when(col("address") =!= address && col("auth") === auth, lit(false))
        .otherwise(col("active")))

  /** `SELECT * FROM subscription WHERE active = true AND address = $1` — the
    * push-delivery read (subscription.rs:27-40).
    */
  def activeByAddress(subs: DataFrame, address: String): DataFrame =
    subs.filter(col("active") === true && col("address") === address)

  /** `SELECT count(*) > 0 WHERE address = $1 AND auth = $2`
    * (subscription.rs:111-141).
    */
  def exists(subs: DataFrame, address: String, auth: String): Boolean =
    !subs.filter(col("address") === address && col("auth") === auth).isEmpty

  /** Read the persisted registry (empty frame with the right schema when
    * nothing was ever published).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, "_CURRENT")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Materialize.goldTable(spark, path, ttlSeconds = Long.MaxValue)(
      sys.error("pointer exists — must not rebuild"))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(schema.map {
        case "expiration" => org.apache.spark.sql.types.StructField("expiration",
          org.apache.spark.sql.types.TimestampType)
        case "active" => org.apache.spark.sql.types.StructField("active",
          org.apache.spark.sql.types.BooleanType)
        case c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)
      }))
  }

  /** Publish the mutated registry as a fresh snapshot version (atomic
    * pointer swap; in-flight readers keep the previous version).
    */
  def save(spark: SparkSession, path: String, subs: DataFrame): Unit =
    Materialize.goldTable(spark, path, ttlSeconds = 0)(subs)
}
