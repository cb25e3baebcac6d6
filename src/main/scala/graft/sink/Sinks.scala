package graft.sink

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load-side operators (SURVEY §2.2): idempotent append (the reference's
  * `INSERT ... ON CONFLICT DO NOTHING`, K1/K3), bulk JDBC append (K2),
  * SCD-1 dimension overwrite (K5), CSV export (K7).
  */
object Sinks {

  /** Idempotent append to a parquet "table" directory: dedup within the
    * batch on the natural key, anti-join against what the sink already
    * holds, append the remainder. Exactly the reference's at-least-once +
    * keyed-dedup = effectively-once contract (ls_opening.rs:100), shaped for
    * `foreachBatch` reuse. Re-delivering the same batch is a no-op.
    */
  def appendDedupParquet(batch: DataFrame, path: String, keys: Seq[String],
      partitionCols: Seq[String] = Seq.empty): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keys)
    val toWrite =
      if (exists(spark, path))
        fresh.join(spark.read.parquet(path).select(keys.map(col): _*), keys, "left_anti")
      else fresh
    val writer = toWrite.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }

  /** Idempotent JDBC append: stage the batch minus already-present keys, then
    * bulk-append (reference K1/K2/K3; `batchsize` plays push_values). The
    * anti-join reads only the key columns from the sink — pushdown keeps it a
    * key scan, not a full-table read.
    */
  def appendDedupJdbc(batch: DataFrame, url: String, table: String,
      keys: Seq[String], props: Properties = new Properties()): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keys)
    // Only a confirmed-absent table may skip the anti-join: a transient read
    // failure must propagate, or a replayed batch would double-append and
    // break the effectively-once contract.
    val toWrite =
      if (jdbcTableExists(url, table, props))
        fresh.join(spark.read.jdbc(url, table, props).select(keys.map(col): _*), keys, "left_anti")
      else fresh
    toWrite.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** SCD-1 dimension refresh: full overwrite of a small registry table
    * (reference currency_registry upsert + mass-deprecate, K5 — at dimension
    * sizes an overwrite is simpler and transactional-enough).
    */
  def overwriteDimensionJdbc(dim: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    dim.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Keyed upsert (K4 point-UPDATE batch analog): new rows replace existing
    * rows with the same key; untouched rows survive. Spark's JDBC writer has
    * no MERGE, so this is read ∪ new → latest-per-key → overwrite — correct
    * for the reference's small correction batches (backfilled loan amounts,
    * processed flags); for big fact tables use a staging table + sink-side
    * MERGE instead.
    */
  def upsertJdbc(updates: DataFrame, url: String, table: String,
      keys: Seq[String], props: Properties = new Properties()): Unit = {
    val spark = updates.sparkSession
    val tagged = updates.withColumn("__new", lit(1))
    // A transient read failure must NOT be mistaken for "table absent" —
    // the Overwrite below would then replace the table with just this batch.
    val merged =
      if (jdbcTableExists(url, table, props)) {
        val e = spark.read.jdbc(url, table, props).withColumn("__new", lit(0))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col("__new").desc)
        tagged.unionByName(e)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "__new")
      } else tagged.drop("__new")
    // materialize before overwrite: the merged frame reads the table being
    // replaced, and JDBC overwrite truncates before the read would run
    val rows = merged.collect()
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), merged.schema)
    out.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }

  /** CSV export with header (reference csv_response.rs, K7). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Definitive table-existence check via JDBC metadata (connection errors
    * propagate; only true absence returns false). Handles schema-qualified
    * names ("schema.table") by matching both parts.
    */
  private def jdbcTableExists(url: String, table: String, props: Properties): Boolean = {
    val (schemaOpt, bare) = table.split('.') match {
      case Array(s, t) => (Some(s), t)
      case _           => (None, table)
    }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      var found = false
      while (!found && rs.next()) {
        val nameOk = rs.getString("TABLE_NAME").equalsIgnoreCase(bare)
        val schemaOk = schemaOpt.forall(s =>
          Option(rs.getString("TABLE_SCHEM")).exists(_.equalsIgnoreCase(s)))
        if (nameOk && schemaOk) found = true
      }
      found
    } finally conn.close()
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
