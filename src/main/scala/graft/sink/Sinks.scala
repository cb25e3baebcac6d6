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
    * no MERGE, so the batch is bulk-staged to a uniquely-named side table (a
    * distributed JDBC write — nothing ever passes through the driver; the
    * unique suffix keeps concurrent upserts to the same target from
    * clobbering each other's stage) and a single sink-side `MERGE INTO`
    * applies it — the reference's own `INSERT ... ON CONFLICT DO UPDATE`
    * contract (etl-core/src/dao/postgre/currency_registry.rs:9-50).
    *
    * Within-batch duplicate keys are collapsed first (a multi-match source
    * row is a MERGE error in ANSI engines): pass `orderCol` to keep the row
    * with the greatest value of that column per key (the "last write wins"
    * the reference gets from statement order); without it the pick among
    * genuinely-different duplicate rows is arbitrary, as DataFrames carry no
    * row order. The staging table is dropped afterwards.
    */
  def upsertJdbc(updates: DataFrame, url: String, table: String,
      keys: Seq[String], props: Properties = new Properties(),
      orderCol: Option[String] = None): Unit = {
    require(keys.nonEmpty, "upsertJdbc requires at least one key column")
    val batch = orderCol match {
      case Some(c) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(c).desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => updates.dropDuplicates(keys)
    }
    // A transient existence-check failure must propagate, not be mistaken
    // for "table absent" (which would fork the no-MERGE create path).
    if (!jdbcTableExists(url, table, props)) {
      batch.write.mode(SaveMode.Append).jdbc(url, table, props)
    } else {
      val stage = stagingName(table)
      batch.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        // Spark's JDBC writer creates columns with quoted (case-exact)
        // identifiers — quote them here the same way. Table names are used
        // as passed (they may be schema-qualified).
        def q(c: String) = "\"" + c + "\""
        val cols = batch.columns.toSeq
        val nonKeys = cols.filterNot(keys.contains)
        val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
        val matched = if (nonKeys.isEmpty) ""
          else " WHEN MATCHED THEN UPDATE SET " +
            nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
        val insert = s" WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})" +
          s" VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
        val st = conn.createStatement()
        try st.executeUpdate(s"MERGE INTO $table t USING $stage s ON $on$matched$insert")
        finally st.close()
      } finally {
        try {
          val st = conn.createStatement()
          try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
        } finally conn.close()
      }
    }
  }

  /** Unique staging-table name next to the target (schema-qualified names
    * keep their schema part); uniqueness isolates concurrent upserts. A
    * crashed JVM can orphan its stage — the `__graft_stage_` prefix makes
    * those trivially identifiable for cleanup.
    */
  private def stagingName(table: String): String = {
    val suffix = s"__graft_stage_${java.util.UUID.randomUUID().toString.replace("-", "").take(10)}"
    table.split('.') match {
      case Array(s, t) => s"$s.$t$suffix"
      case _           => s"$table$suffix"
    }
  }

  /** CSV export with header (reference csv_response.rs, K7). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K6 JSON response sink: render a result as a JSON array string for an
    * HTTP handler (reference: actix Json responses over DAO rows). A
    * response body is driver-side by nature, so the row count is clamped
    * first — pair with [[graft.serve.TimeWindowParams.clampLimit]] for the
    * request-facing cap.
    */
  def toJsonResponse(df: DataFrame, maxRows: Int = 100): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

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
