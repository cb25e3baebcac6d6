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
    * clobbering each other's stage) and ONE sink-side apply statement moves
    * it into the target. The statement is picked per JDBC dialect — the
    * reference's own contract is `INSERT ... ON CONFLICT DO UPDATE`
    * (etl-core/src/dao/postgre/currency_registry.rs:9-50), which Postgres
    * of any vintage and SQLite speak, while MySQL wants ON DUPLICATE KEY
    * and ANSI engines (Derby, H2, Oracle, MSSQL) take MERGE INTO:
    *
    *  - postgresql / sqlite → `INSERT ... SELECT ... ON CONFLICT (keys) DO
    *    UPDATE SET c = EXCLUDED.c` (requires a unique index on the keys,
    *    which the ON CONFLICT contract presumes)
    *  - mysql / mariadb → `INSERT ... SELECT ... ON DUPLICATE KEY UPDATE
    *    c = VALUES(c)` (backtick quoting; unique key on the keys presumed)
    *  - everything else → ANSI `MERGE INTO`
    *
    * Within-batch duplicate keys are collapsed first (a multi-match source
    * row is a MERGE error in ANSI engines): pass `orderCol` to keep the row
    * with the greatest value of that column per key (the "last write wins"
    * the reference gets from statement order); without it the pick among
    * genuinely-different duplicate rows is arbitrary, as DataFrames carry no
    * row order. The staging table is dropped afterwards; a failed DROP is
    * logged and swallowed so it can never mask the apply-statement failure
    * (orphaned `__graft_stage_` tables are documented cleanable).
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
    // for "table absent" (which would fork the no-upsert create path).
    if (!jdbcTableExists(url, table, props)) {
      batch.write.mode(SaveMode.Append).jdbc(url, table, props)
    } else {
      val stage = stagingName(table)
      batch.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val sql = upsertSql(url, table, stage, batch.columns.toSeq, keys)
        val st = conn.createStatement()
        try st.executeUpdate(sql)
        finally st.close()
      } finally {
        // best-effort cleanup: if the apply failed (e.g. connection loss)
        // this DROP usually fails too — swallowing keeps the ROOT CAUSE
        // propagating instead of replacing it with the DROP's exception
        try {
          val st = conn.createStatement()
          try st.executeUpdate(s"DROP TABLE $stage")
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[upsertJdbc] staging table $stage not dropped " +
                s"(${e.getMessage}) — __graft_stage_ tables are safe to clean up")
          } finally st.close()
        } catch {
          case scala.util.control.NonFatal(_) => // createStatement on a dead conn
        } finally conn.close()
      }
    }
  }

  /** The dialect-dispatched upsert statement (pure string builder — unit-
    * tested per dialect; the Derby/MERGE branch is also integration-tested).
    * Identifier quoting matches what Spark's JDBC writer used to CREATE the
    * staging columns: backticks on MySQL, double quotes elsewhere.
    */
  private[graft] def upsertSql(url: String, table: String, stage: String,
      cols: Seq[String], keys: Seq[String]): String = {
    val mysql = url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb")
    def q(c: String) = if (mysql) s"`$c`" else "\"" + c + "\""
    val nonKeys = cols.filterNot(keys.contains)
    val colList = cols.map(q).mkString(", ")
    if (url.startsWith("jdbc:postgresql") || url.startsWith("jdbc:sqlite")) {
      val conflict =
        if (nonKeys.isEmpty) " DO NOTHING"
        else " DO UPDATE SET " + nonKeys.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
      s"INSERT INTO $table ($colList) SELECT $colList FROM $stage" +
        s" ON CONFLICT (${keys.map(q).mkString(", ")})$conflict"
    } else if (mysql) {
      // key-only tables: refresh a key column with itself — MySQL's idiom
      // for "do nothing" without INSERT IGNORE's error-swallowing
      val updates = (if (nonKeys.isEmpty) keys.take(1) else nonKeys)
        .map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
      s"INSERT INTO $table ($colList) SELECT $colList FROM $stage" +
        s" ON DUPLICATE KEY UPDATE $updates"
    } else {
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val matched = if (nonKeys.isEmpty) ""
        else " WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insert = s" WHEN NOT MATCHED THEN INSERT ($colList)" +
        s" VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
      s"MERGE INTO $table t USING $stage s ON $on$matched$insert"
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

  /** K7 bulk path: distributed CSV export with header — for whole-table
    * extracts too large for a response body. The serving-edge twin (the
    * reference's `?format=csv` attachment, exact RFC 4180 cell semantics)
    * is [[graft.serve.Responses.toCsvResponse]].
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K6 JSON response sink — body of
    * [[graft.serve.Responses.toJsonResponse]], kept as a String helper. A
    * response body is driver-side by nature, so the row count is clamped
    * first — pair with [[graft.serve.TimeWindowParams.clampLimit]] for the
    * request-facing cap.
    */
  def toJsonResponse(df: DataFrame, maxRows: Int = 100): String =
    graft.serve.Responses.toJsonResponse(df, maxRows).body

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
