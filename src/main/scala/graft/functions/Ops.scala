package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational helpers the reference leans on constantly.
  *
  * These are the three idioms SURVEY.md §7.1 calls out as unblocking
  * everything else: top-1-per-group (`DISTINCT ON`, W5), the as-of join
  * (LATERAL top-1 ≤ ts, J5), and the date scaffold (`generate_series`,
  * §2.9). All are single-shuffle, driver-free, and AQE-friendly — designed
  * to survive a 100 TB fact side.
  */
object Ops {

  /** Top-1 row per key — Postgres `DISTINCT ON (keys) ORDER BY keys, ord`
    * (reference: crates/etl-core/src/dao/postgre/lp_pool_state.rs:319-327 and
    * ~6 more sites, SURVEY.md W5).
    *
    * One shuffle on `keys`; `row_number` keeps only rank 1 so the filter is
    * evaluated streaming inside the window operator — no second pass. Callers
    * must pass a total order (include a unique tiebreak column) for
    * deterministic results.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of join: for every left row, attach the latest right row with
    * `right.ts <= left.ts` within the same key — the reference's
    * `LEFT JOIN LATERAL (... WHERE ts <= $t ORDER BY ts DESC LIMIT 1)`
    * (crates/etl-core/src/dao/postgre/ls_opening.rs:1460-1467, SURVEY.md J5).
    *
    * Implementation is the union-and-window technique: tag both sides, union
    * on a common schema, and carry the last non-null right-side values forward
    * with `last(_, ignoreNulls=true)` over (key ORDER BY ts, side). This costs
    * exactly ONE shuffle on the key column — no correlated per-row lookup, no
    * broadcast of the (potentially huge) time-series side — so it scales to a
    * 100 TB fact table joined to a long price history. At equal timestamps the
    * right row sorts first, making the bound inclusive (<=).
    *
    * @param valueCols right-side columns to attach (left's columns all pass through)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns
    require(!(leftCols ++ valueCols).exists(Set("__k", "__ts", "__side", "__vals", "__picked")),
      "asOfJoin reserves the __k/__ts/__side/__vals/__picked column names")
    val clash = leftCols.toSet.intersect(valueCols.toSet)
    require(clash.isEmpty,
      s"asOfJoin value columns ${clash.mkString(", ")} collide with left columns — " +
        "alias them on the right side first (duplicate output names break downstream resolution)")
    // Common schema: all left columns (null on right rows) ++ valueCols (null
    // on left rows) ++ [__k, __ts, __side].
    // The carried payload is a STRUCT of the value columns: non-null for
    // every right row even when individual fields are null, so
    // last(ignoreNulls) picks the latest right ROW — a right row whose value
    // is genuinely NULL is attached as NULL rather than skipped for an older
    // non-null one (true as-of semantics; matches SQL ASOF JOIN oracles).
    val lProj = left.select(
      leftCols.map(col) ++
        Seq(lit(null).cast(org.apache.spark.sql.types.StructType(
            valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))).as("__vals"),
          col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(0).as("__side")): _*
    )
    val rProj = right.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(valueCols.map(col): _*).as("__vals"),
          col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(1).as("__side")): _*
    )
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lProj.unionByName(rProj).select(
      (leftCols.map(col) :+
        last(col("__vals"), ignoreNulls = true).over(w).as("__picked") :+
        col("__side")): _*
    )
    filled.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__picked").getField(c).as(c)): _*)
  }

  /** Skew-mitigating equi-join: the left (skewed fact) side gets a random
    * salt in [0, saltFactor); the right side is replicated saltFactor times
    * with every salt value, and the join key becomes (key, salt). Hot keys
    * spread over saltFactor reducers instead of landing on one. Use when a
    * handful of keys dominate (AQE skew-join handles moderate skew on its
    * own; salting is for the pathological long tail).
    *
    * The salt is `rand`-derived, so results are row-identical but partition
    * placement is not reproducible — fine for joins, never use the salt in
    * output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit saltFactor null-padded copies of every
    // unmatched replicated right row — only shapes where the replicated side
    // never surfaces unmatched are allowed
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support '$joinType' (replicated right side would duplicate unmatched rows)")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val salted = left.withColumn("__salt", (rand() * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Continuous per-day scaffold between two dates — Postgres
    * `generate_series(start, end, interval '1 day')`
    * (crates/etl-core/src/dao/postgre/ls_opening.rs:1321-1335, SURVEY.md §2.9).
    * Returns a single-column DataFrame `colName: timestamp`, one row per day,
    * bounds inclusive. Built with `sequence` + `explode` — computed
    * distributed, never a driver loop.
    */
  def dateScaffold(df: DataFrame, startExpr: Column, endExpr: Column, colName: String): DataFrame =
    df.select(explode(sequence(startExpr, endExpr, expr("interval 1 day"))).as(colName))

  /** Distributed global LEAD over a DISTINCT numeric key column — the
    * scale-safe form of `lead(k) OVER (ORDER BY k)`, whose empty PARTITION
    * BY otherwise collapses the whole table into one window partition
    * (Spark's own WindowExec warning). Keys are range-bucketed
    * (`floor(k / bucket)`), each bucket's lead runs as a normal
    * partitioned window, and each bucket's LAST row takes the next
    * non-empty bucket's first key from a per-bucket aggregate — the only
    * unpartitioned window runs over that aggregate, one row per non-empty
    * bucket, tiny at any table size. Output: the input plus
    * `next_<keyCol>` (null for the global maximum), identical to the
    * single-partition form for distinct keys.
    */
  def leadGlobal(df: DataFrame, keyCol: String, bucket: Long = 1L << 16): DataFrame = {
    val wIn = Window.partitionBy(col("__b")).orderBy(col(keyCol))
    val within = df.withColumn("__b", floor(col(keyCol) / bucket))
      .withColumn("__next", lead(col(keyCol), 1).over(wIn))
    val handoff = within.groupBy(col("__b"))
      .agg(min(col(keyCol)).as("__first"))
      .withColumn("__next_first", lead(col("__first"), 1).over(Window.orderBy(col("__b"))))
      .select(col("__b"), col("__next_first"))
    within.join(handoff, Seq("__b"), "left")
      .withColumn(s"next_$keyCol", coalesce(col("__next"), col("__next_first")))
      .drop("__b", "__next", "__next_first")
  }
}
