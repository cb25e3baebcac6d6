package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** Named-query registry, part 1: aggregation core.
  *
  * Conventions for oracle hash-parity (driver compares Spark output vs DuckDB
  * running `oracleSql` on the same parquet):
  *   - Sums of doubles are computed in DECIMAL (exact, order-independent —
  *     a plain double sum is shuffle-order-dependent and would flap the hash),
  *     then cast to double for a stable final type both engines agree on.
  *   - Counts stay BIGINT.
  *   - Every computed column is aliased identically in Spark and SQL.
  *   - Queries that LIMIT establish a total order (unique tiebreak) first.
  */
object CoreQueries {

  /** Exact money arithmetic: cast a double column to DECIMAL(18,2) before
    * aggregation. The test doubles carry at most 2 decimal digits, so the
    * cast is lossless in both engines.
    */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2 hash aggregation (reference: ls_opening.rs:379-397 leased-assets) —
    // TPC-H Q1 shape: group lineitem by flag/status, exact sums + counts.
    "q1_agg" -> { (s, dir) =>
      // Exact integer-unit sums (the earn-APR pattern): cents for qty/
      // price/discount keep every aggregate a LONG sum — order-independent
      // like the decimal form, 128-bit-free. The final power-of-ten
      // division equals the former decimal→double cast bit-for-bit only
      // while the unscaled sum stays under 2^53 (~9.0e15): disc-price is
      // ~6e14 single-group at sf0.1 but grows linearly with SF, crossing
      // 2^53 around sf10 — and past it the long→double cast rounds
      // SILENTLY (ANSI only catches 2^63). Ops.exactDouble makes that
      // loud; above the ceiling, fall back to the decimal form.
      val qtyU = (dec("l_quantity") * 100).cast("long")
      val priceU = (dec("l_extendedprice") * 100).cast("long")
      val discU = (dec("l_discount") * 100).cast("long")
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (Ops.exactDouble(sum(qtyU)) / 1e2).as("sum_qty"),
          (Ops.exactDouble(sum(priceU)) / 1e2).as("sum_base_price"),
          (Ops.exactDouble(sum(priceU * (lit(100L) - discU))) / 1e4).as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
