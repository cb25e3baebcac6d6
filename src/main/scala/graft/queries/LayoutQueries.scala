package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Ops
import graft.sources.Tables

/** Physical-layout scale operators: Z-order clustering keys (the
  * multi-dimensional file-skipping primitive) and the salted skew join.
  *
  * Neither changes WHAT is computed — both change WHERE rows land so the
  * same logical answer arrives without a hot reducer (skew join) or
  * without reading 100 TB for a two-predicate point query (Z-order).
  * That makes both perfectly oracle-checkable: the z-value is exact
  * integer arithmetic replayed in SQL, and the salted join's contract is
  * row-set identity with the plain join.
  */
object LayoutQueries {

  /** SQL replay of [[Ops.mortonInterleave]]'s four-round bit dilation —
    * the same shift/and/or chain DuckDB evaluates on BIGINT.
    */
  private def spreadSql(v: String): String = {
    val a = s"(($v | ($v << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val c = s"(($b | ($b << 2)) & 858993459)"
    s"(($c | ($c << 1)) & 1431655765)"
  }
  private val zvalSql = s"(${spreadSql("x")} | (${spreadSql("y")} << 1))"

  /** SQL replay of [[Ops.hilbertIndex]]'s packed-state bit-level fold —
    * the identical 15-round xy2d loop over a BIGINT-packed (d, x, y).
    */
  private def hilbertSql(xcol: String, ycol: String): String = {
    val d = "(acc >> 32)"
    val x = "((acc >> 16) & 32767)"
    val y = "(acc & 32767)"
    val rx = s"(($x >> i) & 1)"
    val ry = s"(($y >> i) & 1)"
    val nd = s"($d + (CAST(1 AS BIGINT) << (2*i)) * xor(3 * $rx, $ry))"
    val nx = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN 32767 - $y ELSE $y END) ELSE $x END)"
    val ny = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN 32767 - $x ELSE $x END) ELSE $y END)"
    s"""list_reduce(list_prepend(((CAST($xcol AS BIGINT) << 16) | CAST($ycol AS BIGINT)),
       |    [14,13,12,11,10,9,8,7,6,5,4,3,2,1,0]),
       |  (acc, i) -> ($nd << 32) | ($nx << 16) | $ny) >> 32""".stripMargin
  }

  /** orders → (key, x = custkey, y = days since the start of the order
    * date domain). Both dimensions fit 16 bits at the driver SFs
    * (custkey ≤ 14 999 at sf0.1; the date span is ~2 400 days) and the
    * expression range-checks, raising on overflow rather than aliasing
    * distant rows into one z-cell. A wider production key domain buckets
    * first (x = custkey >> k) per mortonInterleave's contract — the tile
    * just gets coarser in that dimension.
    */
  private def orderZBase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_custkey").cast("bigint").as("x"),
      datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01")))
        .cast("bigint").as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Z-order clustering key per order: zval interleaves (customer,
    // order-day) bits so z-adjacent rows are near in BOTH dimensions.
    // The write path this feeds: df.repartitionByRange(N, $"zval")
    // .sortWithinPartitions("zval").write.parquet(...) — every output
    // file's (o_custkey, o_orderdate) min/max footer stats then form a
    // tight bounding box, and a scan filtered on EITHER column prunes
    // files (a lexicographic sort serves only its leading column).
    // The key itself is pure codegen'd integer arithmetic — this query
    // oracle-checks that arithmetic bit-for-bit; zbucket (= zval >> 16,
    // a 256×256-cell z-tile) is the file-grain the stats twin below
    // aggregates to. One physical-type caveat is part of the recipe:
    // store the date dimension as parquet DATE/int (stats-bearing,
    // filter-matchable) — Spark TimestampType columns (INT96, or INT64
    // with the NTZ annotation mismatch) never match the pushed rowgroup
    // filter and NOTHING prunes however good the layout
    // (BehaviorLayoutSpec measures the end-to-end skip: 187 of 1500
    // rows read under a date-only predicate vs 1500 for the
    // lexicographic layout).
    "q_x_zorder" -> { (s, dir) =>
      orderZBase(s, dir)
        .withColumn("zval", Ops.mortonInterleave(col("x"), col("y")))
        .select(col("o_orderkey"), col("zval"),
          shiftright(col("zval"), 16).as("zbucket"))
    },
    // The skipping-stats view of the same layout: per z-tile row counts
    // and per-dimension min/max — exactly the footer statistics a
    // z-sorted file of that tile would publish. The per-tile (max−min)
    // spans are bounded by the tile cell (256 customers × 256 days)
    // REGARDLESS of table size: at 100 TB the tiles get heavier, not
    // wider, which is why z-order pruning survives scale-up. Asserted as
    // a property in BehaviorLayoutSpec; hash-checked here.
    "q_x_zorder_stats" -> { (s, dir) =>
      orderZBase(s, dir)
        .withColumn("zbucket",
          shiftright(Ops.mortonInterleave(col("x"), col("y")), 16))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
          min(col("y")).as("min_day"), max(col("y")).as("max_day"))
    },
    // Hilbert clustering key over the same (customer, order-day) plane —
    // the locality-preserving alternative to q_x_zorder: consecutive
    // Hilbert indexes are ALWAYS grid-adjacent (Morton jumps diagonally
    // at power-of-two seams), so equal-count file tiles carry tighter
    // per-dimension min/max footers and prune better on the same data
    // (BehaviorLayoutSpec measures both layouts' tile bounding boxes
    // side by side). The index is one codegen'd integer fold
    // (Ops.hilbertIndex); the oracle replays the identical fold.
    "q_x_hilbert" -> { (s, dir) =>
      orderZBase(s, dir)
        .withColumn("hval", Ops.hilbertIndex(col("x"), col("y")))
        .select(col("o_orderkey"), col("hval"),
          shiftright(col("hval"), 16).as("hbucket"))
    },
    // The skipping-stats view of the Hilbert layout — same tile grain
    // (65536 curve cells per bucket) as q_x_zorder_stats, so the two
    // stats tables are directly comparable footer-for-footer.
    "q_x_hilbert_stats" -> { (s, dir) =>
      orderZBase(s, dir)
        .withColumn("hbucket",
          shiftright(Ops.hilbertIndex(col("x"), col("y")), 16))
        .groupBy(col("hbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
          min(col("y")).as("min_day"), max(col("y")).as("max_day"))
    },
    // Salted skew join (Ops.saltedJoin): events fact × customer dim on
    // user_id with the fact side salted over 8 reducer cells and the dim
    // replicated 8×. The contract — and what the oracle checks — is
    // row-set identity with the plain join: salting moves rows, never
    // makes or loses one. Use when a handful of hot keys dominate beyond
    // what AQE's skew-join split handles (its splits still ship one hot
    // key's dim row to one task's build side; salting pre-spreads the
    // probe side). Aggregated to segment grain with an exact DECIMAL sum
    // so the output is associative — identical under any placement.
    // Compaction planner: assign small files to target-size output bins
    // along the (size DESC, id) order — the streaming first-fit
    // approximation every table-maintenance service runs (Delta/Iceberg
    // OPTIMIZE's bin packing, expressed as prefix sums): bin =
    // exclusive-prefix-bytes div target, so a bin never starts past the
    // target and overshoots by at most one file — the classical bound,
    // computed WITHOUT a sequential packer. The prefix sum is the
    // bucketized cumSumGlobal (bucket = byte-deficit band, bounded by
    // the size DOMAIN), so no global window exists; "files" here are
    // documents with n_chars as bytes — the planner's arithmetic is the
    // product, the catalog row is a stand-in.
    "q_x_compaction_plan" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars").cast("long").as("bytes"))
      val mx = d.agg(max(col("bytes")).as("mxb"))
      // Packing-headroom guards (r16 ADVICE): sort_key packs doc_id into
      // the low 10¹⁰ slots of (deficit)·10¹⁰ + doc_id. A doc_id ≥ 10¹⁰
      // would silently corrupt the (size DESC, id) order — and the oracle
      // replays the same formula, so the hash gate could NOT catch it —
      // and a byte deficit > 922,337,202 would overflow int64. Both are
      // now hard assertions (codegen'd, throw on first bad row) instead
      // of silent wraparound; production catalogs with wider ids derive
      // the multiplier from max(doc_id)+1 instead of this constant.
      val keyed = d.crossJoin(broadcast(mx))
        .withColumn("sort_key",
          when(assert_true(col("doc_id") < lit(10000000000L) &&
                 (col("mxb") - col("bytes")) <= lit(922337202L),
               lit("compaction_plan: doc_id or size deficit exceeds the " +
                 "10^10-slot int64 packing headroom")).isNull,
            (col("mxb") - col("bytes")) * lit(10000000000L) + col("doc_id")))
      Ops.cumSumGlobal(keyed, "sort_key", "bytes", "cum",
          expr("sort_key div 10000000000"))
        .select(col("doc_id"), col("bytes"),
          expr("(cum - bytes) div 4096").as("bin"))
    },
    "q_x_skew_join" -> { (s, dir) =>
      val fact = Tables.events(s, dir)
        .select(col("user_id"), col("value").cast("decimal(18,2)").as("v"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Ops.saltedJoin(fact, dim, "user_id", saltFactor = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("total_value"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_x_zorder" ->
      s"""WITH base AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |z AS (SELECT o_orderkey, $zvalSql AS zval FROM base)
         |SELECT o_orderkey, zval, (zval >> 16) AS zbucket FROM z""".stripMargin,
    "q_x_zorder_stats" ->
      s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |z AS (SELECT x, y, ($zvalSql >> 16) AS zbucket FROM base)
         |SELECT zbucket, count(*) AS n,
         |  min(x) AS min_cust, max(x) AS max_cust,
         |  min(y) AS min_day, max(y) AS max_day
         |FROM z GROUP BY 1""".stripMargin,
    "q_x_hilbert" ->
      s"""WITH base AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |h AS (SELECT o_orderkey, ${hilbertSql("x", "y")} AS hval FROM base)
         |SELECT o_orderkey, hval, (hval >> 16) AS hbucket FROM h""".stripMargin,
    "q_x_hilbert_stats" ->
      s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |h AS (SELECT x, y, (${hilbertSql("x", "y")}) >> 16 AS hbucket FROM base)
         |SELECT hbucket, count(*) AS n,
         |  min(x) AS min_cust, max(x) AS max_cust,
         |  min(y) AS min_day, max(y) AS max_day
         |FROM h GROUP BY 1""".stripMargin,
    // the same (size DESC, id) synthetic sort key, running sum, and
    // exclusive-prefix bin division
    "q_x_compaction_plan" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents),
        |mx AS (SELECT max(bytes) AS mxb FROM d),
        |k AS (SELECT doc_id, bytes,
        |    (mxb - bytes) * 10000000000 + doc_id AS sort_key FROM d, mx),
        |c AS (SELECT doc_id, bytes,
        |    CAST(sum(bytes) OVER (ORDER BY sort_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM k)
        |SELECT doc_id, bytes, (cum - bytes) // 4096 AS bin FROM c""".stripMargin,
    "q_x_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1""".stripMargin
  )
}
