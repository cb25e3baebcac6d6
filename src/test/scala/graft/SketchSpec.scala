package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.sketches
import graft.operators.{Sketches, TextOps}
import graft.sources.Tables

/** The sketch-column family: count-min frequency sketches (CmsAgg /
  * LongVectorSumAgg / CmsEstimate + the purely relational formulation) and
  * the DataSketches HLL rollup. Pins the CMS structural guarantee
  * (estimates never undercount), the two hash paths to each other, merge
  * determinism across partitionings, and the HLL error/consistency bounds
  * that stand in for the missing SQL oracle.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 2048

  private def exactCounts = Tables.documents(spark, sfDir)
    .select(explode(TextOps.tokens(col("text"))).as("term"))
    .filter(col("term") =!= "")
    .groupBy("term").agg(count(lit(1)).as("exact"))

  test("CMS estimates never undercount and overestimate within the eps bound") {
    val est = Sketches.cmsHeavyHitters(Tables.documents(spark, sfDir), "text",
      depth = D, width = W, k = 100000)
    val joined = est.join(exactCounts, "term")
      .select($"term", $"est_count", $"exact").collect()
    assert(joined.nonEmpty)
    val n = exactCounts.agg(sum($"exact")).as[Long].head()
    joined.foreach { r =>
      val (t, e, x) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(e >= x, s"CMS undercounted '$t': est $e < exact $x")
      // ε = e/width per classic CMS; generous 8× headroom keeps the test
      // stable while still catching a broken hash (which collides wildly)
      assert(e - x <= 8L * n / W, s"CMS overestimate on '$t': est $e vs exact $x (n=$n)")
    }
  }

  test("heavy-hitter top-k equals exact top-k on this corpus (no collisions at width 2048)") {
    // 31-term vocabulary into 4×2048 buckets: the estimate IS the count
    // unless the md5 bucket hash collides on every one of the 4 rows.
    val est = Sketches.cmsHeavyHitters(Tables.documents(spark, sfDir), "text",
      depth = D, width = W, k = 10).select($"term", $"est_count").as[(String, Long)].collect()
    val exact = exactCounts.orderBy($"exact".desc, $"term".asc).limit(10)
      .as[(String, Long)].collect()
    assert(est.toSeq == exact.toSeq)
  }

  test("CmsAgg sketch estimates equal the relational formulation (hash paths in lockstep)") {
    val docs = Tables.documents(spark, sfDir)
    val sketch = docs
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .agg(sketches.cmsSketch($"term", D, W).as("cms"))
    val viaAgg = exactCounts.select($"term").crossJoin(broadcast(sketch))
      .select($"term", sketches.cmsEstimate($"cms", $"term", D, W).as("est"))
      .as[(String, Long)].collect().toMap
    val viaRelational = Sketches.cmsHeavyHitters(docs, "text", D, W, k = 100000)
      .as[(String, Long)].collect().toMap
    assert(viaAgg == viaRelational)
  }

  test("CmsAgg counters are partition-count invariant") {
    val terms = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    def counters(parts: Int): Seq[Long] =
      terms.repartition(parts).agg(sketches.cmsSketch($"term", D, 64).as("cms"))
        .select(explode($"cms")).as[Long].collect().toSeq
    assert(counters(1) == counters(7))
  }

  test("LongVectorSumAgg: element-wise sum, null rows skipped, all-null group is NULL") {
    val df = Seq(
      ("a", Some(Seq(1L, 2L, 3L))),
      ("a", Some(Seq(10L, 20L, 30L))),
      ("a", None),
      ("b", None)
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(sketches.longVectorSum($"v").as("s"))
      .as[(String, Option[Seq[Long]])].collect().toMap
    assert(got("a").contains(Seq(11L, 22L, 33L)))
    assert(got("b").isEmpty)
  }

  test("LongVectorSumAgg: ragged vectors throw instead of silently truncating") {
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("v")
    val e = intercept[Exception] {
      df.agg(sketches.longVectorSum($"v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ragged")), s"unexpected error: $e")
  }

  test("cmsRollup (stored daily sketches → monthly) equals a direct relational replay") {
    val ev = Tables.events(spark, sfDir)
    val got = Sketches.cmsRollup(ev, "event_type", depth = D, width = 256)
    // replay: monthly counters computed straight from raw rows (additivity
    // of CMS counters is exactly what makes the daily→monthly merge legal)
    val depthIdx = explode(array((0 until D).map(lit): _*))
    val rows = ev.select(date_format(date_trunc("day", col("ts")), "yyyy-MM").as("month"),
        col("event_type"))
      .select($"month", $"event_type", depthIdx.as("i"))
      .withColumn("bucket",
        pmod(TextOps.md5Long64(concat(lit("cms"), $"i".cast("string"), lit(":"), $"event_type")),
          lit(256L)))
    val counters = rows.groupBy($"month", $"i", $"bucket").agg(count(lit(1)).as("c"))
    val cand = ev.select($"event_type".as("key")).distinct()
    val months = rows.select($"month").distinct()
    val cb = months.crossJoin(cand)
      .select($"month", $"key", depthIdx.as("i"))
      .withColumn("bucket",
        pmod(TextOps.md5Long64(concat(lit("cms"), $"i".cast("string"), lit(":"), $"key")),
          lit(256L)))
    val expected = cb.join(counters, Seq("month", "i", "bucket"), "left")
      .groupBy($"month", $"key".as("event_type"))
      .agg(min(coalesce($"c", lit(0L))).as("est_events"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("theta set algebra equals the exact overlap twin (exact mode below 2^lgK)") {
    val ev = Tables.events(spark, sfDir)
    val got = Sketches.thetaSetOverlap(ev, "user_id", "event_type", "purchase", "click")
      .as[(Long, Long, Long, Long)].head()
    val exact = ev.groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase", 1).otherwise(0)).as("a"),
        max(when($"event_type" === "click", 1).otherwise(0)).as("b"))
      .agg(sum($"a"), sum($"b"), sum($"a" * $"b"), sum($"a" * (lit(1) - $"b")))
      .as[(Long, Long, Long, Long)].head()
    assert(got == exact)
    // sanity: the algebra itself must be internally consistent
    assert(got._3 + got._4 == got._1) // both + a_only = |A|
  }

  test("theta sketches are partition-count invariant (union is layout-blind)") {
    val ev = Tables.events(spark, sfDir)
    def bytes(parts: Int): Seq[Byte] =
      ev.repartition(parts)
        .agg(org.apache.spark.sql.graft.sketches.thetaSketch($"user_id", 12).as("sk"))
        .as[Array[Byte]].head().toSeq
    assert(bytes(1) == bytes(7))
  }

  test("HLL rollup: monthly estimate within 5% of exact, daily-union ≡ direct build") {
    val ev = Tables.events(spark, sfDir)
    val est = Sketches.hllRollup(ev, "user_id")
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(countDistinct($"user_id").as("x")).as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (m, x) =>
      val e = est(m)
      assert(math.abs(e - x).toDouble / x <= 0.05, s"month $m: est $e vs exact $x")
    }
    // re-aggregation consistency: union of daily sketches must estimate the
    // same as one sketch built directly over the month (register-max merge)
    val direct = ev.groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", 12)).as("est_distinct"))
      .as[(String, Long)].collect().toMap
    assert(est == direct)
  }

  test("bitmap words merge exactly across any partitioning (q_x_bitmap_rollup invariant)") {
    // ids straddling word boundaries (63/64/65), a far word (2^20 range),
    // and heavy duplication ACROSS the two slices — the case where a naive
    // count-sum double-counts and only the bit_or merge stays exact
    val a = Seq(0L, 1L, 63L, 64L, 65L, 1048576L, 1048577L)
    val b = Seq(1L, 64L, 65L, 127L, 128L, 1048577L, 1048639L)
    def words(ids: Seq[Long]) = ids.toDF("user_id")
      .select(expr("shiftright(user_id, 6)").as("w"),
        expr("shiftleft(1L, cast(pmod(user_id, 64) as int))").as("m"))
      .groupBy($"w").agg(bit_or($"m").as("word"))
    val merged = words(a).unionByName(words(b))
      .groupBy($"w").agg(bit_or($"word").as("word"))
      .agg(sum(bit_count($"word").cast("long"))).as[Long].head()
    assert(merged == (a ++ b).distinct.size,
      s"bitmap merge gave $merged, exact distinct is ${(a ++ b).distinct.size}")
    // and the per-slice popcounts alone would NOT have been mergeable
    assert(a.size + b.size > (a ++ b).distinct.size)
  }

  test("thetaUnion over stored sketches equals one sketch over the concatenated keys") {
    import org.apache.spark.sql.graft.sketches.{thetaEstimate, thetaSketch, thetaUnion}
    // per-day sketches with overlapping user sets → the re-aggregated
    // union must count the DISTINCT union (exact-mode at these sizes),
    // not the sum of per-day estimates
    val rows = (1 to 900).map(i => (i % 3, (i % 250).toLong)).toDF("day", "user_id")
    val daily = rows.groupBy($"day").agg(thetaSketch($"user_id").as("sk"))
    val merged = daily.agg(thetaEstimate(thetaUnion($"sk"))).as[Long].head()
    val direct = rows.agg(thetaEstimate(thetaSketch($"user_id"))).as[Long].head()
    val exact = rows.select($"user_id").distinct().count()
    assert(merged == exact, s"union-of-stored gave $merged, exact $exact")
    assert(merged == direct, "re-aggregation must equal the direct build")
    // empty input yields the empty sketch, estimate 0
    val empty = rows.filter($"day" === 99)
      .groupBy($"day").agg(thetaSketch($"user_id").as("sk"))
      .agg(thetaEstimate(thetaUnion($"sk"))).as[Long].head()
    assert(empty == 0L)
  }

  test("kmvEstimateFromState survives an EMPTY sketch (all-NULL key type)") {
    // a type whose user_id values are all NULL contributes no hashes →
    // empty kmv array; the finisher must report 0 distinct, not throw on
    // element_at index 0 (r17 ADVICE)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(("view", Option(7L), ts), ("view", Option(9L), ts),
        ("ghost", Option.empty[Long], ts), ("ghost", Option.empty[Long], ts))
      .toDF("event_type", "user_id", "ts")
    val est = Sketches.kmvEstimateFromState(Sketches.kmvState(ev))
      .select($"event_type", $"kmv_k", $"est_distinct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(est("ghost") == (0L, 0L), s"empty sketch must estimate 0: $est")
    assert(est("view") == (2L, 2L), "lossless branch unaffected")
  }
}
