package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.operators.{Dedup, Multimodal}
import graft.functions.Ops

/** Skew-stress suite (r17 VERDICT item 4): a synthetic hot-key corpus —
  * one source carrying 90% of docs, one user carrying 50% of events, one
  * LSH band bucket far over cap — drives every skew guard in the engine
  * and asserts TWO things per guard: (a) it actually FIRED (observe
  * counters where the guard publishes one, construction otherwise), and
  * (b) the guarded output preserves the semantics the unguarded form
  * would produce (bit-equal where the guard is a pure re-plan, component-
  * equal where the star cap deliberately thins redundant pairs).
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  /** Collect one observe metric by name via a QueryExecutionListener —
    * production's vantage (localCheckpoint moves the CollectMetrics node
    * onto the checkpoint's execution, so df.observedMetrics is blind).
    */
  private def withMetric[T](name: String)(body: => T): (T, Row) = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach(seen.add)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = body
      val deadline = System.currentTimeMillis() + 30000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, s"observe '$name' never reached the listener")
      (out, seen.peek())
    } finally spark.listenerManager.unregister(listener)
  }

  test("cumAggPerKey under a 90%-hot key equals the plain running window") {
    // 'hot' carries 90% of rows — the exact shape that melts a single
    // window partition; the bucketed form must be a pure re-plan: every
    // cumulative value bit-equal to the one-partition window's.
    val rows = (0L until 1800L).map(i => ("hot", i, (i % 7) + 1)) ++
      (0L until 200L).map(i => (s"cold${i % 8}", i, (i % 5) + 1))
    val df = rows.toDF("src", "ord", "v")
    val bucketed = Ops.cumAggPerKey(df, Seq("src"), Seq(col("ord")),
        "v", "cum", expr("ord div 64"), "sum")
      .select(col("src"), col("ord"), col("cum"))
      .as[(String, Long, Long)].collect().toMap2
    val plain = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("src")).orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("src"), col("ord"), col("cum"))
      .as[(String, Long, Long)].collect().toMap2
    assert(bucketed.size == 2000 && bucketed == plain,
      "bucketed cumulative diverged from the plain window")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("saltedJoin under a 50%-hot user equals the plain join aggregate") {
    // one user = 50% of the fact side; the salt spreads it over 8 reducers
    // and must change NOTHING about the result (decimal sums — exact, no
    // shuffle-order dependence in the compare)
    val fact = ((0L until 1000L).map(i => (1L, (i % 13 + 1).toString)) ++
      (0L until 1000L).map(i => (i % 50 + 2, (i % 11 + 1).toString)))
      .toDF("user_id", "vs")
      .select(col("user_id"), col("vs").cast("decimal(18,2)").as("v"))
    val dim = (1L to 60L).map(u => (u, s"seg${u % 4}")).toDF("user_id", "seg")
    def agg(j: DataFrame) = j.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val salted = agg(Ops.saltedJoin(fact, dim, "user_id", saltFactor = 8))
    val plainJ = agg(fact.join(dim, Seq("user_id")))
    assert(salted == plainJ && salted.nonEmpty,
      "salted join diverged from the plain join")
  }

  // one band bucket over cap: 600 near-identical docs (the boilerplate
  // mega-cluster) + a handful of genuinely distinct docs
  private val boiler = "the quick brown fox jumps over the lazy dog while " +
    "the storm rolls in across the quiet valley tonight"
  private def megaCorpus = {
    val cluster = (0L until 600L).map(i => (i, boiler))
    val distinct = Seq(
      (9000L, "completely different content about catalyst optimizer rules and spans"),
      (9001L, "another unrelated snippet touching neither fox nor valley at all"),
      (9002L, "a third standalone document speaking only of parquet footers and scans"))
    spark.createDataFrame(cluster ++ distinct).toDF("doc_id", "text")
  }

  test("LSH hot-bucket star guard fires (observe) and preserves cluster components") {
    val capped = 64
    val (pairsCapped, metric) = withMetric("lsh_hot_buckets") {
      Dedup.nearDupPairsMinHash(megaCorpus, "doc_id", "text",
        numHashes = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.6,
        maxBucketSize = capped)
    }
    assert(metric.getAs[Long]("n_capped_buckets") >= 1L,
      s"guard did not fire on a 600-doc bucket at cap $capped: $metric")
    // the star cap thins redundant intra-cluster pairs but must NOT split
    // the component: clusters over capped pairs == clusters over uncapped
    val uncapped = Dedup.nearDupPairsMinHash(megaCorpus, "doc_id", "text",
      numHashes = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.6,
      maxBucketSize = Int.MaxValue)
    def comp(p: DataFrame) = Dedup.duplicateClusters(p, "a", "b")
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val cc = comp(pairsCapped)
    assert(cc == comp(uncapped) && cc.nonEmpty,
      "star substitution changed the duplicate components")
    assert(cc.forall(_._3 == 600L), "the mega-cluster must stay ONE component")
  }

  test("cross-cohort hot-bucket hub guard fires (observe) and preserves the admission verdicts") {
    // standing corpus = the mega-cluster; incoming = 3 more copies of the
    // boilerplate + 1 genuinely new doc. The hub guard collapses the
    // over-cap standing bucket to its min id — the incoming copies still
    // collide with the hub and must still be REJECTED; the new doc admitted.
    val standing = megaCorpus
    val incoming = Seq(
      (20000L, boiler), (20001L, boiler), (20002L, boiler),
      (20003L, "a wholly novel incoming document about watermark semantics only"))
      .toDF("doc_id", "text")
    val capped = 64
    val (rej, metric) = withMetric("cross_lsh_hot_buckets") {
      Dedup.crossNearDupMinHash(incoming, standing, "doc_id", "text",
          maxBucketSize = capped)
        .select("a").as[Long].collect().toSet
    }
    assert(metric.getAs[Long]("n_capped_buckets") >= 1L,
      s"old-side hub guard did not fire: $metric")
    val rejUncapped = Dedup.crossNearDupMinHash(incoming, standing,
        "doc_id", "text", maxBucketSize = Int.MaxValue)
      .select("a").as[Long].collect().toSet
    assert(rej == rejUncapped,
      "hub guard changed which incoming docs are rejected")
    assert(rej == Set(20000L, 20001L, 20002L), s"wrong admission verdicts: $rej")
  }

  test("phash hot-bucket guard fires its observe counter") {
    val cluster = (0L until 300L).map(i => (i, 0x1111222233334444L))
    val d = spark.createDataFrame(cluster).toDF("id", "ph")
    val (pairs, metric) = withMetric("phash_hot_buckets") {
      Multimodal.phashBandPairs(d, "id", "ph", maxBucketSize = 64)
        .as[(Long, Long)].collect()
    }
    assert(metric.getAs[Long]("n_capped_buckets") >= 1L,
      s"phash guard did not fire: $metric")
    assert(pairs.length == 299, "star pairs must stay linear in the bucket")
  }
}
