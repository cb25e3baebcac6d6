package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Ops

/** Drives the 100 TB scale techniques locally: salted joins produce the same
  * rows as plain joins, and bucketed tables co-locate joins (no shuffle
  * exchange in the plan).
  */
class ScaleTechniqueSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toDouble))
      .toDF("k", "v") // key 1 is hot
    val dim = (1L to 100L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Ops.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // One hot key dominates the left side; with broadcast disabled the
    // sort-merge join would put the whole hot partition on one task. AQE's
    // OptimizeSkewedJoin must split it — the final adaptive plan marks the
    // join skew=true. Thresholds are forced low so the ~MB-scale test data
    // trips the same code path a skewed 100 TB key set would.
    val prev = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hot = (1 to 200000).map(i => (1L, s"payload_$i"))
      val rest = (1 to 2000).map(i => (i.toLong % 97 + 2, s"p$i"))
      val fact = (hot ++ rest).toDF("k", "v").repartition(8)
      val dim = (1L to 100L).map(k => (k, s"name$k")).toDF("k", "name")
      val joined = fact.join(dim, Seq("k"))
      // drive THIS QueryExecution (count() would plan a separate one and
      // leave joined's adaptive plan unexecuted / non-final)
      assert(joined.collect().length == 202000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skew=true:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // managed tables land in ./spark-warehouse (static conf); DROP TABLE
    // below removes the files
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // bucket join needs one-partition-per-bucket reading; disable AQE
    // coalescing interference for the plan check
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }

  test("rendezvous sharding: adding a shard only moves keys TO the new shard") {
    // the HRW invariant pmod resharding cannot give: the 0..7 argmax and
    // the 0..8 argmax differ exactly where shard 8 wins, so every moved
    // key lands on the new shard and the moved fraction is ≈ 1/9
    val docs = spark.range(0, 3000).toDF("k")
    val s8 = Ops.rendezvousShard(docs, "k", 8).as[(Long, Int)].collect().toMap
    val s9 = Ops.rendezvousShard(docs, "k", 9).as[(Long, Int)].collect().toMap
    val moved = s8.keys.filter(k => s8(k) != s9(k)).toSeq
    assert(moved.nonEmpty)
    assert(moved.forall(k => s9(k) == 8), "a moved key must land on the NEW shard")
    val frac = moved.size.toDouble / s8.size
    assert(frac > 0.03 && frac < 0.25, s"moved fraction $frac should be ≈ 1/9")
    // balance sanity: all 8 shards populated, none starved
    val sizes = s8.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.min > 3000 / 8 / 3)
    // the r14 narrow-fold form preserves row MULTIPLICITY (the r13
    // explode+regroup silently collapsed duplicate rows — ADVICE r13) and
    // shuffles nothing: duplicates stay duplicated, each with the same
    // deterministic shard, and the plan has no Exchange at all
    val dup = Seq(7L, 7L, 7L, 11L).toDF("k")
    val ds = Ops.rendezvousShard(dup, "k", 8)
    assert(ds.count() == 4L)
    val byK = ds.as[(Long, Int)].collect().groupBy(_._1)
    assert(byK(7L).length == 3 && byK(7L).map(_._2).distinct.length == 1)
    assert(byK(7L).head._2 == s8(7L) && byK(11L).head._2 == s8(11L))
    assert(!Ops.rendezvousShard(docs, "k", 8).queryExecution.executedPlan
      .toString.contains("Exchange"), "rendezvousShard must stay narrow")
  }

  test("quota split is exact per stratum; leakage-safe split never straddles a pair") {
    // quota exactness: every lang's train/val/test sizes are exactly
    // floor(n·0.8) / floor(n·0.9)−floor(n·0.8) / the rest — the property
    // the hash tier only has in expectation
    val quota = SparkEntry.queries("q_x_split_quota")(spark, sfDir)
      .groupBy($"lang", $"split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perLang = quota.keys.map(_._1).toSet
    assert(perLang.nonEmpty)
    perLang.foreach { lang =>
      val n = quota.filter(_._1._1 == lang).values.sum
      val train = quota.getOrElse((lang, "train"), 0L)
      val vl = quota.getOrElse((lang, "val"), 0L)
      assert(train == n * 8000 / 10000, s"$lang train quota")
      assert(vl == n * 9000 / 10000 - n * 8000 / 10000, s"$lang val quota")
    }

    // leakage safety: recompute the near-dup pairs and the cluster-keyed
    // assignment exactly as q_x_split_safe does, then assert NO pair has
    // its two ends in different splits — the invariant that doc-id
    // hashing breaks (same pairs, per-doc draws) whenever a cluster's
    // members straddle a bucket boundary
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val pairs = graft.operators.Dedup.nearDupPairsMinHash(docs, "doc_id", "text",
      numHashes = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.6)
    val clusters = graft.operators.Dedup.duplicateClusters(pairs, "a", "b")
    val keyed = docs.select($"doc_id")
      .join(clusters.select($"doc_id", $"cluster_id"), Seq("doc_id"), "left")
      .withColumn("skey", coalesce($"cluster_id", $"doc_id"))
      .withColumn("split", graft.operators.TextOps.splitAssign($"skey"))
      .select($"doc_id", $"split")
    val straddling = pairs
      .join(keyed.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), "a")
      .join(keyed.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), "b")
      .filter($"sa" =!= $"sb")
    assert(straddling.isEmpty, "a near-dup pair straddles splits")
    assert(pairs.count() > 0, "the invariant needs pairs to bite on")
  }
}
