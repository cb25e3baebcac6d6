package graft

import org.apache.spark.sql.Row
import graft.queries.EvalQueries

/** Driver-side first-principles replays of the eval/decision operators:
  * each test recomputes the query's answer from collected raw rows with
  * naive definitional code (O(n²) dominance scans, union-find, textbook
  * rank statistics) and requires exact equality with the distributed
  * result. The DuckDB oracle already checks these end-to-end; these specs
  * pin the SEMANTICS against an independent in-process implementation so
  * a simultaneous engine+oracle drift cannot pass silently.
  */
class EvalSpec extends SparkSpec {

  private def run(name: String) = EvalQueries.queries(name)(spark, sfDir)

  private def docs: Seq[(String, Long, Long)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "cast(n_chars as bigint)",
        "cast(case when lang = 'en' then 1 else 0 end as bigint)")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("auc: tie-aware rank-sum replay matches per source") {
    val got = run("q_x_auc").collect()
      .map(r => r.getString(0) -> r).toMap
    val bySource = docs.groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    for ((src, rows) <- bySource) {
      val scores = rows.map(_._2).sorted
      // average rank per score value, doubled to stay integral
      val rank2 = scores.distinct.map { v =>
        val below = scores.count(_ < v)
        val tied = scores.count(_ == v)
        v -> (2 * below + tied + 1).toLong
      }.toMap
      val npos = rows.count(_._3 == 1L).toLong
      val nneg = rows.size - npos
      val r2 = rows.filter(_._3 == 1L).map(r => rank2(r._2)).sum
      val u2 = r2 - npos * (npos + 1)
      val r = got(src)
      assert(r.getLong(r.fieldIndex("n_pos")) == npos, src)
      assert(r.getLong(r.fieldIndex("n_neg")) == nneg, src)
      assert(r.getLong(r.fieldIndex("u2")) == u2, src)
      if (npos > 0 && nneg > 0)
        assert(r.getDouble(r.fieldIndex("auc")) ==
          u2.toDouble / (2.0 * npos * nneg), src)
      else assert(r.isNullAt(r.fieldIndex("auc")), src)
    }
  }

  test("auc: hand-checked four-row fixture with a tie") {
    // scores 1,2,2,3 / labels 0,0,1,1: ranks 1, 2.5, 2.5, 4 →
    // R+ = 2.5 + 4 = 6.5, U = 3.5, AUC = 3.5 / 4 = 0.875, u2 = 7
    val scores = Seq(1L, 2L, 2L, 3L); val labels = Seq(0L, 0L, 1L, 1L)
    val rank2 = scores.distinct.map { v =>
      v -> (2 * scores.count(_ < v) + scores.count(_ == v) + 1).toLong
    }.toMap
    val r2 = scores.zip(labels).filter(_._2 == 1L).map(p => rank2(p._1)).sum
    assert(r2 - 2L * 3L == 7L)
  }

  test("calibration: equal-width bins cover 0..9 and rates replay") {
    val all = docs
    val minc = all.map(_._2).min; val maxc = all.map(_._2).max
    val expected = all.groupBy(t => (t._2 - minc) * 10 / (maxc - minc + 1))
      .map { case (bin, rows) =>
        bin -> (rows.size.toLong, rows.map(_._3).sum,
          rows.map(_._3).sum * 10000 / rows.size, rows.map(_._2).sum)
      }
    val got = run("q_x_calibration").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.keySet.subsetOf((0L to 9L).toSet))
  }

  test("confusion: counts and guarded integer rates replay") {
    val got = run("q_x_confusion").collect().map(r => r.getString(0) -> r).toMap
    for ((src, rows) <- docs.groupBy(_._1)) {
      val tp = rows.count(t => t._2 >= 300 && t._3 == 1L).toLong
      val fp = rows.count(t => t._2 >= 300 && t._3 == 0L).toLong
      val fn = rows.count(t => t._2 < 300 && t._3 == 1L).toLong
      val tn = rows.count(t => t._2 < 300 && t._3 == 0L).toLong
      val r = got(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((tp, fp, fn, tn)), src)
      def cell(i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(cell(5) == (if (tp + fp > 0) Some(tp * 10000 / (tp + fp)) else None))
      assert(cell(6) == (if (tp + fn > 0) Some(tp * 10000 / (tp + fn)) else None))
      assert(cell(7) == (if (2 * tp + fp + fn > 0)
        Some(tp * 20000 / (2 * tp + fp + fn)) else None))
    }
  }

  test("skyline: bucketized running-max form equals the O(n²) dominance scan") {
    val pts = spark.read.parquet(s"$sfDir/part.parquet")
      .selectExpr("p_partkey",
        "cast(cast(p_retailprice as decimal(18,2)) * 100 as bigint)",
        "cast(p_size as bigint)")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val expected = pts.filter(p => !pts.exists(q => dominates(q, p)))
      .map(p => (p._1, p._2, p._3, pts.count(q => dominates(p, q)).toLong))
      .toSet
    val got = run("q_x_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("skyline: duplicate frontier points both survive; boundary straddle") {
    import spark.implicits._
    // prices straddle the 10000-cent bucket boundary on purpose; the
    // duplicate (9999, 5) pair dominates neither copy
    val df = Seq((1L, 9999L, 5L), (2L, 9999L, 5L), (3L, 10001L, 7L),
      (4L, 10002L, 7L), (5L, 10001L, 4L), (6L, 20000L, 9L))
      .toDF("p_partkey", "price_cents", "p_size")
    // replay the registry query's frontier logic through a temp view is
    // overkill — assert the definitional skyline here and rely on the
    // sf-fixture test above for the bucketized implementation itself
    val pts = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dom(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    // 4 loses to 3 (cheaper, same size); 5 loses to 3 (same price, more size)
    val sky = pts.filter(p => !pts.exists(q => dom(q, p))).map(_._1).toSet
    assert(sky == Set(1L, 2L, 3L, 6L))
  }

  test("fs_linkage: weight-table replay with an independent levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "c_name", "cast(c_nationkey as bigint)", "c_mktsegment",
        "cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val expected = (for {
      a <- cust; b <- cust
      if a._3 == b._3 && a._1 < b._1
      score = (if (lev(a._2, b._2) <= 1) 35L else -15L) +
        (if (a._4 == b._4) 15L else -8L) +
        (if (math.abs(a._5 - b._5) <= 10000L) 25L else -10L)
      if score >= 17
    } yield (a._1, b._1, score, if (score >= 50) "match" else "possible")).toSet
    val got = run("q_x_fs_linkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dbscan: grid candidates + star CC equal the naive union-find replay") {
    // quantize on the driver with the same formula as Similarity.int8Quant
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect().toSeq.map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val m = v.map(math.abs).max
        def qz(x: Double): Long = if (m == 0) 0L else math.floor(x * 127.0 / m + 0.5).toLong
        (r.getLong(0), qz(v(0)), qz(v(1)))
      }
    val eps = 6; val minPts = 4
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) =
      math.abs(a._2 - b._2) <= eps && math.abs(a._3 - b._3) <= eps
    val cores = raw.filter(p => raw.count(o => near(p, o)) >= minPts)
      .map(_._1).toSet
    // union-find over core-core eps-pairs
    val parent = scala.collection.mutable.Map(cores.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- raw if cores(a._1); b <- raw if cores(b._1) && a._1 < b._1
         if near(a, b)) {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = cores.map(c => c -> find(c)).toMap
    val byId = raw.map(p => p._1 -> p).toMap
    val expected = raw.map { p =>
      if (cores(p._1)) (p._1, "core", Some(label(p._1)))
      else {
        val coreNbr = raw.filter(o => cores(o._1) && o._1 != p._1 && near(p, o))
        if (coreNbr.nonEmpty) (p._1, "border", Some(coreNbr.map(o => label(o._1)).min))
        else (p._1, "noise", None)
      }
    }.toSet
    val got = run("q_x_dbscan").collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toSet
    assert(got == expected)
    assert(got.exists(_._2 == "core") && got.exists(_._2 == "noise"))
    assert(byId.nonEmpty)
  }
}
