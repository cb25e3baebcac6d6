package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives the SparkSessionExtensions registration: the native expressions
  * must be callable from plain SQL in a session built with GraftExtensions.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // getOrCreate would hand back the suite-shared session and silently skip
    // withExtensions — clear first so this builder really applies them
    // (tests run serially; see Test/parallelExecution in build.sbt)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[2]")
    .appName("ExtensionsSpec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
    .getOrCreate()
  }

  test("LatestPerKeyRule rewrites row_number()=1 into max_by and matches the window result") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1, 10L, "a1"), (1, 20L, "a2"), (1, 15L, "a3"),
      (2, 5L, "b1"), (2, 7L, "b2")
    ).toDF("k", "ord", "v")
    val latest = graft.functions.Ops.latestPerKey(df, Seq("k"), Seq(col("ord").desc))
    val plan = latest.queryExecution.optimizedPlan.toString
    assert(plan.contains("max_by") && !plan.contains("row_number"),
      s"rule should have rewritten the window:\n$plan")
    val got = latest.select($"k", $"v").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "a2", 2 -> "b2"))
    // ascending variant → min_by
    val first = graft.functions.Ops.latestPerKey(df, Seq("k"), Seq(col("ord").asc))
    assert(first.queryExecution.optimizedPlan.toString.contains("min_by"))
    assert(first.select($"k", $"v").as[(Int, String)].collect().toMap ==
      Map(1 -> "a1", 2 -> "b1"))
    // nullable order key → rule must NOT fire (max_by drops null-keyed rows)
    val nullable = df.withColumn("ordN", when($"ord" > 6L, $"ord"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"k").orderBy($"ordN".desc)
    val viaWindow = nullable.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(viaWindow.queryExecution.optimizedPlan.toString.contains("row_number"))
  }

  test("native expressions are callable from SQL") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64(array(CAST(15 AS BIGINT)))").head().getLong(0)
    assert(sh == 15L) // single hash: bits of the hash itself win
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(5 AS BIGINT)), " +
        "array(CAST(3 AS BIGINT), CAST(5 AS BIGINT), CAST(7 AS BIGINT)))").head().getInt(0)
    assert(ic == 2)
    // proto field extraction: X'089601' = field1 varint 150
    val pv = spark.sql("SELECT proto_varint(X'089601', 1)").head().getLong(0)
    assert(pv == 150L)
    val pb = spark.sql("SELECT CAST(proto_bytes(X'120774657374696E67', 2) AS STRING)")
      .head().getString(0)
    assert(pb == "testing")
    // one-pass signature kernels from SQL
    val ms = spark.sql("SELECT minhash_sig('a b c d', 4, 3)").head().getSeq[Long](0)
    assert(ms.length == 4)
    val st = spark.sql("SELECT simhash_text('hello world hello')").head().getLong(0)
    assert(st != 0L)
    val msc = spark.sql("SELECT minhash_sig_char('abcdefgh', 4, 5)").head().getSeq[Long](0)
    assert(msc.length == 4)
    // identical texts must produce identical hash sets; sets are sorted
    val gh = spark.sql(
      "SELECT sorted_intersect_count(gram_hashes('abcdef', 5), gram_hashes('abcdef', 5))")
      .head().getInt(0)
    assert(gh == 2) // 'abcde', 'bcdef'
    val shh = spark.sql(
      "SELECT sorted_intersect_count(shingle_hashes('a b c d', 3), shingle_hashes('a b c d e', 3))")
      .head().getInt(0)
    assert(shh == 2) // 'a b c', 'b c d'
  }

  test("sketch aggregates are callable from SQL (analyzer wraps bare AggregateFunctions)") {
    import spark.implicits._
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("sk_terms")
    // build + estimate round trip: estimates must reproduce exact counts at
    // a width with no collisions for two terms
    val est = spark.sql(
      """SELECT t, cms_estimate(cms, t, 4, 64) AS est FROM sk_terms
        |CROSS JOIN (SELECT cms_sketch(t, 4, 64) AS cms FROM sk_terms)
        |GROUP BY t, cms ORDER BY t""".stripMargin)
      .select($"t", $"est").as[(String, Long)].collect().toSeq
    assert(est == Seq(("x", 2L), ("y", 1L)))
    val vs = spark.sql(
      """SELECT long_vector_sum(v) AS s FROM (
        |  SELECT array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS v
        |  UNION ALL SELECT array(CAST(10 AS BIGINT), CAST(20 AS BIGINT)))""".stripMargin)
      .head().getSeq[Long](0)
    assert(vs == Seq(11L, 22L))
    // theta set algebra from SQL: {1,2,3} vs {2,3,4} (exact mode)
    val th = spark.sql(
      """SELECT theta_estimate(a) AS na, theta_intersect(a, b) AS nb, theta_diff(a, b) AS nd
        |FROM (SELECT theta_sketch(CAST(x AS BIGINT), 12) AS a,
        |             theta_sketch(CAST(y AS BIGINT), 12) AS b
        |      FROM VALUES (1, 2), (2, 3), (3, 4) AS t(x, y))""".stripMargin)
      .head()
    assert((th.getLong(0), th.getLong(1), th.getLong(2)) == ((3L, 2L, 1L)))
  }
}
