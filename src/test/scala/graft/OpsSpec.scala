package graft

import org.apache.spark.sql.functions._
import graft.functions.Ops

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey keeps exactly the top row per key") {
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("b", 5, 50)).toDF("k", "ord", "v")
    val got = Ops.latestPerKey(df, Seq("k"), Seq(col("ord").desc))
      .select("k", "v").as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 20, "b" -> 50))
  }

  test("asOfJoin attaches the latest right value at or before each left ts") {
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "u", 50L), (4L, "w", 100L))
      .toDF("id", "k", "t")
      .select($"id", $"k", timestamp_micros($"t").as("t"))
    val right = Seq(("u", 100L, 1.0), ("u", 200L, 2.0), ("v", 90L, 9.0))
      .toDF("rk", "rt", "price")
      .select($"rk", timestamp_micros($"rt").as("rt"), $"price")
    val got = Ops.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("price"))
      .select($"id", $"price").as[(Long, Option[Double])].collect().toMap
    // id1: ts=100 matches price@100 (inclusive); id2: latest ≤205 is 2.0;
    // id3: before any price → null; id4: other key → null
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None))
  }

  test("asOfJoin attaches a genuinely-NULL latest value instead of skipping to an older one") {
    val left = Seq((1L, "u", 300L)).toDF("id", "k", "t")
      .select($"id", $"k", timestamp_micros($"t").as("t"))
    val right = Seq(("u", 100L, Some(5.0)), ("u", 200L, None))
      .toDF("rk", "rt", "price")
      .select($"rk", timestamp_micros($"rt").as("rt"), $"price")
    val got = Ops.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("price"))
      .select($"price").as[Option[Double]].head()
    // the latest right ROW (ts=200) has price NULL — true as-of semantics
    // (and SQL ASOF JOIN) attach NULL, not the older 5.0
    assert(got.isEmpty)
  }

  test("dateScaffold emits every day inclusive") {
    val bounds = Seq(("2024-01-01", "2024-01-05")).toDF("lo", "hi")
      .select($"lo".cast("timestamp").as("lo"), $"hi".cast("timestamp").as("hi"))
    val days = Ops.dateScaffold(bounds, col("lo"), col("hi"), "day")
    assert(days.count() == 5)
  }

  test("leadGlobal equals the single-partition global lead (distinct keys)") {
    import org.apache.spark.sql.expressions.Window
    // keys engineered around a small bucket: consecutive pairs straddling
    // bucket boundaries (7,8), (15,16), whole empty buckets between 16 and
    // 40, a gap inside a bucket (3→7), and a lone global max
    val keys = Seq(1L, 2L, 3L, 7L, 8L, 15L, 16L, 40L, 41L, 99L)
    val df = keys.toDF("k").repartition(4)
    val got = Ops.leadGlobal(df, "k", bucket = 8)
      .select($"k", $"next_k").as[(Long, Option[Long])].collect().toMap
    val want = df
      .withColumn("next_k", lead($"k", 1).over(Window.orderBy($"k")))
      .select($"k", $"next_k").as[(Long, Option[Long])].collect().toMap
    assert(got == want)
    assert(got(99L).isEmpty && got(16L).contains(40L) && got(7L).contains(8L))
  }
}
