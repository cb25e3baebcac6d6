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
}
