package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.serve.Materialize

class ServeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("goldTable materializes once within TTL and rebuilds after") {
    val path = Files.createTempDirectory("graft_gold").toString + "/t"
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val first = Materialize.goldTable(spark, path, ttlSeconds = 3600)(build)
    assert(first.count() == 2 && builds == 1)
    val second = Materialize.goldTable(spark, path, ttlSeconds = 3600)(build)
    assert(second.count() == 2 && builds == 1) // cache hit, no rebuild
    Materialize.goldTable(spark, path, ttlSeconds = 0)(build)
    assert(builds == 2) // TTL 0 forces refresh
  }

  test("upsertJdbc replaces matching keys and keeps the rest") {
    val dbDir = Files.createTempDirectory("graft_derby_up").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val props = new java.util.Properties()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    base.write.mode("append").jdbc(url, "dim_t", props)
    val updates = Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    graft.sink.Sinks.upsertJdbc(updates, url, "dim_t", Seq("id"), props)
    val got = spark.read.jdbc(url, "dim_t", props)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map(
      1L -> ("a", 10.0), 2L -> ("b2", 25.0), 3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }
}
