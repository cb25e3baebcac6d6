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
  }
}
