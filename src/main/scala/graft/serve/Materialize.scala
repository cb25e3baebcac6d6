package graft.serve

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Serving-layer equivalent of the reference's cache tier (SURVEY §2.12):
  * the ~33 moka caches with TTL + proactive refresh become materialized gold
  * tables refreshed on the aggregation cadence. A named query's result is
  * parquet on disk; readers get the last materialization until the TTL
  * lapses, then the builder runs once and atomically replaces it.
  */
object Materialize {

  /** Read the gold table at `path`, rebuilding via `build` when absent or
    * older than `ttlSeconds` (TTL 0 forces rebuild). Concurrent readers keep
    * the old snapshot until the overwrite commits.
    */
  def goldTable(spark: SparkSession, path: String, ttlSeconds: Long)
      (build: => DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val stale = !fs.exists(p) ||
      (System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime) / 1000 >= ttlSeconds
    if (stale) build.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }
}
