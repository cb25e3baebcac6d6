package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted plans for named queries so scan pushdown,
  * join strategy, and codegen spans can be audited.
  * Usage: graft.ExplainAudit <sfDir> <queryName>...
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
