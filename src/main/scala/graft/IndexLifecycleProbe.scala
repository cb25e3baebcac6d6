package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r18 VERDICT item 3): wall-clock the two persisted index
  * lifecycles at a REAL scale step — build the standing index from a large
  * SF, admit + append a one-decade-smaller batch, compact — and print each
  * step, so "append is batch-proportional, never corpus-proportional" is a
  * measurement, not a design claim (the same probe discipline that caught
  * q_x_blocking_report's uncapped truth sample in r17).
  *
  * Usage: graft.IndexLifecycleProbe <standingSfDir> <batchSfDir>
  * The batch cohort's ids are offset past the standing corpus so the two
  * cohorts never collide (the cross-admission id contract).
  */
object IndexLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val standingDir = args(0)
    val batchDir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label")
      r
    }

    // ---- DedupIndex: build(standing) / admit / append(batch) / compact
    val standingDocs = graft.sources.Tables.documents(spark, standingDir)
    val idOffset = standingDocs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val batchDocs = graft.sources.Tables.documents(spark, batchDir)
      .withColumn("doc_id", col("doc_id") + idOffset)
    val dRoot = java.nio.file.Files.createTempDirectory("graft_probe_dedup_idx").toString
    timed("DedupIndex.build (standing corpus)") {
      graft.serve.DedupIndex.build(spark, dRoot, standingDocs, "doc_id", "text")
    }
    val rejections = timed("DedupIndex.admitNearDupsIndexOnly (batch)") {
      graft.serve.DedupIndex.admitNearDupsIndexOnly(spark, dRoot, batchDocs,
        "doc_id", "text").count()
    }
    println(s"          rejection pairs: $rejections")
    timed("DedupIndex.append (batch)") {
      graft.serve.DedupIndex.append(spark, dRoot, batchDocs, "doc_id", "text")
    }
    timed("DedupIndex.compact") {
      graft.serve.DedupIndex.compact(spark, dRoot, retentionMs = 0L)
    }

    // ---- AnnIndex: build(standing) / search(fixed batch) / append / compact
    val standingEmb = spark.read.parquet(s"$standingDir/embeddings.parquet")
    val vecOffset = standingEmb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val batchEmb = spark.read.parquet(s"$batchDir/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + vecOffset)
    val n = standingEmb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
    val aRoot = java.nio.file.Files.createTempDirectory("graft_probe_ann_idx").toString
    timed(s"AnnIndex.build (standing corpus, nCells=$nCells)") {
      graft.serve.AnnIndex.build(spark, aRoot, standingEmb,
        "vec_id", "embedding", nCells = nCells)
    }
    val served = timed("AnnIndex.search (fixed 100-query batch, nProbe=8)") {
      graft.serve.AnnIndex.search(spark, aRoot, standingEmb,
        standingEmb.filter(col("vec_id") < 100), "vec_id", "vec_id",
        "embedding", k = 5, nProbe = 8).count()
    }
    println(s"          served rows: $served")
    timed("AnnIndex.append (batch, stored codebook)") {
      graft.serve.AnnIndex.append(spark, aRoot, batchEmb, "vec_id", "embedding")
    }
    timed("AnnIndex.compact") {
      graft.serve.AnnIndex.compact(spark, aRoot, retentionMs = 0L)
    }
    spark.stop()
  }
}
