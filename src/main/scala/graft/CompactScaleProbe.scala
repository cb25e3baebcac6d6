package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r19, VERDICT item 6): wall-clock `compact` under MANY
  * segments. The r18 three-decade table probed one append → a 2-segment
  * compact; production runs dozens of appends between compactions, and a
  * compact whose cost grew with segment COUNT (per-segment scans, manifest
  * round-trips, small-file explosion) rather than total DATA would be a
  * 100 TB regression this probe exists to catch.
  *
  * Shape: build the standing index from `standingSfDir`, append `n`
  * disjoint-id batches from `batchSfDir` (n+1 segments), compact — then
  * rebuild the SAME total data as ONE union append (2 segments), compact
  * again. Data-proportional compaction ⇒ the two compact times agree to
  * noise; segment-count-proportional cost shows as the 16-segment compact
  * pulling away. Both lifecycles (DedupIndex, AnnIndex) are probed.
  *
  * Usage: graft.CompactScaleProbe <standingSfDir> <batchSfDir> [nAppends]
  */
object CompactScaleProbe {
  def main(args: Array[String]): Unit = {
    val standingDir = args(0)
    val batchDir = args(1)
    val nAppends = if (args.length > 2) args(2).toInt else 15
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

    def segCount(root: String): Int =
      new java.io.File(root).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("seg-"))

    // disjoint id spans per batch: batch i lives at [off + i·span, …)
    def shifted(df: DataFrame, idCol: String, off: Long, span: Long, i: Int): DataFrame =
      df.withColumn(idCol, col(idCol) + (off + i * span))

    // ---- DedupIndex ------------------------------------------------------
    val standingDocs = graft.sources.Tables.documents(spark, standingDir)
    val batchDocs = graft.sources.Tables.documents(spark, batchDir)
    val dOff = standingDocs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val dSpan = batchDocs.agg(max(col("doc_id"))).head.getLong(0) + 1

    val dMany = java.nio.file.Files.createTempDirectory("graft_probe_cmp_dedup_m").toString
    timed("DedupIndex.build (standing)") {
      graft.serve.DedupIndex.build(spark, dMany, standingDocs, "doc_id", "text")
    }
    timed(s"DedupIndex.append ×$nAppends (disjoint batches)") {
      (0 until nAppends).foreach(i =>
        graft.serve.DedupIndex.append(spark, dMany,
          shifted(batchDocs, "doc_id", dOff, dSpan, i), "doc_id", "text"))
    }
    println(s"          segments before compact: ${segCount(dMany)}")
    timed(s"DedupIndex.compact (${nAppends + 1} segments)") {
      graft.serve.DedupIndex.compact(spark, dMany, retentionMs = 0L)
    }

    val dTwo = java.nio.file.Files.createTempDirectory("graft_probe_cmp_dedup_2").toString
    timed("DedupIndex.build (standing, control)") {
      graft.serve.DedupIndex.build(spark, dTwo, standingDocs, "doc_id", "text")
    }
    val dUnion = (0 until nAppends)
      .map(i => shifted(batchDocs, "doc_id", dOff, dSpan, i))
      .reduce(_.unionByName(_))
    timed("DedupIndex.append ×1 (same total data, one segment)") {
      graft.serve.DedupIndex.append(spark, dTwo, dUnion, "doc_id", "text")
    }
    timed("DedupIndex.compact (2 segments, same total data)") {
      graft.serve.DedupIndex.compact(spark, dTwo, retentionMs = 0L)
    }

    // ---- AnnIndex --------------------------------------------------------
    val standingEmb = spark.read.parquet(s"$standingDir/embeddings.parquet")
    val batchEmb = spark.read.parquet(s"$batchDir/embeddings.parquet")
    val aOff = standingEmb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val aSpan = batchEmb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val nCells = math.ceil(math.sqrt(standingEmb.count().toDouble)).toInt.max(1)

    val aMany = java.nio.file.Files.createTempDirectory("graft_probe_cmp_ann_m").toString
    timed(s"AnnIndex.build (standing, nCells=$nCells)") {
      graft.serve.AnnIndex.build(spark, aMany, standingEmb,
        "vec_id", "embedding", nCells = nCells)
    }
    timed(s"AnnIndex.append ×$nAppends (disjoint batches)") {
      (0 until nAppends).foreach(i =>
        graft.serve.AnnIndex.append(spark, aMany,
          shifted(batchEmb, "vec_id", aOff, aSpan, i), "vec_id", "embedding"))
    }
    println(s"          segments before compact: ${segCount(aMany)}")
    timed(s"AnnIndex.compact (${nAppends + 1} segments)") {
      graft.serve.AnnIndex.compact(spark, aMany, retentionMs = 0L)
    }

    val aTwo = java.nio.file.Files.createTempDirectory("graft_probe_cmp_ann_2").toString
    timed("AnnIndex.build (standing, control)") {
      graft.serve.AnnIndex.build(spark, aTwo, standingEmb,
        "vec_id", "embedding", nCells = nCells)
    }
    val aUnion = (0 until nAppends)
      .map(i => shifted(batchEmb, "vec_id", aOff, aSpan, i))
      .reduce(_.unionByName(_))
    timed("AnnIndex.append ×1 (same total data, one segment)") {
      graft.serve.AnnIndex.append(spark, aTwo, aUnion, "vec_id", "embedding")
    }
    timed("AnnIndex.compact (2 segments, same total data)") {
      graft.serve.AnnIndex.compact(spark, aTwo, retentionMs = 0L)
    }
    spark.stop()
  }
}
