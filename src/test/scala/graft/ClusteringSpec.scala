package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight 2-d blobs far apart, plus two stragglers; ids spaced 70000
  // apart so members of one cluster STRADDLE the 65536-wide exact-fold
  // buckets (the two-level order differs from a flat id-sorted fold)
  private val pts = Seq(
    (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0),
    (5L, 10.0, 10.0), (6L, 11.0, 10.0), (7L, 10.0, 11.0), (8L, 11.0, 11.0),
    (9L, 5.0, 5.0), (10L, 5.5, 5.0)
  ).map(p => (p._1 * 70000L, p._2, p._3)).toDF("id", "x", "y")

  private def driverKMeans(data: Seq[(Long, Double, Double)], k: Int,
      iters: Int): Map[Long, (Long, Double, Double)] = {
    // the operator's exact contract: smallest-(features, id) init, argmin
    // with cid tie-break, id-sorted mean folds, empty keeps centroid
    var ctr = data.sortBy(p => (p._2, p._3, p._1)).take(k).zipWithIndex
      .map { case (p, i) => i.toLong -> ((p._2, p._3)) }.toMap
    var sizes = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val assigned = data.map { p =>
        val cid = ctr.toSeq.map { case (c, (cx, cy)) =>
          (((p._2 - cx) * (p._2 - cx) + (p._3 - cy) * (p._3 - cy)), c)
        }.min._2
        (cid, p)
      }
      sizes = assigned.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      ctr = ctr.map { case (c, old) =>
        val members = assigned.filter(_._1 == c).map(_._2)
        if (members.isEmpty) c -> old
        else {
          // the operator's two-level exact fold: id-sorted within 65536-id
          // buckets, then bucket-sorted across bucket sums
          val buckets = members.groupBy(_._1 / 65536).toSeq.sortBy(_._1).map(_._2)
          val sx = buckets.foldLeft(0.0)((a, b) =>
            a + b.sortBy(_._1).foldLeft(0.0)((aa, p) => aa + p._2))
          val sy = buckets.foldLeft(0.0)((a, b) =>
            a + b.sortBy(_._1).foldLeft(0.0)((aa, p) => aa + p._3))
          c -> ((sx / members.size, sy / members.size))
        }
      }
    }
    ctr.map { case (c, (cx, cy)) => c -> ((sizes.getOrElse(c, 0L), cx, cy)) }
  }

  test("kMeans matches the driver replay bit-for-bit and separates the blobs") {
    val data = pts.as[(Long, Double, Double)].collect().toSeq
    val got = Clustering.kMeans(pts, "id", Seq("x", "y"), k = 3, iters = 3)
      .select(col("cluster"), col("n_points"),
        element_at(col("centroid"), 1), element_at(col("centroid"), 2))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = driverKMeans(data, k = 3, iters = 3)
    assert(got == want, s"got $got vs $want")
    // the far blob resolves to its own centroid at (10.5, 10.5)
    assert(got.values.exists { case (n, cx, cy) => n == 4L && cx == 10.5 && cy == 10.5 })
    assert(got.values.map(_._1).sum == data.size)
  }

  test("plain-sum production tier stays within 1e-9 of the exact folds") {
    val exact = Clustering.kMeans(pts, "id", Seq("x", "y"), k = 3, iters = 3)
      .select(col("cluster"), element_at(col("centroid"), 1),
        element_at(col("centroid"), 2))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = Clustering.kMeans(pts, "id", Seq("x", "y"), k = 3, iters = 3,
      exactFold = false)
      .select(col("cluster"), element_at(col("centroid"), 1),
        element_at(col("centroid"), 2))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(exact.keySet == plain.keySet)
    exact.foreach { case (c, (x, y)) =>
      assert(math.abs(x - plain(c)._1) <= 1e-9 && math.abs(y - plain(c)._2) <= 1e-9)
    }
  }

  test("an emptied cluster keeps its previous centroid and reports 0 points") {
    // k = 2 over two coincident points: both land on cid 0 (equidistant —
    // the cid tie-break), so cid 1 is never fed, keeps its init centroid,
    // and reports n_points = 0 instead of a NULL/NaN mean
    val tiny = Seq((1L, 0.0), (2L, 0.0)).toDF("id", "x")
    val got = Clustering.kMeans(tiny, "id", Seq("x"), k = 2, iters = 2)
      .select(col("cluster"), col("n_points"), element_at(col("centroid"), 1))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((2L, 0.0)))
    assert(got(1L) == ((0L, 0.0)))
    assert(got.size == 2)
  }
}
