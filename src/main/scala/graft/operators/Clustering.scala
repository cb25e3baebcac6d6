package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd clustering as a FIRST-CLASS oracled operator. The IVF /
  * PQ vector tiers in [[Similarity]] train codebooks with the same loop but
  * live behind recall specs (float sums over 64-dim embeddings); this is the
  * deterministic-exact form over explicit feature columns, built so a DuckDB
  * replay agrees bit-for-bit — the same contract as [[Graph.pageRank]]:
  * every double sum folds in one data-pinned order.
  */
object Clustering {

  /** k-means (Lloyd) over `featureCols`, `iters` synchronous rounds.
    *
    * Determinism contract, stated piece by piece:
    *   - init: the k lexicographically-smallest (features…, id) rows,
    *     cluster ids 0..k−1 in that order — no RNG, replayable as an
    *     ORDER BY … LIMIT k on any engine;
    *   - assignment: argmin over (squaredDist, cid) — the cid tie-break
    *     pins equidistant points; the distance tree is the left-to-right
    *     feature fold both engines build identically;
    *   - update: per-cluster per-feature mean, the sum folded over the
    *     ID-SORTED member list (`exactFold = true`) so the association
    *     order is data-pinned — the [[Graph.pageRank]] exactFold move.
    *     An emptied cluster keeps its previous centroid.
    *
    * `exactFold = false` swaps the sorted folds for plain streaming sums —
    * the production tier (map-side partial aggregation, O(d) state per
    * cluster instead of a member-list buffer), last-ulp shuffle-order
    * nondeterministic, spec-pinned ≤1e-9 against the exact tier.
    *
    * Scale shape, per round: one broadcast of the k×d centroid table onto
    * the point scan (the assignment is a NARROW map — no shuffle moves the
    * points), one cluster-keyed aggregate for the update (k keys; with
    * plain sums the partial agg collapses map-side, so the shuffle carries
    * k·d doubles per task). The point table is localCheckpointed once —
    * the loop references it every round; per-round checkpoints cut the
    * re-optimized lineage like every iterative operator here.
    *
    * Returns (cluster, n_points, centroid array<double>): the post-update
    * centroids after `iters` rounds with the LAST assignment's sizes
    * (n_points = 0 for a cluster emptied in the final round).
    */
  def kMeans(points: DataFrame, idCol: String, featureCols: Seq[String],
      k: Int, iters: Int, exactFold: Boolean = true): DataFrame = {
    require(k >= 1 && iters >= 1, "kMeans: k >= 1, iters >= 1")
    val d = featureCols.size
    val pts = points.select(col(idCol).cast("long").as("__id"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("__fs"))
      .localCheckpoint()
    val initOrder = (1 to d).map(i => element_at(col("__fs"), i).asc) :+ col("__id").asc
    var ctr = pts.orderBy(initOrder: _*).limit(k)
      .withColumn("cid", row_number().over(Window.orderBy(initOrder: _*)) - 1)
      .select(col("cid"), col("__fs").as("__cs"))
    var upd: DataFrame = null
    for (_ <- 1 to iters) {
      val assigned = pts.crossJoin(broadcast(ctr))
        .select(col("__id"), col("__fs"), col("cid"),
          aggregate(zip_with(col("__fs"), col("__cs"), (x, c) => (x - c) * (x - c)),
            lit(0.0), (acc, v) => acc + v).as("__dist"))
        .groupBy(col("__id"))
        .agg(min_by(struct(col("cid"), col("__fs")),
          struct(col("__dist"), col("cid"))).as("__m"))
        .select(col("__id"), col("__m.cid").as("cid"), col("__m.__fs").as("__fs"))
      upd =
        if (exactFold)
          assigned.groupBy(col("cid"))
            .agg(count(lit(1)).as("__n"),
              aggregate(sort_array(collect_list(struct(col("__id"), col("__fs")))),
                array((0 until d).map(_ => lit(0.0)): _*),
                (acc, x) => zip_with(acc, x.getField("__fs"), (a, v) => a + v))
                .as("__sum"))
        else
          assigned.groupBy(col("cid"))
            .agg(count(lit(1)).as("__n"),
              array((1 to d).map(i => sum(element_at(col("__fs"), i))): _*).as("__sum"))
      ctr = ctr.join(upd, Seq("cid"), "left")
        .select(col("cid"),
          when(col("__n").isNull, col("__cs"))
            .otherwise(transform(col("__sum"), s => s / col("__n"))).as("__cs"))
        .localCheckpoint()
    }
    ctr.join(upd.select(col("cid"), col("__n")), Seq("cid"), "left")
      .select(col("cid").cast("long").as("cluster"),
        coalesce(col("__n"), lit(0L)).as("n_points"),
        col("__cs").as("centroid"))
  }
}
