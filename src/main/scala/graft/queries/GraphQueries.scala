package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.sources.Tables

/** Graph-census queries over relationship graphs derived from the star
  * schema — the non-iterative sibling of the PageRank entry (iterative
  * centrality lives in ExtTextQueries next to its corpus signals).
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact triangle census + global clustering coefficient over the
    // supplier co-occurrence graph (suppliers strongly tied = appear in
    // ≥5 common orders — the weight threshold keeps the graph a "strong
    // tie" graph instead of saturating toward a clique as orders grow).
    // Graph.triangleStats runs the degree-oriented algorithm: every edge
    // points from its lower-(degree, id) endpoint, bounding oriented
    // out-degree at O(√m) for ANY graph, so the wedge self-join never
    // melts down on a hub — a star's center generates ZERO wedge
    // candidates under this orientation. The oracle replays the census
    // with the straightforward id-ordered triple join (a<b<c), which
    // counts the same triangles by a different argument — an independent
    // proof, not a transcription.
    "q_x_triangles" -> { (s, dir) =>
      val co = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sp")).distinct()
      val edges = co.as("x").join(co.as("y"), "ok")
        .filter(col("x.sp") < col("y.sp"))
        .groupBy(col("x.sp").as("a"), col("y.sp").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
      Graph.triangleStats(edges, "a", "b")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_x_triangles" ->
      """WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sp FROM lineitem),
        |ce AS (SELECT x.sp AS a, y.sp AS b FROM d x JOIN d y ON x.ok = y.ok AND x.sp < y.sp
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |deg AS (SELECT n, count(*) AS dg FROM
        |  (SELECT a AS n FROM ce UNION ALL SELECT b AS n FROM ce) GROUP BY 1),
        |tri AS (SELECT count(*) AS t FROM ce e1
        |  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM ce) AS n_edges,
        |  (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  CAST((SELECT t FROM tri) * 3 * 10000
        |    // (SELECT sum(dg * (dg - 1) // 2) FROM deg) AS BIGINT) AS clustering_bp""".stripMargin
  )
}
