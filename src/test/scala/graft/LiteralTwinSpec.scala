package graft

import org.apache.spark.sql.functions._
import graft.queries.LiteralTwinQueries

/** Structural invariants of the literal DAO twins that the row-hash oracle
  * compare cannot express: page contracts (exact size), dim-census contracts
  * (a histogram must render every bucket), and value-domain contracts (a
  * percentage stays in [0, 100]). These hold at ANY scale factor, so a twin
  * edit that keeps hash parity at one sf but breaks the page/domain contract
  * (an OFFSET typo, a dropped bucket row, a sign slip) fails here.
  */
class LiteralTwinSpec extends SparkSpec {

  private def run(name: String) = LiteralTwinQueries.queries(name)(spark, sfDir)

  test("pnl_buckets renders the full five-bucket census in ordinal order") {
    val rows = run("q_lit_pnl_buckets").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("<0", "0-50", "51–100", "101–300", "301+"),
      "the inline bucket dim must render every bucket, empty ones included")
    // shares are percentages of a whole: each in [0,100], non-empty total
    val shares = rows.map(_.getDouble(2))
    assert(shares.forall(s => s >= 0.0 && s <= 100.0))
    assert(rows.map(_.getLong(1)).sum > 0, "wallet cohort must have positions")
  }

  test("win_rate is a percentage in [0, 100]") {
    val v = run("q_lit_win_rate").collect()(0).getDouble(0)
    assert(v >= 0.0 && v <= 100.0, s"win rate $v out of domain")
  }

  test("historically_opened honors its OFFSET/LIMIT page contract") {
    val df = run("q_lit_historically_opened")
    val rows = df.collect()
    assert(rows.length == 60, s"page must be exactly LIMIT 60 rows (got ${rows.length})")
    // newest-first page: opening dates never increase down the page
    // (Spark 4 surfaces timestamps as java.time.LocalDateTime)
    val dates = rows.map(_.getAs[java.time.LocalDateTime]("opening_date"))
    assert(dates.zip(dates.tail).forall { case (a, b) => !a.isBefore(b) })
    // the liquidation-price branches: Short rows never carry a price (label
    // lookup misses by construction) but always a liquidation price;
    // Long rows carry one exactly when a price was found
    rows.foreach { r =>
      val tpe = r.getAs[String]("position_type")
      val price = Option(r.getAs[java.lang.Double]("price"))
      val lp = Option(r.getAs[java.lang.Double]("liquidation_price"))
      if (tpe == "Short") assert(price.isEmpty && lp.nonEmpty)
      else assert(lp.nonEmpty == price.nonEmpty)
    }
  }

  test("position_buckets labels are drawn from the reference ladder (NULL gap allowed)") {
    val labels = run("q_lit_position_buckets").collect().map(r => Option(r.getString(0)))
    val ladder = Set("0-0.999k", "1-1.9k", "2-4.9k", "5-9.9k", "10-14.9k", "15k+")
    assert(labels.forall(_.forall(ladder.contains)),
      "only ladder labels (or the reference's inter-bucket NULL gap) may appear")
    assert(labels.distinct.length == labels.length, "one row per category")
  }

  test("liquidations window twin respects its time cutoff") {
    val cutoff = java.sql.Timestamp.valueOf("1997-06-01 00:00:00")
    val bad = run("q_lit_liquidations")
      .filter(col("timestamp") < lit(cutoff)).count()
    assert(bad == 0, "months-window cutoff must bound every row")
  }
}
