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

  test("supplied/borrowed variants nest: window ⊆ total ⊇ single-pool") {
    val single = run("q_lit_supplied_borrowed").count()
    val total = run("q_lit_supplied_borrowed_total").count()
    val window = run("q_lit_supplied_borrowed_window").count()
    // the IN-list includes pool 7, so the total series covers at least every
    // timestamp the single-pool series has; the window variant only drops
    assert(total >= single && total >= window && single > 0,
      s"series sizes single=$single total=$total window=$window break nesting")
    val badWin = run("q_lit_supplied_borrowed_window")
      .filter(col("timestamp") <= lit(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")))
      .count()
    assert(badWin == 0, "window cursor must bound every row")
  }

  test("buyback running total is monotone non-decreasing in time order") {
    val rows = run("q_lit_buyback").collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => b >= a },
      "amounts are positive, so the cumulative sum must never decrease")
  }

  test("pnl_over_time emits exactly one row per hour, hour-ascending") {
    val rows = run("q_lit_pnl_over_time").collect()
    assert(rows.nonEmpty, "cohort/window must produce hours")
    val hours = rows.map(_.getAs[java.sql.Timestamp]("hour"))
    assert(hours.distinct.length == hours.length, "DISTINCT ON (hour) contract")
    assert(hours.zip(hours.tail).forall { case (a, b) => a.before(b) })
  }

  test("daily open/close scaffold is gap-free and non-negative") {
    val rows = run("q_lit_daily_open_close").collect()
    val dates = rows.map(_.getAs[java.sql.Date]("date").toLocalDate)
    assert(dates.distinct.length == dates.length, "one row per scaffold day")
    // generate_series contract: consecutive days with no holes
    assert(dates.zip(dates.tail).forall { case (a, b) => a.plusDays(1) == b },
      "the day scaffold must be contiguous — LEFT JOINs keep empty days")
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0))
  }

  test("monthly_active months are well-formed, cursored, and ascending") {
    val rows = run("q_lit_monthly_active").collect()
    val months = rows.map(_.getString(0))
    assert(months.forall(_.matches("\\d{4}-\\d{2}")), "TO_CHAR YYYY-MM shape")
    assert(months.forall(_ >= "1995-01"), "from-cursor must bound every month")
    assert(months.sorted.toSeq == months.toSeq && months.distinct.length == months.length)
    assert(rows.forall(_.getLong(1) > 0), "a reported month has at least one wallet")
  }

  test("microRound6 is exact half-up, including exact .5 micro ties") {
    // the r6 determinism contract: floor(x + 0.5) in pure decimal must
    // agree with BigDecimal HALF_UP at scale 6 for positive amounts —
    // especially ON the exact half-micro ties that double floor(x·1e6+0.5)
    // and version-dependent decimal ROUND both get wrong
    import spark.implicits._
    val micros = Seq("2.5", "3.5", "1000000.5", "0.5", "7.4999999", "7.5000001",
      "123456789.5", "0.0")
    val df = micros.toDF("m")
      .select(col("m").cast("decimal(36,10)").as("micro"))
      .select(col("micro"),
        LiteralTwinQueries.microRound6(col("micro")).as("r"))
    val got = df.collect().map(r => (r.getDecimal(0), r.getDecimal(1))).toMap
    got.foreach { case (micro, r) =>
      val expect = micro
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .multiply(new java.math.BigDecimal("0.000001"))
        .setScale(6)
      assert(r.compareTo(expect) == 0,
        s"microRound6($micro) = $r, want $expect (HALF_UP)")
    }
  }

  test("_with_window twins are tighter-cursor subsets of their base twins") {
    // liquidations: window predicate strictly tightens the base's WHERE
    val base = run("q_lit_liquidations")
    val win = run("q_lit_liquidations_window")
    assert(win.count() <= base.count() && win.count() > 0)
    assert(win.exceptAll(base).count() == 0,
      "every window row must appear in the base export")
    // borrow APR: same page under the dual cursor
    val aprBase = run("q_lit_borrow_apr")
    val aprWin = run("q_lit_borrow_apr_window")
    assert(aprWin.count() <= aprBase.count(),
      "the months bound can only drop rows from the from-cursored page")
  }
}
