package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtTextQueries

/** Pins the BM25 int64-overflow guard (ExtTextQueries.bm25Score) at both
  * sides of its ceiling. Reference scores are computed with BigInt-EXACT
  * arithmetic (never wraps), so a silent int64 wrap in the engine's
  * integer branch would show up as a grossly wrong (often negative) score.
  *
  * The r14 verdict's finding: the ceiling was documented prose-only — a
  * 100 TB corpus (N≈10¹¹ docs, T≈10¹³ tokens) would wrap silently in
  * non-ANSI Spark while DuckDB throws. Now the expression switches per-row
  * to the all-double form of the same ratio past 4·10¹⁸ per side.
  */
class Bm25GuardSpec extends SparkSpec {

  /** BigInt-exact value of the cleared integer ratio, as a double
    * (exact quotient, rounded once — the "truth" for relative checks).
    */
  private def refScore(n: BigInt, df: BigInt, tf: BigInt, t: BigInt,
      dl: BigInt): Double = {
    val num = (2 * n - 2 * df + 1) * 22 * tf * t
    val den = (2 * df + 1) * (10 * tf * t + 3 * t + 9 * dl * n)
    (BigDecimal(num) / BigDecimal(den)).toDouble
  }

  /** Bit-exact mirror of the engine's INTEGER branch: exact BigInt
    * products (no wrap), each side rounded to double (Spark's
    * long→double cast), then one division — the distinction matters
    * above 2⁵³ where rounding before vs after the division can differ
    * in the last ulp.
    */
  private def refIntBranch(n: BigInt, df: BigInt, tf: BigInt, t: BigInt,
      dl: BigInt): Double = {
    val num = (2 * n - 2 * df + 1) * 22 * tf * t
    val den = (2 * df + 1) * (10 * tf * t + 3 * t + 9 * dl * n)
    num.toDouble / den.toDouble
  }

  private def engineScore(n: Long, df: Long, tf: Long, t: Long, dl: Long): Double = {
    import spark.implicits._
    Seq((n, df, tf, t, dl)).toDF("n_docs", "df", "tf", "t_tokens", "dl")
      .select(ExtTextQueries.bm25Score(col("n_docs"), col("df"), col("tf"),
        col("t_tokens"), col("dl")).as("s"))
      .as[Double].collect().head
  }

  test("under the ceiling: integer branch, bit-exact vs BigInt") {
    // test-SF-shaped stats (N·T ≈ 10¹⁰): products ~10¹² — deep inside
    val (n, df, tf, t, dl) = (6000L, 120L, 7L, 1700000L, 310L)
    val got = engineScore(n, df, tf, t, dl)
    val want = refScore(n, df, tf, t, dl)
    assert(got == want, s"$got vs $want")
    assert(got > 0.0)
  }

  test("just under the 4e18 guard: still the integer branch, no wrap") {
    // num = (2N−2df+1)·22·tf·T: pick values so num ≈ 3.9e18 < 4e18 and
    // den < 4e18 — the largest loads the integer branch must carry
    val (n, df, tf, t) = (1000000L, 1L, 11L, 8000000000L)
    // num = (2e6−1)·22·11·8e9 ≈ 3.87e18; den = 3·(10·11·8e9+3·8e9+9·dl·1e6)
    val dl = 1000L
    val numD = (2.0 * n - 2 * df + 1) * 22.0 * tf * t
    val denD = (2.0 * df + 1) * (10.0 * tf * t + 3.0 * t + 9.0 * dl * n)
    assert(numD < 4.0e18 && denD < 4.0e18, s"fixture drifted: $numD / $denD")
    assert(numD > 2.0e18, "fixture should stress the upper integer range")
    val got = engineScore(n, df, tf, t, dl)
    val want = refIntBranch(n, df, tf, t, dl)
    assert(got == want, s"$got vs $want")
    assert(math.abs(got - refScore(n, df, tf, t, dl)) /
      refScore(n, df, tf, t, dl) <= 1e-12)
  }

  test("over the ceiling: double branch, matches BigInt to 1e-12 relative (no silent wrap)") {
    // 100 TB-shaped stats: N=1e10 docs, T=1e13 tokens → num ≈ 4.4e24,
    // far past int64. The unguarded integer form would wrap (score
    // garbage/negative); the guard must route to the double form.
    val (n, df, tf, t, dl) = (10000000000L, 250000L, 40L, 10000000000000L, 900L)
    val got = engineScore(n, df, tf, t, dl)
    val want = refScore(n, df, tf, t, dl)
    assert(got > 0.0, s"wrapped/garbage score: $got")
    assert(math.abs(got - want) / want <= 1e-12, s"$got vs $want")
  }

  test("boundary monotonicity: scores continuous across the branch switch") {
    // two adjacent t_tokens values straddling the guard on the numerator:
    // the branch flips but the scores must differ only in the last ulps
    val (n, df, tf, dl) = (1000000L, 1L, 11L, 1000L)
    // num(t) = (2N−1)·22·11·t = 4.8399978e8 · t; guard at 4e18 → t* ≈ 8.2645e9
    val tUnder = (4.0e18 / ((2.0 * n - 1) * 22 * tf)).toLong - 1000
    val tOver = tUnder + 2000
    val under = engineScore(n, df, tf, tUnder, dl)
    val over = engineScore(n, df, tf, tOver, dl)
    val refU = refIntBranch(n, df, tf, tUnder, dl)
    val refO = refScore(n, df, tf, tOver, dl)
    assert(under == refU)
    assert(math.abs(over - refO) / refO <= 1e-12, s"$over vs $refO")
  }
}
