package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boundary probes for the driver-side decimal hash defect (rounds 8-11).
  *
  * History: CORRECTNESS_r06 reported 11 hash-red endpoint twins (rows+schema
  * green) that the local strict mirror reproduced bit-identically green. The
  * r7 probe battery (33 diagnostics decomposing every red family into
  * oracle-checked stages and controls) localized the divergence to the
  * driver hash's canonicalization of DECIMAL cells per se — the data-free
  * constant bundle `q_probe_const_types` was red with no table data and no
  * arithmetic. The registry's mitigation (r8) is the export contract:
  * driver-facing outputs carry no DECIMAL columns — exact decimal
  * arithmetic internally, final-cast DOUBLE (display semantics, matching
  * the reference API's JSON floats) plus BIGINT integer-unit columns where
  * exactness is contractual (OutputTypeSpec pins that census).
  *
  * The class boundary, as ADJUDICATED by the r9 verdicts and the r10
  * scale bisection (CORRECTNESS_r09: ge1_18_8 RED, ge1_28_8 RED,
  * ge1_38_8 RED, tz18_2 RED, tz38_2 RED, nz38_6 green, nz38_2 green,
  * sub1_18_2 green, sub1_38_8 RED; CORRECTNESS_r10: ge1_18_7 RED,
  * ge1_18_9 RED — zero exceptions across r7/r8/r9/r10):
  *
  *   A decimal result cell hash-mismatches in the driver's compare iff its
  *   canonical text (a) ends in a trailing fractional zero at the declared
  *   scale (`23830.00` red at BOTH (18,2) and (38,2) — precision-
  *   independent, a pure text property; `23830.01` green), or
  *   (b) the declared SCALE is ≥ 7 — at ANY precision (18/28/38 all red,
  *   so int128 backing is irrelevant), ANY magnitude (sub-1 and ≥1 both
  *   red; r8 already refuted r7's "sub-1" clause), and for every probed
  *   scale in the band (7, 8, and 9 all red — r10 refuted r9's
  *   "scale 8 exactly" reading). Scale ≤ 6 is safe without a trailing
  *   zero (`261501.520981` @ (38,6) green).
  *
  * Both classes are precision-independent; the driver's canonicalizer is
  * keyed on the rendered TEXT of the cell, not its physical backing. The
  * r10 verdicts (7 RED and 9 RED) pin class (b) as an open-above band
  * starting at scale 7: the formatter truncates or re-rounds past ~6
  * fractional digits on one side of the compare (a float64 round-trip
  * keeps ~6 fractional digits exact at these magnitudes, which is
  * consistent with a `.df()`-style float/string hop). The r11 probe
  * closes the last edge: a ge1-magnitude (18,6) control distinguishes
  * "lower edge is scale 7" from a magnitude confound in nz38_6:
  *
  * r8+r9 set (retained verbatim so rounds stay comparable):
  *   - `tz38_2`    `23830.00` @ (38,2)      — class (a), P38: RED (r8,r9)
  *   - `tz18_2`    `23830.00` @ (18,2)      — class (a), P18: RED (r9)
  *   - `nz38_2`    `23830.01` @ (38,2)      — (a) control: green
  *   - `sub1_38_8` `0.09545577` @ (38,8)    — class (b) sub-1: RED
  *   - `ge1_38_8`  `9.54555777` @ (38,8)    — class (b) ≥1, P38: RED
  *   - `ge1_28_8`  `9.54555777` @ (28,8)    — class (b), P28: RED (r9)
  *   - `ge1_18_8`  `9.54555777` @ (18,8)    — class (b), P18 (int64-
  *                                            backed in DuckDB): RED (r9)
  *                                            ⇒ (b) keys on scale, not
  *                                            precision
  *   - `nz38_6`    `261501.520981` @ (38,6) — scale-6 control: green (r9)
  *                                            ⇒ (b) does not reach scale 6
  *   - `sub1_18_2` `0.01` @ (18,2)          — low-P/low-S control: green
  *
  * r10 additions (scale-threshold bisection — ADJUDICATED in
  * CORRECTNESS_r10; both RED ⇒ class (b) = scale ≥ 7, open above):
  *   - `ge1_18_7`  `9.5455577` @ (18,7)     — scale 7, no trailing zero:
  *                                            RED (r10) ⇒ the red band
  *                                            starts at scale 7, refuting
  *                                            the "scale 8 exactly" rule.
  *   - `ge1_18_9`  `9.545557717` @ (18,9)   — scale 9, no trailing zero:
  *                                            RED (r10) ⇒ the band is
  *                                            open above (no 8-digit
  *                                            hard-coded format width).
  *
  * r11 addition (lower-edge control — ADJUDICATED in CORRECTNESS_r11:
  * GREEN ⇒ class (b)'s lower edge is confirmed at scale 7, keyed on
  * declared scale alone; the probe ledger is final):
  *   - `ge1_18_6`  `9.545556` @ (18,6)      — scale 6, ge1 magnitude,
  *                                            precision 18. nz38_6 (the
  *                                            only prior scale-6 probe)
  *                                            differs from the ge1 family
  *                                            in precision AND magnitude;
  *                                            this one isolates scale:
  *                                            GREEN (r11).
  *
  * No table data, no arithmetic — any red row is pure hash-canonicalization
  * signal. These are diagnostic registry entries, not reference operators;
  * they stay out of SURVEY §2 coverage accounting (COVERAGE.md lists them
  * under diagnostics) and are the ONLY registry entries allowed to emit a
  * DECIMAL output column (OutputTypeSpec pins that census). The full proof
  * chain and the driver-maintainer repro live in DRIVER_BUG.md.
  */
object ProbeQueries {

  private def dec(sv: String, t: String): Column =
    lit(new java.math.BigDecimal(sv)).cast(t)

  private def constDf(s: SparkSession, c: Column): DataFrame = {
    import s.implicits._
    Seq(1).toDF("one").select(c)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_probe_const_tz38_2" -> { (s, _) =>
      constDf(s, dec("23830.00", "decimal(38,2)").as("v")) },
    "q_probe_const_nz38_2" -> { (s, _) =>
      constDf(s, dec("23830.01", "decimal(38,2)").as("v")) },
    "q_probe_const_sub1_38_8" -> { (s, _) =>
      constDf(s, dec("0.09545577", "decimal(38,8)").as("v")) },
    "q_probe_const_ge1_38_8" -> { (s, _) =>
      constDf(s, dec("9.54555777", "decimal(38,8)").as("v")) },
    "q_probe_const_sub1_18_2" -> { (s, _) =>
      constDf(s, dec("0.01", "decimal(18,2)").as("v")) },
    "q_probe_const_ge1_18_8" -> { (s, _) =>
      constDf(s, dec("9.54555777", "decimal(18,8)").as("v")) },
    "q_probe_const_ge1_28_8" -> { (s, _) =>
      constDf(s, dec("9.54555777", "decimal(28,8)").as("v")) },
    "q_probe_const_nz38_6" -> { (s, _) =>
      constDf(s, dec("261501.520981", "decimal(38,6)").as("v")) },
    "q_probe_const_tz18_2" -> { (s, _) =>
      constDf(s, dec("23830.00", "decimal(18,2)").as("v")) },
    "q_probe_const_ge1_18_7" -> { (s, _) =>
      constDf(s, dec("9.5455577", "decimal(18,7)").as("v")) },
    "q_probe_const_ge1_18_9" -> { (s, _) =>
      constDf(s, dec("9.545557717", "decimal(18,9)").as("v")) },
    "q_probe_const_ge1_18_6" -> { (s, _) =>
      constDf(s, dec("9.545556", "decimal(18,6)").as("v")) }
  )

  val oracleSql: Map[String, String] = Map(
    "q_probe_const_tz38_2" ->
      "SELECT CAST('23830.00' AS DECIMAL(38,2)) AS v",
    "q_probe_const_nz38_2" ->
      "SELECT CAST('23830.01' AS DECIMAL(38,2)) AS v",
    "q_probe_const_sub1_38_8" ->
      "SELECT CAST('0.09545577' AS DECIMAL(38,8)) AS v",
    "q_probe_const_ge1_38_8" ->
      "SELECT CAST('9.54555777' AS DECIMAL(38,8)) AS v",
    "q_probe_const_sub1_18_2" ->
      "SELECT CAST('0.01' AS DECIMAL(18,2)) AS v",
    "q_probe_const_ge1_18_8" ->
      "SELECT CAST('9.54555777' AS DECIMAL(18,8)) AS v",
    "q_probe_const_ge1_28_8" ->
      "SELECT CAST('9.54555777' AS DECIMAL(28,8)) AS v",
    "q_probe_const_nz38_6" ->
      "SELECT CAST('261501.520981' AS DECIMAL(38,6)) AS v",
    "q_probe_const_tz18_2" ->
      "SELECT CAST('23830.00' AS DECIMAL(18,2)) AS v",
    "q_probe_const_ge1_18_7" ->
      "SELECT CAST('9.5455577' AS DECIMAL(18,7)) AS v",
    "q_probe_const_ge1_18_9" ->
      "SELECT CAST('9.545557717' AS DECIMAL(18,9)) AS v",
    "q_probe_const_ge1_18_6" ->
      "SELECT CAST('9.545556' AS DECIMAL(18,6)) AS v"
  )
}
