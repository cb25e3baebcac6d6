package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boundary probes for the driver-side decimal hash defect (rounds 8-9).
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
  * The class boundary, as refined by the r8 single-column verdicts
  * (CORRECTNESS_r08: tz38_2 RED, nz38_2 green, sub1_38_8 RED,
  * ge1_38_8 RED, sub1_18_2 green):
  *
  *   A decimal result cell hash-mismatches in the driver's compare iff its
  *   canonical text (a) ends in a trailing fractional zero at the declared
  *   scale (`23830.00` @ (38,2) red; `23830.01` @ (38,2) green), or
  *   (b) the column is DECIMAL(38,8) — ANY magnitude (`0.09545577` and
  *   `9.54555777` both red; `0.01` @ (18,2) green).
  *
  * r7's rule stated class (b) as "sub-1 at scale 8"; the r8 verdict REFUTED
  * that clause — `ge1_38_8` was designed as its green control and came back
  * red, so magnitude is irrelevant to class (b). What r8 could not separate
  * is class (b)'s actual trigger — precision 38 (int128-backed cells) vs
  * scale 8 — nor whether class (a) depends on precision. The four r9
  * probes below split those axes; with the five r8 probes retained verbatim
  * (so the two rounds' verdicts are directly comparable), each cell class
  * is now a single driver verdict away from adjudication:
  *
  * r8 set (retained):
  *   - `tz38_2`    `23830.00` @ (38,2)    — class (a): trailing zero, P38
  *   - `nz38_2`    `23830.01` @ (38,2)    — green control for (a)
  *   - `sub1_38_8` `0.09545577` @ (38,8)  — class (b): sub-1
  *   - `ge1_38_8`  `9.54555777` @ (38,8)  — class (b): ≥1 (RED in r8,
  *                                          refuting the sub-1 clause)
  *   - `sub1_18_2` `0.01` @ (18,2)        — green control: low P, low S
  *
  * r9 additions (disambiguation):
  *   - `ge1_18_8`  `9.54555777` @ (18,8)  — scale 8 at LOW precision
  *                                          (int64-backed in DuckDB).
  *                                          Red ⇒ (b) keys on scale 8;
  *                                          green ⇒ (b) needs P > 18.
  *   - `ge1_28_8`  `9.54555777` @ (28,8)  — scale 8 at MID precision
  *                                          (int128-backed in DuckDB,
  *                                          but P < 38). Splits "P > 18"
  *                                          from "P = 38 exactly" if
  *                                          ge1_18_8 comes back green.
  *   - `nz38_6`    `261501.520981` @ (38,6) — NON-trailing-zero at high
  *                                          precision, scale 6. Every r7
  *                                          (38,6) red also had a trailing
  *                                          zero; this is the missing
  *                                          control. Red ⇒ class (b)
  *                                          extends below scale 8;
  *                                          green ⇒ (38,6) is safe sans
  *                                          trailing zero.
  *   - `tz18_2`    `23830.00` @ (18,2)    — trailing zero at LOW
  *                                          precision. Red ⇒ class (a) is
  *                                          precision-independent (pure
  *                                          text property); green ⇒ (a)
  *                                          also needs int128 backing.
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
      constDf(s, dec("23830.00", "decimal(18,2)").as("v")) }
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
      "SELECT CAST('23830.00' AS DECIMAL(18,2)) AS v"
  )
}
