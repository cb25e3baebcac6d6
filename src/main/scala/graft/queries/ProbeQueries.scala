package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boundary probes for the driver-side decimal hash defect (round 8).
  *
  * History: CORRECTNESS_r06 reported 11 hash-red endpoint twins (rows+schema
  * green) that the local strict mirror reproduced bit-identically green. The
  * r7 probe battery (33 diagnostics decomposing every red family into
  * oracle-checked stages and controls) localized the divergence exactly —
  * the r7 judge's correlation over all 37 decimal-bearing oracled queries
  * had zero exceptions either way:
  *
  *   A decimal result cell hash-mismatches in the driver's compare iff its
  *   canonical text (a) ends in a trailing fractional zero at the declared
  *   scale (`23830.00` @ (38,2), `261501.520980` @ (38,6), `0.000000`), or
  *   (b) is sub-1 at scale 8 (`0.09545577` @ (38,8)).
  *
  * Every stage probe agreed (row sets, BIGINT cents/micro quantities, the
  * same scalars as DOUBLE/VARCHAR, verbatim clones red, green-twin clones
  * green), and the data-free constant bundle `q_probe_const_types` was red —
  * the defect is the driver hash's canonicalization of DECIMAL cells per se,
  * not any computed value. The registry's mitigation (r8) is the export
  * contract: driver-facing outputs carry no DECIMAL columns — exact decimal
  * arithmetic internally, final-cast DOUBLE (display semantics, matching the
  * reference API's JSON floats) plus BIGINT integer-unit columns where
  * exactness is contractual.
  *
  * What remains here are the five single-column CONSTANT probes VERDICT r7
  * #3 requested: r7's `q_probe_const_types` bundled seven constants in one
  * row, proving "at least one class red" but not the class boundary. One
  * constant per query pins, in a single round of driver verdicts, exactly
  * which cell classes the driver hash mangles:
  *
  *   - `tz38_2`   `23830.00` @ (38,2)  — trailing fractional zero, scale 2
  *   - `nz38_2`   `23830.01` @ (38,2)  — same digits, no trailing zero
  *                                       (expected GREEN control)
  *   - `sub1_38_8` `0.09545577` @ (38,8) — sub-1 magnitude at scale 8
  *   - `ge1_38_8`  `9.54555777` @ (38,8) — same digits shifted ≥ 1
  *                                       (expected GREEN control)
  *   - `sub1_18_2` `0.01` @ (18,2)     — sub-1 at LOW scale and narrow
  *                                       precision (r7's sole sub-1 green
  *                                       was `0.01` @ (18,2) — this pins
  *                                       that the effect is high-scale-
  *                                       specific)
  *
  * No table data, no arithmetic — any red row is pure hash-canonicalization
  * signal. These are diagnostic registry entries, not reference operators;
  * they stay out of SURVEY §2 coverage accounting (COVERAGE.md lists them
  * under diagnostics) and are the ONLY registry entries allowed to emit a
  * DECIMAL output column (OutputTypeSpec pins that census).
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
      constDf(s, dec("0.01", "decimal(18,2)").as("v")) }
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
      "SELECT CAST('0.01' AS DECIMAL(18,2)) AS v"
  )
}
