package graft

import org.apache.spark.sql.types.DecimalType
import graft.queries.ProbeQueries

/** Integrity guard for the r8-r11 boundary-probe set (ProbeQueries): twelve
  * single-column constant queries that pin WHICH decimal cell classes the
  * driver's hash mis-canonicalizes. The rule as ADJUDICATED by the r9
  * verdicts and the r10 scale bisection (zero exceptions across
  * r7/r8/r9/r10): red ⟺ trailing fractional zero at the declared scale
  * (precision-independent — tz18_2 and tz38_2 both red), OR declared
  * scale ≥ 7 at any precision (18/28/38 all red at scale 8; ge1_18_7 and
  * ge1_18_9 both red in r10, refuting the earlier "scale 8 exactly"
  * reading) and any magnitude. Scale ≤ 6 is safe without a trailing zero
  * (nz38_6 green). The r11 ge1_18_6 control isolates the lower edge from
  * nz38_6's magnitude/precision confound (same ge1 magnitude and
  * precision 18 as the red family, scale 6).
  *
  * Their evidentiary value needs three invariants: each probe emits exactly
  * the declared constant at the declared DECIMAL type (a drifted type or
  * value would measure builder error, not the driver hash); every probe is
  * oracled; and none is lost or shadowed in the registry merge.
  */
class ProbeSpec extends SparkSpec {

  // name -> (expected value text, expected precision, expected scale)
  private val expected = Map(
    "q_probe_const_tz38_2"    -> ("23830.00", 38, 2),
    "q_probe_const_nz38_2"    -> ("23830.01", 38, 2),
    "q_probe_const_sub1_38_8" -> ("0.09545577", 38, 8),
    "q_probe_const_ge1_38_8"  -> ("9.54555777", 38, 8),
    "q_probe_const_sub1_18_2" -> ("0.01", 18, 2),
    "q_probe_const_ge1_18_8"  -> ("9.54555777", 18, 8),
    "q_probe_const_ge1_28_8"  -> ("9.54555777", 28, 8),
    "q_probe_const_nz38_6"    -> ("261501.520981", 38, 6),
    "q_probe_const_tz18_2"    -> ("23830.00", 18, 2),
    "q_probe_const_ge1_18_7"  -> ("9.5455577", 18, 7),
    "q_probe_const_ge1_18_9"  -> ("9.545557717", 18, 9),
    "q_probe_const_ge1_18_6"  -> ("9.545556", 18, 6))

  test("each boundary probe emits its pinned constant at its pinned decimal type") {
    expected.foreach { case (name, (text, p, sc)) =>
      val df = ProbeQueries.queries(name)(spark, sfDir)
      val schema = df.schema
      assert(schema.length == 1 && schema.head.name == "v",
        s"$name must emit the single column 'v'")
      schema.head.dataType match {
        case d: DecimalType =>
          assert(d.precision == p && d.scale == sc,
            s"$name must be DECIMAL($p,$sc), got DECIMAL(${d.precision},${d.scale})")
        case other => fail(s"$name must be decimal-typed, got $other")
      }
      val rows = df.collect()
      assert(rows.length == 1)
      val got = rows(0).getAs[java.math.BigDecimal]("v")
      assert(got.compareTo(new java.math.BigDecimal(text)) == 0,
        s"$name must emit $text, got $got")
      // the oracle pins the same literal and type on the DuckDB side
      val sql = ProbeQueries.oracleSql(name)
      assert(sql.contains(s"'$text'") && sql.contains(s"DECIMAL($p,$sc)"),
        s"$name oracle must carry the same literal and type: $sql")
    }
  }

  test("every probe is oracled and reaches the merged registry unshadowed") {
    val probes = ProbeQueries.queries.keySet
    assert(probes == expected.keySet, "probe set drifted from this spec")
    assert(ProbeQueries.oracleSql.keySet == probes,
      "every probe needs an oracle: " + (probes -- ProbeQueries.oracleSql.keySet))
    val merged = SparkEntry.queries.keySet
    assert(probes.subsetOf(merged),
      "probes lost in registry merge: " + (probes -- merged))
    assert(SparkEntry.queries.size ==
      ProbeQueries.queries.size + (SparkEntry.queries.keySet -- probes).size)
  }
}
