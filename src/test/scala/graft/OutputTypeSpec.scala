package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}

/** The r8 export contract, pinned as a registry-wide census: NO
  * driver-facing output schema carries a DECIMAL column.
  *
  * Why: the correctness driver's result hash mis-canonicalizes DECIMAL
  * cells whose canonical text ends in a trailing fractional zero at the
  * declared scale (any precision), or whose declared scale is ≥ 7 (any
  * precision, any magnitude) — the rule as adjudicated by the r9 probe
  * verdicts and the r10 scale bisection (ge1_18_7 AND ge1_18_9 both red)
  * with zero exceptions across r7/r8/r9/r10; both classes are
  * precision-independent, i.e. keyed on the rendered cell text, and the
  * r11 ge1_18_6 control pins the lower edge. Any decimal output column is
  * therefore a latent per-cell flake: a currently-green sum is one seed or
  * scale-factor change away from landing on a trailing zero. The permanent
  * mitigation: exact decimal arithmetic INTERNALLY (the determinism
  * contract — double sums are shuffle-order-dependent), hash-safe types at
  * the output boundary — DOUBLE for display values, BIGINT integer units
  * (cents / micro) where exactness is contractual or the magnitude can
  * pass 2^53 unscaled (where decimal→double casts round differently per
  * engine; see LiteralTwinQueries.microUnitsDouble).
  *
  * Exempt: the twelve q_probe_const_* boundary diagnostics, whose DECIMAL
  * outputs are the experiment (ProbeSpec pins their exact types/values).
  *
  * Schemas are analyzed, not executed — this census costs plan time only.
  */
class OutputTypeSpec extends SparkSpec {

  test("no driver-facing output schema carries a DECIMAL column (export contract)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if name.startsWith("q_probe_const_") => None
      case (name, fn) =>
        val decCols = fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        decCols.toSeq
    }
    assert(offenders.isEmpty,
      "decimal-typed driver-facing output columns (hash-unsafe — " +
        s"final-cast to DOUBLE/BIGINT per the export contract):\n  ${offenders.mkString("\n  ")}")
  }

  /** Export-contract defect #2 (r14, DRIVER_BUG.md): the driver's pandas
    * canonicalizer sorts result cells via `sort_values`, which cannot order
    * ndarray/dict cells — any top-level ARRAY (or MAP/STRUCT) column crashes
    * the compare, leaving the row neither pass nor fail (`q_x_rand_proj`
    * r14). Driver-facing schemas therefore carry only scalar columns;
    * array-shaped results are flattened (posexplode → one row per element,
    * the q_x_rand_proj (vec_id, dim, proj_val) shape) before the boundary.
    */
  test("no driver-facing output schema carries a nested (array/map/struct) column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }.toSeq
    }
    assert(offenders.isEmpty,
      "nested driver-facing output columns (the driver's pandas canonicalizer " +
        "cannot sort ndarray cells — flatten with posexplode per the export " +
        s"contract):\n  ${offenders.mkString("\n  ")}")
  }
}
