package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `latestPerKey` idiom
  *
  *   Filter(rn = 1, Window(rn ← row_number() OVER (PARTITION BY k ORDER BY o)))
  *
  * into an aggregation
  *
  *   Aggregate(k, max_by(struct(child.output), o))
  *
  * The window form sorts every partition's full history inside one shuffle
  * with no partial aggregation; the max_by form combines map-side, so at
  * 100 TB the shuffle carries one row per key instead of every row. This is
  * the reference's single most common idiom (Postgres DISTINCT ON —
  * SURVEY.md W5), which makes the rewrite broadly load-bearing.
  *
  * Relationship to Spark's own InferWindowGroupLimit (3.5+): that rule
  * inserts a map-side WindowGroupLimit (≤1 row per key per map partition)
  * but still sorts inside the reduce stage; this rewrite replaces the sort
  * with hash aggregation when it can prove safety. Parquet columns are
  * nullable, so on raw scans the nullable-key guard usually defers to the
  * built-in — the rewrite fires on derived non-nullable keys (aggregates,
  * literals, coalesced columns).
  *
  * Conservative preconditions:
  *  - exactly one window expression, and it is row_number()
  *  - filter is exactly `rn = 1` (or `1 = rn`)
  *  - every ORDER BY direction is the same (desc → max_by, asc → min_by)
  *  - order keys are non-nullable attributes (max_by skips null-keyed rows,
  *    row_number does not — null keys would change results)
  *  - ties in (partition, order) remain nondeterministic in BOTH forms, so
  *    tie behavior is unchanged.
  */
object LatestPerKeyRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w @ Window(Seq(alias @ Alias(we: WindowExpression, _)), partitionSpec, orderSpec, child, _))
        if isRowNumber(we) && isRnEqualsOne(cond, alias.toAttribute) &&
          // empty partitionSpec would turn a 0-row window result into a
          // 1-row all-null global aggregate on empty input
          partitionSpec.nonEmpty &&
          sameDirection(orderSpec) && orderSpec.nonEmpty &&
          orderSpec.forall(so => so.child.isInstanceOf[Attribute] && !so.child.nullable) &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      val keyCols = partitionSpec.map(_.asInstanceOf[Attribute])
      val ordExpr: Expression =
        if (orderSpec.length == 1) orderSpec.head.child
        else CreateStruct(orderSpec.map(_.child))
      val valueStruct = CreateStruct(child.output)
      val pick =
        if (orderSpec.head.direction == Descending) MaxBy(valueStruct, ordExpr)
        else MinBy(valueStruct, ordExpr)
      val pickAlias = Alias(AggregateExpression(pick, Complete, isDistinct = false), "__pick")()
      val agg = Aggregate(keyCols, keyCols :+ pickAlias, child)
      // restore the original output: child columns from the struct, plus the
      // rn attribute (constant 1 after the filter)
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(pickAlias.toAttribute, i, Some(a.name)), a.name)(exprId = a.exprId)
      } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
      Project(restored, agg)
  }

  private def isRowNumber(we: WindowExpression): Boolean =
    we.windowFunction.isInstanceOf[RowNumber]

  private def isRnEqualsOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case _                                    => false
  }

  private def sameDirection(orderSpec: Seq[SortOrder]): Boolean =
    orderSpec.map(_.direction).distinct.length == 1
}
