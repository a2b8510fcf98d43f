package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal, MapEntries, MapFromEntries, NamedExpression, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The reference groups and counts DISTINCT over MAP-typed keys with
  * entry-order-insensitive equality (`MapType.java` — maps hash as
  * unordered entry sets; its testGroupByMap/testGroupByComplexMap
  * vectors), while Spark's analyzer rejects map-typed grouping
  * outright. Equality of maps is exactly equality of their
  * key-sorted entry arrays, so this resolution rule swaps each
  * map-typed grouping key for `sort_array(map_entries(key))` and
  * rewrites the occurrences in the aggregate list onto
  * `map_from_entries(<canonical key>)` — the reconstructed map (in
  * canonical key order) the query observes.
  *
  * Scale shape: the canonicalization is a scan-side projection; the
  * shuffle key becomes the sorted entry array — no extra exchange.
  * Maps whose VALUE type is itself unorderable (a map of maps) still
  * fail loudly in SortArray's type check, matching the engine's
  * fail-loud posture.
  */
object MapGroupingKeys extends Rule[LogicalPlan] {

  private def canon(g: Expression): Expression =
    SortArray(MapEntries(g), Literal(true))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a @ Aggregate(groupExprs, _, _, _)
        if groupExprs.nonEmpty && groupExprs.forall(_.resolved) &&
          groupExprs.exists(_.dataType.isInstanceOf[MapType]) =>
      apply(a)
  }

  /** The per-Aggregate rewrite; also called directly from the fused
    * [[GraftResolutionRules]] traversal. */
  def apply(a: Aggregate): Aggregate = {
    val Aggregate(groupExprs, aggExprs, child, hint) = a
      // GROUP BY ordinals resolve to the ALIASED output expression and
      // Alias survives semanticEquals, so match and canonicalize on the
      // alias-stripped tree (CleanupAliases would strip it later anyway)
      def strip(e: Expression): Expression = e match {
        case a: Alias => strip(a.child)
        case other => other
      }
      val mapKeys = groupExprs.filter(_.dataType.isInstanceOf[MapType]).map(strip)
      val newGroup = groupExprs.map { g =>
        if (g.dataType.isInstanceOf[MapType]) canon(strip(g)) else g
      }
      def isMapKey(e: Expression): Boolean =
        e.resolved && e.dataType.isInstanceOf[MapType] &&
          mapKeys.exists(_.semanticEquals(e))
      val newAgg = aggExprs.map { ne =>
        val inner = ne.mapChildren(_.transformUp {
          case e if isMapKey(e) => MapFromEntries(canon(e))
        })
        inner match {
          // a bare map-typed output attribute: rewrap as an Alias
          // keeping the exprId so parent operators still resolve
          case attr: Attribute if isMapKey(attr) =>
            Alias(MapFromEntries(canon(attr)), attr.name)(
              exprId = attr.exprId, qualifier = attr.qualifier)
          case other => other.asInstanceOf[NamedExpression]
        }
      }
      Aggregate(newGroup, newAgg, child, hint)
  }
}
