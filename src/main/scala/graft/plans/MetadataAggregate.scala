package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.ops.TxTable

/** `SELECT COUNT(*) FROM <graft table>` answered from the manifest —
  * the optimizer-rule spelling of [[TxTable.metaRowCount]], Delta's
  * metadata-only-query optimization. An ungrouped, unfiltered
  * count-star over a graft snapshot needs no scan: the manifest's
  * per-file row counts already hold the answer, so the Aggregate
  * collapses to a one-row Project. At 100 TB that is milliseconds of
  * driver metadata I/O instead of a full-lake scan for the single
  * most common interactive query there is.
  *
  * SNAPSHOT-EXACT, never approximate: the relation's table name pins
  * the resolved version (`graft:<path>@<v>`), and the count is read
  * from THAT version's manifest — a commit racing the query cannot
  * skew the answer (same snapshot isolation as the scan it replaces).
  * The rewrite declines — leaving the plan, and thus correctness,
  * untouched — whenever anything could make metadata and scan
  * disagree: grouping keys, a Filter anywhere below the aggregate,
  * DISTINCT or FILTER clauses, any non-count aggregate, a change-feed
  * scan (its row set is the feed, not the snapshot), or a manifest
  * file line without a row count ([[TxTable.metaRowCount]] returns
  * None). Projects and subquery aliases between aggregate and
  * relation are cardinality-preserving and skipped.
  */
object MetadataAggregateRule extends Rule[LogicalPlan] {

  private val NameRe = """graft:(.+)@(\d+)""".r

  /** A count whose value is the plain row count: COUNT(*) / COUNT(1) /
    * COUNT(any non-null literal), not DISTINCT, not FILTERed.
    */
  private def isCountStar(e: Expression): Boolean = e match {
    case ae: AggregateExpression =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(children) =>
          children.forall(c => c.foldable && c.eval() != null)
        case _ => false
      })
    case _ => false
  }

  /** 1:1 operators below the aggregate never change the row count. */
  @scala.annotation.tailrec
  private def stripCardinalityPreserving(p: LogicalPlan): LogicalPlan =
    p match {
      case Project(_, child) => stripCardinalityPreserving(child)
      case SubqueryAlias(_, child) => stripCardinalityPreserving(child)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.exists(
            _.exists(_.isInstanceOf[AggregateExpression])) &&
          agg.aggregateExpressions.forall(_.collect {
            case ae: AggregateExpression => ae
          }.forall(isCountStar)) =>
      stripCardinalityPreserving(agg.child) match {
        case rel: DataSourceV2Relation
            if rel.table.isInstanceOf[graft.sources.GraftTable] &&
              // a change-feed scan's rows are the FEED, not the snapshot
              !rel.table.schema().fieldNames.contains("_change_type") =>
          rel.table.name match {
            case NameRe(path, v) =>
              TxTable.metaRowCount(SparkSession.active, path, v.toLong)
                .map { n =>
                  val rewritten = agg.aggregateExpressions.map(
                    _.transform {
                      case ae: AggregateExpression if isCountStar(ae) =>
                        Literal(n)
                    }.asInstanceOf[NamedExpression])
                  Project(rewritten, OneRowRelation()): LogicalPlan
                }
                .getOrElse(agg) // a file without a row count → scan
            case _ => agg
          }
        case _ => agg
      }
  }
}
