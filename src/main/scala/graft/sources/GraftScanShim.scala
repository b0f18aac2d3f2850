package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Forwards every pushdown negotiation to a real [[ParquetScanBuilder]]
  * and wraps only the built [[Scan]]. Needed because
  * `ParquetScanBuilder.build()` is covariantly typed (it returns
  * `ParquetScan`, so a subclass cannot widen it to a wrapper) and
  * `SupportsPushDownCatalystFilters` lives in Spark's internal
  * package — hence this one-file shim inside `org.apache.spark.sql`,
  * same technique as [[GraftShim]]. Column pruning and filter/agg
  * pushdown behave exactly as a plain parquet scan; the wrapper adds
  * the streaming entry point the graft source needs.
  */
class GraftForwardingScanBuilder(inner: ParquetScanBuilder, wrap: Scan => Scan)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)

  override def pushedFilters(): Array[Predicate] = inner.pushedFilters

  override def pushAggregation(aggregation: Aggregation): Boolean =
    inner.pushAggregation(aggregation)

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)

  override def pushVariantExtractions(
      variantExtractions: Array[VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(variantExtractions)

  override def build(): Scan = wrap(inner.build())
}
