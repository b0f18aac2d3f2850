package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from periodic snapshots —
  * the standard way a lake tracks dimension changes over time (no
  * reference counterpart; the reference overwrites its dims wholesale).
  *
  * Input: rows (business key, snapshot ts, attributes) from repeated
  * full snapshots. Output: one row per (key, change run) with
  * valid_from / valid_to (null = current) and is_current.
  *
  * Scale shape: ONE shuffle by business key + in-partition sort by
  * snapshot ts (a single window pass detects change points via lag and
  * numbers runs with a running sum); no self-joins, no per-snapshot
  * scans.
  */
object Scd {

  /** @param tieBreakCols extra ordering columns for snapshots that tie
    *                     on (key, ts) — REQUIRED for deterministic run
    *                     numbering if such ties can occur (duplicate
    *                     timestamps with ambiguous order otherwise make
    *                     the history partitioning-dependent)
    */
  def type2(snapshots: DataFrame, keyCols: Seq[String], tsCol: String,
            attrCols: Seq[String], tieBreakCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "is_current")
    require((keyCols ++ attrCols).forall(!reserved.contains(_)),
      s"input columns may not use the reserved output names $reserved")
    val run = graft.util.Cols.fresh(snapshots, "__run")
    val order = (tsCol +: tieBreakCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrStruct = struct(attrCols.map(col): _*)
    val changed = when(
      lag(attrStruct, 1).over(w).isNull ||
        lag(attrStruct, 1).over(w) =!= attrStruct, 1).otherwise(0)
    val runCol = sum(changed).over(
      Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    val withRun = snapshots.withColumn(run, runCol)
    val aggExprs = Seq(min(col(tsCol)).as("valid_from")) ++
      attrCols.map(c => first(col(c)).as(c))
    val grouped = withRun.groupBy((keyCols :+ run).map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    // valid_to = next run's valid_from (exclusive); null while current.
    // Order by run as well: consecutive runs can SHARE a valid_from
    // (same-ts snapshots under tieBreakCols), and valid_from alone
    // would then mark an arbitrary one of them current
    val wNext = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col(run))
    grouped
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(run)
  }
}
