package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest right
  * row with `right.ts <= left.ts` for the same key — the correctness
  * backbone of feature/training pipelines (no look-ahead leakage). The
  * reference has no such operator; Spark has no built-in either.
  *
  * Per the build's preference order this is tier (a): COMPOSED from
  * existing operators — union + one window pass — rather than a custom
  * LogicalPlan/Strategy. Why this beats the naive forms at 100 TB:
  *  - naive `left JOIN right ON key AND r.ts <= l.ts` + top-1 window is
  *    an equi-join on key whose output explodes to |matches per key|
  *    before the window prunes it;
  *  - a range-join is a nested loop in Spark;
  *  - this union form shuffles each input ONCE (by key), sorts within
  *    partitions, and carries right-side values forward with
  *    `last_value(ignoreNulls)` — linear in |left| + |right|.
  *
  * Ties (equal ts): the right row at exactly left.ts IS visible
  * (`<=` semantics), matching the common "as of now" definition.
  */
object AsofJoin {

  /** @param valueCols right-side columns to carry (all null when no
    *                  right row is at-or-before the left row's ts)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.forall(!left.columns.contains(_)),
      s"valueCols ${valueCols.filter(left.columns.contains)} already exist " +
        "in the left side — the output would carry ambiguous duplicate names")
    def fresh(prefix: String) =
      graft.util.Cols.fresh(left.columns ++ right.columns, prefix)
    val side = fresh("__side")
    val vals = fresh("__vals")

    val leftCols = left.columns
    // The right-side values travel as ONE non-null struct per right row
    // (null on left rows): last(ignoreNulls) then carries the latest
    // right ROW atomically — a genuinely NULL right-side value inside
    // the struct is preserved (per-column carry would skip it and
    // resurrect an older value, and could mix columns from different
    // right rows).
    val lNorm = left
      .withColumn(side, lit(1))
      .select((keyCols ++ Seq(tsCol, side)).map(col)
        ++ leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col)
        :+ lit(null).cast(org.apache.spark.sql.types.StructType(
             valueCols.map(c => org.apache.spark.sql.types.StructField(
               c, right.schema(c).dataType, nullable = true)))).as(vals): _*)
    // SQL equi-join semantics: a null key never matches, so right rows
    // with any null key must not enrich anything (the window's
    // partitionBy would otherwise group null keys together and attach
    // unrelated null-key right rows to null-key left rows)
    val rightKeyed =
      if (keyCols.isEmpty) right
      else right.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
    val rNorm = rightKeyed
      .withColumn(side, lit(0))
      .select((keyCols ++ Seq(tsCol, side)).map(col)
        ++ leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        :+ struct(valueCols.map(col): _*).as(vals): _*)

    // Right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // right row at exactly left.ts is visible to that left row. The
    // value struct is the final order key: right rows TIED on (key, ts)
    // would otherwise sort in partitioning-dependent order and last()
    // would pick an arbitrary one — with the struct key the greatest
    // (valueCols) tuple deterministically wins.
    // map-typed value columns are not orderable — tie-break on a hash
    // of the struct's JSON render instead (determinism is all the
    // tie-break provides; which of two identical-(key,ts) right rows
    // wins is unspecified either way)
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val tieKey =
      if (valueCols.exists(c => hasMap(right.schema(c).dataType)))
        xxhash64(to_json(col(vals)))
      else col(vals)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(side).asc, tieKey.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn(vals, last(col(vals), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(col("*") +: valueCols.map(c => col(s"$vals.$c").as(c)): _*)
      .drop(side, vals)
  }
}
