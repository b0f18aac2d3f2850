package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, posexplode, row_number, struct}

/** Window functions (SURVEY §2.5 W1).
  *
  * The reference's only window op is latest-record-per-group:
  * `row_number() over (partition by player_name order by game_date desc)`
  * then keep row 1 (`aws-job-silver-to-gold-player/
  * aws-job-silver-to-gold-player.py:37-46`).
  *
  * Scale notes: a row_number window shuffles by the partition key and
  * sorts within partitions. For top-1 semantics this is optimal in Spark
  * (TakeOrderedAndProject only applies to global top-k); AQE handles
  * skewed partition keys. Callers should pass a TOTAL order (unique
  * tie-break column) — the reference's `game_date desc` alone is
  * nondeterministic on date ties, which we refuse to reproduce.
  */
object Windows {

  /** Keep the first row per group under `order` (helper col dropped). */
  def topOnePerGroup(df: DataFrame, partitionCols: Seq[String],
                     order: Seq[Column]): DataFrame = {
    // Non-colliding helper name: withColumn would silently REPLACE an
    // existing input column of the same name.
    val rn = graft.util.Cols.fresh(df, "__rn")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** General per-group top-k with rank column retained. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   order: Seq[Column], k: Int, rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — withColumn would " +
      "silently replace it; pass a different rankCol")
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Global top-k: orderBy + limit, which Spark plans as
    * TakeOrderedAndProject — each partition keeps a k-row heap and only
    * k rows per partition reach the driver-side merge; the full sort
    * never happens. The right way to take "top 100 of 100 TB".
    */
  def globalTopK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k WITHOUT a window — the scale spelling of
    * [[topKPerGroup]] for when groups are huge: a bounded-heap
    * aggregate ([[graft.functions.TopKAgg]]) reduces every map task's
    * slice to ≤ k rows per group BEFORE the exchange, so the shuffle
    * carries O(groups·k) rows instead of every row, and no task ever
    * sorts a whole group. `fields` are NAMED columns compared in the
    * given order (sort keys first, a unique tiebreaker before any
    * payload — then the result is deterministic); `reverse` keeps the
    * largest instead of the smallest, and mixed per-key directions are
    * encoded by negating a numeric key. Output: partitionCols ++
    * `rankCol` (1 = best) ++ the fields, one row per kept element.
    */
  def topKPerGroupAgg(df: DataFrame, partitionCols: Seq[Column],
                      fields: Seq[Column], k: Int,
                      reverse: Boolean = false,
                      rankCol: String = "rank"): DataFrame = {
    // scratch names through Cols.fresh, like topKPerGroup's rankCol
    // guard: a partition column named "pos"/"col"/"__topk" would
    // otherwise make the post-explode select ambiguous (posexplode's
    // default output names are exactly "pos" and "col")
    val tkName = graft.util.Cols.fresh(df, "__topk")
    val posName = graft.util.Cols.fresh(df, "__topk_pos")
    val valName = graft.util.Cols.fresh(df, "__topk_val")
    val stc = struct(fields: _*)
    val tk = org.apache.spark.sql.GraftShim.toColumn(
      graft.functions.TopKAgg(
        org.apache.spark.sql.GraftShim.toExpression(
          df.sparkSession, stc), k, reverse).toAggregateExpression())
    val agg = df.groupBy(partitionCols: _*).agg(tk.as(tkName))
    val st = agg.schema(tkName).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    agg.select((partitionCols :+
        posexplode(col(tkName)).as(Seq(posName, valName))): _*)
      .select((partitionCols :+
        (col(posName) + 1).cast("int").as(rankCol)) ++
        st.fieldNames.toSeq.map(f => col(s"$valName.`$f`").as(f)): _*)
  }
}
