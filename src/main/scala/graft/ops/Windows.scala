package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

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
}
