package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (100 TB concern; no reference
  * counterpart — its dims are tiny and broadcast away any skew).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, default on) — prefer it.
  * Salting is for the cases AQE can't fix: a single hot key whose rows
  * exceed one executor's memory in a sort-merge join, or skewed
  * aggregations. The salted join replicates each DIM row `salts` times
  * and scatters FACT rows uniformly across the salt space, so one hot
  * key spreads over `salts` shuffle partitions; correctness is
  * unchanged (each fact row still meets its dim row exactly once).
  */
object Skew {

  /** Left-outer equi-join on `keys`, salted `salts` ways.
    *
    * Fact side: salt = row-position hash in [0, salts) — NOT a content
    * hash, which would (a) fail outright on map-typed columns (hash()
    * rejects MapType) and (b) assign every byte-identical row of a hot
    * key the same salt, defeating the spread entirely. The salt value
    * itself is correctness-irrelevant: every salt meets its dim copy
    * exactly once, and the partial/final agg merges all salts, so a
    * recompute assigning different salts changes nothing observable.
    * Dim side: exploded to all salt values.
    */
  def saltedEnrichUsing(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                        salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol =
      graft.util.Cols.fresh(fact.columns ++ dim.columns, "__salt")
    val factS = fact.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val dimS = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    factS.join(dimS, keys :+ saltCol, "left").drop(saltCol)
  }

  /** Two-stage skew-safe aggregation: partial aggregate on
    * (keys, salt) — spreading a hot group over `salts` reducers — then
    * final aggregate on keys. `partialAggs` run in stage 1; `finalAggs`
    * (over the stage-1 column names) merge in stage 2. Classic
    * sum/count decomposition; avg = final sum/sum.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partialAggs.nonEmpty && finalAggs.nonEmpty,
      "need at least one partial and one final aggregate")
    val saltCol = graft.util.Cols.fresh(df, "__salt")
    val partial = df
      .withColumn(saltCol,
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
