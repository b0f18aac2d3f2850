package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectations-style data-quality validation: evaluate many row-level
  * rules in ONE narrow pass (each rule is a conditional sum — no
  * per-rule scans, no shuffle beyond the single global aggregate).
  * The ingest-gate shape every large pipeline runs before promoting a
  * batch: count violations per rule, fail/quarantine on thresholds.
  */
object Validation {

  /** One violation-count row per rule: (rule, violations, total).
    * A NULL predicate result counts as a violation (unknown ≠ pass) —
    * `isNotNull` rules behave as expected. An empty input yields 0
    * violations per rule (not NULL — a NULL would silently pass a
    * `violations > threshold` gate). Rule names are labels only, never
    * resolved as column references (dots etc. are safe), but must be
    * distinct.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    // positional internal aliases: rule names stay pure labels
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0).otherwise(1)), lit(0))
        .as(s"__r$i")
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // one aggregate pass → explode the single row into per-rule rows
    val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__r$i").as("violations"),
        col("__total").as("total"))
    }
    row.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.rule"), col("r.violations"), col("r.total"))
  }

  /** Referential integrity: the child rows whose key tuple has no
    * match in `parent` — the cross-table check [[check]]'s row-local
    * rules cannot express. `keys` maps child column → parent column.
    * SQL FK semantics (MATCH SIMPLE): a child key containing any NULL
    * is EXEMPT, not an orphan. Scale shape: distinct parent keys +
    * one left-anti equi-join — Catalyst broadcasts a small dimension
    * side and AQE splits a skewed one; never a cartesian.
    */
  def orphans(child: DataFrame, parent: DataFrame,
              keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "at least one key pair")
    val pcols = keys.map { case (c, p) =>
      parent(p).as(s"__fk_$c")
    }
    val pk = parent.select(pcols: _*).distinct()
    val cond = keys.map { case (c, _) =>
      child(c) === pk(s"__fk_$c") }.reduce(_ && _)
    child
      .filter(keys.map { case (c, _) => child(c).isNotNull }.reduce(_ && _))
      .join(pk, cond, "left_anti")
  }

  /** One-row summary of [[orphans]]: (n_child, n_exempt_null,
    * n_orphans) — the dashboardable FK health gauge.
    */
  def foreignKeyCheck(child: DataFrame, parent: DataFrame,
                      keys: Seq[(String, String)]): DataFrame = {
    val anyNull = keys.map { case (c, _) => child(c).isNull }.reduce(_ || _)
    val nulls = child.filter(anyNull).count()
    val total = child.count()
    val orph = orphans(child, parent, keys).count()
    val spark = child.sparkSession
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(total, nulls, orph)), 1),
      StructType(Seq(
        StructField("n_child", LongType, nullable = false),
        StructField("n_exempt_null", LongType, nullable = false),
        StructField("n_orphans", LongType, nullable = false))))
  }

  /** Split into (passing, failing) row sets for quarantine flows —
    * two filters over one definition, so Catalyst can reuse the scan.
    */
  def partitionByRules(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "at least one rule")
    val allPass = rules.map { case (_, p) => coalesce(p, lit(false)) }
      .reduce(_ && _)
    (df.filter(allPass), df.filter(!allPass))
  }
}
