package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Projections / filters (SURVEY §2.2 P1-P4).
  *
  * The reference bulk-renames with long `withColumnRenamed` chains
  * (`aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:46-106`) and
  * projects with wide qualified selects (`:117-252`). We collapse a rename
  * map into ONE Project node (a single select with aliases) — same
  * semantics, constant-depth logical plan regardless of rename count.
  */
object Projections {

  /** Rename columns per `renames` (old→new) in a single Project.
    * Columns not in the map pass through unchanged; order preserved.
    */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val cols = df.columns.map { c =>
      renames.get(c).fold(col(c))(n => col(c).as(n))
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Drop columns if present (reference drops crawler artifacts
    * `partition_0/1` — L2B:47,52,57,64).
    */
  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Keep only `cols`, in the given order. */
  def selectCols(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
}
