package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-harmonizing union for multi-source ingestion — the step a
  * real lake pipeline runs before anything else, because batches from
  * different crawls/exports/vendors never agree column-for-column.
  * Positional `union` silently zips mismatched columns together; this
  * aligns by NAME, fills columns missing from a batch with nulls, and
  * (optionally) stamps each row with the batch it came from so
  * provenance survives the merge.
  *
  * Scale shape: `unionByName` is a zero-shuffle narrow concatenation of
  * the inputs' partitions — no exchange, no row rewrite beyond the
  * null-fill projection. Type conflicts between same-named columns are
  * left to Spark's standard union coercion, which fails loudly rather
  * than guessing.
  */
object Harmonize {

  /** Union any number of frames by column name, tolerating columns
    * missing from some inputs (filled with null). Output column order
    * is the first frame's, with later-only columns appended in first
    * appearance order — deterministic whatever order the batches
    * arrive in the Seq.
    */
  def unionLoose(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionLoose of zero frames")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[unionLoose]] with provenance: each input is tagged with its
    * batch label in `sourceCol` before the merge. Refuses a label
    * column that already exists rather than silently replacing data.
    */
  def unionWithSource(batches: Seq[(String, DataFrame)],
                      sourceCol: String = "src"): DataFrame = {
    require(batches.nonEmpty, "unionWithSource of zero batches")
    batches.foreach { case (label, df) =>
      require(!df.columns.contains(sourceCol),
        s"batch '$label' already has a '$sourceCol' column — " +
          "pass a different sourceCol")
    }
    unionLoose(batches.map { case (label, df) =>
      df.withColumn(sourceCol, lit(label))
    })
  }
}
