package graft.util

import org.apache.spark.sql.DataFrame

/** Small column-name utilities shared across operator packages. */
object Cols {

  /** First `prefix`-based name not in `taken` — for internal scratch
    * columns that must never collide with user data.
    */
  def fresh(taken: Iterable[String], prefix: String): String = {
    val t = taken.toSet
    Iterator.from(0).map(i => s"$prefix$i").find(!t.contains(_)).get
  }

  /** [[fresh]] against one frame's columns. */
  def fresh(df: DataFrame, prefix: String): String =
    fresh(df.columns, prefix)
}
