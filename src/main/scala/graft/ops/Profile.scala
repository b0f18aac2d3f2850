package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass per-column table profiling — the "what is actually in this
  * table" step of data-quality work (row counts, null rates, distinct
  * cardinalities, value ranges), computed in a SINGLE aggregate over
  * the table and returned as one tidy row per column.
  *
  * Two cardinality modes:
  *  - `approxDistinct = true` (the 100 TB default): HyperLogLog++
  *    (`approx_count_distinct`) — every stat is a simple partial-agg,
  *    ONE scan, one reduce, no row blowup.
  *  - `approxDistinct = false` (exact, the oracle mode): multiple
  *    exact `countDistinct`s make Catalyst plan an Expand (one
  *    duplicated row stream per distinct agg — a deliberate
  *    cols-times row multiplication before the shuffle). Fine at
  *    verification scale, documented cost at lake scale.
  *
  * The aggregated stats row (ONE row, 4 values per column) is
  * collected and reshaped on the driver — the one collect that is the
  * right plan. min/max are rendered `CAST(... AS STRING)` so the
  * profile has a uniform schema across column types; for
  * cross-engine comparison use integral/string/date columns (float
  * and timestamp string renderings are engine-specific).
  */
object Profile {

  /** The raw one-row stats aggregation (4 values per column + total),
    * exposed so scale evidence can fingerprint the AGGREGATION plan
    * itself: approx mode is plain partial-aggregable HLL (no Expand
    * node anywhere); exact mode plans an Expand whose row stream is
    * `cols`× the input — the documented cost difference between the
    * two modes at lake scale.
    */
  def statsPlan(df: DataFrame, cols: Seq[String],
                approxDistinct: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val distinctOf = (c: String) =>
      if (approxDistinct) approx_count_distinct(col(c))
      else countDistinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)), distinctOf(c),
      min(col(c)).cast("string"), max(col(c)).cast("string"))) :+ count(lit(1))
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = true): DataFrame = {
    val r = statsPlan(df, cols, approxDistinct).head()
    val total = r.getLong(cols.size * 4)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val base = i * 4
      Row(c, total, total - r.getLong(base), r.getLong(base),
        r.getLong(base + 1),
        if (r.isNullAt(base + 2)) null else r.getString(base + 2),
        if (r.isNullAt(base + 3)) null else r.getString(base + 3))
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_null", LongType, nullable = false),
        StructField("n_nonnull", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_str", StringType), StructField("max_str", StringType))))
  }

  /** The correctness bridge for the 100 TB mode: runs BOTH cardinality
    * modes and returns the deterministic stats plus a per-column
    * `hll_ok` flag asserting the HLL++ estimate lies within `tol`
    * relative error of the exact count (floor of ±1 absolute, so
    * tiny cardinalities aren't held to a fractional bound). Default
    * tol 0.2 = 4× the default `approx_count_distinct` rsd of 0.05 —
    * far outside honest HLL noise, so a false `hll_ok = false` is a
    * real estimator defect, not variance. The exact pass exists only
    * in this check; production profiling runs the approx plan alone.
    */
  /** Fixed-width histogram of a numeric column: `bins` equal-width
    * buckets over `[lo, hi]` (taken from a one-row min/max aggregate
    * when `bounds` is not given), each returned with its bucket index,
    * numeric range and count — empty buckets included, so the output
    * is always exactly `bins` rows and plot-ready.
    *
    * Scale shape: one optional min/max pass + one groupBy on the bucket
    * index (at most `bins` groups) left-joined from a `spark.range`
    * bucket frame — the join is bins-rows-tiny on both sides, so it
    * broadcasts; no sort, no window, no row blowup. All bucket
    * arithmetic is plain IEEE add/mul/div on doubles (no
    * transcendentals), so counts AND bucket bounds are bit-comparable
    * across engines. Values equal to `hi` land in the last bucket
    * (the standard closed-top convention); with explicit `bounds`,
    * rows outside `[lo, hi]` and nulls are excluded from the counts.
    */
  def histogram(df: DataFrame, column: String, bins: Int,
                bounds: Option[(Double, Double)] = None): DataFrame = {
    require(bins > 0, "histogram needs a positive bin count")
    val x = col(column).cast("double")
    val (lo, hi) = bounds.getOrElse {
      val r = df.agg(min(x), max(x)).head()
      require(!r.isNullAt(0),
        s"histogram over an empty/all-null column '$column' needs explicit bounds")
      (r.getDouble(0), r.getDouble(1))
    }
    require(hi >= lo, s"histogram bounds inverted: [$lo, $hi]")
    val width = (hi - lo) / bins
    val bucket =
      if (width == 0) lit(0) // degenerate single-value range
      else least(floor((x - lit(lo)) / lit(width)), lit(bins - 1)).cast("int")
    val counts = df.filter(x.isNotNull && x >= lo && x <= hi)
      .groupBy(bucket.as("bin")).agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("bin_hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  def profileChecked(df: DataFrame, cols: Seq[String],
                     tol: Double = 0.2): DataFrame = {
    val ap = profile(df, cols, approxDistinct = true)
    val ex = profile(df, cols, approxDistinct = false)
      .select(col("column"), col("n_distinct").as("exact_distinct"))
    ap.join(ex, "column")
      .select(col("column"), col("n_rows"), col("n_null"), col("n_nonnull"),
        col("min_str"), col("max_str"),
        (abs(col("n_distinct") - col("exact_distinct")) <=
          greatest(lit(1.0), col("exact_distinct") * tol)).as("hll_ok"))
  }
}
