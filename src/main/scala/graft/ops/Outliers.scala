package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier flagging — the quality-filter step that
  * drops documents whose length / score / token count is wildly out of
  * line with their group (language, source), using median + MAD
  * instead of mean + stddev so the gauge itself isn't dragged by the
  * outliers it's hunting.
  *
  * Both medians are EXACT rank elements (the lower median: the value
  * at rank (n+1)/2 in ascending order), never interpolated — rank
  * selection is pure integer arithmetic and element lookup, so results
  * are bit-identical across engines, partitionings, and runs; the
  * |x − med| deviations and the k·MAD threshold are single IEEE
  * sub/abs/mul ops, equally deterministic.
  *
  * Scale shape: groups here are FEW and HUGE (languages, sources), the
  * exact regime [[Prefix.groupRowNumber]] exists for — each median is
  * one range shuffle + a (partition, group)-local window + a broadcast
  * offset join; the per-group medians/MADs themselves are tiny frames
  * broadcast back onto the data. No group ever funnels through a
  * single task, no approximation enters the pipeline.
  */
object Outliers {

  /** Exact lower median of `valueCol` per `groupCol`: one row per
    * group, `(groupCol, med)`. Null values are excluded (SQL aggregate
    * convention); a group that is all-null simply has no row.
    */
  def groupMedianExact(df: DataFrame, groupCol: String, valueCol: String,
                       outCol: String = "med",
                       partitions: Int = 0): DataFrame = {
    val data = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val rn = graft.util.Cols.fresh(data, "__rn")
    val nn = graft.util.Cols.fresh(data.columns :+ rn, "__n")
    val ranked = Prefix.groupRowNumber(data, groupCol,
      Seq(col(valueCol).asc), rn, partitions)
    val g2 = graft.util.Cols.fresh(data.columns :+ rn :+ nn, "__g2")
    val counts = data.groupBy(col(groupCol)).agg(count(lit(1)).as(nn))
      .withColumnRenamed(groupCol, g2)
    // lower median = value at rank (n+1) div 2; deterministic under
    // value ties (equal values are interchangeable at a rank).
    // Null-safe group match: a null group is a legal group
    ranked.join(counts, col(groupCol) <=> col(g2))
      .filter(col(rn) === expr(s"(`$nn` + 1) div 2"))
      .select(col(groupCol), col(valueCol).cast("double").as(outCol))
  }

  /** Flags rows whose |value − group median| exceeds `k` × the group's
    * MAD (median absolute deviation). Appends `med`, `mad`, and the
    * boolean `outCol`; rows with a null value are never outliers.
    * A zero-MAD group (over half its values identical) flags every
    * value not exactly at the median — the documented MAD edge; pick a
    * different value column if that bites.
    */
  def robustFlag(df: DataFrame, groupCol: String, valueCol: String,
                 k: Double = 3.0, outCol: String = "is_outlier",
                 partitions: Int = 0): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val gm = graft.util.Cols.fresh(df.columns :+ "med" :+ "mad", "__gm")
    val med = groupMedianExact(df, groupCol, valueCol, "med", partitions)
      .withColumnRenamed(groupCol, gm)
    val dev = graft.util.Cols.fresh(df.columns :+ "med" :+ "mad" :+ gm, "__dev")
    val withDev = df
      .join(broadcast(med), col(groupCol) <=> col(gm), "left").drop(gm)
      .withColumn(dev, abs(col(valueCol).cast("double") - col("med")))
    val mad = groupMedianExact(
      withDev.select(col(groupCol), col(dev)), groupCol, dev, "mad", partitions)
      .withColumnRenamed(groupCol, gm)
    withDev
      .join(broadcast(mad), col(groupCol) <=> col(gm), "left").drop(gm)
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(false))
          .otherwise(col(dev) > col("mad") * k))
      .drop(dev)
  }

  /** Per-group z-score of an INTEGRAL column — the classical
    * mean/stddev standardization (use [[robustFlag]] when the gauge
    * must not be dragged by the outliers themselves). Restricting to
    * integral inputs is what makes this bit-deterministic at any
    * scale: Σv and Σv² are EXACT long sums (associative, so partial
    * aggregation order cannot change them), and every double op after
    * that is one fixed IEEE expression — no accumulation-order hazard
    * like a naive double variance. Population variance (ddof = 0);
    * zero-variance and single-row groups yield z = 0.0.
    *
    * Scale shape: one partial-aggregable stats pass (one row per
    * group), stats broadcast back, narrow arithmetic. Overflow note:
    * Σv² stays within long while n · max(v)² < 2⁶³ — lengths/token
    * counts at any corpus size qualify; pre-scale first if values run
    * to 10⁹.
    */
  /** Per-group Pearson correlation of two INTEGRAL columns — one row
    * per group, `(groupCol, n, corr)`. The zscore trick squared: all
    * five moments (Σx, Σy, Σxy, Σx², Σy²) are EXACT long sums, so the
    * result is bit-identical regardless of partial-aggregation order —
    * `corr()` built on double accumulators is not. Rows where either
    * value is null are excluded pairwise (SQL convention); groups with
    * n < 2 or zero variance on either side yield NULL (undefined).
    *
    * One partial-aggregable pass, one row per group out. Overflow: the
    * long moments hold while rows · max(x·y) < 2⁶³ — fine for
    * length/token-count magnitudes at any realistic corpus; pre-scale
    * first for 10⁹-sized values.
    */
  def groupCorr(df: DataFrame, groupCol: String, xCol: String,
                yCol: String, outCol: String = "corr"): DataFrame = {
    Seq(xCol, yCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType ||
          dt == org.apache.spark.sql.types.ShortType,
        s"groupCorr needs integral columns for exact sums, got " +
          s"${dt.simpleString} for $c")
    }
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val stats = df.groupBy(col(groupCol)).agg(
      count(when(both, 1)).as("__n"),
      coalesce(sum(when(both, x)), lit(0L)).as("__sx"),
      coalesce(sum(when(both, y)), lit(0L)).as("__sy"),
      coalesce(sum(when(both, x * y)), lit(0L)).as("__sxy"),
      coalesce(sum(when(both, x * x)), lit(0L)).as("__sxx"),
      coalesce(sum(when(both, y * y)), lit(0L)).as("__syy"))
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    // fixed IEEE sequence mirrored in the oracle: cov = n*sxy - sx*sy;
    // varx = n*sxx - sx*sx; r = cov / (sqrt(varx) * sqrt(vary))
    val cov = n * col("__sxy").cast("double") - sx * sy
    val varx = n * col("__sxx").cast("double") - sx * sx
    val vary = n * col("__syy").cast("double") - sy * sy
    stats.select(col(groupCol), col("__n").as("n"),
      when(col("__n") < 2 || varx <= 0.0 || vary <= 0.0,
        lit(null).cast("double"))
        .otherwise(cov / (sqrt(varx) * sqrt(vary))).as(outCol))
  }

  /** Per-group min-max normalization of an INTEGRAL column to [0, 1]:
    * (v − min) / (max − min), with degenerate groups (constant value,
    * singleton) and nulls mapping to 0.0. Min/max of longs are exact
    * under any aggregation order, and the one division is a fixed IEEE
    * op — bit-identical cross-engine, same contract as [[zscore]].
    * One partial-aggregable stats pass + broadcast, never a shuffle.
    */
  def minMaxNorm(df: DataFrame, groupCol: String, valueCol: String,
                 outCol: String = "mm"): DataFrame = {
    val v = col(valueCol)
    val dt = df.schema(valueCol).dataType
    require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"minMaxNorm needs an integral column, got ${dt.simpleString}")
    val gm = graft.util.Cols.fresh(df, "__g")
    val stats = df.groupBy(col(groupCol).as(gm)).agg(
      min(v.cast("long")).as("__lo"), max(v.cast("long")).as("__hi"))
    df.join(broadcast(stats), col(groupCol) <=> col(gm), "left").drop(gm)
      .withColumn(outCol,
        when(v.isNull || col("__hi") <=> col("__lo"), lit(0.0))
          .otherwise((v.cast("double") - col("__lo").cast("double")) /
            (col("__hi").cast("double") - col("__lo").cast("double"))))
      .drop("__lo", "__hi")
  }

  def zscore(df: DataFrame, groupCol: String, valueCol: String,
             outCol: String = "z"): DataFrame = {
    val v = col(valueCol)
    val dt = df.schema(valueCol).dataType
    require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"zscore needs an integral column for exact sums, got ${dt.simpleString}")
    val gm = graft.util.Cols.fresh(df, "__g")
    val stats = df.groupBy(col(groupCol).as(gm)).agg(
      count(v).as("__n"),
      coalesce(sum(v.cast("long")), lit(0L)).as("__s1"),
      coalesce(sum(v.cast("long") * v.cast("long")), lit(0L)).as("__s2"))
    // fixed IEEE op sequence, mirrored verbatim in the oracle:
    // mean = s1/n; var = (s2 - s1*s1/n) / n; z = (v - mean)/sqrt(var)
    val n = col("__n").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val variance = (s2 - s1 * s1 / n) / n
    df.join(broadcast(stats), col(groupCol) <=> col(gm), "left").drop(gm)
      .withColumn(outCol,
        when(v.isNull || col("__n") <= 1 || variance <= 0.0, lit(0.0))
          .otherwise((v.cast("double") - s1 / n) / sqrt(variance)))
      .drop("__n", "__s1", "__s2")
  }
}
