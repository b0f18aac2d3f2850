package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping.
  *
  * [[TxTable.readWhere]] prunes on per-FILE min/max, so skipping is
  * only as good as the layout: range-clustering on one column makes
  * that column's stats tight and every other column's stats full-range.
  * Interleaving the bits of several columns' bucket ranks and
  * range-partitioning on the interleaved value gives every
  * participating column PARTIALLY tight per-file ranges — each file
  * covers ~n^(1/d) of each dimension instead of all of it — so needle
  * predicates on ANY clustered column prune most files. This is
  * Delta/Iceberg `ZORDER BY`, reduced to a narrow column expression +
  * one range repartition.
  *
  * Mechanics: each column is binned into `2^bitsPerCol` buckets by
  * `width_bucket` over its observed [min, max] (one tiny driver-side
  * agg row — same O(1) posture as the D1 downcast); bucket bits are
  * interleaved column-round-robin into the Morton value. All pure
  * codegen'd expressions — the only cost beyond a plain
  * `repartitionByRange` write is the binning arithmetic.
  */
object ZOrder {

  /** Morton-interleave the given numeric columns into a z-value column
    * (bits: col0 lowest-significance first). `boundsOf` maps each
    * column to its (min, max); values outside clamp to the edge
    * buckets, nulls go to bucket 0 (they sort first, like
    * NULLS FIRST).
    */
  def zValue(cols: Seq[Column], bounds: Seq[(Double, Double)],
             bitsPerCol: Int = 8): Column = {
    require(cols.nonEmpty && cols.size == bounds.size,
      "one (min,max) per z-order column")
    require(bitsPerCol * cols.size <= 62,
      s"bitsPerCol * columns must fit a long, got ${bitsPerCol * cols.size}")
    val nBuckets = 1 << bitsPerCol
    val buckets = cols.zip(bounds).map { case (c, (lo, hi)) =>
      // width_bucket is 1..n+1 inclusive of the upper overflow bucket;
      // shift to 0-based and clamp so every value lands in [0, n)
      val b = when(c.isNull, lit(0))
        .otherwise(least(greatest(
          width_bucket(c.cast("double"), lit(lo), lit(hi), lit(nBuckets)) - 1,
          lit(0)), lit(nBuckets - 1)))
      b.cast("long")
    }
    (0 until bitsPerCol).flatMap { bit =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)),
          bit * cols.size + i)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Cluster `df` by the Morton order of `cols` into `numFiles` range
    * partitions — write the result (e.g. [[TxTable.append]]) and
    * [[TxTable.readWhere]] needles on any of `cols` prune. Column
    * bounds come from one 1-row min/max aggregate over `df`.
    *
    * `leadCols` lead the range partitioning BEFORE the z-value: pass
    * the table's hive-partition columns here so each range task holds
    * (mostly) one partition value and a partitionBy write does not
    * shatter into tasks × values sliver files.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bitsPerCol: Int = 8, leadCols: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "need at least one cluster column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.indices.map { i =>
      if (row.isNullAt(2 * i)) (0.0, 1.0) // all-null column: one bucket
      else {
        val (mn, mx) = (row.getDouble(2 * i), row.getDouble(2 * i + 1))
        // degenerate single-value range still needs a nonzero width
        if (mn == mx) (mn, mx + 1.0) else (mn, mx)
      }
    }
    val zc = graft.util.Cols.fresh(df, "__z")
    df.withColumn(zc, zValue(cols.map(col), bounds, bitsPerCol))
      .repartitionByRange(numFiles, (leadCols.map(col) :+ col(zc)): _*)
      .drop(zc)
  }
}
