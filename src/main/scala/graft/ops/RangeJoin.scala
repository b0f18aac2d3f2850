package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: all (left, right) pairs sharing
  * `keyCols` whose long-valued ordinates satisfy
  * `right.ord ∈ [left.ord + lo, left.ord + hi]` (inclusive). The
  * canonical use is event-neighborhood joins ("other events of this
  * user within ±2 h") and window feature extraction — operations the
  * reference's engine expresses as range predicates.
  *
  * Per the build's preference order this is tier (a): COMPOSED into an
  * equi-join Spark already executes well, because a raw range predicate
  * is the single worst join shape in Spark — with no equi-condition
  * Catalyst can only plan BroadcastNestedLoopJoin (O(|L|·|R|) compares,
  * and an OOM once neither side fits a broadcast). The banding trick:
  *
  *  - pick bucket width W = max(hi - lo, 1): every left row's match
  *    interval `[l+lo, l+hi]` (width hi-lo ≤ W) overlaps at MOST two
  *    consecutive W-buckets, so the left side explodes ≤ 2-3×, a
  *    constant — never data-dependent;
  *  - each right row lands in exactly ONE bucket `floorDiv(r, W)`;
  *  - equi-join on (keyCols, bucket) — a plain shuffled hash/SMJ that
  *    co-partitions both sides — then re-apply the exact range
  *    predicate to kill the false candidates inside the same stage.
  *
  * At 100 TB both sides shuffle once on (key, bucket); AQE sees an
  * ordinary equi-join so skew-split and runtime re-planning apply. A
  * pathological hot (key, bucket) can additionally be salted with
  * [[Skew]]. Results are exactly the inequality join's (the refine
  * predicate is the definition; banding only bounds the candidates).
  *
  * floorDiv is computed as `(x - pmod(x, W)) / W` — `pmod` is
  * non-negative, so this is true floor division on negative ordinates
  * too (Spark's `/` on longs truncates toward zero, which would split
  * the bucket at 0 and drop cross-zero pairs).
  */
object RangeJoin {

  private def floorDiv(x: Column, w: Long): Column = (x - pmod(x, lit(w))) / w

  /** @param leftOrd  long-typed ordinate column name in `left`
    *                 (epoch micros, position, price cents, ...)
    * @param rightOrd long-typed ordinate column name in `right`
    * @param lo,hi    inclusive match band relative to the left ordinate;
    *                 `lo = -t, hi = t` is the symmetric ±t neighborhood
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftOrd: String, rightOrd: String,
               lo: Long, hi: Long): DataFrame = {
    require(hi >= lo, s"empty band: lo=$lo > hi=$hi")
    require(leftOrd != rightOrd,
      "leftOrd and rightOrd must be distinct names — both appear in the output")
    val clash = (right.columns.toSet -- keyCols -- Seq(rightOrd))
      .intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"non-key columns $clash exist on both sides — rename before joining")
    val w = math.max(hi - lo, 1L)
    val bucket = graft.util.Cols.fresh(left.columns ++ right.columns, "__bucket")

    // sequence() is inclusive on both ends; the two floorDivs differ by
    // at most ceil((hi-lo)/W) + 1 = 2, so this materializes 1-2 bucket
    // ids per left row (3 when hi-lo < W straddles two boundaries)
    val l = left.withColumn(bucket,
      explode(sequence(floorDiv(col(leftOrd) + lo, w).cast("long"),
                       floorDiv(col(leftOrd) + hi, w).cast("long"))))
    val r = right.withColumn(bucket, floorDiv(col(rightOrd), w).cast("long"))
    l.join(r, keyCols :+ bucket)
      .where(col(rightOrd).between(col(leftOrd) + lo, col(leftOrd) + hi))
      .drop(bucket)
  }

  /** Timestamp convenience over [[bandJoin]]: pairs with
    * `right.ts ∈ [left.ts + loSeconds, left.ts + hiSeconds]`. Ordinates
    * are compared at microsecond precision; the original timestamp
    * columns are preserved in the output. Accepts TIMESTAMP and
    * TIMESTAMP_NTZ ordinates — NTZ is reinterpreted in the session TZ
    * before `unix_micros` (which rejects NTZ directly); with the
    * session pinned UTC this is value-identical.
    */
  def timeBandJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   loSeconds: Long, hiSeconds: Long): DataFrame = {
    def micros(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(col(c).cast("timestamp"))
        case _ => unix_micros(col(c))
      }
    val lUs = graft.util.Cols.fresh(left.columns ++ right.columns, "__l_us")
    val rUs = graft.util.Cols.fresh(left.columns ++ right.columns :+ lUs, "__r_us")
    bandJoin(
      left.withColumn(lUs, micros(left, leftTs)),
      right.withColumn(rUs, micros(right, rightTs)),
      keyCols, lUs, rUs,
      math.multiplyExact(loSeconds, 1000000L),
      math.multiplyExact(hiSeconds, 1000000L))
      .drop(lUs, rUs)
  }
}
