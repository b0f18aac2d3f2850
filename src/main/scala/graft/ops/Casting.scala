package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Schema-adaptive casting (SURVEY §2.2 D1).
  *
  * The reference decides bigint→int downcasts from data: for every
  * LongType column it runs a FULL eager Spark job computing that column's
  * max via the RDD API, then casts iff `max <= 2^31-1`
  * (`aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:68-82`).
  * N long columns ⇒ N scans of the table.
  *
  * We preserve the decision but compute ALL column extrema in ONE
  * aggregate pass — at 100 TB the difference is N full-table scans vs one.
  * We additionally check the column min (the reference's max-only check
  * would silently corrupt values < -2^31; no such data exists in its lake,
  * so decisions agree on all reference-shaped inputs).
  */
object Casting {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Downcast every LongType column whose values all fit in Int. */
  def safeDowncastLongs(df: DataFrame): DataFrame = {
    val longCols = df.schema.fields.collect { case f if f.dataType == LongType => f.name }
    if (longCols.isEmpty) return df
    val aggs = longCols.flatMap(c => Seq(max(col(c)).as(s"max_$c"), min(col(c)).as(s"min_$c")))
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val fits = longCols.filter { c =>
      val mx = row.getAs[Any](s"max_$c")
      val mn = row.getAs[Any](s"min_$c")
      mx != null && mn != null &&
        mx.asInstanceOf[Long] <= Int.MaxValue && mn.asInstanceOf[Long] >= Int.MinValue
    }.toSet
    // The reference prints each downcast decision (L2B:76-81) — keep the
    // observable diagnostic, one line per column, off the hot path.
    longCols.foreach { c =>
      log.info(s"safeDowncastLongs: $c ${if (fits(c)) "-> int" else "stays long"}")
    }
    val cols = df.columns.map { c =>
      if (fits(c)) col(c).cast(IntegerType).as(c) else col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
