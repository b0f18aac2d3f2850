package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism guards (optimization-round measurement:
  * guide §2.5/§2.6 — stragglers from under-partitioned inputs).
  */
object Scale {

  /** Spread `df` across the session's default parallelism when its
    * current plan has FEWER partitions — the guard a fan-out stage
    * (window/shingle/posting explosion, per-row digest work) places
    * before multiplying rows.
    *
    * Why: a fan-out's input is often a single small scan (an eval set,
    * a dev-scale corpus, one undersized file — parquet with one row
    * group cannot be split), so the whole explosion runs on the
    * handful of tasks the scan produced and every other core idles —
    * measured at sf0.1: the window explosion of SpanDedup ran 5.4 s
    * single-task on a 594 KB one-row-group scan with 31 cores idle.
    * Shuffling the compact pre-explosion rows is orders of magnitude
    * cheaper than the explosion itself.
    *
    * Scale shape: at production scale the scan already carries at
    * least `defaultParallelism` splits, so this is the identity — no
    * shuffle is ever added to a large read; the round-robin exchange
    * exists exactly when part of the cluster would otherwise idle.
    * Round-robin keeps no key skew, and Spark's sort-before-repartition
    * keeps task retries deterministic.
    */
  def spreadForFanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planning-only: no job runs; for a scan this is the split count
    val parts = df.rdd.getNumPartitions
    if (parts < target) df.repartition(target) else df
  }
}
