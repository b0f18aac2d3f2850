package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) table layout for repeat-join workloads.
  *
  * A join shuffles both sides on the join key every time it runs. When
  * the same fact/dim tables join on the same key in job after job — the
  * reference's medallion re-joins its dims at every stage — the shuffle
  * can be paid ONCE at write time instead: store both tables bucketed by
  * the key into the same number of buckets, and every subsequent join
  * reads bucket i of A against bucket i of B with NO exchange at all.
  * At 100 TB the steady-state saving is the entire shuffle of the
  * larger table, per join, forever; the price is one clustered write
  * and that both sides agree on (key, bucket count).
  *
  * This is Spark's native bucketing (Hive-compatible layout): it needs a
  * catalog table (`saveAsTable`) because the bucket spec lives in table
  * metadata, not in the parquet files. `sortBy` additionally pre-sorts
  * within buckets so a sort-merge join elides its sorts too.
  *
  * Skew note: bucketing hashes the key uniformly, but a single hot KEY
  * still lands in one bucket — bucketing removes the exchange, not key
  * skew. Keep [[Skew.saltedEnrichUsing]] for genuinely hot keys.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and in-bucket
    * sorted) by `key` into `buckets` buckets. `table` may be
    * `db.table`; the database controls the storage location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on `key`. The plan contains no
    * ShuffleExchange on either side when both tables are bucketed by
    * `key` into the same bucket count (asserted by the spec; broadcast
    * is disabled here so the co-located sort-merge path is what runs —
    * for a genuinely tiny dim a broadcast join is still the better
    * plan, and then bucketing is irrelevant).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, Seq(key), joinType)
  }
}
