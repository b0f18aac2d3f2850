package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table scans (SURVEY §2.1 S1/S2).
  *
  * The reference resolves named tables through the AWS Glue catalog and
  * converts DynamicFrame→DataFrame (`aws-job-landing-to-bronze/
  * aws-job-landing-to-bronze.py:22-43`). Our engine reads parquet paths
  * directly into DataFrames — schema-on-read, no catalog round-trip.
  *
  * Scale note (100 TB): `spark.read.parquet` on a directory of many files
  * gives Catalyst full pushdown (PushedFilters / ReadSchema pruning) and
  * partition pruning when the layout is hive-partitioned. Single-file
  * test tables here are the degenerate case of the same code path.
  */
object Sources {

  /** All harness tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a named table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every harness table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
