package graft.util

import org.apache.spark.sql.SparkSession

/** One session-builder for the three harness mains — same master,
  * shuffle partitions, timezone, and UI setting everywhere, so a plan
  * audited by ExplainAudit is the plan Bench times and Verify dumps.
  */
object Sessions {

  /** `SPARK_GRAFT_CPUS`, else `fallback`. */
  def cpus(fallback: => String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", fallback)

  def local(nCpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$nCpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.shuffle.partitions", nCpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
