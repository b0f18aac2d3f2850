package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Methodology: each query is FULLY materialized through the `noop` v2
  * writer — every row is produced and handed to the sink, so column
  * pruning can't fake the work (a bare `.count()` over a projection lets
  * Spark answer from parquet footers). Failures are NOT timed as
  * successes: a failed query is reported in `failed` and excluded from
  * the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      Runtime.getRuntime.availableProcessors().toString))

    // Warm the session (JVM classloading + codegen infra), not the data:
    // the tiny region table also exercises the parquet scan path, so the
    // alphabetically-first real query doesn't absorb its classloading.
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    graft.ops.Sources.table(spark, sfDir, "region")
      .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // Locale.ROOT: a comma-decimal default locale would emit 1,234 and
    // corrupt the JSON line the driver parses.
    val qs = results.map { case (k, v, _) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
