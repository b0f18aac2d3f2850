package graft

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence artifact (plans/r{N}/<query>_{tag}.txt).
  *
  * Usage: sbt "runMain graft.PlanDump <tag> q1[,q2,...]"
  *   tag  — suffix for the output file (before/after)
  *   qs   — query names from [[SparkEntry.queries]], or "all"
  *
  * Lifecycle queries execute their side effects (index builds, tx
  * commits) when constructed; the dumped plan is the final declared
  * DataFrame's — the same frame Bench times and Verify hashes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <q1,q2,...|all>")
    val tag = args(0)
    val names =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query '$n'"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      Runtime.getRuntime.availableProcessors().toString))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
