package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: dump the executed physical plan of selected queries
  * (all of them by default) so scan pushdown, broadcast-vs-SMJ picks, and
  * codegen coverage can be audited per round:
  * `runMain graft.ExplainAudit [sfDir] [query ...]`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus("8"))
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan)
    }
    spark.stop()
  }
}
