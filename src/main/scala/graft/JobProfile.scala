package graft

import scala.collection.mutable

/** Per-Spark-job time breakdown for ONE declared query (guide §1:
  * measure before changing anything). A listener records every job's
  * wall time and description/call site; the report shows where a
  * composite lifecycle query (index builds, tx commits, CDF folds)
  * actually spends its seconds — per-query totals alone can't.
  *
  * Usage: sbt "runMain graft.JobProfile <query> [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    require(SparkEntry.queries.contains(name), s"unknown query '$name'")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      Runtime.getRuntime.availableProcessors().toString))

    final case class J(desc: String, ms: Long, stages: Int, tasks: Int)
    val jobs = mutable.ArrayBuffer.empty[J]
    val starts = mutable.Map.empty[Int, (Long, String, Int)]
    val stageTasks = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse {
              // fall back to the MAIN thread's stack (actions block it):
              // the innermost graft.* frames identify the operator step
              import scala.jdk.CollectionConverters._
              Thread.getAllStackTraces.asScala
                .find(_._1.getName == "main")
                .map(_._2.toSeq
                  .filter(f => f.getClassName.startsWith("graft.") &&
                    !f.getClassName.contains("JobProfile"))
                  .take(3)
                  .map(f => s"${f.getFileName}:${f.getLineNumber}")
                  .mkString(" < "))
                .filter(_.nonEmpty).getOrElse("?")
            }
          js.stageInfos.foreach(si =>
            stageTasks(si.stageId) = si.numTasks)
          starts(js.jobId) = (System.nanoTime(), desc,
            js.stageInfos.map(_.numTasks).sum)
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, desc, tasks) =>
            jobs.synchronized {
              jobs += J(desc, (System.nanoTime() - t0) / 1000000L, 0, tasks)
            }
          }
      })
    final case class S(name: String, ms: Long, tasks: Int, wallMs: Long,
                       shufRead: Long, shufWrite: Long)
    val stages = mutable.ArrayBuffer.empty[S]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          stages.synchronized {
            stages += S(si.name, si.taskMetrics.executorRunTime,
              si.numTasks, wall,
              si.taskMetrics.shuffleReadMetrics.totalBytesRead,
              si.taskMetrics.shuffleWriteMetrics.bytesWritten)
          }
        }
      })

    // warm rep first (JIT/classloading), profile the later reps
    (1 to reps).foreach { r =>
      jobs.synchronized(jobs.clear())
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val snap = jobs.synchronized(jobs.toVector)
      println(f"== rep $r: $name total $total%.2f s, ${snap.size} jobs, " +
        f"job-time sum ${snap.map(_.ms).sum / 1000.0}%.2f s ==")
      if (r == reps) {
        // group by description prefix (strip counters) and rank
        val byDesc = snap.groupBy(_.desc).view
          .mapValues(js => (js.map(_.ms).sum, js.size, js.map(_.tasks).sum))
          .toSeq.sortBy(-_._2._1)
        byDesc.take(40).foreach { case (d, (ms, n, tasks)) =>
          println(f"${ms / 1000.0}%8.3f s  x$n%-4d tasks=$tasks%-6d $d")
        }
        val ss = stages.synchronized(stages.toVector)
        println(s"-- stages (wall desc; exec=Σtask run time) --")
        ss.sortBy(-_.wallMs).take(25).foreach { s =>
          println(f"wall ${s.wallMs / 1000.0}%7.3f s exec ${s.ms / 1000.0}%8.3f s " +
            f"tasks=${s.tasks}%-4d sr=${s.shufRead / 1048576}%4d MB " +
            f"sw=${s.shufWrite / 1048576}%4d MB  ${s.name.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
