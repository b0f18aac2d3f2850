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
  *
  * Noise guard: every query runs `SPARK_GRAFT_BENCH_RUNS` times
  * (default 3) and reports the per-query MEDIAN; `value` is the sum of
  * medians. Single-shot timing made per-query drift analysis ambiguous
  * (in-suite JIT/position noise lands multi-second swings on arbitrary
  * queries — see BASELINE.md) — a median of 3 absorbs the one-off cold
  * run and makes a >2× drift a real signal instead of a coin flip.
  * `runs`, the per-query min, AND the raw per-rep array (`reps`) are
  * reported alongside so the artifact is self-describing — a poisoned
  * median sits next to the reps that poisoned it and adjudicates
  * itself without an isolated re-run.
  *
  * Contention forensics: every run stamps `/proc/loadavg` (taken BEFORE
  * the Spark session starts, so it reflects EXTERNAL load, and again
  * after) plus the CPU count, and self-flags `contended` when the
  * pre-run 1-minute load exceeds a quarter of the CPUs — a full suite
  * on a quiet host starts near 0. Three rounds of bench-vs-pin
  * disputes were adjudicated through host-noise archaeology because
  * the artifact couldn't say whether the host was busy; now it says.
  *
  * Isolated re-measure mode: `--only q1[,q2,...]` runs exactly those
  * queries (fresh JVM by construction — each sbt runMain is its own),
  * default 5 reps, and writes `BENCH.isolated.json` instead of
  * `BENCH.out.json`, so a disputed per-query number can be adjudicated
  * without a 100-query suite's position/JIT noise around it.
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** (1m, 5m, 15m) load averages; empty when /proc is unavailable. */
  private def loadavg(): Seq[Double] = graft.util.Host.loadavg()

  def main(args: Array[String]): Unit = {
    val only: Seq[String] = args.toSeq match {
      case Seq("--only", qs, _*) =>
        qs.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      case _ => Nil
    }
    only.foreach(n => require(SparkEntry.queries.contains(n),
      s"--only: unknown query '$n' (have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val defaultRuns = if (only.nonEmpty) "5" else "3"
    val runs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", defaultRuns).toInt.max(1)
    val cpus = Runtime.getRuntime.availableProcessors()
    // external load only: stamped before OUR Spark session exists
    val loadPre = loadavg()
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      cpus.toString))

    // Warm the session (JVM classloading + codegen infra), not the data:
    // the tiny region table also exercises the parquet scan path, so the
    // alphabetically-first real query doesn't absorb its classloading.
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    graft.ops.Sources.table(spark, sfDir, "region")
      .write.format("noop").mode("overwrite").save()
    // Warm the index-BUILDER path too (added round 16 — a protocol
    // change, re-pinned the same round): the pin-to-pin variance was
    // dominated by queries that build persisted indexes to tmp dirs
    // INSIDE their timed region (q_x_hybrid_search_served 5.66↔9.53 s
    // same-code across r13–r15 pins; q_x_funnel, q_x_inc_dedup* in the
    // same band) — the first such query absorbed the parquet WRITE
    // path's classloading + JIT (commit protocol, codec init, Hadoop
    // local-FS setup) with whatever page-cache state /tmp had. A
    // fixed-size tiny build of each index family before the timed
    // region pays that cost once, outside every query's clock.
    locally {
      val s = spark
      import s.implicits._
      val warm = java.nio.file.Files
        .createTempDirectory("graft_bench_warm").toString
      val docs = (0L until 64L)
        .map(i => (i, s"warm token$i merge join scan"))
        .toDF("doc_id", "text")
      graft.text.Bm25.buildIndex(docs, "doc_id", "text", warm + "/bm25")
      graft.text.Bm25.searchIndexed(spark, warm + "/bm25",
        Seq(("w", "merge join")), topK = 3).collect()
      val emb = (0L until 64L)
        .map(i => (i, Array.tabulate(8)(d => ((i + d) % 7).toFloat)))
        .toDF("vec_id", "embedding")
      val idx = graft.ann.Similarity.buildIvfIndex(emb, numLists = 2)
        .localCheckpoint()
      graft.ann.Similarity.writeIvfLists(emb, idx, warm + "/ivf")
      graft.ops.TxTable.append(spark, warm + "/ivf",
        graft.ops.TxTable.read(spark, warm + "/ivf").limit(4))
      graft.ops.TxTable.optimize(spark, warm + "/ivf", Seq("vec_id"))
      org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(warm), true)
    }

    val names =
      if (only.nonEmpty) only else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val times = Vector.newBuilder[Double]
      var ok = true
      var r = 0
      while (r < runs && ok) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            ok = false
        }
        r += 1
      }
      val ts = times.result()
      if (only.nonEmpty) {
        // batched isolated adjudications inflated ~2x from cross-query
        // JVM state (round 11, same quiet host: ccnet 24.0 s in a
        // 6-query --only batch vs 6.66 s solo): localCheckpoint blocks
        // and cached plans accumulate across queries. Isolated mode
        // exists to measure ONE query as if alone — drop every
        // cross-query block and hint a full GC before the next query.
        // Full-suite mode is deliberately untouched: the pin history's
        // comparability depends on its protocol staying fixed.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
      }
      (name, if (ok) median(ts) else 0.0, if (ok) ts.min else 0.0, ok, ts)
    }
    val loadPost = loadavg()
    // a quiet host's 1-minute load is near 0 before the suite starts;
    // a quarter of the CPUs already running something else is the
    // documented threshold for "don't trust these numbers vs the pin"
    val contended = loadPre.headOption.exists(_ > cpus / 4.0)
    // Locale.ROOT: a comma-decimal default locale would emit 1,234 and
    // corrupt the JSON line the driver parses.
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(xs: Seq[Double]) = xs.map(f).mkString("[", ",", "]")
    val qs = results.map { case (k, med, _, _, _) => "\"" + k + "\":" + f(med) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, mn, _, _) => "\"" + k + "\":" + f(mn) }
      .mkString("{", ",", "}")
    // the RAW per-rep array: a mid-suite host burst poisons the median
    // of 3 in a way only the rep spread can adjudicate (median 38.06
    // next to reps [3.5, 38.1, 41.2] is self-evidently contention, not
    // a regression) — two rounds of judge re-runs existed only because
    // the artifact couldn't show this
    val reps = results.map { case (k, _, _, _, ts) =>
      "\"" + k + "\":" + arr(ts) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, med, _, true, _) => med }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,""" +
      s""""cpus":$cpus,"load_pre":${arr(loadPre)},"load_post":${arr(loadPost)},""" +
      s""""contended":$contended,"isolated":${only.nonEmpty},""" +
      s""""queries":$qs,"min":$mins,"reps":$reps,"failed":$failed,""" +
      s""""sf":${graft.util.Host.jsonStr(sfDir)}}"""
    println(line)
    // the stdout line is what the driver parses, but tail-capture has
    // truncated it before (88 per-query entries ≈ several KB) — also
    // write the full JSON to a self-contained artifact. Isolated runs
    // get their own file: the driver overwrites BENCH.out.json each
    // round, and the adjudication record must outlive that.
    val defaultOut = if (only.nonEmpty) "BENCH.isolated.json" else "BENCH.out.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
