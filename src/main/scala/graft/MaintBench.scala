package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** Maintenance-ladder evidence: what index fragmentation costs at
  * serve time and what OPTIMIZE buys back — plus the multi-column
  * Z-order pruning proof at 100 copies. Three modes (`frag`,
  * `zorder`, `maintained` — the last measures the CLOSED loop: the
  * appenders' `maintain` policy keeping serve cost flat across the
  * same append trail `frag` lets degrade):
  *
  * `runMain graft.MaintBench maintained [dataDir] [commits] [retain]
  * [targetMB]`
  * samples serve cost, head file count, on-disk bytes, and the
  * rewrite economics (count/bytes of each maintenance compaction,
  * worst per-append wall cost) along a maintained trail — commit 1
  * is the fresh-build baseline row; `retain > 0` additionally wires
  * `Maintenance(retainVersions = Some(retain))` so the artifact
  * prices the retention policy's disk bound against the default
  * keep-everything trail; `targetMB > 0` overrides the policy's
  * `targetBytes` so the corpus under test actually holds healthy
  * (at-target) files and the fragment-only rewrite scope is
  * observable (`rewrite_bytes_last` ≪ `table_bytes`).
  *
  * `runMain graft.MaintBench frag [dataDir] [commits]` — builds the
  * persisted BM25 posting table and the IVF lists the way a STREAMING
  * maintainer leaves them (one build + `commits−1` small appends →
  * `commits` file generations), times the serve paths
  * ([[graft.text.Bm25.searchIndexed]], [[graft.ann.Similarity
  * .ivfTopKFromLists]]) on the fragmented table, runs
  * `OPTIMIZE`/compact ([[TxTable.optimize]] on the table's sort key —
  * the SQL `OPTIMIZE graft.` path), re-times, and stamps file counts
  * before/after plus a result-equality bit (OPTIMIZE is
  * data-identical by contract; the artifact proves it on the real
  * serve output). The claim measured: removal+append cycles fragment
  * the index TxTables, the serve join pays one task setup per file,
  * and one layout commit restores build-time serve cost without
  * touching semantics.
  *
  * `runMain graft.MaintBench zorder [baseDir] [outDir] [copies]` —
  * synthesizes (or reuses, same cache marker as [[ScaleBench]]) the
  * `copies`× corpus, lands `orders` twice — Z-ordered on
  * (o_custkey, o_year) vs range-clustered on o_custkey alone — and
  * stamps the files READ by a [[TxTable.readWhere]] needle on EACH
  * dimension. The claim: multi-column Z-order prunes on BOTH
  * dimensions at 100×, where 1-D clustering serves only its sort
  * column and scans everything for the other.
  *
  * One JSON line per run (also written to SPARK_GRAFT_MAINT_OUT,
  * default MAINT_BENCH.json), with the same quiet-host load stamps as
  * Bench/ScaleBench.
  */
object MaintBench {

  private def stateRoot(kind: String, dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(dir))
    s"/tmp/graft_maint_$kind/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + s"_$h"
  }

  private def f(v: Double) =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Median serve time over `reps` full executions (noop write). */
  private def medianSec(reps: Int)(mk: => DataFrame): Double = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(ts.size / 2)
  }

  private def writeLine(line: String): Unit = {
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_MAINT_OUT", "MAINT_BENCH.json")),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("frag")
    val spark = graft.util.Sessions.local(graft.util.Sessions.cpus(
      Runtime.getRuntime.availableProcessors().toString))
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "frag" =>
        val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val commits = args.lift(2).map(_.toInt).getOrElse(50)
        frag(spark, dir, commits)
      case "zorder" =>
        val base = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val out = args.lift(2).getOrElse("/tmp/graft_sf10")
        val copies = args.lift(3).map(_.toInt).getOrElse(100)
        zorder(spark, base, out, copies)
      case "maintained" =>
        val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val commits = args.lift(2).map(_.toInt).getOrElse(50)
        val retain = args.lift(3).map(_.toInt).filter(_ > 0)
        // targetMB sizes the policy's healthy file to the CORPUS under
        // test: the fragment-only economics only show when the table
        // holds files at/above targetBytes (at the default 128 MB a
        // small corpus is all-fragments and every rewrite is the full
        // table — correct, but it measures nothing partial)
        val targetMB = args.lift(4).map(_.toInt).filter(_ > 0)
        maintained(spark, dir, commits, retain, targetMB)
      case other => sys.error(s"unknown MaintBench mode '$other'")
    }
    spark.stop()
  }

  // ------------------------------------------------ frag / OPTIMIZE

  private def frag(spark: SparkSession, dir: String, commits: Int): Unit = {
    import graft.ann.Similarity
    import graft.text.Bm25
    val root = stateRoot("frag", dir)
    // always rebuilt: a stale index from an older run would mis-measure
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val docs = graft.ops.Sources.table(spark, dir, "documents")
      .localCheckpoint()
    val emb = graft.ops.Sources.table(spark, dir, "embeddings")
      .localCheckpoint()
    val loadPre = graft.util.Host.loadavg()

    // ---- BM25 postings: 1 build + (commits−1) appends = the state a
    // per-micro-batch maintainer leaves behind
    val bmPath = root + "/bm25"
    Bm25.buildIndex(docs.filter(col("doc_id") % commits === 0),
      "doc_id", "text", bmPath)
    (1 until commits).foreach { i =>
      Bm25.appendToIndex(spark, bmPath,
        docs.filter(col("doc_id") % commits === i), "doc_id", "text",
        checkDuplicates = false)
    }
    val queries = Seq(("q1", "merge join table"), ("q2", "fast scan query"),
      ("q3", "stream window agg"))
    def bmServe() = Bm25.searchIndexed(spark, bmPath, queries, topK = 10)
    val bmFilesFrag = TxTable.read(spark, bmPath).inputFiles.length
    val bmFrag = medianSec(3)(bmServe())
    val bmRowsFrag = bmServe().collect().map(_.toSeq).toSet
    // OPTIMIZE on the posting sort key — restores the token-range
    // layout manifest pruning relies on AND collapses the file count
    TxTable.optimize(spark, bmPath, Seq("token"))
    val bmFilesOpt = TxTable.read(spark, bmPath).inputFiles.length
    val bmOpt = medianSec(3)(bmServe())
    val bmEqual = bmServe().collect().map(_.toSeq).toSet == bmRowsFrag

    // ---- IVF lists: same lifecycle at the dense index
    val ivfPath = root + "/ivf"
    val index = Similarity.buildIvfIndex(emb, numLists = 16)
      .localCheckpoint()
    Similarity.writeIvfLists(emb.filter(col("vec_id") % commits === 0),
      index, ivfPath)
    (1 until commits).foreach { i =>
      Similarity.ivfAppend(spark, ivfPath, index,
        emb.filter(col("vec_id") % commits === i))
    }
    val qv = emb.filter(col("vec_id") < 8)
    def ivfServe() = Similarity.ivfTopKFromLists(spark, ivfPath, qv,
      k = 5, nprobe = 4, index)
    val ivfFilesFrag = TxTable.read(spark, ivfPath).inputFiles.length
    val ivfFrag = medianSec(3)(ivfServe())
    val ivfRowsFrag = ivfServe().collect().map(_.toSeq).toSet
    TxTable.optimize(spark, ivfPath, Seq("vec_id"))
    val ivfFilesOpt = TxTable.read(spark, ivfPath).inputFiles.length
    val ivfOpt = medianSec(3)(ivfServe())
    val ivfEqual = ivfServe().collect().map(_.toSeq).toSet == ivfRowsFrag

    val loadPost = graft.util.Host.loadavg()
    writeLine(s"""{"metric":"maint_frag",""" +
      s""""dir":${graft.util.Host.jsonStr(dir)},"commits":$commits,""" +
      s""""load_pre":${loadPre.map(f).mkString("[", ",", "]")},""" +
      s""""load_post":${loadPost.map(f).mkString("[", ",", "]")},""" +
      s""""bm25":{"files_frag":$bmFilesFrag,"serve_frag_sec":${f(bmFrag)},""" +
      s""""files_opt":$bmFilesOpt,"serve_opt_sec":${f(bmOpt)},""" +
      s""""rows_equal":$bmEqual},""" +
      s""""ivf":{"files_frag":$ivfFilesFrag,"serve_frag_sec":${f(ivfFrag)},""" +
      s""""files_opt":$ivfFilesOpt,"serve_opt_sec":${f(ivfOpt)},""" +
      s""""rows_equal":$ivfEqual}}""")
  }

  // ------------------------------------------------ maintained loop

  /** The CLOSED maintenance loop [[frag]] prices the absence of: the
    * same micro-batch append trail, but with the appenders' opt-in
    * `maintain` policy wired ([[TxTable.Maintenance]] →
    * [[TxTable.optimizeIfFragmented]] after each landed append).
    * Serve time is sampled along the run; the claim is FLATNESS —
    * serve cost at commit 50 reads like commit 10, because the file
    * count never outruns the policy's threshold. Contrast row for
    * MAINT_FRAG's 18×/13× unmaintained degradation.
    */
  /** One sampled point of the maintained trail: serve cost, head file
    * count, on-disk footprint, and the rewrite economics since the
    * run began (how many maintenance compactions fired, the bytes THE
    * LAST ONE rewrote vs the table's live bytes — the fragment-only
    * claim is `rewrite_bytes_last ≪ table_bytes` on a large table —
    * and the wall cost of the worst append since the previous sample,
    * which is the batch that paid a rewrite).
    */
  private case class Sample(commit: Int, files: Int, serveSec: Double,
                            tableBytes: Long, diskBytes: Long,
                            rewrites: Int, rewriteBytesLast: Long,
                            rewriteBytesTotal: Long, maxAppendSec: Double)

  /** Head files (absolute path → bytes) straight off the manifest. */
  private def headSizes(spark: SparkSession, path: String)
      : Map[String, Long] =
    TxTable.read(spark, path).inputFiles.map { f =>
      val file = new java.io.File(new java.net.URI(f))
      (file.getPath, file.length())
    }.toMap

  /** Total on-disk bytes under the table root (data + log + trail). */
  private def diskBytes(path: String): Long = {
    val it = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    } finally it.close()
  }

  /** Drive `commits` maintained appends, sampling serve + economics.
    * `append(i)` lands batch i; rewrite bytes are inferred from the
    * head-file diff around each append (files REMOVED by the
    * maintenance commit are exactly the files its rewrite read).
    */
  private def trail(spark: SparkSession, path: String, commits: Int,
                    sampleAt: Set[Int], append: Int => Unit,
                    serve: () => DataFrame): Seq[Sample] = {
    var rewrites = 0
    var rewriteLast = 0L
    var rewriteTotal = 0L
    var maxAppend = 0.0
    def sample(c: Int): Sample = {
      val sizes = headSizes(spark, path)
      val s = Sample(c, sizes.size, medianSec(3)(serve()),
        sizes.values.sum, diskBytes(path), rewrites, rewriteLast,
        rewriteTotal, maxAppend)
      maxAppend = 0.0
      s
    }
    // the commit-1 row is the fresh-build BASELINE the flatness claim
    // is measured against — emit it before any append
    val out = Seq.newBuilder[Sample]
    out += sample(1)
    (1 until commits).foreach { i =>
      val before = headSizes(spark, path)
      val t0 = System.nanoTime()
      append(i)
      maxAppend = math.max(maxAppend, (System.nanoTime() - t0) / 1e9)
      val after = headSizes(spark, path)
      val removed = before.keySet -- after.keySet
      if (removed.nonEmpty) {
        rewrites += 1
        rewriteLast = removed.toSeq.map(before).sum
        rewriteTotal += rewriteLast
      }
      if (sampleAt(i + 1)) out += sample(i + 1)
    }
    out.result()
  }

  private def maintained(spark: SparkSession, dir: String,
                         commits: Int,
                         retain: Option[Int] = None,
                         targetMB: Option[Int] = None): Unit = {
    import graft.ann.Similarity
    import graft.text.Bm25
    val root = stateRoot("maintained", dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val docs = graft.ops.Sources.table(spark, dir, "documents")
      .localCheckpoint()
    val emb = graft.ops.Sources.table(spark, dir, "embeddings")
      .localCheckpoint()
    val loadPre = graft.util.Host.loadavg()
    val policy = Some(TxTable.Maintenance(maxFiles = 12,
      targetBytes = targetMB.map(_ * 1024L * 1024L)
        .getOrElse(128L * 1024 * 1024),
      retainVersions = retain))
    val sampleAt = Set(commits / 4, commits / 2,
      3 * commits / 4, commits)

    // ---- BM25 with the policy riding every append
    val bmPath = root + "/bm25"
    Bm25.buildIndex(docs.filter(col("doc_id") % commits === 0),
      "doc_id", "text", bmPath)
    val queries = Seq(("q1", "merge join table"), ("q2", "fast scan query"),
      ("q3", "stream window agg"))
    val bmSamples = trail(spark, bmPath, commits, sampleAt,
      i => { Bm25.appendToIndex(spark, bmPath,
        docs.filter(col("doc_id") % commits === i), "doc_id", "text",
        checkDuplicates = false, maintain = policy); () },
      () => Bm25.searchIndexed(spark, bmPath, queries, topK = 10))

    // ---- IVF lists, same loop
    val ivfPath = root + "/ivf"
    val index = Similarity.buildIvfIndex(emb, numLists = 16)
      .localCheckpoint()
    Similarity.writeIvfLists(emb.filter(col("vec_id") % commits === 0),
      index, ivfPath)
    val qv = emb.filter(col("vec_id") < 8)
    val ivfSamples = trail(spark, ivfPath, commits, sampleAt,
      i => { Similarity.ivfAppend(spark, ivfPath, index,
        emb.filter(col("vec_id") % commits === i), maintain = policy); () },
      () => Similarity.ivfTopKFromLists(spark, ivfPath, qv,
        k = 5, nprobe = 4, index))

    val loadPost = graft.util.Host.loadavg()
    def samples(xs: Seq[Sample]) = xs.map { s =>
      s"""{"commit":${s.commit},"files":${s.files},""" +
        s""""serve_sec":${f(s.serveSec)},"table_bytes":${s.tableBytes},""" +
        s""""disk_bytes":${s.diskBytes},"rewrites":${s.rewrites},""" +
        s""""rewrite_bytes_last":${s.rewriteBytesLast},""" +
        s""""rewrite_bytes_total":${s.rewriteBytesTotal},""" +
        s""""max_append_sec":${f(s.maxAppendSec)}}"""
    }.mkString("[", ",", "]")
    writeLine(s"""{"metric":"maint_maintained",""" +
      s""""dir":${graft.util.Host.jsonStr(dir)},"commits":$commits,""" +
      s""""max_files":12,""" +
      s""""retain_versions":${retain.getOrElse(0)},""" +
      s""""load_pre":${loadPre.map(f).mkString("[", ",", "]")},""" +
      s""""load_post":${loadPost.map(f).mkString("[", ",", "]")},""" +
      s""""bm25":${samples(bmSamples)},""" +
      s""""ivf":${samples(ivfSamples)}}""")
  }

  // ------------------------------------------------ zorder at 100×

  private def zorder(spark: SparkSession, base: String, out: String,
                     copies: Int): Unit = {
    // same cache-marker contract as ScaleBench.main — a corpus built
    // by an older synthesize() or another copy count is rebuilt
    val markerValue = s"${ScaleBench.SynthesisVersion}:base=$base:copies=$copies"
    val marker = new java.io.File(s"$out/_SCALE_OK")
    val cached =
      try new String(java.nio.file.Files.readAllBytes(marker.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      catch { case _: Throwable => "" }
    if (cached != markerValue) {
      ScaleBench.synthesize(spark, base, out, copies)
      java.nio.file.Files.write(marker.toPath, markerValue.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }

    val root = stateRoot("zorder", out)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val orders = graft.ops.Sources.table(spark, out, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .select("o_orderkey", "o_custkey", "o_year", "o_totalprice")
    val rows = orders.count()
    val numFiles = 64
    val loadPre = graft.util.Host.loadavg()

    // z-ordered on BOTH needle dimensions vs range-clustered on one
    val zPath = root + "/z"
    TxTable.append(spark, zPath,
      graft.ops.ZOrder.cluster(orders, Seq("o_custkey", "o_year"), numFiles))
    val lPath = root + "/lin"
    TxTable.append(spark, lPath,
      orders.repartitionByRange(numFiles, col("o_custkey")))

    // needles guaranteed present: a mid-range custkey and a mid year
    val probe = orders.agg(
      expr("percentile_approx(o_custkey, 0.5)").cast("long"),
      expr("percentile_approx(o_year, 0.5)").cast("int")).head()
    val (ck, yr) = (probe.getLong(0), probe.getInt(1))

    def measure(path: String, pred: org.apache.spark.sql.Column)
        : (Int, Double, Long) = {
      val files = TxTable.readWhere(spark, path, pred).inputFiles.length
      val sec = medianSec(3)(
        TxTable.readWhere(spark, path, pred)
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s")))
      val n = TxTable.readWhere(spark, path, pred).count()
      (files, sec, n)
    }
    val zTotal = TxTable.read(spark, zPath).inputFiles.length
    val lTotal = TxTable.read(spark, lPath).inputFiles.length
    val (zck, zckSec, zckN) = measure(zPath, col("o_custkey") === ck)
    val (zyr, zyrSec, zyrN) = measure(zPath, col("o_year") === yr)
    val (lck, lckSec, lckN) = measure(lPath, col("o_custkey") === ck)
    val (lyr, lyrSec, lyrN) = measure(lPath, col("o_year") === yr)
    require(zckN == lckN && zyrN == lyrN,
      s"layouts must agree on row counts: z=($zckN,$zyrN) lin=($lckN,$lyrN)")

    val loadPost = graft.util.Host.loadavg()
    writeLine(s"""{"metric":"zorder_ladder",""" +
      s""""base":${graft.util.Host.jsonStr(base)},""" +
      s""""scaled":${graft.util.Host.jsonStr(out)},"copies":$copies,""" +
      s""""rows":$rows,"num_files":$numFiles,""" +
      s""""load_pre":${loadPre.map(f).mkString("[", ",", "]")},""" +
      s""""load_post":${loadPost.map(f).mkString("[", ",", "]")},""" +
      s""""needle_custkey":$ck,"needle_year":$yr,""" +
      s""""zorder":{"files_total":$zTotal,"files_custkey":$zck,""" +
      s""""files_year":$zyr,"sec_custkey":${f(zckSec)},""" +
      s""""sec_year":${f(zyrSec)}},""" +
      s""""linear":{"files_total":$lTotal,"files_custkey":$lck,""" +
      s""""files_year":$lyr,"sec_custkey":${f(lckSec)},""" +
      s""""sec_year":${f(lyrSec)}}}""")
  }
}
