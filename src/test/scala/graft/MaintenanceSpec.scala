package graft

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** The wired maintenance loop: incremental appenders given a
  * `maintain` policy keep their table's file count bounded across a
  * long micro-batch trail — the measured failure mode this closes is
  * MAINT_FRAG_r14.json's 18×/13× serve degradation after 50
  * unmaintained appends. Serve results must be bit-equal to a
  * from-scratch build THROUGHOUT (optimize is layout-only), and a
  * replay-skipped batch must not trigger a rewrite.
  */
class MaintenanceSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("50 maintained BM25 appends: file count stays bounded, serve bit-equal") {
    val s = spark
    import s.implicits._
    import graft.text.Bm25
    val idx = tmp("graft_mbm") + "/index"
    val maxFiles = 8
    val policy = Some(TxTable.Maintenance(maxFiles = maxFiles))
    def docs(lo: Long, n: Long) = (lo until lo + n)
      .map(i => (i, s"word$i shared merge token${i % 7} scan join"))
      .toDF("doc_id", "text")
    Bm25.buildIndex(docs(0, 10), "doc_id", "text", idx)
    val queries = Seq(("q1", "merge join shared"), ("q2", "token3 scan"))
    def serve() = Bm25.searchIndexed(spark, idx, queries, topK = 5)
      .collect().map(_.toSeq).toSet
    (1 to 50).foreach { b =>
      Bm25.appendToIndex(spark, idx, docs(10L * b, 10), "doc_id", "text",
        checkDuplicates = false, txn = Some(("bm_m", b.toLong)),
        maintain = policy)
      val files = TxTable.read(spark, idx).inputFiles.length
      assert(files <= maxFiles,
        s"batch $b left $files files — the maintenance hook must cap it")
      if (b % 10 == 0) {
        val fresh = tmp("graft_mbmf") + "/index"
        Bm25.buildIndex(docs(0, 10L * (b + 1)), "doc_id", "text", fresh)
        assert(serve() ===
          Bm25.searchIndexed(spark, fresh, queries, topK = 5)
            .collect().map(_.toSeq).toSet,
          s"batch $b: maintained serve must equal a from-scratch build")
      }
    }
    // a REPLAYED batch is a no-op end to end: no append, no rewrite
    val head = TxTable.versions(spark, idx).last
    Bm25.appendToIndex(spark, idx, docs(100, 10), "doc_id", "text",
      checkDuplicates = false, txn = Some(("bm_m", 50L)),
      maintain = policy)
    assert(TxTable.versions(spark, idx).last === head,
      "replay-skipped batch must not commit anything, maintenance included")
    assert(TxTable.read(spark, idx)
      .select(countDistinct(col("doc_id"))).head.getLong(0) === 510L)
  }

  test("fragment-only compaction: healthy files keep their paths, rewrite touches only the trail") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_mfrag") + "/t"
    val target = 48L * 1024
    // ~300 KB of incompressible payload → a HEALTHY layout of several
    // ~target-sized files after the full optimize
    def batch(lo: Int, n: Int) =
      (lo until lo + n).map(_.toLong).toDF("k")
        .withColumn("payload", repeat(md5(col("k").cast("string")), 8))
        .coalesce(1)
    (0 until 6).foreach(i => TxTable.append(spark, dir, batch(i * 200, 200)))
    TxTable.optimize(spark, dir, Seq("k"), targetBytes = target)
    val healthy = TxTable.read(spark, dir).inputFiles.toSet
    healthy.foreach { f =>
      val len = new java.io.File(new java.net.URI(f)).length()
      assert(len >= target / 2,
        s"test premise: every post-optimize file is above the fragment " +
          s"cutoff (got $len for $f)")
    }
    // a micro-batch trail of tiny fragments on top of the healthy base
    (0 until 8).foreach(i => TxTable.append(spark, dir, batch(2000 + i, 1)))
    val beforeRows = TxTable.read(spark, dir).collect().map(_.toSeq).toSet
    val total = TxTable.read(spark, dir).inputFiles.length
    assert(total === healthy.size + 8)
    // trigger: files >= maxFiles; the fragment-only scope suffices
    // (healthy.size + 1 < threshold), so the partial path must run
    val v = TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = total, targetBytes = target)
    assert(v.isDefined, "at the threshold the maintenance rewrite runs")
    val after = TxTable.read(spark, dir).inputFiles.toSet
    assert(healthy.subsetOf(after),
      "fragment-only compaction must keep every healthy file's path " +
        "untouched — an O(table) rewrite would stall a stream at scale")
    assert(after.size === healthy.size + 1,
      s"the 8-file trail must merge into one file (got ${after.size} " +
        s"vs ${healthy.size} healthy)")
    assert(TxTable.read(spark, dir).collect().map(_.toSeq).toSet ===
      beforeRows, "maintenance is layout-only — data identical")
    // and the freshly maintained table is below threshold again
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = total, targetBytes = target).isEmpty)
  }

  test("maintenance on an empty head is a no-op, not an error") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_mempty") + "/t"
    TxTable.overwrite(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    TxTable.delete(spark, dir, col("k") === 1L)
    assert(TxTable.read(spark, dir).count() === 0L)
    // reachable from maintainAfterAppend when an appender lands an
    // empty batch on an empty table — must return None, not throw
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 1).isEmpty)
    TxTable.maintainAfterAppend(spark, dir, Seq("k"),
      Some(TxTable.Maintenance(maxFiles = 1)))
  }

  test("grain-less (global) sketch table: maintenance bin-packs instead of erroring") {
    val s = spark
    import s.implicits._
    import graft.ops.Sketches
    val dir = tmp("graft_mglob") + "/t"
    val policy = Some(TxTable.Maintenance(maxFiles = 3))
    // a GLOBAL sketch has no grain columns — there is no z-order key,
    // and the maintenance hook must fall back to bin-pack compaction
    Sketches.writeHllGrains(
      (0L until 100L).map(i => Tuple1(i)).toDF("u"), dir, Nil, col("u"))
    (1 to 8).foreach { b =>
      Sketches.appendHllGrains(spark, dir,
        (100L * b until 100L * b + 100L).map(i => Tuple1(i)).toDF("u"),
        Nil, col("u"), maintain = policy)
      assert(TxTable.read(spark, dir).inputFiles.length <= 3,
        s"batch $b: the grain-less maintenance hook must cap the files")
    }
    val est = Sketches.hllServe(spark, dir, Nil)
      .head.getAs[Long]("approx_distinct").toDouble
    assert(math.abs(est - 900.0) / 900.0 < 0.05,
      s"global sketch must keep estimating through maintenance (got $est)")
  }

  test("retainVersions: maintenance vacuums the trail — disk bounded, time travel within retention") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_mret") + "/t"
    val policy = Some(TxTable.Maintenance(maxFiles = 6,
      retainVersions = Some(2)))
    TxTable.overwrite(spark, dir,
      (0L until 50L).map(i => (i, i % 7)).toDF("k", "v").coalesce(1))
    (1 to 20).foreach { b =>
      TxTable.append(spark, dir,
        Seq((1000L + b, b.toLong)).toDF("k", "v").coalesce(1))
      TxTable.maintainAfterAppend(spark, dir, Seq("k"), policy)
    }
    val vs = TxTable.versions(spark, dir)
    assert(vs.size < 21,
      s"the retention vacuum must have dropped old manifests (got $vs)")
    // superseded fragments actually LEFT DISK: every surviving data
    // file is referenced by a kept manifest (no unreferenced debris
    // besides what the grace period protects — nothing here is orphan)
    val live = vs.flatMap(v =>
      TxTable.readVersion(spark, dir, v).inputFiles).toSet
      .map((f: String) => new java.io.File(new java.net.URI(f)).toPath
        .toRealPath().toString)
    val onDisk = {
      import scala.jdk.CollectionConverters._
      val it = java.nio.file.Files.walk(
        java.nio.file.Paths.get(dir, "data"))
      try it.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(_.toRealPath().toString).toList
      finally it.close()
    }
    onDisk.foreach { f =>
      assert(live.contains(f),
        s"vacuumed trail must not leave superseded data files: $f")
    }
    // time travel WITHIN retention still serves; beyond it is gone
    assert(TxTable.readVersion(spark, dir, vs.head).count() > 0L)
    intercept[Exception] {
      TxTable.readVersion(spark, dir, 1L).collect()
    }
    assert(TxTable.read(spark, dir).count() === 70L)
  }

  test("50 maintained IVF appends: file count stays bounded, serve bit-equal") {
    import graft.ann.Similarity
    val lists = tmp("graft_mivf") + "/lists"
    val maxFiles = 8
    val policy = Some(TxTable.Maintenance(maxFiles = maxFiles))
    val rnd = new scala.util.Random(7)
    def vecs(lo: Long, n: Long) = df(
      (lo until lo + n).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f))))
      .toDF("vec_id", "embedding")
    val base = vecs(0, 40).localCheckpoint()
    val index = Similarity.buildIvfIndex(base, numLists = 4)
      .localCheckpoint()
    Similarity.writeIvfLists(base, index, lists)
    (1 to 50).foreach { b =>
      Similarity.ivfAppend(spark, lists, index, vecs(40 + 4L * b, 4),
        txn = Some(("ivf_m", b.toLong)), maintain = policy)
      val files = TxTable.read(spark, lists).inputFiles.length
      assert(files <= maxFiles,
        s"batch $b left $files files — the maintenance hook must cap it")
    }
    // maintained lists serve exactly a full one-shot assignment under
    // the same fixed centroids
    val all = TxTable.read(spark, lists)
      .select("vec_id", "embedding").localCheckpoint()
    val queries = all.filter(col("vec_id") < 3)
    val served = Similarity.ivfTopKFromLists(spark, lists, queries, 4,
      nprobe = 4, index).collect().map(_.toSeq).toSet
    val oneShot = Similarity.ivfTopKWithIndex(all, queries, 4,
      nprobe = 4, index).collect().map(_.toSeq).toSet
    assert(served === oneShot)
    assert(TxTable.read(spark, lists).count() === 240L)
  }
}
