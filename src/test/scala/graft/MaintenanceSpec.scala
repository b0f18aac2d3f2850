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
