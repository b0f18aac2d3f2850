package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.TxTable
import graft.streaming.StreamingSink

/** Exactly-once streaming appends into the TxTable: the (txn.app →
  * batchId) token commits atomically with the data manifest, is carried
  * forward by every later commit (so it survives vacuum), and a replayed
  * micro-batch — whether re-invoked directly or re-run from a crashed
  * checkpoint — never lands twice (VERDICT r4 "do this" #2/#4; ADVICE r4
  * vacuum-durability item).
  */
class StreamingSinkSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("stream appends land in the TxTable with one commit per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("graft_ss") + "/t"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingSink.toTxTable(mem.toDF().toDF("id", "v"),
      table, "app_e2e", tmp("graft_ss_cp"))
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    // an incremental consumer records the version it has processed...
    val consumed = TxTable.versions(spark, table).last
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(TxTable.read(spark, table).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(StreamingSink.lastTxnVersion(spark, table, "app_e2e").contains(1L))
    // ...and readAppended hands it exactly the rows streamed in since —
    // the composed stream → table → incremental-consumer pipeline never
    // rescans history (file-level assertion in the test below)
    assert(TxTable.readAppended(spark, table, fromV = consumed)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("a directly re-invoked micro-batch (sink-level replay) is skipped") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_ss") + "/t"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamingSink.appendBatch(table, "app_replay")(batch, 0L)
    StreamingSink.appendBatch(table, "app_replay")(batch, 0L) // replay
    assert(TxTable.read(spark, table).count() == 2)
    assert(TxTable.versions(spark, table) == Seq(1L))
    // an EARLIER batch id replayed after later ones is also skipped (>=)
    StreamingSink.appendBatch(table, "app_replay")(
      Seq((3L, "c")).toDF("id", "v"), 1L)
    StreamingSink.appendBatch(table, "app_replay")(batch, 0L)
    assert(TxTable.read(spark, table).count() == 3)
  }

  test("restart from a checkpoint whose last commit was lost replays without duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("graft_ss") + "/t"
    val cp = tmp("graft_ss_cp")
    val mem = MemoryStream[(Long, String)]
    val q1 = StreamingSink.toTxTable(mem.toDF().toDF("id", "v"),
      table, "app_crash", cp)
    mem.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable()
    q1.stop()
    assert(TxTable.read(spark, table).count() == 2)

    // simulate a crash AFTER the sink append but BEFORE the engine
    // recorded batch 0 in the checkpoint commit log: on restart the
    // engine re-runs batch 0 with the same id → the sink must skip it
    Files.delete(Paths.get(cp, "commits", "0"))
    Files.deleteIfExists(Paths.get(cp, "commits", ".0.crc"))
    val q2 = StreamingSink.toTxTable(mem.toDF().toDF("id", "v"),
      table, "app_crash", cp)
    q2.processAllAvailable() // replays batch 0
    mem.addData((3L, "c"))
    q2.processAllAvailable() // new batch 1
    q2.stop()
    assert(TxTable.read(spark, table).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "the replayed micro-batch must not re-append its rows")
    assert(StreamingSink.lastTxnVersion(spark, table, "app_crash").contains(1L))
  }

  test("the txn token survives vacuum and foreign commits (carried meta)") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_ss") + "/t"
    StreamingSink.appendBatch(table, "app_vac")(Seq((1L, "a")).toDF("id", "v"), 0L)
    StreamingSink.appendBatch(table, "app_vac")(Seq((2L, "b")).toDF("id", "v"), 1L)
    // a different writer commits with no meta — the txn.* token must ride along
    TxTable.append(spark, table, Seq((9L, "z")).toDF("id", "v"))
    // vacuum prunes every manifest that originally recorded app_vac's batches
    TxTable.vacuum(spark, table, keepVersions = 1)
    assert(TxTable.versions(spark, table).size == 1)
    assert(StreamingSink.lastTxnVersion(spark, table, "app_vac").contains(1L),
      "vacuum must not lose the idempotence token")
    StreamingSink.appendBatch(table, "app_vac")(Seq((1L, "a")).toDF("id", "v"), 1L)
    assert(TxTable.read(spark, table).count() == 3,
      "a replay after vacuum must still be detected")
  }

  test("incremental consumer reads exactly the appended files, no history rescan") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_ss") + "/t"
    StreamingSink.appendBatch(table, "app_inc")(
      Seq.tabulate(10)(i => (i.toLong, "old")).toDF("id", "v"), 0L)
    val consumed = TxTable.versions(spark, table).last
    StreamingSink.appendBatch(table, "app_inc")(
      Seq((100L, "new"), (101L, "new")).toDF("id", "v"), 1L)
    val head = TxTable.versions(spark, table).last

    val delta = TxTable.readAppended(spark, table, fromV = consumed)
    assert(delta.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L))
    // the PLAN proves no rescan: its input files are exactly the files
    // the new commit added, none of the 10-row history
    val (added, _) = TxTable.changedFiles(spark, table, consumed, head)
    val scanned = delta.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned.nonEmpty && scanned == added.map(f =>
      Paths.get(table).toAbsolutePath.toString + "/" + f).toSet,
      s"scanned $scanned but commit added $added")
  }

  test("streaming upsert converges to one row per key, latest in-batch update winning") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("graft_sm") + "/t"
    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingSink.toTxTableMerge(mem.toDF().toDF("id", "v", "seq"),
      table, "app_merge", tmp("graft_sm_cp"), Seq("id"), latestBy = Some("seq"))
    // batch 0 bootstraps the table (merge requires an existing table);
    // key 1 arrives twice in one batch — seq 11 must win, not explode merge
    mem.addData((1L, "a0", 10L), (1L, "a1", 11L), (2L, "b0", 10L))
    q.processAllAvailable()
    // batch 1: update 1, insert 3
    mem.addData((1L, "a2", 20L), (3L, "c0", 20L))
    q.processAllAvailable()
    q.stop()
    val got = TxTable.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a2", 2L -> "b0", 3L -> "c0"))
    assert(StreamingSink.lastTxnVersion(spark, table, "app_merge").contains(1L))
  }

  test("a directly re-invoked merge micro-batch is skipped") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_sm") + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamingSink.mergeBatch(table, "app_mr", Seq("id"))(b0, 0L)
    StreamingSink.mergeBatch(table, "app_mr", Seq("id"))(b0, 0L) // replay
    assert(TxTable.read(spark, table).count() == 2)
    assert(TxTable.versions(spark, table) == Seq(1L))
    StreamingSink.mergeBatch(table, "app_mr", Seq("id"))(
      Seq((1L, "a2")).toDF("id", "v"), 1L)
    StreamingSink.mergeBatch(table, "app_mr", Seq("id"))(b0, 0L) // stale replay
    val got = TxTable.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a2", 2L -> "b"),
      "the stale replay must not roll key 1 back")
  }

  test("merge-sink restart from a lost checkpoint commit replays without double-applying") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("graft_sm") + "/t"
    val cp = tmp("graft_sm_cp")
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("id", "v", "seq")
    val q1 = StreamingSink.toTxTableMerge(stream, table, "app_mcr", cp,
      Seq("id"), latestBy = Some("seq"))
    mem.addData((1L, "a0", 10L), (2L, "b0", 10L))
    q1.processAllAvailable()
    q1.stop()
    Files.delete(Paths.get(cp, "commits", "0"))
    Files.deleteIfExists(Paths.get(cp, "commits", ".0.crc"))
    val q2 = StreamingSink.toTxTableMerge(stream, table, "app_mcr", cp,
      Seq("id"), latestBy = Some("seq"))
    q2.processAllAvailable() // replays batch 0 — must skip
    mem.addData((1L, "a1", 20L))
    q2.processAllAvailable()
    q2.stop()
    val got = TxTable.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a1", 2L -> "b0"))
    // exactly: bootstrap append + skip + one merge = 2 commits
    assert(TxTable.versions(spark, table).size == 2)
  }

  test("streaming quality gate: static LM model scores each micro-batch; replay-safe") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // fit + persist the model ONCE (batch, e.g. over yesterday's corpus)
    val corpus = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "qq zz xx vv")).toDF("doc_id", "text")
    val modelDir = tmp("graft_lmq") + "/model"
    graft.text.LmScore.writeModel(
      graft.text.LmScore.fit(corpus, "text"), modelDir)
    val model = graft.text.LmScore.loadModel(spark, modelDir)

    // stream new docs through the gate: score against the STATIC model
    // inside foreachBatch (per-batch batch semantics — the groupBy in
    // scoreDocs needs no streaming state), keep in-distribution docs
    val table = tmp("graft_lmq") + "/t"
    val mem = MemoryStream[(Long, String)]
    val threshold = -3.5
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        StreamingSink.appendBatch(table, "app_lmgate")(
          graft.text.LmScore.scoreDocs(batch, "doc_id", "text", model)
            .filter(col("lm_score") >= threshold), id)
      }
      .option("checkpointLocation", tmp("graft_lmq_cp")).start()
    mem.addData((10L, "the cat sat on the rug"), (11L, "zz vv zz vv zz"))
    q.processAllAvailable()
    q.stop()

    // batch reference: same model, same gate, one pass
    val expect = graft.text.LmScore.scoreDocs(
        Seq((10L, "the cat sat on the rug"), (11L, "zz vv zz vv zz"))
          .toDF("doc_id", "text"), "doc_id", "text", model)
      .filter(col("lm_score") >= threshold)
      .collect().map(_.getLong(0)).toSet
    val got = TxTable.read(spark, table).collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.contains(10L) && !got.contains(11L)) // the gate actually gates
    // sink-level replay of the same batch id cannot double-append
    StreamingSink.appendBatch(table, "app_lmgate")(
      Seq((10L, "the cat sat on the rug")).toDF("doc_id", "text")
        .withColumn("lm_score", org.apache.spark.sql.functions.lit(-1.0)), 0L)
    assert(TxTable.read(spark, table).count() === got.size.toLong)
  }

  test("readAppended on an all-empty snapshot: pinned schema → empty frame, else loud error") {
    val table = tmp("graft_ss") + "/t"
    // an empty snapshot: a manifest with a head line and no file lines
    // (documented layout — TxTable.scala "Layout" scaladoc)
    Files.createDirectories(Paths.get(table, "_txlog"))
    Files.write(Paths.get(table, "_txlog", "v00000000001.manifest"),
      "overwrite deadbeef\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val pinned = TxTable.readAppended(spark, table, fromV = 0L,
      schema = Some(schema))
    assert(pinned.schema == schema && pinned.count() == 0)
    val err = intercept[RuntimeException](
      TxTable.readAppended(spark, table, fromV = 0L))
    assert(err.getMessage.contains("empty snapshot"))
  }
}
