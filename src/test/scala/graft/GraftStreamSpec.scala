package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** `spark.readStream.format("graft")`: manifest versions as streaming
  * offsets — each micro-batch reads exactly the files appended between
  * two snapshots, checkpoints resume at the committed version, and
  * stream-side transforms (filters) apply per batch.
  */
class GraftStreamSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streams each commit as a micro-batch and follows new appends") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_stream_t1")
      .option("checkpointLocation", tmp("graft_src_cp")).start()
    q.processAllAvailable()
    assert(spark.table("graft_stream_t1").collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
    TxTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_stream_t1").collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
  }

  test("readStream.table streams a catalog table — same source, SQL-addressed") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.table(s"graft.`$table`")
      .writeStream.format("memory").queryName("graft_stream_cat")
      .option("checkpointLocation", tmp("graft_src_cp")).start()
    q.processAllAvailable()
    assert(spark.table("graft_stream_cat").collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L))
    TxTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_stream_cat").collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("startingVersion skips history; stream transforms apply per batch") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table, Seq((1L, "old")).toDF("id", "v"))
    TxTable.append(spark, table, Seq((2L, "new"), (3L, "new")).toDF("id", "v"))
    val q = spark.readStream.format("graft")
      .option("startingVersion", 2).load(table)
      .filter(col("id") =!= 3L)
      .writeStream.format("memory").queryName("graft_stream_t2")
      .option("checkpointLocation", tmp("graft_src_cp")).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_stream_t2").collect().map(_.getLong(0)).toSeq
      === Seq(2L))
  }

  test("startingTimestamp begins at the first commit stamped at-or-after it") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table, Seq((1L, "old")).toDF("id", "v"))
    val ts1 = TxTable.commitTimestamp(spark, table, 1L)
    while (System.currentTimeMillis() <= ts1) Thread.sleep(1)
    TxTable.append(spark, table, Seq((2L, "new")).toDF("id", "v"))
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", ts1 + 1).load(table)
      .writeStream.format("memory").queryName("graft_stream_ts")
      .option("checkpointLocation", tmp("graft_src_cp")).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_stream_ts").collect().map(_.getLong(0)).toSeq
      === Seq(2L))
  }

  test("a compact mid-stream emits NOTHING — no full-table replay") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table,
      (0L until 10L).map(i => (i, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_stream_cpt")
      .option("checkpointLocation", tmp("graft_src_cp")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_stream_cpt").count() == 10)
      // layout rewrite: data-identical, so the stream must stay silent
      TxTable.compact(spark, table, targetBytes = 1L << 20)
      q.processAllAvailable()
      assert(spark.table("graft_stream_cpt").count() == 10,
        "compact must not replay the table into the stream")
      // appends after the compact flow normally — and a file appended
      // then compacted away within ONE batch window still emits once
      TxTable.append(spark, table, Seq((100L, "b")).toDF("id", "v"))
      TxTable.compact(spark, table, targetBytes = 1L << 20)
      TxTable.append(spark, table, Seq((101L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      val got = spark.table("graft_stream_cpt").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == ((0L until 10L) ++ Seq(100L, 101L)),
        s"exactly the appended rows, once each: $got")
    } finally q.stop()
  }

  test("startingTimestamp predating vacuumed history fails loudly") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table, Seq((1L, "a")).toDF("id", "v"))
    val ts1 = TxTable.commitTimestamp(spark, table, 1L)
    while (System.currentTimeMillis() <= ts1) Thread.sleep(1)
    TxTable.append(spark, table, Seq((2L, "b")).toDF("id", "v"))
    TxTable.vacuum(spark, table, keepVersions = 1) // v1's manifest gone
    // t predates the earliest retained commit: starting at 0 would
    // silently replay v1's rows folded into v2's snapshot — error out
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("startingTimestamp", ts1 - 1).load(table)
        .writeStream.format("memory").queryName("graft_stream_vac")
        .option("checkpointLocation", tmp("graft_src_cp")).start()
      try { q.processAllAvailable(); q.stop() }
      finally if (q.isActive) q.stop()
    }
    def anyCause(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(anyCause(e).contains("predates the earliest retained commit"))
  }

  test("checkpoint restart resumes at the committed version — no replays, no gaps") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    val cp = tmp("graft_src_cp")
    val out = tmp("graft_src_out") + "/o"
    TxTable.append(spark, table, Seq((1L, "a")).toDF("id", "v"))
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(table)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            graft.streaming.StreamingSink.appendBatch(out, "gs_restart")(b, id)
        }
        .option("checkpointLocation", cp).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TxTable.append(spark, table, Seq((2L, "b")).toDF("id", "v"))
    TxTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    run() // restart from checkpoint: versions 2-3 arrive exactly once
    assert(TxTable.read(spark, out).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L))
  }

  test("streaming ANN maintenance: a follower keeps the IVF lists current via ivfAppend") {
    // the composition ivfAppend's docstring promises, wired for real: a
    // graft-source stream over an embeddings TxTable routes each
    // micro-batch of new vectors to the fixed centroids and appends to
    // the persisted lists; serving then equals a one-shot full build
    val s = spark
    import graft.ann.Similarity
    val rnd = new scala.util.Random(53)
    def vec(i: Long) = (i, Array.fill(8)(rnd.nextFloat() - 0.5f))
    val all = (0L until 40L).map(vec)
    val table = tmp("graft_annsrc") + "/emb"
    val lists = tmp("graft_annlists") + "/lists"
    val cp = tmp("graft_anncp")
    val base = df(all.take(20)).toDF("vec_id", "embedding")
    TxTable.append(spark, table, base)
    val index = Similarity.buildIvfIndex(base, numLists = 4)
      .localCheckpoint()
    Similarity.writeIvfLists(base, index, lists)
    // the follower: every later embeddings commit lands in the lists
    val q = spark.readStream.format("graft")
      .option("startingVersion", TxTable.versions(spark, table).last + 1)
      .load(table)
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!b.isEmpty) {
            // txn + maintain together: the full production maintainer
            // shape — replay-safe AND self-compacting
            Similarity.ivfAppend(spark, lists, index, b,
              txn = Some(("ivf_m", bid)),
              maintain = Some(TxTable.Maintenance(maxFiles = 2))); ()
          }
      }
      .option("checkpointLocation", cp).start()
    TxTable.append(spark, table, df(all.slice(20, 30)).toDF("vec_id", "embedding"))
    TxTable.append(spark, table, df(all.slice(30, 40)).toDF("vec_id", "embedding"))
    q.processAllAvailable(); q.stop()
    // served results equal a from-scratch full assignment under the
    // same centroids — the appended index carries no trace of HOW the
    // vectors arrived
    val full = df(all).toDF("vec_id", "embedding")
    val queries = full.filter(col("vec_id") < 3)
    val served = Similarity.ivfTopKFromLists(spark, lists, queries, 4,
      nprobe = 4, index).collect().map(_.toSeq).toSet
    val oneShot = Similarity.ivfTopKWithIndex(full, queries, 4,
      nprobe = 4, index).collect().map(_.toSeq).toSet
    assert(served === oneShot)
    assert(TxTable.read(spark, lists).count() === 40L)
    // the maintain policy compacted inside the stream: the append
    // trail may never leave more files than its threshold behind
    assert(TxTable.read(spark, lists).inputFiles.length <= 2,
      "the foreachBatch maintainer must keep the lists compacted")
  }

  test("streaming sketch maintenance: a follower keeps the HLL grains current") {
    // the analytics twin of the ANN/BM25 maintenance specs: each
    // micro-batch of new events is sketched (O(batch)) and appended to
    // the grain table. Grains that arrive whole serve EXACTLY the
    // one-shot sketch; a grain split across commits is
    // envelope-equal, not bit-equal — datasketches HLL unions are
    // register-exact in dense mode, but in the sparse/coupon regime
    // (small distinct counts) a split can drift by a count or two vs
    // the unsplit sketch
    val s = spark
    import s.implicits._
    import graft.ops.Sketches
    def rows(r: Range, day: Int) =
      r.map(i => (day, (i * 2654435761L) % 500)).toDF("day", "user")
    val table = tmp("graft_sksrc") + "/events"
    val grains = tmp("graft_skgr") + "/sketches"
    val cp = tmp("graft_skcp")
    TxTable.append(spark, table, rows(0 until 300, day = 0))
    Sketches.writeHllGrains(TxTable.read(spark, table), grains,
      Seq("day"), col("user"))
    val q = spark.readStream.format("graft")
      .option("startingVersion", TxTable.versions(spark, table).last + 1)
      .load(table)
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!b.isEmpty) {
            Sketches.appendHllGrains(spark, grains, b, Seq("day"),
              col("user"), txn = Some(("hll_m", bid))); ()
          }
      }
      .option("checkpointLocation", cp).start()
    // day 1 deliberately split across two commits
    TxTable.append(spark, table, rows(0 until 200, day = 1))
    TxTable.append(spark, table, rows(200 until 400, day = 1))
    TxTable.append(spark, table, rows(0 until 250, day = 2))
    q.processAllAvailable(); q.stop()
    val served = Sketches.hllServe(spark, grains, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = Sketches.approxDistinct(TxTable.read(spark, table),
        Seq(col("day")), col("user"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // days 0 and 2 arrived whole → bit-equal; split day 1 →
    // envelope-equal (±2% rel, ±2 abs)
    assert(served(0) === direct(0) && served(2) === direct(2),
      s"whole-grain days must serve the one-shot sketch: $served vs $direct")
    assert(math.abs(served(1) - direct(1)) <=
      math.max(2.0, 0.02 * direct(1)),
      s"split day 1: served ${served(1)} vs direct ${direct(1)}")
  }

  test("streaming BM25 maintenance: a follower keeps the index current via appendToIndex") {
    // the lexical twin of the ANN-maintenance spec: each micro-batch of
    // new documents lands in the persisted inverted index with
    // checkDuplicates=false — the documented contract for provably-new
    // batches from an exactly-once stream — and serving afterwards
    // equals a from-scratch build over everything
    val s = spark
    import s.implicits._
    import graft.text.Bm25
    val table = tmp("graft_bmsrc") + "/docs"
    val idx = tmp("graft_bmidx") + "/index"
    val cp = tmp("graft_bmcp")
    def docs(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"word$i common merge token${i % 7}"))
      .toDF("doc_id", "text")
    TxTable.append(spark, table, docs(0, 20))
    Bm25.buildIndex(docs(0, 20), "doc_id", "text", idx)
    val q = spark.readStream.format("graft")
      .option("startingVersion", TxTable.versions(spark, table).last + 1)
      .load(table)
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!b.isEmpty) {
            Bm25.appendToIndex(spark, idx, b, "doc_id", "text",
              checkDuplicates = false, txn = Some(("bm25_m", bid))); ()
          }
      }
      .option("checkpointLocation", cp).start()
    TxTable.append(spark, table, docs(20, 30))
    TxTable.append(spark, table, docs(30, 40))
    q.processAllAvailable(); q.stop()
    val fresh = tmp("graft_bmfrs") + "/index"
    Bm25.buildIndex(docs(0, 40), "doc_id", "text", fresh)
    val queries = Seq(("a", "merge common"), ("b", "word25 token3"))
    assert(Bm25.searchIndexed(spark, idx, queries, topK = 10)
      .collect().map(_.toSeq).toSet ===
      Bm25.searchIndexed(spark, fresh, queries, topK = 10)
        .collect().map(_.toSeq).toSet)
    // carried stats tracked the stream exactly
    val vi = TxTable.versions(spark, idx).last
    val vf = TxTable.versions(spark, fresh).last
    assert(TxTable.commitMeta(spark, idx, vi)("graft.bm25.stats") ===
      TxTable.commitMeta(spark, fresh, vf)("graft.bm25.stats"))
  }

  test("BM25 index maintenance survives a checkpoint-crash replay: the txn guard no-ops the replayed batch") {
    // kill-and-restart MID-APPEND on the positional index: the batch's
    // postings committed but the stream checkpoint's commit marker was
    // lost — the classic at-least-once replay window. With
    // txn=(app, batchId) riding in the index commit, the replay is a
    // deterministic no-op: stats don't double-count, postings don't
    // duplicate, and the served ranking equals a from-scratch build.
    val s = spark
    import s.implicits._
    import graft.text.Bm25
    val table = tmp("graft_bmcr") + "/docs"
    val idx = tmp("graft_bmcr") + "/index"
    val cp = tmp("graft_bmcr_cp")
    def docs(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"word$i shared merge token${i % 5}"))
      .toDF("doc_id", "text")
    TxTable.append(spark, table, docs(0, 10))
    Bm25.buildIndex(docs(0, 10), "doc_id", "text", idx)
    val builtAt = TxTable.versions(spark, idx).last
    val follow = TxTable.versions(spark, table).last + 1
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", follow).load(table)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
            if (!b.isEmpty) {
              Bm25.appendToIndex(spark, idx, b, "doc_id", "text",
                checkDuplicates = false, txn = Some(("bm25_cr", bid))); ()
            }
        }
        .option("checkpointLocation", cp).start()
      q.processAllAvailable(); q.stop()
    }
    TxTable.append(spark, table, docs(10, 20))
    run() // batch 0: postings for docs 10-19 land in the index
    // crash window: the index commit landed, the stream's commit
    // marker did not — delete it so the restart REPLAYS batch 0
    java.nio.file.Files.delete(java.nio.file.Paths.get(cp, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(cp, "commits", ".0.crc"))
    TxTable.append(spark, table, docs(20, 30))
    run() // replays batch 0 (must skip) then lands batch 1
    val fresh = tmp("graft_bmcr_f") + "/index"
    Bm25.buildIndex(docs(0, 30), "doc_id", "text", fresh)
    // no duplicated postings, exact stats, identical serve
    assert(TxTable.read(spark, idx).count() ===
      TxTable.read(spark, fresh).count())
    assert(TxTable.commitMeta(spark, idx,
        TxTable.versions(spark, idx).last)("graft.bm25.stats") ===
      TxTable.commitMeta(spark, fresh,
        TxTable.versions(spark, fresh).last)("graft.bm25.stats"))
    val queries = Seq(("a", "shared token3"), ("b", "word25 word12"))
    assert(Bm25.searchIndexed(spark, idx, queries, topK = 10)
      .collect().map(_.toSeq).toSet ===
      Bm25.searchIndexed(spark, fresh, queries, topK = 10)
        .collect().map(_.toSeq).toSet)
    // exactly 2 real appends past the build — the replay committed
    // NOTHING
    assert(TxTable.versions(spark, idx).last === builtAt + 2,
      s"replayed batch must be a no-op: ${TxTable.versions(spark, idx)}")
  }

  test("IVF list maintenance survives a checkpoint-crash replay: the txn guard no-ops the replayed batch") {
    // the dense-index twin of the BM25 crash spec: replayed vector
    // batches must not land twice in their inverted lists
    val s = spark
    import graft.ann.Similarity
    val rnd = new scala.util.Random(71)
    def vec(i: Long) = (i, Array.fill(8)(rnd.nextFloat() - 0.5f))
    val all = (0L until 40L).map(vec)
    val table = tmp("graft_ivfcr") + "/emb"
    val lists = tmp("graft_ivfcr") + "/lists"
    val cp = tmp("graft_ivfcr_cp")
    val base = df(all.take(20)).toDF("vec_id", "embedding")
    TxTable.append(spark, table, base)
    val index = Similarity.buildIvfIndex(base, numLists = 4)
      .localCheckpoint()
    Similarity.writeIvfLists(base, index, lists)
    val follow = TxTable.versions(spark, table).last + 1
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", follow).load(table)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
            if (!b.isEmpty) {
              Similarity.ivfAppend(spark, lists, index, b,
                txn = Some(("ivf_cr", bid))); ()
            }
        }
        .option("checkpointLocation", cp).start()
      q.processAllAvailable(); q.stop()
    }
    TxTable.append(spark, table, df(all.slice(20, 30)).toDF("vec_id", "embedding"))
    run() // batch 0 lands vectors 20-29
    java.nio.file.Files.delete(java.nio.file.Paths.get(cp, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(cp, "commits", ".0.crc"))
    TxTable.append(spark, table, df(all.slice(30, 40)).toDF("vec_id", "embedding"))
    run() // replays batch 0 (must skip) then lands batch 1
    assert(TxTable.read(spark, lists).count() === 40L,
      "a replayed vector batch must not plant rows twice")
    assert(TxTable.versions(spark, lists).size === 3,
      s"write + 2 appends only: ${TxTable.versions(spark, lists)}")
    // served results still equal a one-shot full assignment
    val full = df(all).toDF("vec_id", "embedding")
    val queries = full.filter(col("vec_id") < 3)
    assert(Similarity.ivfTopKFromLists(spark, lists, queries, 4,
        nprobe = 4, index).collect().map(_.toSeq).toSet ===
      Similarity.ivfTopKWithIndex(full, queries, 4,
        nprobe = 4, index).collect().map(_.toSeq).toSet)
  }

  test("column pruning still reaches the parquet scan on the batch path") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_src") + "/t"
    TxTable.append(spark, table,
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "v", "x"))
    val q = spark.read.format("graft").load(table).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }

  /** (id, x, _change_type, _commit_version) tuples — the timestamp is
    * compared separately (it must match the batch feed's stamp).
    */
  private def changeTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getTimestamp(4))).sortBy(t => (t._4, t._3, t._1)).toSeq

  test("readChangeFeed streams row-level changes with batch readChanges parity") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_cdf") + "/t"
    // a history mixing every capture mode: file-granular (append),
    // row-level DML (update/delete/merge), row-change-free (compact)
    TxTable.append(spark, table,
      (0L until 6L).map(i => (i, i * 10L)).toDF("id", "x").coalesce(1))
    TxTable.update(spark, table, col("id") === 2L, Map("x" -> lit(-2L)))
    TxTable.delete(spark, table, col("id") === 3L)
    TxTable.compact(spark, table, targetBytes = 1L << 20)
    TxTable.merge(spark, table,
      Seq((0L, 100L), (9L, 90L)).toDF("id", "x"), Seq("id"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(table)
      .writeStream.format("memory").queryName("graft_cdf_stream")
      .option("checkpointLocation", tmp("graft_cdf_cp")).start()
    try {
      q.processAllAvailable()
      val streamed = changeTuples(spark.table("graft_cdf_stream").collect())
      val batch = changeTuples(
        TxTable.readChanges(spark, table, 0L).collect())
      assert(streamed === batch,
        s"streamed feed must equal batch readChanges:\n$streamed\nvs\n$batch")
      assert(streamed.exists(_._3 == "update_preimage") &&
        streamed.exists(_._3 == "delete") &&
        streamed.exists(_._3 == "insert"), s"all tags present: $streamed")
      // a mid-stream DML arrives incrementally, tagged with ITS version
      val v0 = TxTable.versions(spark, table).last
      TxTable.delete(spark, table, col("id") === 9L)
      q.processAllAvailable()
      val tail = changeTuples(spark.table("graft_cdf_stream").collect())
        .filter(_._4 > v0)
      assert(tail === changeTuples(
        TxTable.readChanges(spark, table, v0).collect()),
        s"incremental batch must equal readChanges($v0, head): $tail")
    } finally q.stop()
  }

  test("partitioned table streams its partition columns with path values, batch-read order") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_part") + "/t"
    // partition column in the MIDDLE of the declared order — the V2
    // surface (batch AND stream) puts partition columns last
    // (GraftResolve contract); the bug class under test is the VALUES:
    // a bare leaf-file scan reads pt from footers that never stored it
    TxTable.append(spark, table,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "pt", "x"),
      partitionCols = Seq("pt"))
    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_stream_part")
      .option("checkpointLocation", tmp("graft_part_cp")).start()
    try {
      q.processAllAvailable()
      val streamedCols = spark.table("graft_stream_part").columns.toSeq
      assert(streamedCols ===
        spark.read.format("graft").load(table).columns.toSeq,
        "stream and batch V2 reads must agree on column order")
      val got = spark.table("graft_stream_part")
        .select("id", "pt", "x").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      assert(got === Seq((1L, "a", 10L), (2L, "b", 20L)),
        s"partition values must come from the path, never nulls: $got")
    } finally q.stop()
  }

  test("partitioned table CDF: stream/batch parity, partition values intact") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_part_cdf") + "/t"
    TxTable.append(spark, table,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
        .toDF("id", "pt", "x").coalesce(1),
      partitionCols = Seq("pt"))
    TxTable.update(spark, table, col("id") === 2L, Map("x" -> lit(-2L)),
      partitionCols = Seq("pt"))
    TxTable.delete(spark, table, col("id") === 3L, partitionCols = Seq("pt"))
    // compare by NAME: the batch readChanges surfaces declared order,
    // the V2 feed partition-columns-last — values must agree row-for-row
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "pt", "x", TxTable.ChangeTypeCol,
          TxTable.CommitVersionCol).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3), r.getLong(4))).sortBy(t => (t._5, t._4, t._1)).toSeq
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(table)
      .writeStream.format("memory").queryName("graft_part_cdf_stream")
      .option("checkpointLocation", tmp("graft_part_cdf_cp")).start()
    try {
      q.processAllAvailable()
      val streamed = tuples(spark.table("graft_part_cdf_stream"))
      val batch = tuples(TxTable.readChanges(spark, table, 0L))
      assert(streamed === batch,
        s"partitioned CDF stream must equal batch readChanges:\n" +
          s"$streamed\nvs\n$batch")
      // the v1 fallback rows (file-granular) come from partition dirs:
      // pt must be the path value, never null
      assert(streamed.count(_._5 == 1L) == 3 &&
        streamed.filter(_._5 == 1L).forall(t => t._2 == "a" || t._2 == "b"),
        s"fallback rows must recover hive partition values: $streamed")
    } finally q.stop()
  }

  test("CDF resume from a vacuumed version fails loudly (no silent DML skip)") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_cdf_vac") + "/t"
    TxTable.append(spark, table, Seq((1L, 10L)).toDF("id", "x"))
    TxTable.update(spark, table, col("id") === 1L, Map("x" -> lit(-1L)))
    TxTable.append(spark, table, Seq((2L, 20L)).toDF("id", "x"))
    TxTable.vacuum(spark, table, keepVersions = 1) // only v3 retained
    // resuming from v1 would skip v2's DML changes silently (change
    // files need no baseline, so only an explicit guard catches it)
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", "2").load(table).collect()
    }
    assert(e.getMessage.contains("were vacuumed"), e.getMessage)
  }

  test("CDF endingVersion beyond the head is reported as a bad argument, not vacuum") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_cdf_end") + "/t"
    TxTable.append(spark, table, Seq((1L, 10L)).toDF("id", "x"))
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("endingVersion", "99").load(table).collect()
    }
    assert(e.getMessage.contains("does not exist") &&
      e.getMessage.contains("head is version 1"), e.getMessage)
  }

  test("batch read with readChangeFeed serves the same feed; startingVersion scopes it") {
    val s = spark
    import s.implicits._
    val table = tmp("graft_cdf") + "/t"
    TxTable.append(spark, table,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1))
    TxTable.update(spark, table, col("id") === 1L, Map("x" -> lit(-1L)))
    val full = changeTuples(spark.read.format("graft")
      .option("readChangeFeed", "true").load(table).collect())
    assert(full === changeTuples(
      TxTable.readChanges(spark, table, 0L).collect()))
    // startingVersion=2 → only the update commit's changes
    val scoped = changeTuples(spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(table).collect())
    assert(scoped === changeTuples(
      TxTable.readChanges(spark, table, 1L).collect()))
    assert(scoped.forall(_._4 == 2L), s"only v2 changes: $scoped")
  }
}
