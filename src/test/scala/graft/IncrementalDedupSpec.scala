package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, IncDedupConfig, IncrementalDedup}
import graft.ops.TxTable
import graft.streaming.StreamingSink

case class IncDoc(doc_id: Long, text: String)

class IncrementalDedupSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("incdedup").toString + "/idx"

  // long repetitive docs so shingle sets are big and MinHash estimates
  // are tight: near-dups agree on almost all components, distinct docs
  // on almost none
  private def doc(seed: String, tweak: Int = -1): String = {
    val words = (0 until 60).map(i => s"$seed word$i token$i")
    val t = if (tweak >= 0) words.updated(tweak, "changed bit here") else words
    t.mkString(" ")
  }

  private val cfg = IncDedupConfig(minAgree = 0.6)

  test("ingest drops near-dups of the corpus, keeps novel docs, grows the index") {
    val idx = tmp()
    val corpus = df(Seq(IncDoc(1L, doc("alpha")), IncDoc(2L, doc("beta"))))
    IncrementalDedup.init(spark, idx, corpus, "doc_id", "text", cfg)

    val batch = df(Seq(
      IncDoc(10L, doc("alpha", tweak = 3)), // near-dup of corpus doc 1
      IncDoc(11L, doc("gamma"))))           // novel
    val out = IncrementalDedup
      .ingest(spark, idx, batch, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(11L))
    // index grew by exactly the survivor
    val ids = TxTable.read(spark, idx).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 11L))
  }

  test("within-batch clusters keep the minimum id after the corpus check") {
    val idx = tmp()
    IncrementalDedup.init(spark, idx,
      df(Seq(IncDoc(1L, doc("alpha")))), "doc_id", "text", cfg)
    val batch = df(Seq(
      IncDoc(20L, doc("delta")),
      IncDoc(21L, doc("delta", tweak = 5)), // near-dup of 20 → loses
      IncDoc(22L, doc("epsilon"))))
    val out = IncrementalDedup
      .ingest(spark, idx, batch, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(20L, 22L))
  }

  test("replayed batchId recomputes the same survivors and does not double-index") {
    val idx = tmp()
    IncrementalDedup.init(spark, idx,
      df(Seq(IncDoc(1L, doc("alpha")))), "doc_id", "text", cfg)
    val batch = df(Seq(
      IncDoc(30L, doc("alpha", tweak = 7)), // dup of corpus
      IncDoc(31L, doc("zeta"))))
    val first = IncrementalDedup.ingest(spark, idx, batch, "doc_id", "text",
      cfg, batchId = Some(0L)).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val replay = IncrementalDedup.ingest(spark, idx, batch, "doc_id", "text",
      cfg, batchId = Some(0L)).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(first.toSeq === Seq(31L))
    assert(replay.toSeq === Seq(31L)) // same decision on replay
    val ids = TxTable.read(spark, idx).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 31L)) // appended once, not twice
    assert(StreamingSink.lastTxnVersion(spark, idx, "inc-dedup") === Some(0L))
  }

  test("short docs (no shingles) pass through and are not indexed") {
    val idx = tmp()
    IncrementalDedup.init(spark, idx,
      df(Seq(IncDoc(1L, doc("alpha")))), "doc_id", "text", cfg)
    val out = IncrementalDedup.ingest(spark, idx,
        df(Seq(IncDoc(40L, "too short"))), "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(40L))
    val ids = TxTable.read(spark, idx).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L))
  }

  test("incremental ingest matches the batch-global signature-agreement dedup") {
    // two-step ingest over A then B ≡ what the same pipeline would keep
    // given perfect clusters: novel docs + one canonical per cluster,
    // earlier-ingested docs beating later ones
    val idx = tmp()
    val a = df(Seq(IncDoc(1L, doc("p")), IncDoc(2L, doc("q"))))
    val b = df(Seq(
      IncDoc(3L, doc("p", tweak = 2)),  // dup of 1 → dropped
      IncDoc(4L, doc("r")),             // novel
      IncDoc(5L, doc("r", tweak = 9)))) // dup of 4 within batch → dropped
    IncrementalDedup.init(spark, idx, a, "doc_id", "text", cfg)
    IncrementalDedup.ingest(spark, idx, b, "doc_id", "text", cfg)
    val ids = TxTable.read(spark, idx).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 4L))

    // and the global pairs the estimator finds on A ∪ B link exactly
    // {1,3} and {4,5} — the clusters the incremental path resolved
    val pairs = Dedup.minhashDedupPairs(a.unionByName(b), "doc_id", "text",
        n = 3, minJ = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 3L), (4L, 5L)))
  }

  test("remove stops a purged doc from suppressing future near-dups") {
    val idx = tmp()
    IncrementalDedup.init(spark, idx,
      df(Seq(IncDoc(1L, doc("alpha")), IncDoc(2L, doc("beta")))),
      "doc_id", "text", cfg)
    // while doc 1 is indexed, its near-dup is dropped
    val before = IncrementalDedup.ingest(spark, idx,
        df(Seq(IncDoc(10L, doc("alpha", tweak = 3)))), "doc_id", "text", cfg)
      .count()
    assert(before === 0L)
    // purge doc 1 — ONE commit; unknown ids are a no-op
    val vs0 = TxTable.versions(spark, idx).size
    assert(IncrementalDedup.remove(spark, idx, Seq(1L)).isDefined)
    assert(TxTable.versions(spark, idx).size === vs0 + 1)
    assert(IncrementalDedup.remove(spark, idx, Seq(999L)).isEmpty)
    // the NEXT near-dup of the purged doc now survives and is indexed
    // (nothing left in the corpus for it to duplicate)
    val after = IncrementalDedup.ingest(spark, idx,
        df(Seq(IncDoc(11L, doc("alpha", tweak = 7)))), "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(after === Seq(11L))
    val ids = TxTable.read(spark, idx).select("id")
      .collect().map(_.getLong(0)).sorted
    // 1 purged; 10's drop is FINAL (decisions are not resurrected)
    assert(ids.toSeq === Seq(2L, 11L))
  }

  test("init refuses an existing index") {
    val idx = tmp()
    val a = df(Seq(IncDoc(1L, doc("p"))))
    IncrementalDedup.init(spark, idx, a, "doc_id", "text", cfg)
    intercept[IllegalArgumentException] {
      IncrementalDedup.init(spark, idx, a, "doc_id", "text", cfg)
    }
  }
}
