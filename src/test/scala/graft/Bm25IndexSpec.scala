package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TxTable
import graft.text.Bm25

/** The persisted BM25 inverted index (`Bm25.buildIndex` /
  * `appendToIndex` / `searchIndexed`): serve ≡ the per-call
  * [[graft.text.Bm25.search]] bit-exactly, append ≡ from-scratch
  * rebuild, duplicate ingestion refused, stats meta exact, serve reads
  * manifest-pruned to query-term files.
  */
class Bm25IndexSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_bm25").toString + "/idx"

  private val corpus = Seq(
    BmDoc(1L, "spark spark spark merge"),
    BmDoc(2L, "spark merge"),
    BmDoc(3L, "merge merge merge merge table"),
    BmDoc(4L, "window agg group"),
    BmDoc(5L, "table table spark window"),
    BmDoc(6L, "stream window join table"),
    BmDoc(7L, ""), // zero tokens: excluded from N, never matches
    BmDoc(8L, "agg agg spark stream"))

  private val queries = Seq(("a", "spark table"), ("b", "merge window"),
    ("c", "stream agg join"))

  test("searchIndexed over a built index equals search, bit-exactly") {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    val direct = Bm25.search(df(corpus), "doc_id", "text", queries,
      topK = 10).collect().map(_.toSeq).toSet
    val served = Bm25.searchIndexed(spark, idx, queries, topK = 10)
      .collect().map(_.toSeq).toSet
    assert(served === direct)
  }

  test("append equals a from-scratch rebuild, bit-exactly") {
    val base = corpus.filter(_.doc_id % 3 != 0)
    val inc = corpus.filter(_.doc_id % 3 == 0)
    val appended = tmp()
    Bm25.buildIndex(df(base), "doc_id", "text", appended)
    Bm25.appendToIndex(spark, appended, df(inc), "doc_id", "text")
    val fresh = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", fresh)
    val a = Bm25.searchIndexed(spark, appended, queries, topK = 10)
      .collect().map(_.toSeq).toSet
    val f = Bm25.searchIndexed(spark, fresh, queries, topK = 10)
      .collect().map(_.toSeq).toSet
    assert(a === f)
    // and the carried stats agree exactly (N counts only docs with
    // tokens: doc 7 is excluded on both paths)
    val va = TxTable.versions(spark, appended).last
    val vf = TxTable.versions(spark, fresh).last
    assert(TxTable.commitMeta(spark, appended, va)("graft.bm25.stats") ===
      TxTable.commitMeta(spark, fresh, vf)("graft.bm25.stats"))
    assert(TxTable.commitMeta(spark, fresh, vf)("graft.bm25.stats") ===
      "7:26")
  }

  test("duplicate ingestion refused: re-append, within-batch dup, wrong id col") {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    val again = intercept[IllegalArgumentException](
      Bm25.appendToIndex(spark, idx, df(corpus.take(2)), "doc_id", "text"))
    assert(again.getMessage.contains("already indexed"))
    val inBatch = intercept[IllegalArgumentException](
      Bm25.appendToIndex(spark, idx,
        df(Seq(BmDoc(100L, "x y"), BmDoc(100L, "z"))), "doc_id", "text"))
    assert(inBatch.getMessage.contains("more than once"))
    val wrongCol = intercept[RuntimeException](
      Bm25.appendToIndex(spark, idx,
        df(Seq(BmDoc(100L, "x"))).withColumnRenamed("doc_id", "id"),
        "id", "text"))
    assert(wrongCol.getMessage.contains("built on id column"))
  }

  test("serve reads are manifest-pruned to the query terms' files") {
    val idx = tmp()
    // two token ranges far apart, landing in separate commits' files:
    // 'aaa*' postings via the build, 'zzz*' ones via an append (AQE
    // coalesces a corpus this small to one file per commit, so the
    // file-granular pruning is exercised across the two)
    val aaa = (2L to 400L by 2).map(i => BmDoc(i, s"aaa$i common"))
    val zzz = (1L to 399L by 2).map(i => BmDoc(i, s"zzz$i common"))
    Bm25.buildIndex(df(aaa), "doc_id", "text", idx)
    Bm25.appendToIndex(spark, idx, df(zzz), "doc_id", "text")
    val all = TxTable.read(spark, idx).inputFiles.length
    val pruned = TxTable.readWhere(spark, idx, col("token") === "aaa2")
      .inputFiles.length
    assert(all > 1, s"expected a multi-file index, got $all")
    assert(pruned < all,
      s"token filter should prune files: $pruned of $all scanned")
    // and the pruned serve still answers correctly
    val hit = Bm25.searchIndexed(spark, idx, Seq(("q", "aaa2")), topK = 1)
      .collect().head
    assert(hit.getLong(2) === 2L)
  }

  test("removeFromIndex serves as if the docs never existed; stats re-derived") {
    val withRemoval = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", withRemoval)
    Bm25.removeFromIndex(spark, withRemoval, Seq(1L, 3L))
    val never = tmp()
    Bm25.buildIndex(df(corpus.filterNot(d => Set(1L, 3L)(d.doc_id))),
      "doc_id", "text", never)
    val a = Bm25.searchIndexed(spark, withRemoval, queries, topK = 10)
      .collect().map(_.toSeq).toSet
    val b = Bm25.searchIndexed(spark, never, queries, topK = 10)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    val va = TxTable.versions(spark, withRemoval).last
    val vb = TxTable.versions(spark, never).last
    assert(TxTable.commitMeta(spark, withRemoval, va)("graft.bm25.stats")
      === TxTable.commitMeta(spark, never, vb)("graft.bm25.stats"))
    // removed docs re-ingestable afterwards: the duplicate guard sees
    // the SURVIVING postings, and append == rebuild still holds
    Bm25.appendToIndex(spark, withRemoval,
      df(corpus.filter(d => Set(1L, 3L)(d.doc_id))), "doc_id", "text")
    val full = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", full)
    assert(Bm25.searchIndexed(spark, withRemoval, queries, topK = 10)
      .collect().map(_.toSeq).toSet ===
      Bm25.searchIndexed(spark, full, queries, topK = 10)
        .collect().map(_.toSeq).toSet)
  }

  test("removal is ONE atomic commit carrying exact post-delete stats") {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    val before = TxTable.versions(spark, idx).size
    Bm25.removeFromIndex(spark, idx, Seq(1L, 3L))
    // stats ride IN the delete commit: no separate stats version, so a
    // reader can never land between rows changing and stats changing
    assert(TxTable.versions(spark, idx).size === before + 1)
    val head = TxTable.versions(spark, idx).last
    // survivors 2,4,5,6,8 (7 is zero-token): 2+3+4+4+4 = 17 tokens
    assert(TxTable.commitMeta(spark, idx, head)("graft.bm25.stats") ===
      "5:17")
    // removing ids that have no postings is an exact no-op: no commit
    val vs = TxTable.versions(spark, idx).size
    Bm25.removeFromIndex(spark, idx, Seq(999L))
    assert(TxTable.versions(spark, idx).size === vs)
  }

  test("malformed stats meta fails with the curated diagnostic; refresh repairs") {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    val good = TxTable.commitMeta(spark, idx,
      TxTable.versions(spark, idx).last)("graft.bm25.stats")
    TxTable.setCarriedMeta(spark, idx, Map("graft.bm25.stats" -> "oops"))
    val e = intercept[RuntimeException](
      Bm25.searchIndexed(spark, idx, queries))
    assert(e.getMessage.contains("not a BM25 index") &&
      e.getMessage.contains("malformed"))
    val e2 = intercept[RuntimeException](
      Bm25.searchIndexed(spark, idx, queries))
    assert(e2.getMessage.contains("refreshIndexStats"),
      "the diagnostic must name the repair")
    Bm25.refreshIndexStats(spark, idx)
    assert(TxTable.commitMeta(spark, idx,
      TxTable.versions(spark, idx).last)("graft.bm25.stats") === good)
  }

  test("refreshIndexStats is idempotent") {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    val before = TxTable.commitMeta(spark, idx,
      TxTable.versions(spark, idx).last)("graft.bm25.stats")
    Bm25.refreshIndexStats(spark, idx)
    Bm25.refreshIndexStats(spark, idx)
    assert(TxTable.commitMeta(spark, idx,
      TxTable.versions(spark, idx).last)("graft.bm25.stats") === before)
  }

  test("OPTIMIZE compaction preserves serve output and carried stats") {
    val idx = tmp()
    val aaa = (2L to 200L by 2).map(i => BmDoc(i, s"aaa$i common"))
    val zzz = (1L to 199L by 2).map(i => BmDoc(i, s"zzz$i common"))
    Bm25.buildIndex(df(aaa), "doc_id", "text", idx)
    Bm25.appendToIndex(spark, idx, df(zzz), "doc_id", "text")
    val qs = Seq(("q", "aaa2 common"), ("r", "zzz3"))
    val before = Bm25.searchIndexed(spark, idx, qs, topK = 10)
      .collect().map(_.toSeq).toSet
    val filesBefore = TxTable.read(spark, idx).inputFiles.length
    TxTable.compact(spark, idx)
    assert(TxTable.read(spark, idx).inputFiles.length <= filesBefore)
    assert(Bm25.searchIndexed(spark, idx, qs, topK = 10)
      .collect().map(_.toSeq).toSet === before,
      "compaction must not change serve output")
  }

  test("phrase search: in-order adjacency, overlaps, single tokens, misses") {
    val idx = tmp()
    Bm25.buildIndex(df(Seq(
      BmDoc(1L, "a b a b a"),   // "a b" twice; "b a" twice; "a a" never
      BmDoc(2L, "a a a"),       // "a a" twice (overlapping)
      BmDoc(3L, "b a b"),       // "a b" once, "b a" once
      BmDoc(4L, "c c c c"))), "doc_id", "text", idx)
    def occ(phrase: String) = Bm25.phraseSearchIndexed(spark, idx,
        Seq(("q", phrase)), topK = 10)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(occ("a b") === Map(1L -> 2L, 3L -> 1L),
      "order matters: only docs with 'a' IMMEDIATELY before 'b'")
    assert(occ("b a") === Map(1L -> 2L, 3L -> 1L))
    assert(occ("a a") === Map(2L -> 2L), "overlapping occurrences count")
    assert(occ("a") === Map(1L -> 3L, 2L -> 3L, 3L -> 1L),
      "single-token phrase degrades to tf")
    assert(occ("a b a b a") === Map(1L -> 1L), "whole-doc phrase")
    assert(occ("b b") === Map.empty, "no match -> no rows, never zeros")
    // ranking: occurrence count desc, then id
    val ranked = Bm25.phraseSearchIndexed(spark, idx, Seq(("q", "a")),
      topK = 2).collect().map(_.getLong(2)).toSeq
    assert(ranked === Seq(1L, 2L), "tie at tf=3 breaks on id")
    // phrase serve reads only its tokens' posting files (bloom/range
    // pruned), same as searchIndexed
    val all = TxTable.read(spark, idx).inputFiles.length
    Bm25.appendToIndex(spark, idx,
      df((100L to 160L).map(i => BmDoc(i, s"zz$i yy$i"))), "doc_id", "text")
    val hit = Bm25.phraseSearchIndexed(spark, idx,
      Seq(("q", "zz100 yy100"))).collect()
    assert(hit.head.getLong(2) === 100L && hit.head.getLong(3) === 1L)
    assert(all >= 1) // structure exercised; pruning proven in the serve test
  }

  test("phrase search on a pre-positional index fails loudly") {
    val idx = tmp()
    val s = spark
    import s.implicits._
    // a legacy index: correct meta, postings WITHOUT the positions col
    TxTable.overwrite(spark, idx,
      Seq(("x", 1L, 1L, 2L)).toDF("token", "doc_id", "tf", "doc_len"),
      meta = Map("graft.bm25.stats" -> "1:2",
        "graft.bm25.idcol" -> "doc_id", "graft.bm25.seq" -> "1"))
    val e = intercept[IllegalArgumentException](
      Bm25.phraseSearchIndexed(spark, idx, Seq(("q", "x y"))))
    assert(e.getMessage.contains("positional"))
    // and plain BM25 serve still works on the legacy index
    assert(Bm25.searchIndexed(spark, idx, Seq(("q", "x"))).count() === 1L)
  }

  test("a non-index TxTable is refused loudly") {
    val idx = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, idx, Seq((1L, "x")).toDF("doc_id", "text"))
    val e = intercept[RuntimeException](
      Bm25.searchIndexed(spark, idx, Seq(("q", "x"))))
    assert(e.getMessage.contains("not a BM25 index"))
  }
}
