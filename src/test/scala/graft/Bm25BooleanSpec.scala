package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.text.Bm25
import graft.text.Bm25.BooleanQuery

case class BoolDoc(doc_id: Long, text: String)

/** Boolean (MUST/SHOULD/MUST_NOT) and unordered-proximity (NEAR/w)
  * retrieval from the persisted positional index: gate semantics,
  * should-boost-without-gating, equivalence to plain BM25 when the
  * boolean degenerates, window counting, and token-set dedup.
  */
class Bm25BooleanSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_bool").toString + "/idx"

  private val corpus = Seq(
    BoolDoc(1L, "alpha beta gamma"),
    BoolDoc(2L, "alpha delta"),
    BoolDoc(3L, "beta beta alpha"),
    BoolDoc(4L, "gamma delta epsilon"),
    BoolDoc(5L, "zeta"))

  private def built(): String = {
    val idx = tmp()
    Bm25.buildIndex(df(corpus), "doc_id", "text", idx)
    idx
  }

  test("must gates: only docs containing EVERY must token rank") {
    val idx = built()
    val out = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha beta")))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L))
  }

  test("mustNot excludes regardless of score") {
    val idx = built()
    val out = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha", mustNot = "delta")))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 3L)) // doc 2 has alpha but also delta
  }

  test("should boosts but does not gate; the boosted doc outranks") {
    val idx = built()
    val plain = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha")))
    val boosted = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha", should = "gamma")))
    // same candidate set (should never gates)
    assert(plain.select("doc_id").collect().map(_.getLong(0)).toSet ===
      boosted.select("doc_id").collect().map(_.getLong(0)).toSet)
    // doc 1 (has gamma) strictly gains score; docs without gamma don't
    def score(dfr: org.apache.spark.sql.DataFrame, id: Long): Double =
      dfr.filter(col("doc_id") === id).select("score").head().getDouble(0)
    assert(score(boosted, 1L) > score(plain, 1L))
    assert(score(boosted, 2L) === score(plain, 2L))
  }

  test("a pure-should query requires at least one match") {
    val idx = built()
    val out = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "", should = "gamma epsilon")))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 4L))
  }

  test("must-only boolean ≡ searchIndexed when every match satisfies the gate") {
    val idx = built()
    // single-token must: the gate (contains the token) equals BM25's
    // match condition, so the boolean result IS the plain search
    val bool = Bm25.booleanSearchIndexed(spark, idx,
        Seq(BooleanQuery("q", must = "alpha")))
      .collect().map(_.toSeq).toSet
    val plain = Bm25.searchIndexed(spark, idx, Seq(("q", "alpha")))
      .collect().map(_.toSeq).toSet
    assert(bool === plain)
  }

  test("a token in both must and should scores once (must wins)") {
    val idx = built()
    val dup = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha", should = "alpha")))
    val plain = Bm25.booleanSearchIndexed(spark, idx,
      Seq(BooleanQuery("q", must = "alpha")))
    assert(dup.collect().map(_.toSeq).toSet ===
      plain.collect().map(_.toSeq).toSet)
  }

  test("NEAR: adjacency matches, far tokens don't, window bound is exact") {
    val idx = tmp()
    Bm25.buildIndex(df(Seq(
      BoolDoc(1L, "a b"),
      BoolDoc(2L, "a x x b"),
      BoolDoc(3L, "a x x x x x x b"),
      BoolDoc(4L, "b a"))), "doc_id", "text", idx)
    // window 3: positions within 2 of each other
    val w3 = Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "a b")),
      window = 3)
    val got = w3.select("doc_id", "n_windows").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1: a@0 b@1 → start 0 (clamped) matches once... starts {0}∩{0,1}
    assert(got(1L) === 1L)
    assert(got(4L) === 1L) // unordered: "b a" matches too
    assert(!got.contains(2L)) // distance 3 > window 3
    assert(!got.contains(3L))
    // window 4 admits doc 2 (distance 3 fits in a 4-token window)
    val w4 = Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "a b")),
      window = 4)
    val got4 = w4.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got4 === Set(1L, 2L, 4L))
  }

  test("NEAR counts window starts exactly and ranks by them") {
    val idx = tmp()
    Bm25.buildIndex(df(Seq(
      BoolDoc(1L, "a b a b"),
      BoolDoc(2L, "a b x x x x x x x x a b"))), "doc_id", "text", idx)
    val out = Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "a b")),
      window = 2)
    val got = out.select("doc_id", "n_windows", "rank").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // doc1 "a b a b": starts 0 (a0,b1), 1 (b1,a2), 2 (a2,b3) → 3
    assert(got(1L)._1 === 3L)
    // doc2: starts 0 and 10 → 2
    assert(got(2L)._1 === 2L)
    assert(got(1L)._2 === 1 && got(2L)._2 === 2)
  }

  test("NEAR deduplicates query tokens (token-set semantics)") {
    val idx = tmp()
    Bm25.buildIndex(df(Seq(BoolDoc(1L, "a b"))), "doc_id", "text", idx)
    val dup = Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "a a b")),
      window = 3).collect().map(_.toSeq).toSet
    val set = Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "a b")),
      window = 3).collect().map(_.toSeq).toSet
    assert(dup === set)
  }

  test("guards: window bounds, empty queries, missing positions") {
    val idx = built()
    intercept[IllegalArgumentException] {
      Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "alpha")),
        window = 0)
    }
    intercept[IllegalArgumentException] {
      Bm25.proximitySearchIndexed(spark, idx, Seq(("q", "alpha")),
        window = 65)
    }
    intercept[IllegalArgumentException] {
      Bm25.booleanSearchIndexed(spark, idx, Seq.empty)
    }
    // a query tokenizing to no scoring terms is refused
    intercept[IllegalArgumentException] {
      Bm25.booleanSearchIndexed(spark, idx,
        Seq(BooleanQuery("q", must = "", should = "", mustNot = "alpha")))
    }
  }
}
