package graft

import graft.dedup.{ChunkDedup, SpanDedup}

case class SpanDoc(doc_id: Long, text: String)

class SpanDedupSpec extends SparkSpec {

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // a 10-token phrase shared across docs at DIFFERENT offsets
  private val phrase = toks("P", 10)

  private def run(docs: Seq[SpanDoc], k: Int = 8) =
    SpanDedup.stripDuplicatedSpans(df(docs), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap

  test("shifted repeat is stripped from the later doc only; first survives") {
    val d1 = SpanDoc(1L, s"${toks("a", 5)} $phrase ${toks("b", 5)}")  // P at 5..14
    val d2 = SpanDoc(2L, s"${toks("c", 8)} $phrase ${toks("d", 2)}")  // P at 8..17
    val out = run(Seq(d1, d2))
    assert(out(1L) === ((20, 0, 0, d1.text)))
    val (n2, dup2, sp2, t2) = out(2L)
    assert((n2, dup2, sp2) === ((20, 10, 1)))
    assert(t2 === s"${toks("c", 8)} ${toks("d", 2)}")
  }

  test("within-document repeat: both occurrences duplicated vs an earlier doc; gap splits spans") {
    val d1 = SpanDoc(1L, s"${toks("a", 5)} $phrase ${toks("b", 5)}")
    val d3 = SpanDoc(3L, s"$phrase ${toks("x", 4)} $phrase")  // P at 0..9 and 14..23
    val out = run(Seq(d1, d3))
    val (n3, dup3, sp3, t3) = out(3L)
    assert((n3, dup3, sp3) === ((24, 20, 2)))
    assert(t3 === toks("x", 4))
  }

  test("doc shorter than the window survives whole; empty doc is empty") {
    val out = run(Seq(
      SpanDoc(1L, s"$phrase $phrase"),   // within-doc repeat, long enough
      SpanDoc(2L, "only five tokens in here"),
      SpanDoc(3L, "")))
    assert(out(2L) === ((5, 0, 0, "only five tokens in here")))
    assert(out(3L) === ((0, 0, 0, "")))
  }

  test("a doc that IS a duplicated window is stripped to empty") {
    val d1 = SpanDoc(1L, s"${toks("a", 5)} $phrase")
    val d2 = SpanDoc(2L, toks("P", 8))  // exactly the first 8 tokens of P
    val out = run(Seq(d1, d2))
    assert(out(2L) === ((8, 8, 1, "")))
  }

  test("catches the alignment-shifted repeat ChunkDedup's fixed grid misses") {
    // d2's copy of P starts at position 3 — off the chunk grid, so no
    // 8-token CHUNK of d2 equals any chunk of d1, but the sliding
    // window sees it
    val d1 = SpanDoc(1L, s"$phrase ${toks("b", 6)}")           // P at 0..9
    val d2 = SpanDoc(2L, s"${toks("c", 3)} $phrase ${toks("d", 3)}")  // P at 3..12
    val chunk = ChunkDedup.dedupChunks(df(Seq(d1, d2)), "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(chunk(2L) === 2)  // both of d2's chunks kept: grid-blind
    val out = run(Seq(d1, d2))
    val (_, dup2, sp2, t2) = out(2L)
    assert((dup2, sp2) === ((10, 1)))
    assert(t2 === s"${toks("c", 3)} ${toks("d", 3)}")
  }

  test("output is whitespace-normalized and one row per input row") {
    val d1 = SpanDoc(1L, "  spaced\tout   tokens\nhere  ")
    val out = run(Seq(d1))
    assert(out(1L) === ((4, 0, 0, "spaced out tokens here")))
  }
}
