package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Trained BPE: the pair-merge trainer against known merge sequences,
  * the min-rank encoder against hand-computed tokenizations, and the
  * Column path (native BpeWordEncode under the pre-tokenizer HOF).
  */
class TextBpeSpec extends SparkSpec {

  // the Hugging Face BPE tutorial corpus — a public known-answer
  // sequence: ug (freq 20), then un (16), then hug (15)
  private val hfCorpus = Seq(
    ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  test("trainFromWordCounts learns the known HF-example merge sequence") {
    val merges = Bpe.trainFromWordCounts(hfCorpus, numMerges = 3)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("training stops when no pairs remain; ties break lexicographically") {
    // every word fully merged after 2 rounds → trainer stops early
    assert(Bpe.trainFromWordCounts(Seq(("ab", 2L)), numMerges = 10) ===
      Seq(("a", "b")))
    // (a,b) and (c,d) tie at 2 → lexicographically smaller pair first
    val tied = Bpe.trainFromWordCounts(Seq(("ab", 2L), ("cd", 2L)), 1)
    assert(tied === Seq(("a", "b")))
  }

  test("encoder applies merges by rank and merges greedily left-to-right") {
    val merges = Bpe.trainFromWordCounts(hfCorpus, numMerges = 3)
    val coder = new graft.functions.BpeCoder(
      merges.map(p => Array(p._1, p._2)).toArray)
    assert(coder.encode("hugs").toSeq === Seq("hug", "s"))
    assert(coder.encode("bug").toSeq === Seq("b", "ug"))
    assert(coder.encode("pun").toSeq === Seq("p", "un"))
    assert(coder.encode("mug").toSeq === Seq("m", "ug"))
    // no applicable merges → single characters
    assert(coder.encode("xyz").toSeq === Seq("x", "y", "z"))
    assert(coder.encode("").toSeq === Seq.empty)
    // overlapping run: (u,g) merges left-to-right, non-overlapping
    val aa = new graft.functions.BpeCoder(Array(Array("a", "a")))
    assert(aa.encode("aaa").toSeq === Seq("aa", "a"))
  }

  test("encoding round-trips: concatenated tokens equal the input word") {
    val merges = Bpe.trainFromWordCounts(hfCorpus, numMerges = 3)
    val coder = new graft.functions.BpeCoder(
      merges.map(p => Array(p._1, p._2)).toArray)
    Seq("hugs", "pugpun", "a", "zzz", "hug hug").foreach { w =>
      assert(coder.encode(w).mkString === w, s"round-trip of '$w'")
    }
  }

  test("Column path: Bpe.encode/tokenCount across pre-token boundaries") {
    val s = spark
    import s.implicits._
    val merges = Bpe.trainFromWordCounts(hfCorpus, numMerges = 3)
    val df = Seq((1L, "hugs pun"), (2L, ""), (3L, "bug"))
      .toDF("id", "text")
      .select(col("id"),
        Bpe.encode(col("text"), merges).as("toks"),
        Bpe.tokenCount(col("text"), merges).as("n"))
      .orderBy("id").collect()
    // pre-tokens "hugs" and " pun": the leading space rides with pun
    // (GPT-2 shape) and blocks the (u,n) merge only if unmerged space
    // intervenes — here " pun" encodes as [" ", "p", "un"]... the space
    // is its own symbol, p-u-n still merges u+n
    assert(df(0).getSeq[String](1) === Seq("hug", "s", " ", "p", "un"))
    assert(df(0).getInt(2) === 5)
    assert(df(1).getSeq[String](1) === Seq.empty && df(1).getInt(2) === 0)
    assert(df(2).getSeq[String](1) === Seq("b", "ug") && df(2).getInt(2) === 2)
  }

  test("train end-to-end over a DataFrame corpus (histogram + driver loop)") {
    val s = spark
    import s.implicits._
    // corpus engineered so the histogram is the HF example (word counts
    // realized as repeated rows)
    val rows = hfCorpus.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w) }.zipWithIndex.map(_.swap)
    val df = rows.toDF("id", "text")
    val merges = Bpe.train(df, "text", numMerges = 3, maxWords = 100)
    assert(merges === Seq(("u", "g"), ("u", "n"), ("h", "ug")))
    // bounded collect: maxWords=1 keeps only the most frequent word
    // ("pun", 12) → its pairs dominate training
    val top1 = Bpe.train(df, "text", numMerges = 2, maxWords = 1)
    assert(top1 === Seq(("p", "u"), ("pu", "n")))
  }

  test("mergesDF is the persistable (rank, left, right, merged) artifact") {
    val df = Bpe.mergesDF(spark, Seq(("a", "b"), ("ab", "c")))
    assert(df.columns.toSeq === Seq("rank", "left", "right", "merged"))
    assert(df.orderBy("rank").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
      === Seq((0L, "a", "b", "ab"), (1L, "ab", "c", "abc")))
  }

  test("persisted tokenizer lifecycle: TxTable round-trip encodes identically") {
    val s = spark
    import s.implicits._
    val merges = Bpe.trainFromWordCounts(hfCorpus, numMerges = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe")
      .toString + "/merges"
    graft.ops.TxTable.overwrite(spark, path, Bpe.mergesDF(spark, merges))
    val loaded = Bpe.mergesFromDF(graft.ops.TxTable.read(spark, path))
    assert(loaded === merges, "rank order survives the store/load")
    val docs = Seq("hug the pun", "bun hugs").toDF("text")
    val direct = docs.select(Bpe.encode(col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0))
    val served = docs.select(Bpe.encode(col("text"), loaded).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(served.toSeq === direct.toSeq)
  }

  test("extendMerges continuation is bit-identical to from-scratch training") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the merge table learns the common pairs first",
      "the pairs the corpus repeats the most merge earliest",
      "training continues exactly where the last round stopped",
      "hug hug hug pun pun bun hugs the pug").toDF("text")
    val path = java.nio.file.Files.createTempDirectory("graft_bpex")
      .toString + "/merges"
    // train 8, then 12 more as a continuation commit
    Bpe.trainToTable(docs, "text", numMerges = 8, path)
    assert(Bpe.loadMerges(spark, path).size === 8)
    Bpe.extendMerges(spark, path, docs, "text", extraMerges = 12)
    val continued = Bpe.loadMerges(spark, path)
    val scratch = Bpe.train(docs, "text", numMerges = 20)
    assert(continued === scratch,
      "8-then-12 must replay exactly the 20-merge training sequence")
    // the appended rows carry contiguous ranks
    val ranks = graft.ops.TxTable.read(spark, path)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(ranks === (0L until continued.size.toLong))
    // tokenization under the extended table equals the scratch vocab
    val enc = docs.select(Bpe.tokenCount(col("text"), continued).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val encScratch = docs.select(Bpe.tokenCount(col("text"), scratch).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(enc === encScratch)
  }

  test("racing extenders from the same snapshot: second commit aborts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the merge table learns the common pairs first",
      "the pairs the corpus repeats the most merge earliest",
      "hug hug hug pun pun bun hugs the pug").toDF("text")
    val path = java.nio.file.Files.createTempDirectory("graft_bper")
      .toString + "/merges"
    Bpe.trainToTable(docs, "text", numMerges = 8, path)
    // both extenders read the SAME 8-merge vocabulary, with DIFFERENT
    // extraMerges — the case a final-count guard waves through (A
    // lands count=13; B's target 20 > 13 would pass a >=-target
    // check). The snapshot+1 guard aborts B: the count advanced past
    // the state B trained from, so B's ranks 8..19 would overlap A's
    // 8..12 and fork the vocabulary.
    val snapshot = Bpe.loadMerges(spark, path)
    Bpe.extendFromSnapshot(spark, path, snapshot, docs, "text",
      extraMerges = 5)
    assert(Bpe.loadMerges(spark, path).size === 13)
    intercept[java.util.ConcurrentModificationException] {
      Bpe.extendFromSnapshot(spark, path, snapshot, docs, "text",
        extraMerges = 12)
    }
    // the survivor's table is intact: contiguous ranks, no duplicates
    val ranks = graft.ops.TxTable.read(spark, path)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(ranks === (0L until 13L))
    // and a retry that RE-READS the head (what extendMerges does)
    // succeeds, landing the same final vocabulary as 8+5+12 sequential
    Bpe.extendMerges(spark, path, docs, "text", extraMerges = 12)
    assert(Bpe.loadMerges(spark, path) ===
      Bpe.train(docs, "text", numMerges = 25))
  }

  test("extendMerges on an exhausted vocabulary is a committed no-op") {
    val s = spark
    import s.implicits._
    // one 2-char pre-token (no leading-space twin — the GPT-2
    // pre-tokenizer makes " ab" a SEPARATE word in "ab ab"): one merge
    // exhausts every pair
    val docs = Seq("ab").toDF("text")
    val path = java.nio.file.Files.createTempDirectory("graft_bpen")
      .toString + "/merges"
    Bpe.trainToTable(docs, "text", numMerges = 10, path)
    val before = graft.ops.TxTable.versions(spark, path).last
    val v = Bpe.extendMerges(spark, path, docs, "text", extraMerges = 5)
    assert(v === before, "nothing learnable → no new commit")
    assert(Bpe.loadMerges(spark, path) === Seq(("a", "b")))
  }
}
