package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained byte-pair encoding: learn a merge table from the corpus,
  * tokenize under it — the real version of what [[TextAnalysis.tokensBpe]]
  * approximates with the pre-tokenizer alone. Token counts drive budget
  * decisions (how many training tokens does this corpus hold? which
  * documents fit the mixture?), and a pre-tokenizer count can be off
  * by 2-3× from what a trained vocab reports, so the trained path is
  * what a 100 TB pipeline actually wants.
  *
  * Algorithm (Sennrich et al. 2016, GPT-2 shape: merges operate WITHIN
  * pre-tokens, no end-of-word marker; the pre-token boundary — spaces
  * ride with the following word — is the merge boundary):
  *
  *  1. **Histogram** (distributed): one `explode` + `groupBy` over the
  *     pre-tokens of the corpus — the only full-data pass, one shuffle.
  *  2. **Bounded collect**: the top `maxWords` words by frequency
  *     (deterministic tie-break on the word). Word frequency is
  *     Zipfian, so a bounded head covers ~all corpus mass; the collect
  *     is `maxWords` rows regardless of corpus size — the same
  *     deliberate bounded-collect pattern as `Prefix.scala`.
  *  3. **Driver-side pair-merge loop**: `numMerges` rounds of
  *     count-adjacent-pairs → merge the winner (highest count; ties
  *     break lexicographically so training is deterministic). O(vocab
  *     symbols) per round on the driver — microseconds against the
  *     corpus scan, and the alternative (one distributed groupBy PER
  *     merge round) costs `numMerges` job launches to compute the same
  *     bounded histogram's statistics.
  *  4. **Tokenize** (distributed): the merge ranks ship inside a native
  *     codegen'd expression ([[graft.functions.BpeWordEncode]]) applied
  *     per pre-token under a `transform` HOF — no UDF, no broadcast
  *     plumbing, narrow pass.
  */
object Bpe {

  /** Ordered merge table learned from `docs(textCol)` — element `i` is
    * the pair merged at rank `i` (earlier = higher priority).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 20000): Seq[(String, String)] =
    trainFromWordCounts(wordHistogram(docs, textCol, maxWords), numMerges)

  /** The distributed histogram + bounded top-`maxWords` collect both
    * training entry points share (from-scratch and continuation).
    */
  private def wordHistogram(docs: DataFrame, textCol: String,
                            maxWords: Int): Seq[(String, Long)] =
    docs
      .select(explode(TextAnalysis.tokensBpe(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords) // bounded: the ONLY driver-side materialization
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** The pair-merge loop over an explicit word histogram — exposed for
    * unit tests against known merge sequences.
    */
  def trainFromWordCounts(wordCounts: Seq[(String, Long)],
                          numMerges: Int): Seq[(String, String)] =
    // split on code points so surrogate pairs never split
    trainFromSymbols(wordCounts.map { case (w, c) =>
      (codePointSymbols(w), c)
    }.toArray, numMerges)

  private def codePointSymbols(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** The merge loop itself, over already-symbolized words — the entry
    * point continuation training ([[extendMerges]]) shares with
    * from-scratch training, so "train n₁ then n₂ more" replays the
    * EXACT same rounds as "train n₁+n₂" (pinned by spec).
    */
  private def trainFromSymbols(init: Array[(Array[String], Long)],
                               numMerges: Int): Seq[(String, String)] = {
    var words = init
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.merge(k, c, _ + _)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // deterministic winner: max count, then smallest pair in
        // UNSIGNED UTF-8 BYTE order — the order Spark SQL strings,
        // DuckDB's default collation, and therefore the replayed
        // oracle all sort by. Java's String '<' (UTF-16 code units)
        // disagrees above the BMP (surrogates sort below U+E000+),
        // which would fork trainer and oracle on emoji/CJK-ext ties.
        def u8(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var best: (String, String) = null
        var bestC = -1L
        pairCounts.forEach { (k, v) =>
          if (v > bestC || (v == bestC && {
              val c1 = u8(k._1, best._1)
              c1 < 0 || (c1 == 0 && u8(k._2, best._2) < 0)
            })) { best = k; bestC = v }
        }
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) { out += merged; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Subword tokens of `text` under `merges`: pre-tokenize, BPE-merge
    * each pre-token, flatten. Every step is a codegen'd Column
    * expression — one narrow pass.
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val coder = new graft.functions.BpeCoder(
      merges.map(p => Array(p._1, p._2)).toArray)
    flatten(transform(TextAnalysis.tokensBpe(text), w =>
      org.apache.spark.sql.GraftShim.toColumn(
        graft.functions.BpeWordEncode(
          org.apache.spark.sql.GraftShim.toExpression(w), coder))))
  }

  /** Token count under a trained vocab — the budget-decision number. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  /** The merge table as a DataFrame `(rank, left, right, merged)` —
    * the persistable training artifact (write it as a TxTable, read it
    * back to tokenize consistently across jobs).
    */
  def mergesDF(spark: SparkSession,
               merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Read a persisted merge table back into encode order —
    * [[mergesDF]]'s inverse, completing the persisted-tokenizer
    * lifecycle (train once → store the merges as a TxTable → every
    * job tokenizes under the identical table). Bounded collect: the
    * table is numMerges rows by construction.
    */
  def mergesFromDF(merges: DataFrame): Seq[(String, String)] =
    merges.select("rank", "left", "right").orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  // ------------------------------------- persisted tokenizer lifecycle
  //
  // The train-once / tokenize-everywhere story at 100 TB: training
  // reads the corpus ONCE (one histogram shuffle + a bounded collect),
  // the merge table persists as a TxTable (numMerges rows — the
  // artifact is KB-sized however big the corpus), and every later job
  // tokenizes under the loaded table through the same codegen'd
  // expression — a narrow pass with a numMerges-row driver-side load,
  // no retraining, no histogram. Vocabulary growth is a CONTINUATION
  // commit (extendMerges), not a rebuild: BPE training is a greedy
  // sequential loop, so n2 more rounds from the n1-merge state replay
  // exactly what a from-scratch n1+n2 train would produce.

  /** Carried-meta key holding the merge count — the concurrency guard
    * for continuation commits (two racing extenders would otherwise
    * both append rank-n1 rows and fork the vocabulary).
    */
  private val CountMetaKey = "graft.bpe.merges"

  /** Persist `merges` as the TxTable at `path` (rank, left, right,
    * merged) — one overwrite commit carrying the merge count.
    */
  def writeMerges(spark: SparkSession, path: String,
                  merges: Seq[(String, String)]): Long =
    graft.ops.TxTable.overwrite(spark, path, mergesDF(spark, merges),
      meta = Map(CountMetaKey -> merges.size.toString))

  /** Train `numMerges` merges from `docs` and persist them at `path`
    * — the lifecycle's one corpus-reading step.
    */
  def trainToTable(docs: DataFrame, textCol: String, numMerges: Int,
                   path: String, maxWords: Int = 20000): Long =
    writeMerges(docs.sparkSession, path,
      train(docs, textCol, numMerges, maxWords))

  /** Load the persisted merge table into encode order — the serve-side
    * step every tokenizing job starts with. O(numMerges) driver rows.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    mergesFromDF(graft.ops.TxTable.read(spark, path))

  /** CONTINUE training: learn `extraMerges` more merges from `docs`
    * starting from the persisted vocabulary and append them (ranks
    * n1..n1+n2-1) in one guarded commit. Equivalent BY CONSTRUCTION to
    * having trained n1+n2 merges from scratch on the same corpus
    * (pinned by spec): the histogram words are re-symbolized under the
    * existing merges in rank order — the exact state the original
    * loop's round n1 left them in — and [[trainFromSymbols]] resumes
    * from there. The count guard aborts a racing extender (a fork of
    * the vocabulary would silently tokenize differently per job).
    */
  def extendMerges(spark: SparkSession, path: String, docs: DataFrame,
                   textCol: String, extraMerges: Int,
                   maxWords: Int = 20000): Long =
    extendFromSnapshot(spark, path, loadMerges(spark, path), docs,
      textCol, extraMerges, maxWords)

  /** [[extendMerges]] with the vocabulary snapshot already read — the
    * seam that makes the read-commit race DETERMINISTICALLY testable:
    * a spec hands two extenders the same snapshot and the second
    * commit must abort (the spec can't interleave inside a single
    * extendMerges call). Production callers use [[extendMerges]].
    */
  private[graft] def extendFromSnapshot(spark: SparkSession, path: String,
                                        existing: Seq[(String, String)],
                                        docs: DataFrame, textCol: String,
                                        extraMerges: Int,
                                        maxWords: Int = 20000): Long = {
    val words = wordHistogram(docs, textCol, maxWords)
    val resumed = words.map { case (w, c) =>
      (applyMergesGreedy(codePointSymbols(w), existing), c)
    }.toArray
    val more = trainFromSymbols(resumed, extraMerges)
    if (more.isEmpty)
      return graft.ops.TxTable.versions(spark, path).last
    import spark.implicits._
    val rows = more.zipWithIndex.map { case ((l, r), i) =>
      ((existing.size + i).toLong, l, r, l + r)
    }.toDF("rank", "left", "right", "merged")
    val total = existing.size + more.size
    // Guard on the state that was READ, not the target: the head
    // carries count == existing.size at snapshot time, so a guard of
    // existing.size + 1 aborts any extender once the count advanced
    // past the vocabulary it trained from. Guarding on `total` only
    // catches a racer with the SAME extraMerges — two extenders with
    // different extraMerges (+5 and +12 from the same 18-merge read)
    // would both pass and append overlapping ranks, silently forking
    // the vocabulary (the Bm25.appendToIndex SeqMetaKey pattern).
    graft.ops.TxTable.append(spark, path, rows,
      meta = Map(CountMetaKey -> total.toString),
      guard = Map(CountMetaKey -> (existing.size + 1).toLong))
  }

  /** Replay `merges` over a symbol sequence in rank order — each merge
    * as the trainer's single left-to-right non-overlapping pass, so a
    * word ends up in exactly the state training round n left it in.
    */
  private def applyMergesGreedy(init: Array[String],
                                merges: Seq[(String, String)]): Array[String] = {
    var syms = init
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val merged = l + r
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += merged; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }
}
