package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-distribution divergence between two corpora — the drift /
  * mixture monitor of a training-data pipeline ("did this month's crawl
  * shift?", "does the sampled mix still look like the recipe?"). No
  * reference counterpart (SURVEY.md §2.8 extension surface).
  *
  * Distributions are add-one-smoothed unigram frequencies over a
  * BOUNDED shared vocabulary: the `topK` tokens of the union corpus by
  * count (ties broken by token), everything else pooled into an
  * `<oov>` bucket. Bounding the vocabulary is what makes the operator
  * scale-safe AND deterministic: the per-corpus counting is one
  * groupBy each (the full 100 TB path), but the divergence fold runs
  * over a SINGLE collected row of `topK + 1` entries in sorted token
  * order — so every floating-point addition happens in one defined
  * sequence, reproducible across runs, partitionings, and engines.
  *
  * Measures: total variation `0.5·Σ|p−q|`, Hellinger
  * `sqrt(0.5·Σ(√p−√q)²)`, and symmetric chi-square `Σ(p−q)²/(p+q)` —
  * chosen BECAUSE they are transcendental-free (divide/subtract/sqrt
  * are IEEE-exact or correctly rounded in every engine), so the DuckDB
  * oracle matches bit-for-bit. KL/JS need `ln`, whose last-ulp varies
  * by libm — use [[klDivergence]] for monitoring, but it is not
  * hash-oracled.
  */
object CorpusDivergence {

  /** One row:
    * (vocab_size, n_tokens_p, n_tokens_q, tv, hellinger, chi2).
    */
  /** The shared add-one-smoothing frame over a [[vocabArray]] row —
    * ONE definition of the totals projection and the smoothed p/q
    * estimators, so the hash-oracled measures ([[divergence]]) and the
    * KL monitor ([[klDivergence]]) can never fork their smoothing.
    */
  private def smoothedTotals(arr: DataFrame)
      : (DataFrame, Column => Column, Column => Column) = {
    val withTotals = arr.select(
      col("arr"),
      size(col("arr")).cast("long").as("vocab_size"),
      aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("cp"))
        .as("n_tokens_p"),
      aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("cq"))
        .as("n_tokens_q"))
    def pOf(s: Column) = (s.getField("cp") + lit(1L)).cast("double") /
      (col("n_tokens_p") + col("vocab_size")).cast("double")
    def qOf(s: Column) = (s.getField("cq") + lit(1L)).cast("double") /
      (col("n_tokens_q") + col("vocab_size")).cast("double")
    (withTotals, pOf, qOf)
  }

  def divergence(p: DataFrame, q: DataFrame, textCol: String,
                 topK: Int): DataFrame = {
    val (withTotals, pOf, qOf) =
      smoothedTotals(vocabArray(p, q, textCol, topK))
    withTotals.select(
      col("vocab_size"), col("n_tokens_p"), col("n_tokens_q"),
      (aggregate(col("arr"), lit(0.0),
        (a, s) => a + abs(pOf(s) - qOf(s))) * 0.5).as("tv"),
      sqrt(aggregate(col("arr"), lit(0.0), (a, s) => {
        val d = sqrt(pOf(s)) - sqrt(qOf(s)); a + d * d
      }) * 0.5).as("hellinger"),
      aggregate(col("arr"), lit(0.0), (a, s) => {
        val d = pOf(s) - qOf(s); a + d * d / (pOf(s) + qOf(s))
      }).as("chi2"))
  }

  /** KL(P‖Q) and KL(Q‖P) under the same smoothing/vocab — for
    * monitoring; deterministic within one JVM, but `ln`'s final ulp is
    * libm-specific, so this is not part of the hash-oracled surface.
    */
  def klDivergence(p: DataFrame, q: DataFrame, textCol: String,
                   topK: Int): DataFrame = {
    val (withTotals, pOf, qOf) =
      smoothedTotals(vocabArray(p, q, textCol, topK))
    withTotals.select(
      col("vocab_size"), col("n_tokens_p"), col("n_tokens_q"),
      aggregate(col("arr"), lit(0.0),
        (a, s) => a + pOf(s) * log(pOf(s) / qOf(s))).as("kl_pq"),
      aggregate(col("arr"), lit(0.0),
        (a, s) => a + qOf(s) * log(qOf(s) / pOf(s))).as("kl_qp"))
  }

  /** The shared bounded vocabulary as ONE sorted array row
    * `arr: array<struct<token, cp, cq>>` — `topK` union-corpus tokens
    * by (count desc, token asc) plus the `<oov>` pool. Cost: one
    * narrow tokenize+explode and one groupBy per corpus, one top-K,
    * one collect of `topK + 1` rows.
    */
  private def vocabArray(p: DataFrame, q: DataFrame, textCol: String,
                         topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    def counts(df: DataFrame): DataFrame = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val cp = counts(p)
    val cq = counts(q)
    val union = cp.withColumnRenamed("c", "ca")
      .join(cq.withColumnRenamed("c", "cb"), Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L)))
          .as("ct"),
        coalesce(col("ca"), lit(0L)).as("cp"),
        coalesce(col("cb"), lit(0L)).as("cq"))
    val vocab = graft.ops.Windows.globalTopK(union,
      Seq(col("ct").desc, col("token").asc), topK)
    // everything outside the vocab pools into <oov>; the bucket exists
    // even when empty so V is fixed at topK + 1 given >= topK tokens
    val oov = union.join(vocab.select("token"), Seq("token"), "left_anti")
      .agg(coalesce(sum(col("cp")), lit(0L)).as("cp"),
        coalesce(sum(col("cq")), lit(0L)).as("cq"))
      .select(lit("<oov>").as("token"), col("cp"), col("cq"))
    vocab.select("token", "cp", "cq").unionByName(oov)
      .agg(array_sort(collect_list(struct(col("token"), col("cp"),
        col("cq")))).as("arr"))
  }

  /** Pairwise VOCABULARY Jaccard between every two groups in one frame
    * — the corpus-similarity matrix ("how lexically close are these
    * sources/languages?") that complements [[divergence]]'s
    * distribution distance for a single pair: one call covers all
    * n·(n−1)/2 pairs instead of n² calls.
    *
    * Scale shape: one distinct (group, token) pass (partial-aggregable
    * distinct); the pair stage is a token equi-join whose per-key
    * fan-out is bounded by the GROUP count (each token appears at most
    * once per group after the distinct), never by corpus size; sizes
    * broadcast back. Jaccard = |∩| / (|A| + |B| − |∩|) from exact
    * longs — one IEEE division, bit-stable anywhere.
    */
  def vocabOverlap(df: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("__g"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .distinct()
    val sizes = v.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val inter = v.alias("a").join(v.alias("b"),
        col("a.__tok") === col("b.__tok") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("g_a"), col("b.__g").as("g_b"))
      .agg(count(lit(1)).as("n_inter"))
    // every a < b group pair exists in the output, even with an EMPTY
    // vocabulary intersection (jaccard 0.0): the pair stage is an
    // inner join, so disjoint-vocab pairs (e.g. different scripts)
    // produce no row there — a left join from the all-pairs frame
    // restores them. `sizes` has one row per GROUP, so the pair frame
    // is groups² rows (driver-trivial); the non-equi `<` condition
    // runs as a broadcast nested-loop over that constant-size frame.
    val allPairs = sizes
      .select(col("__g").as("g_a"), col("__n").as("__na"))
      .join(broadcast(sizes.select(col("__g").as("g_b"),
        col("__n").as("__nb"))), col("g_a") < col("g_b"))
    val n = coalesce(col("n_inter"), lit(0L))
    allPairs.join(inter, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"), n.as("n_inter"),
        (n.cast("double") /
          (col("__na") + col("__nb") - n).cast("double")).as("jaccard"))
  }
}
