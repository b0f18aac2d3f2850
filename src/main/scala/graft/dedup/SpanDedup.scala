package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level exact deduplication at ARBITRARY alignment: find every
  * `windowTokens`-token substring that occurs more than once in the
  * corpus and strip all occurrences but the corpus-wide first
  * (north-star extension — no counterpart in the reference,
  * SURVEY.md §2.8).
  *
  * This is the substring-dedup pass of Lee et al., "Deduplicating
  * Training Data Makes Language Models Better" (ACL 2022), re-expressed
  * for a distributed engine: their suffix array finds duplicated spans
  * of >= k tokens at any offset; a sliding k-token fingerprint window
  * finds exactly the same spans (a duplicated span of length m >= k is
  * covered by its m-k+1 duplicated windows, and maximal spans are
  * recovered by merging overlapping windows), while staying a pure
  * shuffle-on-digest plan instead of a global suffix sort.
  *
  * Difference from [[ChunkDedup]]: chunk dedup only sees repeats that
  * land on the same fixed chunk grid (position 0, c, 2c, ...); a copied
  * paragraph shifted by one token is invisible to it. The sliding
  * window here catches repeats at every alignment — the property that
  * makes the pass effective against quote/boilerplate reuse inside
  * otherwise-unique pages.
  *
  * Scale shape (100 TB-safe):
  *  - windows materialize one row per token position (n-k+1 per doc) —
  *    data-proportional, never quadratic;
  *  - first-occurrence election is ONE shuffle keyed by the window's
  *    md5 fingerprint (bounded key width; per-group state is one row),
  *    exactly the [[ChunkDedup]] election shape;
  *  - coverage/merge/reassembly shuffle on the document id only.
  *  No stage collects to the driver; no all-pairs join exists. A hot
  *  window (site-wide boilerplate repeated millions of times) fans out
  *  only its OWN occurrence list — the same bounded skew profile as the
  *  inverted-index dedups, and AQE's skew split applies to the digest
  *  shuffle if one digest dominates.
  *
  * Contract: tokens are whitespace tokens ([[graft.text.TextAnalysis
  * .tokens]]); occurrences are ordered by (`idCol`, position) and the
  * first is kept; a token is duplicated iff ANY duplicated window
  * covers it; `text_stripped` is the surviving tokens rejoined with
  * single spaces (whitespace-normalized, as in [[ChunkDedup]]). Output
  * is one row per input row:
  * (idCol, n_tokens, n_dup_tokens, n_spans, text_stripped) where
  * `n_spans` counts MAXIMAL duplicated spans (merged coverage islands).
  * Documents shorter than `windowTokens` have no windows and survive
  * whole.
  */
object SpanDedup {

  def stripDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                           windowTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val k = windowTokens
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val base = df.select(col(idCol), toks.as("__toks"),
      size(toks).cast("int").as("n_tokens"))

    // one k-token window per start position 0..n-k (none when n < k)
    val wins = base.select(col(idCol),
      when(col("n_tokens") < k, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), col("n_tokens") - k),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k)))))
        .as("__wins"))
    val occ = wins
      .select(col(idCol), posexplode(col("__wins")).as(Seq("__pos", "__w")))
      .select(col(idCol), col("__pos"), md5(col("__w")).as("__fp"))

    // corpus-wide first occurrence per fingerprint wins; every later
    // occurrence (including repeats WITHIN a document) is a duplicate
    val firstWins = Window.partitionBy("__fp")
      .orderBy(col(idCol).asc, col("__pos").asc)
    val dupStarts = occ
      .withColumn("__rn", row_number().over(firstWins))
      .filter(col("__rn") > 1)
      .select(col(idCol), col("__pos"))

    // token positions covered by any duplicated window (distinct:
    // overlapping windows cover shared positions)
    val covered = dupStarts
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__tp"))
      .distinct()

    // maximal spans = islands of consecutive covered positions
    val byDoc = Window.partitionBy(idCol).orderBy(col("__tp").asc)
    val spanStats = covered
      .withColumn("__brk",
        when(col("__tp") - lag(col("__tp"), 1).over(byDoc) === 1, 0)
          .otherwise(1))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("int").as("n_dup_tokens"),
        sum(col("__brk")).cast("int").as("n_spans"))

    // reassembly: surviving tokens in position order (ChunkDedup shape)
    val tokPos = base
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__tp", "__tok")))
    val kept = tokPos
      .join(covered, Seq(idCol, "__tp"), "left_anti")
      .groupBy(idCol)
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__tp"), col("__tok")))),
        s => s.getField("__tok"))).as("text_stripped"))

    base.select(col(idCol), col("n_tokens"))
      .join(spanStats, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0)).as("n_dup_tokens"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("text_stripped"), lit("")).as("text_stripped"))
  }
}
