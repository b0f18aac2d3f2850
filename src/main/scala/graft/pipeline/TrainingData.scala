package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Sampling
import graft.text.TextAnalysis

/** The composed LLM-training-data pipeline — the flagship use-case the
  * extension operators exist for. One declarative DAG over a documents
  * table:
  *
  *   quality filter → exact dedup → (optional) near-dup cluster +
  *   canonical keep → per-source deterministic sampling → annotation
  *   (token counts, fingerprint, language id)
  *
  * Everything stays in the DataFrame API: the quality filter and
  * annotations fuse into the scans (narrow, codegen'd), exact dedup is
  * one fingerprint shuffle, near-dup is the bucketed MinHash path, and
  * sampling is a hash filter — so the whole pipeline is a handful of
  * shuffles regardless of corpus size, plus O(cluster-diameter) rounds
  * for the near-dup components.
  *
  * @param minQuality  drop documents scoring below this ([[TextAnalysis.qualityScore]])
  * @param nearDup     also collapse near-duplicate clusters (MinHash →
  *                    jaccard-verified pairs → connected components →
  *                    keep min-id per cluster)
  * @param sampleFraction GLOBAL deterministic keep fraction (id-hash)
  * @param sourceFractions optional per-source keep fractions; sources
  *                        not in the map fall back to `sampleFraction`
  * @param minhashHash hash for the MinHash near-dup stage — determinism
  *                    is the only requirement; the xxhash64 default is
  *                    fastest, [[TextAnalysis.md5Hash60]] makes the
  *                    stage reproducible in an external SQL oracle
  * @param sampleHash  salted id-hash for the sampling decision (same
  *                    trade-off)
  */
case class TrainingDataConfig(
    idCol: String = "doc_id",
    textCol: String = "text",
    sourceCol: String = "source",
    minQuality: Double = 0.0,
    nearDup: Boolean = true,
    minJaccard: Double = 0.8,
    sampleFraction: Double = 1.0,
    sourceFractions: Map[String, Double] = Map.empty,
    minhashHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      xxhash64(_),
    sampleHash: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column = xxhash64(_, _))

object TrainingData {

  def run(docs: DataFrame, cfg: TrainingDataConfig = TrainingDataConfig()): DataFrame = {
    val id = col(cfg.idCol)
    val text = col(cfg.textCol)

    val qualified = docs
      .filter(TextAnalysis.qualityScore(text) >= cfg.minQuality)

    val exact0 = Dedup.exactDedup(qualified, cfg.textCol, cfg.idCol)

    val canonical =
      if (!cfg.nearDup) exact0
      else {
        // The exact-dedup output feeds the MinHash signature pass, the
        // per-pair jaccard verify, AND the final canonical filter —
        // materialize it once or the quality+fingerprint+window subplan
        // re-executes for each reference.
        val exact = exact0.localCheckpoint()
        Dedup.keepCanonical(exact, cfg.idCol,
          Dedup.minhashDedupPairs(exact, cfg.idCol, cfg.textCol,
            minJ = cfg.minJaccard, hash = cfg.minhashHash))
      }

    val sampled =
      if (cfg.sourceFractions.nonEmpty)
        Sampling.stratifiedSample(canonical, cfg.sourceCol, cfg.idCol,
          cfg.sourceFractions, defaultFraction = cfg.sampleFraction,
          hash = cfg.sampleHash)
      else if (cfg.sampleFraction >= 1.0) canonical
      else Sampling.consistentSample(canonical, cfg.idCol, cfg.sampleFraction,
        hash = cfg.sampleHash)

    sampled.select(
      id, text, col(cfg.sourceCol),
      TextAnalysis.tokenCount(text).as("n_tokens"),
      TextAnalysis.bpeTokenCount(text).as("n_bpe_tokens"),
      TextAnalysis.fingerprintMd5(text).as("fingerprint"),
      TextAnalysis.langId(text).as("lang_pred"),
      TextAnalysis.qualityScore(text).as("quality"))
  }

  /** Corpus-level report over a pipeline output: per predicted language,
    * document and token totals — what you check before shipping a crawl
    * snapshot to training.
    */
  def report(corpus: DataFrame): DataFrame =
    corpus.groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_bpe_tokens")).as("total_bpe_tokens"),
        // mean via micro-unit fixed point: a plain double avg() is
        // shuffle-order-dependent (IEEE addition is non-associative), so
        // it can't be reproduced bit-for-bit across engines/runs. quality
        // ∈ [0,1], so round(q*1e6) ≤ 1e6 and the bigint sum is exact.
        (sum(round(col("quality") * lit(1000000.0)).cast("long")).cast("double")
          / lit(1000000.0) / count(lit(1)).cast("double")).as("avg_quality"))
      .orderBy("lang_pred")
}
