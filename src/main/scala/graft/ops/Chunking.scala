package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG-indexing / context-
  * window-prep dual of [[Packing]] (which concatenates short docs,
  * where this SPLITS long ones). No reference counterpart (the
  * reference has no text processing at all); standard step of every
  * retrieval / training pipeline that must bound sequence length while
  * keeping cross-boundary context via overlap.
  *
  * Chunk `i` covers tokens `[i·stride, i·stride + chunkTokens)` where
  * `stride = chunkTokens − overlapTokens`; a chunk is emitted only
  * when it contributes at least one token the previous chunk didn't
  * (so a short tail that is entirely contained in its predecessor is
  * NOT emitted, and a doc never yields a redundant final chunk).
  * Empty docs yield zero rows.
  *
  * Scale shape: one narrow pass — tokenize (array HOFs, codegen),
  * per-row chunk-count arithmetic, one `posexplode`-style explode of a
  * small index sequence, and `slice` per chunk. No shuffle at all:
  * chunking is embarrassingly parallel, and the explode factor is
  * `≈ tokens/stride` per row — data-proportional, never a hot key.
  */
object Chunking {

  /** @param chunkTokens   window size in whitespace tokens
    * @param overlapTokens tokens shared between consecutive chunks
    * @return one row per chunk: (idCol, chunk_idx, chunk_text,
    *         n_tokens), chunk_idx 0-based in document order
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val tk = graft.util.Cols.fresh(df, "__tk")
    val idx = graft.util.Cols.fresh(df.columns :+ tk, "__ci")
    val n = size(col(tk))
    // 1 + max(0, floor((n - overlap - 1) / stride)) chunks: chunk 0
    // always, then one per stride step that still adds unseen tokens
    val nChunks = (lit(1) + greatest(lit(0),
      floor((n - lit(overlapTokens) - 1).cast("double") / stride)))
      .cast("int")
    df.select(col(idCol), graft.text.TextAnalysis.tokens(col(textCol)).as(tk))
      .where(size(col(tk)) > 0)
      .select(col(idCol), col(tk),
        explode(sequence(lit(0), nChunks - 1)).as(idx))
      .select(col(idCol), col(idx).as("chunk_idx"),
        concat_ws(" ",
          slice(col(tk), col(idx) * stride + lit(1), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), n - col(idx) * stride).cast("int")
          .as("n_tokens"))
  }
}
