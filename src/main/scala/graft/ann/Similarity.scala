package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — north-star
  * extension (the reference has no vector ops, SURVEY.md §2.8).
  *
  * Scale design:
  *  - All vector math is higher-order-function `Column` expressions
  *    (`zip_with` + `aggregate`) — no UDF, no serialization boundary.
  *  - Brute-force top-k broadcasts the (small) query set and scans the
  *    corpus ONCE; ranking is a per-query-key window (shuffle by query
  *    id), never a global sort.
  *  - The LSH path buckets the corpus by random-hyperplane sign bits so
  *    each query only scores its bucket — the 100 TB path; brute force
  *    is the exactness baseline it is tested against.
  */
object Similarity {

  /** Dot product in double precision, accumulated in array order
    * (deterministic — not a shuffle-order-dependent sum). Backed by the
    * codegen'd native kernel [[graft.functions.FloatVecDot]]; the
    * higher-order-function formulation [[dotHof]] is kept as the
    * reference implementation (bit-identical results, ~10× slower).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  /** HOF reference implementation of [[dot]] (no custom expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float vectors (double math). For pairwise
    * joins prefer precomputing each side's norm once per ROW (see
    * [[bruteForceTopK]]) instead of recomputing both norms per PAIR.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    *
    * `queries` must be small (it is broadcast); `corpus` is scanned once.
    * Norms are computed once per row BEFORE the join (per-pair work is a
    * single dot), bit-identical to inline cosine. Ties broken by corpus
    * id ascending — fully deterministic output. Self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Zero-norm vectors are excluded up front: cos would be NaN, and
    // Spark sorts NaN ABOVE every real double, so a single all-zeros
    // embedding would otherwise become the rank-1 neighbor of every
    // query. (Mirrored in the DuckDB oracle.)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")).filter(col("qn") > 0)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn")).filter(col("cn") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    graft.ops.Windows.topKPerGroup(
        scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF-flat approximate top-k: the corpus is partitioned into
    * `numLists` inverted lists by nearest centroid; each query probes
    * its `nprobe` closest lists and scores only those corpus vectors.
    *
    * Centroid build: a deterministic sample (the `numLists` corpus
    * vectors with smallest id-hash — no RNG, reproducible) refined by
    * `kmeansIters` Lloyd iterations (assign to nearest by cosine, take
    * the per-dimension mean). Refinement tightens lists around the data
    * — measured recall@10 on the harness embeddings rose from 0.71 to
    * ≥0.85 at the same nprobe (pinned in ExtensionsSpec).
    * Costs, at 100 TB: assignment is |corpus| × numLists scored pairs
    * (one narrow stage vs a broadcast centroid set + one shuffle for
    * the per-row argmax); the probe join is an equi-join on list id;
    * each Lloyd iteration adds one assignment pass + one (list, dim)
    * aggregation over the REFINEMENT SET — `refineFraction < 1` runs
    * refinement on a deterministic hash-sample of the corpus
    * ([[graft.ops.Sampling.consistentSample]], materialized once),
    * because centroid quality needs ~1000 points per list, not every
    * row; at 100 TB this is the difference between Lloyd scanning the
    * corpus per iteration and scanning a fixed small sample. With
    * `nprobe = numLists` every list is probed and the result is EXACTLY
    * [[bruteForceTopK]] (pinned by test) regardless of where the
    * centroids sit — recall tuning is the nprobe/numLists trade.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numLists: Int, nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              kmeansIters: Int = 2, refineFraction: Double = 1.0): DataFrame =
    ivfTopKWithIndex(corpus, queries, k, nprobe,
      buildIvfIndex(corpus, numLists, idCol, vecCol, kmeansIters,
        refineFraction),
      idCol, vecCol)

  /** Build the IVF centroid table `(list_id, centroid, cent_n)` —
    * separated from [[ivfTopKWithIndex]] so the index is REUSABLE: at
    * 100 TB the k-means build scans the corpus `kmeansIters + 1` times
    * and must not be paid per query batch. Persist it with
    * [[writeIvfIndex]] (one TxTable commit, versioned alongside the
    * data) and serve every later query batch from [[loadIvfIndex]].
    */
  def buildIvfIndex(corpus: DataFrame, numLists: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    kmeansIters: Int = 2,
                    refineFraction: Double = 1.0): DataFrame = {
    require(numLists > 0, "need numLists > 0")
    require(refineFraction > 0 && refineFraction <= 1,
      "need 0 < refineFraction <= 1")
    // Centroids come from the zero-norm-FILTERED corpus (a NaN-cosine
    // centroid would attract every row — NaN sorts first under desc)
    // and are materialized ONCE (localCheckpoint): the frame is
    // referenced from two independent broadcast subplans, and a
    // re-evaluated monotonically_increasing_id could number centroids
    // differently on each side, silently mismatching lists and probes.
    val seeds = corpus
      .select(col(idCol), col(vecCol))
      .filter(norm(col(vecCol)) > 0)
      // id asc as the tiebreaker: under an xxhash64 collision at the
      // limit boundary, seed choice (and thus every list_id) would
      // otherwise depend on partition layout — breaking the no-RNG
      // reproducibility contract. Same total order as ivfRecallReport's
      // query sample.
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(numLists)
      .select(monotonically_increasing_id().as("list_id"),
        col(vecCol).cast("array<double>").as("centroid"),
        norm(col(vecCol)).as("cent_n"))
      .localCheckpoint()
    val ptsAll = corpus.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n")).filter(col("__n") > 0)
    // The sample is materialized once (localCheckpoint), so EVERY Lloyd
    // iteration re-scans the small cached sample, not the corpus scan +
    // filter lineage.
    val pts =
      if (refineFraction >= 1.0 || kmeansIters == 0) ptsAll
      else graft.ops.Sampling
        .consistentSample(ptsAll, idCol, refineFraction)
        .localCheckpoint()
    (1 to kmeansIters).foldLeft(seeds) { (c, _) =>
      lloydStep(pts, c, idCol, vecCol).localCheckpoint()
    }
  }

  /** Recall telemetry for an IVF index: sampled queries, ONE
    * brute-force ground-truth pass, one probe pass per `nprobe`
    * candidate — a production tuner reads the report and picks the
    * cheapest nprobe meeting its recall floor FROM DATA instead of
    * folklore. One row per probed configuration:
    * `(num_lists, nprobe, k, n_queries, truth_pairs, hits, recall)`.
    *
    * Cost: the ground truth is brute force over `sampleQueries`
    * queries only (never all-pairs over the corpus), the probes reuse
    * the prebuilt `index` (the k-means cost is NOT re-paid), and the
    * query sample is hash-ordered so it is deterministic and unbiased
    * by id locality. `recall` at `nprobe = numLists` is exactly 1.0 by
    * construction — a built-in self-check that the probe half is
    * faithful to brute force.
    */
  def ivfRecallReport(corpus: DataFrame, index: DataFrame, k: Int,
                      nprobes: Seq[Int], sampleQueries: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    recallReportOverLists(corpus,
      assignToLists(corpus, index, idCol, vecCol), index, k, nprobes,
      sampleQueries, idCol, vecCol)

  /** [[ivfRecallReport]] against PERSISTED inverted lists: the tuner's
    * loop re-runs as recall targets or corpora change, and re-paying
    * the full-corpus centroid assignment per report defeats the
    * persisted index's whole point. The stored lists ARE the
    * assignment, so this reads them back and reports over exactly the
    * vectors the index serves — identical numbers to
    * [[ivfRecallReport]] over the same corpus and centroids (pinned
    * by spec). Ground truth stays a brute-force pass over the sampled
    * queries only.
    */
  def ivfRecallReportFromLists(spark: org.apache.spark.sql.SparkSession,
                               path: String, index: DataFrame, k: Int,
                               nprobes: Seq[Int], sampleQueries: Int,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    val stored = graft.ops.TxTable.read(spark, path)
      .select(col(idCol), col(vecCol), col("nrm"), col("list_id"))
      .localCheckpoint()
    recallReportOverLists(stored.select(col(idCol), col(vecCol)), stored,
      index, k, nprobes, sampleQueries, idCol, vecCol)
  }

  /** Shared tail of [[ivfRecallReport]]/[[ivfRecallReportFromLists]]:
    * `assigned` is the (idCol, vecCol, nrm, list_id) inverted-list
    * frame of `corpus` — freshly computed or read back persisted.
    */
  private def recallReportOverLists(corpus: DataFrame, assigned: DataFrame,
                                    index: DataFrame, k: Int,
                                    nprobes: Seq[Int], sampleQueries: Int,
                                    idCol: String,
                                    vecCol: String): DataFrame = {
    require(nprobes.nonEmpty, "need at least one nprobe to probe")
    require(sampleQueries > 0, "need a positive query sample")
    val spark = corpus.sparkSession
    val numLists = index.count()
    // deterministic pseudo-random sample, pinned for the multi-pass use
    val queries = corpus
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(sampleQueries)
      .localCheckpoint()
    val nQueries = queries.count()
    val truth = bruteForceTopK(corpus, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val truthPairs = truth.count()
    // the EXPENSIVE half — full-corpus centroid assignment — is pinned
    // ONCE (or read back, already paid); each nprobe candidate only
    // re-scores the tiny query sample. (Re-running ivfTopKWithIndex
    // per nprobe re-paid the corpus assignment |nprobes| times,
    // exactly what the docstring promises not to do.) The query sample
    // is assigned once at the WIDEST nprobe; narrower candidates are a
    // rank filter over the same deterministic (cos desc, list_id asc)
    // order — identical to an independent keep=np assignment.
    val lists = assigned
      .select(col(idCol).as("c_id"), col(vecCol).as("c_v"),
        col("nrm").as("c_n"), col("list_id"))
      .localCheckpoint()
    val qNorm = queries.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n")).filter(col("__n") > 0)
    val qScored = qNorm.crossJoin(broadcast(index))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
    val qProbes = graft.ops.Windows.topKPerGroup(qScored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), nprobes.max,
        rankCol = "__pr")
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
        col("__n").as("q_n"), col("list_id"), col("__pr"))
      .localCheckpoint()
    val rows = nprobes.map { np =>
      val scored = lists.join(qProbes.filter(col("__pr") <= np),
          Seq("list_id"))
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
          (dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n"))).as("cos"))
      val hits = graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
          Seq(col("cos").desc, col("neighbor_id").asc), k)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      (numLists, np, k, nQueries, truthPairs, hits,
        if (truthPairs == 0) 1.0 else hits.toDouble / truthPairs)
    }
    import spark.implicits._
    rows.toDF("num_lists", "nprobe", "k", "n_queries", "truth_pairs",
      "hits", "recall")
  }

  /** Persist a built index as a [[graft.ops.TxTable]] (atomic publish,
    * versioned — rebuilding the index is an overwrite commit and
    * readers mid-query keep their snapshot).
    */
  def writeIvfIndex(index: DataFrame, path: String): Long =
    graft.ops.TxTable.overwrite(index.sparkSession, path, index)

  /** Load a persisted index for [[ivfTopKWithIndex]]. */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    graft.ops.TxTable.read(spark, path)
      .select(col("list_id"), col("centroid"), col("cent_n"))

  /** Assign each vector to its single nearest centroid by cosine —
    * the INVERTED-LIST materialization `(id, vector, nrm, list_id)`.
    * Deterministic (ties break on list_id ascending), zero-norm rows
    * excluded. One broadcast of the centroid set, one narrow scoring
    * pass, one per-id window — O(|vectors| × numLists) scored pairs.
    */
  def assignToLists(vectors: DataFrame, index: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val withNorm = vectors.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm")).filter(col("nrm") > 0)
    val scored = withNorm.crossJoin(broadcast(index))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("nrm") * col("cent_n")))
    graft.ops.Windows.topKPerGroup(scored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), 1, rankCol = "__ar")
      .select(col(idCol), col(vecCol), col("nrm"), col("list_id"))
  }

  /** Materialize the corpus's inverted lists as a [[graft.ops.TxTable]]
    * at `path` — the serve-many half of the IVF story: the k-means
    * build AND the full-corpus assignment are paid once; query batches
    * ([[ivfTopKFromLists]]) and streaming appends ([[ivfAppend]]) both
    * work off the persisted table from then on.
    */
  def writeIvfLists(corpus: DataFrame, index: DataFrame, path: String,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Long =
    graft.ops.TxTable.overwrite(corpus.sparkSession, path,
      idSorted(assignToLists(corpus, index, idCol, vecCol), idCol))

  /** Id-range-sorted list layout: the assignment window leaves rows
    * hash-scattered by id, so every file's id min/max would span the
    * whole corpus and an [[ivfRemove]] could never prune its rewrite.
    * Range partitioning gives each file a tight id window — a removal
    * of a handful of ids rewrites a handful of files, the rest carry
    * over byte-identical (the [[graft.text.Bm25]] tokenSorted
    * rationale, keyed by id because the delete predicate is an id
    * set; the serve join reads every list row regardless of layout).
    * One extra exchange, paid at build/append time only.
    */
  private def idSorted(lists: DataFrame, idCol: String): DataFrame =
    lists.repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))

  /** INCREMENTAL index maintenance: route ONLY the new vectors to their
    * nearest existing centroid and append them to the persisted lists —
    * O(batch × numLists) work, no full rebuild, one atomic TxTable
    * commit. This is what composes with the streaming story: a follower
    * ingesting embedding batches keeps the ANN index current by calling
    * this per increment. Centroids are fixed, so the routing function
    * is IDENTICAL to the one the full build used — an appended index
    * serves exactly what a full re-assignment under the same centroids
    * would (pinned by test); recentering (a fresh [[buildIvfIndex]] +
    * [[writeIvfLists]]) remains a periodic offline job, exactly like
    * FAISS's add-vs-train split.
    *
    * `txn = Some((app, batchId))` makes the append REPLAY-SAFE for a
    * `foreachBatch` driver ([[graft.text.Bm25.appendToIndex]]'s
    * contract at the dense-index layer): the batch id commits
    * atomically with the list rows as a `txn.<app>` token, so a
    * checkpoint-replayed batch whose append already landed is a no-op
    * instead of planting every vector twice in its list.
    *
    * `maintain = Some(policy)` bounds the file count the append trail
    * leaves behind ([[graft.text.Bm25.appendToIndex]]'s contract): a
    * landed append checks the policy's threshold and, when crossed,
    * ONE id-range OPTIMIZE restores the [[writeIvfLists]] layout —
    * the measured alternative is ~13× serve degradation after 50
    * unmaintained appends (`MAINT_FRAG_r14.json`).
    */
  def ivfAppend(spark: org.apache.spark.sql.SparkSession, path: String,
                index: DataFrame, newVectors: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                txn: Option[(String, Long)] = None,
                maintain: Option[graft.ops.TxTable.Maintenance] = None)
      : Long =
    graft.ops.TxTable.withTxn(spark, path, txn) { (txnMeta, txnGuard) =>
      val v = graft.ops.TxTable.append(spark, path,
        idSorted(assignToLists(newVectors, index, idCol, vecCol), idCol),
        meta = txnMeta, guard = txnGuard)
      graft.ops.TxTable.maintainAfterAppend(spark, path, Seq(idCol),
        maintain)
      v
    }

  /** REMOVE vectors from persisted inverted lists — the dense index's
    * lifecycle third leg (GDPR purge, contaminated-embedding excision),
    * completing build/append/serve the way [[graft.text.Bm25
    * .removeFromIndex]] completes the lexical index's. ONE atomic
    * copy-on-write [[graft.ops.TxTable.delete]]: manifest stats prune
    * the rewrite to the files whose id range may hold the victims;
    * every other list file carries over byte-identical. Centroids stay
    * FIXED (FAISS `remove_ids` semantics — removal never retrains),
    * and the IVF serve path carries no corpus-level stats to refresh:
    * scoring reads only each stored row's (vector, norm) and the
    * broadcast centroid table, and a query's nprobe routing never
    * looks at list contents. The delete alone therefore leaves the
    * table BIT-IDENTICAL in serve semantics to lists that never held
    * the vectors under the same centroids (pinned by spec and by the
    * q_x_ann_ivf_removed oracle = exhaustive search over survivors).
    * Removed ids are re-ingestable via [[ivfAppend]]. Ids with no
    * list rows are an exact no-op (no commit, `None`). Re-centering
    * after heavy removal remains the periodic offline
    * [[buildIvfIndex]] + [[writeIvfLists]] job, same as for appends.
    * Time-travel readers keep pre-removal snapshots until
    * [[graft.ops.TxTable.vacuum]] — a purge is GDPR-complete only
    * after one, exactly the BM25 contract.
    */
  def ivfRemove(spark: org.apache.spark.sql.SparkSession, path: String,
                vecIds: Seq[Any],
                idCol: String = "vec_id"): Option[Long] = {
    require(vecIds.nonEmpty, "ivfRemove needs at least one vector id")
    graft.ops.TxTable.delete(spark, path, col(idCol).isin(vecIds: _*))
  }

  /** Serve top-k from PERSISTED inverted lists (see [[ivfAppend]] /
    * [[writeIvfLists]]): only the query side is assigned at query time
    * (nprobe lists per query); the corpus-side assignment — the
    * expensive half at 100 TB — is read back, already materialized.
    * The probe is an equi-join on list_id against a stats-pruned
    * TxTable read.
    */
  def ivfTopKFromLists(spark: org.apache.spark.sql.SparkSession,
                       path: String, queries: DataFrame, k: Int,
                       nprobe: Int, index: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(nprobe > 0, "need nprobe > 0")
    val lists = graft.ops.TxTable.read(spark, path)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_v"),
        col("nrm").as("c_n"), col("list_id"))
    val qNorm = queries.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm")).filter(col("nrm") > 0)
    val qScored = qNorm.crossJoin(broadcast(index))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("nrm") * col("cent_n")))
    val probes = graft.ops.Windows.topKPerGroup(qScored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), nprobe, rankCol = "__qr")
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
        col("nrm").as("q_n"), col("list_id"))
    val scored = lists.join(probes, Seq("list_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        (dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n"))).as("cos"))
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF probe against a prebuilt centroid table (see [[ivfTopK]] for
    * the algorithm and scale analysis — this is its query half).
    */
  def ivfTopKWithIndex(corpus: DataFrame, queries: DataFrame, k: Int,
                       nprobe: Int, index: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(nprobe > 0, "need nprobe > 0")
    val cents = index

    // Norms computed once per row/centroid BEFORE the cross join — the
    // per-pair work is a single dot (see bruteForceTopK).
    def assign(df: DataFrame, side: String, keep: Int): DataFrame = {
      val withNorm = df.select(col(idCol), col(vecCol),
        norm(col(vecCol)).as("__n")).filter(col("__n") > 0)
      val scored = withNorm.crossJoin(broadcast(cents))
        .withColumn("__cs",
          dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
      graft.ops.Windows.topKPerGroup(scored, Seq(col(idCol)),
          Seq(col("__cs").desc, col("list_id").asc), keep, rankCol = s"__r_$side")
        .select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_v"),
          col("__n").as(s"${side}_n"), col("list_id"))
    }

    val lists = assign(corpus, "c", 1)
    val probes = assign(queries, "q", nprobe)
    val scored = lists.join(probes, Seq("list_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        (dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n"))).as("cos"))
      // a (query, corpus) pair can arrive via at most one list (corpus
      // rows live in exactly one list), so no distinct needed
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** One Lloyd iteration: assign each (pre-filtered, normed) point to
    * its nearest centroid by cosine, then replace every non-empty list's
    * centroid with the per-dimension mean of its members. Lists that
    * attract no members drop out (fewer, better-placed lists). The mean
    * is rebuilt from a (list, dim) aggregation — one shuffle keyed by
    * (list_id, pos) then one by list_id, never a driver-side collect.
    */
  private def lloydStep(pts: DataFrame, cents: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val scored = pts.crossJoin(broadcast(cents))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
    val assigned = graft.ops.Windows.topKPerGroup(scored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), 1, rankCol = "__lr")
      .select(col("list_id"), col(vecCol))
    assigned
      .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("list_id", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("list_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("list_id"),
        transform(col("pm"), s => s.getField("m")).as("centroid"))
      .withColumn("cent_n", norm(col("centroid")))
      .filter(col("cent_n") > 0)
  }

  /** Deterministic random hyperplanes (fixed seed): `numPlanes` vectors
    * of dimension `dim`, as literal arrays baked into the plan.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit).toIndexedSeq: _*)
      when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: score only corpus vectors in the query's LSH
    * bucket(s). With `numPlanes` bits the corpus splits into up to
    * 2^numPlanes buckets — each query scores ~|corpus|/2^numPlanes
    * candidates per probed bucket.
    *
    * `probeRadius` enables multi-probe: each query also probes every
    * bucket within that Hamming distance of its own (sign-LSH's nearest
    * misses differ in exactly the bits whose hyperplane the query sits
    * close to). Radius r probes sum_{i<=r} C(numPlanes, i) buckets —
    * still an equi-join on bucket id, never a cartesian; the probe list
    * is exploded query-side, so the corpus is bucketed exactly once.
    * Measured recall@10 on the harness embeddings (near-uniform
    * directions, 4 planes): 0.10 single-probe, ≥0.4 at radius 1, rising
    * toward exhaustive as r→numPlanes (floors pinned in ExtensionsSpec).
    * [[ivfTopK]] (k-means lists) is still the better default scale path
    * on clusterable data.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = 64, probeRadius: Int = 0): DataFrame = {
    require(numPlanes > 0 && numPlanes <= 63,
      "need 0 < numPlanes <= 63 (bucket is a long of sign bits)")
    require(probeRadius >= 0 && probeRadius <= numPlanes,
      "need 0 <= probeRadius <= numPlanes")
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cn"), lshBucket(col(vecCol), planes).as("bucket"))
      .filter(col("cn") > 0) // see bruteForceTopK: NaN sorts above all
    // all bit-flip masks with popcount <= radius; distinct masks give
    // distinct probe buckets, so no (query, neighbor) pair dedup needed
    val masks = flipMasks(numPlanes, probeRadius)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qn"), lshBucket(col(vecCol), planes).as("bucket"))
      .filter(col("qn") > 0)
    val q =
      if (masks.size == 1) q0
      else q0.select(col("query_id"), col("qv"), col("qn"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    graft.ops.Windows.topKPerGroup(
        scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Distinct bit masks over `n` bit positions with popcount <=
    * `radius`, enumerated by choosing the set bits directly —
    * O(sum C(n, i)), so large `n` with a small radius stays cheap
    * (a 2^n sweep would be intractable AND overflow Int at n >= 31).
    */
  private[graft] def flipMasks(n: Int, radius: Int): Seq[Long] = {
    def choose(start: Int, rem: Int): Seq[Long] =
      if (rem == 0) Seq(0L)
      else (start to n - rem).flatMap(i =>
        choose(i + 1, rem - 1).map(_ | (1L << i)))
    (0 to radius).flatMap(choose(0, _))
  }

  // ------------------------------------------------ scalar quantization

  /** Per-dimension [min, max] over the corpus — the SQ8 "codebook".
    * ONE aggregation pass (posexplode → per-dimension min/max →
    * re-assembled arrays), returned as a SINGLE-ROW frame
    * (mins array<double>, maxs array<double>) meant to be
    * broadcast-crossJoined into encode/serve plans — the same
    * broadcast-totals pattern the TF-IDF corpus stats use. At 100 TB
    * the codebook is `2 × dim` doubles however big the corpus is.
    */
  def sqTrain(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"),
        col("mx")))).as("pm"))
      .select(transform(col("pm"), s => s.getField("mn")).as("mins"),
        transform(col("pm"), s => s.getField("mx")).as("maxs"))

  /** 8-bit scalar-quantize the corpus: per dimension,
    * `u8 = floor((x - mn) / (mx - mn) * 255 + 0.5)` CLAMPED to
    * [0, 255] (constant dimensions code to 0), stored offset by -128
    * as `array<tinyint>` — 4× smaller than the float vectors at
    * serving time, the standard memory lever between full-precision
    * and product quantization. The clamp only bites when a vector
    * lies OUTSIDE the codebook's trained range — impossible when the
    * codebook was trained on the same corpus (so the exact oracles
    * are unaffected), and exactly the FAISS SQ8 behavior for
    * out-of-distribution vectors added under a frozen codebook
    * ([[sqAppend]]): saturate to the range edge, never wrap the
    * tinyint. Returns (idCol, codes). A narrow zip-free pass: one
    * broadcast of the codebook, per-element arithmetic, no shuffle.
    */
  def sqEncode(corpus: DataFrame, ranges: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.crossJoin(broadcast(ranges))
      .select(col(idCol),
        transform(col(vecCol), (x, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          (least(greatest(when(mx > mn,
            floor((x.cast("double") - mn) / (mx - mn) * 255.0 + 0.5))
            .otherwise(0.0), lit(0.0)), lit(255.0)).cast("int") - 128)
            .cast("tinyint")
        }).as("codes"))

  /** Reconstruction of a code array under a codebook:
    * `mn + (code + 128) * (mx - mn) / 255` per dimension (double).
    */
  def sqDequantize(codes: Column, mins: Column, maxs: Column): Column =
    transform(codes, (c, i) => {
      val mn = element_at(mins, i + 1)
      val mx = element_at(maxs, i + 1)
      mn + (c.cast("double") + 128.0) * (mx - mn) / 255.0
    })

  /** SQ8 × IVF — the composed 100 TB serve path: the inverted lists
    * hold 8-bit CODES (a quarter of the float memory), queries stay
    * full precision, and each query scores only its `nprobe` lists'
    * dequantized entries through the same equi-join-on-list_id plan as
    * [[ivfTopKWithIndex]]. Routing (corpus→list, query→probes) runs on
    * the FULL-PRECISION vectors against the k-means centroids — codes
    * only replace the stored list payload, exactly FAISS's
    * `IVF<n>,SQ8` split. With `nprobe = numLists` every list is probed
    * and the result is EXACTLY [[sqTopK]] over the zero-norm-filtered
    * corpus (pinned by the oracle): ranking comes purely from the
    * dequantized cosine, wherever the centroids sit.
    */
  def sqIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                numLists: Int, nprobe: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                kmeansIters: Int = 2): DataFrame = {
    require(nprobe > 0, "need nprobe > 0")
    val index = buildIvfIndex(corpus, numLists, idCol, vecCol, kmeansIters)
    val ranges = sqTrain(corpus, vecCol)
    val codes = sqEncode(corpus, ranges, idCol, vecCol)
    // full-precision routing; the stored payload is the code array
    val lists = assignToLists(corpus, index, idCol, vecCol)
      .select(col(idCol), col("list_id"))
      .join(codes, Seq(idCol))
      .crossJoin(broadcast(ranges))
      .select(col(idCol).as("c_id"), col("list_id"),
        sqDequantize(col("codes"), col("mins"), col("maxs")).as("dv"))
      .withColumn("c_n", sqrt(dotHof(col("dv"), col("dv"))))
      .filter(col("c_n") > 0)
    val qNorm = queries.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n")).filter(col("__n") > 0)
    val qScored = qNorm.crossJoin(broadcast(index))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
    val probes = graft.ops.Windows.topKPerGroup(qScored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), nprobe, rankCol = "__qr")
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
        col("__n").as("q_n"), col("list_id"))
    val scored = lists.join(probes, Seq("list_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        (dotHof(col("q_v"), col("dv")) / (col("q_n") * col("c_n")))
          .as("cos"))
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ------------------------------------------- persisted SQ8 index
  //
  // [[sqTopK]]/[[sqIvfTopK]] re-train the codebook and re-encode the
  // corpus per call; the persisted form completes the engine's
  // uniform index-lifecycle story (BM25 postings, IVF lists, SemDedup
  // assignments, minhash signatures — now SQ codes): the codebook
  // (<root>/ranges, one row) and the encoded corpus (<root>/codes,
  // id-range-sorted for pruned removals) are TxTables; ingest encodes
  // ONLY the batch under the FROZEN codebook (FAISS's train-vs-add
  // split: ranges are trained once on a representative corpus, and
  // re-training is a periodic offline [[writeSqIndex]] — an appended
  // batch containing values outside the trained [min,max] clamps to
  // the range edge, exactly like FAISS SQ8 on out-of-distribution
  // adds); removal is one atomic manifest-pruned delete; serve reads
  // codes at a quarter of the float memory.

  /** Train the codebook on `corpus` and persist codebook + codes. */
  def writeSqIndex(corpus: DataFrame, root: String,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val ranges = sqTrain(corpus, vecCol).localCheckpoint()
    graft.ops.TxTable.overwrite(spark, s"$root/ranges", ranges)
    graft.ops.TxTable.overwrite(spark, s"$root/codes",
      idSorted(sqEncode(corpus, ranges, idCol, vecCol), idCol))
  }

  /** Encode ONLY `newVectors` under the stored (frozen) codebook and
    * append — O(batch), no re-train, one atomic commit. Serving
    * afterwards ≡ a [[sqEncode]] of the union under the SAME ranges
    * (pinned by spec and the q_x_ann_sq_served oracle); it is NOT a
    * re-trained rebuild — that is the documented offline job.
    * `txn = Some((app, batchId))` makes the append replay-safe for a
    * `foreachBatch` driver — the [[ivfAppend]] contract.
    */
  def sqAppend(spark: org.apache.spark.sql.SparkSession, root: String,
               newVectors: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               txn: Option[(String, Long)] = None,
               maintain: Option[graft.ops.TxTable.Maintenance] = None)
      : Long =
    graft.ops.TxTable.withTxn(spark, s"$root/codes", txn) {
      (txnMeta, txnGuard) =>
        val ranges = graft.ops.TxTable.read(spark, s"$root/ranges")
        val v = graft.ops.TxTable.append(spark, s"$root/codes",
          idSorted(sqEncode(newVectors, ranges, idCol, vecCol), idCol),
          meta = txnMeta, guard = txnGuard)
        graft.ops.TxTable.maintainAfterAppend(spark, s"$root/codes",
          Seq(idCol), maintain)
        v
    }

  /** Remove vectors' codes — one atomic manifest-pruned copy-on-write
    * delete (the [[ivfRemove]] contract: the codebook carries no
    * per-vector state, so the delete alone serves as an index never
    * holding the ids; GDPR-complete after a vacuum). Unknown ids are
    * an exact no-op.
    */
  def sqRemove(spark: org.apache.spark.sql.SparkSession, root: String,
               vecIds: Seq[Any],
               idCol: String = "vec_id"): Option[Long] = {
    require(vecIds.nonEmpty, "sqRemove needs at least one vector id")
    graft.ops.TxTable.delete(spark, s"$root/codes",
      col(idCol).isin(vecIds: _*))
  }

  /** [[sqTopK]] served from the persisted codebook + codes. */
  def sqTopKFromCodes(spark: org.apache.spark.sql.SparkSession,
                      root: String, queries: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    sqTopK(graft.ops.TxTable.read(spark, s"$root/codes"),
      graft.ops.TxTable.read(spark, s"$root/ranges"), queries, k,
      idCol, vecCol)

  /** Asymmetric SQ8 top-k: full-precision queries scored against the
    * DEQUANTIZED corpus codes — [[bruteForceTopK]]'s shape (broadcast
    * query set, one corpus scan, per-query-key window) over a corpus
    * that costs a quarter of the memory. Reconstruction error is
    * bounded by half a quantization step per dimension, so ranking is
    * approximate; recall floors are pinned in the spec. Deterministic:
    * ties break on neighbor id, zero-norm rows (either side) excluded.
    */
  def sqTopK(codes: DataFrame, ranges: DataFrame, queries: DataFrame,
             k: Int, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")).filter(col("qn") > 0)
    val c = codes.crossJoin(broadcast(ranges))
      .select(col(idCol).as("neighbor_id"),
        sqDequantize(col("codes"), col("mins"), col("maxs")).as("dv"))
      // dotHof, not the float-native kernel: dv is array<double>, and
      // the HOF's in-order double accumulation is the exactly-mirrored
      // arithmetic the oracle reproduces
      .withColumn("cn", sqrt(dotHof(col("dv"), col("dv"))))
      .filter(col("cn") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotHof(col("qv"), col("dv")) / (col("qn") * col("cn")))
    graft.ops.Windows.topKPerGroup(
        scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ------------------------------------------- product quantization
  //
  // The compression tier past SQ8 (4×): split each d-dim vector into
  // `m` subspaces of d/m dims, quantize each subvector to one of
  // `ksub` per-subspace codebook entries, store `m` bytes per vector
  // (d=64, m=8 → 8 B vs 256 B float = 32×). Serving is ADC
  // (asymmetric distance computation): per query, precompute an
  // m×ksub lookup table of query-subvector · codebook-entry dots, and
  // each corpus vector's score is m TABLE LOOKUPS + adds instead of d
  // multiplies — Jégou et al., "Product Quantization for Nearest
  // Neighbor Search" (TPAMI 2011), the standard billion-vector serve
  // path (FAISS `PQ<m>` / `IVF<n>,PQ<m>`). At 100 TB the codes frame
  // is 32× smaller than the floats and the LUTs are m·ksub doubles
  // per query however big the corpus is.
  //
  // Codebook init is DETERMINISTIC seed sampling — subspace j's
  // codebook = the `ksub` smallest-id corpus vectors' j-th
  // subvectors — so the whole train/encode/serve pipeline is exactly
  // mirrorable in the oracle (the SemDedup fixed-seed-centroid
  // pattern). [[pqRefine]] Lloyd-improves the codebooks for
  // production quality; like [[buildIvfIndex]]'s k-means it averages
  // in shuffle order, so the refined path is training-only (pinned by
  // property specs: quantization MSE weakly decreases), while the
  // seed path carries the bit-exact oracles.

  /** Seed PQ codebooks: a SINGLE-ROW frame
    * (cbs: array<array<array<double>>>, subspace → code → subvector)
    * where `cbs(j)(c)` is the j-th subvector of the c-th smallest-id
    * corpus vector. Requires dim % m == 0 and 0 < ksub ≤ 127 (codes
    * live in a signed tinyint without offset games). Meant to be
    * broadcast into encode/serve plans — m·ksub·(d/m) = ksub·d
    * doubles however big the corpus is.
    */
  def pqTrainSeed(corpus: DataFrame, m: Int, ksub: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(m > 0, "need m > 0 subspaces")
    require(ksub > 0 && ksub <= 127, "need 0 < ksub <= 127 (tinyint codes)")
    corpus.orderBy(col(idCol)).limit(ksub)
      .select(struct(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")).as("s"))
      .groupBy().agg(array_sort(collect_list(col("s"))).as("sv"))
      .select(transform(col("sv"), s => s.getField("v")).as("seeds"))
      // dim % m enforced IN the plan (the frame is lazy — there is no
      // driver-side row to require() against without an extra job):
      // a non-divisible m would silently truncate dsub = dim/m and
      // drop the trailing dim mod m dimensions through every
      // train/encode/serve step downstream, degrading ranking with no
      // error. raise_error matches the ksub require's fail-loud bar.
      .select(when(size(element_at(col("seeds"), 1)) % m === 0,
          transform(sequence(lit(0), lit(m - 1)), j => {
            val dsub = size(element_at(col("seeds"), 1)) / m
            transform(col("seeds"), s => slice(s, j * dsub + 1, dsub))
          }))
        .otherwise(raise_error(concat(
          lit("pqTrainSeed: embedding dim "),
          size(element_at(col("seeds"), 1)).cast("string"),
          lit(s" is not a multiple of m=$m subspaces — the trailing" +
            " dimensions would be silently dropped from every" +
            " train/encode/serve step"))))
        .as("cbs"))
  }

  /** Squared L2 distance between two double arrays, accumulated in
    * array order (the deterministic fold every PQ step shares).
    */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** In-order double dot of two already-double arrays (the LUT fold;
    * [[dotHof]] casts, this doesn't — inputs are double by
    * construction).
    */
  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, d) => acc + d)

  /** `fold_j table(j)(codes(j))` — the ADC score/norm fold: one lookup
    * per subspace, summed in subspace order.
    */
  private def lutSum(codes: Column, tables: Column): Column =
    aggregate(zip_with(codes, tables,
        (cd, t) => element_at(t, cd.cast("int") + 1)),
      lit(0.0), (acc, d) => acc + d)

  /** PQ-encode the corpus under `cbs`: per subspace, the 0-based index
    * of the L2-nearest codebook entry (ties → smallest code), as
    * `array<tinyint>` of length m. One broadcast of the codebooks,
    * per-row arithmetic, no shuffle.
    */
  def pqEncode(corpus: DataFrame, cbs: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.crossJoin(broadcast(cbs))
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"),
        col("cbs"))
      .select(col(idCol),
        transform(col("cbs"), (cb, j) => {
          val dsub = size(element_at(cb, 1))
          val sub = slice(col("__v"), j * dsub + 1, dsub)
          val dists = transform(cb, e => sqDist(sub, e))
          (array_position(dists, array_min(dists)) - 1).cast("tinyint")
        }).as("codes"))

  /** Reconstruction of a code array under the codebooks: the
    * concatenation of each subspace's chosen centroid.
    */
  def pqDequantize(codes: Column, cbs: Column): Column =
    flatten(zip_with(codes, cbs,
      (cd, cb) => element_at(cb, cd.cast("int") + 1)))

  /** The per-subspace squared-norm table (sqns: array<array<double>>,
    * sqns(j)(c) = cb(j)(c)·cb(j)(c)) — reconstruction norms become m
    * lookups, `cn = sqrt(fold_j sqns(j)(codes(j)))`.
    */
  private def pqSqnRow(cbs: DataFrame): DataFrame =
    cbs.select(transform(col("cbs"),
      cb => transform(cb, e => dotD(e, e))).as("sqns"))

  /** Per-query ADC lookup tables joined onto the query frame:
    * (query_id, qn, luts) with luts(j)(c) = q_sub_j · cbs(j)(c) —
    * m·ksub doubles per query. Zero-norm queries excluded.
    */
  private def pqQueryLuts(queries: DataFrame, cbs: DataFrame,
                          idCol: String, vecCol: String): DataFrame =
    queries.crossJoin(broadcast(cbs))
      .select(col(idCol).as("query_id"), norm(col(vecCol)).as("qn"),
        col(vecCol).cast("array<double>").as("__q"), col("cbs"))
      .filter(col("qn") > 0)
      .select(col("query_id"), col("qn"),
        transform(col("cbs"), (cb, j) => {
          val dsub = size(element_at(cb, 1))
          val sub = slice(col("__q"), j * dsub + 1, dsub)
          transform(cb, e => dotD(sub, e))
        }).as("luts"))

  /** Asymmetric PQ top-k: full-precision queries against PQ codes via
    * ADC — [[bruteForceTopK]]'s shape (broadcast query LUTs, one scan
    * of the codes, per-query-key window) over a corpus 32× smaller
    * than the floats (d=64, m=8). `cos = (fold_j luts(j)(code_j)) /
    * (qn · sqrt(fold_j sqns(j)(code_j)))` — the reconstructed-vector
    * cosine, computed without ever materializing the reconstruction.
    * Deterministic: in-order folds, ties break on neighbor id,
    * zero-norm queries and zero-norm reconstructions excluded,
    * self-matches excluded.
    */
  def pqTopK(codes: DataFrame, cbs: DataFrame, queries: DataFrame,
             k: Int, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val q = pqQueryLuts(queries, cbs, idCol, vecCol)
    val c = codes.crossJoin(broadcast(pqSqnRow(cbs)))
      .select(col(idCol).as("neighbor_id"), col("codes"),
        sqrt(lutSum(col("codes"), col("sqns"))).as("cn"))
      .filter(col("cn") > 0)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        lutSum(col("codes"), col("luts")) / (col("qn") * col("cn")))
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** PQ × IVF — FAISS's `IVF<n>,PQ<m>` with GLOBAL codebooks (no
    * per-list residual encoding — residuals would break the
    * full-probe ≡ flat identity the oracle pins; they are the
    * documented next refinement): full-precision k-means routing,
    * m-byte code payloads, equi-join-on-list_id probe. With
    * `nprobe = numLists` the result is EXACTLY [[pqTopK]] over the
    * zero-norm-filtered corpus — ranking comes purely from the ADC
    * arithmetic, wherever the centroids sit.
    */
  def pqIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                numLists: Int, nprobe: Int, m: Int, ksub: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                kmeansIters: Int = 2): DataFrame = {
    require(nprobe > 0, "need nprobe > 0")
    val index = buildIvfIndex(corpus, numLists, idCol, vecCol, kmeansIters)
    val cbs = pqTrainSeed(corpus, m, ksub, idCol, vecCol)
    val codes = pqEncode(corpus, cbs, idCol, vecCol)
    val lists = assignToLists(corpus, index, idCol, vecCol)
      .select(col(idCol), col("list_id"))
      .join(codes, Seq(idCol))
      .crossJoin(broadcast(pqSqnRow(cbs)))
      .select(col(idCol).as("c_id"), col("list_id"), col("codes"),
        sqrt(lutSum(col("codes"), col("sqns"))).as("cn"))
      .filter(col("cn") > 0)
    val qNorm = queries.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n")).filter(col("__n") > 0)
    val qScored = qNorm.crossJoin(broadcast(index))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
    val probes = graft.ops.Windows.topKPerGroup(qScored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), nprobe, rankCol = "__qr")
      .select(col(idCol), col("list_id"))
      .join(pqQueryLuts(queries, cbs, idCol, vecCol),
        col(idCol) === col("query_id"))
      .select(col("query_id"), col("list_id"), col("qn"), col("luts"))
    val scored = lists.join(probes, Seq("list_id"))
      .filter(col("query_id") =!= col("c_id"))
      .select(col("query_id"), col("c_id").as("neighbor_id"),
        (lutSum(col("codes"), col("luts")) / (col("qn") * col("cn")))
          .as("cos"))
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Lloyd-refine seed codebooks per subspace under squared L2 —
    * FAISS's PQ train step. Empty clusters keep their old entry.
    * TRAINING-ONLY: centroid means average in shuffle order (like
    * [[buildIvfIndex]]'s k-means), so refined codebooks are not
    * bit-stable across runs; quality is pinned by property specs
    * (quantization MSE weakly decreases per iteration), and the
    * oracled queries run the deterministic seed path.
    */
  def pqRefine(corpus: DataFrame, cbs: DataFrame, m: Int, iters: Int,
               vecCol: String = "embedding"): DataFrame = {
    val pts = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .select(explode(transform(sequence(lit(0), lit(m - 1)), j =>
        struct(j.as("j"),
          slice(col("__v"), j * (size(col("__v")) / m) + 1,
            size(col("__v")) / m).as("sub")))).as("p"))
      .select(col("p.j").as("j"), col("p.sub").as("sub"))
    var cur = cbs
    for (_ <- 0 until iters) {
      val assigned = pts.crossJoin(broadcast(cur))
        .withColumn("cbj", element_at(col("cbs"), col("j") + 1))
        .withColumn("code", {
          val dists = transform(col("cbj"), e => sqDist(col("sub"), e))
          (array_position(dists, array_min(dists)) - 1).cast("int")
        })
      val updated = assigned
        .select(col("j"), col("code"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("j", "code", "pos").agg(avg(col("x")).as("mval"))
        .groupBy("j", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mval")))).as("pm"))
        .select(col("j"), col("code"),
          transform(col("pm"), s => s.getField("mval")).as("cent"))
      val oldExpl = cur.select(posexplode(col("cbs")).as(Seq("j", "cb")))
        .select(col("j"), posexplode(col("cb")).as(Seq("code", "cent_old")))
      cur = oldExpl.join(updated, Seq("j", "code"), "left")
        .select(col("j"), col("code"),
          coalesce(col("cent"), col("cent_old")).as("centv"))
        .groupBy("j")
        .agg(array_sort(collect_list(struct(col("code"), col("centv")))).as("pc"))
        .select(col("j"),
          transform(col("pc"), s => s.getField("centv")).as("cbj"))
        .groupBy()
        .agg(array_sort(collect_list(struct(col("j"), col("cbj")))).as("jc"))
        .select(transform(col("jc"), s => s.getField("cbj")).as("cbs"))
        .localCheckpoint()
    }
    cur
  }

  // ---- residual IVF-PQ: FAISS's `IVF<n>,PQ<m>` proper — codes store
  // the RESIDUAL vector v − c(list) instead of v, so the quantizer
  // spends its bits on the within-cluster detail the coarse centroids
  // already removed (the refinement [[pqIvfTopK]] documents). Made
  // oracle-exact by DETERMINISTIC seed routing centroids (the
  // smallest-id corpus vectors, L2 assignment, first-index ties) —
  // [[buildIvfIndex]]'s k-means averages in shuffle order and could
  // not be mirrored; seed routing trades some routing quality for a
  // bit-reproducible end-to-end pipeline (and the PQ step dominates
  // recall). Serving never reconstructs: with per-list tables
  //   qc = q·c(list)                    (computed per probe)
  //   qr = Σ_j qlut[j][code_j]          (the flat-PQ ADC fold)
  //   cr = Σ_j cdot[list][j][code_j]    (centroid·codebook table)
  //   rr = Σ_j sqn[j][code_j]           (codebook self-dot table)
  // cos(q, c + r̂) = (qc + qr) / (qn · sqrt(cc[list] + 2·cr + rr)) —
  // every term a lookup fold, m adds per candidate, 100 TB-shaped
  // (equi-join on probed list ids, broadcast tables).

  /** Deterministic routing centroids: the `numLists` smallest-id
    * corpus vectors, as a SINGLE-ROW frame
    * (cents: array<array<double>>, list → vector).
    */
  def seedCentroids(corpus: DataFrame, numLists: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(numLists > 0, "need numLists > 0")
    corpus.orderBy(col(idCol)).limit(numLists)
      .select(struct(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")).as("s"))
      .groupBy().agg(array_sort(collect_list(col("s"))).as("sv"))
      .select(transform(col("sv"), s => s.getField("v")).as("cents"))
  }

  /** Residual IVF-PQ top-k: seed routing centroids (L2 assignment,
    * ties to the smaller list), residuals PQ-encoded under seed
    * codebooks trained on the first `ksub` residuals, ADC serving via
    * the table identity above. With `nprobe = numLists` the result
    * covers every candidate and the oracle mirrors the whole pipeline
    * (assignment → residual → encode → fold) bit-exactly; partial
    * probe ranks lists by ascending L2 distance to the query
    * (consistent with the assignment metric).
    */
  def pqIvfResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        numLists: Int, nprobe: Int, m: Int, ksub: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(nprobe > 0, "need nprobe > 0")
    val cents = seedCentroids(corpus, numLists, idCol, vecCol)
    // assignment + residual in one narrow pass
    val assigned = corpus.crossJoin(broadcast(cents))
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"),
        col("cents"))
      .withColumn("list_id", {
        val dists = transform(col("cents"), c => sqDist(col("__v"), c))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      })
      .select(col(idCol), col("list_id"),
        zip_with(col("__v"),
          element_at(col("cents"), col("list_id") + 1),
          (x, c) => x - c).as("residual"))
    val cbs = pqTrainSeed(assigned, m, ksub, idCol, "residual")
    val codes = assigned.select(col(idCol), col("list_id"),
        col("residual").as("__r"))
      .crossJoin(broadcast(cbs))
      .select(col(idCol), col("list_id"),
        transform(col("cbs"), (cb, j) => {
          val dsub = size(element_at(cb, 1))
          val sub = slice(col("__r"), j * dsub + 1, dsub)
          val dists = transform(cb, e => sqDist(sub, e))
          (array_position(dists, array_min(dists)) - 1).cast("tinyint")
        }).as("codes"))
    // per-list constant tables, one broadcast row:
    //   cc[list] = c·c;  cdots[list][j][code] = c_sub_j · cb_j[code]
    val tables = cents.crossJoin(broadcast(cbs))
      .select(col("cents"),
        transform(col("cents"), c => dotD(c, c)).as("cc"),
        transform(col("cents"), c =>
          transform(col("cbs"), (cb, j) => {
            val dsub = size(element_at(cb, 1))
            transform(cb, e => dotD(slice(c, j * dsub + 1, dsub), e))
          })).as("cdots"))
    val cands = codes.crossJoin(broadcast(pqSqnRow(cbs)))
      .crossJoin(broadcast(tables.select(col("cc"), col("cdots"))))
      .select(col(idCol).as("c_id"), col("list_id"), col("codes"),
        sqrt(element_at(col("cc"), col("list_id") + 1)
          + lit(2.0) * lutSum(col("codes"),
              element_at(col("cdots"), col("list_id") + 1))
          + lutSum(col("codes"), col("sqns"))).as("cn"))
      .filter(col("cn") > 0)
    // probes: per query, the nprobe lists with the smallest L2
    // distance (ties to the smaller list), carrying qc = q·c per list
    val qSide = queries.crossJoin(broadcast(cents))
      .select(col(idCol).as("query_id"), norm(col(vecCol)).as("qn"),
        col(vecCol).cast("array<double>").as("__q"), col("cents"))
      .filter(col("qn") > 0)
    val probes = qSide
      .select(col("query_id"), col("qn"), col("__q"),
        posexplode(transform(col("cents"), c =>
          struct(sqDist(col("__q"), c).as("d2"),
            dotD(col("__q"), c).as("qc"))))
          .as(Seq("list_id", "dc")))
      .select(col("query_id"), col("qn"), col("__q"), col("list_id"),
        col("dc.d2").as("__d2"), col("dc.qc").as("qc"))
    val probed = graft.ops.Windows.topKPerGroup(probes,
        Seq(col("query_id")),
        Seq(col("__d2").asc, col("list_id").asc), nprobe, rankCol = "__qr")
      .select(col("query_id"), col("qn"), col("__q"), col("list_id"),
        col("qc"))
      .crossJoin(broadcast(cbs))
      .select(col("query_id"), col("qn"), col("list_id"), col("qc"),
        transform(col("cbs"), (cb, j) => {
          val dsub = size(element_at(cb, 1))
          val sub = slice(col("__q"), j * dsub + 1, dsub)
          transform(cb, e => dotD(sub, e))
        }).as("luts"))
    val scored = cands.join(probed, Seq("list_id"))
      .filter(col("query_id") =!= col("c_id"))
      .select(col("query_id"), col("c_id").as("neighbor_id"),
        ((col("qc") + lutSum(col("codes"), col("luts")))
          / (col("qn") * col("cn"))).as("cos"))
    graft.ops.Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ---- persisted PQ index: the uniform lifecycle (codebooks + codes
  // as TxTables; frozen-codebook append, atomic pruned removal, serve)

  /** Train seed codebooks on `corpus` and persist codebooks + codes. */
  def writePqIndex(corpus: DataFrame, root: String, m: Int, ksub: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Long = {
    val spark = corpus.sparkSession
    val cbs = pqTrainSeed(corpus, m, ksub, idCol, vecCol).localCheckpoint()
    graft.ops.TxTable.overwrite(spark, s"$root/cbs", cbs)
    graft.ops.TxTable.overwrite(spark, s"$root/codes",
      idSorted(pqEncode(corpus, cbs, idCol, vecCol), idCol))
  }

  /** Encode ONLY `newVectors` under the stored (frozen) codebooks and
    * append — O(batch), no re-train, one atomic commit (the
    * [[sqAppend]] contract; re-training is the periodic offline
    * [[writePqIndex]]).
    */
  def pqAppend(spark: org.apache.spark.sql.SparkSession, root: String,
               newVectors: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               txn: Option[(String, Long)] = None,
               maintain: Option[graft.ops.TxTable.Maintenance] = None)
      : Long =
    graft.ops.TxTable.withTxn(spark, s"$root/codes", txn) {
      (txnMeta, txnGuard) =>
        val cbs = graft.ops.TxTable.read(spark, s"$root/cbs")
        val v = graft.ops.TxTable.append(spark, s"$root/codes",
          idSorted(pqEncode(newVectors, cbs, idCol, vecCol), idCol),
          meta = txnMeta, guard = txnGuard)
        graft.ops.TxTable.maintainAfterAppend(spark, s"$root/codes",
          Seq(idCol), maintain)
        v
    }

  /** Remove vectors' codes — one atomic manifest-pruned copy-on-write
    * delete (the [[ivfRemove]]/[[sqRemove]] contract: codebooks carry
    * no per-vector state, so the delete alone serves as an index never
    * holding the ids; GDPR-complete after a vacuum). Unknown ids are
    * an exact no-op.
    */
  def pqRemove(spark: org.apache.spark.sql.SparkSession, root: String,
               vecIds: Seq[Any],
               idCol: String = "vec_id"): Option[Long] = {
    require(vecIds.nonEmpty, "pqRemove needs at least one vector id")
    graft.ops.TxTable.delete(spark, s"$root/codes",
      col(idCol).isin(vecIds: _*))
  }

  /** [[pqTopK]] served from the persisted codebooks + codes. */
  def pqTopKFromCodes(spark: org.apache.spark.sql.SparkSession,
                      root: String, queries: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    pqTopK(graft.ops.TxTable.read(spark, s"$root/codes"),
      graft.ops.TxTable.read(spark, s"$root/cbs"), queries, k,
      idCol, vecCol)
}
