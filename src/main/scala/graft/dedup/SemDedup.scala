package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ann.Similarity.{dot, norm}

/** SemDeDup (Abbas et al. 2023): semantic deduplication of an
  * embedded corpus by clustering first and comparing cosines only
  * WITHIN a cluster — the cluster bound is what makes embedding-level
  * dedup tractable at 100 TB: all-pairs work is O(sum of cluster
  * sizes squared), not O(corpus squared), and each cluster's pair
  * join is an ordinary equi-join on the cluster id.
  *
  * The centroid table is caller-supplied: pass
  * [[graft.ann.Similarity.buildIvfIndex]]'s k-means lists for the
  * real pipeline (fit once, persist, reuse), or any deterministic
  * seed rule (e.g. the k lowest-id embeddings) where external
  * reproducibility matters — the harness oracle does exactly that.
  *
  * Dedup rule: a row is dropped iff SOME same-cluster row with a
  * smaller id is cosine-similar at >= `threshold` (pairwise, not
  * transitive closure — SemDeDup's keep-one-per-pair semantics; use
  * [[Dedup.connectedComponents]] + [[Dedup.keepCanonical]] on the
  * pair output when cluster-wide transitive grouping is wanted).
  * Zero-norm embeddings never match anything and always survive.
  */
object SemDedup {

  /** Nearest-centroid assignment by cosine (ties → lowest list_id).
    * `centroids` = (list_id, centroid, cent_n) as built by
    * [[graft.ann.Similarity.buildIvfIndex]]; it is broadcast — the
    * model side stays small by construction.
    *
    * Delegates to [[graft.ann.Similarity.assignToLists]] — ONE
    * implementation of the nearest-centroid election, so a tie-break
    * or zero-norm fix there can never leave SemDedup assigning
    * differently from the IVF index callers are told to build with.
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    graft.ann.Similarity.assignToLists(corpus, centroids, idCol, vecCol)
      .withColumnRenamed("nrm", "__n")

  /** Within-cluster near-duplicate pairs (id_a < id_b, cos >=
    * threshold). One equi-join on list_id; norms precomputed once per
    * row, so per-pair work is a single codegen'd dot product.
    *
    * GUARDED like [[Dedup.cosineDupPairs]]'s row ceiling: the join's
    * work is Σ cluster_size², so ONE oversize cluster — a centroid
    * count too small for the corpus, or a degenerate corpus where one
    * centroid attracts everything — silently goes quadratic at 100 TB.
    * `maxClusterRows` (default 1M ≈ 5·10¹¹ candidate pairs in one
    * cluster, already days of compute) probes the assignment's cluster
    * histogram first — an O(n) aggregate over two pruned columns vs
    * the Σsize² join it protects — and refuses loudly, naming the
    * oversize clusters and the fix (centroid count ∝ corpus size:
    * `buildIvfIndex(corpus, numLists = rows / targetClusterSize)`).
    * Pass `maxClusterRows <= 0` to skip the probe when cluster sizes
    * are already known-bounded (e.g. a freshly validated index).
    */
  def semDedupPairs(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxClusterRows: Long = 1000000L): DataFrame = {
    val assigned = assignClusters(corpus, centroids, idCol, vecCol)
    if (maxClusterRows > 0) {
      val oversize = assigned.groupBy(col("list_id"))
        .agg(count(lit(1)).as("__sz"))
        .filter(col("__sz") > maxClusterRows)
        .limit(3).collect()
      require(oversize.isEmpty,
        s"semDedupPairs: cluster(s) over $maxClusterRows rows " +
          oversize.map(r => s"list_id=${r.get(0)} rows=${r.get(1)}")
            .mkString("[", ", ", "]") +
          " — the within-cluster pair join is quadratic in cluster " +
          "size. Build the centroid table with a corpus-proportional " +
          "count (buildIvfIndex(corpus, numLists = rows / " +
          "targetClusterSize)), or raise/disable maxClusterRows if " +
          "you really mean it")
    }
    val a = assigned.select(col("list_id"), col(idCol).as("id_a"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = assigned.select(col("list_id"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("list_id"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Survivors: rows with no smaller-id near-duplicate in their
    * cluster (left-anti join of the corpus against the pairs' id_b
    * side). Keeps every zero-norm and every cluster-canonical row.
    */
  def semDedup(corpus: DataFrame, centroids: DataFrame, threshold: Double,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               maxClusterRows: Long = 1000000L): DataFrame = {
    val dropped = semDedupPairs(corpus, centroids, threshold, idCol, vecCol,
        maxClusterRows)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }
}
