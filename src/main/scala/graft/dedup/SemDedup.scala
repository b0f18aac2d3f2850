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
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val withNorm = corpus.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__n"))
    val scored = withNorm.filter(col("__n") > 0)
      .crossJoin(broadcast(centroids))
      .withColumn("__cs",
        dot(col(vecCol), col("centroid")) / (col("__n") * col("cent_n")))
    graft.ops.Windows.topKPerGroup(scored, Seq(col(idCol)),
        Seq(col("__cs").desc, col("list_id").asc), 1, rankCol = "__sr")
      .select(col(idCol), col(vecCol), col("__n"), col("list_id"))
  }

  /** Within-cluster near-duplicate pairs (id_a < id_b, cos >=
    * threshold). One equi-join on list_id; norms precomputed once per
    * row, so per-pair work is a single codegen'd dot product.
    */
  def semDedupPairs(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val assigned = assignClusters(corpus, centroids, idCol, vecCol)
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
               vecCol: String = "embedding"): DataFrame = {
    val dropped = semDedupPairs(corpus, centroids, threshold, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }
}
