package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-distribution drift between two corpus snapshots — the
  * dense-side counterpart of [[graft.text.CorpusDivergence]] (which
  * monitors token distributions): a retraining pipeline needs to know
  * whether "the same corpus, one crawl later" still occupies the same
  * regions of embedding space before it reuses yesterday's IVF
  * centroids, SemDedup clustering, or quality thresholds (north-star
  * extension; the reference has no vector ops, SURVEY.md §2.8).
  *
  * Both snapshots are assigned to ONE shared centroid table (pass the
  * production index's centroids — [[Similarity.buildIvfIndex]]'s
  * output — so the monitor measures drift against the structure the
  * serving system actually uses). Per centroid: each side's member
  * count and mass share, and the absolute share drift; corpus-level,
  * the total-variation distance 0.5 · Σ |share_a − share_b| ∈ [0, 1]
  * (0 = identical cluster occupancy, 1 = disjoint).
  *
  * Scale shape (100 TB-safe): two [[Similarity.assignToLists]] passes
  * (broadcast centroids, one narrow scoring stage + one per-id window
  * each — corpus-linear), then all remaining frames are ≤ numLists
  * rows. Rows come from the CENTROID table left-joined to the masses,
  * so a centroid empty on both sides still reports (0, 0, 0.0) —
  * "nothing moved" and "nothing there" stay distinguishable.
  *
  * Determinism, cross-engine: deliberately transcendental-free, the
  * [[graft.text.CorpusDivergence]] design — every number is an exact
  * long count through one IEEE division (share), one subtraction and
  * one abs (drift), and the corpus-level TV folds the list_id-sorted
  * drift array in one defined order, so the DuckDB oracle reproduces
  * the hash bit-exactly. (A mean-vector cosine shift per centroid is
  * the natural next signal but needs per-dimension double AVERAGES,
  * whose shuffle-order-dependent summation is not bit-stable across
  * engines — the klDivergence precedent: provide it for monitoring,
  * never hash-oracle it. See [[meanShift]].)
  */
object EmbeddingDrift {

  /** One row per centroid:
    * (list_id, n_a, n_b, share_a, share_b, drift, tv) with
    * drift = |share_a − share_b| and tv = 0.5 · Σ drift repeated on
    * every row (the corpus-level verdict riding with its evidence —
    * the single-row broadcast-totals pattern).
    */
  def clusterMass(a: DataFrame, b: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    def mass(df: DataFrame, out: String): DataFrame =
      Similarity.assignToLists(df, centroids, idCol, vecCol)
        .groupBy("list_id").agg(count(lit(1)).as(out))
    val ma = mass(a, "__na")
    val mb = mass(b, "__nb")
    val base = centroids.select(col("list_id"))
      .join(ma, Seq("list_id"), "left")
      .join(mb, Seq("list_id"), "left")
      .select(col("list_id"),
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"))
    // totals as one broadcast row (exact long sums); a side with zero
    // assigned rows yields share 0.0 everywhere, not a NaN corpus
    val totals = base.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    val shares = base.crossJoin(broadcast(totals))
      .select(col("list_id"), col("n_a"), col("n_b"),
        when(col("__ta") > 0,
          col("n_a").cast("double") / col("__ta").cast("double"))
          .otherwise(lit(0.0)).as("share_a"),
        when(col("__tb") > 0,
          col("n_b").cast("double") / col("__tb").cast("double"))
          .otherwise(lit(0.0)).as("share_b"))
      .withColumn("drift", abs(col("share_a") - col("share_b")))
    // corpus-level TV: fold the list_id-sorted drift array in one
    // defined order (the CorpusDivergence pattern), ride it on every
    // row as one broadcast single-row frame
    val tv = shares
      .groupBy()
      .agg((lit(0.5) * aggregate(
        array_sort(collect_list(struct(col("list_id"), col("drift")))),
        lit(0.0), (acc, x) => acc + x.getField("drift"))).as("tv"))
    shares.crossJoin(broadcast(tv))
  }

  /** Per-centroid directional drift: the cosine between the two
    * snapshots' MEAN member vectors (1.0 = the cluster's population
    * points the same way; low = the region's content changed even if
    * its mass did not — the signal [[clusterMass]] cannot see).
    * Monitoring-only by design: per-dimension double averages are
    * shuffle-order-dependent in their last ulps, so this output is
    * spec-tested with tolerances, never hash-oracled (the
    * [[graft.text.CorpusDivergence.klDivergence]] precedent).
    * Centroids empty on either side report a null shift.
    *
    * Shape: one (list_id, pos)-keyed aggregation per side over the
    * assigned rows (the [[Similarity]] Lloyd-step mean), then a
    * numLists-row join — corpus-linear, two shuffles.
    */
  def meanShift(a: DataFrame, b: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    def means(df: DataFrame, out: String): DataFrame =
      Similarity.assignToLists(df, centroids, idCol, vecCol)
        .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list_id"),
          transform(col("pm"), s => s.getField("m")).as(out))
    val ma = means(a, "__va")
    val mb = means(b, "__vb")
    centroids.select(col("list_id"))
      .join(ma, Seq("list_id"), "left")
      .join(mb, Seq("list_id"), "left")
      .select(col("list_id"),
        when(col("__va").isNotNull && col("__vb").isNotNull &&
            Similarity.norm(col("__va")) > 0 &&
            Similarity.norm(col("__vb")) > 0,
          Similarity.dotHof(col("__va"), col("__vb")) /
            (sqrt(Similarity.dotHof(col("__va"), col("__va"))) *
             sqrt(Similarity.dotHof(col("__vb"), col("__vb")))))
          .as("mean_cos"))
  }
}
