package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.SemDedup

/** SemDeDup: within-cluster pairwise dedup over embeddings — planted
  * duplicates die, cluster-canonical and zero-norm rows survive, and
  * near-duplicates split across clusters are (by design) not compared.
  */
class SemDedupSpec extends SparkSpec {

  private def vecs(rows: (Long, Array[Float])*) =
    df(rows.toSeq).toDF("vec_id", "embedding")

  private lazy val corpus = vecs(
    1L -> Array(1f, 0f, 0f, 0f),        // cluster A canonical
    2L -> Array(0.99f, 0.1f, 0f, 0f),   // near-dup of 1 (same cluster)
    3L -> Array(0f, 1f, 0f, 0f),        // cluster B canonical
    4L -> Array(0f, 0.9f, 0.1f, 0f),    // near-dup of 3 (same cluster)
    5L -> Array(0.6f, 0f, 0.8f, 0f),    // cluster A, dissimilar
    6L -> Array(0f, 0f, 0f, 0f))        // zero norm

  private lazy val cents = vecs(
    0L -> Array(1f, 0f, 0f, 0f),
    1L -> Array(0f, 1f, 0f, 0f))
    .select(col("vec_id").as("list_id"),
      col("embedding").cast("array<double>").as("centroid"))
    .withColumn("cent_n", Similarity.norm(col("centroid")))

  test("planted within-cluster dups die; canonicals, dissimilar, zero-norm survive") {
    val got = SemDedup.semDedup(corpus, cents, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 5L, 6L))
  }

  test("pairs report the cluster, ordered ids, and the cosine") {
    val pairs = SemDedup.semDedupPairs(corpus, cents, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((0L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("near-dups split across clusters are not compared (the SemDeDup trade)") {
    // two near-identical vectors pulled to different centroids by tiny
    // components: each is its cluster's only member, so both survive
    val split = vecs(
      7L -> Array(0.71f, 0.7f, 0f, 0f),
      8L -> Array(0.7f, 0.71f, 0f, 0f))
    val got = SemDedup.semDedup(split, cents, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(7L, 8L))
  }

  test("an oversize cluster refuses loudly; the probe can be disabled") {
    // cluster A holds ids 1, 2, 5 (3 rows) — a 2-row ceiling must trip
    // and NAME the offender before any pair work runs
    val e = intercept[IllegalArgumentException] {
      SemDedup.semDedupPairs(corpus, cents, threshold = 0.9,
        maxClusterRows = 2)
    }
    assert(e.getMessage.contains("quadratic") &&
      e.getMessage.contains("list_id=0"))
    // maxClusterRows <= 0 skips the probe: identical pair output
    val pairs = SemDedup.semDedupPairs(corpus, cents, threshold = 0.9,
        maxClusterRows = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((0L, 1L, 2L), (1L, 3L, 4L)))
  }

  test("fixed-k and corpus-proportional-k centroids find the SAME planted dups") {
    // the scale posture (centroid count ∝ corpus size) must be a pure
    // performance knob: exact duplicates score identically against
    // EVERY centroid (ties → lowest list_id), so they co-cluster under
    // any centroid table and the pair set is invariant to k
    val rnd = new scala.util.Random(42)
    val base = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val planted = Seq(0, 7, 21, 33, 49)
    val dups = planted.map(i => ((100 + i).toLong, base(i)._2))
    val corpus2 = df(base ++ dups).toDF("vec_id", "embedding")
    val expected = planted.map(i => (i.toLong, (100 + i).toLong)).toSet
    def pairsWith(c: org.apache.spark.sql.DataFrame) =
      SemDedup.semDedupPairs(corpus2, c, threshold = 0.999)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixedK = corpus2.filter(col("vec_id") < 4)
      .select(col("vec_id").as("list_id"),
        col("embedding").cast("array<double>").as("centroid"))
      .withColumn("cent_n", Similarity.norm(col("centroid")))
    val scaledK = Similarity.buildIvfIndex(corpus2, numLists = 11)
    assert(pairsWith(fixedK) === expected)
    assert(pairsWith(scaledK) === expected)
  }

  test("semDedupServed from a persisted model equals semDedup, zero-norm included") {
    val root = java.nio.file.Files.createTempDirectory("graft_semsrv")
      .toString + "/model"
    SemDedup.writeModel(corpus, cents, root)
    val served = SemDedup.semDedupServed(spark, root, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    val direct = SemDedup.semDedup(corpus, cents, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(served === direct)
    assert(served.contains(6L), "the zero-norm row must survive the serve")
    // the threshold is a serve-time knob: ONE persisted assignment
    // answers a looser threshold too (5 is cos ~0.6 to 1 in cluster A)
    val loose = SemDedup.semDedupServed(spark, root, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(loose === SemDedup.semDedup(corpus, cents, threshold = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet)
    assert(loose.subsetOf(served))
    // the oversize-cluster guard holds on the serve path too
    val e = intercept[IllegalArgumentException] {
      SemDedup.semDedupServed(spark, root, threshold = 0.9,
        maxClusterRows = 2).collect()
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("appendToModel ingests a batch; serve equals a from-scratch model") {
    val root = java.nio.file.Files.createTempDirectory("graft_semapp")
      .toString + "/model"
    SemDedup.writeModel(corpus.filter(col("vec_id") <= 3), cents, root)
    SemDedup.appendToModel(spark, root, corpus.filter(col("vec_id") > 3))
    val fresh = java.nio.file.Files.createTempDirectory("graft_semfrs")
      .toString + "/model"
    SemDedup.writeModel(corpus, cents, fresh)
    // stored assignments identical (same fixed centroids route both)
    def rows(r: String) = graft.ops.TxTable
      .read(spark, s"$r/assignments")
      .select(col("vec_id"), col("list_id")).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSet
    assert(rows(root) === rows(fresh))
    assert(SemDedup.semDedupServed(spark, root, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet ===
      SemDedup.semDedupServed(spark, fresh, threshold = 0.9)
        .collect().map(_.getLong(0)).toSet)
  }

  test("appendToModel replay with the txn token is a no-op; without it rows double") {
    // the checkpoint-replay window a foreachBatch maintainer lives in:
    // the batch committed but the stream's commit marker was lost, so
    // the restarted query re-delivers it. With txn=(app, batchId) the
    // replay returns the unchanged head version and the assignments
    // stay clean — a double-appended row would serve as its own
    // duplicate, self-defeating for a dedup model.
    val root = java.nio.file.Files.createTempDirectory("graft_semtxn")
      .toString + "/model"
    SemDedup.writeModel(corpus.filter(col("vec_id") <= 3), cents, root)
    val batch = corpus.filter(col("vec_id") > 3)
    val v1 = SemDedup.appendToModel(spark, root, batch,
      txn = Some(("semapp", 0L)))
    val v2 = SemDedup.appendToModel(spark, root, batch,
      txn = Some(("semapp", 0L)))
    assert(v2 === v1, "replayed batch must not commit")
    val asg = s"$root/assignments"
    assert(graft.ops.TxTable.read(spark, asg).count() === corpus.count())
    // a NEW batch id still lands (the token tracks progress, not a lock)
    SemDedup.appendToModel(spark, root,
      corpus.filter(col("vec_id") === 1).withColumn("vec_id", lit(99L)),
      txn = Some(("semapp", 1L)))
    assert(graft.ops.TxTable.read(spark, asg).count() === corpus.count() + 1)
    assert(graft.ops.TxTable.lastTxnVersion(spark, asg, "semapp")
      === Some(1L))
  }

  test("removeFromModel serves as if the rows never entered; one commit; no-op unknowns") {
    val root = java.nio.file.Files.createTempDirectory("graft_semrm")
      .toString + "/model"
    SemDedup.writeModel(corpus, cents, root)
    val before = graft.ops.TxTable.versions(spark,
      s"$root/assignments").size
    // remove the cluster-A near-dup (2) and the zero-norm row (6):
    // both assignment shapes (listed and null-list) must delete
    assert(SemDedup.removeFromModel(spark, root, Seq(2L, 6L)).isDefined)
    assert(graft.ops.TxTable.versions(spark, s"$root/assignments").size
      === before + 1, "removal is exactly one commit")
    val never = java.nio.file.Files.createTempDirectory("graft_semnv")
      .toString + "/model"
    SemDedup.writeModel(corpus.filter(!col("vec_id").isin(2L, 6L)),
      cents, never)
    def serve(r: String) = SemDedup.semDedupServed(spark, r, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(serve(root) === serve(never))
    assert(!serve(root).contains(2L) && !serve(root).contains(6L))
    // unknown ids: exact no-op, no commit
    val vs = graft.ops.TxTable.versions(spark, s"$root/assignments").size
    assert(SemDedup.removeFromModel(spark, root, Seq(999L)).isEmpty)
    assert(graft.ops.TxTable.versions(spark, s"$root/assignments").size
      === vs)
    // purged rows re-enter via appendToModel; serve sees them again
    SemDedup.appendToModel(spark, root,
      corpus.filter(col("vec_id").isin(2L, 6L)))
    assert(serve(root) === SemDedup.semDedup(corpus, cents, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("one centroid = plain pairwise dedup over the whole corpus") {
    val one = cents.filter(col("list_id") === 0L)
    val got = SemDedup.semDedup(corpus, one, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // brute reference: drop x iff exists y<x with cos >= 0.9 (any cluster)
    val rows = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val (na, nb) = (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum),
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      if (na == 0 || nb == 0) -2.0 else d / (na * nb)
    }
    val expect = rows.keySet.filter(x =>
      !rows.keySet.exists(y => y < x && cos(rows(y), rows(x)) >= 0.9))
    assert(got === expect)
  }
}
