package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity

case class PqVec(vec_id: Long, embedding: Array[Float])

/** Product quantization (PQ / IVF-PQ): deterministic seed codebooks,
  * argmin encode with first-index tie-break, exact seed reconstruction,
  * ADC recall floor vs brute force, full-probe IVF-PQ ≡ flat PQ, the
  * persisted lifecycle (frozen-codebook append, pruned removal), and
  * Lloyd refinement's weakly-decreasing quantization MSE.
  */
class PqAnnSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Long): Seq[PqVec] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => PqVec(i.toLong,
      Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  /** Mean squared reconstruction error of `corpus` under `cbs`. */
  private def mse(corpus: org.apache.spark.sql.DataFrame,
                  cbs: org.apache.spark.sql.DataFrame): Double =
    Similarity.pqEncode(corpus, cbs)
      .join(corpus, "vec_id").crossJoin(broadcast(cbs))
      .select(Similarity.pqDequantize(col("codes"), col("cbs")).as("dv"),
        col("embedding").cast("array<double>").as("v"))
      .select(aggregate(zip_with(col("v"), col("dv"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, d) => a + d).as("se"))
      .agg(avg("se")).head().getDouble(0)

  test("pqTrainSeed fails loudly when the embedding dim is not a multiple of m") {
    // dim 8, m 3: dsub would silently truncate to 2 and the trailing
    // 2 dims would vanish from train/encode/serve — must raise instead
    val corpus = df(vecs(10, 8, seed = 7))
    val ex = intercept[Exception] {
      Similarity.pqTrainSeed(corpus, m = 3, ksub = 4).collect()
    }
    assert(ex.getMessage.contains("not a multiple of m=3"),
      s"got: ${ex.getMessage}")
    // and the divisible case still trains
    assert(Similarity.pqTrainSeed(corpus, m = 4, ksub = 4).count() === 1L)
  }

  test("a seed vector encodes to its own codebook entries and reconstructs exactly") {
    val corpus = df(vecs(30, 8, seed = 5))
    val cbs = Similarity.pqTrainSeed(corpus, m = 2, ksub = 4)
    val codes = Similarity.pqEncode(corpus.filter(col("vec_id") < 4), cbs)
    // seeds are ids 0..3 in id order: vector i's subvectors ARE entry i
    val own = codes.select(col("vec_id"),
      element_at(col("codes"), 1).cast("int").as("c0"),
      element_at(col("codes"), 2).cast("int").as("c1"))
      .collect()
    own.foreach { r =>
      assert(r.getInt(1) === r.getLong(0).toInt)
      assert(r.getInt(2) === r.getLong(0).toInt)
    }
    // reconstruction of a seed is the seed itself, bit-exactly
    val rec = codes.crossJoin(broadcast(cbs))
      .join(corpus, "vec_id")
      .select(col("vec_id"),
        Similarity.pqDequantize(col("codes"), col("cbs")).as("dv"),
        col("embedding").cast("array<double>").as("v"))
      .filter(expr("dv <> v")).count()
    assert(rec === 0L)
  }

  test("encode tie-break: identical codebook entries resolve to the smallest code") {
    // two identical seeds (ids 0, 1 share the vector) → every vector
    // equidistant to both entries must take code 0, never 1
    val corpus = df(Seq(
      PqVec(0L, Array(1f, 2f)), PqVec(1L, Array(1f, 2f)),
      PqVec(2L, Array(1.4f, 2.2f)), PqVec(3L, Array(9f, -3f))))
    val cbs = Similarity.pqTrainSeed(corpus, m = 1, ksub = 2)
    val codes = Similarity.pqEncode(corpus, cbs)
      .select(element_at(col("codes"), 1).cast("int").as("c"))
      .collect().map(_.getInt(0))
    assert(codes.forall(_ === 0))
  }

  test("recall@5 vs brute force is high on gaussian data") {
    val corpus = df(vecs(200, 16, seed = 7))
    val queries = corpus.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id")
    val cbs = Similarity.pqTrainSeed(corpus, m = 4, ksub = 32)
    val codes = Similarity.pqEncode(corpus, cbs)
    val approx = Similarity.pqTopK(codes, cbs, queries, k = 5)
      .select("query_id", "neighbor_id")
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(hits >= 25, s"recall@5 = $hits/50")
  }

  test("Lloyd refinement weakly decreases quantization MSE per iteration") {
    val corpus = df(vecs(150, 8, seed = 13))
    val seed = Similarity.pqTrainSeed(corpus, m = 2, ksub = 8)
    val m0 = mse(corpus, seed)
    val r1 = Similarity.pqRefine(corpus, seed, m = 2, iters = 1)
    val m1 = mse(corpus, r1)
    val r2 = Similarity.pqRefine(corpus, r1, m = 2, iters = 1)
    val m2 = mse(corpus, r2)
    assert(m1 <= m0 + 1e-9, s"iter 1 raised MSE: $m0 -> $m1")
    assert(m2 <= m1 + 1e-9, s"iter 2 raised MSE: $m1 -> $m2")
    // refinement genuinely moves: codebooks differ from the seeds
    assert(r1.collect().toSeq !== seed.collect().toSeq)
  }

  test("PQ x IVF at full probe equals flat PQ exactly; low probe keeps recall") {
    val corpus = df(vecs(150, 12, seed = 11))
    val queries = corpus.filter(col("vec_id") < 8)
    val cbs = Similarity.pqTrainSeed(corpus, m = 3, ksub = 16)
    val codes = Similarity.pqEncode(corpus, cbs)
    val flat = Similarity.pqTopK(codes, cbs, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val full = Similarity.pqIvfTopK(corpus, queries, k = 5,
        numLists = 6, nprobe = 6, m = 3, ksub = 16)
      .orderBy("query_id", "rank").collect().toSeq
    assert(full === flat)
    val low = Similarity.pqIvfTopK(corpus, queries, k = 5,
        numLists = 6, nprobe = 3, m = 3, ksub = 16)
      .select("query_id", "neighbor_id")
    val hits = low.join(
      Similarity.pqTopK(codes, cbs, queries, k = 5)
        .select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 24, s"recall@5 at nprobe=3/6 = $hits/40")
  }

  test("pqAppend txn token: a replayed batch commits nothing") {
    val r = new scala.util.Random(63)
    val a = (0L until 20L).map(i => PqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    val b = (20L until 30L).map(i => PqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    val root = java.nio.file.Files.createTempDirectory("graft_pqtx")
      .toString + "/pq"
    Similarity.writePqIndex(df(a), root, m = 2, ksub = 8)
    Similarity.pqAppend(spark, root, df(b), txn = Some(("pq_m", 0L)))
    val v = graft.ops.TxTable.versions(spark, root + "/codes").last
    Similarity.pqAppend(spark, root, df(b), txn = Some(("pq_m", 0L)))
    assert(graft.ops.TxTable.versions(spark, root + "/codes").last === v,
      "checkpoint replay must be a no-op")
    assert(graft.ops.TxTable.read(spark, root + "/codes").count() === 30L)
  }

  test("persisted PQ index: frozen-codebook append + removal serve ≡ in-memory") {
    val r = new scala.util.Random(61)
    val a = (0L until 40L).map(i => PqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    val b = (40L until 60L).map(i => PqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat * 5f)))
    val root = java.nio.file.Files.createTempDirectory("graft_pq")
      .toString + "/pq"
    Similarity.writePqIndex(df(a), root, m = 2, ksub = 8)
    Similarity.pqAppend(spark, root, df(b))
    assert(Similarity.pqRemove(spark, root, Seq(10L, 50L)).isDefined)
    val queries = df(a).filter(col("vec_id") < 3)
    val served = Similarity.pqTopKFromCodes(spark, root, queries, 5)
      .collect().map(_.toSeq).toSet
    // the in-memory equivalent under the SAME frozen codebooks: seeds
    // from A only, union-minus-victims encoded under them
    val cbs = Similarity.pqTrainSeed(df(a), m = 2, ksub = 8)
    val codes = Similarity.pqEncode(
      df(a ++ b).filter(!col("vec_id").isin(10L, 50L)), cbs)
    val direct = Similarity.pqTopK(codes, cbs, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(served === direct)
    // the stored codes are m = 2 tinyints per vector — the 16x
    // compression at dim 8 the operator exists for
    val codesField = graft.ops.TxTable.read(spark, s"$root/codes")
      .schema("codes").dataType
    assert(codesField.simpleString.startsWith("array<tinyint>"))
    // removal leaves no trace: the victims never appear as neighbors
    assert(!served.flatten.map(_.toString).exists(s => s == "10" || s == "50"))
    // unknown ids: exact no-op
    val vs = graft.ops.TxTable.versions(spark, s"$root/codes").size
    assert(Similarity.pqRemove(spark, root, Seq(999L)).isEmpty)
    assert(graft.ops.TxTable.versions(spark, s"$root/codes").size === vs)
  }

  test("residual IVF-PQ: table-driven score equals explicit reconstruction") {
    val corpus = df(vecs(60, 8, seed = 23))
    val queries = corpus.filter(col("vec_id") < 4)
    val out = Similarity.pqIvfResidualTopK(corpus, queries, k = 5,
        numLists = 4, nprobe = 4, m = 2, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    // explicit reconstruction reference: assign, residual-encode, then
    // cos(q, c + dequantized residual) computed directly on the driver
    val cents = Similarity.seedCentroids(corpus, 4)
      .head().getSeq[scala.collection.Seq[Double]](0)
      .map(_.toArray).toIndexedSeq
    val rows = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Array[Double]): Int =
      cents.zipWithIndex.minBy { case (c, i) => (sq(v, c), i) }._2
    val residuals = rows.map { case (id, v) =>
      id -> v.zip(cents(assign(v))).map { case (x, c) => x - c } }
    val seeds = residuals.toSeq.sortBy(_._1).take(8).map(_._2)
    def code(r: Array[Double]): Seq[Int] = (0 until 2).map { j =>
      val sub = r.slice(j * 4, j * 4 + 4)
      seeds.zipWithIndex.minBy { case (s, i) =>
        (sq(sub, s.slice(j * 4, j * 4 + 4)), i) }._2
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    out.foreach { case ((q, n), got) =>
      val rec = cents(assign(rows(n))).clone()
      val cds = code(residuals(n))
      (0 until 2).foreach { j =>
        val s = seeds(cds(j))
        (0 until 4).foreach(i => rec(j * 4 + i) += s(j * 4 + i))
      }
      val want = dot(rows(q), rec) /
        (math.sqrt(dot(rows(q), rows(q))) * math.sqrt(dot(rec, rec)))
      assert(math.abs(got - want) < 1e-9,
        s"($q,$n): table-driven $got vs reconstructed $want")
    }
  }

  test("residual IVF-PQ: recall floor at full probe, partial probe keeps most") {
    val corpus = df(vecs(200, 16, seed = 29))
    val queries = corpus.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id")
    val full = Similarity.pqIvfResidualTopK(corpus, queries, k = 5,
        numLists = 8, nprobe = 8, m = 4, ksub = 32)
      .select("query_id", "neighbor_id")
    // iid gaussian is PQ's worst case (residuals as wide as the data,
    // arbitrary seed centroids) — the floor pins "clearly better than
    // the ~1.6/40 random-top-5 baseline", not production recall
    val hits = full.join(truth, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(hits >= 10, s"full-probe recall@5 = $hits/40")
    val low = Similarity.pqIvfResidualTopK(corpus, queries, k = 5,
        numLists = 8, nprobe = 4, m = 4, ksub = 32)
      .select("query_id", "neighbor_id")
    val kept = low.join(full, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(kept >= 16, s"nprobe 4/8 kept $kept/40 of full-probe results")
  }

  test("zero-norm queries are excluded; zero-norm reconstructions never score") {
    val corpus = df(vecs(20, 4, seed = 3) :+
      PqVec(99L, Array(0f, 0f, 0f, 0f)))
    val cbs = Similarity.pqTrainSeed(corpus, m = 2, ksub = 4)
    val codes = Similarity.pqEncode(corpus, cbs)
    val out = Similarity.pqTopK(codes, cbs,
      corpus.filter(col("vec_id") < 2 || col("vec_id") === 99L), k = 3)
    assert(out.select("query_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L))
  }
}
