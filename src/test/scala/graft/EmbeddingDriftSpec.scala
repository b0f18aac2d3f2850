package graft

import org.apache.spark.sql.functions._

import graft.ann.{EmbeddingDrift, Similarity}

/** Embedding-distribution drift: exact shares/TV on a hand fixture,
  * zero on identical snapshots, mass-blind direction changes caught by
  * meanShift, empty clusters reported (not dropped).
  */
class EmbeddingDriftSpec extends SparkSpec {

  private def vecs(rows: (Long, Array[Float])*) =
    df(rows.toSeq).toDF("vec_id", "embedding")

  private lazy val cents = vecs(
    0L -> Array(1f, 0f, 0f, 0f),
    1L -> Array(0f, 1f, 0f, 0f),
    2L -> Array(0f, 0f, 1f, 0f)) // attracts nobody in the fixtures
    .select(col("vec_id").as("list_id"),
      col("embedding").cast("array<double>").as("centroid"))
    .withColumn("cent_n", Similarity.norm(col("centroid")))

  private def near(axis: Int, wobble: Float): Array[Float] = {
    val v = Array(0.05f * wobble, 0.05f * wobble, 0f, 0.1f)
    v(axis) = 1f
    v
  }

  test("hand fixture: shares, drift and TV exactly as computed by hand") {
    // snapshot A: 3 docs in cluster 0, 1 in cluster 1; B: the reverse
    val a = vecs(10L -> near(0, 1), 11L -> near(0, 2), 12L -> near(0, 3),
      13L -> near(1, 1))
    val b = vecs(20L -> near(0, 1), 21L -> near(1, 1), 22L -> near(1, 2),
      23L -> near(1, 3))
    val out = EmbeddingDrift.clusterMass(a, b, cents)
      .orderBy("list_id").collect()
    assert(out.length === 3, "one row per centroid, empty ones included")
    val r0 = out(0)
    assert((r0.getLong(1), r0.getLong(2)) === ((3L, 1L)))
    assert(r0.getDouble(3) === 0.75 && r0.getDouble(4) === 0.25)
    assert(r0.getDouble(5) === 0.5)
    val r2 = out(2)
    assert((r2.getLong(1), r2.getLong(2)) === ((0L, 0L)))
    assert(r2.getDouble(5) === 0.0, "empty-on-both-sides cluster: drift 0")
    // tv = 0.5 * (0.5 + 0.5 + 0) = 0.5, repeated on every row
    assert(out.forall(_.getDouble(6) === 0.5))
  }

  test("identical snapshots: zero drift, zero TV, mean_cos 1.0") {
    val a = vecs(10L -> near(0, 1), 11L -> near(0, 2), 13L -> near(1, 1))
    val mass = EmbeddingDrift.clusterMass(a, a, cents).collect()
    assert(mass.forall(r => r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0))
    val shift = EmbeddingDrift.meanShift(a, a, cents)
      .orderBy("list_id").collect()
    assert(math.abs(shift(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(shift(1).getDouble(1) - 1.0) < 1e-12)
    assert(shift(2).isNullAt(1), "empty cluster reports a null shift")
  }

  test("meanShift catches a direction change clusterMass cannot see") {
    // same MASS per cluster in both snapshots, but cluster 0's members
    // rotate within the cluster (still nearest to centroid 0): TV says
    // nothing moved, mean_cos says the population turned
    val a = vecs(10L -> Array(1f, 0.3f, 0f, 0f), 11L -> Array(1f, 0.3f, 0f, 0f))
    val b = vecs(20L -> Array(1f, -0.3f, 0f, 0f), 21L -> Array(1f, -0.3f, 0f, 0f))
    val mass = EmbeddingDrift.clusterMass(a, b, cents).collect()
    assert(mass.forall(_.getDouble(6) === 0.0), "mass is blind to rotation")
    val shift = EmbeddingDrift.meanShift(a, b, cents)
      .orderBy("list_id").collect()
    val cos0 = shift(0).getDouble(1)
    // cos between (1, .3, 0, 0) and (1, -.3, 0, 0) = .91/1.09 (up to
    // float32 literal representation: .3f != .3 exactly)
    assert(math.abs(cos0 - 0.91 / 1.09) < 1e-6,
      s"expected the rotated-population cosine, got $cos0")
  }

  test("a side with no assignable rows reports share 0.0, never NaN") {
    val a = vecs(10L -> near(0, 1))
    val zero = vecs(30L -> Array(0f, 0f, 0f, 0f)) // norm 0: never assigned
    val out = EmbeddingDrift.clusterMass(a, zero, cents)
      .orderBy("list_id").collect()
    assert(out(0).getDouble(3) === 1.0 && out(0).getDouble(4) === 0.0)
    assert(out.forall(r => !r.getDouble(4).isNaN))
    assert(out.forall(_.getDouble(6) === 0.5), "tv = 0.5 * (1 + 0 + 0)")
  }
}
