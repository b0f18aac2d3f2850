package graft

import graft.ops.Profile

case class ProfRow(id: java.lang.Long, name: String)

/** One-pass profiling: exact stats on a hand-built frame (nulls,
  * distincts, ranges), approx mode sanity, and input validation.
  */
class ProfileSpec extends SparkSpec {

  private lazy val data = df(Seq(
    ProfRow(1L, "b"), ProfRow(2L, "a"), ProfRow(2L, null),
    ProfRow(null, "a"), ProfRow(9L, "c")))

  test("exact profile: counts, nulls, distincts, string-rendered ranges") {
    val got = Profile.profile(data, Seq("id", "name"), approxDistinct = false)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6))).toMap
    assert(got("id") === ((5L, 1L, 4L, 3L, "1", "9")))
    assert(got("name") === ((5L, 1L, 4L, 3L, "a", "c")))
  }

  test("approx mode agrees on everything but uses HLL cardinalities") {
    val got = Profile.profile(data, Seq("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got === ((5L, 1L, 4L)))
    // HLL error at cardinality 3 is zero in practice, but only pin a band
    val d = Profile.profile(data, Seq("id")).collect().head.getLong(4)
    assert(d >= 2L && d <= 4L)
  }

  test("HLL error envelope: estimates within 4×rsd of exact at real cardinality") {
    import org.apache.spark.sql.functions._
    // 20k distinct ids + a 997-valued column + a 3-valued column — the
    // dense-register, linear-counting, and trivially-exact HLL regimes
    val big = spark.range(20000).select(col("id"),
      (col("id") % 997).as("mid"), (col("id") % 3).as("small"))
    val checked = Profile.profileChecked(big, Seq("id", "mid", "small"))
      .collect()
    assert(checked.length === 3)
    assert(checked.forall(_.getAs[Boolean]("hll_ok")),
      "an HLL estimate fell outside ±20% of exact")
  }

  test("approx stats plan is Expand-free; exact plan pays the Expand") {
    def hasExpand(p: org.apache.spark.sql.DataFrame) =
      p.queryExecution.executedPlan.toString.contains("Expand")
    assert(!hasExpand(Profile.statsPlan(data, Seq("id", "name"),
      approxDistinct = true)))
    assert(hasExpand(Profile.statsPlan(data, Seq("id", "name"),
      approxDistinct = false)))
  }

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      Profile.profile(data, Seq("id", "nope"))
    }
  }
}
