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

  test("histogram: data-bounded bins, empty bins present, hi lands in last bin") {
    import org.apache.spark.sql.functions._
    // values 0..10 skipping 5-7: lo=0 hi=10, 5 bins of width 2
    val v = spark.range(11).toDF().filter(!col("id").isin(5L, 6L, 7L))
    val h = Profile.histogram(v, "id", 5).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(h.keySet === Set(0, 1, 2, 3, 4), "always exactly bins rows")
    assert(h(0) === ((0.0, 2.0, 2L)))  // 0,1
    assert(h(1) === ((2.0, 4.0, 2L)))  // 2,3
    assert(h(2) === ((4.0, 6.0, 1L)))  // 4 (5,6 filtered out)
    assert(h(3) === ((6.0, 8.0, 0L)), "empty bin materialized with cnt=0")
    assert(h(4) === ((8.0, 10.0, 3L)), "hi value 10 closed into the last bin")
  }

  test("histogram with explicit bounds excludes out-of-range rows and nulls") {
    val v = df(Seq(ProfRow(1L, "a"), ProfRow(5L, "b"), ProfRow(9L, "c"),
      ProfRow(50L, "over"), ProfRow(null, "null")))
    val h = Profile.histogram(v, "id", 2, bounds = Some((0.0, 10.0)))
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    // width 5: 1 → bin 0; 5 sits ON the boundary → bin 1; 9 → bin 1
    assert(h === Map(0 -> 1L, 1 -> 2L), "50 and null contribute nowhere")
  }

  test("histogram degenerate single-value range puts everything in bin 0") {
    val v = df(Seq(ProfRow(7L, "a"), ProfRow(7L, "b"), ProfRow(7L, "c")))
    val h = Profile.histogram(v, "id", 4).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(h === Map(0 -> 3L, 1 -> 0L, 2 -> 0L, 3 -> 0L))
  }

  test("histogram over an all-null column demands explicit bounds") {
    val v = df(Seq(ProfRow(null, "a"), ProfRow(null, "b")))
    intercept[IllegalArgumentException] { Profile.histogram(v, "id", 3) }
    val h = Profile.histogram(v, "id", 3, bounds = Some((0.0, 3.0)))
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(h === Map(0 -> 0L, 1 -> 0L, 2 -> 0L))
  }
}
