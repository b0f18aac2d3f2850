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

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      Profile.profile(data, Seq("id", "nope"))
    }
  }
}
