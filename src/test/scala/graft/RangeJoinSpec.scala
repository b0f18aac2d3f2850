package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Banded range join: the equi-join rewrite must return EXACTLY the
  * inequality join's pairs (banding only bounds candidates; the refine
  * predicate is the definition), and must never plan the
  * BroadcastNestedLoopJoin that a raw range predicate forces.
  */
class RangeJoinSpec extends SparkSpec {

  // deterministic pseudo-random ordinates, including negatives and
  // exact band-edge collisions (multiples of the width)
  private lazy val left = df(Seq.tabulate(300)(i =>
    (i.toLong, i % 5L, (i * 7919L) % 2000L - 1000L))).toDF("lid", "k", "lo")
  private lazy val right = df(Seq.tabulate(300)(i =>
    (i.toLong, i % 5L, (i * 104729L) % 2000L - 1000L))).toDF("rid", "k", "ro")

  private def naive(loB: Long, hiB: Long) =
    left.join(right, left("k") === right("k") &&
      right("ro").between(left("lo") + loB, left("lo") + hiB))
      .select("lid", "rid").collect().map(_.toSeq).toSet

  private def banded(loB: Long, hiB: Long) =
    RangeJoin.bandJoin(left, right, Seq("k"), "lo", "ro", loB, hiB)
      .select("lid", "rid").collect().map(_.toSeq).toSet

  test("symmetric band equals the inequality join, negatives and edges included") {
    val n = naive(-100L, 100L)
    assert(n.nonEmpty && banded(-100L, 100L) == n)
  }

  test("asymmetric and zero-width bands match too") {
    for ((loB, hiB) <- Seq((0L, 250L), (-333L, -1L), (0L, 0L), (17L, 17L)))
      assert(banded(loB, hiB) == naive(loB, hiB), s"band [$loB,$hiB]")
  }

  test("band edges are inclusive on both ends") {
    val l = df(Seq((1L, 0L, 0L))).toDF("lid", "k", "lo")
    val r = df(Seq((1L, 0L, -10L), (2L, 0L, 10L), (3L, 0L, -11L), (4L, 0L, 11L)))
      .toDF("rid", "k", "ro")
    val got = RangeJoin.bandJoin(l, r, Seq("k"), "lo", "ro", -10L, 10L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("timeBandJoin matches an interval predicate on timestamps") {
    val l = df(Seq((1L, 7L, "2024-01-01 10:00:00"), (2L, 7L, "2024-01-01 23:30:00")))
      .toDF("lid", "k", "lts").withColumn("lts", to_timestamp(col("lts")))
    val r = df(Seq(
        (10L, 7L, "2024-01-01 09:00:01"), (11L, 7L, "2024-01-01 09:00:00"),
        (12L, 7L, "2024-01-01 11:00:00"), (13L, 7L, "2024-01-02 00:29:59"),
        (14L, 7L, "2024-01-02 00:30:01")))
      .toDF("rid", "k", "rts").withColumn("rts", to_timestamp(col("rts")))
    val got = RangeJoin.timeBandJoin(l, r, Seq("k"), "lts", "rts", -3600L, 3600L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L)))
  }

  test("plans as an equi-join — never a nested-loop join") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = RangeJoin.bandJoin(left, right, Seq("k"), "lo", "ro", -100L, 100L)
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // flatten through finished AQE stages so nothing hides in a leaf
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      assert(!flatten(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"nested loop in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("colliding non-key columns are rejected up front") {
    val e = intercept[IllegalArgumentException](
      RangeJoin.bandJoin(left, left.toDF("lid", "k", "ro"), Seq("k"), "lo", "ro", 0L, 1L))
    assert(e.getMessage.contains("both sides"))
  }
}
