package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Joins

/** Bloom-pruned join (VERDICT r4 "do this" #3): semantics must be
  * bit-identical to the plain join (false positives die in the exact
  * join; false negatives are impossible), and the might_contain filter
  * must sit BELOW the shuffle — that placement is the entire point at
  * 100 TB (prune fact rows before they cross the wire).
  */
class BloomJoinSpec extends SparkSpec {

  private lazy val fact =
    df(Seq.tabulate(2000)(i => (i.toLong, s"f$i"))).toDF("fk", "fv")

  // every 7th key matches; plenty of non-members to tempt false positives
  private lazy val dim =
    df(Seq.tabulate(300)(i => (i * 7L, s"d$i"))).toDF("dk", "dv")

  test("bloom-pruned inner join equals the plain inner join, even with a saturated filter") {
    // 64 bits for 300 keys → the filter is saturated, nearly every
    // lookup is a false positive — results must STILL be exact
    val pruned = Joins.bloomPrunedJoin(fact, dim, "fk", "dk",
      expectedItems = 300L, numBits = 64L)
    val plain = fact.join(dim, fact("fk") === dim("dk"), "inner")
    assert(pruned.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
    assert(pruned.count() == 286) // keys 0,7,...,1995 within [0,2000)
  }

  test("semi join variant equals plain left_semi") {
    val pruned = Joins.bloomPrunedJoin(fact, dim, "fk", "dk", joinType = "left_semi")
    val plain = fact.join(dim, fact("fk") === dim("dk"), "left_semi")
    assert(pruned.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("outer joins are rejected — pruning would drop unmatched fact rows") {
    val e = intercept[IllegalArgumentException](
      Joins.bloomPrunedJoin(fact, dim, "fk", "dk", joinType = "left"))
    assert(e.getMessage.contains("inner/semi"))
  }

  test("the might_contain filter evaluates below the exchange (pre-shuffle prune)") {
    // disable broadcast so the join genuinely shuffles both sides —
    // the situation the bloom prune exists for
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // parquet-backed inputs: over a LocalRelation Catalyst folds the
      // whole filter at optimization time and there is no plan to inspect
      val base = java.nio.file.Files.createTempDirectory("graft_bloom").toString
      fact.write.parquet(s"$base/fact")
      dim.write.parquet(s"$base/dim")
      val joined = Joins.bloomPrunedJoin(
        spark.read.parquet(s"$base/fact"),
        spark.read.parquet(s"$base/dim"), "fk", "dk")
      joined.collect() // finalize any adaptive plan
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // AQE hides finished stages behind leaf QueryStageExec nodes —
      // flatten through them so the whole physical tree is visible
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val all = flatten(plan)
      val bloomFilters = all.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty, s"no might_contain filter in:\n$plan")
      // no shuffle anywhere BELOW the filter: rows are pruned before
      // they ever cross an exchange
      assert(bloomFilters.forall(f =>
        flatten(f).drop(1).collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"bloom filter sits above a shuffle in:\n$plan")
      assert(all.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "expected a shuffling join with broadcast off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
