package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.functions._

import graft.ops.Prefix

case class PrefixRow(id: Long, score: Double, toks: Long)

/** Distributed prefix sum: must equal the naive single-window spelling
  * bit-for-bit, stay stable under any input partitioning and any
  * partition-count choice, and never plan an all-to-one exchange (the
  * single-task global window it exists to replace).
  */
class PrefixSpec extends SparkSpec {

  private def rows(n: Int) = df((1 to n).map { i =>
    PrefixRow(i.toLong, (i * 37 % 19).toDouble / 7.0, (i % 13 + 1).toLong)
  })

  private def naive(n: Int): Map[Long, Long] = {
    // driver-side reference: sort by (score desc, id), running sum
    (1 to n).map(i => (i.toLong, (i * 37 % 19).toDouble / 7.0, (i % 13 + 1).toLong))
      .sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L)) { case ((_, acc), (id, _, t)) => (id, acc + t) }
      .drop(1).toMap
  }

  test("runningSum equals the naive global window result") {
    val got = Prefix.runningSum(rows(500), Seq(col("score").desc, col("id").asc),
        col("toks"), "rt")
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive(500))
  }

  test("result is invariant to input partitioning and partition-count choice") {
    val base = Prefix.runningSum(rows(300), Seq(col("score").desc, col("id").asc),
        col("toks"), "rt", partitions = 7)
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val other = Prefix.runningSum(rows(300).repartition(11),
        Seq(col("score").desc, col("id").asc), col("toks"), "rt", partitions = 3)
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base === other)
    assert(base === naive(300))
  }

  test("budgetSelect keeps exactly the maximal prefix within budget") {
    val ref = naive(400)
    val budget = ref.values.toSeq.sorted.apply(123) // some mid-stream cut
    val got = Prefix.budgetSelect(rows(400), col("score"), col("id"),
        col("toks"), budget)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === ref.filter(_._2 <= budget).keySet)
    assert(got.size === 124)
  }

  test("no all-to-one exchange in the plan — the whole point") {
    val planned = Prefix.runningSum(rows(200), Seq(col("id").asc), col("toks"), "rt")
    planned.write.format("noop").mode("overwrite").save()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case other => other +: other.children.flatMap(flatten)
    }
    val exchanges = flatten(planned.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.outputPartitioning == SinglePartition),
      "runningSum must never collapse to a single partition")
  }

  test("globalRowNumber equals the naive global row_number") {
    val got = Prefix.globalRowNumber(rows(300),
        Seq(col("score").desc, col("id").asc), "rn", partitions = 5)
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = (1 to 300)
      .map(i => (i.toLong, (i * 37 % 19).toDouble / 7.0))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got === ref)
  }

  test("float value columns are rejected (boundary-dependent FP sums)") {
    intercept[IllegalArgumentException] {
      Prefix.runningSum(rows(10), Seq(col("id").asc), col("score"), "rt")
    }
  }

  // SQL NTILE reference: with N rows and n buckets, the first N%n
  // buckets hold N/n+1 rows, the rest N/n — computed over the rank
  private def naiveNtile(ranks: Map[Long, Long], n: Int): Map[Long, Int] = {
    val total = ranks.size.toLong
    val q = total / n; val r = total % n; val big = r * (q + 1)
    ranks.map { case (id, rn) =>
      id -> (if (rn <= big) ((rn - 1) / (q + 1) + 1)
             else r + (rn - 1 - big) / (if (q == 0) 1 else q) + 1).toInt
    }
  }

  test("ntile matches SQL semantics on an uneven split (503 rows, 10 buckets)") {
    val got = Prefix.ntile(rows(503), Seq(col("score").desc, col("id").asc),
        10, "b", partitions = 7)
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ranks = Prefix.globalRowNumber(rows(503),
        Seq(col("score").desc, col("id").asc), "rn")
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naiveNtile(ranks, 10))
    // 503 = 10*50 + 3: three buckets of 51, seven of 50
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.count(_ == 51) == 3 && sizes.values.count(_ == 50) == 7)
  }

  test("ntile with more buckets than rows: each row its own bucket") {
    val got = Prefix.ntile(rows(4), Seq(col("id").asc), 9, "b")
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("groupRowNumber equals the naive per-group window; partitioning-invariant") {
    val s = spark
    import s.implicits._
    // 3 groups of very different sizes, interleaved
    val data = (1 to 400).map(i => (i.toLong, s"g${i % 3}", (i * 31 % 97).toLong))
      .toDF("id", "grp", "v")
    def run(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Prefix.groupRowNumber(df, "grp", Seq(col("v").asc, col("id").asc),
          "rn", partitions = parts)
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = (1 to 400).map(i => (i.toLong, s"g${i % 3}", (i * 31 % 97).toLong))
      .groupBy(_._2).values.flatMap { g =>
        g.sortBy { case (id, _, v) => (v, id) }.zipWithIndex
          .map { case ((id, _, _), r) => id -> (r + 1).toLong }
      }.toMap
    assert(run(data, 7) === naive)
    assert(run(data.repartition(13), 3) === naive)
  }

  test("groupRowNumber: a null group is ranked like any other group") {
    val s = spark
    import s.implicits._
    val data = Seq((1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, null))
      .toDF("id", "grp")
    val got = Prefix.groupRowNumber(data, "grp", Seq(col("id").asc), "rn",
        partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 3L -> 2L, 2L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("groupRunningSum equals naive per-group running totals; budget cut maximal") {
    val s = spark
    import s.implicits._
    val data = (1 to 300).map(i =>
      (i.toLong, s"g${i % 3}", (i * 31 % 97).toLong, (i % 7 + 1).toLong))
      .toDF("id", "grp", "score", "toks")
    val got = Prefix.groupRunningSum(data, "grp",
        Seq(col("score").desc, col("id").asc), col("toks"), "rt",
        partitions = 5)
      .select("id", "rt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = (1 to 300).map(i =>
        (i.toLong, s"g${i % 3}", (i * 31 % 97).toLong, (i % 7 + 1).toLong))
      .groupBy(_._2).values.flatMap { g =>
        g.sortBy { case (id, _, sc, _) => (-sc, id) }
          .scanLeft((0L, 0L)) { case ((_, acc), (id, _, _, t)) => (id, acc + t) }
          .drop(1)
      }.toMap
    assert(got === ref)

    // per-group budget: each group keeps its maximal best-first prefix
    val cut = Prefix.budgetSelectPerGroup(data, "grp", col("score"),
        col("id"), col("toks"), lit(200L), "rt", partitions = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cut === ref.filter(_._2 <= 200L).keySet)
    assert(cut.nonEmpty && cut.size < 300)
  }

  test("groupRowNumber refuses the many-tiny-groups regime loudly") {
    val s = spark
    import s.implicits._
    val many = (1 to 200).map(i => (i.toLong, s"g$i")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Prefix.groupRowNumber(many, "grp", Seq(col("id").asc), "rn",
        maxDriverRows = 50)
    }
  }

  test("ntile is invariant to input partitioning") {
    val a = Prefix.ntile(rows(200), Seq(col("score").desc, col("id").asc),
        7, "b", partitions = 3)
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Prefix.ntile(rows(200).repartition(13),
        Seq(col("score").desc, col("id").asc), 7, "b", partitions = 11)
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }
}
