package graft

import org.apache.spark.sql.functions._

import graft.ops.Windows

/** Bounded-heap per-group top-k: must equal the window spelling
  * bit-for-bit under a total order, stay deterministic under any
  * partitioning, plan as a TWO-PHASE aggregate (partial heaps before
  * the exchange — the whole point), and handle the edges (short
  * groups, reverse order, null keys).
  */
class TopKAggSpec extends SparkSpec {

  private def data(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (s"g${i % 5}", i.toLong, (i * 131 % 97).toLong))
      .toDF("g", "id", "v")
  }

  private def windowed(n: Int, k: Int): Map[(String, Int), (Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    data(n)
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("equals the window spelling under a total order; partitioning-proof") {
    def run(parts: Int) = Windows.topKPerGroupAgg(
        data(500).repartition(parts), Seq(col("g")),
        Seq(col("v").as("v"), col("id").as("id")), k = 7)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(3), r.getLong(2)))).toMap
    val ref = windowed(500, 7)
    assert(run(3) === ref)
    assert(run(17) === ref)
  }

  test("reverse keeps the k LARGEST; short groups return whole group ranked") {
    val s = spark
    import s.implicits._
    val small = Seq(("a", 1L), ("a", 9L), ("a", 5L), ("b", 2L))
      .toDF("g", "v")
    val got = Windows.topKPerGroupAgg(small, Seq(col("g")),
        Seq(col("v").as("v")), k = 2, reverse = true)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", 1) -> 9L, ("a", 2) -> 5L, ("b", 1) -> 2L))
  }

  test("plans as a two-phase aggregate: partial heaps before the exchange") {
    val planned = Windows.topKPerGroupAgg(data(100), Seq(col("g")),
      Seq(col("v").as("v"), col("id").as("id")), k = 3)
    val plan = planned.queryExecution.executedPlan.toString
    val hits = "graft_topk_agg".r.findAllIn(plan).length
    assert(hits >= 2, s"expected partial+final graft_topk_agg, plan:\n$plan")
    assert(!plan.contains("Window"),
      "the aggregate spelling must not fall back to a window")
  }

  test("null sort keys order like SQL (nulls first ascending), null structs skipped") {
    val s = spark
    import s.implicits._
    val withNulls = Seq(("a", Some(3L), 1L), ("a", None, 2L), ("a", Some(1L), 3L))
      .toDF("g", "v", "id")
    val got = Windows.topKPerGroupAgg(withNulls, Seq(col("g")),
        Seq(col("v").as("v"), col("id").as("id")), k = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    // ascending with nulls first: the null-v row ranks 1, then v=1
    assert(got === Map(1 -> 2L, 2 -> 3L))
  }
}
