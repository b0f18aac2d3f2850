package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

case class BkOrder(okey: Long, cust: Long, price: Double)
case class BkCust(cust: Long, name: String)

class BucketingSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("same-bucketed tables join with no exchange on either side") {
    val dbDir = Files.createTempDirectory("graft_bucketdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketspec LOCATION '$dbDir'")
    try {
      val orders = df((1 to 500).map(i =>
        BkOrder(i.toLong, (i % 40).toLong, i * 1.5)))
      val custs = df((0 until 40).map(i => BkCust(i.toLong, s"c$i")))
      Bucketing.writeBucketed(orders, "bucketspec.orders_b", "cust", 8)
      Bucketing.writeBucketed(custs, "bucketspec.custs_b", "cust", 8)

      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      try {
        val joined = Bucketing.bucketedJoin(spark,
          "bucketspec.orders_b", "bucketspec.custs_b", "cust")
        assert(joined.count() === 500)
        joined.queryExecution.executedPlan // force planning
        val exchanges = flatten(joined.queryExecution.executedPlan)
          .collect { case e: ShuffleExchangeExec => e }
        assert(exchanges.isEmpty,
          s"bucketed join must not shuffle, found: $exchanges")

        // and the result equals the plain (shuffling) join
        val plain = orders.join(custs, Seq("cust"))
        assert(joined.select("okey", "cust", "name")
          .except(plain.select("okey", "cust", "name")).count() === 0)
        assert(plain.select("okey", "cust", "name")
          .except(joined.select("okey", "cust", "name")).count() === 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally
      spark.sql("DROP DATABASE IF EXISTS bucketspec CASCADE")
  }

  test("mismatched bucket counts fall back to a correct (shuffling) join") {
    val dbDir = Files.createTempDirectory("graft_bucketdb2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketspec2 LOCATION '$dbDir'")
    try {
      val orders = df((1 to 100).map(i =>
        BkOrder(i.toLong, (i % 10).toLong, i * 1.0)))
      val custs = df((0 until 10).map(i => BkCust(i.toLong, s"c$i")))
      Bucketing.writeBucketed(orders, "bucketspec2.o", "cust", 8)
      Bucketing.writeBucketed(custs, "bucketspec2.c", "cust", 4)
      val joined = Bucketing.bucketedJoin(spark,
        "bucketspec2.o", "bucketspec2.c", "cust")
      assert(joined.count() === 100) // correctness regardless of layout
    } finally
      spark.sql("DROP DATABASE IF EXISTS bucketspec2 CASCADE")
  }
}
