// Scratch micro-bench (builder tool, run via: sbt "runMain MicroBench")
// — not part of the library. Times component variants of q_a1_multisum.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li.write.format("noop").mode("overwrite").save() // warm cache/files

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("scan only")(noop(li))
    time("groupBy count only")(
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)))))
    time("plain double sums")(
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity"), sum("l_extendedprice"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), count(lit(1)))))
    time("cents long sums")(
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        graft.ops.Aggregations.moneySum(col("l_quantity")),
        graft.ops.Aggregations.moneySum(col("l_extendedprice")),
        graft.ops.Aggregations.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        count(lit(1)))))
    time("decimal sums")(
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")),
        sum(col("l_extendedprice").cast("decimal(18,2)")),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(22,4)")),
        count(lit(1)))))
    time("cents + orderBy")(
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        graft.ops.Aggregations.moneySum(col("l_quantity")).as("a"),
        count(lit(1))).orderBy("l_returnflag")))
    spark.stop()
  }
}
