// Scratch per-query timing harness (builder tool; copy into
// src/main/scala and run: sbt "runMain QueryBench <query> [sfDir] [reps]").
// Answers "is this BENCH drift real?" — run the one query repeatedly in
// a fresh JVM: a cold-vs-warm split that converges to BASELINE.md's
// number means cache noise; a warm plateau above it means a plan change.
import org.apache.spark.sql.SparkSession
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
