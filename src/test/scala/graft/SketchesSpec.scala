package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Mergeable HLL sketches: the shard → union → estimate decomposition
  * must equal the one-shot sketch (union is lossless register-max), and
  * estimates must sit within the sketch's error envelope.
  */
class SketchesSpec extends SparkSpec {

  private lazy val events = {
    val s = spark
    import s.implicits._
    // 3 shards ("days"), overlapping user populations, known exact counts
    (0 until 30000).map { i =>
      val day = i % 3
      val user = (i * 2654435761L) % 5000 + day * 1000 // overlap across days
      (day, user)
    }.toDF("day", "user")
  }

  test("union of per-shard sketches equals the one-shot sketch estimate") {
    val perDay = Sketches.hllSketch(events, Seq(col("day")), col("user"))
    val merged = Sketches.hllUnion(perDay.withColumn("g", lit(1)), Seq(col("g")))
      .select(Sketches.estimate(col("hll")))
      .head().getLong(0)
    val oneShot = Sketches
      .approxDistinct(events.withColumn("g", lit(1)), Seq(col("g")), col("user"))
      .head().getLong(1)
    assert(merged == oneShot,
      "shard-then-union must lose nothing vs sketching the union directly")
  }

  test("estimates sit within the error envelope of exact distinct") {
    val approx = Sketches
      .approxDistinct(events, Seq(col("day")), col("user"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("day").agg(countDistinct(col("user")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (day, n) =>
      val e = approx(day)
      // lgK=12 → ~1.6% relative standard error; 5% is > 3 sigma
      assert(math.abs(e - n).toDouble / n < 0.05,
        s"day $day: approx $e vs exact $n drifted beyond the envelope")
    }
  }

  test("union tolerates sketches built at different lgK (degrades to coarser)") {
    // a sketch table accumulated over time with a mid-life lgK retune:
    // union must not throw, and the estimate stays in the envelope of
    // the COARSER precision
    val coarse = Sketches.hllSketch(events.filter(col("day") === 0),
      Seq(col("day")), col("user"), lgK = 10)
    val fine = Sketches.hllSketch(events.filter(col("day") === 1),
      Seq(col("day")), col("user"), lgK = 14)
    val unioned = Sketches.hllUnion(coarse.unionByName(fine),
      Seq.empty).withColumn("approx_distinct",
        Sketches.estimate(col("hll")))
    val est = unioned.head().getAs[Long]("approx_distinct").toDouble
    val exact = events.filter(col("day") <= 1).select("user").distinct().count()
    assert(math.abs(est - exact) / exact < 0.10,
      s"estimate $est too far from exact $exact at lgK=10 precision")
  }

  test("sketches survive a persistence round-trip through a TxTable") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hll").toString + "/sketches"
    val perDay = Sketches.hllSketch(events, Seq(col("day")), col("user"))
    graft.ops.TxTable.overwrite(spark, dir, perDay)
    val reloaded = graft.ops.TxTable.read(spark, dir)
    val est = Sketches.hllUnion(reloaded.withColumn("g", lit(1)), Seq(col("g")))
      .select(Sketches.estimate(col("hll"))).head().getLong(0)
    val direct = Sketches.hllUnion(perDay.withColumn("g", lit(1)), Seq(col("g")))
      .select(Sketches.estimate(col("hll"))).head().getLong(0)
    assert(est == direct, "persisted partials must answer like fresh ones")
  }
}
