package graft

import org.apache.spark.sql.functions._

import graft.text.{Dsir, TextAnalysis}

/** DSIR importance weighting: model completeness (every bucket carries
  * a log-ratio), hand-computed weights against an independent
  * driver-side implementation, direction (target-like docs weigh
  * more), the no-feature neutral weight, and repartition stability.
  */
class DsirSpec extends SparkSpec {

  private val B = 64

  private lazy val target =
    df(Seq((1L, "the cat sat"), (2L, "the dog sat"))).toDF("id", "text")
  private lazy val raw = df(Seq(
    (1L, "the cat sat"), (2L, "the dog sat"),
    (3L, "der hund sass"), (4L, "der katze sass"))).toDF("id", "text")
  private lazy val model = Dsir.fit(target, raw, "text", buckets = B)

  /** Independent reference: same features/hash via Spark expressions,
    * but counted and folded entirely on the driver.
    */
  private def refWeights(): Map[Long, Double] = {
    val feats = raw.select(col("id"),
        Dsir.featureBuckets(col("text"), B).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val tIds = Set(1L, 2L)
    val allT = feats.filter(t => tIds(t._1)).values.flatten.toSeq
    val allR = feats.values.flatten.toSeq
    val (nt, nr) = (allT.size.toLong, allR.size.toLong)
    val lr = (0L until B).map { b =>
      b -> (math.log((allT.count(_ == b) + 1).toDouble / (nt + B).toDouble) -
        math.log((allR.count(_ == b) + 1).toDouble / (nr + B).toDouble))
    }.toMap
    feats.map { case (id, bks) =>
      val w = bks.groupBy(identity).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (b, occ)) => acc + occ.size.toDouble * lr(b) }
      id -> BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  test("model carries a log-ratio for every bucket, observed or not") {
    assert(model.logRatios.count() === B.toLong)
    assert(model.logRatios.filter(col("lr").isNull).count() === 0L)
  }

  test("weights match an independent driver-side computation") {
    val got = Dsir.score(raw, "id", "text", model)
      .select("id", "dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === refWeights())
  }

  test("target-like documents outweigh off-target ones") {
    val got = Dsir.score(raw, "id", "text", model)
      .select("id", "dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(3L) && got(2L) > got(4L))
  }

  test("a document with no features weighs exactly 0.0") {
    val got = Dsir.score(df(Seq((9L, "   "))).toDF("id", "text"),
        "id", "text", model)
      .select("dsir_weight").head().getDouble(0)
    assert(got === 0.0)
  }

  test("write/load round-trips the model; loaded scores match fit scores exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString + "/m"
    Dsir.writeModel(model, dir)
    val loaded = Dsir.loadModel(spark, dir)
    assert(loaded.buckets === B)
    val a = Dsir.score(raw, "id", "text", model)
      .select("id", "dsir_weight").collect().sortBy(_.getLong(0)).map(_.toString)
    val b = Dsir.score(raw, "id", "text", loaded)
      .select("id", "dsir_weight").collect().sortBy(_.getLong(0)).map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("weights are stable under repartitioning") {
    val a = Dsir.score(raw, "id", "text", model)
      .select("id", "dsir_weight").collect().sortBy(_.getLong(0)).toSeq
    val b = Dsir.score(raw.repartition(7), "id", "text", model)
      .select("id", "dsir_weight").collect().sortBy(_.getLong(0)).toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }
}
