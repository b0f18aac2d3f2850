package graft

import org.apache.spark.sql.functions._

import graft.ops.{FuzzyJoin, Sampling}

case class FuzzyRow(id: Long, s: String)
case class WRow(id: Long, grp: String, w: Double)

/** Blocked edit-distance join (completeness vs brute force) and
  * Efraimidis–Spirakis weighted sampling (determinism + proportional
  * inclusion behavior).
  */
class FuzzySampleSpec extends SparkSpec {

  // random strings over a small alphabet, lengths 0..12 — plenty of
  // short strings to exercise the length-bucket path and plenty of
  // near-misses around every maxDist
  private def randomStrings(n: Int, seed: Long): Seq[FuzzyRow] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = r.nextInt(13)
      FuzzyRow(i.toLong, Seq.fill(len)("abc" (r.nextInt(3))).mkString)
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked join equals brute force on random strings (short strings included)") {
    for (seed <- Seq(1L, 2L, 3L); maxDist <- Seq(0, 1, 2)) {
      val rows = randomStrings(40, seed)
      val expected = (for {
        a <- rows; b <- rows if a.id < b.id
        d = lev(a.s, b.s) if d <= maxDist
      } yield (a.id, b.id, d)).sorted
      val got = FuzzyJoin.editDistancePairs(df(rows), "id", "s", maxDist)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
      assert(got === expected, s"seed=$seed maxDist=$maxDist")
    }
  }

  test("weighted sample: deterministic, repartition-proof, weight-0 excluded, n >= rows returns all") {
    val rows = (1L to 50L).map(i => WRow(i, if (i % 2 == 0) "e" else "o",
      if (i <= 5) 0.0 else i.toDouble))
    val base = df(rows)
    val a = Sampling.weightedSample(base, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    val b = Sampling.weightedSample(base.repartition(7), "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(a === b && a.size === 10)
    assert(a.forall(_ > 5)) // zero-weight rows never sampled
    val all = Sampling.weightedSample(base, "id", "w", 1000)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(all === (6L to 50L))
  }

  test("weighted sample: a dominant weight is always included; inclusion tracks weight") {
    // row 42 carries 1e9 of the ~2.2e3 total weight: its exponential
    // key is ~1e6 times smaller than any other row's for any hash draw
    val rows = (1L to 60L).map(i =>
      WRow(i, "g", if (i == 42L) 1e9 else i.toDouble))
    for (salt <- Seq("s1", "s2", "s3")) {
      val ids = Sampling.weightedSample(df(rows), "id", "w", 5, salt)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(42L), s"salt=$salt missed the dominant row")
    }
    // across many salts, heavy rows (w >= 45) appear more often than
    // light rows (w <= 15) in a 10-of-60 sample
    val salts = (0 until 20).map(i => s"t$i")
    val counts = salts.flatMap(salt =>
      Sampling.weightedSample(df(rows.filter(_.id != 42L)), "id", "w", 10,
        salt).select("id").collect().map(_.getLong(0)))
      .groupBy(identity).view.mapValues(_.size).toMap.withDefaultValue(0)
    val heavy = (45L to 59L).map(counts).sum
    val light = (1L to 15L).map(counts).sum
    assert(heavy > light * 2,
      s"heavy rows sampled $heavy times vs light $light")
  }

  test("per-group weighted sample: at most k per group, same exclusions") {
    val rows = (1L to 40L).map(i => WRow(i, if (i % 2 == 0) "e" else "o",
      if (i % 10 == 0) 0.0 else i.toDouble))
    val out = Sampling.weightedSamplePerGroup(df(rows), Seq("grp"), "id",
      "w", 4)
    val byGrp = out.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1)
    assert(byGrp("e").length === 4 && byGrp("o").length === 4)
    assert(!out.collect().map(_.getLong(0)).exists(_ % 10 == 0))
  }

  test("per-group sample: heap-agg spelling selects EXACTLY like the window") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 200L).map(i =>
      WRow(i, s"g${i % 3}", (i * 37 % 23 + 1).toDouble))
    val got = Sampling.weightedSamplePerGroup(df(rows), Seq("grp"), "id",
        "w", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    // the window spelling with the identical race-key arithmetic
    val u = (pmod(xxhash64(lit("graft"), col("id")), lit(1000000))
      .cast("double") + 0.5) / 1000000
    val ref = df(rows)
      .withColumn("k", -log(u) / col("w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("k").asc, col("id").asc)))
      .filter(col("rn") <= 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === ref)
  }
}
