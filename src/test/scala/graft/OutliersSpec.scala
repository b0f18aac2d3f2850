package graft

import org.apache.spark.sql.functions._

import graft.ops.Outliers

/** Robust median/MAD outlier flagging: exact lower-median semantics,
  * per-group independence, deterministic equality with a driver-side
  * reference, and the documented edges (null values, zero MAD).
  */
class OutliersSpec extends SparkSpec {

  private def lowerMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size + 1) / 2 - 1)
  }

  test("groupMedianExact is the lower median, odd and even group sizes") {
    val s = spark
    import s.implicits._
    val data = Seq(("a", 1L), ("a", 9L), ("a", 5L), // odd: median 5
        ("b", 10L), ("b", 20L), ("b", 30L), ("b", 40L)) // even: LOWER median 20
      .toDF("grp", "v")
    val got = Outliers.groupMedianExact(data, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 5.0, "b" -> 20.0))
  }

  test("robustFlag flags the planted outlier and only it; groups independent") {
    val s = spark
    import s.implicits._
    // group a: tight around 100 with one wild value; group b: tight
    // around 10 — 100 would be an outlier THERE, but not in a
    // b avoids the zero-MAD edge: [9,10,11,12] → med 10, MAD 1
    val data = (Seq(98L, 99L, 100L, 101L, 102L, 5000L).map(("a", _)) ++
        Seq(9L, 10L, 11L, 12L).map(("b", _)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val got = Outliers.robustFlag(data, "grp", "v", k = 3.0)
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(0L -> false, 1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true, 6L -> false, 7L -> false, 8L -> false,
      9L -> false))
  }

  test("robustFlag equals a driver-side reference on pseudo-random groups") {
    val s = spark
    import s.implicits._
    val raw = (1 to 300).map { i =>
      (i.toLong, s"g${i % 2}", ((i * 131) % 251).toLong)
    }
    val got = Outliers.robustFlag(raw.toDF("id", "grp", "v"), "grp", "v", k = 2.0)
      .select("id", "med", "mad", "is_outlier").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val byGrp = raw.groupBy(_._2)
    val ref = raw.map { case (id, g, v) =>
      val vs = byGrp(g).map(_._3.toDouble)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(x => math.abs(x - med)))
      id -> ((med, mad, math.abs(v.toDouble - med) > mad * 2.0))
    }.toMap
    assert(got === ref)
  }

  test("null values get med/mad context but are never outliers") {
    val s = spark
    import s.implicits._
    val data = Seq((1L, "a", java.lang.Long.valueOf(5L)),
        (2L, "a", java.lang.Long.valueOf(6L)),
        (3L, "a", java.lang.Long.valueOf(7L)),
        (4L, "a", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "grp", "v")
    val got = Outliers.robustFlag(data, "grp", "v", k = 1.0)
      .select("id", "med", "is_outlier").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(4L) === ((6.0, false)), "null excluded from median, never flagged")
  }

  test("zero MAD: any value off the median is flagged — the documented edge") {
    val s = spark
    import s.implicits._
    val data = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L), (4L, "a", 6L))
      .toDF("id", "grp", "v")
    val got = Outliers.robustFlag(data, "grp", "v", k = 100.0)
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("groupCorr: perfect +1/-1, independent ~0, degenerate groups NULL") {
    val s = spark
    import s.implicits._
    val data = Seq(
      // a: y = 2x -> r = 1
      (1L, "a", 1L, 2L), (2L, "a", 2L, 4L), (3L, "a", 3L, 6L),
      // b: y = -x -> r = -1
      (4L, "b", 1L, 9L), (5L, "b", 2L, 8L), (6L, "b", 3L, 7L),
      // c: x constant -> undefined -> NULL
      (7L, "c", 5L, 1L), (8L, "c", 5L, 2L),
      // d: singleton -> NULL
      (9L, "d", 1L, 1L)).toDF("id", "grp", "x", "y")
    val got = Outliers.groupCorr(data, "grp", "x", "y").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // sqrt rounding puts perfect correlation a ulp past ±1 — that ulp
    // is the same in every engine (the oracle hash-matches exactly)
    assert(math.abs(got("a").get - 1.0) < 1e-12)
    assert(math.abs(got("b").get + 1.0) < 1e-12)
    assert(got("c") === None && got("d") === None)
    intercept[IllegalArgumentException] {
      Outliers.groupCorr(data.withColumn("x", col("x").cast("double")),
        "grp", "x", "y")
    }
  }

  test("minMaxNorm: known values, constant and singleton groups give 0.0") {
    val s = spark
    import s.implicits._
    val data = Seq((1L, "a", 10L), (2L, "a", 15L), (3L, "a", 20L),
      (4L, "b", 7L), (5L, "b", 7L), (6L, "c", 9L)).toDF("id", "grp", "v")
    val got = Outliers.minMaxNorm(data, "grp", "v").select("id", "mm")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0,
      4L -> 0.0, 5L -> 0.0, 6L -> 0.0))
  }

  test("zscore: known values, zero-variance and singleton groups give 0.0") {
    val s = spark
    import s.implicits._
    val data = Seq(
      // group a: values 2,4,6 -> mean 4, pop var 8/3, sd sqrt(8/3)
      (1L, "a", 2L), (2L, "a", 4L), (3L, "a", 6L),
      // group b: constant -> zero variance -> all 0.0
      (4L, "b", 7L), (5L, "b", 7L),
      // group c: singleton -> 0.0
      (6L, "c", 9L)).toDF("id", "grp", "v")
    val got = Outliers.zscore(data, "grp", "v").select("id", "z").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sd = math.sqrt((56.0 - 12.0 * 12.0 / 3.0) / 3.0)
    assert(got(1L) === (2.0 - 4.0) / sd)
    assert(got(2L) === 0.0)
    assert(got(3L) === (6.0 - 4.0) / sd)
    assert(got(4L) === 0.0 && got(5L) === 0.0, "zero variance -> 0.0")
    assert(got(6L) === 0.0, "singleton group -> 0.0")
    // standardized: group a's z-scores sum to ~0
    assert(math.abs(got(1L) + got(2L) + got(3L)) < 1e-12)
    intercept[IllegalArgumentException] {
      Outliers.zscore(data.withColumn("v", col("v").cast("double")),
        "grp", "v")
    }
  }
}
