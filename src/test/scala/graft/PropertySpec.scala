package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops._

/** Property-based invariants (SURVEY.md §5 item 3), sampled via plain
  * ScalaCheck Gens (the scalatest bridge isn't in the offline dep set).
  * Row counts are kept small — each evaluation is a full Spark job.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic samples: fixed seed, `n` draws. */
  private def samples[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("downcast never changes numeric values, only (sometimes) the type") {
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(-3000000000L, 3000000000L))).map(_.take(30))
    for (rows <- samples(rowsGen)) {
      val s = spark
      import s.implicits._
      val in = rows.toDF("a", "b")
      val out = Casting.safeDowncastLongs(in)
      val before = in.orderBy("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val after = out.orderBy("a", "b").collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())).toSeq
      assert(after == before, s"downcast altered values for $rows")
    }
  }

  test("moneySum equals exact BigDecimal accumulation of 2-decimal inputs") {
    val centsGen = Gen.nonEmptyListOf(Gen.chooseNum(-10000000L, 10000000L)).map(_.take(50))
    for (cs <- samples(centsGen)) {
      val s = spark
      import s.implicits._
      val got = cs.map(c => c / 100.0).toDF("v").repartition(7)
        .agg(Aggregations.moneySum(col("v"))).collect().head.getDouble(0)
      val expect = (cs.map(BigDecimal(_)).sum / 100).toDouble
      assert(got == expect, s"moneySum drifted for $cs")
    }
  }

  test("renameAll is lossless: columns renamed, values untouched") {
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.alphaStr.map(_.take(8)), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(_.take(20))
    for (rows <- samples(rowsGen)) {
      val s = spark
      import s.implicits._
      val out = Projections.renameAll(rows.toDF("k", "v"),
        Map("k" -> "key", "v" -> "value"))
      assert(out.columns.toSeq == Seq("key", "value"))
      assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted ==
        rows.sorted)
    }
  }

  test("left join via enrichUsing preserves fact count for unique-keyed dims") {
    val factGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 10L), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(_.take(40))
    for (rows <- samples(factGen)) {
      val s = spark
      import s.implicits._
      val dim = (0L to 5L).map(k => (k, s"label$k")).toDF("key", "label")
      assert(Joins.enrichUsing(rows.toDF("key", "x"), dim, Seq("key")).count() ==
        rows.length)
    }
  }

  test("salted join equals plain join on random skewed inputs") {
    val factGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.frequency(8 -> Gen.const(0L), 2 -> Gen.chooseNum(1L, 20L)),
      Gen.chooseNum(-1000L, 1000L))).map(_.take(60))
    for (rows <- samples(factGen, 3)) {
      val s = spark
      import s.implicits._
      val fact = rows.toDF("key", "x")
      val dim = (0L to 20L).map(k => (k, s"d$k")).toDF("key", "label")
      val plain = Joins.enrichUsing(fact, dim, Seq("key"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      val salted = Skew.saltedEnrichUsing(fact, dim, Seq("key"), 5)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      assert(salted == plain)
    }
  }
}
