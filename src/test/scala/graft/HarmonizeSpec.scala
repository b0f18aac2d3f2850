package graft

import org.apache.spark.sql.functions._

import graft.ops.Harmonize

/** Schema-harmonizing union: name alignment (never positional zip),
  * null-fill for columns missing from a batch, deterministic output
  * column order, loud failure on genuine type conflicts, and
  * provenance stamping.
  */
class HarmonizeSpec extends SparkSpec {

  private def batchA = {
    val s = spark; import s.implicits._
    Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("id", "name", "price")
  }
  private def batchB = {
    val s = spark; import s.implicits._
    // same id/name, no price, extra flag — and a DIFFERENT column order
    Seq(("z", 3L, true), ("w", 4L, false)).toDF("name", "id", "flag")
  }

  test("unionLoose aligns by name and null-fills missing columns") {
    val u = Harmonize.unionLoose(Seq(batchA, batchB))
    assert(u.columns.toSeq === Seq("id", "name", "price", "flag"),
      "first frame's order, later-only columns appended")
    val rows = u.collect().map(r => r.getLong(0) ->
      ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows(1L) === (("x", Some(10.0), None)))
    assert(rows(3L) === (("z", None, Some(true))))
    assert(rows.size === 4)
  }

  test("positional union would have zipped these wrong — name alignment doesn't") {
    // batchB's first column is name, not id: a positional union of the
    // common columns would put strings under id. unionLoose keys on
    // names, so ids stay longs
    val u = Harmonize.unionLoose(Seq(batchA.select("id", "name"),
      batchB.select("name", "id")))
    assert(u.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("same-named columns with conflicting types fail loudly, never zip silently") {
    val s = spark; import s.implicits._
    val bad = Seq((5L, 42)).toDF("name", "id") // name is a long here
    // ANSI union coercion casts batchA's non-numeric names to long at
    // runtime and throws — loud either way, silent data corruption never
    val e = intercept[Exception] {
      Harmonize.unionLoose(Seq(batchA, bad)).collect()
    }
    assert(e.isInstanceOf[org.apache.spark.SparkThrowable])
  }

  test("unionWithSource stamps provenance; refuses a colliding label column") {
    val u = Harmonize.unionWithSource(Seq("a" -> batchA, "b" -> batchB))
    val bySrc = u.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("a" -> 2L, "b" -> 2L))
    intercept[IllegalArgumentException] {
      Harmonize.unionWithSource(Seq("a" -> batchA), sourceCol = "price")
    }
  }

  test("unionLoose is a narrow plan — no exchange for the merge itself") {
    val u = Harmonize.unionLoose(Seq(batchA, batchB))
    val plan = u.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"union-by-name must not shuffle:\n$plan")
  }

  test("zero batches refused") {
    intercept[IllegalArgumentException] { Harmonize.unionLoose(Nil) }
  }
}
