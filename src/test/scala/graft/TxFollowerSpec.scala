package graft

import org.apache.spark.sql.functions._

import graft.ops.TxTable
import graft.streaming.TxFollower

/** Incremental table→table follower: delta-only I/O, exactly-once via
  * destination-manifest offsets, restart/replay safety, and the
  * continuous rate-driven form.
  */
class TxFollowerSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("increments consume exactly the appended delta; caught-up is a no-op") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    TxTable.append(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(TxFollower.processAvailable(spark, src, dst, "mv").contains(1L))
    assert(TxTable.read(spark, dst).count() == 2)

    // second call with nothing new: no commit at all
    val versionsBefore = TxTable.versions(spark, dst)
    assert(TxFollower.processAvailable(spark, src, dst, "mv").isEmpty)
    assert(TxTable.versions(spark, dst) == versionsBefore)

    // two more source commits consumed as ONE increment, delta rows only
    TxTable.append(spark, src, Seq((3L, "c")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((4L, "d")).toDF("id", "v"))
    assert(TxFollower.processAvailable(spark, src, dst, "mv").contains(3L))
    assert(TxTable.read(spark, dst).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(TxFollower.processedVersion(spark, dst, "mv").contains(3L))
  }

  test("transform applies per increment; two followers keep independent offsets") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst1 = tmp("graft_f") + "/d1"
    val dst2 = tmp("graft_f") + "/d2"
    TxTable.append(spark, src, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    TxFollower.processAvailable(spark, src, dst1, "sum",
      d => d.agg(sum("x").as("total")))
    TxFollower.processAvailable(spark, src, dst2, "double",
      d => d.withColumn("x", col("x") * 2))
    assert(TxTable.read(spark, dst1).head().getDouble(0) == 30.0)
    assert(TxTable.read(spark, dst2).collect().map(_.getDouble(1)).sorted.toSeq ==
      Seq(20.0, 40.0))
    TxTable.append(spark, src, Seq((3L, 5.0)).toDF("id", "x"))
    TxFollower.processAvailable(spark, src, dst1, "sum",
      d => d.agg(sum("x").as("total")))
    // dst1 advanced, dst2 didn't — offsets are per (dst, app)
    assert(TxFollower.processedVersion(spark, dst1, "sum").contains(2L))
    assert(TxFollower.processedVersion(spark, dst2, "double").contains(1L))
  }

  test("exactly-once across vacuum and foreign commits on the destination") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    TxTable.append(spark, src, Seq((1L, "a")).toDF("id", "v"))
    TxFollower.processAvailable(spark, src, dst, "mv")
    // a foreign writer appends to dst; then vacuum prunes history
    TxTable.append(spark, dst, Seq((99L, "z")).toDF("id", "v"))
    TxTable.vacuum(spark, dst, keepVersions = 1)
    // replaying the same source state must still be a no-op
    assert(TxFollower.processAvailable(spark, src, dst, "mv").isEmpty)
    assert(TxTable.read(spark, dst).count() == 2)
  }

  test("follow() materializes source appends continuously") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    TxTable.append(spark, src, Seq((1L, "a")).toDF("id", "v"))
    val q = TxFollower.follow(spark, src, dst, "live",
      tmp("graft_f_cp"), ticksPerSecond = 10)
    try {
      q.processAllAvailable()
      TxTable.append(spark, src, Seq((2L, "b")).toDF("id", "v"))
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !TxFollower.processedVersion(spark, dst, "live").contains(2L)) {
        Thread.sleep(200)
      }
    } finally q.stop()
    assert(TxTable.read(spark, dst).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("followChanges() keeps a live keyed replica exact under DML") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_fc") + "/src"
    val dst = tmp("graft_fc") + "/dst"
    TxTable.append(spark, src,
      (0L until 10L).map(i => (i, 0L)).toDF("id", "v"))
    val q = TxFollower.followChanges(spark, src, dst, "liverep",
      Seq("id"), tmp("graft_fc_cp"), ticksPerSecond = 10)
    try {
      q.processAllAvailable()
      TxTable.merge(spark, src,
        Seq((3L, -3L), (100L, -100L)).toDF("id", "v"), Seq("id"))
      TxTable.delete(spark, src, col("id") === 5L)
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !TxFollower.processedVersion(spark, dst, "liverep").contains(3L)) {
        Thread.sleep(200)
      }
    } finally q.stop()
    val want = TxTable.read(spark, src)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TxTable.read(spark, dst)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "live replica must equal batch recompute")
  }

  test("aggregate view folds deltas into stored partials, equals batch aggregation") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/agg"
    def partial(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(sum("x").as("sum_x"), count(lit(1)).as("n"))
    def combine(u: org.apache.spark.sql.DataFrame) =
      u.groupBy("k").agg(sum("sum_x").as("sum_x"), sum("n").as("n"))

    TxTable.append(spark, src, Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x"))
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).contains(1L))
    TxTable.append(spark, src, Seq(("a", 10.0), ("c", 5.0)).toDF("k", "x"))
    TxTable.append(spark, src, Seq(("a", 100.0)).toDF("k", "x"))
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).contains(3L))
    // caught up: no-op, no commit
    val versions = TxTable.versions(spark, dst)
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).isEmpty)
    assert(TxTable.versions(spark, dst) == versions)

    val view = TxTable.read(spark, dst).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val batch = TxTable.read(spark, src).groupBy("k")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(view == batch,
      s"incremental view must equal batch aggregation: $view vs $batch")
  }

  test("aggregate view folds the NULL group instead of duplicating it") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/agg"
    def partial(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(sum("x").as("sum_x"))
    def combine(u: org.apache.spark.sql.DataFrame) =
      u.groupBy("k").agg(sum("sum_x").as("sum_x"))
    TxTable.append(spark, src,
      Seq((Option.empty[String], 1.0), (Some("a"), 2.0)).toDF("k", "x"))
    TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"), partial, combine)
    TxTable.append(spark, src,
      Seq((Option.empty[String], 10.0)).toDF("k", "x"))
    TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"), partial, combine)
    val rows = TxTable.read(spark, dst).collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(TxTable.read(spark, dst).count() == 2,
      "exactly one row per group, including the null group")
    assert(rows(None) == 11.0 && rows(Some("a")) == 2.0)
  }

  test("a racing same-app committer aborts instead of double-applying the delta") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    TxTable.append(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // instance A consumes to head 1 and commits txn.src.mv=1
    assert(TxFollower.processAvailable(spark, src, dst, "mv").contains(1L))
    // instance B (zombie that read from=0 before A committed) now tries
    // to append the same delta with the same guard — the claim loop sees
    // txn.src.mv already at 1 and must abort, not double-append
    val delta = TxTable.readAppended(spark, src, fromV = 0L, toV = 1L)
    intercept[java.util.ConcurrentModificationException] {
      TxTable.append(spark, dst, delta,
        meta = Map("txn.src.mv" -> "1"), guard = Map("txn.src.mv" -> 1L))
    }
    assert(TxTable.read(spark, dst).count() == 2, "no duplicate rows landed")
  }

  test("empty source increment advances the aggregate-view offset durably") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    def partial(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(sum("x").as("sum_x"))
    def combine(u: org.apache.spark.sql.DataFrame) =
      u.groupBy("k").agg(sum("sum_x").as("sum_x"))
    TxTable.append(spark, src, Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x"))
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).contains(1L))
    // a zero-row source commit: the view content can't change, but the
    // offset must still land, else every later trigger re-reads an
    // ever-growing delta window
    TxTable.append(spark, src, Seq.empty[(String, Double)].toDF("k", "x"))
    val dstVersions = TxTable.versions(spark, dst)
    val dstFiles = TxTable.read(spark, dst).inputFiles.toSet
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).contains(2L))
    assert(TxFollower.processedVersion(spark, dst, "mv").contains(2L),
      "offset advanced durably by a metadata-only commit")
    assert(TxTable.versions(spark, dst).size == dstVersions.size + 1)
    assert(TxTable.read(spark, dst).inputFiles.toSet == dstFiles,
      "metadata-only commit left the file set untouched")
    assert(TxTable.read(spark, dst).count() == 2)
    // caught up: nothing further
    assert(TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"),
      partial, combine).isEmpty)
  }

  test("sketch-typed aggregate view: incremental HLL state equals batch estimates") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    // the mergeable-sketch partial-state shape: the view stores one HLL
    // binary per key, each increment unions the delta's sketch in —
    // lossless, so estimates equal a from-scratch batch sketch exactly
    def partial(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("k").agg(hll_sketch_agg(col("u")).as("hll"))
    def combine(u: org.apache.spark.sql.DataFrame) =
      u.groupBy("k").agg(hll_union_agg(col("hll"), lit(true)).as("hll"))
    def estimates(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), hll_sketch_estimate(col("hll")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    TxTable.append(spark, src,
      (0 until 2000).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
        .toDF("k", "u"))
    TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"), partial, combine)
    TxTable.append(spark, src,
      (1000 until 3000).map(i => ("a", i.toLong)).toDF("k", "u"))
    TxFollower.processAggregate(spark, src, dst, "mv", Seq("k"), partial, combine)

    val batch = estimates(
      TxTable.read(spark, src).groupBy("k").agg(hll_sketch_agg(col("u")).as("hll")))
    assert(estimates(TxTable.read(spark, dst)) == batch,
      "incrementally maintained sketches must equal the batch sketch")
  }

  test("a source vacuum past the consumed version fails with an actionable error") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/dst"
    TxTable.append(spark, src, Seq((1L, "a")).toDF("id", "v"))
    TxFollower.processAvailable(spark, src, dst, "mv")
    TxTable.append(spark, src, Seq((2L, "b")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((3L, "c")).toDF("id", "v"))
    TxTable.vacuum(spark, src, keepVersions = 1)
    val e = intercept[IllegalStateException](
      TxFollower.processAvailable(spark, src, dst, "mv"))
    assert(e.getMessage.contains("vacuumed past"))
  }

  private def aggViewEqualsRecompute(src: String, dst: String): Unit = {
    val batch = TxTable.read(spark, src).groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("x").as("sum_x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    val view = TxTable.read(spark, dst).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(view == batch, s"view $view != recompute $batch")
  }

  test("retraction view tracks DML: merge updates, deletes, null sums") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    TxTable.append(spark, src,
      Seq(("a", 1L, Some(10L)), ("a", 2L, Some(20L)), ("b", 3L, None))
        .toDF("k", "id", "x").select("k", "id", "x"))
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(1L))
    aggViewEqualsRecompute(src, dst)
    // a MERGE that moves id=2 from group a to group c and rewrites x
    TxTable.merge(spark, src,
      Seq(("c", 2L, Some(200L)), ("b", 9L, None)).toDF("k", "id", "x"),
      Seq("id"))
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(2L))
    aggViewEqualsRecompute(src, dst)
    // group b stays all-null → its sum must be NULL, not 0
    assert(TxTable.read(spark, dst).where(col("k") === "b")
      .collect().head.isNullAt(2))
    // deleting every row of group a removes its view row entirely
    TxTable.delete(spark, src, col("k") === "a")
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(3L))
    aggViewEqualsRecompute(src, dst)
    assert(TxTable.read(spark, dst).where(col("k") === "a").count() == 0L)
    // caught up: no-op, no commit
    val versions = TxTable.versions(spark, dst)
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).isEmpty)
    assert(TxTable.versions(spark, dst) == versions)
  }

  test("asking an existing view for NEW sum/extrema columns refuses loudly") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    TxTable.append(spark, src,
      Seq(("a", 1L, Some(10L))).toDF("k", "id", "x"))
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(1L))
    TxTable.append(spark, src, Seq(("a", 2L, Some(20L))).toDF("k", "id", "x"))
    // extrema state (min_x/max_x) was never tracked by this view — the
    // history that built it is consumed, so an incremental answer does
    // not exist; the error must say so and name the migration path
    val e1 = intercept[IllegalArgumentException] {
      TxFollower.processAggregateChanges(spark, src, dst, "rv",
        Seq("k"), Seq("x"), extremaCols = Seq("x"))
    }
    assert(e1.getMessage.contains("min_x") &&
      e1.getMessage.contains("Recreate the view"))
    // a NEW sum column is the same hole
    val e2 = intercept[IllegalArgumentException] {
      TxFollower.processAggregateChanges(spark, src, dst, "rv",
        Seq("k"), Seq("x", "id"))
    }
    assert(e2.getMessage.contains("sum_id"))
    // the original column set still folds fine afterwards
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(2L))
    aggViewEqualsRecompute(src, dst)
  }

  test("retraction view maintains MIN/MAX: monotone folds + dirty-group recompute") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    def fold() = TxFollower.processAggregateChanges(spark, src, dst, "rvmm",
      Seq("k"), Nil, extremaCols = Seq("x"))
    def check(): Unit = {
      val batch = TxTable.read(spark, src).groupBy("k")
        .agg(count(lit(1)).as("n"), min("x"), max("x"))
        .collect().map(r => Option(r.get(0)).map(_.toString) ->
          ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
      val view = TxTable.read(spark, dst)
        .select("k", "n_rows", "min_x", "max_x").collect()
        .map(r => Option(r.get(0)).map(_.toString) ->
          ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
      assert(view == batch, s"view $view != recompute $batch")
    }
    // insert-only bootstrap: monotone fold path; b is all-null
    TxTable.append(spark, src,
      Seq(("a", 1L, Some(10L)), ("a", 2L, Some(20L)), ("a", 3L, Some(30L)),
        ("b", 4L, Option.empty[Long]))
        .toDF("k", "id", "x"))
    assert(fold().contains(1L)); check()
    // delete the MAX of a: only a recompute can know the new max
    TxTable.delete(spark, src, col("x") === 30L)
    assert(fold().contains(2L)); check()
    // merge moves the MIN (update preimage retraction) and inserts a
    // fresh group in the same increment
    TxTable.merge(spark, src,
      Seq(("a", 1L, Some(500L)), ("c", 9L, Some(7L))).toDF("k", "id", "x"),
      Seq("id"))
    assert(fold().contains(3L)); check()
    // insert-only increment on an existing group: fold, no recompute
    TxTable.append(spark, src,
      Seq(("c", 10L, Some(1L)), ("c", 11L, Option.empty[Long]))
        .toDF("k", "id", "x"))
    assert(fold().contains(4L)); check()
    // group death removes the row; survivors keep exact extrema
    TxTable.delete(spark, src, col("k") === "a")
    assert(fold().contains(5L)); check()
    assert(TxTable.read(spark, dst).where(col("k") === "a").count() == 0L)
    // all-null group's extrema stay NULL through it all
    assert(TxTable.read(spark, dst).where(col("k") === "b")
      .select("min_x", "max_x").collect().head.toSeq == Seq(null, null))
  }

  test("retraction view treats a NULL group key as one real group") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    def fold() = TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x"))
    TxTable.append(spark, src,
      Seq((Option.empty[String], 1L, Some(10L)), (Some("a"), 2L, Some(20L)))
        .toDF("k", "id", "x"))
    fold()
    // second increment touches the null group: it must FOLD into the
    // stored null-group row, not insert a second one
    TxTable.append(spark, src,
      Seq((Option.empty[String], 3L, Some(5L))).toDF("k", "id", "x"))
    fold()
    aggViewEqualsRecompute(src, dst)
    assert(TxTable.read(spark, dst).where(col("k").isNull).count() === 1L)
    // draining the null group must DELETE its view row
    TxTable.delete(spark, src, col("k").isNull)
    fold()
    aggViewEqualsRecompute(src, dst)
    assert(TxTable.read(spark, dst).where(col("k").isNull).count() === 0L)
  }

  test("followAggregateChanges keeps a live retraction view exact") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    val cp = tmp("graft_f_cp")
    TxTable.append(spark, src,
      Seq(("a", 1L, Some(10L)), ("b", 2L, Some(20L))).toDF("k", "id", "x"))
    val q = TxFollower.followAggregateChanges(spark, src, dst, "liveagg",
      Seq("k"), Seq("x"), cp, ticksPerSecond = 5)
    try {
      TxTable.merge(spark, src,
        Seq(("a", 3L, Some(30L))).toDF("k", "id", "x"), Seq("id"))
      TxTable.delete(spark, src, col("k") === "b")
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !TxFollower.processedVersion(spark, dst, "liveagg").contains(3L)) {
        Thread.sleep(200)
      }
    } finally q.stop()
    assert(TxFollower.processedVersion(spark, dst, "liveagg").contains(3L))
    aggViewEqualsRecompute(src, dst)
  }

  test("retraction view folds a whole-table overwrite (file-granular feed)") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_f") + "/src"
    val dst = tmp("graft_f") + "/rv"
    TxTable.append(spark, src,
      Seq(("a", 1L, Some(5L))).toDF("k", "id", "x"))
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(1L))
    // overwrite = file-granular delete of every old row + insert of the
    // new snapshot; the signed fold must land on the new state exactly
    TxTable.overwrite(spark, src,
      Seq(("b", 1L, Some(7L)), ("b", 2L, Some(8L))).toDF("k", "id", "x"))
    assert(TxFollower.processAggregateChanges(spark, src, dst, "rv",
      Seq("k"), Seq("x")).contains(2L))
    aggViewEqualsRecompute(src, dst)
    assert(TxTable.read(spark, dst).count() == 1L)
  }
}
