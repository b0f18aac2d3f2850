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

  test("KLL quantiles: shard → union → query within rank-error of exact") {
    val s = spark
    import s.implicits._
    // 30k values, known distribution: value = i, uniform over [0, 30000)
    val vals = (0 until 30000).map(i => (i % 3, i.toDouble)).toDF("day", "x")
    val perDay = Sketches.kllSketch(vals, Seq(col("day")), col("x"))
    assert(perDay.count() == 3)
    val merged = Sketches.kllUnion(perDay, Seq.empty)
      .withColumn("q", Sketches.kllQuantiles(col("kll"), Seq(0.1, 0.5, 0.9)))
    val qs = merged.head().getAs[scala.collection.Seq[Double]]("q")
    // normalized rank error at k=200 is ~1.65%; allow 3x margin on the
    // VALUE scale (uniform data: rank error == value error)
    val expected = Seq(3000.0, 15000.0, 27000.0)
    qs.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 30000 * 0.05, s"quantile $got vs $exp")
    }
    // one-shot form agrees with its own decomposition's error envelope
    val oneShot = Sketches.approxQuantiles(vals, Seq.empty, col("x"),
      Seq(0.5)).head().getAs[scala.collection.Seq[Double]]("quantiles")
    assert(math.abs(oneShot.head - 15000.0) < 30000 * 0.05)
  }

  test("frequent items: planted heavy hitters surface, no false positives") {
    val s = spark
    import s.implicits._
    // 2 planted heavy hitters among a long uniform tail
    val tokens = ((0 until 5000).map(_ => "the") ++
      (0 until 3000).map(_ => "of") ++
      (0 until 20000).map(i => s"rare${i % 10000}"))
    val df = scala.util.Random.shuffle(tokens).zipWithIndex
      .map { case (t, i) => (i % 4, t) }.toDF("shard", "tok")
    val perShard = Sketches.freqSketch(df, Seq(col("shard")), col("tok"))
    val top = Sketches.freqUnion(perShard, Seq.empty)
      .withColumn("top", Sketches.freqTopItems(col("freq"), 5))
      .select(explode(col("top")).as("r"))
      .select(col("r.item"), col("r.estimate"), col("r.lower"), col("r.upper"))
      .collect()
    val items = top.map(_.getString(0)).toSeq
    assert(items.take(2).toSet == Set("the", "of"),
      s"planted heavy hitters must rank first, got $items")
    top.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3),
        "estimate within its own bounds")
    }
    val theRow = top.find(_.getString(0) == "the").get
    assert(theRow.getLong(2) <= 5000 && 5000 <= theRow.getLong(3),
      "true count inside [lower, upper]")
  }

  test("approxQuantilesChecked: exact_q is the rank element, envelope holds") {
    val s = spark
    import s.implicits._
    // two groups with different spreads; values shuffled by hash order
    val raw = (1 to 500).map(i =>
      (s"g${i % 2}", ((i * 131) % 997).toDouble))
    val got = Sketches.approxQuantilesChecked(
        raw.toDF("grp", "v"), "grp", col("v"), Seq(0.25, 0.5, 0.9))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size === 6)
    val byGrp = raw.groupBy(_._1)
    got.foreach { case ((g, p), (exactQ, ok)) =>
      val vs = byGrp(g).map(_._2).sorted
      val ref = vs(math.max(1, math.ceil(p * vs.size).toLong).toInt - 1)
      assert(exactQ === ref, s"exact_q for ($g, $p)")
      assert(ok, s"KLL estimate outside envelope for ($g, $p)")
    }
  }

  test("approxDistinctChecked: exact counts exposed, envelope holds per group") {
    val s = spark
    import s.implicits._
    // groups spanning HLL regimes: ~3000, ~300, 3 distinct values
    val data = (1 to 6000).map { i =>
      val g = if (i <= 3000) "big" else if (i <= 5700) "mid" else "tiny"
      val v = g match {
        case "big" => i.toLong // all distinct
        case "mid" => (i % 300).toLong
        case _ => (i % 3).toLong
      }
      (g, v)
    }
    val got = Sketches.approxDistinctChecked(data.toDF("g", "v"), "g", col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got("big")._1 === 3000L && got("mid")._1 === 300L &&
      got("tiny")._1 === 3L)
    assert(got.values.forall(_._2), s"estimate out of envelope: $got")
  }

  test("approxQuantilesChecked refuses degenerate probs and tolerance") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Sketches.approxQuantilesChecked(df, "grp", col("v"), Seq(0.0, 0.5))
    }
    intercept[IllegalArgumentException] {
      Sketches.approxQuantilesChecked(df, "grp", col("v"), Seq(0.5), tol = 0)
    }
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

  test("sketch-table lifecycle: O(batch) append serves like a full rebuild") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hllg").toString + "/sketches"
    Sketches.writeHllGrains(events.filter(col("day") < 2), dir,
      Seq("day"), col("user"))
    Sketches.appendHllGrains(spark, dir, events.filter(col("day") === 2),
      Seq("day"), col("user"))
    val served = Sketches.hllServe(spark, dir, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = Sketches.approxDistinct(events, Seq(col("day")),
        col("user"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(served === direct,
      "append path must serve exactly what a full rebuild serves")
    // range serve: filter grains, union the rest
    val range = Sketches.hllServe(spark, dir, Seq("day"),
        where = col("day") >= 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(range === direct.filter(_._1 >= 1))
  }

  test("re-appending an overlapping grain cannot inflate a distinct") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hlli").toString + "/sketches"
    Sketches.writeHllGrains(events, dir, Seq("day"), col("user"))
    val before = Sketches.hllServe(spark, dir, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // re-ingest day 1's rows wholesale (the double-load accident)
    Sketches.appendHllGrains(spark, dir, events.filter(col("day") === 1),
      Seq("day"), col("user"))
    val after = Sketches.hllServe(spark, dir, Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after === before, "HLL union is idempotent — register max")
  }

  test("KLL grain table: append serves the same quantiles as a rebuild") {
    val s = spark
    import s.implicits._
    val vals = (0 until 9000).map { i =>
      (i % 3, ((i * 2654435761L) % 10000).toDouble) }.toDF("day", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kllg").toString + "/sketches"
    Sketches.writeKllGrains(vals.filter(col("day") < 2), dir,
      Seq("day"), col("v"))
    Sketches.appendKllGrains(spark, dir, vals.filter(col("day") === 2),
      Seq("day"), col("v"))
    val probs = Seq(0.25, 0.5, 0.75)
    val served = Sketches.kllServe(spark, dir, Seq("day"), probs)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val direct = Sketches.approxQuantiles(vals, Seq(col("day")),
        col("v"), probs)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // KLL compaction is randomized — unlike HLL's register max, two
    // sketches of the same data are only rank-error-equal, so the pin
    // is the shared ±2% envelope (values ≈ ranks on this uniform
    // fixture), not bit equality
    served.foreach { case (day, qs) =>
      qs.zip(direct(day)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 0.02 * 10000,
          s"day $day: served $a vs direct $b exceed the shared envelope")
      }
    }
    // the checked form stays inside the envelope end to end
    val checked = Sketches.kllServeChecked(spark, dir, vals, "day",
      col("v"), probs)
    assert(checked.filter(!col("kll_ok")).count() === 0L)
    assert(checked.count() === 9L)
  }

  test("KLL txn token: a replayed batch is a no-op — quantiles don't double-weight") {
    val s = spark
    import s.implicits._
    // masses chosen so the TRUE median flips cluster only under a
    // double-merge: 4000 low + 3000 high → median rank 3500 sits in
    // the LOW cluster (≤ 99); replaying the high batch once more
    // (4000 low + 6000 high) moves rank 5000 into the HIGH cluster
    // (≥ 9000). The 8900-wide gap dwarfs KLL rank error at any k, so
    // the assertion is deterministic despite randomized compaction.
    // (KLL re-merge double-weights, unlike HLL's idempotent register
    // max — this is where the token is load-bearing, not hygiene.)
    val base = (0 until 4000).map(i => (0, (i % 100).toDouble))
      .toDF("day", "v")
    val batch = (0 until 3000).map(i => (0, 9000.0 + i % 100))
      .toDF("day", "v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_klltx").toString + "/sketches"
    Sketches.writeKllGrains(base, dir, Seq("day"), col("v"))
    Sketches.appendKllGrains(spark, dir, batch, Seq("day"), col("v"),
      txn = Some(("kll_m", 0L)))
    val vAfter = graft.ops.TxTable.versions(spark, dir).last
    def median() = Sketches.kllServe(spark, dir, Seq("day"), Seq(0.5))
      .collect().head.getSeq[Double](1).head
    val m1 = median()
    assert(m1 < 1000.0, s"fixture: true median is in the low cluster, got $m1")
    // checkpoint replay of the SAME batch id: no commit, same median
    Sketches.appendKllGrains(spark, dir, batch, Seq("day"), col("v"),
      txn = Some(("kll_m", 0L)))
    assert(graft.ops.TxTable.versions(spark, dir).last === vAfter,
      "replayed batch must not commit")
    // NOT bit-equality: kllServe re-unions the stored sketches per
    // call and KLL union compaction is randomized, so two serves of
    // the SAME table can differ by a rank (the documented
    // envelope-equal contract). The skip is pinned structurally (no
    // commit above); the quantile check is cluster membership.
    assert(median() < 1000.0,
      "after the skipped replay the median must stay in the low cluster")
    // the CONTRAST: the same replay WITHOUT the token commits a
    // duplicate sketch and double-weights the high rows — the median
    // jumps clusters
    Sketches.appendKllGrains(spark, dir, batch, Seq("day"), col("v"))
    assert(median() > 8000.0,
      s"untokened replay must double-weight (median $m1 -> ${median()})")
  }

  test("appendKllGrains refuses a table without KLL meta") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kllx").toString + "/plain"
    graft.ops.TxTable.overwrite(spark, dir, events.limit(5))
    val ex = intercept[RuntimeException] {
      Sketches.appendKllGrains(spark, dir, events.limit(5),
        Seq("day"), col("user"))
    }
    assert(ex.getMessage.contains("not a KLL sketch table"))
  }

  test("appendHllGrains refuses a table without sketch meta") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hllx").toString + "/plain"
    graft.ops.TxTable.overwrite(spark, dir,
      events.limit(5))
    val ex = intercept[RuntimeException] {
      Sketches.appendHllGrains(spark, dir, events.limit(5),
        Seq("day"), col("user"))
    }
    assert(ex.getMessage.contains("not a sketch table"))
  }
}
