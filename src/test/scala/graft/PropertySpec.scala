package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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

  test("change-feed replay reconciles with the snapshot for random DML sequences") {
    val s = spark
    import s.implicits._
    import graft.ops.TxTable
    // a random program of merges/deletes/updates over a small key space
    // (collisions guaranteed); invariant: base snapshot + readChanges
    // replayed per key in version order == head snapshot, ALWAYS
    sealed trait Op
    case class M(kvs: List[(Long, Long)]) extends Op
    case class D(k: Long) extends Op
    case class U(k: Long, v: Long) extends Op
    val opGen: Gen[Op] = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 12L),
        Gen.chooseNum(-99L, 99L))).map(l => M(l.take(4))),
      Gen.chooseNum(0L, 12L).map(D(_)),
      Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(-99L, 99L))
        .map { case (k, v) => U(k, v) })
    val progGen = Gen.nonEmptyListOf(opGen).map(_.take(5))
    for ((prog, i) <- samples(progGen, 3).zipWithIndex) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cdfprop$i").toString + "/t"
      TxTable.append(spark, dir,
        (0L until 8L).map(k => (k, 0L)).toDF("id", "v").repartition(2))
      prog.foreach {
        case M(kvs) =>
          TxTable.merge(spark, dir,
            kvs.toMap.toSeq.toDF("id", "v"), Seq("id")); ()
        case D(k) => TxTable.delete(spark, dir, col("id") === k); ()
        case U(k, v) =>
          TxTable.update(spark, dir, col("id") === k,
            Map("v" -> lit(v))); ()
      }
      val head = TxTable.versions(spark, dir).last
      val base = TxTable.readVersion(spark, dir, 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val changes = TxTable.readChanges(spark, dir, 1L, head).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      var state = base
      changes.filter(c => c._3 != "update_preimage").sortBy(_._4)
        .foreach {
          case (k, v, "insert", _) => state += k -> v
          case (k, v, "update_postimage", _) => state += k -> v
          case (k, _, "delete", _) => state -= k
          case _ => ()
        }
      val got = TxTable.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == state,
        s"replay mismatch for program $prog: replayed=$state head=$got")
    }
  }

  test("stats-pruned readWhere equals the unpruned filter for random And/Or predicates") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prop_prune").toString + "/t"
    // several files with disjoint id ranges + a partition column, so
    // pruning has real decisions to make on both stats kinds
    (0 until 4).foreach { b =>
      TxTable.append(spark, dir,
        (b * 10 until b * 10 + 10).map(i =>
          (i.toLong, s"v$i", b % 2)).toDF("id", "v", "part")
          .coalesce(1), partitionCols = Seq("part"))
    }
    val full = TxTable.read(spark, dir)
    val leafGen: Gen[org.apache.spark.sql.Column] = for {
      c <- Gen.oneOf("id", "part")
      n <- Gen.choose(-5L, 45L)
      op <- Gen.choose(0, 4)
    } yield op match {
      case 0 => col(c) === n
      case 1 => col(c) < n
      case 2 => col(c) >= n
      case 3 => col(c) <=> n
      case _ => col(c) =!= n
    }
    def predGen(depth: Int): Gen[org.apache.spark.sql.Column] =
      if (depth == 0) leafGen
      else Gen.oneOf(
        leafGen,
        for { a <- predGen(depth - 1); b <- predGen(depth - 1) } yield a || b,
        for { a <- predGen(depth - 1); b <- predGen(depth - 1) } yield a && b)
    samples(predGen(2), n = 12).foreach { pred =>
      val pruned = TxTable.readWhere(spark, dir, pred)
        .collect().map(_.toSeq).toSet
      val scan = full.filter(pred).collect().map(_.toSeq).toSet
      assert(pruned == scan,
        s"pruned read diverged from the full filter under $pred")
    }
  }

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

  test("native md5Hash60 is bit-identical to the conv/substring/md5 formulation") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(200)),
      Gen.listOf(Gen.oneOf("ä", "ß", "中", "🎯", " ", "\t", "a"))
        .map(_.mkString),
      Gen.const(""))
    val strs = samples(strGen, 40) ++ Seq("", "a", "exact", "\u0000weird")
    val s = spark
    import s.implicits._
    val in = strs.toDF("t")
    val out = in.select(
        graft.text.TextAnalysis.md5Hash60(col("t")).as("native"),
        graft.text.TextAnalysis.md5Hash60Sql(col("t")).as("legacy"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"md5Hash60 mismatch: native=${r.getLong(0)} legacy=${r.getLong(1)}"))
    assert(out.forall(_.getLong(0) >= 0), "60-bit hash must be non-negative")
    // null propagates
    assert(Seq[Option[String]](None).toDF("t")
      .select(graft.text.TextAnalysis.md5Hash60(col("t"))).head().isNullAt(0))
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

  test("span dedup equals an in-memory reference model on random colliding corpora") {
    val k = 3
    // tiny alphabet → plenty of cross-doc and within-doc window
    // collisions at length-3 windows
    val docGen = Gen.listOf(Gen.chooseNum(0, 4).map(i => s"w$i")).map(_.take(24))
    val corpusGen = Gen.listOfN(6, docGen)
    for (docs0 <- samples(corpusGen, 4)) {
      val s = spark
      import s.implicits._
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      // reference: global (doc, pos) first-wins over sliding k-windows,
      // coverage union, islands
      val occs = for {
        (ws, i) <- docs0.zipWithIndex
        p <- 0 to ws.length - k
      } yield (ws.slice(p, p + k).mkString(" "), i.toLong, p)
      val first = occs.groupBy(_._1).map { case (w, os) =>
        w -> os.minBy(o => (o._2, o._3)) }
      val covered: Map[Long, Set[Int]] = occs.filterNot(o => first(o._1) == o)
        .groupBy(_._2)
        .map { case (d, os) => d -> os.flatMap(o => o._3 until o._3 + k).toSet }
        .withDefaultValue(Set.empty)
      val expected = docs0.zipWithIndex.map { case (ws, i) =>
        val cov = covered(i.toLong).toSeq.sorted
        // sentinel -2: a covered position 0 still OPENS an island (-1
        // would read as its predecessor and swallow the first break)
        val spans = cov.zip(-2 +: cov).count { case (c, prev) => c != prev + 1 }
        val stripped = ws.zipWithIndex
          .collect { case (w, p) if !covered(i.toLong)(p) => w }.mkString(" ")
        (i.toLong, ws.length, cov.size, spans, stripped)
      }.sortBy(_._1)
      val got = graft.dedup.SpanDedup
        .stripDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4))).toSeq
      assert(got === expected)
    }
  }

  test("phrase search equals a sliding-window reference on random colliding corpora") {
    // tiny alphabet → dense phrase collisions; phrases of length 1..3
    // drawn from the same alphabet so hits, misses, overlaps and
    // repeated-token phrases all occur
    val wordGen = Gen.chooseNum(0, 3).map(i => s"w$i")
    val docGen = Gen.listOf(wordGen).map(_.take(20))
    val corpusGen = Gen.listOfN(5, docGen)
    val phraseGen = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, wordGen))
    for ((docs0, phrases0) <- samples(Gen.zip(corpusGen,
        Gen.listOfN(3, phraseGen)), 4)) {
      val s = spark
      import s.implicits._
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      val idx = java.nio.file.Files.createTempDirectory("graft_phprop")
        .toString + "/idx"
      graft.text.Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id",
        "text", idx)
      val queries = phrases0.zipWithIndex.map { case (p, qi) =>
        (s"q$qi", p.mkString(" ")) }
      // reference: count sliding-window equality per (phrase, doc)
      val expected = (for {
        (p, qi) <- phrases0.zipWithIndex
        (ws, di) <- docs0.zipWithIndex
        n = p.length
        occ = (0 to ws.length - n).count(j => ws.slice(j, j + n) == p)
        if occ > 0
      } yield (s"q$qi", di.toLong, occ.toLong)).toSet
      val got = graft.text.Bm25
        .phraseSearchIndexed(spark, idx, queries, topK = 100)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected,
        s"phrases=$phrases0 docs=${docs.map(_._2)}")
    }
  }

  test("NEAR equals a window-containment reference on random colliding corpora") {
    // same tiny alphabet as the phrase pin; windows 2..5 so clamped
    // starts, duplicate tokens, and multi-window overlaps all occur.
    // Reference: start s matches iff EVERY distinct query token occurs
    // in positions [s, s+w-1] — exactly the vote-count semantics.
    val wordGen = Gen.chooseNum(0, 3).map(i => s"w$i")
    val docGen = Gen.listOf(wordGen).map(_.take(20))
    val corpusGen = Gen.listOfN(5, docGen)
    val queryGen = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, wordGen))
    for (((docs0, queries0), w) <- samples(Gen.zip(Gen.zip(corpusGen,
        Gen.listOfN(3, queryGen)), Gen.chooseNum(2, 5)), 4)) {
      val s = spark
      import s.implicits._
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      val idx = java.nio.file.Files.createTempDirectory("graft_nearprop")
        .toString + "/idx"
      graft.text.Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id",
        "text", idx)
      val queries = queries0.zipWithIndex.map { case (q, qi) =>
        (s"q$qi", q.mkString(" ")) }
      val expected = (for {
        (q, qi) <- queries0.zipWithIndex
        toks = q.distinct
        (ws, di) <- docs0.zipWithIndex
        nw = (0 until ws.length).count { st =>
          val win = ws.slice(st, st + w).toSet
          toks.forall(win.contains)
        }
        if nw > 0
      } yield (s"q$qi", di.toLong, nw.toLong)).toSet
      val got = graft.text.Bm25
        .proximitySearchIndexed(spark, idx, queries, window = w,
          topK = 100)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === expected,
        s"w=$w queries=$queries0 docs=${docs.map(_._2)}")
    }
  }

  test("boolean retrieval's gate equals a reference set on random corpora") {
    // the property is the MUST/SHOULD/MUST_NOT gate (scores are the
    // oracled BM25 arithmetic): candidates = docs matching >= 1
    // scoring term, containing EVERY must token and NO mustNot token
    val wordGen = Gen.chooseNum(0, 4).map(i => s"w$i")
    val docGen = Gen.listOf(wordGen).map(_.take(15))
    val corpusGen = Gen.listOfN(6, docGen)
    val roleGen = for {
      must <- Gen.listOfN(2, wordGen).map(_.take(2))
      should <- Gen.listOfN(2, wordGen)
      mustNot <- Gen.listOfN(1, wordGen)
      if must.nonEmpty || should.nonEmpty
    } yield (must, should, mustNot)
    for ((docs0, qs) <- samples(Gen.zip(corpusGen,
        Gen.listOfN(3, roleGen)), 4)) {
      val s = spark
      import s.implicits._
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      val idx = java.nio.file.Files.createTempDirectory("graft_boolprop")
        .toString + "/idx"
      graft.text.Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id",
        "text", idx)
      val queries = qs.zipWithIndex.map { case ((m, sh, n), qi) =>
        graft.text.Bm25.BooleanQuery(s"q$qi", m.mkString(" "),
          sh.mkString(" "), n.mkString(" ")) }
      val expected = (for {
        ((m, sh, n), qi) <- qs.zipWithIndex
        scoring = (m ++ sh).distinct
        (ws, di) <- docs0.zipWithIndex
        toks = ws.toSet
        if scoring.exists(toks.contains) &&
          m.forall(toks.contains) && !n.exists(toks.contains)
      } yield (s"q$qi", di.toLong)).toSet
      val got = graft.text.Bm25
        .booleanSearchIndexed(spark, idx, queries, topK = 100)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(got === expected, s"qs=$qs docs=${docs.map(_._2)}")
    }
  }

  test("stateful sessionizer equals batch session_window on random multi-batch streams") {
    import graft.streaming.StreamingWindows
    import graft.streaming.StreamingWindows.SessionEvent
    import graft.events.EventWindows
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // events inside one hour for 3 users; gap 60 s; the far-future
    // pusher in the final batch closes everything
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 3L),
      Gen.chooseNum(0L, 3600L),
      Gen.chooseNum(1, 9))).map(_.take(30))
    for ((rows, i) <- samples(evGen, 4).zipWithIndex) {
      val s = spark
      import s.implicits._
      implicit val sqlCtx = spark.sqlContext
      val events = rows.map { case (u, off, v) =>
        SessionEvent(u, new java.sql.Timestamp(base + off * 1000), v.toDouble) }
      val mem = MemoryStream[SessionEvent]
      // watermark longer than the whole event span: cross-batch
      // disorder is then always within-watermark, so no event is
      // legitimately dropped and batch parity must be exact
      val out = StreamingWindows.sessionizeStateful(mem.toDS(),
        gapMs = 60 * 1000, watermark = "2 hours")
      val name = s"sess_prop_$i"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // split into batches at arbitrary points — cross-batch order is
      // NOT time-sorted, exercising out-of-order merge and bridging
      events.grouped(math.max(1, events.length / 3)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      mem.addData(SessionEvent(99, new java.sql.Timestamp(
        base + 100L * 24 * 3600 * 1000), 0.0))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(name).filter(col("user_id") =!= 99)
        .select("user_id", "wstart", "wend", "n", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = EventWindows.sessionize(df(events), "ts", "60 seconds",
          Seq("user_id"),
          Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
        .select("user_id", "wstart", "wend", "n", "total_value")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"sessionizer diverged from session_window for $events")
    }
  }

  test("retraction aggregate view equals recompute for random DML programs") {
    val s = spark
    import s.implicits._
    import graft.ops.TxTable
    import graft.streaming.TxFollower
    // random programs over a tiny key space with NULL group keys and
    // NULL sum values in play; invariant after EVERY increment: the
    // persisted view == a from-scratch groupBy of the source head
    sealed trait Op
    case class App(rows: List[(Option[String], Long, Option[Long])]) extends Op
    case class Mrg(rows: List[(Option[String], Long, Option[Long])]) extends Op
    case class Del(mod: Long) extends Op
    val grp = Gen.oneOf(Gen.const(Option.empty[String]),
      Gen.oneOf("a", "b", "c").map(Some(_)))
    val rowGen = Gen.zip(grp, Gen.chooseNum(0L, 9L),
      Gen.oneOf(Gen.const(Option.empty[Long]),
        Gen.chooseNum(-50L, 50L).map(Some(_))))
    val opGen: Gen[Op] = Gen.oneOf(
      Gen.nonEmptyListOf(rowGen).map(l => App(l.take(3))),
      Gen.nonEmptyListOf(rowGen).map(l => Mrg(l.take(3))),
      Gen.chooseNum(2L, 4L).map(Del(_)))
    val progGen = Gen.nonEmptyListOf(opGen).map(_.take(4))
    for ((prog, i) <- samples(progGen, 3).zipWithIndex) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_rvprop$i").toString
      val src = root + "/src"
      val dst = root + "/rv"
      // ids must be unique per append so merges hit deterministic keys
      var nextId = 100L
      def df(rows: List[(Option[String], Long, Option[Long])],
             freshIds: Boolean) = {
        val r = if (!freshIds) rows
          else rows.map { t => nextId += 1; (t._1, nextId, t._3) }
        r.toDF("k", "id", "x")
      }
      TxTable.append(spark, src,
        df(List((Some("a"), 1L, Some(5L)), (None, 2L, None)),
          freshIds = false))
      TxFollower.processAggregateChanges(spark, src, dst, "rvp",
        Seq("k"), Seq("x"))
      prog.foreach { op =>
        op match {
          case App(rows) => TxTable.append(spark, src, df(rows, freshIds = true))
          case Mrg(rows) => TxTable.merge(spark, src,
            df(rows, freshIds = false)
              .groupBy("id").agg(first("k").as("k"), first("x").as("x"))
              .select("k", "id", "x"), Seq("id"))
          case Del(m) => TxTable.delete(spark, src, col("id") % m === 0)
        }
        TxFollower.processAggregateChanges(spark, src, dst, "rvp",
          Seq("k"), Seq("x"))
        val want = TxTable.read(spark, src).groupBy("k")
          .agg(count(lit(1)).as("n_rows"), sum("x").as("sum_x"))
          .collect()
          .map(r => Option(r.getString(0)) ->
            ((r.getLong(1), Option(r.get(2))))).toMap
        val got = TxTable.read(spark, dst)
          .select("k", "n_rows", "sum_x").collect()
          .map(r => Option(r.getString(0)) ->
            ((r.getLong(1), Option(r.get(2))))).toMap
        assert(got == want, s"view diverged after $op in program $prog")
      }
    }
  }

  test("metadata aggregates equal the scan for random null-riddled tables") {
    val s = spark
    import s.implicits._
    import graft.ops.TxTable
    val rowGen = Gen.zip(Gen.chooseNum(-1000L, 1000L),
      Gen.oneOf(Gen.const(Option.empty[Long]),
        Gen.chooseNum(-99L, 99L).map(Some(_))))
    val tableGen = Gen.nonEmptyListOf(Gen.nonEmptyListOf(rowGen)
      .map(_.take(6))).map(_.take(3)) // up to 3 commits of up to 6 rows
    for ((commits, i) <- samples(tableGen, 4).zipWithIndex) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_metaprop$i").toString + "/t"
      commits.foreach(rows =>
        TxTable.append(spark, dir, rows.toDF("id", "v").coalesce(1)))
      val scan = TxTable.read(spark, dir)
      assert(TxTable.metaRowCount(spark, dir) === Some(scan.count()))
      assert(TxTable.metaColumnCount(spark, dir, "v") ===
        Some(scan.where(col("v").isNotNull).count()))
      val mm = TxTable.metaMinMax(spark, dir, "id")
      val want = scan.agg(min("id"), max("id")).head()
      assert(mm === Some((want.getLong(0).toString,
        want.getLong(1).toString)), s"min/max diverged for table $i")
      // v can be all-null in a file; the column-level extremes must
      // either decline or agree exactly
      val mmV = TxTable.metaMinMax(spark, dir, "v")
      val wantV = scan.agg(min("v"), max("v")).head()
      mmV.foreach { case (lo, hi) =>
        assert(!wantV.isNullAt(0) && lo.toLong == wantV.getLong(0) &&
          hi.toLong == wantV.getLong(1), s"v extremes diverged for table $i")
      }
    }
  }

  test("bloom skipping never loses a row: readWhere ≡ read().where on random probes") {
    val s = spark
    import s.implicits._
    // random multi-file tables with colliding, clustered, and sparse
    // ids; every probe — present or absent — must return exactly the
    // plain filter's rows (blooms may only skip PROVABLY absent files)
    val tableGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 400L)).map(_.take(40)))
      .map(_.take(4))
    samples(tableGen, 4).zipWithIndex.foreach { case (batches, i) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_bloomprop").toString + "/t"
      TxTable.append(spark, dir,
        Seq((0L, "seed")).toDF("id", "name").coalesce(1))
      TxTable.setBloomFilters(spark, dir, Seq("id"), bits = 1024, hashes = 4)
      batches.foreach(b => TxTable.append(spark, dir,
        b.map(v => (v, s"v$v")).toDF("id", "name").coalesce(1)))
      val present = batches.flatten.distinct
      val absent = (0L to 400L).filterNot(present.contains).take(10)
      (present.take(10) ++ absent).foreach { probe =>
        val got = TxTable.readWhere(spark, dir, col("id") === probe)
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
        val want = TxTable.read(spark, dir).where(col("id") === probe)
          .collect().map(_.toSeq).toSeq.sortBy(_.toString)
        assert(got == want, s"table $i probe $probe lost rows")
      }
    }
  }

  test("heap top-k equals the window spelling on random colliding groups") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dataGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 20L))).map(_.take(120))
    samples(dataGen, 5).zipWithIndex.foreach { case (rows, i) =>
      // unique tiebreaker id makes the order total → results comparable
      val data = rows.zipWithIndex
        .map { case ((g, v), id) => (g, v, id.toLong) }
        .toDF("g", "v", "id")
      val got = Windows.topKPerGroupAgg(data.repartition(7), Seq(col("g")),
          Seq(col("v").as("v"), col("id").as("id")), k = 5)
        .select("g", "rank", "v", "id").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      val want = data
        .withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
        .filter(col("rank") <= 5)
        .collect()
        .map(r => (r.getString(0), r.getInt(3)) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == want, s"sample $i diverged")
    }
  }

  test("grouped running sum is partitioning-invariant and equals the window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dataGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("x", "y"), Gen.chooseNum(1L, 9L))).map(_.take(80))
    samples(dataGen, 4).zipWithIndex.foreach { case (rows, i) =>
      val data = rows.zipWithIndex
        .map { case ((g, t), id) => (g, id.toLong, t) }
        .toDF("g", "id", "toks")
      val got = Prefix.groupRunningSum(data.repartition(5), "g",
          Seq(col("id").asc), col("toks"), "rt", partitions = 3)
        .select("id", "rt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = data
        .withColumn("rt", sum("toks").over(
          Window.partitionBy("g").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "rt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"sample $i diverged")
    }
  }

  test("groupPercentRank equals the window percent_rank on random colliding inputs") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // tiny value domain -> guaranteed ties; "z" often a 1-row group
    val dataGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.frequency(5 -> Gen.oneOf("x", "y"), 1 -> Gen.const("z")),
      Gen.chooseNum(0L, 5L))).map(_.take(60))
    samples(dataGen, 4).zipWithIndex.foreach { case (rows, i) =>
      val data = rows.zipWithIndex
        .map { case ((g, v), id) => (id.toLong, g, v) }.toDF("id", "g", "v")
      val got = Prefix.groupPercentRank(data.repartition(5), "g", "v")
        .select("id", "pct_rank").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = data.withColumn("p", percent_rank().over(
          Window.partitionBy("g").orderBy("v")))
        .select("id", "p").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == want, s"sample $i diverged")
    }
  }

  test("groupPercentRank preserves null-group rows (null-safe joins)") {
    val s = spark
    import s.implicits._
    val data = Seq((1L, Some("a"), 10L), (2L, Some("a"), 20L),
      (3L, Option.empty[String], 5L), (4L, Option.empty[String], 7L))
      .toDF("id", "g", "v")
    val out = Prefix.groupPercentRank(data, "g", "v")
      .select("id", "pct_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L),
      "null-group rows must rank within their own group, not vanish")
    assert(out(3L) === 0.0 && out(4L) === 1.0)
    assert(out(1L) === 0.0 && out(2L) === 1.0)
  }

  test("boilerplate strip matches a brute-force reference on random line corpora") {
    // small line pool -> guaranteed df collisions; blank/whitespace
    // lines exercise the "structure, never counted" rule
    val linePool = Seq("nav bar", "footer text", "promo box", "", "  ")
    val lineGen = Gen.oneOf(Gen.oneOf(linePool),
      Gen.chooseNum(0, 999).map(n => s"unique line $n"))
    val docGen = Gen.zip(Gen.nonEmptyListOf(lineGen).map(_.take(4)),
      Gen.oneOf("g1", "g2"))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(12))
    val (maxDocFrac, minDocs) = (0.3, 2)
    samples(corpusGen, 4).zipWithIndex.foreach { case (docs0, i) =>
      val docs = docs0.zipWithIndex.map { case ((ls, g), id) =>
        Doc(id.toLong, ls.mkString("\n"), g)
      }
      val boiler: Map[String, Set[String]] = docs.groupBy(_.source).map {
        case (g, ds) =>
          val dfreq = ds
            .flatMap(_.text.split("\n", -1).filter(_.trim.nonEmpty).distinct)
            .groupBy(identity).view.mapValues(_.size)
          g -> dfreq.collect {
            case (seg, c) if c >= minDocs && c > ds.size * maxDocFrac => seg
          }.toSet
      }
      val want = docs.map { d =>
        val segs = d.text.split("\n", -1)
        val kept = segs.filter(s => s.trim.isEmpty || !boiler(d.source)(s))
        d.doc_id -> ((segs.length, kept.length, kept.mkString("\n")))
      }.toMap
      val got = graft.text.Boilerplate.stripCommonSegments(
          df(docs), "doc_id", "text", "source", maxDocFrac, minDocs)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      assert(got == want, s"sample $i diverged")
    }
  }

  test("span decontamination matches a brute-force reference on random corpora") {
    // 4-token vocab, short docs, k=3 -> dense span collisions
    val k = 3
    val textGen = Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.take(12).mkString(" "))
    val worldGen = Gen.zip(Gen.nonEmptyListOf(textGen).map(_.take(10)),
      Gen.nonEmptyListOf(textGen).map(_.take(3)))
    samples(worldGen, 4).zipWithIndex.foreach { case ((cTexts, eTexts), i) =>
      val corpus = cTexts.zipWithIndex.map { case (t, id) =>
        Doc(id.toLong, t, "c")
      }
      val evalSet = eTexts.zipWithIndex.map { case (t, id) =>
        Doc(1000L + id, t, "e")
      }
      def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
      val evalWins = evalSet.flatMap(d =>
        toks(d.text).sliding(k).filter(_.size == k).map(_.mkString(" "))).toSet
      val want = corpus.map { d =>
        val ts = toks(d.text)
        val starts = (0 to ts.length - k)
          .filter(s => evalWins(ts.slice(s, s + k).mkString(" ")))
        val covered = starts.flatMap(s => s until s + k).toSet
        val spans = covered.toSeq.sorted
          .foldLeft((0, Int.MinValue)) { case ((c, prev), p) =>
            (if (p == prev + 1) c else c + 1, p)
          }._1
        val kept = ts.zipWithIndex.collect {
          case (t, p) if !covered(p) => t
        }
        d.doc_id -> ((ts.length, covered.size, spans, kept.mkString(" ")))
      }.toMap
      val got = graft.dedup.SpanDedup.maskContaminatedSpans(
          df(corpus), df(evalSet), "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
        .toMap
      assert(got == want, s"sample $i diverged")
    }
  }
}
