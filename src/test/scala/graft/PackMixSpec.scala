package graft

import org.apache.spark.sql.functions._

import graft.ops.{Packing, Sampling}

case class PackDoc(id: Long, toks: Long)
case class MixDoc(id: Long, payload: String)

class PackingSpec extends SparkSpec {

  private def docs(n: Int) =
    df((1 to n).map(i => PackDoc(i.toLong, (i % 7 + 1) * 10L)))

  test("packSequences is a partition of the input (every doc, exactly once)") {
    val in = docs(200)
    val packed = Packing.packSequences(in, "id", "toks", budget = 100L, streams = 4)
    assert(packed.count() === 200)
    assert(packed.select("id").distinct().count() === 200)
    assert(packed.filter(col("pack_stream").isNull || col("pack_chunk").isNull)
      .count() === 0)
  }

  test("offsets are the exclusive prefix sums of each stream and chunks are offset/budget") {
    val in = docs(120)
    val packed = Packing
      .packSequences(in, "id", "toks", budget = 128L, streams = 3)
      .collect()
      .map(r => (r.getAs[Long]("pack_stream"),
        r.getAs[Long]("id"), r.getAs[Long]("toks"),
        r.getAs[Long]("pack_offset"), r.getAs[Long]("pack_chunk")))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var running = 0L
      rows.sortBy(_._2).foreach { case (_, _, toks, offset, chunk) =>
        assert(offset === running)
        assert(chunk === offset / 128L)
        running += toks
      }
    }
  }

  test("assignment is invariant under repartitioning (deterministic at scale)") {
    val in = docs(150)
    val a = Packing.packSequences(in, "id", "toks", 100L, 5)
      .select("id", "pack_stream", "pack_offset", "pack_chunk")
    val b = Packing.packSequences(in.repartition(7), "id", "toks", 100L, 5)
      .select("id", "pack_stream", "pack_offset", "pack_chunk")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("every chunk except a stream's last starts within budget of the previous") {
    // contiguity: chunk ids within a stream are 0..maxChunk with no gaps
    // larger than one straddling doc can explain — i.e. a doc larger than
    // the budget may skip chunks, otherwise chunk ids are dense
    val in = df((1 to 50).map(i => PackDoc(i.toLong, 30L))) // all docs < budget
    val packed = Packing.packSequences(in, "id", "toks", 100L, 2)
    val perStream = packed.groupBy("pack_stream")
      .agg(max("pack_chunk").as("mx"), countDistinct("pack_chunk").as("nd"))
      .collect()
    perStream.foreach(r =>
      assert(r.getAs[Long]("nd") === r.getAs[Long]("mx") + 1)) // dense 0..mx
  }

  test("chunkSummary accounts for all tokens and keeps chunks non-empty") {
    val in = docs(80)
    val packed = Packing.packSequences(in, "id", "toks", 200L, 4)
    val summary = Packing.chunkSummary(packed, "toks").collect()
    assert(summary.map(_.getAs[Long]("tokens_started")).sum ===
      (1 to 80).map(i => (i % 7 + 1) * 10L).sum)
    summary.foreach(r => assert(r.getAs[Long]("docs") >= 1L))
  }

  test("assignShards: exact-size shards, partitioning-invariant, dense ids") {
    val in = docs(230)
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.assignShards(d, Seq(col("toks").desc, col("id").asc), 50)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val a = run(in)
    assert(a === run(in.repartition(13)))
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes === Map(0 -> 50, 1 -> 50, 2 -> 50, 3 -> 50, 4 -> 30),
      "4 full shards of 50 + a 30-row tail")
  }

  test("writeShards lands ONE ordered file per shard on disk") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/out"
    val n = Packing.writeShards(docs(170), dir,
      Seq(col("toks").desc, col("id").asc), 64)
    assert(n === 3) // 64 + 64 + 42
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.map(_.getName).sorted.toSeq ===
      Seq("shard=0", "shard=1", "shard=2"))
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName}: one file per shard")
    }
    // round-trip: all rows, right sizes, each file in shard order
    val back = spark.read.parquet(dir)
    assert(back.count() === 170)
    val sizes = back.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes === Map(0 -> 64L, 1 -> 64L, 2 -> 42L))
    val shard0 = spark.read
      .parquet(dir + "/shard=0").collect()
      .map(r => (r.getAs[Long]("toks"), r.getAs[Long]("id")))
    assert(shard0.toSeq === shard0.sortBy { case (t, id) => (-t, id) }.toSeq,
      "rows within a shard file follow the declared order")
  }
}

class PackingEmptySpec extends SparkSpec {
  test("writeShards on an empty frame writes zero shards, no NPE") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_empty").toString + "/out"
    val empty = df(Seq.empty[MixDoc])
    val n = graft.ops.Packing.writeShards(empty, dir,
      Seq(org.apache.spark.sql.functions.col("id").asc), 64)
    assert(n === 0)
    val root = new java.io.File(dir)
    assert(root.exists &&
      !root.listFiles().exists(_.getName.startsWith("shard=")))
  }
}

class MixCorporaSpec extends SparkSpec {

  private def corpus(n: Int, tag: String) =
    df((1 to n).map(i => MixDoc(i.toLong, tag)))

  test("bottleneck source is kept whole; others downsample to the weights") {
    // b is the bottleneck: 100 docs at weight 0.5 → perUnit = 200;
    // a supplies 0.5*200/1000 = 10% of its 1000 docs
    val a = corpus(1000, "a")
    val b = corpus(100, "b")
    val mixed = Sampling.mixCorpora(
      Seq(("a", a, 0.5), ("b", b, 0.5)), "id")
    val byTag = mixed.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag("b") === 100L) // fraction clamps to 1.0 → whole source
    // hash sampling: ~100 of a's 1000, loose band
    assert(byTag("a") > 60L && byTag("a") < 140L)
  }

  test("selection is deterministic and repartition-invariant") {
    val a = corpus(500, "a")
    val b = corpus(300, "b")
    val m1 = Sampling.mixCorpora(Seq(("a", a, 0.7), ("b", b, 0.3)), "id")
      .select("id", "mix_source")
    val m2 = Sampling.mixCorpora(
        Seq(("a", a.repartition(11), 0.7), ("b", b.repartition(3), 0.3)), "id")
      .select("id", "mix_source")
    assert(m1.except(m2).count() === 0 && m2.except(m1).count() === 0)
  }

  test("weights are relative: scaling all weights changes nothing") {
    val a = corpus(400, "a")
    val b = corpus(200, "b")
    val m1 = Sampling.mixCorpora(Seq(("a", a, 0.6), ("b", b, 0.4)), "id")
      .select("id", "mix_source")
    val m2 = Sampling.mixCorpora(Seq(("a", a, 6.0), ("b", b, 4.0)), "id")
      .select("id", "mix_source")
    assert(m1.except(m2).count() === 0 && m2.except(m1).count() === 0)
  }

  test("empty source is refused loudly (it would zero the whole mix)") {
    // perUnit = min over sources, so an empty source silently empties
    // EVERYTHING — refusing is the only honest answer (the caller
    // drops the source or fixes the upstream filter)
    val a = corpus(100, "a")
    val b = corpus(0, "b")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq(("a", a, 0.5), ("b", b, 0.5)), "id")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("duplicate source names are rejected") {
    val a = corpus(10, "a")
    intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq(("a", a, 0.5), ("a", a, 0.5)), "id")
    }
  }

  test("splitByHash is disjoint, total, and roughly proportional") {
    val rows = corpus(5000, "s")
    val split = Sampling.splitByHash(rows, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() === 5000L) // total: every row labeled exactly once
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 3800 && byLabel("train") < 4200)
    assert(byLabel("val") > 350 && byLabel("val") < 650)
    assert(byLabel("test") > 350 && byLabel("test") < 650)
  }

  test("splitByHash: same id gets the same split across tables and partitionings") {
    val splits = Seq("train" -> 0.9, "test" -> 0.1)
    val left = Sampling.splitByHash(corpus(800, "x"), "id", splits)
      .select("id", "split")
    val right = Sampling.splitByHash(corpus(800, "y").repartition(13), "id", splits)
      .select("id", "split")
    assert(left.join(right, Seq("id"))
      .filter(left("split") =!= right("split")).count() === 0L)
  }

  test("splitByHash rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(corpus(10, "s"), "id",
        Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("temperatureMix flattens the head: small groups keep a larger fraction") {
    // sizes 800 / 200 / 50: sqrt weights boost the tail
    val docs = df((1L to 800L).map(MixDoc(_, "big")) ++
      (1001L to 1200L).map(MixDoc(_, "mid")) ++
      (2001L to 2050L).map(MixDoc(_, "small")))
    val out = Sampling.temperatureMix(docs, "payload", "id",
      targetFraction = 0.5)
    val kept = out.groupBy("payload").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = Map("big" -> kept.getOrElse("big", 0L) / 800.0,
      "mid" -> kept.getOrElse("mid", 0L) / 200.0,
      "small" -> kept.getOrElse("small", 0L) / 50.0)
    // expected f: big .394, mid .787, small 1.0 (capped) at tf=0.5
    assert(frac("big") < frac("mid") && frac("mid") < frac("small"),
      s"temperature must invert size order: $frac")
    assert(kept("small") === 50L, "smallest group hits the f=1 cap, kept whole")
    // hash sampling around the expected cuts, loose bands
    assert(frac("big") > 0.30 && frac("big") < 0.50, frac.toString)
    assert(frac("mid") > 0.65 && frac("mid") < 0.92, frac.toString)
    // uniform sizes degrade to plain targetFraction sampling: cuts equal
    val uni = df((1L to 300L).map(i =>
      MixDoc(i, if (i <= 100) "a" else if (i <= 200) "b" else "c")))
    val uniKept = Sampling.temperatureMix(uni, "payload", "id",
        targetFraction = 0.4)
      .groupBy("payload").count().collect()
      .map(r => r.getLong(1)).toSeq
    val plain = Sampling.consistentSample(uni, "id", 0.4)
      .groupBy("payload").count().collect().map(r => r.getLong(1)).toSeq
    assert(uniKept.sorted == plain.sorted,
      "equal sizes => every cut equals round(tf * buckets) => same selection")
  }

  test("temperatureMix samples null groups instead of dropping them") {
    val s = spark
    import s.implicits._
    val docs = ((1L to 100L).map(i => (i, Some("a"))) ++
      (201L to 300L).map(i => (i, Option.empty[String])))
      .toDF("id", "grp")
    val out = Sampling.temperatureMix(docs, "grp", "id", 1.0)
    // tf=1 with equal group sizes -> every cut is the full bucket
    // range -> everything kept, INCLUDING the null group
    assert(out.count() === 200L,
      "null-group rows must be sampled, not silently dropped")
    assert(out.filter(col("grp").isNull).count() === 100L)
  }

  test("temperatureMix is deterministic and repartition-invariant") {
    val docs = df((1L to 400L).map(MixDoc(_, "a")) ++
      (5001L to 5100L).map(MixDoc(_, "b")))
    val m1 = Sampling.temperatureMix(docs, "payload", "id", 0.6)
      .select("id", "payload")
    val m2 = Sampling.temperatureMix(docs.repartition(7), "payload", "id", 0.6)
      .select("id", "payload")
    assert(m1.except(m2).count() === 0 && m2.except(m1).count() === 0)
  }
}
