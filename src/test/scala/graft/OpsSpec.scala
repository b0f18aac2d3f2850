package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.ops._

case class KV(k: String, v: Long)
case class Wide(id: Long, name: String, score: Long, extra: String)
case class LongRow(id: Long, big: Long, small: Long)
case class NullableLong(id: java.lang.Long, big: java.lang.Long)
case class Fact(key: String, x: Long)
case class Dim(key: String, label: String)
case class Game(player: String, game_date: String, team: String, pts: Long)

class ProjectionsSpec extends SparkSpec {
  test("renameAll renames mapped columns, passes others through, keeps order") {
    val out = Projections.renameAll(df(Seq(Wide(1, "a", 2, "x"))),
      Map("id" -> "ident", "score" -> "points"))
    assert(out.columns.toSeq == Seq("ident", "name", "points", "extra"))
    assert(out.collect().head == Row(1L, "a", 2L, "x"))
  }

  test("renameAll with empty map is identity") {
    val in = df(Seq(Wide(1, "a", 2, "x")))
    assert(Projections.renameAll(in, Map.empty).columns.toSeq == in.columns.toSeq)
  }

  test("dropCols drops present columns and ignores absent ones") {
    val out = Projections.dropCols(df(Seq(Wide(1, "a", 2, "x"))), Seq("extra", "nope"))
    assert(out.columns.toSeq == Seq("id", "name", "score"))
  }

  test("selectCols reorders") {
    val out = Projections.selectCols(df(Seq(Wide(1, "a", 2, "x"))), Seq("name", "id"))
    assert(out.columns.toSeq == Seq("name", "id"))
  }
}

class CastingSpec extends SparkSpec {
  test("downcasts longs at the Int.MaxValue boundary, keeps those beyond") {
    // big straddles the boundary: max = 2^31 exactly -> must stay long
    val in = df(Seq(LongRow(1, 2147483647L, 7), LongRow(2, 2147483648L, 8)))
    val out = Casting.safeDowncastLongs(in)
    assert(out.schema("big").dataType == LongType)
    assert(out.schema("small").dataType == IntegerType)
    assert(out.schema("id").dataType == IntegerType)
  }

  test("max exactly Int.MaxValue downcasts; min below Int.MinValue does not") {
    val in = df(Seq(LongRow(1, -2147483649L, 2147483647L)))
    val out = Casting.safeDowncastLongs(in)
    assert(out.schema("big").dataType == LongType,
      "reference checked only max; our documented deviation also guards min")
    assert(out.schema("small").dataType == IntegerType)
  }

  test("all-null long column is left as long, values preserved") {
    val in = df(Seq(NullableLong(1L, null), NullableLong(2L, null)))
    val out = Casting.safeDowncastLongs(in)
    assert(out.schema("big").dataType == LongType)
    assert(out.select("big").collect().forall(_.isNullAt(0)))
  }

  test("no long columns is a no-op") {
    val in = df(Seq(KV("a", 1L))).select(col("k"))
    assert(Casting.safeDowncastLongs(in).schema == in.schema)
  }
}

class JoinsSpec extends SparkSpec {
  val fact = Seq(Fact("a", 1), Fact("b", 2), Fact("orphan", 3))
  val dim = Seq(Dim("a", "A"), Dim("b", "B"), Dim("unused", "U"))

  test("enrich keeps unmatched fact rows with null dim columns (left join)") {
    val out = Joins.enrich(df(fact).as("f"), df(dim).as("d"),
      col("f.key") === col("d.key"))
    assert(out.count() == 3)
    val orphan = out.filter(col("f.key") === "orphan").collect().head
    assert(orphan.isNullAt(out.columns.length - 1))
  }

  test("enrichUsing emits a single coalesced key column") {
    val out = Joins.enrichUsing(df(fact), df(dim), Seq("key"))
    assert(out.columns.count(_ == "key") == 1)
    assert(out.count() == 3)
  }

  test("left join preserves fact count when dim key is unique") {
    val out = Joins.enrichUsing(df(fact), df(dim), Seq("key"))
    assert(out.count() == df(fact).count())
  }
}

class WindowsSpec extends SparkSpec {
  val games = Seq(
    Game("p1", "2024-01-01", "AAA", 10),
    Game("p1", "2024-03-01", "BBB", 20),
    Game("p2", "2024-02-01", "CCC", 30))

  test("topOnePerGroup keeps exactly the latest row per group") {
    val out = Windows.topOnePerGroup(df(games), Seq("player"),
      Seq(col("game_date").desc))
    assert(out.count() == 2)
    assert(out.filter(col("player") === "p1").select("team").collect().head.getString(0) == "BBB")
  }

  test("topOnePerGroup does not clobber a pre-existing __rn0 column") {
    val in = df(games).withColumn("__rn0", lit(99))
    val out = Windows.topOnePerGroup(in, Seq("player"), Seq(col("game_date").desc))
    assert(out.columns.contains("__rn0"))
    assert(out.select("__rn0").collect().forall(_.getInt(0) == 99))
  }

  test("topKPerGroup refuses to clobber an existing rank column") {
    val s = spark
    import s.implicits._
    val in = Seq((1L, "g", 7)).toDF("id", "grp", "rank")
    intercept[IllegalArgumentException](
      Windows.topKPerGroup(in, Seq(col("grp")), Seq(col("id")), 1))
  }

  test("topKPerGroup returns k rows with rank column") {
    val out = Windows.topKPerGroup(df(games), Seq(col("player")),
      Seq(col("pts").desc), 2)
    assert(out.filter(col("player") === "p1").count() == 2)
    assert(out.columns.contains("rank"))
  }
}

class AggregationsSpec extends SparkSpec {
  test("dynamicIntSums sums only int-typed non-key columns by default") {
    val in = df(Seq(Wide(1, "a", 5, "x"), Wide(2, "a", 7, "y")))
      .withColumn("ints", col("score").cast("int"))
    val out = Aggregations.dynamicIntSums(in.select("name", "ints"), Seq("name"))
    assert(out.columns.toSeq == Seq("name", "ints"))
    assert(out.collect().head.getLong(1) == 12L)
  }

  test("dynamicIntSums drops long columns unless includeLongs") {
    val in = df(Seq(Wide(1, "a", 5, "x")))
    // score is Long: excluded by default -> require fails (nothing to sum)
    intercept[IllegalArgumentException] {
      Aggregations.dynamicIntSums(in.select("name", "score"), Seq("name"))
    }
    val out = Aggregations.dynamicIntSums(in.select("name", "score"), Seq("name"),
      includeLongs = true)
    assert(out.columns.toSeq == Seq("name", "score"))
  }

  test("multiAgg rejects empty aggregate list") {
    intercept[IllegalArgumentException] {
      Aggregations.multiAgg(df(Seq(KV("a", 1))), Seq("k"), Nil)
    }
  }

  test("moneySum is invariant to partitioning (decimal accumulation)") {
    val vals = (1 to 1000).map(i => KV("g", 0L)).zipWithIndex
      .map { case (_, i) => (i % 7, 0.01 + i * 0.07) }
    val s = spark
    import s.implicits._
    val one = vals.toDF("g", "v").repartition(1)
      .agg(Aggregations.moneySum(col("v"))).collect().head.getDouble(0)
    val many = vals.toDF("g", "v").repartition(13)
      .agg(Aggregations.moneySum(col("v"))).collect().head.getDouble(0)
    assert(one == many, "decimal-accumulated sum must be bit-identical across partitionings")
  }
}

case class Snap(key: String, ts: Long, city: String, tier: String)

class ScdSpec extends SparkSpec {
  test("type2 collapses runs, reopens on change-back, marks current") {
    val snaps = Seq(
      Snap("A", 1, "NYC", "gold"), Snap("A", 2, "NYC", "gold"),
      Snap("A", 3, "LA", "gold"), Snap("A", 4, "NYC", "gold"),
      Snap("B", 1, "SF", "silver"))
    val out = Scd.type2(df(snaps), Seq("key"), "ts", Seq("city", "tier"))
      .orderBy("key", "valid_from").collect()
    val a = out.filter(_.getString(0) == "A")
    assert(a.length == 3, "x,x | y | x -> three history rows (change-back reopens)")
    assert(a.map(r => (r.getLong(r.fieldIndex("valid_from")),
      r.getString(r.fieldIndex("city")))).toSeq ==
      Seq((1L, "NYC"), (3L, "LA"), (4L, "NYC")))
    assert(a.map(r => Option(r.getAs[Any]("valid_to"))).toSeq ==
      Seq(Some(3L), Some(4L), None), "valid_to = next valid_from, open-ended current")
    assert(a.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1 && b.head.getAs[Boolean]("is_current"))
  }

  test("same-ts runs under tieBreakCols: the LAST run by tiebreak is current") {
    val s = spark
    import s.implicits._
    // two distinct states snapshotted at the same ts: run order comes
    // from the tiebreak, and valid_to/is_current must follow it —
    // valid_from alone ties and previously picked an arbitrary winner
    val snaps = Seq(("A", 5L, 1L, "NYC"), ("A", 5L, 2L, "LA"))
      .toDF("key", "ts", "tb", "city")
    val out = Scd.type2(snaps, Seq("key"), "ts", Seq("city"),
      tieBreakCols = Seq("tb")).collect()
    val current = out.filter(_.getAs[Boolean]("is_current"))
    assert(current.length == 1 && current.head.getAs[String]("city") == "LA",
      "the tiebreak-latest state must be the current row")
    val closed = out.filter(!_.getAs[Boolean]("is_current"))
    assert(closed.length == 1 && closed.head.getAs[String]("city") == "NYC")
  }
}

class UpsertSpec extends SparkSpec {
  test("upsert replaces matching keys, appends new ones, creates when absent") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    Sinks.upsert(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    Sinks.upsert(spark, dir, Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }
}

class UpsertPartitionedSpec extends SparkSpec {
  private def fileBytes(dir: java.io.File): Map[String, Long] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap

  test("merges only affected partitions; untouched partition dirs are byte-identical") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_part").toString + "/t"
    val base = Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"), (4L, 30, "d"))
      .toDF("id", "day", "v")
    Sinks.upsertPartitioned(spark, dir, base, Seq("id", "day"), Seq("day"))

    val d20 = new java.io.File(s"$dir/day=20")
    val d30 = new java.io.File(s"$dir/day=30")
    val before20 = fileBytes(d20)
    val before30 = fileBytes(d30)
    assert(before20.nonEmpty && before30.nonEmpty, "partition dirs written")

    // touch ONLY day=10 (replace id=2) and add a NEW partition day=40
    Sinks.upsertPartitioned(spark, dir,
      Seq((2L, 10, "B2"), (5L, 40, "e")).toDF("id", "day", "v"),
      Seq("id", "day"), Seq("day"))

    assert(fileBytes(d20) == before20, "day=20 files untouched (same names+mtimes)")
    assert(fileBytes(d30) == before30, "day=30 files untouched")
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("rejects partition columns outside the key (a key could change partitions)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10, "a")).toDF("id", "day", "v")
    intercept[IllegalArgumentException] {
      Sinks.upsertPartitioned(spark, "/tmp/never", df, Seq("id"), Seq("day"))
    }
  }

  test("an upsert past maxAffectedPartitions fails loudly, never a quiet rewrite") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_cap")
      .toString + "/t"
    val base = Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "day", "v")
    Sinks.upsertPartitioned(spark, dir, base, Seq("id", "day"), Seq("day"))
    // 40 distinct partitions against a cap of 5: the guard must trip,
    // and the table must be untouched by the failed attempt
    val wide = (1L to 40L).map(i => (i + 100, i.toInt, "w"))
      .toDF("id", "day", "v")
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertPartitioned(spark, dir, wide, Seq("id", "day"), Seq("day"),
        maxAffectedPartitions = 5)
    }
    assert(e.getMessage.contains("distinct"))
    assert(spark.read.parquet(dir).count() === 2L, "failed attempt wrote nothing")
    // the same update inside the cap proceeds
    Sinks.upsertPartitioned(spark, dir, wide, Seq("id", "day"), Seq("day"),
      maxAffectedPartitions = 40)
    assert(spark.read.parquet(dir).count() === 42L)
  }
}

class CompactionSpec extends SparkSpec {
  test("compact rewrites many small files into few, preserving data") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(before >= 30, s"setup should create many files, got $before")
    val after = Sinks.compact(spark, dir, targetBytes = 512L * 1024)
    assert(after < before / 4, s"$before files -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()
      .head.getLong(0) == 5000L * 5001 / 2)
  }
}

class SamplingSpec extends SparkSpec {
  lazy val docs = df((1 to 2000).map(i =>
    Doc2(i.toLong, if (i % 4 == 0) "code" else "web")))

  test("consistentSample is deterministic, partition-invariant, ~fraction-sized") {
    val a = Sampling.consistentSample(docs, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.consistentSample(docs.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same ids selected regardless of partitioning")
    assert(math.abs(a.size - 600) < 100, s"~30% of 2000, got ${a.size}")
  }

  test("consistentSample at nested fractions: smaller sample is a subset") {
    val big = Sampling.consistentSample(docs, "id", 0.5).collect().map(_.getLong(0)).toSet
    val small = Sampling.consistentSample(docs, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "hash-threshold sampling nests")
  }

  test("perGroupSample caps each group at k, deterministically") {
    val out1 = Sampling.perGroupSample(docs, Seq("src"), "id", 50)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val out2 = Sampling.perGroupSample(docs.repartition(7), Seq("src"), "id", 50)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out1 == out2)
    assert(out1.count(_._2 == "code") == 50 && out1.count(_._2 == "web") == 50)
  }

  test("perGroupSample preserves a pre-existing 'rank' column") {
    val s = spark
    import s.implicits._
    val in = docs.withColumn("rank", lit(7))
    val out = Sampling.perGroupSample(in, Seq("src"), "id", 10)
    assert(out.columns.contains("rank"))
    assert(out.select("rank").collect().forall(_.getInt(0) == 7))
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, "src", "id",
      Map("code" -> 1.0), defaultFraction = 0.0).collect()
    assert(out.length == 500, "all code docs, no web docs")
    assert(out.forall(_.getString(1) == "code"))
  }

  test("sampleExact hits the count exactly, nests, and is partition-invariant") {
    val a = Sampling.sampleExact(docs, "id", 50)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleExact(docs.repartition(13), "id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 50 && a == b)
    val small = Sampling.sampleExact(docs, "id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a), "larger n is a superset — samples nest")
    // n beyond the data returns everything, once
    assert(Sampling.sampleExact(docs, "id", 5000).count() == 2000)
  }
}

case class Doc2(id: Long, src: String)
case class Tick(sym: String, t: Long, px: Double)
case class Trade(sym: String, t: Long, qty: Long)

class AsofJoinSpec extends SparkSpec {
  val ticks = Seq(Tick("A", 10, 1.0), Tick("A", 20, 2.0), Tick("B", 15, 9.0))
  val trades = Seq(
    Trade("A", 5, 100),   // before any tick -> null px
    Trade("A", 10, 200),  // exactly at tick 10 -> sees 1.0 (<= semantics)
    Trade("A", 25, 300),  // after tick 20 -> 2.0
    Trade("B", 16, 400),  // after B's only tick -> 9.0
    Trade("C", 50, 500))  // key with no right rows -> null

  test("asof attaches latest right value at-or-before each left row") {
    val out = AsofJoin.asof(
        df(trades), df(ticks).withColumnRenamed("px", "px"),
        Seq("sym"), "t", Seq("px"))
      .select("sym", "t", "qty", "px").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("A", 5L)) == None)
    assert(out(("A", 10L)) == Some(1.0))
    assert(out(("A", 25L)) == Some(2.0))
    assert(out(("B", 16L)) == Some(9.0))
    assert(out(("C", 50L)) == None)
    assert(out.size == 5, "every left row survives (left semantics)")
  }

  test("asof forward attaches the earliest right value at-or-after") {
    val out = AsofJoin.asof(df(trades), df(ticks), Seq("sym"), "t",
        Seq("px"), direction = "forward")
      .select("sym", "t", "px").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("A", 5L)) == Some(1.0)) // earliest at-or-after is tick 10
    assert(out(("A", 10L)) == Some(1.0)) // >= includes the equal-ts tick
    assert(out(("A", 25L)) == None) // nothing after tick 20
    assert(out(("B", 16L)) == None)
    assert(out(("C", 50L)) == None)
  }

  test("asof nearest picks the closer side; equidistant prefers backward") {
    val s = spark
    import s.implicits._
    val left = Seq(("A", 15L, 0L), ("A", 18L, 0L), ("A", 2L, 0L))
      .toDF("sym", "t", "qty")
    val out = AsofJoin.asof(left, df(ticks), Seq("sym"), "t", Seq("px"),
        direction = "nearest")
      .select("t", "px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(15L) === 1.0) // back d=5 (tick 10), fwd d=5 (tick 20): tie → backward
    assert(out(18L) === 2.0) // fwd d=2 beats back d=8
    assert(out(2L) === 1.0) // only a forward candidate exists
  }

  test("asof tolerance nulls matches farther than the bound, never substitutes") {
    val out = AsofJoin.asof(df(trades), df(ticks), Seq("sym"), "t",
        Seq("px"), tolerance = Some(lit(3L)))
      .select("sym", "t", "px").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("A", 10L)) == Some(1.0)) // d=0 within 3
    assert(out(("A", 25L)) == None) // latest ≤ is tick 20, d=5 > 3 → null
    assert(out(("B", 16L)) == Some(9.0)) // d=1
    // nearest honors the bound on the CHOSEN side's distance
    val s = spark
    import s.implicits._
    val near = AsofJoin.asof(
        Seq(("A", 16L, 0L)).toDF("sym", "t", "qty"), df(ticks),
        Seq("sym"), "t", Seq("px"), direction = "nearest",
        tolerance = Some(lit(3L)))
      .collect().head
    // back d=6, fwd d=4 → forward tick 20 chosen, within... 4 > 3 → null
    assert(near.isNullAt(near.fieldIndex("px")))
  }

  test("asof direction is validated") {
    intercept[IllegalArgumentException] {
      AsofJoin.asof(df(trades), df(ticks), Seq("sym"), "t", Seq("px"),
        direction = "sideways")
    }
  }

  test("asof carries a genuinely NULL right value instead of resurrecting older ones") {
    val s = spark
    import s.implicits._
    val right = Seq((("A"), 10L, Option(1.0)), (("A"), 20L, Option.empty[Double]))
      .toDF("sym", "t", "px")
    val left = Seq(("A", 25L, 99L)).toDF("sym", "t", "qty")
    val out = AsofJoin.asof(left, right, Seq("sym"), "t", Seq("px")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("px")),
      "latest right row has px=NULL; per-column carry would wrongly give 1.0")
  }

  test("asof is deterministic when right rows tie on (key, ts)") {
    val s = spark
    import s.implicits._
    val right = Seq(("A", 10L, 1.0), ("A", 10L, 2.0)).toDF("sym", "t", "px")
    val left = Seq(("A", 15L, 0L)).toDF("sym", "t", "qty")
    val picks = (1 to 5).map { i =>
      AsofJoin.asof(left, right.repartition(i), Seq("sym"), "t", Seq("px"))
        .collect().head.getDouble(3)
    }
    assert(picks.distinct.size == 1 && picks.head == 2.0,
      "greatest value tuple wins ties, regardless of partitioning")
  }

  test("asof null keys never match (SQL equi-join semantics)") {
    val s = spark
    import s.implicits._
    val left = Seq((Option.empty[String], 5L, 1L), (Some("A"), 5L, 2L))
      .toDF("sym", "t", "qty")
    val right = Seq((Option.empty[String], 3L, 10.0), (Some("A"), 3L, 20.0))
      .toDF("sym", "t", "px")
    val out = AsofJoin.asof(left, right, Seq("sym"), "t", Seq("px"))
      .collect().map(r => Option(r.getAs[String]("sym")) ->
        (if (r.isNullAt(r.fieldIndex("px"))) None
         else Some(r.getDouble(r.fieldIndex("px"))))).toMap
    assert(out(None) == None,
      "a null-key left row must not be enriched from null-key right rows")
    assert(out(Some("A")) == Some(20.0))
  }

  test("asof carries map-typed value columns (hash tie-break path)") {
    val s = spark
    import s.implicits._
    val left = Seq(("A", 10L, 1L)).toDF("sym", "t", "qty")
    val right = Seq(("A", 5L, Map("k" -> 1.0)))
      .toDF("sym", "t", "attrs")
    val out = AsofJoin.asof(left, right, Seq("sym"), "t", Seq("attrs"))
      .collect()
    assert(out.length == 1 &&
      out.head.getAs[Map[String, Double]]("attrs") == Map("k" -> 1.0))
  }

  test("asof with multiple value columns never mixes values across right rows") {
    val s = spark
    import s.implicits._
    val right = Seq(("A", 10L, Option(1.0), Option.empty[String]),
                    ("A", 20L, Option.empty[Double], Option("x")))
      .toDF("sym", "t", "px", "tag")
    val left = Seq(("A", 25L)).toDF("sym", "t")
    val r = AsofJoin.asof(left, right, Seq("sym"), "t", Seq("px", "tag")).collect().head
    assert(r.isNullAt(r.fieldIndex("px")) && r.getString(r.fieldIndex("tag")) == "x",
      "both values must come from the t=20 right row")
  }
}

class EntrySpec extends SparkSpec {
  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0, "driver smoke-checks rows>0")
  }

  test("SQL surface: registered views answer spark.sql identically to the DataFrame API") {
    Sources.registerAll(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_customers,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val viaDf = SparkEntry.queries("q_a4_countdistinct")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
  }
}

class ValidationSpec extends SparkSpec {
  test("empty rule lists fail loudly in both entry points") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2.0)).toDF("id", "price")
    intercept[IllegalArgumentException](Validation.check(df, Seq.empty))
    intercept[IllegalArgumentException](Validation.partitionByRules(df, Seq.empty))
  }

  test("empty input yields 0 violations (not NULL), dotted rule names are safe") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "price")
    val out = Validation.check(empty, Seq(
        "price.positive" -> (col("price") > 0),
        "id not null" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("price.positive" -> (0L, 0L), "id not null" -> (0L, 0L)),
      "NULL violations would silently pass a threshold gate")
  }

  test("NULL predicate counts as violation; partitionByRules quarantines") {
    val s = spark
    import s.implicits._
    val in = Seq((1L, Option(5.0)), (2L, Option(-1.0)), (3L, Option.empty[Double]))
      .toDF("id", "price")
    val out = Validation.check(in, Seq("pos" -> (col("price") > 0)))
      .collect().head
    assert(out.getLong(1) == 2, "negative AND null both violate")
    val (pass, fail) = Validation.partitionByRules(in, Seq("pos" -> (col("price") > 0)))
    assert(pass.count() == 1 && fail.count() == 2)
  }

  test("orphans: FK anti-join with SQL MATCH SIMPLE null exemption") {
    val s = spark
    import s.implicits._
    val parent = Seq((1L, "a"), (2L, "b")).toDF("pid", "pv")
    val child = Seq(
      (10L, Option(1L)), // matched
      (11L, Option(2L)), // matched
      (12L, Option(9L)), // ORPHAN
      (13L, Option.empty[Long])) // null key: exempt, NOT an orphan
      .toDF("cid", "fk")
    val got = Validation.orphans(child, parent, Seq("fk" -> "pid"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(12L))
    val summary = Validation.foreignKeyCheck(child, parent,
      Seq("fk" -> "pid")).collect().head
    assert(summary.getLong(0) == 4 && summary.getLong(1) == 1 &&
      summary.getLong(2) == 1)
  }

  test("orphans: composite keys match as tuples, any-null exempts") {
    val s = spark
    import s.implicits._
    val parent = Seq((1L, "x"), (2L, "y")).toDF("pk1", "pk2")
    val child = Seq(
      (10L, Option(1L), Option("x")), // matched
      (11L, Option(1L), Option("y")), // ORPHAN (cross pairing)
      (12L, Option(2L), Option.empty[String])) // exempt
      .toDF("cid", "k1", "k2")
    val got = Validation.orphans(child, parent,
        Seq("k1" -> "pk1", "k2" -> "pk2"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(11L))
  }
}

class SourcesSpec extends SparkSpec {
  test("csv and json landing readers round-trip schema-on-read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/t.csv"),
      "id,name,score\n1,alice,3.5\n2,bob,4.0\n")
    val c = Sources.csv(spark, s"$tmp/t.csv")
    assert(c.columns.toSeq == Seq("id", "name", "score") && c.count() == 2)
    assert(c.schema("id").dataType == org.apache.spark.sql.types.IntegerType,
      "inferSchema must type the columns")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/t.json"),
      """{"id":1,"tags":["a","b"]}""" + "\n" + """{"id":2,"tags":[]}""" + "\n")
    val j = Sources.json(spark, s"$tmp/t.json")
    assert(j.count() == 2 && j.columns.contains("tags"))
  }
}

class SkewSpec extends SparkSpec {
  test("saltedEnrichUsing returns exactly the plain left-join result") {
    val fact = df((1 to 500).map(i => Fact(if (i % 10 == 0) "cold" + i else "hot", i.toLong)))
    val dim = df(Seq(Dim("hot", "H")) ++ (1 to 500).filter(_ % 10 == 0)
      .map(i => Dim("cold" + i, "C")))
    val plain = Joins.enrichUsing(fact, dim, Seq("key"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedEnrichUsing(fact, dim, Seq("key"), salts = 8)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
  }

  test("saltedEnrichUsing keeps unmatched fact rows (left semantics)") {
    val fact = df(Seq(Fact("nokey", 1)))
    val out = Skew.saltedEnrichUsing(fact, df(Seq(Dim("other", "X"))), Seq("key"), 4)
    assert(out.count() == 1)
    assert(out.collect().head.isNullAt(2))
  }

  test("salting works on tables with map-typed columns, spreading identical rows") {
    val s = spark
    import s.implicits._
    // content hashing would reject MapType at analysis and give all
    // identical rows one salt; the position salt does neither
    val fact = (1 to 400).map(_ => ("hot", 1L, Map("m" -> 1)))
      .toDF("key", "x", "props")
    val dim = Seq(("hot", "H")).toDF("key", "tag")
    val joined = Skew.saltedEnrichUsing(fact, dim, Seq("key"), salts = 4)
    assert(joined.count() == 400)
    val agg = Skew.saltedAgg(fact, Seq("key"), salts = 4,
      partialAggs = Seq(sum(col("x")).as("s")),
      finalAggs = Seq(sum(col("s")).as("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("hot" -> 400L))
  }

  test("saltedAgg sum/count matches direct aggregation") {
    val in = df((1 to 1000).map(i => Fact(if (i % 100 == 0) "rare" else "hot", i.toLong)))
    val direct = in.groupBy("key")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(in, Seq("key"), salts = 8,
      partialAggs = Seq(sum(col("x")).as("s"), count(lit(1)).as("n")),
      finalAggs = Seq(sum(col("s")).as("s"), sum(col("n")).as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}

class SinksSpec extends SparkSpec {
  test("writeSingleFile materializes exactly <layer>/<name>/<name>.parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val in = df(Seq(KV("a", 1), KV("b", 2))).repartition(3)
    val dest = Sinks.writeSingleFile(in, tmp, "tbl")
    assert(dest.toString.endsWith("/tbl/tbl.parquet"))
    val files = new java.io.File(s"$tmp/tbl").listFiles().map(_.getName).toSeq
    assert(files == Seq("tbl.parquet"),
      s"single-file contract (no crc sidecars, no extra parts), got $files")
    val back = spark.read.parquet(dest.toString)
    assert(back.count() == 2)
    assert(new java.io.File(tmp).listFiles().count(_.getName.startsWith("tmp_output")) == 0,
      "tmp dir must be cleaned up")
  }

  test("bucketed tables join without any shuffle exchange") {
    val s = spark
    import s.implicits._
    // Managed-table locations outlive the (in-memory-catalog) test JVM:
    // drop the tables AND clear leftover warehouse dirs or saveAsTable
    // fails with LOCATION_ALREADY_EXISTS on re-runs.
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val a = (1 to 1000).map(i => (i.toLong % 50, s"a$i")).toDF("key", "av")
    val b = (1 to 1000).map(i => (i.toLong % 50, s"b$i")).toDF("key", "bv")
    Sinks.writeBucketed(a, "bkt_a", Seq("key"), 8)
    Sinks.writeBucketed(b, "bkt_b", Seq("key"), 8)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("key"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must be shuffle-free, got:\n$plan")
    assert(joined.count() == 20000, "50 keys x 20 x 20 matches")
  }

  test("writeSingleFile overwrites an existing table file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    Sinks.writeSingleFile(df(Seq(KV("a", 1))), tmp, "tbl")
    Sinks.writeSingleFile(df(Seq(KV("b", 2), KV("c", 3))), tmp, "tbl")
    assert(spark.read.parquet(s"$tmp/tbl/tbl.parquet").count() == 2)
  }
}

/** Catalog-mode table resolution (VERDICT r4 "do this" #6): with the
  * flag on, Sources.table goes through registered temp views — same
  * frames, reference-shaped resolution — and re-registers when the
  * requested directory changes.
  */
class CatalogModeSpec extends SparkSpec {
  import graft.ops.Sources

  test("catalog-mode table() equals the direct path read, per directory") {
    val dir = "/root/testdata/sf0.001"
    val direct = Sources.table(spark, dir, "nation").collect().map(_.toSeq).toSet
    spark.conf.set(Sources.CatalogFlagConf, "true")
    try {
      val viaCatalog = Sources.table(spark, dir, "nation")
      assert(spark.catalog.tableExists("nation"), "flag must register views")
      assert(viaCatalog.collect().map(_.toSeq).toSet == direct)
      // events goes through the nanos-safe reader even in catalog mode
      assert(Sources.table(spark, dir, "events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
    } finally {
      spark.conf.unset(Sources.CatalogFlagConf)
      spark.conf.unset("spark.graft.catalog.dir")
      Sources.tableNames.foreach(n => spark.catalog.dropTempView(n))
    }
  }

  test("catalog mode re-registers a view dropped behind its back") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set(Sources.CatalogFlagConf, "true")
    try {
      val first = Sources.table(spark, dir, "region").count()
      // a caller drops the temp views while the dir conf still matches:
      // the next lookup must resync from the catalog, not trust the conf
      spark.catalog.dropTempView("region")
      assert(Sources.table(spark, dir, "region").count() == first)
    } finally {
      spark.conf.unset(Sources.CatalogFlagConf)
      spark.conf.unset("spark.graft.catalog.dir")
      Sources.tableNames.foreach(n => spark.catalog.dropTempView(n))
    }
  }
}
