package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** `spark.read.format("graft")`: the TxTable behind Spark's stock
  * DataSource V2 parquet machinery — snapshot reads, time travel via
  * option, pushdown/pruning from the delegated scan, and loud
  * rejection of the cases the surface does not cover.
  */
class GraftSourceSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_dsv2").toString + "/t"

  test("reads the head snapshot and time-travels via versionAsOf") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TxTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    val head = spark.read.format("graft").load(table)
    assert(head.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(table)
    assert(v1.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("timestampAsOf resolves via the manifests' commit stamps") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Thread.sleep(20)
    TxTable.append(spark, table, Seq((3L, "c")).toDF("id", "v"))
    val ts1 = TxTable.commitTimestamp(spark, table, 1L)
    // epoch millis
    assert(spark.read.format("graft").option("timestampAsOf", ts1)
      .load(table).count() === 2L)
    // ISO instant
    val iso = java.time.Instant.ofEpochMilli(ts1).toString
    assert(spark.read.format("graft").option("timestampAsOf", iso)
      .load(table).count() === 2L)
    // pre-history timestamps and option conflicts fail loudly
    assertThrows[Exception](spark.read.format("graft")
      .option("timestampAsOf", ts1 - 10000).load(table).collect())
    assertThrows[Exception](spark.read.format("graft")
      .option("timestampAsOf", ts1).option("versionAsOf", 1)
      .load(table).collect())
  }

  test("the loaded frame is a stable snapshot — later commits do not leak in") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table, Seq((1L, "a")).toDF("id", "v"))
    val snap = spark.read.format("graft").load(table)
    TxTable.append(spark, table, Seq((2L, "b")).toDF("id", "v"))
    assert(snap.count() === 1L)
    assert(spark.read.format("graft").load(table).count() === 2L)
  }

  test("filters push down and columns prune through the delegated parquet scan") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table,
      Seq.tabulate(100)(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "grp"))
    val q = spark.read.format("graft").load(table)
      .filter(col("id") === 42L).select("id", "grp")
    assert(q.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((42L, 0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,grp:int>"), plan)
  }

  test("agrees with TxTable.read row-for-row") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table, Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x"))
    TxTable.overwrite(spark, table, Seq((9L, 9.5)).toDF("id", "x"))
    val a = spark.read.format("graft").load(table).collect().map(_.toString).sorted
    val b = TxTable.read(spark, table).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("V2 write creates a new table; V2-write → V2-read ≡ API write") {
    val s = spark
    import s.implicits._
    val viaWriter = tmp()
    val viaApi = tmp()
    val df = Seq.tabulate(50)(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "grp")
    df.write.format("graft").mode("append").save(viaWriter)
    TxTable.append(spark, viaApi, df)
    val a = spark.read.format("graft").load(viaWriter)
      .collect().map(_.toString).sorted
    val b = spark.read.format("graft").load(viaApi)
      .collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    // same manifest protocol: versioned, time-travelable
    assert(TxTable.versions(spark, viaWriter) === Seq(1L))
  }

  test("V2 append accumulates versions; overwrite replaces the snapshot") {
    val s = spark
    import s.implicits._
    val table = tmp()
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .mode("append").save(table)
    Seq((2L, "b")).toDF("id", "v").write.format("graft")
      .mode("append").save(table)
    assert(spark.read.format("graft").load(table)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    Seq((9L, "z")).toDF("id", "v").write.format("graft")
      .mode("overwrite").save(table)
    assert(spark.read.format("graft").load(table)
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
    // all three commits are in the log; version 2 is still readable
    assert(TxTable.versions(spark, table) === Seq(1L, 2L, 3L))
    assert(spark.read.format("graft").option("versionAsOf", 2).load(table)
      .count() === 2L)
  }

  test("V2 append aligns reordered columns and rejects mismatched schemas") {
    val s = spark
    import s.implicits._
    val table = tmp()
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .mode("append").save(table)
    // same columns, different order: aligned, not corrupted
    Seq(("b", 2L)).toDF("v", "id").write.format("graft")
      .mode("append").save(table)
    val rows = spark.read.format("graft").load(table)
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // wrong shape fails loudly, and the failed attempt committed nothing
    val before = TxTable.versions(spark, table)
    val bad = intercept[Exception](
      Seq((3L, 1.5)).toDF("id", "x").write.format("graft")
        .mode("append").save(table))
    assert(bad.getMessage.contains("does not match") ||
      bad.getMessage.contains("mismatch"), bad.getMessage)
    assert(TxTable.versions(spark, table) === before)
  }

  test("V2 write with identity partitionBy round-trips through TxTable.read") {
    val s = spark
    import s.implicits._
    val table = tmp()
    Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 10)).toDF("id", "v", "day")
      .write.format("graft").mode("append").partitionBy("day").save(table)
    val rows = TxTable.read(spark, table).orderBy("id").collect()
    assert(rows.map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("day"))).toSeq ===
      Seq((1L, 10), (2L, 20), (3L, 10)))
  }

  test("missing versions and non-tables fail loudly") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table, Seq((1L, "a")).toDF("id", "v"))
    val bad = intercept[Exception](
      spark.read.format("graft").option("versionAsOf", 99).load(table))
    assert(bad.getMessage.contains("does not exist"))
    val notATable = intercept[Exception](
      spark.read.format("graft").load(tmp()))
    assert(notATable.getMessage.contains("not a TxTable"))
  }

  test("partitioned snapshots: V2 read ≡ TxTable.read across multiple commits") {
    val s = spark
    import s.implicits._
    val table = tmp()
    // two commits into overlapping partitions — the multi-commit layout
    // stock partition inference cannot stitch
    TxTable.append(spark, table,
      Seq((1L, "x", 10), (2L, "y", 20)).toDF("id", "v", "day"), Seq("day"))
    TxTable.append(spark, table,
      Seq((3L, "z", 10), (4L, "w", 30)).toDF("id", "v", "day"), Seq("day"))
    val v2 = spark.read.format("graft").load(table)
    assert(v2.schema.fieldNames.toSeq === Seq("id", "v", "day"))
    assert(v2.schema("day").dataType ===
      org.apache.spark.sql.types.IntegerType, "typed partition column")
    val a = v2.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[Int]("day")))
      .sortBy(_._1)
    val b = TxTable.read(spark, table).collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[Int]("day")))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // time travel still snapshots
    assert(spark.read.format("graft").option("versionAsOf", 1).load(table)
      .count() === 2L)
  }

  test("partitioned snapshots: partition predicates prune to PartitionFilters") {
    val s = spark
    import s.implicits._
    val table = tmp()
    TxTable.append(spark, table,
      (1L to 30L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("id", "v", "day"),
      Seq("day"))
    TxTable.append(spark, table,
      Seq((100L, "x", 7)).toDF("id", "v", "day"), Seq("day"))
    val q = spark.read.format("graft").load(table).filter(col("day") === 7)
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(100L))
    assert(q.inputFiles.forall(_.contains("day=7")),
      s"partition pruning must reach the scan: ${q.inputFiles.toSeq}")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
  }

  test("partitioned snapshots: V2 append into an existing layout lands in the right partition") {
    val s = spark
    import s.implicits._
    val table = tmp()
    Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "day")
      .write.format("graft").mode("append").partitionBy("day").save(table)
    // append WITHOUT partitionBy: the resolved layout declares it
    Seq((3L, "c", 10)).toDF("id", "v", "day")
      .write.format("graft").mode("append").save(table)
    val rows = spark.read.format("graft").load(table)
      .filter(col("day") === 10).collect().map(_.getAs[Long]("id")).sorted
    assert(rows.toSeq === Seq(1L, 3L))
    // string partition values survive the round-trip typed as string
    val st = tmp()
    Seq((1L, "eu-west"), (2L, "us-east")).toDF("id", "region")
      .write.format("graft").mode("append").partitionBy("region").save(st)
    val got = spark.read.format("graft").load(st)
    assert(got.schema("region").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(got.filter(col("region") === "us-east")
      .collect().map(_.getAs[Long]("id")).toSeq === Seq(2L))
  }

  test("catalog SELECT and INSERT work on partitioned tables") {
    val s = spark
    import s.implicits._
    val table = tmp()
    Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "day")
      .write.format("graft").mode("append").partitionBy("day").save(table)
    spark.sql(s"INSERT INTO graft.`$table` VALUES (3, 'c', 20)")
    assert(spark.sql(
        s"SELECT id FROM graft.`$table` WHERE day = 20 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(TxTable.read(spark, table).count() === 3L)
  }
}
