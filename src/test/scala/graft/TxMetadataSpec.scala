package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TxTable

/** Manifest-owned table metadata: per-commit `ts` stamps (TIMESTAMP AS
  * OF), the declared schema carried by create/evolveSchema (schema
  * evolution without data rewrite), and the declared partition layout
  * (empty partitioned tables, declared-type partition columns).
  */
class TxMetadataSpec extends SparkSpec {

  private def tmp() =
    Files.createTempDirectory("graft_meta").toString + "/t"

  test("every commit is ts-stamped; versionAsOfTimestamp resolves at-or-before") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(20) // distinct millis between commits
    TxTable.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))
    val ts1 = TxTable.commitTimestamp(spark, dir, 1L)
    val ts2 = TxTable.commitTimestamp(spark, dir, 2L)
    assert(ts1 > 0 && ts2 > ts1)
    assert(TxTable.versionAsOfTimestamp(spark, dir, ts1) === 1L)
    assert(TxTable.versionAsOfTimestamp(spark, dir, ts2 - 1) === 1L)
    assert(TxTable.versionAsOfTimestamp(spark, dir, ts2) === 2L)
    assert(TxTable.versionAsOfTimestamp(spark, dir,
      System.currentTimeMillis() + 60000) === 2L)
    val before = intercept[RuntimeException](
      TxTable.versionAsOfTimestamp(spark, dir, ts1 - 1))
    assert(before.getMessage.contains("predates"))
  }

  test("create declares schema + partitions; the empty table reads and fills") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("day", StringType),
      StructField("v", DoubleType)))
    TxTable.create(spark, dir, schema, Seq("day"))
    assert(TxTable.declaredSchema(spark, dir).contains(schema))
    assert(TxTable.declaredPartitionCols(spark, dir).contains(Seq("day")))
    // empty reads carry the declared schema — no placeholder file needed
    val empty = TxTable.read(spark, dir)
    assert(empty.isEmpty && empty.schema.fieldNames.toSeq ===
      Seq("id", "day", "v"))
    // a partitioned append fills it; declared string type survives
    // values that would re-infer as int ("07")
    TxTable.append(spark, dir,
      Seq((1L, "07", 1.5), (2L, "08", 2.5)).toDF("id", "day", "v"),
      partitionCols = Seq("day"))
    val got = TxTable.read(spark, dir).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq === Seq((1L, "07", 1.5), (2L, "08", 2.5)))
  }

  test("evolveSchema widens without rewrite: old files surface nulls everywhere") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // nullability may only widen: the current (parquet-read) schema has
    // id nullable, so the evolved declaration must keep it nullable —
    // pinning non-null over files that could hold nulls would let
    // Catalyst fold IsNotNull filters wrongly
    val evolved = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("score", DoubleType)))
    TxTable.evolveSchema(spark, dir, evolved)
    // head read sees the new column as null for pre-evolution rows
    val head = TxTable.read(spark, dir).orderBy("id").collect()
    assert(head.map(r => (r.getLong(0), r.isNullAt(2))).toSeq ===
      Seq((1L, true), (2L, true)))
    // new appends carry values; the mixed snapshot unions cleanly
    TxTable.append(spark, dir, Seq((3L, "c", 0.9)).toDF("id", "v", "score"))
    val all = TxTable.read(spark, dir).orderBy("id").collect()
    assert(all.map(r =>
      (r.getLong(0), if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq ===
      Seq((1L, -1.0), (2L, -1.0), (3L, 0.9)))
    // readWhere (stats pruning) and DML read through the same pin
    assert(TxTable.readWhere(spark, dir, col("id") === 3L)
      .head().getDouble(2) === 0.9)
    TxTable.delete(spark, dir, col("id") === 1L)
    assert(TxTable.read(spark, dir).count() === 2L)
    // time travel BEFORE the evolution still reads the old shape
    assert(TxTable.readVersion(spark, dir, 1L).schema.fieldNames.toSeq ===
      Seq("id", "v"))
  }

  test("evolveSchema refuses drops, retypes, and non-nullable additions") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    val drop = intercept[RuntimeException](TxTable.evolveSchema(spark, dir,
      StructType(Seq(StructField("id", LongType)))))
    assert(drop.getMessage.contains("DROP"))
    val retype = intercept[IllegalArgumentException](
      TxTable.evolveSchema(spark, dir, StructType(Seq(
        StructField("id", IntegerType), StructField("v", StringType)))))
    assert(retype.getMessage.contains("retype"))
    val notNull = intercept[IllegalArgumentException](
      TxTable.evolveSchema(spark, dir, StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType),
        StructField("n", LongType, nullable = false)))))
    assert(notNull.getMessage.contains("nullable"))
  }

  test("DML and maintenance preserve a declared partition layout untold") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      (1L to 20L).map(i => (i, (i % 2).toString)).toDF("id", "half"),
      partitionCols = Seq("half"))
    // SQL-style DELETE passes no partitionCols — the declared layout
    // must still shape the rewritten files
    TxTable.delete(spark, dir, col("id") <= 4L)
    // compaction likewise resolves the layout from the manifest
    TxTable.compact(spark, dir)
    val head = TxTable.versions(spark, dir).last
    val files = TxTable.snapshotFiles(spark, dir, head)
    assert(files.nonEmpty && files.forall(_.contains("half=")),
      s"every live file must stay under a hive dir: $files")
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).sorted
      .toSeq === (5L to 20L))
    assert(TxTable.declaredPartitionCols(spark, dir).contains(Seq("half")))
  }

  test("partitioned commits declare their layout; flat overwrite clears it") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      Seq((1L, "x"), (2L, "y")).toDF("id", "part"),
      partitionCols = Seq("part"))
    assert(TxTable.declaredPartitionCols(spark, dir).contains(Seq("part")))
    TxTable.overwrite(spark, dir, Seq((9L, "z")).toDF("id", "part"))
    assert(TxTable.declaredPartitionCols(spark, dir).contains(Nil))
  }
}
