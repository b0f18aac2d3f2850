package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** Shallow clone: zero-copy snapshot fork with full independence
  * (DML, vacuum) between source and clone.
  */
class TxCloneSpec extends SparkSpec {

  private def tmp() =
    Files.createTempDirectory("graft_clone").toString

  private def ids(dir: String) =
    TxTable.read(spark, dir).collect().map(_.getLong(0)).toSet

  test("clone at head equals the source; data files are hard links, not copies") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    TxTable.overwrite(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((3L, "c")).toDF("id", "v"))
    val v1 = TxTable.cloneAt(spark, src, dst)
    assert(v1 === 1L)
    assert(ids(dst) === Set(1L, 2L, 3L))
    // every clone data file shares its inode with the source file —
    // nothing was byte-copied
    val dataDir = Paths.get(dst)
    val parquet = Files.walk(dataDir).filter(_.toString.endsWith(".parquet"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(parquet.nonEmpty)
    parquet.foreach { p =>
      val nlink = Files.getAttribute(p, "unix:nlink").asInstanceOf[Number]
      assert(nlink.longValue >= 2, s"$p is not a hard link")
    }
  }

  test("clone at an older version pins that snapshot") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    TxTable.overwrite(spark, src, Seq((1L, "a")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((2L, "b")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((3L, "c")).toDF("id", "v"))
    TxTable.cloneAt(spark, src, dst, version = 2L)
    assert(ids(dst) === Set(1L, 2L))
  }

  test("source and clone evolve independently; vacuuming one never breaks the other") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    TxTable.overwrite(spark, src,
      Seq.tabulate(10)(i => (i.toLong, s"v$i")).toDF("id", "v"))
    TxTable.cloneAt(spark, src, dst)
    // diverge both sides
    TxTable.delete(spark, dst, col("id") < 5)
    TxTable.append(spark, src, Seq((100L, "new")).toDF("id", "v"))
    assert(ids(src) === (0L until 10L).toSet + 100L)
    assert(ids(dst) === (5L until 10L).toSet)
    // rewrite + vacuum the SOURCE: its original files are unlinked, but
    // the clone holds its own links to the shared inodes
    TxTable.overwrite(spark, src, Seq((42L, "only")).toDF("id", "v"))
    TxTable.vacuum(spark, src, keepVersions = 1)
    assert(ids(dst) === (5L until 10L).toSet)
    // and vacuuming the CLONE leaves the rewritten source alone
    TxTable.vacuum(spark, dst, keepVersions = 1)
    assert(ids(src) === Set(42L))
    assert(ids(dst) === (5L until 10L).toSet)
  }

  test("declared schema, partition layout, and CHECK constraints carry; txn tokens do not") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    TxTable.overwrite(spark, src,
      Seq((1L, "us", 10L), (2L, "eu", 20L)).toDF("id", "region", "n"),
      partitionCols = Seq("region"))
    TxTable.evolveSchema(spark, src,
      TxTable.read(spark, src).schema
        .add("extra", org.apache.spark.sql.types.StringType))
    TxTable.addConstraint(spark, src, "pos_n", "n > 0")
    // a streaming idempotence token on the source must NOT suppress
    // writes into the clone
    TxTable.append(spark, src, Seq((3L, "us", 30L, "x")).toDF(
      "id", "region", "n", "extra"), meta = Map("txn.app" -> "7"))
    TxTable.cloneAt(spark, src, dst)
    // schema evolution carried: old files surface the added column,
    // in the same declared order the source reads with
    assert(TxTable.read(spark, dst).columns.toSeq ===
      TxTable.read(spark, src).columns.toSeq)
    assert(TxTable.read(spark, dst).columns.contains("extra"))
    // partition layout carried
    assert(TxTable.detail(spark, dst)._4 === Seq("region"))
    // constraint carried and enforced on the clone
    val e = intercept[IllegalStateException] {
      TxTable.append(spark, dst,
        Seq((9L, "us", -1L, "y")).toDF("id", "region", "n", "extra"))
    }
    assert(e.getMessage.contains("pos_n"))
    // txn token dropped
    assert(!TxTable.commitMeta(spark, dst, 1L).contains("txn.app"))
  }

  test("refuses an existing target, a vacuumed version, and self-clone") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    TxTable.overwrite(spark, src, Seq((1L, "a")).toDF("id", "v"))
    TxTable.overwrite(spark, src, Seq((2L, "b")).toDF("id", "v"))
    TxTable.vacuum(spark, src, keepVersions = 1)
    intercept[IllegalArgumentException] {
      TxTable.cloneAt(spark, src, dst, version = 1L) // vacuumed
    }
    intercept[IllegalArgumentException] {
      TxTable.cloneAt(spark, src, src) // self
    }
    TxTable.cloneAt(spark, src, dst)
    intercept[IllegalArgumentException] {
      TxTable.cloneAt(spark, src, dst) // exists
    }
  }

  test("SQL spelling: CREATE TABLE ... SHALLOW CLONE ... [VERSION AS OF] ≡ API") {
    val s = spark
    import s.implicits._
    val root = tmp()
    val src = s"$root/src"
    TxTable.overwrite(spark, src, Seq((1L, "a")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((2L, "b")).toDF("id", "v"))
    val v = spark.sql(
      s"CREATE TABLE graft.`$root/d1` SHALLOW CLONE graft.`$src`")
      .collect().head.getLong(0)
    assert(v === 1L)
    assert(ids(s"$root/d1") === Set(1L, 2L))
    spark.sql(s"CREATE TABLE graft.`$root/d2` SHALLOW CLONE graft.`$src` " +
      "VERSION AS OF 1")
    assert(ids(s"$root/d2") === Set(1L))
    // the clone's change feed is one initial insert snapshot
    val feed = TxTable.readChanges(spark, s"$root/d1", fromV = 0L)
    assert(feed.where(col(TxTable.ChangeTypeCol) === "insert").count() === 2L)
    assert(feed.count() === 2L)
  }
}
