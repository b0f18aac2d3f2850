package graft

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** File-level bloom filters: equality/IN skipping for high-cardinality
  * columns whose per-file [min,max] windows overlap (where stats
  * pruning is blind). Results must ALWAYS equal read().where(...) —
  * blooms are an optimization; an absent bit is proof of absence, a
  * present bit just means "read the file".
  *
  * Fixture geometry: commit j holds ids ≡ j (mod 4), j in 0..2 — every
  * file's [min,max] spans ~[j, 396+j] so stats keep ALL of them for any
  * in-range probe, and residue 3 gives in-range values provably absent
  * from every file. The seed file (single tiny id) is stats-prunable,
  * isolating what the bloom contributed.
  */
class TxBloomSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"

  private def interleaved(dir: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 3).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 100).map(i => (i * 4L + j, s"n${i * 4 + j}"))
          .toDF("id", "name").coalesce(1))
    }
  }

  test("min/max can't prune interleaved ids; blooms prune to one file") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((0L, "seed")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    interleaved(dir)
    // id=200 ≡ 0 (mod 4): lives in the first interleaved commit only
    val full = TxTable.read(spark, dir).where(col("id") === 200L)
    val pruned = TxTable.readWhere(spark, dir, col("id") === 200L)
    assert(pruned.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(pruned.inputFiles.length == 1,
      s"bloom must prune to the one file holding id=200, " +
        s"scanned ${pruned.inputFiles.length}")
    assert(TxTable.read(spark, dir).inputFiles.length == 4)
  }

  test("an in-range but provably absent value scans ZERO files") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    interleaved(dir)
    // 151 ≡ 3 (mod 4): inside every interleaved file's [min,max] (so
    // stats keep them all) yet in none of their value sets — only the
    // blooms can prove the absence
    val pruned = TxTable.readWhere(spark, dir, col("id") === 151L)
    assert(pruned.collect().isEmpty)
    assert(pruned.inputFiles.isEmpty,
      "absent value must scan nothing: stats prune the seed file, " +
        "blooms prune the rest")
  }

  test("IN-list keeps exactly the union of matching files") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    interleaved(dir)
    // 200 ≡ 0 and 201 ≡ 1 (mod 4): two different interleaved files
    val pruned = TxTable.readWhere(spark, dir, col("id").isin(200L, 201L))
    val full = TxTable.read(spark, dir).where(col("id").isin(200L, 201L))
    assert(pruned.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(pruned.inputFiles.length == 2,
      s"IN over two residues keeps two files, got ${pruned.inputFiles.length}")
  }

  test("string-column blooms prune; files from before the config are kept") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    // two commits BEFORE the config: no tokens, conservative keep.
    // Emails all share the u<digits> shape so every file's [min,max]
    // string window contains every probe (stats can't help)
    (0 until 2).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 50).map(i => (i * 2L + j, s"u${i * 2 + j}@x.com"))
          .toDF("id", "email").coalesce(1))
    }
    TxTable.setBloomFilters(spark, dir, Seq("email"), bits = 4096, hashes = 5)
    TxTable.append(spark, dir,
      (100 until 150).map(i => (i.toLong, s"u$i@y.org"))
        .toDF("id", "email").coalesce(1))
    // value from a pre-config file: both legacy files kept (no token),
    // post-config file bloom-skipped — 2 scanned
    val pruned = TxTable.readWhere(spark, dir, col("email") === "u13@x.com")
    assert(pruned.collect().map(_.getString(1)).toSeq == Seq("u13@x.com"))
    assert(pruned.inputFiles.length == 2,
      s"legacy files conservatively kept, bloom file skipped: " +
        s"got ${pruned.inputFiles.length}")
    // value from the post-config file: legacy kept + the one bloom hit
    assert(TxTable.readWhere(spark, dir, col("email") === "u120@y.org")
      .inputFiles.length == 3)
  }

  test("DML equality rewrites only the bloom-matching file") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    interleaved(dir)
    val before = TxTable.snapshotFiles(spark, dir,
      TxTable.versions(spark, dir).last).toSet
    TxTable.delete(spark, dir, col("id") === 200L)
    val after = TxTable.snapshotFiles(spark, dir,
      TxTable.versions(spark, dir).last).toSet
    // only ONE of the four files was rewritten (the 200-carrying one);
    // the seed file and the other two interleaved files carried over
    assert((before intersect after).size == 3,
      s"bloom candidate pruning must bound the rewrite to one file: " +
        s"kept ${(before intersect after).size} of ${before.size}")
    assert(TxTable.read(spark, dir).where(col("id") === 200L).count() == 0)
    assert(TxTable.read(spark, dir).count() == 300L)
  }

  test("compaction regenerates blooms for the rewritten files") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((1L, "x")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    interleaved(dir)
    TxTable.compact(spark, dir)
    // the compacted snapshot's files are new — if blooms were NOT
    // regenerated, this in-range absent probe would scan them
    val pruned = TxTable.readWhere(spark, dir, col("id") === 151L)
    assert(pruned.inputFiles.isEmpty,
      "compacted files must carry fresh blooms (absent value scans 0)")
    assert(TxTable.read(spark, dir).count() == 301L)
  }

  test("partitioned table: blooms on data columns compose with partition pruning") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir,
      Seq((1L, "p0", "a")).toDF("id", "day", "name").coalesce(1),
      partitionCols = Seq("day"))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    (0 until 2).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 40).map(i => (i * 2L + j + 10, s"p${i % 2}", s"r$i"))
          .toDF("id", "day", "name").coalesce(1),
        partitionCols = Seq("day"))
    }
    val probe = TxTable.readWhere(spark, dir,
      col("id") === 30L && col("day") === "p0")
    val full = TxTable.read(spark, dir)
      .where(col("id") === 30L && col("day") === "p0")
    assert(probe.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(probe.collect().nonEmpty)
    // partition pruning drops every day=p1 file from the path alone;
    // among the day=p0 files, only the j=0 commit's bloom carries 30
    // (seed is stats-pruned, j=1's p0 file is bloom-pruned)
    assert(probe.inputFiles.length == 1,
      s"partition dir + bloom must compose, scanned ${probe.inputFiles.length}")
  }

  test("config validation: unknown, non-integral, and partition columns refused") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir,
      Seq((1L, 2.5, "d1")).toDF("id", "score", "day").coalesce(1),
      partitionCols = Seq("day"))
    intercept[RuntimeException] {
      TxTable.setBloomFilters(spark, dir, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      TxTable.setBloomFilters(spark, dir, Seq("score"))
    }
    intercept[IllegalArgumentException] {
      TxTable.setBloomFilters(spark, dir, Seq("day"))
    }
    intercept[IllegalArgumentException] {
      TxTable.setBloomFilters(spark, dir, Seq("id"), bits = 100)
    }
  }

  test("SQL spellings: ADD/DROP BLOOM FILTER route to the same config") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((0L, "seed")).toDF("id", "name").coalesce(1))
    spark.sql(
      s"ALTER TABLE graft.`$dir` ADD BLOOM FILTER (id) WITH (bits=4096, hashes=5)")
    interleaved(dir)
    // in-range absent value (≡ 3 mod 4): only blooms can prove absence
    val pruned = TxTable.readWhere(spark, dir, col("id") === 151L)
    assert(pruned.inputFiles.isEmpty,
      "SQL-declared bloom must prune exactly like the API one")
    spark.sql(s"ALTER TABLE graft.`$dir` DROP BLOOM FILTER")
    TxTable.append(spark, dir,
      (30 until 40).map(i => (i * 4L + 3, "tail")).toDF("id", "name").coalesce(1))
    // the post-drop file holds 151 (= 4*37+3) — results stay exact
    assert(TxTable.readWhere(spark, dir, col("id") === 151L).count() == 1)
  }

  test("dropBloomFilters: later files lack tokens; earlier tokens still prune") {
    val dir = tmp()
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "name").coalesce(1))
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    TxTable.append(spark, dir,
      (0 until 50).map(i => (i * 3L + 100, "b")).toDF("id", "name").coalesce(1))
    TxTable.dropBloomFilters(spark, dir)
    TxTable.append(spark, dir,
      (0 until 50).map(i => (i * 3L + 101, "c")).toDF("id", "name").coalesce(1))
    // 102 is inside BOTH files' [100..24x] windows and in neither value
    // set: the bloom file skips on its token, the post-drop file has no
    // token and is conservatively kept, the seed is stats-pruned
    val pruned = TxTable.readWhere(spark, dir, col("id") === 102L)
    assert(pruned.inputFiles.length == 1,
      s"bloom file skipped, post-drop file kept: got ${pruned.inputFiles.length}")
    assert(pruned.collect().isEmpty)
  }
}
