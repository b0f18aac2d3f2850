package graft

import org.apache.spark.sql.functions._

import graft.ops.{TxTable, ZOrder}

/** Z-order clustering must make data skipping effective on EVERY
  * clustered column — the property range-clustering on one column
  * cannot give — while never changing row contents.
  */
class ZOrderSpec extends SparkSpec {

  private lazy val grid = {
    val s = spark
    import s.implicits._
    // 64×64 grid: x and y independent, so 1-D clustering on x leaves
    // y stats full-range in every file
    (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
  }

  test("zValue interleaves bits monotonically per dimension") {
    val s = spark
    import s.implicits._
    val z = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")),
        Seq((0.0, 4.0), (0.0, 4.0)), bitsPerCol = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a occupies even bits, b odd bits: (0,0)=0, (3,0)=0b0101=5,
    // (0,3)=0b1010=10, (3,3)=0b1111=15
    assert(z == Seq(0L, 5L, 10L, 15L))
  }

  test("z-ordered table prunes needle queries on BOTH dimensions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    TxTable.append(spark, dir, ZOrder.cluster(grid, Seq("x", "y"), numFiles = 16))
    val total = TxTable.read(spark, dir).inputFiles.length
    assert(total >= 8, s"expected multiple files, got $total")

    def filesFor(p: org.apache.spark.sql.Column) =
      TxTable.readWhere(spark, dir, p).inputFiles.length
    val fx = filesFor(col("x") === 17L)
    val fy = filesFor(col("y") === 42L)
    assert(fx <= total / 2 && fy <= total / 2,
      s"both dimensions must prune: x→$fx, y→$fy of $total files")
    // correctness: pruned results equal full filters
    assert(TxTable.readWhere(spark, dir, col("x") === 17L).count() == 64)
    assert(TxTable.readWhere(spark, dir, col("y") === 42L).count() == 64)
    assert(TxTable.readWhere(spark, dir,
      col("x") === 17L && col("y") === 42L).count() == 1)
  }

  test("1-D range clustering leaves the other dimension unprunable (the contrast)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    TxTable.append(spark, dir, grid.repartitionByRange(16, col("x")))
    val total = TxTable.read(spark, dir).inputFiles.length
    val fy = TxTable.readWhere(spark, dir, col("y") === 42L).inputFiles.length
    assert(fy == total,
      "y is uniform within every x-range file — stats cannot prune it")
  }

  test("TxTable.optimize z-orders an existing table in place, preserving history") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    // land the grid UNclustered across several commits (x-ranged, so y
    // is unprunable — the layout optimize must fix)
    (0 until 4).foreach { i =>
      TxTable.append(spark, dir,
        grid.filter(col("x") % 4 === i).repartitionByRange(4, col("x")))
    }
    val before = TxTable.read(spark, dir)
    val beforeRows = before.collect().map(_.toSeq).toSet
    val totalBefore = before.inputFiles.length
    val fyBefore = TxTable.readWhere(spark, dir, col("y") === 42L)
      .inputFiles.length
    assert(fyBefore == totalBefore, "pre-optimize: y cannot prune")

    val preVersion = TxTable.versions(spark, dir).last
    // small target so the rewrite yields enough files (~16) for file
    // pruning to be measurable on a 64x64 grid
    TxTable.optimize(spark, dir, Seq("x", "y"), targetBytes = 2L * 1024)
    val after = TxTable.read(spark, dir)
    assert(after.collect().map(_.toSeq).toSet == beforeRows,
      "optimize is layout-only — data identical")
    val totalAfter = after.inputFiles.length
    assert(totalAfter >= 4, s"expected a multi-file rewrite, got $totalAfter")
    def filesFor(p: org.apache.spark.sql.Column) =
      TxTable.readWhere(spark, dir, p).inputFiles.length
    assert(filesFor(col("x") === 17L) <= totalAfter / 2)
    assert(filesFor(col("y") === 42L) <= totalAfter / 2,
      "post-optimize: BOTH dimensions prune")
    // history preserved: the pre-optimize snapshot still reads
    assert(TxTable.readVersion(spark, dir, preVersion)
      .collect().map(_.toSeq).toSet == beforeRows)
  }

  test("optimize on ONE column range-clusters — string sort keys included") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    // a posting-table shape: string sort key, fragmented across
    // appends the way a streaming index maintainer leaves it (bit
    // interleaving would fail the numeric cast on `tok` — 1-D
    // clustering must take the plain range-sort path)
    val toks = ('a' to 'h').map(_.toString)
    (0 until 4).foreach { i =>
      TxTable.append(spark, dir,
        (0 until 200).map(j => (toks((i + j) % toks.size), j.toLong))
          .toDF("tok", "n"))
    }
    val before = TxTable.read(spark, dir)
    val beforeRows = before.collect().map(_.toSeq).toSet
    assert(TxTable.readWhere(spark, dir, col("tok") === "c")
      .inputFiles.length == before.inputFiles.length,
      "pre-optimize: every fragment holds every token — no pruning")
    TxTable.optimize(spark, dir, Seq("tok"), targetBytes = 2L * 1024)
    val after = TxTable.read(spark, dir)
    assert(after.collect().map(_.toSeq).toSet == beforeRows,
      "optimize is layout-only — data identical")
    val total = after.inputFiles.length
    assert(total >= 4, s"expected a multi-file rewrite, got $total")
    assert(TxTable.readWhere(spark, dir, col("tok") === "c")
      .inputFiles.length <= total / 2,
      "post-optimize: the string needle prunes to its token range")
  }

  test("optimizeIfFragmented: a pure check below the threshold, one rewrite at it") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    // 6 single-file appends — the streaming-maintainer shape
    (0 until 6).foreach { i =>
      TxTable.append(spark, dir,
        (0 until 100).map(j => ((i * 100 + j).toLong, j.toLong))
          .toDF("k", "n").coalesce(1))
    }
    val head = TxTable.versions(spark, dir).last
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 10).isEmpty, "6 files < 10 — must not commit")
    assert(TxTable.versions(spark, dir).last === head)
    val v = TxTable.optimizeIfFragmented(spark, dir, Seq("k"), maxFiles = 6)
    assert(v.isDefined, "at the threshold the rewrite runs")
    assert(TxTable.read(spark, dir).inputFiles.length < 6)
    assert(TxTable.read(spark, dir).count() === 600L)
    // and the freshly-compacted table is below threshold again
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 6).isEmpty)
  }

  test("optimizeIfFragmented: a table bigger than maxFiles*targetBytes does not rewrite forever") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    // 8 single-file appends with a small targetBytes so the HEALTHY
    // layout itself needs more than maxFiles files — the shape where
    // an absolute `files >= maxFiles` check re-runs a full-table
    // rewrite on EVERY micro-batch: optimize emits ceil(bytes/target)
    // files, which is already >= maxFiles. The md5 payload keeps data
    // bytes (not per-file parquet overhead) the dominant term.
    def batch(lo: Int, n: Int) =
      (lo until lo + n).map(_.toLong).toDF("k")
        .withColumn("payload",
          repeat(md5(col("k").cast("string")), 8))
        .coalesce(1)
    (0 until 8).foreach(i => TxTable.append(spark, dir, batch(i * 200, 200)))
    val target = 24L * 1024
    val v = TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 2, targetBytes = target)
    assert(v.isDefined, "8 fragments over a 2-file threshold — rewrite")
    val compacted = TxTable.read(spark, dir).inputFiles.length
    assert(compacted > 2,
      s"healthy layout must exceed maxFiles for this test (got $compacted)")
    // the freshly optimized table reads as NOT fragmented even though
    // its file count still exceeds maxFiles — no rewrite loop
    val head = TxTable.versions(spark, dir).last
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 2, targetBytes = target).isEmpty,
      "a just-compacted table must not re-trigger")
    assert(TxTable.versions(spark, dir).last === head)
    // more appends re-arm it once the EXCESS passes the factor
    (0 until 2 * compacted).foreach(i =>
      TxTable.append(spark, dir, batch(1600 + i, 1)))
    assert(TxTable.optimizeIfFragmented(spark, dir, Seq("k"),
      maxFiles = 2, targetBytes = target).isDefined,
      "excess fragments past the factor must trigger again")
    assert(TxTable.read(spark, dir).count() ===
      1600L + 2 * compacted)
  }

  test("optimize preserves a hive-partitioned layout without being told it") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_z").toString + "/t"
    val data = (for (d <- Seq("mon", "tue"); i <- 0 until 100)
      yield (d, i.toLong, (i * 7 % 100).toLong)).toDF("day", "x", "y")
    TxTable.append(spark, dir, data, partitionCols = Seq("day"))
    // no partitionCols passed: the layout the partitioned append
    // DECLARED in the manifest shapes the rewrite automatically (a
    // flat rewrite would break directory pruning and later
    // replacePartitions semantics)
    TxTable.optimize(spark, dir, Seq("x", "y"), targetBytes = 2048)
    val after = TxTable.read(spark, dir)
    assert(after.count() == 200)
    assert(after.inputFiles.forall(f => f.contains("day=")),
      "rewritten files keep the hive layout")
    // replacePartitions after optimize must REPLACE, not duplicate
    val repl = (0 until 50).map(i => ("mon", 1000L + i, i.toLong))
      .toDF("day", "x", "y")
    TxTable.replacePartitions(spark, dir, repl, Seq("day"))
    val mon = TxTable.read(spark, dir, schema = Some(after.schema))
      .filter(col("day") === "mon")
    assert(mon.count() == 50, "old mon rows replaced, not duplicated")
  }

  test("CLUSTER BY declaration: bare OPTIMIZE re-clusters; dropped, it compacts") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cluster").toString + "/t"
    // ids interleaved across 3 files: a probe scans all of them
    (0 until 3).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 100).map(i => (i * 3L + j, s"n$i")).toDF("id", "name")
          .coalesce(1))
    }
    assert(TxTable.readWhere(spark, dir, col("id") === 150L)
      .inputFiles.length == 3, "interleaved: stats can't prune")
    // no explicit cols and no declaration → loud refusal
    intercept[IllegalArgumentException] {
      TxTable.optimize(spark, dir, Nil, targetBytes = 4096)
    }
    spark.sql(s"ALTER TABLE graft.`$dir` CLUSTER BY (id)")
    assert(TxTable.clusteringColumns(spark, dir) === Seq("id"))
    // bare SQL OPTIMIZE now re-clusters on the declared column: files
    // hold contiguous id ranges and the same probe scans ONE file
    spark.sql(s"OPTIMIZE graft.`$dir`")
    val pruned = TxTable.readWhere(spark, dir, col("id") === 150L)
    assert(pruned.count() == 1)
    val files = TxTable.read(spark, dir).inputFiles.length
    assert(files == 1 ||
      pruned.inputFiles.length < files,
      s"declared clustering must make the probe prune: " +
        s"${pruned.inputFiles.length} of $files")
    spark.sql(s"ALTER TABLE graft.`$dir` CLUSTER BY NONE")
    assert(TxTable.clusteringColumns(spark, dir).isEmpty)
    intercept[IllegalArgumentException] {
      TxTable.optimize(spark, dir, Nil)
    }
  }

  test("renameColumn carries a clustering declaration to the new name") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cluster").toString + "/t"
    TxTable.append(spark, dir,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1))
    TxTable.setClusteringColumns(spark, dir, Seq("id"))
    TxTable.renameColumn(spark, dir, "id", "doc_id")
    assert(TxTable.clusteringColumns(spark, dir) === Seq("doc_id"))
    // and the declaration still drives a bare optimize
    TxTable.optimize(spark, dir, Nil)
    assert(TxTable.read(spark, dir).count() == 10L)
  }

  test("cluster() preserves rows exactly and tolerates nulls/constants") {
    val s = spark
    import s.implicits._
    val in = Seq((Some(1L), 5L), (None, 5L), (Some(9L), 5L)).toDF("a", "b")
    val out = ZOrder.cluster(in, Seq("a", "b"), numFiles = 2)
    assert(out.collect().map(_.toSeq).toSet == in.collect().map(_.toSeq).toSet)
    assert(out.columns.toSeq == in.columns.toSeq, "no helper column leaks")
  }
}
