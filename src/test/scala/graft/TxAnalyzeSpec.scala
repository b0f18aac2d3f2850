package graft

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** ANALYZE TABLE: metadata-only stats/bloom backfill — no data file
  * touched, a new manifest version carries the enriched lines, and the
  * two conservative-keep gaps (statless legacy lines, pre-bloom-config
  * files) close without a rewrite.
  */
class TxAnalyzeSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_analyze").toString + "/t"

  private def stripStats(dir: String): Unit = {
    val log = new java.io.File(dir, "_txlog")
    val head = log.listFiles().filter(_.getName.endsWith(".manifest"))
      .maxBy(_.getName)
    val lines = scala.io.Source.fromFile(head).getLines().toSeq
    java.nio.file.Files.write(head.toPath,
      (lines.head +: lines.tail.map(_.takeWhile(_ != '\t')))
        .mkString("\n").getBytes("UTF-8"))
  }

  test("backfills stats on a statless manifest; metadata aggregates revive") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir, (1L to 25L).toDF("id").coalesce(2))
    stripStats(dir)
    assert(TxTable.metaRowCount(spark, dir) === None, "stripped = unprovable")
    val dataFilesBefore = TxTable.snapshotFiles(spark, dir,
      TxTable.versions(spark, dir).last).toSet
    val v = TxTable.analyze(spark, dir)
    assert(v === 2L, "one metadata-only commit")
    assert(TxTable.snapshotFiles(spark, dir, v).toSet === dataFilesBefore,
      "no data file added, removed, or rewritten")
    assert(TxTable.metaRowCount(spark, dir) === Some(25L))
    assert(TxTable.metaMinMax(spark, dir, "id") === Some(("1", "25")))
    // already complete → no-op, same head
    assert(TxTable.analyze(spark, dir) === v)
  }

  test("backfills blooms for files written BEFORE the config; probes then prune") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // interleaved ids (mod 4, residues 0..2) BEFORE any bloom config:
    // min/max overlap and no tokens — every probe scans everything
    (0 until 3).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 100).map(i => (i * 4L + j, s"n$i")).toDF("id", "name")
          .coalesce(1))
    }
    TxTable.setBloomFilters(spark, dir, Seq("id"))
    assert(TxTable.readWhere(spark, dir, col("id") === 200L)
      .inputFiles.length == 3, "pre-config files conservatively kept")
    spark.sql(s"ANALYZE TABLE graft.`$dir` COMPUTE STATISTICS")
    val pruned = TxTable.readWhere(spark, dir, col("id") === 200L)
    assert(pruned.count() == 1)
    assert(pruned.inputFiles.length == 1,
      s"backfilled blooms must prune, scanned ${pruned.inputFiles.length}")
    // in-range absent value now scans nothing at all
    assert(TxTable.readWhere(spark, dir, col("id") === 151L)
      .inputFiles.isEmpty)
  }

  test("config lifecycle end-to-end: constrain, bloom, cluster, analyze, rename, DML") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // land interleaved (stats-blind) data, then declare everything
    (0 until 3).foreach { j =>
      TxTable.append(spark, dir,
        (0 until 60).map(i => (i * 3L + j, (i % 9 + 1).toLong))
          .toDF("id", "qty").coalesce(1))
    }
    spark.sql(s"ALTER TABLE graft.`$dir` ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    spark.sql(s"ALTER TABLE graft.`$dir` ADD BLOOM FILTER (id)")
    spark.sql(s"ALTER TABLE graft.`$dir` CLUSTER BY (id)")
    spark.sql(s"ANALYZE TABLE graft.`$dir`")
    // backfilled blooms prune the pre-config files
    assert(TxTable.readWhere(spark, dir, col("id") === 90L)
      .inputFiles.length == 1)
    // rename carries ALL THREE configs (constraint refuses — the guard)
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "qty", "amount")
    }
    TxTable.renameColumn(spark, dir, "id", "doc_id")
    assert(TxTable.clusteringColumns(spark, dir) === Seq("doc_id"))
    assert(TxTable.bloomFilterConfig(spark, dir).map(_._1) === Some(Seq("doc_id")))
    assert(TxTable.constraints(spark, dir) === Map("qty_pos" -> "qty > 0"))
    // the constraint still rejects after the rename-rewrite
    intercept[Exception] {
      TxTable.append(spark, dir, Seq((999L, 0L)).toDF("doc_id", "qty"))
    }
    // DML under the renamed schema; bare OPTIMIZE re-clusters; probes
    // stay exact through it all
    TxTable.delete(spark, dir, col("doc_id") === 90L)
    spark.sql(s"OPTIMIZE graft.`$dir`")
    assert(TxTable.read(spark, dir).count() === 179L)
    assert(TxTable.readWhere(spark, dir, col("doc_id") === 90L).count() === 0L)
    val probe = TxTable.readWhere(spark, dir, col("doc_id") === 93L)
    assert(probe.count() === 1L)
  }

  test("time travel still reads the pre-analyze version") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir, (1L to 10L).toDF("id").coalesce(1))
    stripStats(dir)
    val v = TxTable.analyze(spark, dir)
    assert(TxTable.readVersion(spark, dir, v - 1).count() === 10L)
    assert(TxTable.read(spark, dir).count() === 10L)
  }
}
