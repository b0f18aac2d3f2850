package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** The metadata-only COUNT(*) optimizer rule: an ungrouped, unfiltered
  * count-star over a graft snapshot must collapse to a one-row plan
  * with NO scan (the manifest's row counts are the answer), stay
  * snapshot-exact under time travel, and decline — plan untouched —
  * the moment anything could make metadata and scan disagree.
  */
class MetadataAggSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_metaagg").toString + "/t"

  private def build(dir: String): Unit = {
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir, (1L to 10L).toDF("id").coalesce(1))
    TxTable.append(spark, dir, (11L to 25L).toDF("id").coalesce(2))
  }

  private def scansFiles(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BatchScan")

  test("count(*) collapses to a scanless one-row plan with the exact count") {
    val dir = tmp()
    build(dir)
    val counted = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"))
    assert(!scansFiles(counted), counted.queryExecution.executedPlan.toString)
    assert(counted.collect().head.getLong(0) === 25L)
    // Dataset.count() rides the same plan shape
    assert(spark.read.format("graft").load(dir).count() === 25L)
    // SQL catalog spelling too
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$dir`")
      .collect().head.getLong(0) === 25L)
  }

  test("min/max/count(col) are served from stats; strings decline") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      Seq((1L, Some(2.5), "a"), (2L, None, "b"), (7L, Some(-3.5), "c"))
        .toDF("id", "score", "name").coalesce(1))
    val served = spark.read.format("graft").load(dir)
      .agg(count(lit(1)).as("n"), min("id").as("min_id"),
        max("id").as("max_id"), count(col("score")).as("n_score"),
        min("score").as("min_s"), max("score").as("max_s"))
    assert(!scansFiles(served), served.queryExecution.executedPlan.toString)
    val r = served.collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 1L && r.getLong(2) === 7L)
    assert(r.getLong(3) === 2L && r.getDouble(4) === -3.5 &&
      r.getDouble(5) === 2.5)
    // a renaming Project between agg and relation is followed
    val renamed = spark.read.format("graft").load(dir)
      .select(col("id").as("renamed_id")).agg(max("renamed_id"))
    assert(!scansFiles(renamed))
    assert(renamed.collect().head.getLong(0) === 7L)
    // string DATA columns decline (possibly truncated stats bounds)
    val minName = spark.read.format("graft").load(dir).agg(min("name"))
    assert(scansFiles(minName))
    assert(minName.collect().head.getString(0) === "a")
    // a computed column is not a bare relation column → decline
    val computed = spark.read.format("graft").load(dir)
      .select((col("id") + 1).as("id2")).agg(max("id2"))
    assert(scansFiles(computed))
    assert(computed.collect().head.getLong(0) === 8L)
  }

  test("partition-column min/max served from path pseudo-stats") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.replacePartitions(spark, dir,
      Seq((1L, 10L), (2L, 40L), (3L, 10L)).toDF("id", "day"), Seq("day"))
    val served = spark.read.format("graft").load(dir)
      .agg(min("day"), max("day"), count(col("day")))
    assert(!scansFiles(served))
    val r = served.collect().head
    // partition types come from directory-string inference (no declared
    // schema here) → day reads back as Integer
    assert(r.get(0) === 10 && r.get(1) === 40 && r.getLong(2) === 3L)
  }

  test("string partition extremes use STRING order, not the numeric tag guess") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // all values parse as numbers → manifest tags them numeric, and
    // WITHOUT a declared schema directory inference would even type
    // the column int; a DECLARED string schema keeps it a string, so
    // SQL says MIN="10" (byte order), not "5"
    val df = {
      val s2 = spark; import s2.implicits._
      Seq((1L, "5"), (2L, "10")).toDF("id", "pt")
    }
    TxTable.create(spark, dir, df.schema, Seq("pt"))
    TxTable.replacePartitions(spark, dir, df, Seq("pt"))
    val served = spark.read.format("graft").load(dir)
      .agg(min("pt"), max("pt"))
    assert(!scansFiles(served))
    val r = served.collect().head
    assert(r.getString(0) === "10" && r.getString(1) === "5")
  }

  test("time travel counts the PINNED version's manifest") {
    val dir = tmp()
    build(dir)
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(dir)
      .agg(count(lit(1)))
    assert(!scansFiles(v1))
    assert(v1.collect().head.getLong(0) === 10L)
  }

  test("declines: filters, grouping, distinct, other aggregates, CDF") {
    val dir = tmp()
    build(dir)
    def t = spark.read.format("graft").load(dir)
    val filtered = t.filter(col("id") > 5L).agg(count(lit(1)))
    assert(scansFiles(filtered))
    assert(filtered.collect().head.getLong(0) === 20L)
    val grouped = t.groupBy(col("id") % 2).agg(count(lit(1)))
    assert(scansFiles(grouped))
    val distinctC = t.agg(countDistinct(col("id")))
    assert(scansFiles(distinctC))
    assert(distinctC.collect().head.getLong(0) === 25L)
    val mixed = t.agg(count(lit(1)), sum(col("id")))
    assert(scansFiles(mixed))
    TxTable.delete(spark, dir, col("id") === 1L)
    val cdf = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir).agg(count(lit(1)))
    assert(scansFiles(cdf))
  }

  test("GROUP BY partition column collapses to a scanless per-partition plan") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // two appends → multiple files per partition; v has nulls so
    // COUNT(v) differs from COUNT(*)
    TxTable.append(spark, dir,
      Seq((1L, 10L, Some(5L)), (2L, 40L, None), (3L, 10L, Some(7L)))
        .toDF("id", "day", "v"), partitionCols = Seq("day"))
    TxTable.append(spark, dir,
      Seq((4L, 40L, Some(1L)), (5L, 10L, None))
        .toDF("id", "day", "v"), partitionCols = Seq("day"))
    val served = spark.read.format("graft").load(dir)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), min("id").as("min_id"),
        max("id").as("max_id"), count(col("v")).as("n_v"))
    assert(!scansFiles(served), served.queryExecution.executedPlan.toString)
    val got = served.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === Map(10 -> ((3L, 1L, 5L, 2L)), 40 -> ((2L, 2L, 4L, 1L))))
    // SQL catalog spelling rides the same rule
    val sqlGot = spark.sql(
      s"SELECT day, COUNT(*) AS n FROM graft.`$dir` GROUP BY day")
    assert(!scansFiles(sqlGot))
    assert(sqlGot.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(10 -> 3L, 40 -> 2L))
  }

  test("grouped: the hive null partition is a real group with a NULL key") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      Seq((1L, Some(10L)), (2L, None), (3L, None))
        .toDF("id", "day"), partitionCols = Seq("day"))
    val served = spark.read.format("graft").load(dir)
      .groupBy("day").agg(count(lit(1)).as("n"), count(col("day")).as("n_day"))
    assert(!scansFiles(served), served.queryExecution.executedPlan.toString)
    val got = served.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(Some(10) -> ((1L, 1L)), None -> ((2L, 0L))))
  }

  test("grouped declines: data-column keys, computed keys, string data extremes") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      Seq((1L, 10L, "a"), (2L, 40L, "b")).toDF("id", "day", "name"),
      partitionCols = Seq("day"))
    def t = spark.read.format("graft").load(dir)
    // grouping by a DATA column → scan
    val byData = t.groupBy("id").agg(count(lit(1)))
    assert(scansFiles(byData))
    // grouping by an EXPRESSION of the partition column → scan
    val byExpr = t.groupBy((col("day") + 1).as("d2")).agg(count(lit(1)))
    assert(scansFiles(byExpr))
    // string DATA extreme inside a grouped agg → scan, results exact
    val strMin = t.groupBy("day").agg(min("name").as("m"))
    assert(scansFiles(strMin))
    assert(strMin.collect().map(r => r.getInt(0) -> r.getString(1)).toMap ===
      Map(10 -> "a", 40 -> "b"))
    // but partition-column extremes within the group ARE served
    val ownMin = t.groupBy("day").agg(min("day").as("m"), count(lit(1)).as("n"))
    assert(!scansFiles(ownMin))
    assert(ownMin.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ===
      Map(10 -> 10, 40 -> 40))
  }

  test("grouped over a SUBSET of multi-column partitioning merges groups") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // partitioned by (day, region): a GROUP BY day must MERGE the
    // per-(day, region) manifest groups — one output row per day with
    // summed counts and folded extremes, never one row per (day,
    // region) combination with duplicate keys / partial aggregates
    TxTable.append(spark, dir,
      Seq((1L, 10L, 1L, Some(5L)), (2L, 10L, 2L, None),
        (3L, 40L, 1L, Some(7L)), (4L, 40L, 2L, Some(2L)),
        (5L, 10L, 2L, Some(9L)))
        .toDF("id", "day", "region", "v"),
      partitionCols = Seq("day", "region"))
    def t = spark.read.format("graft").load(dir)
    val byDay = t.groupBy("day")
      .agg(count(lit(1)).as("n"), min("id").as("min_id"),
        max("id").as("max_id"), count(col("v")).as("n_v"))
    assert(!scansFiles(byDay), byDay.queryExecution.executedPlan.toString)
    val got = byDay.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === Map(10 -> ((3L, 1L, 5L, 2L)), 40 -> ((2L, 3L, 4L, 2L))))
    // grouping by the SECOND partition column alone merges across days
    val byRegion = t.groupBy("region").agg(count(lit(1)).as("n"))
    assert(!scansFiles(byRegion))
    assert(byRegion.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(1 -> 2L, 2 -> 3L))
    // grouping by BOTH stays exact and scanless
    val byBoth = t.groupBy("day", "region").agg(count(lit(1)).as("n"))
    assert(!scansFiles(byBoth))
    assert(byBoth.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap ===
      Map((10, 1) -> 1L, (10, 2) -> 2L, (40, 1) -> 1L, (40, 2) -> 1L))
  }

  test("grouped time travel serves the PINNED version's partitions") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.append(spark, dir,
      Seq((1L, 10L)).toDF("id", "day"), partitionCols = Seq("day"))
    TxTable.append(spark, dir,
      Seq((2L, 40L), (3L, 40L)).toDF("id", "day"), partitionCols = Seq("day"))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(dir)
      .groupBy("day").agg(count(lit(1)).as("n"))
    assert(!scansFiles(v1))
    assert(v1.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(10 -> 1L))
  }

  test("a manifest line without row stats falls back to the scan") {
    val dir = tmp()
    build(dir)
    // strip the stats suffix from the head manifest's file lines —
    // the pre-stats manifest format, which metaRowCount must refuse
    val log = new java.io.File(dir, "_txlog")
    val head = log.listFiles().filter(_.getName.endsWith(".manifest"))
      .maxBy(_.getName)
    val lines = scala.io.Source.fromFile(head).getLines().toSeq
    val stripped = lines.head +: lines.tail.map(_.takeWhile(_ != '\t'))
    java.nio.file.Files.write(head.toPath,
      stripped.mkString("\n").getBytes("UTF-8"))
    assert(TxTable.metaRowCount(spark, dir) === None)
    val counted = spark.read.format("graft").load(dir).agg(count(lit(1)))
    assert(scansFiles(counted))
    assert(counted.collect().head.getLong(0) === 25L)
  }
}
