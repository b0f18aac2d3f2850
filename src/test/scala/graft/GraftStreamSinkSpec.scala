package graft

import java.nio.file.Files

import graft.ops.TxTable

/** `df.writeStream.format("graft")` — the native V2 streaming sink:
  * per-epoch executor-written parquet claimed by one manifest commit
  * carrying the `txn.<queryId>` idempotence token.
  */
class GraftStreamSinkSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("table-to-table streaming: every source commit lands exactly once") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_src") + "/a"
    val dst = tmp("gss_dst") + "/b"
    val cp = tmp("gss_cp")
    TxTable.append(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", cp).start(dst)
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(TxTable.read(spark, dst).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
    // two more source commits, restart from the checkpoint: the new
    // rows arrive exactly once, nothing replays
    TxTable.append(spark, src, Seq((3L, "c")).toDF("id", "v"))
    TxTable.append(spark, src, Seq((4L, "d")).toDF("id", "v"))
    run()
    assert(TxTable.read(spark, dst).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L, 4L))
    // an idle restart commits nothing new
    val before = TxTable.versions(spark, dst)
    run()
    assert(TxTable.versions(spark, dst) === before,
      "empty epochs must not commit")
    // the sink's commits carry the stream's idempotence token
    val meta = TxTable.commitMeta(spark, dst, before.last)
    assert(meta.keys.exists(_.startsWith("txn.")), meta.toString)
  }

  test("a mid-stream RENAME COLUMN fails the stream loudly instead of nulling the column") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_ren_src") + "/a"
    val cp = tmp("gss_ren_cp")
    val out = tmp("gss_ren_out") + "/o"
    TxTable.append(spark, src, Seq((1L, "a")).toDF("id", "v"))
    // the corruption window is a RUNNING query: its schema was pinned
    // at start, so a rename + append landing mid-stream would plan the
    // new files with the stale pinned column and fill it with nulls —
    // the source must fail the query instead (a RESTART re-pins the
    // current schema and is fine)
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("parquet")
      .option("checkpointLocation", cp)
      .option("path", out).start()
    try {
      q.processAllAvailable()
      TxTable.renameColumn(spark, src, "v", "w")
      TxTable.append(spark, src, Seq((2L, "b")).toDF("id", "w"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("renamed") || m.contains("dropped")),
        s"expected the rename guard, got: ${msgs(e).mkString(" | ")}")
    } finally q.stop()
  }

  test("the streamed table is a regular TxTable: batch reads, history, downstream streams") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_src") + "/a"
    val dst = tmp("gss_dst") + "/b"
    TxTable.append(spark, src,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", tmp("gss_cp")).start(dst)
    q.processAllAvailable(); q.stop()
    // plain batch surfaces all see the streamed table
    assert(spark.read.format("graft").load(dst).count() === 10L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dst`")
      .head().getLong(0) === 10L)
    val hist = TxTable.history(spark, dst)
    assert(hist.map(_._2) === Seq("append"))
    // and it feeds the NEXT stream incrementally — end-to-end pipeline
    val dst2 = tmp("gss_dst2") + "/c"
    val q2 = spark.readStream.format("graft").load(dst)
      .writeStream.format("graft")
      .option("checkpointLocation", tmp("gss_cp2")).start(dst2)
    q2.processAllAvailable(); q2.stop()
    assert(TxTable.read(spark, dst2).count() === 10L)
  }

  test("writeStream.toTable targets a catalog table by name") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_src") + "/a"
    val dst = tmp("gss_dst") + "/b"
    TxTable.append(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // pre-create through the catalog, then stream into it by name
    spark.sql(s"CREATE TABLE graft.`$dst` (id BIGINT, v STRING)")
    val q = spark.readStream.format("graft").load(src)
      .writeStream.option("checkpointLocation", tmp("gss_cp"))
      .toTable(s"graft.`$dst`")
    q.processAllAvailable(); q.stop()
    assert(spark.sql(s"SELECT id FROM graft.`$dst` ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("streaming into a hive-partitioned table routes rows to the layout") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_src") + "/a"
    val dst = tmp("gss_dst") + "/b"
    val cp = tmp("gss_cp")
    TxTable.append(spark, src,
      Seq((1L, "07", 1.5), (2L, "08", 2.5), (3L, null, 3.5),
        (4L, "b d", 4.5)).toDF("id", "day", "v"))
    // the destination's declared layout drives the streaming writer
    spark.sql(s"CREATE TABLE graft.`$dst` (id BIGINT, day STRING, " +
      "v DOUBLE) PARTITIONED BY (day)")
    val q = spark.readStream.format("graft").load(src)
      .writeStream.option("checkpointLocation", cp)
      .toTable(s"graft.`$dst`")
    q.processAllAvailable(); q.stop()
    // values round-trip, including null (__HIVE_DEFAULT_PARTITION__)
    // and a path-escaped value; declared STRING type keeps "07"
    val got = TxTable.read(spark, dst).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq === Seq((1L, "07", 1.5), (2L, "08", 2.5), (3L, null, 3.5),
        (4L, "b d", 4.5)))
    // the layout is real: partition predicates prune through the catalog
    val one = spark.sql(
      s"SELECT id FROM graft.`$dst` WHERE day = '07'")
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    // a second epoch (checkpoint restart) appends into the SAME
    // partitions without clobbering or replaying
    TxTable.append(spark, src, Seq((5L, "07", 5.5)).toDF("id", "day", "v"))
    val q2 = spark.readStream.format("graft").load(src)
      .writeStream.option("checkpointLocation", cp)
      .toTable(s"graft.`$dst`")
    q2.processAllAvailable(); q2.stop()
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dst` WHERE day='07'")
      .head().getLong(0) === 2L)
    assert(TxTable.read(spark, dst).count() === 5L)
  }

  test("complete output mode is refused — the sink is append-only") {
    val s = spark
    import s.implicits._
    val src = tmp("gss_src") + "/a"
    TxTable.append(spark, src, Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(src)
        .groupBy("v").count()
        .writeStream.format("graft")
        .outputMode("complete")
        .option("checkpointLocation", tmp("gss_cp"))
        .start(tmp("gss_dst") + "/b")
      q.processAllAvailable(); q.stop()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")),
      s"got: $e")
  }
}
