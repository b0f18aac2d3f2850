package graft

import graft.ops.TxTable

/** Transaction-log table format: snapshot isolation, time travel,
  * vacuum, and the concurrent-reader guarantee the directory-swap sink
  * cannot give (VERDICT r2 "What's missing" #1).
  */
class TxTableSpec extends SparkSpec {

  test("overwrite/append commit versions; read sees the head snapshot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tx").toString + "/t"
    val v1 = TxTable.overwrite(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = TxTable.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))
    val v3 = TxTable.overwrite(spark, dir, Seq((9L, "z")).toDF("id", "v"))
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("time travel reads exact historical snapshots") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tx").toString + "/t"
    TxTable.overwrite(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    TxTable.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))
    TxTable.overwrite(spark, dir, Seq((3L, "c")).toDF("id", "v"))
    assert(TxTable.readVersion(spark, dir, 1).collect().map(_.getLong(0)).toSet == Set(1L))
    assert(TxTable.readVersion(spark, dir, 2).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(TxTable.readVersion(spark, dir, 3).collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("a reader racing overwrite commits always sees a complete committed snapshot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tx").toString + "/t"
    // each version v holds exactly v rows — a torn read would surface as
    // a count outside the committed set or an exception
    TxTable.overwrite(spark, dir, Seq.tabulate(1)(i => (i.toLong, "x")).toDF("id", "v"))
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty)
        try counts.add(TxTable.read(spark, dir).count())
        catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try
      (2 to 6).foreach { n =>
        TxTable.overwrite(spark, dir,
          Seq.tabulate(n)(i => (i.toLong, "x")).toDF("id", "v"))
      }
    finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, s"reader failed mid-swap: $failure")
    val seen = counts.toArray.map(_.asInstanceOf[Long]).toSet
    assert(seen.nonEmpty && seen.subsetOf((1L to 6L).toSet),
      s"every read must be one full committed version, saw $seen")
  }

  test("vacuum keeps recent snapshots readable and drops dead data dirs") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tx").toString + "/t"
    TxTable.overwrite(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    TxTable.overwrite(spark, dir, Seq((2L, "b")).toDF("id", "v"))
    TxTable.overwrite(spark, dir, Seq((3L, "c")).toDF("id", "v"))
    val dataDirs = (d: String) => new java.io.File(s"$d/data").list().length
    assert(dataDirs(dir) == 3)
    TxTable.vacuum(spark, dir, keepVersions = 2)
    assert(TxTable.versions(spark, dir) == Seq(2L, 3L))
    assert(dataDirs(dir) == 2, "version 1's data dir deleted")
    assert(TxTable.readVersion(spark, dir, 2).collect().map(_.getLong(0)).toSet == Set(2L))
    assert(TxTable.read(spark, dir).collect().map(_.getLong(0)).toSet == Set(3L))
  }
}
