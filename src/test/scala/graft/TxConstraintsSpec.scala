package graft

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** Table-level CHECK constraints: declared as carried manifest meta,
  * enforced on every data commit against the freshly written files —
  * a violating commit must throw, clean up, and leave the table
  * exactly as it was. SQL semantics throughout: NULL passes, only
  * FALSE violates.
  */
class TxConstraintsSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_check").toString + "/t"

  private def seed(dir: String): Unit = {
    val s = spark
    import s.implicits._
    TxTable.append(spark, dir,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "qty").coalesce(1))
  }

  test("add + enforce: a violating append throws and commits nothing") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    seed(dir)
    TxTable.addConstraint(spark, dir, "qty_pos", "qty > 0")
    assert(TxTable.constraints(spark, dir) === Map("qty_pos" -> "qty > 0"))
    val headBefore = TxTable.versions(spark, dir).last
    val e = intercept[IllegalStateException] {
      TxTable.append(spark, dir,
        Seq((3L, 5L), (4L, -1L)).toDF("id", "qty").coalesce(1))
    }
    assert(e.getMessage.contains("qty_pos"))
    assert(TxTable.versions(spark, dir).last === headBefore)
    assert(TxTable.read(spark, dir).count() === 2)
    // valid rows still flow; NULL passes (SQL CHECK)
    TxTable.append(spark, dir,
      Seq((5L, Some(7L)), (6L, None)).toDF("id", "qty").coalesce(1))
    assert(TxTable.read(spark, dir).count() === 4)
  }

  test("existing rows must satisfy a new constraint; non-boolean refused") {
    val dir = tmp()
    seed(dir)
    val e = intercept[IllegalArgumentException] {
      TxTable.addConstraint(spark, dir, "small", "qty < 15")
    }
    assert(e.getMessage.contains("1 existing"))
    intercept[IllegalArgumentException] {
      TxTable.addConstraint(spark, dir, "notbool", "qty + 1")
    }
    intercept[IllegalArgumentException] {
      TxTable.addConstraint(spark, dir, "bad name!", "qty > 0")
    }
  }

  test("DML rewrites are enforced; drop re-allows") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    seed(dir)
    TxTable.addConstraint(spark, dir, "qty_pos", "qty > 0")
    // an UPDATE whose SET values violate must be rejected whole
    intercept[IllegalStateException] {
      TxTable.update(spark, dir, col("id") === 1L,
        Map("qty" -> lit(-5L)))
    }
    assert(TxTable.read(spark, dir).where(col("qty") < 0).count() === 0)
    // a MERGE inserting a violating row likewise
    intercept[IllegalStateException] {
      TxTable.merge(spark, dir,
        Seq((9L, -2L)).toDF("id", "qty"), Seq("id"))
    }
    TxTable.dropConstraint(spark, dir, "qty_pos")
    assert(TxTable.constraints(spark, dir) === Map.empty)
    TxTable.update(spark, dir, col("id") === 1L, Map("qty" -> lit(-5L)))
    assert(TxTable.read(spark, dir).where(col("qty") < 0).count() === 1)
    intercept[IllegalArgumentException] {
      TxTable.dropConstraint(spark, dir, "qty_pos") // already gone
    }
  }

  test("constraints survive unrelated commits (carried meta)") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    seed(dir)
    TxTable.addConstraint(spark, dir, "qty_pos", "qty > 0")
    TxTable.append(spark, dir, Seq((7L, 70L)).toDF("id", "qty").coalesce(1))
    TxTable.delete(spark, dir, col("id") === 2L)
    assert(TxTable.constraints(spark, dir) === Map("qty_pos" -> "qty > 0"))
    intercept[IllegalStateException] {
      TxTable.append(spark, dir, Seq((8L, 0L)).toDF("id", "qty").coalesce(1))
    }
  }

  test("a constraint on an evolved column passes old-schema appends (nulls)") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    seed(dir)
    val evolved = org.apache.spark.sql.types.StructType(
      TxTable.read(spark, dir).schema.fields :+
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType, nullable = true))
    TxTable.evolveSchema(spark, dir, evolved)
    TxTable.addConstraint(spark, dir, "score_band",
      "score >= 0.0 AND score <= 1.0")
    // old-shape rows carry score = null → CHECK passes
    TxTable.append(spark, dir, Seq((3L, 30L)).toDF("id", "qty").coalesce(1))
    assert(TxTable.read(spark, dir, mergeSchema = true).count() === 3)
    intercept[IllegalStateException] {
      TxTable.append(spark, dir,
        Seq((4L, 40L, 1.5)).toDF("id", "qty", "score").coalesce(1))
    }
  }

  test("the V2 streaming sink enforces constraints; table stays clean") {
    val s = spark
    import s.implicits._
    val src = tmp()
    val dst = tmp()
    val cp = java.nio.file.Files.createTempDirectory("graft_check_cp")
      .toString
    TxTable.append(spark, src, Seq((1L, 10L)).toDF("id", "qty"))
    seed(dst)
    TxTable.addConstraint(spark, dst, "qty_pos", "qty > 0")
    def stream(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", cp).start(dst)
      try { q.processAllAvailable() } finally q.stop()
    }
    stream() // valid rows flow
    assert(TxTable.read(spark, dst).count() === 3)
    TxTable.append(spark, src, Seq((2L, -5L)).toDF("id", "qty"))
    val before = TxTable.versions(spark, dst).last
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      stream()
    }
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")))
    assert(TxTable.versions(spark, dst).last === before,
      "a violating micro-batch must not commit")
    assert(TxTable.read(spark, dst).where(col("qty") < 0).count() === 0)
  }

  test("racing ADD CONSTRAINT vs appends can never strand violating rows") {
    val s = spark
    import s.implicits._
    // invariant under ANY interleaving: if the constraint is active in
    // the final head, no violating row exists. Closed by two checks:
    // data commits abort when the constraint set moved under them
    // (fingerprint in the claim loop), ADD aborts+revalidates when the
    // head moved during its validation scan (pinned head version).
    (1 to 3).foreach { round =>
      val dir = tmp()
      seed(dir)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val results = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String =
            try {
              if (i == 0) {
                TxTable.addConstraint(spark, dir, "qty_pos", "qty > 0")
                "added"
              } else {
                TxTable.append(spark, dir,
                  Seq((100L * round + i, -i.toLong))
                    .toDF("id", "qty").coalesce(1))
                "appended"
              }
            } catch {
              case _: IllegalStateException => "rejected" // CHECK
              case _: java.util.ConcurrentModificationException => "conflict"
              case e: IllegalArgumentException
                  if e.getMessage.contains("existing rows violate") =>
                "validation_failed"
            }
        })
      }
      pool.shutdown()
      val outcomes = results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      val active = TxTable.constraints(spark, dir).contains("qty_pos")
      val violating = TxTable.read(spark, dir).where(col("qty") <= 0).count()
      assert(!active || violating === 0L,
        s"round $round: constraint active with $violating violating rows " +
          s"(outcomes: ${outcomes.mkString(",")})")
    }
  }

  test("SQL spellings: ADD/DROP CONSTRAINT and enforced INSERT") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    seed(dir)
    spark.sql(
      s"ALTER TABLE graft.`$dir` ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    assert(TxTable.constraints(spark, dir) === Map("qty_pos" -> "qty > 0"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (9, -1)")
    }
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")))
    spark.sql(s"ALTER TABLE graft.`$dir` DROP CONSTRAINT qty_pos")
    assert(TxTable.constraints(spark, dir) === Map.empty)
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (9, -1)")
    assert(TxTable.read(spark, dir).count() === 3)
  }
}
