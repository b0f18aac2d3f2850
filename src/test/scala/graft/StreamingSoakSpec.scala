package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.TxTable
import graft.streaming.StreamingSink

/** End-to-end streaming soak (VERDICT r5 "do this" #7): graft SOURCE →
  * transform → MERGE SINK over 50 micro-batches with a checkpoint kill
  * injected every 10 — proving exactly-once under REPEATED failure of
  * the composed pipeline, not per component. The kill deletes the
  * engine's last checkpoint commit marker, which is exactly the
  * crash window where the sink has committed but the engine hasn't:
  * on restart the engine re-runs that batch with the same id and the
  * sink's txn token must skip it.
  */
class StreamingSoakSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("50 micro-batches, a checkpoint kill every 10: downstream state is exact") {
    val s = spark
    import s.implicits._
    val upstream = tmp("graft_soak_up") + "/t"
    val downstream = tmp("graft_soak_down") + "/t"
    val cp = tmp("graft_soak_cp")

    val keySpace = 40L
    def batchRows(b: Int) =
      (0 until 20).map { j =>
        val id = (b * 7 + j) % keySpace // cycles: later batches UPDATE keys
        (id, s"b${b}_$id")
      }.toDF("id", "v")

    // the stream: graft source → transform → merge-by-key sink
    def start() = StreamingSink.toTxTableMerge(
      spark.readStream.format("graft").load(upstream)
        .withColumn("v2", concat(lit("t:"), col("v")))
        .drop("v"),
      downstream, "app_soak", cp, keyCols = Seq("id"))

    // bootstrap version 1 before the stream starts (schema inference)
    TxTable.append(spark, upstream, batchRows(0))
    var q = start()
    q.processAllAvailable()

    var killed = 0
    (1 until 50).foreach { b =>
      TxTable.append(spark, upstream, batchRows(b))
      q.processAllAvailable()
      if (b % 10 == 0) {
        // crash injection: stop, lose the engine's LAST commit marker
        // (sink already committed), restart → replay must be skipped
        q.stop()
        val commits = new java.io.File(cp, "commits").listFiles()
          .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
        val last = commits.max
        Files.delete(Paths.get(cp, "commits", last.toString))
        Files.deleteIfExists(Paths.get(cp, "commits", s".$last.crc"))
        killed += 1
        q = start()
        q.processAllAvailable()
      }
    }
    q.processAllAvailable()
    q.stop()
    assert(killed === 4, "kills at batches 10, 20, 30, 40")

    // expected: per key, the transformed value of the LAST batch that
    // wrote it — computed independently from the same batch definitions
    val expected = (0 until 50).flatMap(b =>
        (0 until 20).map { j =>
          val id = (b * 7 + j) % keySpace
          (b, id, s"t:b${b}_$id")
        })
      .groupBy(_._2).map { case (id, writes) => id -> writes.maxBy(_._1)._3 }

    val got = TxTable.read(spark, downstream).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v2")).toMap
    assert(got.size === expected.size,
      s"one row per key, no duplicates: got ${got.size} keys")
    assert(got === expected,
      "downstream must hold exactly the latest transformed value per key")

    // every upstream version was consumed exactly once: the sink's last
    // applied batch id is 49 and no replay ever double-committed (the
    // downstream row count stays keySpace even after 4 injected crashes)
    assert(StreamingSink.lastTxnVersion(spark, downstream, "app_soak")
      .contains(49L))
    assert(TxTable.read(spark, downstream).count() === keySpace)
  }
}
