package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CyclicBarrier}

import org.apache.spark.sql.functions._

import graft.ops.TxTable

/** Concurrent-DML stress soak: N threads mix append / MERGE / DELETE /
  * OPTIMIZE(compact) against ONE table, with MERGE and DELETE deliberately
  * colliding on the same key space. Invariants:
  *  1. every attempt either COMMITS a version or ABORTS with the
  *     conflict error (ConcurrentModificationException) — nothing else;
  *  2. no committed version is ever lost (versions are a contiguous
  *     1..head range, one manifest each);
  *  3. the final snapshot equals a serial replay of the COMMITTED
  *     operations in version order — the log is a serialization of
  *     what actually landed.
  */
class TxConcurrencySoakSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_soak").toString + "/t"

  test("mixed append/MERGE/DELETE/compact soak: all commits land or abort cleanly") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    // base: keys 0..99, val = 0
    TxTable.overwrite(spark, dir,
      (0L until 100L).map(i => (i, 0L)).toDF("id", "v").repartition(4))

    sealed trait Op
    case class Appended(lo: Long) extends Op          // 10 rows lo..lo+9
    case class Merged(k: Long, value: Long) extends Op
    case class Deleted(k: Long) extends Op
    case object Compacted extends Op

    // version → op, for the serial replay; puts never collide because
    // each committed version is claimed by exactly one writer
    val committed = new java.util.concurrent.ConcurrentHashMap[Long, Op]()
    val aborted = new ConcurrentLinkedQueue[String]()
    val noops = new ConcurrentLinkedQueue[String]()
    val unexpected = new ConcurrentLinkedQueue[Throwable]()
    val nThreads = 6
    val opsPerThread = 5
    val barrier = new CyclicBarrier(nThreads)

    def record(op: Op)(run: => Option[Long]): Unit =
      try run match {
        case Some(v) =>
          val prev = committed.put(v, op)
          assert(prev == null, s"version $v claimed twice: $prev vs $op")
        case None => noops.add(op.toString); ()
      } catch {
        case _: java.util.ConcurrentModificationException =>
          aborted.add(op.toString); ()
        case t: Throwable => unexpected.add(t); ()
      }

    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        barrier.await()
        (0 until opsPerThread).foreach { i =>
          val salt = t * opsPerThread + i
          // MERGE and DELETE share the 0..6 key space → real collisions
          (salt % 4) match {
            case 0 => record(Appended(1000L + salt * 10)) {
              Some(TxTable.append(spark, dir,
                (1000L + salt * 10 until 1000L + salt * 10 + 10)
                  .map(k => (k, -1L)).toDF("id", "v").coalesce(1)))
            }
            case 1 => record(Merged(salt.toLong % 7, 7000L + salt)) {
              Some(TxTable.merge(spark, dir,
                Seq((salt.toLong % 7, 7000L + salt)).toDF("id", "v"),
                Seq("id")))
            }
            case 2 => record(Deleted(salt.toLong % 7)) {
              TxTable.delete(spark, dir, col("id") === salt.toLong % 7)
            }
            case _ => record(Compacted) {
              Some(TxTable.compact(spark, dir, targetBytes = 1L << 20))
            }
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(unexpected.isEmpty,
      s"only commit-or-conflict allowed, got: ${unexpected.peek()}")

    // invariant 2: contiguous version range, no lost commits
    val vs = TxTable.versions(spark, dir)
    assert(vs == (1L to vs.last), s"versions must be contiguous, got $vs")
    val total = committed.size + aborted.size + noops.size
    assert(total == nThreads * opsPerThread,
      s"every op must resolve: $total of ${nThreads * opsPerThread}")
    assert(committed.size >= nThreads,
      s"the soak must actually commit work, got ${committed.size}")

    // invariant 3: serial replay of the committed log in version order
    var state = (0L until 100L).map(i => (i, 0L)).toMap
    committed.entrySet().stream().sorted(
      java.util.Comparator.comparingLong(e => e.getKey)).forEach { e =>
      e.getValue match {
        case Appended(lo) =>
          state = state ++ (lo until lo + 10).map(k => (k, -1L))
        case Merged(k, value) => state = state + (k -> value)
        case Deleted(k) => state = state - k
        case Compacted => ()
      }
    }
    val got = TxTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == state,
      s"final snapshot must equal serial replay of the committed log " +
      s"(got ${got.size} rows, want ${state.size})")
  }

  test("two maintained appenders race on one table: zero failed batches, bounded files") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    TxTable.overwrite(spark, dir,
      (0L until 20L).map(i => (i, 0L)).toDF("k", "v").coalesce(1))
    // both appenders cross the maintenance threshold around the same
    // commits — their OPTIMIZEs conflict; the hook must treat a lost
    // race as success (the other's compaction served the policy) and
    // NEVER fail a batch whose append already landed
    val policy = Some(TxTable.Maintenance(maxFiles = 6))
    val unexpected = new ConcurrentLinkedQueue[Throwable]()
    val nThreads = 2
    val perThread = 15
    val barrier = new CyclicBarrier(nThreads)
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        barrier.await()
        (0 until perThread).foreach { i =>
          try {
            TxTable.append(spark, dir,
              Seq((1000L + t * 100 + i, t.toLong)).toDF("k", "v")
                .coalesce(1))
            TxTable.maintainAfterAppend(spark, dir, Seq("k"), policy)
          } catch { case e: Throwable => unexpected.add(e); () }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(unexpected.isEmpty,
      s"a lost maintenance race must be benign — got: ${unexpected.peek()}")
    // every append landed (plain appends never conflict; no batch was
    // failed by a maintenance conflict)
    assert(TxTable.read(spark, dir).count() ===
      20L + nThreads * perThread)
    // and the policy's goal held despite the races: one more quiet
    // check either finds the head already healthy or compacts it once
    TxTable.maintainAfterAppend(spark, dir, Seq("k"), policy)
    assert(TxTable.read(spark, dir).inputFiles.length <= 6,
      "racing maintainers must still leave a bounded file count")
  }
}
