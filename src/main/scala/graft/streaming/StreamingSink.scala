package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TxTable

/** Streaming ingestion into the transaction-log table format:
  * `foreachBatch` appends whose exactly-once guarantee comes from
  * recording the (txnApp, txnVersion=micro-batch id) pair INSIDE the
  * committed manifest (via [[TxTable.commitMeta]]) — the same idempotent-
  * writer pattern Delta exposes as `txnAppId`/`txnVersion`.
  *
  * Why this is exactly-once: Structured Streaming's checkpoint replays
  * any micro-batch whose sink write may not have completed. The append
  * and its batch id commit in ONE atomic manifest claim, so on replay
  * [[lastTxnVersion]] either sees the batch (crash happened after the
  * claim → skip, no duplicate) or doesn't (crash before → append runs
  * once). There is no state outside the log to get out of sync.
  *
  * The `txn.<app>` key is in TxTable's carried-meta namespace: every
  * later commit re-emits the latest value in its own head line, so the
  * HEAD manifest always holds each app's newest batch id. That makes the
  * guarantee survive [[TxTable.vacuum]] (which prunes old manifests) —
  * the same reason Delta retains `SetTransaction` actions through log
  * checkpoints — and makes the lookup one manifest read, not a log walk.
  *
  * Scale shape: each micro-batch is one append commit — O(batch) data
  * I/O, O(1) manifest I/O — and readers downstream consume the table
  * incrementally via [[TxTable.readAppended]], so an end-to-end
  * stream → table → incremental-consumer pipeline never rescans
  * history. The reference is batch-only (SURVEY.md §2.10); this is the
  * north-star streaming lift of its publish step.
  */
object StreamingSink {

  private def txnKey(app: String) = s"txn.$app"

  /** Highest micro-batch id `txnApp` has committed to `path`, or None.
    * One manifest read: `txn.*` keys are carried forward by every
    * commit, so the head manifest holds each app's latest batch id
    * regardless of how many commits (or vacuums) happened since.
    */
  def lastTxnVersion(spark: SparkSession, path: String,
                     txnApp: String): Option[Long] =
    TxTable.lastTxnVersion(spark, path, txnApp)

  /** Idempotent append of one micro-batch: skips iff a manifest already
    * records a `txnVersion >= batchId` for this `txnApp` (replays are
    * always of the LAST batch, so `>=` is the full dedup condition).
    */
  def appendBatch(path: String, txnApp: String,
                  partitionCols: Seq[String] = Nil)
                 (df: Dataset[Row], batchId: Long): Unit = {
    TxTable.requireTokenSafe(txnApp, "txnApp")
    val spark = df.sparkSession
    val already = TxTable.exists(spark, path) &&
      lastTxnVersion(spark, path, txnApp).exists(_ >= batchId)
    if (!already)
      // the guard re-checks `txn.<app> < batchId` inside the claim loop:
      // a zombie driver racing its restarted replacement (both running
      // the same batchId after a checkpoint replay) would otherwise
      // both pass the head check above and double-append
      TxTable.append(spark, path, df, partitionCols,
        meta = Map(txnKey(txnApp) -> batchId.toString),
        guard = Map(txnKey(txnApp) -> batchId))
  }

  /** Start a streaming append of `stream` into the TxTable at `path`.
    * `txnApp` names this writer for idempotence (one logical writer =
    * one stable id); `checkpoint` is the Structured Streaming
    * checkpoint dir (offsets + commit log).
    */
  def toTxTable(stream: DataFrame, path: String, txnApp: String,
                checkpoint: String,
                partitionCols: Seq[String] = Nil): StreamingQuery = {
    TxTable.requireTokenSafe(txnApp, "txnApp")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(appendBatch(path, txnApp, partitionCols) _)
      .start()
  }

  /** Idempotent UPSERT of one micro-batch: [[TxTable.merge]] on
    * `keyCols` under the same txn guard as [[appendBatch]]. When
    * `latestBy` names an ordering column, each key's greatest row WITHIN
    * the batch wins before merging (a CDC batch can carry several
    * updates to one key; merging them all would be update-order
    * nondeterminism) — otherwise the batch must already be key-unique,
    * which `merge` enforces.
    *
    * Exactly-once reasoning is identical to append: the merge commit and
    * its batch id claim one manifest atomically, so a checkpoint replay
    * either sees the recorded batch (skip) or re-runs the merge against
    * the SAME base snapshot the crashed attempt saw — upserts of the
    * same data over the same base are idempotent in effect, and the
    * guard closes the zombie-vs-restart double-commit race.
    */
  def mergeBatch(path: String, txnApp: String, keyCols: Seq[String],
                 latestBy: Option[String] = None,
                 partitionCols: Seq[String] = Nil)
                (df: Dataset[Row], batchId: Long): Unit = {
    TxTable.requireTokenSafe(txnApp, "txnApp")
    val spark = df.sparkSession
    val exists = TxTable.exists(spark, path)
    val already = exists &&
      lastTxnVersion(spark, path, txnApp).exists(_ >= batchId)
    if (!already) {
      val batch = latestBy match {
        case Some(ord) => graft.ops.Windows.topOnePerGroup(
          df.toDF(), keyCols, Seq(org.apache.spark.sql.functions.col(ord).desc))
        case None => df.toDF()
      }
      // merge requires an existing table: the stream's FIRST batch
      // bootstraps it with an append under the same txn meta/guard so
      // a replay of batch 0 still skips. The append path bypasses
      // merge's duplicate-key rejection, so enforce it here too —
      // otherwise a duplicate-key first batch (latestBy = None) plants
      // several rows per key in a table whose contract is
      // one-row-per-key, and every later merge inherits the mess.
      if (!exists) {
        import org.apache.spark.sql.functions.col
        val dup = batch.groupBy(keyCols.map(col): _*)
          .count().where(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"mergeBatch bootstrap batch $batchId has duplicate key " +
          s"${dup.headOption} — pass latestBy to pick a winner or " +
          "aggregate upstream")
        TxTable.append(spark, path, batch, partitionCols,
          meta = Map(txnKey(txnApp) -> batchId.toString),
          guard = Map(txnKey(txnApp) -> batchId))
      }
      else
        // a latestBy batch is topOnePerGroup output — key-unique by
        // construction, so merge's duplicate probe (an extra exchange
        // per micro-batch) is skipped; without latestBy the caller's
        // uniqueness claim is verified by the probe
        TxTable.merge(spark, path, batch, keyCols, partitionCols,
          meta = Map(txnKey(txnApp) -> batchId.toString),
          guard = Map(txnKey(txnApp) -> batchId),
          checkUniqueKeys = latestBy.isEmpty)
    }
  }

  /** Start a streaming upsert of `stream` into the TxTable at `path`:
    * the streaming lift of `Sinks.upsert` — each micro-batch merges by
    * key instead of appending, so the table converges to
    * one-row-per-key current state (dimension/feature tables fed by a
    * change stream) rather than an event log.
    */
  def toTxTableMerge(stream: DataFrame, path: String, txnApp: String,
                     checkpoint: String, keyCols: Seq[String],
                     latestBy: Option[String] = None,
                     partitionCols: Seq[String] = Nil): StreamingQuery = {
    TxTable.requireTokenSafe(txnApp, "txnApp")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(mergeBatch(path, txnApp, keyCols, latestBy,
        partitionCols) _)
      .start()
  }
}
