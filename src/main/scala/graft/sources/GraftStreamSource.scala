package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxTable

/** Streaming half of the `graft` DataSource V2: the TxTable as a
  * Structured Streaming SOURCE —
  *
  * {{{
  *   spark.readStream.format("graft").load(tablePath)
  *   spark.readStream.format("graft")
  *     .option("startingVersion", 5).load(tablePath)
  * }}}
  *
  * Offsets ARE manifest versions: micro-batch (start, end] reads
  * exactly the data files ADDED between those two snapshots —
  * O(delta) I/O per batch, never a history rescan, and replays are
  * deterministic because a version's file set is immutable. The
  * engine's checkpoint persists the version offsets, so
  * crash-restart resumes from the last committed version; pair with
  * [[graft.streaming.StreamingSink]] for exactly-once
  * table-to-table streaming.
  *
  * Contract notes:
  *  - Append-only semantics: commits that also REMOVE files
  *    (overwrite / replacePartitions / optimize) surface their
  *    rewritten rows as additions, same as [[TxTable.readAppended]].
  *  - The schema is pinned at stream start (a later mergeSchema
  *    widening does not change in-flight batch schemas).
  *  - Offsets older than vacuum retention fail loudly rather than
  *    silently skipping data.
  */
private[sources] class GraftTable(path: String, spark: SparkSession,
                                  delegate: ParquetTable) extends Table
    with SupportsRead {

  override def name: String = delegate.name

  override def schema: StructType = delegate.schema

  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  /** The REAL ParquetScanBuilder negotiates pruning/pushdown (via the
    * forwarding shim — `build()` is covariantly typed so it cannot be
    * overridden directly); only the built Scan is wrapped to add the
    * micro-batch stream entry point.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val inner = new ParquetScanBuilder(spark, delegate.fileIndex,
      delegate.schema, delegate.dataSchema, options)
    // the streamed schema is the built scan's readSchema (post-pruning),
    // not the table schema — if streaming scans ever negotiate column
    // pruning, readers emit exactly the width the scan advertises
    new org.apache.spark.sql.GraftForwardingScanBuilder(inner,
      s => new GraftStreamableScan(s, path, spark, s.readSchema(), options))
  }
}

/** Forwards the batch path to the inner parquet scan untouched; adds
  * the streaming path.
  */
private[sources] class GraftStreamableScan(inner: Scan, path: String,
    spark: SparkSession, pinned: StructType,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(path, spark, pinned, options)
}

private[sources] class GraftMicroBatchStream(path: String, spark: SparkSession,
    pinned: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  // "processed through version v" (inclusive); startingVersion=N means
  // the first batch begins at version N, i.e. offset N-1 is done
  private val startOffset: Long =
    Option(options.get("startingVersion")).map(_.toLong - 1).getOrElse(0L)

  override def initialOffset(): Offset = LongOffset(math.max(startOffset, 0L))

  override def latestOffset(): Offset =
    LongOffset(TxTable.versions(spark, path).last)

  override def deserializeOffset(json: String): Offset = LongOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().toLong
  }

  private def filesBetween(fromV: Long, toV: Long): Seq[String] = {
    val versions = TxTable.versions(spark, path)
    require(versions.contains(toV),
      s"version $toV of $path no longer exists — vacuum outran the stream")
    val to = TxTable.snapshotFiles(spark, path, toV).toSet
    val from =
      if (fromV <= 0) Set.empty[String]
      else {
        require(versions.contains(fromV),
          s"checkpointed version $fromV of $path no longer exists " +
            "(vacuum retention passed) — restart from a fresh checkpoint")
        TxTable.snapshotFiles(spark, path, fromV).toSet
      }
    (to -- from).toSeq.sorted
  }

  /** A fresh parquet V2 scan over exactly the delta's files, schema
    * pinned to the stream's. Filters stay correct because file-source
    * pushdown is advisory: Spark keeps the post-scan Filter node.
    */
  private def deltaScan(files: Seq[String]): Scan =
    ParquetTable(s"graft-stream:$path", spark, options, files,
      Some(pinned), classOf[ParquetFileFormat])
      .newScanBuilder(options).build()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = filesBetween(version(start), version(end))
    if (files.isEmpty) Array.empty
    else deltaScan(files).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // factory captures schema/conf, not a file list — built from an
    // EMPTY file list to make that assumption explicit (and skip a
    // pointless head-snapshot resolution); it reads whatever
    // FilePartitions planInputPartitions handed out
    deltaScan(Seq.empty).toBatch.createReaderFactory()
  }
}
