package graft.streaming

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

import graft.ops.TxTable

/** The TxTable as a NATIVE Structured Streaming sink —
  *
  * {{{
  *   df.writeStream.format("graft")
  *     .option("checkpointLocation", cp).start(tablePath)
  * }}}
  *
  * Executors write one parquet file per (epoch, partition) straight
  * into a per-epoch commit dir — distributed, never through the
  * driver, using Spark's own parquet writer factory
  * ([[GraftShim.parquetWriteKit]]) so every session setting applies —
  * and the driver's epoch commit claims exactly those files in ONE
  * manifest that also carries the `txn.<queryId> = epochId`
  * idempotence token ([[TxTable.commitStreamingFiles]]). That is the
  * same atomic (files + token) unit the `foreachBatch`-based
  * [[StreamingSink]] uses, so the exactly-once story is identical:
  * a replayed epoch either finds its token (crash after the claim →
  * its re-written files are discarded, no duplicate) or doesn't
  * (crash before → the claim runs once). The query id is the STABLE
  * streaming id (constant across checkpoint restarts), so the
  * guarantee survives restart, vacuum (carried meta), and foreign
  * commits interleaving with the stream.
  *
  * Append-only, like the file sinks: Complete/Update modes are refused
  * at build time. Downstream consumers read the table incrementally
  * ([[TxTable.readAppended]] / `readStream.format("graft")`), making
  * table-to-table streaming pipelines end-to-end incremental with no
  * history rescans — the shape that holds at 100 TB.
  */
class GraftStreamingWrite(path: String, schema: StructType,
                          queryId: String) extends StreamingWrite {

  require(!queryId.exists(c => c == ' ' || c == '=' || c == '\n'),
    "stream query id must be manifest-token-safe")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (factory, conf) =
      GraftShim.parquetWriteKit(SparkSession.active, schema)
    new GraftStreamingWriterFactory(path, schema, factory,
      new GraftConfBox(conf))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect { case GraftFileMessage(rel) => rel }.toSeq
    if (files.isEmpty) return // an empty epoch commits nothing
    if (TxTable.commitStreamingFiles(spark, path, files,
        txnApp = queryId, epochId = epochId).isEmpty) {
      // replayed epoch: the first attempt's manifest is durable — this
      // attempt's files are orphans; remove them eagerly rather than
      // waiting for vacuum's grace window
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      files.foreach(f => fs.delete(new Path(root, f), false))
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.collect { case GraftFileMessage(rel) => rel }
      .foreach(f => fs.delete(new Path(root, f), false))
  }
}

/** One committed data file, path relative to the table root. */
private[graft] case class GraftFileMessage(relPath: String)
    extends WriterCommitMessage

/** Hadoop `Configuration` is not `Serializable`; this box ships the
  * fully-prepared job conf (parquet codec, legacy-format flags, …) to
  * executor-side writers via its own read/write protocol — the
  * standard idiom (Spark carries an equivalent internal box).
  */
private[graft] class GraftConfBox(@transient var conf: Configuration)
    extends Serializable {
  @throws(classOf[IOException])
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  @throws(classOf[IOException])
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** Serialized to executors; creates one parquet writer per
  * (partition, epoch). Files land directly in a per-epoch commit dir
  * (`data/stream_e<epoch>/...`) under their final names — the manifest
  * claim, not a rename, is what publishes them, so no reader can see
  * an unclaimed file through the log.
  */
private[graft] class GraftStreamingWriterFactory(
    root: String, schema: StructType, writerFactory: Serializable,
    box: GraftConfBox) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val rel = f"data/stream_e$epochId%d/part-$partitionId%05d" +
      s"-${java.util.UUID.randomUUID().toString.take(8)}.snappy.parquet"
    new GraftStreamingDataWriter(root, rel, schema, writerFactory,
      box.conf, partitionId, taskId)
  }
}

private[graft] class GraftStreamingDataWriter(
    root: String, rel: String, schema: StructType,
    writerFactory: Serializable, conf: Configuration,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val abs = new Path(root, rel)
  private val (writeRow, closeWriter) = GraftShim.openParquetWriter(
    writerFactory, abs.toString, schema, conf, partitionId, taskId)

  override def write(record: InternalRow): Unit = writeRow(record)

  override def commit(): WriterCommitMessage = {
    closeWriter()
    GraftFileMessage(rel)
  }

  override def abort(): Unit = {
    try closeWriter() catch { case _: Throwable => () }
    val fs = abs.getFileSystem(conf)
    fs.delete(abs, false)
    ()
  }

  override def close(): Unit = ()
}
