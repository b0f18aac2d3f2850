package graft.streaming

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructType}

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
  * Writing into a HIVE-PARTITIONED layout works too (a table created
  * or loaded with partition columns): each task routes rows to
  * per-partition-value writers, directory names encoded exactly as
  * Spark's own dynamic-partition write (`Cast(col, STRING)` in the
  * session zone, hive path-escaping, `__HIVE_DEFAULT_PARTITION__` for
  * null), so streamed and batch-written partitions are
  * indistinguishable. Distinct-partitions-per-task is capped — route
  * skewed streams through a `repartition(partitionCols)` upstream.
  *
  * Append-only, like the file sinks: Complete/Update modes are refused
  * at build time. Downstream consumers read the table incrementally
  * ([[TxTable.readAppended]] / `readStream.format("graft")`), making
  * table-to-table streaming pipelines end-to-end incremental with no
  * history rescans — the shape that holds at 100 TB.
  */
class GraftStreamingWrite(path: String, schema: StructType,
                          queryId: String,
                          partitionCols: Seq[String] = Nil)
    extends StreamingWrite {

  TxTable.requireTokenSafe(queryId, "stream query id")
  private val missing = partitionCols.filterNot(schema.fieldNames.contains)
  require(missing.isEmpty,
    s"partition columns ${missing.mkString(",")} not in the stream " +
      s"schema ${schema.simpleString}")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val dataSchema =
      StructType(schema.filterNot(f => partitionCols.contains(f.name)))
    val (factory, conf) = GraftShim.parquetWriteKit(spark, dataSchema)
    new GraftStreamingWriterFactory(path, schema, partitionCols,
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID),
      factory, new GraftConfBox(conf))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files =
      messages.collect { case GraftFilesMessage(rels) => rels }.flatten.toSeq
    if (files.isEmpty) return // an empty epoch commits nothing
    if (TxTable.commitStreamingFiles(spark, path, files,
        txnApp = queryId, epochId = epochId,
        partitionCols = partitionCols).isEmpty) {
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
    messages.collect { case GraftFilesMessage(rels) => rels }.flatten
      .foreach(f => fs.delete(new Path(root, f), false))
  }
}

/** The data files one task committed, paths relative to the table
  * root (several when the task wrote multiple hive partitions).
  */
private[graft] case class GraftFilesMessage(relPaths: Seq[String])
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

/** Serialized to executors; creates one writer per (partition, epoch).
  * Files land directly in a per-epoch commit dir
  * (`data/stream_e<epoch>[/k=v...]/...`) under their final names — the
  * manifest claim, not a rename, is what publishes them, so no reader
  * can see an unclaimed file through the log.
  */
private[graft] class GraftStreamingWriterFactory(
    root: String, schema: StructType, partitionCols: Seq[String],
    timeZoneId: String, writerFactory: Serializable, box: GraftConfBox)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamingDataWriter(root, s"data/stream_e$epochId", schema,
      partitionCols, timeZoneId, writerFactory, box.conf, partitionId,
      taskId)
}

private[graft] class GraftStreamingDataWriter(
    root: String, epochDir: String, schema: StructType,
    partitionCols: Seq[String], timeZoneId: String,
    writerFactory: Serializable, conf: Configuration,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val maxOpenWriters = 256

  private val partIdx = partitionCols.map(schema.fieldIndex)
  private val dataIdx =
    schema.fieldNames.indices.filterNot(partIdx.contains)
  private val dataSchema = StructType(dataIdx.map(schema.fields(_)))

  // Spark-identical partition-value rendering: Cast(col, STRING) in
  // the session zone — dates/timestamps/decimals encode exactly as a
  // batch dynamic-partition write would name the directories
  private val partToString = UnsafeProjection.create(partIdx.map(i =>
    Cast(BoundReference(i, schema(i).dataType, schema(i).nullable),
      StringType, Option(timeZoneId))).toIndexedSeq)
  private val dataProj = UnsafeProjection.create(dataIdx.map(i =>
    BoundReference(i, schema(i).dataType, schema(i).nullable)).toIndexedSeq)

  // rel path of the open file per partition dir ("" when unpartitioned)
  private val open =
    mutable.LinkedHashMap.empty[String, (InternalRow => Unit, () => Unit, String)]

  private def fileName(): String =
    f"part-$partitionId%05d-" +
      s"${java.util.UUID.randomUUID().toString.take(8)}.snappy.parquet"

  private def writerFor(dir: String) = open.getOrElseUpdate(dir, {
    require(open.size < maxOpenWriters,
      s"task opened $maxOpenWriters partition writers in one epoch — " +
        "repartition the stream by the partition columns upstream")
    val rel = (if (dir.isEmpty) epochDir else s"$epochDir/$dir") +
      "/" + fileName()
    val (w, c) = GraftShim.openParquetWriter(writerFactory,
      new Path(root, rel).toString, dataSchema, conf, partitionId, taskId)
    (w, c, rel)
  })

  private def dirOf(row: InternalRow): String =
    if (partitionCols.isEmpty) ""
    else {
      val strs = partToString(row)
      partitionCols.indices.map { i =>
        val v = if (strs.isNullAt(i)) null else strs.getUTF8String(i).toString
        ExternalCatalogUtils.getPartitionPathString(partitionCols(i),
          if (v == null) null else v)
      }.mkString("/")
    }

  override def write(record: InternalRow): Unit = {
    val (w, _, _) = writerFor(dirOf(record))
    w(if (partitionCols.isEmpty) record else dataProj(record))
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2())
    GraftFilesMessage(open.values.map(_._3).toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (_, close, rel) =>
      try close() catch { case _: Throwable => () }
      val p = new Path(root, rel)
      p.getFileSystem(conf).delete(p, false)
    }
    ()
  }

  override def close(): Unit = ()
}
