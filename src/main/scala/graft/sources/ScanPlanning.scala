package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Partition-aware V2 planning over explicit TxTable file lists — the
  * streaming counterpart of the batch reader's `TxTable.scanFiles`
  * (TxTable.scala:827) contract:
  *
  *  - `basePath` = the table root, so hive `key=value` segments under
  *    each commit dir surface as partition COLUMNS (a bare leaf-file
  *    scan would instead look the partition columns up in the parquet
  *    footers, where a partitioned writer never stored them → nulls);
  *  - one scan PER COMMIT DIR, because partition discovery requires
  *    every file in a scan to resolve a consistent base and snapshots
  *    mix immutable commit dirs;
  *  - the file source surfaces partition columns LAST regardless of
  *    the declared order, so each planned partition carries the
  *    permutation back to the DECLARED order and the reader reprojects.
  *
  * The reader factory travels WITH each partition (not rebuilt from an
  * empty file list): the factory's data/partition schema split is
  * decided at planning time per commit dir, and a factory built from a
  * different file list can disagree with the partitions it is handed.
  */
private[sources] object ScanPlanning {

  /** A planned delegate partition bundled with the factory that
    * understands its schema split and the projection back to the
    * declared column order (`perm(i)` = delegate ordinal of declared
    * field `i`; identity when no reorder is needed).
    */
  final case class PlannedPart(delegate: InputPartition,
                               factory: PartitionReaderFactory,
                               perm: Array[Int],
                               types: Array[DataType],
                               reorder: Boolean)

  private def withBase(options: CaseInsensitiveStringMap,
                       base: String): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      (options.asCaseSensitiveMap().asScala.toMap +
        ("basePath" -> base)).asJava)

  /** Group absolute file paths by commit dir — the first two segments
    * of the table-root-relative path (`data/<uuid>`), mirroring the
    * batch scanFiles grouping.
    */
  private def byCommitDir(root: String, files: Seq[String]): Seq[Seq[String]] = {
    val prefix = if (root.endsWith("/")) root else root + "/"
    files.groupBy { f =>
      val rel = if (f.startsWith(prefix)) f.substring(prefix.length) else f
      rel.split('/').take(2).mkString("/")
    }.toSeq.sortBy(_._1).map(_._2)
  }

  /** Plan `files` (absolute paths under `root`) as partition-aware V2
    * parquet scans emitting `target`'s columns in `target`'s order.
    * `partitioned = false` skips basePath/grouping — for file sets that
    * carry every column physically (change-data files).
    */
  def plan(spark: SparkSession, root: String, files: Seq[String],
           target: StructType, options: CaseInsensitiveStringMap,
           partitioned: Boolean): Seq[PlannedPart] = {
    if (files.isEmpty) return Nil
    val groups = if (partitioned) byCommitDir(root, files) else Seq(files)
    val opts = if (partitioned) withBase(options, root) else options
    groups.flatMap { group =>
      val scan = ParquetTable(s"graft:$root", spark, opts, group,
        Some(target), classOf[ParquetFileFormat])
        .newScanBuilder(opts).build()
      val batch = scan.toBatch
      val factory = batch.createReaderFactory()
      val out = scan.readSchema()
      val perm = target.fields.map(f => out.fieldIndex(f.name))
      val types = target.fields.map(_.dataType)
      val reorder = out.fieldNames.toSeq != target.fieldNames.toSeq
      batch.planInputPartitions().toSeq
        .map(PlannedPart(_, factory, perm, types, reorder))
    }
  }

  /** Open a planned partition's reader, reprojected to declared order
    * when the delegate emits partition columns last (or extra columns).
    */
  def openReader(p: PlannedPart): PartitionReader[InternalRow] = {
    val inner = p.factory.createReader(p.delegate)
    if (!p.reorder) inner
    else new PartitionReader[InternalRow] {
      private val out = new GenericInternalRow(p.perm.length)
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val src = inner.get()
        var i = 0
        while (i < p.perm.length) {
          out.update(i,
            if (src.isNullAt(p.perm(i))) null
            else src.get(p.perm(i), p.types(i)))
          i += 1
        }
        out
      }
      override def close(): Unit = inner.close()
    }
  }

  /** The planned partition as shipped to executors (delegate + its own
    * factory + projection).
    */
  final case class ReorderPartition(part: PlannedPart) extends InputPartition

  /** Stateless factory for [[ReorderPartition]]s — everything a reader
    * needs travels in the partition itself.
    */
  final class ReorderReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      openReader(p.asInstanceOf[ReorderPartition].part)
  }
}
