package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxTable

/** One resolved TxTable snapshot, ready to scan: the pieces
  * [[GraftTable]] hands to Spark's parquet scan builder, shared by the
  * DataSource V2 provider and the SQL catalog so every surface
  * resolves a version identically.
  */
private[sources] case class GraftResolved(
    name: String,
    fileIndex: PartitioningAwareFileIndex,
    schema: StructType,
    dataSchema: StructType,
    partitionCols: Seq[String])

private[sources] object GraftResolve {

  /** Resolve `path` at `versionAsOf` (or head) to its immutable file
    * list and a partition-aware index. Unpartitioned snapshots delegate
    * wholesale to Spark's own [[ParquetTable]]; partitioned snapshots
    * build an EXPLICIT partition spec from the manifest's `k=v` path
    * segments ([[org.apache.spark.sql.GraftPartitionShim]]) — stock
    * directory inference cannot stitch the multi-commit layout, but
    * the manifest already knows every file's partition. Mixed layouts
    * (some files partitioned, some not) fail loudly.
    */
  def resolve(spark: SparkSession, path: String,
              versionAsOf: Option[Long]): GraftResolved = {
    val versions = TxTable.versions(spark, path)
    require(versions.nonEmpty, s"$path is not a TxTable (no manifests)")
    val v = versionAsOf.getOrElse(versions.last)
    require(versions.contains(v),
      s"version $v of $path does not exist (have ${versions.mkString(",")})")
    val files = TxTable.snapshotFiles(spark, path, v)
    require(files.nonEmpty,
      s"version $v of $path is an empty snapshot — read it via " +
        "TxTable.readVersion with a pinned schema")
    val name = s"graft:$path@$v"

    if (!files.exists(_.split('/').exists(_.contains('=')))) {
      val pt = ParquetTable(name, spark, CaseInsensitiveStringMap.empty(),
        files, userSpecifiedSchema = None, classOf[ParquetFileFormat])
      GraftResolved(name, pt.fileIndex, pt.schema, pt.dataSchema, Nil)
    } else {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootQ = fs.makeQualified(root)
      // snapshotFiles returns absolute paths; the partition segments are
      // the k=v dirs between the commit dir (data/<uuid>) and the file
      def kvSegs(abs: String): Seq[(String, String)] = {
        val rel = fs.makeQualified(new Path(abs)).toString
          .stripPrefix(rootQ.toString).stripPrefix("/")
        rel.split('/').drop(2).dropRight(1).toSeq.map { s =>
          val i = s.indexOf('=')
          require(i > 0, s"mixed layout in $path@$v: non-hive dir segment " +
            s"'$s' under a partitioned snapshot (file $rel)")
          (s.substring(0, i), TxTable.unescapePartition(s.substring(i + 1)))
        }
      }
      val perFile = files.map(f => f -> kvSegs(f))
      val colNames = perFile.head._2.map(_._1)
      require(perFile.forall(_._2.map(_._1) == colNames),
        s"inconsistent partition columns across $path@$v's files")
      val absFiles = files.map(f => fs.makeQualified(new Path(f)))
      val dirs = perFile
        .map { case (f, kvs) =>
          (fs.makeQualified(new Path(f)).getParent, kvs.map(_._2))
        }
        .groupBy(_._1.toString).map(_._2.head).toSeq.sortBy(_._1.toString)
      val (idx, partSchema) = org.apache.spark.sql.GraftPartitionShim
        .snapshotIndex(spark, absFiles, dirs, colNames)
      // data schema from one footer (partition values live in dir names,
      // never in the files) — same single-footer resolution as the
      // unpartitioned path
      val dataSchema = spark.read.parquet(files.head).schema
      GraftResolved(name, idx,
        StructType(dataSchema.fields ++ partSchema.fields), dataSchema,
        colNames)
    }
  }
}
