package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet sinks (SURVEY §2.1 S3/S4).
  *
  * The reference materializes every output table as exactly ONE parquet
  * file with a deterministic name: coalesce(1) → write to a tmp UUID dir →
  * boto3 copy to `<layer>/<name>/<name>.parquet` → delete tmp
  * (`aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:85-106` and 4
  * near-identical clones). We implement the same observable contract once,
  * with the Hadoop FileSystem API (uniform over local FS, HDFS, S3A).
  *
  * Scale note: coalesce(1) is the *contract* of this sink (single-file
  * table), not a general pattern — it collapses the final stage to one
  * task, so it is applied only at the write boundary, after all wide
  * transforms have run at full parallelism. For genuinely large outputs
  * use [[writePartitioned]] instead.
  */
object Sinks {

  /** Write `df` as `<layerDir>/<name>/<name>.parquet` (one file). */
  def writeSingleFile(df: DataFrame, layerDir: String, name: String): Path = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // Unique tmp dir per invocation (the reference used a uuid4 —
    // L2B:86): concurrent writes of the same table must not race.
    val nonce = java.util.UUID.randomUUID().toString
    val tmp = new Path(layerDir, s"tmp_output_${name}_$nonce")
    val destDir = new Path(layerDir, name)
    val dest = new Path(destDir, s"$name.parquet")
    val fs = FileSystem.get(tmp.toUri, conf)

    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    val part = Option(fs.globStatus(new Path(tmp, "part-*.parquet")))
      .getOrElse(Array.empty) match {
      case Array(one) => one.getPath
      case parts => sys.error(s"expected 1 part file in $tmp, got ${parts.length}")
    }
    fs.mkdirs(destDir)
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(part, dest)) sys.error(s"rename $part -> $dest failed")
    fs.delete(tmp, true)
    // ChecksumFileSystem (local FS) renames the .crc sidecar along with the
    // part file; the contract is ONE file, so drop it (HDFS/S3A have none).
    val crc = new Path(destDir, s".${dest.getName}.crc")
    if (fs.exists(crc)) fs.delete(crc, false)
    dest
  }

  /** The scale path: plain multi-file parquet, optionally hive-layout
    * partitioned via partitionBy columns. Keeps full write parallelism.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Key-based upsert (merge) into a parquet table: rows in `updates`
    * replace existing rows with the same key; new keys append. Plain
    * parquet has no transaction log, so this is the classic
    * read–merge–rewrite: one left_anti join (existing rows not being
    * replaced) + union, written to a tmp dir and swapped in — a reader
    * sees the old or the new table, never a mix. At 100 TB you bound
    * the rewrite by partitioning the table on a key prefix and merging
    * only affected partitions; the merge itself is this same plan.
    */
  def upsert(spark: org.apache.spark.sql.SparkSession, path: String,
             updates: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val merged =
      if (!fs.exists(p)) updates
      else {
        val existing = spark.read.parquet(path)
        existing.join(updates.select(keyCols.map(
          org.apache.spark.sql.functions.col): _*), keyCols, "left_anti")
          .unionByName(updates)
      }
    val tmp = new Path(p.getParent,
      s".upsert_${p.getName}_${java.util.UUID.randomUUID()}")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(p)) {
      val old = new Path(p.getParent, s"${tmp.getName}_old")
      if (!fs.rename(p, old)) sys.error(s"upsert: rename $p -> $old failed")
      if (!fs.rename(tmp, p)) sys.error(s"upsert: rename $tmp -> $p failed")
      fs.delete(old, true)
    } else if (!fs.rename(tmp, p)) sys.error(s"upsert: rename $tmp -> $p failed")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (measured from the CURRENT compressed
    * footprint, so the estimate already reflects encoding+compression).
    * The lake-maintenance chore every long-lived 100 TB table needs —
    * streaming ingests and per-partition writers accrete thousands of
    * small files whose open/footer costs dominate scans. Returns the
    * file count written. Writes via tmp dir + atomic-enough swap so a
    * concurrent reader never sees a half-compacted table.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(p.getParent,
      s".compact_${p.getName}_${java.util.UUID.randomUUID()}")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new Path(p.getParent, s"${tmp.getName}_old")
    if (!fs.rename(p, old)) sys.error(s"compact: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) sys.error(s"compact: rename $tmp -> $p failed")
    fs.delete(old, true)
    Option(fs.globStatus(new Path(p, "part-*.parquet")))
      .map(_.length).getOrElse(0)
  }

  /** Bucketed catalog table: rows hash-partitioned into `numBuckets` by
    * `bucketCols` at write time, sorted within buckets. Joins and
    * aggregations between tables bucketed the same way need NO shuffle —
    * at 100 TB, pre-bucketing the big fact tables on their join key
    * turns every downstream equi-join into a zip of co-located buckets
    * (verify: the join plan has no Exchange under either side).
    * Requires a catalog (`saveAsTable`) — bucket metadata lives there.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
