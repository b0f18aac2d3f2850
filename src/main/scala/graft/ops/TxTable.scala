package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Minimal transaction-log table format over parquet — the core idea of
  * Delta/Iceberg reduced to its essentials (the offline image carries no
  * Delta jars, so the log is implemented directly).
  *
  * Every commit is an immutable, versioned MANIFEST listing the data
  * files that make up that snapshot; readers resolve the newest manifest
  * and scan exactly those files. Data files are write-once — a commit
  * never mutates or deletes files an earlier version references — so a
  * reader that resolved version N keeps a consistent snapshot while a
  * writer commits N+1. This closes the [[Sinks.swapInto]] window where a
  * reader racing a directory swap can see a missing or half-renamed
  * table (the reference's copy-then-delete publish has the same window,
  * `aws-job-landing-to-bronze/aws-job-landing-to-bronze.py:85-106`).
  *
  * Layout:
  * {{{
  *   <table>/data/<uuid>/part-*.parquet   one immutable dir per commit
  *   <table>/_txlog/v00000000001.manifest newline-separated, first line
  *                                        is the action, then one
  *                                        relative file path per line
  * }}}
  *
  * Commit protocol: (1) write the new data files, (2) write the full
  * manifest to a tmp name, (3) rename it into the next free version
  * slot. The rename is the commit point — atomic on local FS and HDFS.
  * Concurrency is optimistic: if the slot was taken while writing, the
  * commit retries against the NEW head (append re-reads the head's file
  * list, so no appended files are lost; concurrent overwrites are
  * last-committer-wins). On stores without atomic rename (S3 proper) a
  * real deployment swaps step 3 for a conditional PUT.
  *
  * At 100 TB the manifest stays small (file paths, not data) and the
  * driver-side log I/O is O(files per snapshot) — the same order as the
  * file listing a plain parquet read already does, but consistent.
  */
object TxTable {

  private val LogDir = "_txlog"
  private def manifestName(v: Long) = f"v$v%011d.manifest"
  private val ManifestRe = "v(\\d{11})\\.manifest".r

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, p) = fsFor(spark, path)
    val log = new Path(p, LogDir)
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  private def readManifest(fs: FileSystem, p: Path, v: Long): (String, Seq[String]) = {
    val in = fs.open(new Path(new Path(p, LogDir), manifestName(v)))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
               finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    (lines.head, lines.tail)
  }

  /** Snapshot read of the newest committed version. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    readVersion(spark, path, vs.last)
  }

  /** Time travel: snapshot read of an exact committed version. */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    val (fs, p) = fsFor(spark, path)
    val (_, files) = readManifest(fs, p, v)
    if (files.isEmpty)
      // an empty snapshot still needs a schema: scan the data dir of the
      // commit that wrote the (empty) version — its parquet footer is
      // there even with zero rows... there is none, so fail loudly
      sys.error(s"version $v of $path is an empty snapshot with no files")
    else spark.read.parquet(files.map(f => new Path(p, f).toString): _*)
  }

  /** Overwrite-commit `df` as the next version (the whole snapshot
    * becomes exactly this write's files).
    */
  def overwrite(spark: SparkSession, path: String, df: DataFrame): Long =
    commit(spark, path, df, append = false)

  /** Append-commit `df`: next version = head's files + this write's. */
  def append(spark: SparkSession, path: String, df: DataFrame): Long =
    commit(spark, path, df, append = true)

  private def commit(spark: SparkSession, path: String, df: DataFrame,
                     append: Boolean): Long = {
    val (fs, p) = fsFor(spark, path)
    val dataDir = s"data/${java.util.UUID.randomUUID()}"
    df.write.parquet(new Path(p, dataDir).toString)
    val newFiles = fs.listStatus(new Path(p, dataDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
      .map(n => s"$dataDir/$n")
    fs.mkdirs(new Path(p, LogDir))

    var committed = -1L
    while (committed < 0) {
      val head = versions(spark, path).lastOption
      val base = if (append) head.map(v => readManifest(fs, p, v)._2)
                             .getOrElse(Seq.empty)
                 else Seq.empty
      val next = head.getOrElse(0L) + 1
      val action = if (append) "append" else "overwrite"
      val body = (action +: (base ++ newFiles)).mkString("", "\n", "\n")
      val tmp = new Path(new Path(p, LogDir),
        s".tmp_${java.util.UUID.randomUUID()}.manifest")
      val out = fs.create(tmp, false)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val slot = new Path(new Path(p, LogDir), manifestName(next))
      // the rename IS the commit point; a concurrent writer that claimed
      // the slot first makes this rename land as slot/tmpname or fail —
      // verify by re-listing, retry on loss
      if (!fs.exists(slot) && fs.rename(tmp, slot)) committed = next
      else fs.delete(tmp, false)
    }
    committed
  }

  /** Drop all but the newest `keepVersions` manifests and delete every
    * data file none of the kept snapshots references. Callers must
    * ensure no reader is pinned to a dropped version (same contract as
    * Delta's VACUUM retention).
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must keep at least the head version")
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    if (vs.size <= keepVersions) return
    val (drop, keep) = vs.splitAt(vs.size - keepVersions)
    val live = keep.flatMap(v => readManifest(fs, p, v)._2).toSet
    val dataRoot = new Path(p, "data")
    // delete whole commit dirs whose files are all dead (files of one
    // commit are only ever referenced together)
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { d =>
      val rel = s"data/${d.getPath.getName}"
      val anyLive = live.exists(_.startsWith(rel + "/"))
      if (!anyLive) fs.delete(d.getPath, true)
    }
    drop.foreach(v =>
      fs.delete(new Path(new Path(p, LogDir), manifestName(v)), false))
  }
}
