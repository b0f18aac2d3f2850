package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, coalesce, col, collect_set, count, explode, expr, from_json, input_file_name, lit, not, pmod, sequence, struct, sum, to_json, when, xxhash64}
import org.apache.spark.sql.types.StructType

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
  * manifest (head line carries the action AND a per-commit nonce) to a
  * tmp name, (3) atomically claim the next free version slot. The claim
  * is the commit point. On local FS the claim is a hard link
  * (`Files.createLink` — O_EXCL semantics: exactly one concurrent
  * committer can create the slot name, losers get
  * FileAlreadyExistsException). On HDFS it is `rename` (atomic, fails
  * when the destination exists) followed by a nonce read-back as
  * defense in depth against filesystems whose rename clobbers.
  * Concurrency is optimistic: a lost claim retries against the NEW head
  * (append re-reads the head's file list, so no appended files are
  * lost; concurrent overwrites are last-committer-wins). On stores with
  * neither primitive (S3 proper) a real deployment swaps step 3 for a
  * conditional PUT.
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

  /** True iff `path` holds at least one committed version. */
  def exists(spark: SparkSession, path: String): Boolean =
    versions(spark, path).nonEmpty

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

  /** Head line is `<action> [key=value ...] <nonce>`; nonce identifies
    * the winning committer (pre-nonce manifests with a bare action still
    * parse). The optional `key=value` tokens carry commit metadata —
    * notably the idempotence token streaming writes use (see
    * [[commitMeta]]).
    */
  private def readManifest(fs: FileSystem, p: Path, v: Long): (String, Seq[String]) = {
    val in = fs.open(new Path(new Path(p, LogDir), manifestName(v)))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
               finally in.close()
    val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    (lines.head, lines.tail)
  }

  /** Metadata tokens of version `v`'s commit: the `key=value` pairs its
    * writer embedded in the manifest head line (empty for commits written
    * without metadata). Used by
    * [[graft.streaming.StreamingSink]] to make `foreachBatch` appends
    * idempotent — the committed (txnApp, txnVersion) pair lives in the
    * same atomic unit as the file list, so a replayed micro-batch is
    * detected no matter where the previous attempt crashed.
    */
  def commitMeta(spark: SparkSession, path: String, v: Long): Map[String, String] = {
    val (fs, p) = fsFor(spark, path)
    parseMeta(readManifest(fs, p, v)._1)
  }

  /** Epoch-millis commit time of version `v`: the `ts` token its
    * committer stamped into the head line. Manifests written before
    * timestamps existed fall back to the manifest FILE's modification
    * time — the same degraded resolution Delta applies to its log.
    */
  def commitTimestamp(spark: SparkSession, path: String, v: Long): Long = {
    val (fs, p) = fsFor(spark, path)
    commitTimestampOf(fs, p, v, parseMeta(readManifest(fs, p, v)._1))
  }

  /** [[commitTimestamp]] over ALREADY-PARSED meta — for loops that
    * hold the manifest in hand (e.g. [[readChanges]]), so stamping a
    * version doesn't re-read and re-parse the manifest it just read.
    */
  private def commitTimestampOf(fs: FileSystem, p: Path, v: Long,
                                meta: Map[String, String]): Long =
    meta.get(TimestampMetaKey)
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(fs.getFileStatus(
        new Path(new Path(p, LogDir), manifestName(v))).getModificationTime)

  /** `TIMESTAMP AS OF` resolution: the newest retained version whose
    * commit time is <= `tsMillis`. Errors when the timestamp predates
    * the earliest retained commit (same contract as Delta — silently
    * resolving to the oldest version would hide vacuumed history).
    * Scans commit times newest-first, so the common "recent timestamp"
    * probe reads O(1) manifests, not O(history).
    */
  def versionAsOfTimestamp(spark: SparkSession, path: String,
                           tsMillis: Long): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    vs.reverseIterator
      .find(v => commitTimestamp(spark, path, v) <= tsMillis)
      .getOrElse(sys.error(
        s"timestamp $tsMillis predates the earliest retained commit of " +
        s"$path (v${vs.head} at ${commitTimestamp(spark, path, vs.head)})"))
  }

  /** The DECLARED logical schema carried in version `v`'s manifest
    * (head when `v < 0`) — present once [[create]] or [[evolveSchema]]
    * has run; None for tables whose schema lives only in footers.
    */
  def declaredSchema(spark: SparkSession, path: String,
                     v: Long = -1L): Option[StructType] = {
    val (fs, p) = fsFor(spark, path)
    val at = if (v < 0) versions(spark, path).lastOption else Some(v)
    at.flatMap(declaredSchemaAt(fs, p, _))
  }

  /** The partition columns version `v`'s manifest declares (head when
    * `v < 0`): `Some(Nil)` = declared flat, `None` = no declaration
    * (pre-declaration table — resolve the layout from file paths).
    */
  def declaredPartitionCols(spark: SparkSession, path: String,
                            v: Long = -1L): Option[Seq[String]] = {
    val (fs, p) = fsFor(spark, path)
    val at = if (v < 0) versions(spark, path).lastOption else Some(v)
    at.flatMap(declaredPartitionColsAt(fs, p, _))
  }

  private def declaredSchemaAt(fs: FileSystem, p: Path,
                               v: Long): Option[StructType] =
    parseMeta(readManifest(fs, p, v)._1).get(SchemaMetaKey).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(dec(j))
        .asInstanceOf[StructType])

  private def declaredPartitionColsAt(fs: FileSystem, p: Path,
                                      v: Long): Option[Seq[String]] =
    parseMeta(readManifest(fs, p, v)._1).get(PartitionsMetaKey)
      .map(s => dec(s).split(',').toSeq.filter(_.nonEmpty))

  /** The layout a REWRITE must preserve: the caller's explicit columns,
    * else whatever the head manifest declares — so SQL DML and
    * maintenance statements on a partitioned table keep its layout
    * without being told the columns (a flat rewrite of a hive layout
    * would break directory pruning and replacePartitions semantics).
    */
  private def layoutOrDeclared(fs: FileSystem, p: Path, v: Long,
                               partitionCols: Seq[String]): Seq[String] =
    if (partitionCols.nonEmpty) partitionCols
    else declaredPartitionColsAt(fs, p, v).getOrElse(Nil)

  /** Create an EMPTY table as a metadata-only commit carrying the
    * declared schema (and partition columns): no data file is written —
    * the manifest owns the metadata, so `CREATE TABLE (cols)` followed
    * by INSERT needs no zero-row placeholder file, and an empty
    * PARTITIONED table (hive layouts produce no files for zero rows)
    * is representable at all.
    */
  def create(spark: SparkSession, path: String, schema: StructType,
             partitionCols: Seq[String] = Nil): Long = {
    require(!exists(spark, path), s"graft table $path already exists")
    val missing = partitionCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"partition columns ${missing.mkString(",")} not in schema " +
        schema.simpleString)
    // firstCommitOnly: the require above is check-then-act — of two
    // concurrent creators, the loser's claim-loop retry would land its
    // "create" as v2, silently replacing the winner's declared schema.
    // Restricting the claim to slot v1 makes the loser fail as
    // "already exists", which is what the catalog/SQL surfaces promise.
    commitLines(spark, path, "create", Seq.empty, (base, _) => base,
      Map(SchemaMetaKey -> enc(schema.json),
        PartitionsMetaKey -> enc(partitionCols.mkString(","))),
      firstCommitOnly = true)
  }

  /** Widen the table's declared schema as a metadata-only commit —
    * `ALTER TABLE ADD COLUMNS`, manifest-owned (Delta's `metaData`
    * action): no data file is touched; readers of the head (and every
    * later version, via carried meta) see the new schema, with files
    * written before the evolution surfacing the added columns as null.
    * Strictly widening by construction: every current column must keep
    * its type, every added column must be nullable — renames, drops,
    * and retypes would need data rewrite or column mapping and are
    * refused loudly.
    */
  def evolveSchema(spark: SparkSession, path: String,
                   newSchema: StructType): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val current = declaredSchema(spark, path).getOrElse(
      read(spark, path, mergeSchema = true).schema)
    val byName = newSchema.fields.map(f => f.name -> f).toMap
    current.fields.foreach { f =>
      val n = byName.getOrElse(f.name, sys.error(
        s"schema evolution cannot DROP column ${f.name} of $path — " +
        "rewrite via overwrite instead"))
      require(n.dataType == f.dataType,
        s"schema evolution cannot retype ${f.name} of $path: " +
        s"${f.dataType.simpleString} -> ${n.dataType.simpleString}")
      // nullability may only WIDEN: declaring a currently-nullable
      // column non-null would pin a false non-null contract on files
      // that already hold nulls (Catalyst would fold IsNotNull filters
      // against it — wrong results, not just a failed write)
      require(n.nullable || !f.nullable,
        s"schema evolution cannot narrow ${f.name} of $path to " +
        "non-nullable (existing files may hold nulls)")
    }
    val currentNames = current.fieldNames.toSet
    newSchema.fields.filterNot(f => currentNames.contains(f.name)).foreach(
      f => require(f.nullable,
        s"added column ${f.name} must be nullable (existing rows have " +
        "no value for it)"))
    commitLines(spark, path, "evolve", Seq.empty, (base, _) => base,
      Map(SchemaMetaKey -> enc(newSchema.json)))
  }

  /** Rename a data column — the honest no-column-mapping semantics:
    * one copy-on-write overwrite commit carrying the rewritten files
    * and the renamed declared schema, atomic under the same slot
    * claim as any commit. (Delta without column mapping requires the
    * same rewrite; a metadata-only rename would need logical→physical
    * name indirection through every read, stats, and DML path — cost
    * moved, not removed.) The commit declares `cdf=0`: no ROW changed,
    * exactly like a compaction. Time travel still reads old versions
    * under the old name (each version pins its own declared schema).
    *
    * Refuses: partition columns (that rewrite is a relayout — do it
    * explicitly), a `to` that already exists, and a rename out from
    * under a CHECK constraint that references the column (drop it
    * first — silently rewriting constraint SQL is how wrong data gets
    * committed). A bloom config naming the column is renamed FIRST as
    * its own metadata commit — crash-safe, since a config naming a
    * column no file carries is simply inert.
    */
  /** Does a CHECK expression reference `colName`, bare or
    * backtick-quoted? NO backtick in the lookarounds: a quoted
    * reference (`` `bal` > 0 ``) must be caught too, else a
    * rename/drop strands the constraint over a nonexistent column and
    * wedges every later data commit. Word chars alone still keep
    * 'bal' from matching inside 'balance' (bare or quoted). Shared by
    * [[renameColumn]] and [[dropColumn]] so their refusal semantics
    * can never drift.
    */
  private def constraintReferences(expr: String, colName: String): Boolean =
    ("""(?i)(?<![A-Za-z0-9_])""" +
      java.util.regex.Pattern.quote(colName) +
      """(?![A-Za-z0-9_])""").r.findFirstIn(expr).nonEmpty

  def renameColumn(spark: SparkSession, path: String,
                   from: String, to: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    require(from != to, "rename to the same name is a no-op — refusing")
    val schema0 = declaredSchema(spark, path).getOrElse(
      read(spark, path, mergeSchema = true).schema)
    require(schema0.fieldNames.contains(from),
      s"no column '$from' in $path (has ${schema0.fieldNames.mkString(", ")})")
    require(!schema0.fieldNames.contains(to),
      s"column '$to' already exists in $path")
    val parts = declaredPartitionCols(spark, path).getOrElse(Nil)
    require(!parts.contains(from),
      s"'$from' is a partition column — renaming it relayouts every " +
        "file path; do that as an explicit overwrite")
    constraints(spark, path).foreach { case (n, e) =>
      require(!constraintReferences(e, from),
        s"CHECK constraint $n references '$from' — drop it before renaming")
    }
    bloomConfigOf(commitMeta(spark, path, vs.last))
      .filter(_._1.contains(from)).foreach { case (cols, bits, k) =>
        commitLines(spark, path, "setbloom", Seq.empty, (base, _) => base,
          Map(BloomMetaKey -> enc(
            s"${cols.map(c => if (c == from) to else c).mkString(",")}:$bits:$k")))
      }
    // same crash-safe pre-rename for a clustering declaration
    val cl = clusteringColumns(spark, path)
    if (cl.contains(from))
      commitLines(spark, path, "cluster", Seq.empty, (base, _) => base,
        Map(ClusterMetaKey -> enc(
          cl.map(c => if (c == from) to else c).mkString(","))))
    // HEAD-PINNED rewrite (the addConstraint pattern): the snapshot is
    // read at an explicit version AFTER the config pre-commits, and the
    // final commit requires the head still BE that version at claim
    // time. Without the pin, a concurrent append landing between the
    // snapshot read and the claim would be silently dropped — the
    // rewrite's baseKeep discards every base line, and the claim-loop
    // retry rebuilds from the stale snapshot. Schema facts are
    // re-derived at the pinned version for the same reason (a
    // concurrent evolve/rename would otherwise be erased).
    val v0 = versions(spark, path).last
    val snapshot = readVersion(spark, path, v0, mergeSchema = true)
    val schema = declaredSchema(spark, path, v0).getOrElse(snapshot.schema)
    require(schema.fieldNames.contains(from) &&
        !schema.fieldNames.contains(to),
      s"schema of $path changed concurrently — retry the rename")
    // the LAYOUT must be re-derived at the pin too: a concurrent
    // layout-changing commit landing before v0 would otherwise have
    // its declaration silently overwritten by the stale early read
    // (flattening a hive layout — directory pruning and
    // replacePartitions break) and could slip `from` past the
    // partition-column refusal above
    val (fs0, p0) = fsFor(spark, path)
    val parts0 = declaredPartitionColsAt(fs0, p0, v0).getOrElse(Nil)
    require(!parts0.contains(from),
      s"'$from' became a partition column concurrently — retry")
    val newSchema = StructType(schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    commit(spark, path, snapshot.withColumnRenamed(from, to), "rename",
      (_, _) => Seq.empty, parts0,
      meta = Map(SchemaMetaKey -> enc(newSchema.json),
        ChangeDataMetaKey -> "0"),
      requireHeadVersion = Some(v0))
  }

  /** Drop a data column — [[renameColumn]]'s sibling with the same
    * honest no-column-mapping semantics: one copy-on-write overwrite
    * commit carrying the rewritten files and the narrowed declared
    * schema, atomic under the same slot claim, `cdf=0` (no ROW
    * changed). Time travel still reads old versions WITH the column
    * (each version pins its own declared schema), so the drop is not
    * an erasure — an overwrite + [[vacuum]] is the data-destruction
    * path.
    *
    * Refuses: partition columns (relayout — do it as an explicit
    * overwrite), the last remaining column, and a drop out from under
    * a CHECK constraint referencing the column bare or backtick-quoted
    * (the [[renameColumn]] guard). A bloom config naming the column
    * loses it FIRST as its own metadata commit (an emptied set drops
    * the config); a clustering declaration likewise — both crash-safe:
    * a config over the remaining columns is valid at every
    * intermediate state.
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val schema0 = declaredSchema(spark, path).getOrElse(
      read(spark, path, mergeSchema = true).schema)
    require(schema0.fieldNames.contains(name),
      s"no column '$name' in $path (has ${schema0.fieldNames.mkString(", ")})")
    val parts = declaredPartitionCols(spark, path).getOrElse(Nil)
    require(!parts.contains(name),
      s"'$name' is a partition column — dropping it relayouts every " +
        "file path; do that as an explicit overwrite")
    // at least one NON-partition column must remain: partition values
    // live in the path, so a table of only partition columns has no
    // bytes to write (Spark refuses all-columns-as-partitions with an
    // opaque error deep in the write — refuse here with the real one)
    require(schema0.fields.exists(f =>
        f.name != name && !parts.contains(f.name)),
      s"cannot drop '$name' of $path: it is the last data " +
        "(non-partition) column")
    constraints(spark, path).foreach { case (n, e) =>
      require(!constraintReferences(e, name),
        s"CHECK constraint $n references '$name' — drop it before " +
          "dropping the column")
    }
    bloomConfigOf(commitMeta(spark, path, vs.last))
      .filter(_._1.contains(name)).foreach { case (cols, bits, k) =>
        val rest = cols.filterNot(_ == name)
        commitLines(spark, path, "setbloom", Seq.empty, (base, _) => base,
          Map(BloomMetaKey ->
            (if (rest.isEmpty) "" else enc(s"${rest.mkString(",")}:$bits:$k"))))
      }
    val cl = clusteringColumns(spark, path)
    if (cl.contains(name)) {
      val rest = cl.filterNot(_ == name)
      commitLines(spark, path, "cluster", Seq.empty, (base, _) => base,
        Map(ClusterMetaKey ->
          (if (rest.isEmpty) "" else enc(rest.mkString(",")))))
    }
    // head-pinned rewrite — see [[renameColumn]] for the race this
    // closes (concurrent appends silently erased by the full rewrite)
    val v0 = versions(spark, path).last
    val snapshot = readVersion(spark, path, v0, mergeSchema = true)
    val schema = declaredSchema(spark, path, v0).getOrElse(snapshot.schema)
    require(schema.fieldNames.contains(name),
      s"schema of $path changed concurrently — retry the drop")
    // layout re-derived at the pin — see [[renameColumn]]: a stale
    // early read would overwrite a concurrently declared layout and
    // could slip `name` past the partition-column refusal
    val (fs0, p0) = fsFor(spark, path)
    val parts0 = declaredPartitionColsAt(fs0, p0, v0).getOrElse(Nil)
    require(!parts0.contains(name),
      s"'$name' became a partition column concurrently — retry")
    // the last-data-column invariant re-asserted against the PINNED
    // schema/layout: a concurrent drop landing between the early check
    // and the pin could otherwise make this drop remove the final
    // non-partition column, failing later with the opaque write error
    // this guard exists to pre-empt
    require(schema.fields.exists(f =>
        f.name != name && !parts0.contains(f.name)),
      s"cannot drop '$name' of $path: it is the last data " +
        "(non-partition) column (a concurrent drop landed — retry)")
    val newSchema = StructType(schema.fields.filterNot(_.name == name))
    commit(spark, path, snapshot.drop(name), "dropcol",
      (_, _) => Seq.empty, parts0,
      meta = Map(SchemaMetaKey -> enc(newSchema.json),
        ChangeDataMetaKey -> "0"),
      requireHeadVersion = Some(v0))
  }

  // ------------------------------------------------------ CHECK constraints
  //
  // Table-level CHECK constraints, Delta-style: declared once as
  // carried manifest meta (`graft.constraint.<name>` — the `graft.`
  // prefix makes every later commit carry them forward), enforced on
  // EVERY data commit. SQL semantics: a row violates iff the
  // expression evaluates to FALSE — NULL passes, exactly like SQL
  // CHECK. Enforcement validates the freshly WRITTEN parquet files
  // (the exact bytes the manifest would reference) before the slot
  // claim: one aggregate job over the new files only — O(commit), not
  // O(table) — with predicate evaluation pushed into a columnar scan,
  // and no re-evaluation of a possibly nondeterministic input frame.
  // A violating commit deletes its data dir and throws; nothing is
  // ever visible to readers. Constraints observed are those of the
  // head AT WRITE TIME: a constraint added while a commit is in
  // flight applies to commits that start after it lands.

  private[ops] val ConstraintMetaPrefix = "graft.constraint."

  /** The table's active CHECK constraints, name → SQL expression. */
  def constraints(spark: SparkSession, path: String): Map[String, String] = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    headConstraints(spark, path)
  }

  /** Tolerant form for the commit path: empty for a first commit. */
  private def headConstraints(spark: SparkSession,
                              path: String): Map[String, String] =
    versions(spark, path).lastOption.map(v =>
      effectiveConstraints(commitMeta(spark, path, v))).getOrElse(Map.empty)

  /** The ACTIVE constraint set carried in a head's meta tokens
    * (tombstoned = dropped = absent), decoded name -> expression.
    */
  private def effectiveConstraints(
      metaMap: Map[String, String]): Map[String, String] =
    metaMap.collect {
      case (k, v) if k.startsWith(ConstraintMetaPrefix) && v.nonEmpty =>
        k.stripPrefix(ConstraintMetaPrefix) -> dec(v)
    }

  /** Canonical fingerprint of a constraint set for the claim-loop
    * conflict check — order-independent, collision-free for
    * identifier names.
    */
  private def constraintFingerprint(cons: Map[String, String]): String =
    cons.toSeq.sorted.map { case (k, v) => s"$k=${enc(v)}" }.mkString(";")

  /** Declare a CHECK constraint as a metadata-only commit. EXISTING
    * rows must already satisfy it (one validation scan of the head
    * snapshot — Delta's `ADD CONSTRAINT` contract: a constraint is a
    * promise about the whole table, not just future writes), and the
    * expression must be boolean-typed — both refused loudly.
    */
  def addConstraint(spark: SparkSession, path: String, name: String,
                    checkExpr: String): Long = {
    require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"constraint name must be an identifier, got: $name")
    require(versions(spark, path).nonEmpty,
      s"$path is not a TxTable (no $LogDir manifests)")
    // validate-then-claim, PINNED to the validated head: the claim
    // aborts if any commit landed during validation (its rows would
    // have escaped the scan), and we re-validate against the new head
    // — the two-sided closure of the races the data-commit side's
    // constraint-fingerprint check can't see. Bounded retries: under
    // sustained write pressure adding a constraint loses, loudly.
    var attempt = 0
    while (true) {
      attempt += 1
      val v0 = versions(spark, path).last
      val snapshot = readVersion(spark, path, v0, mergeSchema = true)
      val checked = snapshot.select(expr(checkExpr).as("ok"))
      require(checked.schema.head.dataType ==
        org.apache.spark.sql.types.BooleanType,
        s"CHECK expression must be boolean, got " +
          s"${checked.schema.head.dataType.simpleString}: $checkExpr")
      val bad = checked.where(col("ok") === false).count()
      require(bad == 0L,
        s"cannot add CHECK constraint $name to $path: $bad existing " +
          s"rows violate ($checkExpr)")
      try {
        return commitLines(spark, path, "constraint", Seq.empty,
          (base, _) => base,
          Map(ConstraintMetaPrefix + name -> enc(checkExpr)),
          requireHeadVersion = Some(v0))
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= 5) throw e // sustained racing writes
      }
    }
    -1L // unreachable
  }

  /** Remove a CHECK constraint (metadata-only commit; the carried key
    * is tombstoned empty — carried meta has no deletion, same as a
    * superseded `txn.` token).
    */
  def dropConstraint(spark: SparkSession, path: String,
                     name: String): Long = {
    require(constraints(spark, path).contains(name),
      s"no CHECK constraint named $name on $path")
    commitLines(spark, path, "constraint", Seq.empty, (base, _) => base,
      Map(ConstraintMetaPrefix + name -> ""))
  }

  /** Enforcement: one aggregate over `newFiles` counting violations
    * per active constraint; on any violation delete `cleanupDir` (the
    * uncommitted data dir) and throw. Reads with the declared schema
    * when present so a constraint on an evolved column sees nulls
    * (which PASS) rather than an analysis error.
    */
  private def enforceConstraints(spark: SparkSession, path: String,
                                 fs: FileSystem, p: Path,
                                 newFiles: Seq[String],
                                 cleanupDir: Option[String],
                                 constraints: Map[String, String]): Unit = {
    if (newFiles.isEmpty) return
    val cons = constraints.toSeq.sortBy(_._1)
    if (cons.isEmpty) return
    val pinned = versions(spark, path).lastOption
      .flatMap(v => declaredSchemaAt(fs, p, v))
    val written = scanFiles(spark, p, newFiles, mergeSchema = false, pinned)
    val flags = cons.zipWithIndex.map { case ((_, e), i) =>
      sum(when(expr(e) === false, 1L).otherwise(0L)).as(s"c$i")
    }
    val r = written.agg(flags.head, flags.tail: _*).head()
    val viols = cons.zipWithIndex.collect {
      case ((n, e), i) if !r.isNullAt(i) && r.getLong(i) > 0 =>
        s"$n ($e): ${r.getLong(i)} rows"
    }
    if (viols.nonEmpty) {
      cleanupDir.foreach(d => fs.delete(new Path(p, d), true))
      throw new IllegalStateException(
        s"commit to $path rejected — CHECK constraint violation: " +
          viols.mkString("; "))
    }
  }

  private def parseMeta(headLine: String): Map[String, String] =
    headLine.split(' ').drop(1).dropRight(1)
      .filter(_.contains('=')).map { t =>
        val i = t.indexOf('='); t.substring(0, i) -> t.substring(i + 1)
      }.toMap

  /** (version, action, meta) per retained commit, oldest first — the
    * `DESCRIBE HISTORY` backing. O(manifests) driver metadata I/O,
    * no data files touched.
    */
  def history(spark: SparkSession, path: String)
      : Seq[(Long, String, Map[String, String])] =
    historyDetailed(spark, path).map { case (v, _, a, m) => (v, a, m) }

  /** [[history]] plus the commit timestamp, from the SAME manifest
    * read — DESCRIBE HISTORY over a long log would otherwise pay a
    * second read-and-parse per version just to stamp the row.
    */
  private[graft] def historyDetailed(spark: SparkSession, path: String)
      : Seq[(Long, Long, String, Map[String, String])] = {
    val (fs, p) = fsFor(spark, path)
    versions(spark, path).map { v =>
      val head = readManifest(fs, p, v)._1
      val meta = parseMeta(head)
      (v, commitTimestampOf(fs, p, v, meta), head.split(' ').head, meta)
    }
  }

  /** Meta keys with this prefix are CARRIED FORWARD: every commit copies
    * them from the previous head into its own head line (its own `meta`
    * values winning on conflict). So the head manifest always holds the
    * LATEST value per carried key even after [[vacuum]] prunes the
    * manifest that originally wrote it — the log-compaction equivalent
    * of Delta checkpoints retaining `SetTransaction` actions. Used for
    * the streaming idempotence tokens (`txn.<app>`) — whose loss under
    * vacuum would silently re-append a replayed micro-batch — and for
    * the table's own declared metadata (`graft.schema` /
    * `graft.partitions`), the manifest-owned counterpart of Delta's
    * `metaData` action.
    */
  private val CarriedMetaPrefixes = Seq("txn.", "graft.")

  /** Carried meta key holding the table's DECLARED logical schema as
    * URL-encoded `StructType.json` — set by [[evolveSchema]] and
    * [[create]], carried forward by every later commit. When present
    * it is the read schema (old files surface added columns as null);
    * when absent the schema lives in the parquet footers, as before.
    */
  private[graft] val SchemaMetaKey = "graft.schema"

  /** Carried meta key declaring the snapshot's hive-partition columns
    * (URL-encoded, comma-joined; empty = unpartitioned). Written by
    * every partitioned commit and by overwrites (which own the whole
    * layout), so external resolvers ([[graft.sources.GraftResolve]])
    * can trust the manifest instead of sniffing `k=v` path segments —
    * and so an EMPTY partitioned table is representable at all.
    */
  private[graft] val PartitionsMetaKey = "graft.partitions"

  /** Per-commit (NOT carried) meta token: epoch-millis commit time,
    * stamped automatically by every commit — the `TIMESTAMP AS OF`
    * resolution source.
    */
  private[graft] val TimestampMetaKey = "ts"

  /** Highest micro-batch id `txnApp` has committed to `path`, or None
    * — the reader half of the `txn.<app>` idempotent-writer token
    * ([[graft.streaming.StreamingSink]]'s exactly-once contract,
    * exposed here so index-maintenance writers — [[graft.text.Bm25
    * .appendToIndex]], [[graft.ann.Similarity.ivfAppend]] — share ONE
    * definition with the streaming sink instead of re-deriving the
    * key grammar). One manifest read: `txn.*` keys are carried
    * forward by every commit, so the head manifest holds each app's
    * latest batch id however many commits or vacuums happened since.
    */
  def lastTxnVersion(spark: SparkSession, path: String,
                     txnApp: String): Option[Long] =
    versions(spark, path).lastOption.flatMap(v =>
      commitMeta(spark, path, v).get(CarriedMetaPrefixes.head + txnApp)
        .map(_.toLong))

  /** The (meta, guard) pair an idempotent writer attaches for
    * micro-batch `batchId` of `txnApp` — commit-atomic claim of the
    * batch id plus the claim-loop guard that aborts a zombie writer
    * racing its restarted replacement on the same batch.
    */
  private[graft] def txnClaim(txnApp: String, batchId: Long)
      : (Map[String, String], Map[String, Long]) = {
    requireTokenSafe(txnApp, "txnApp")
    val key = CarriedMetaPrefixes.head + txnApp
    (Map(key -> batchId.toString), Map(key -> batchId))
  }

  /** The WHOLE idempotent-append contract in one place: skip-check the
    * replay token against `path`'s head, then run `doAppend` with the
    * claim's (meta, guard) to attach to its commit. Returns the head
    * version unchanged when the token says the batch already landed
    * (the checkpoint-replay no-op), otherwise `doAppend`'s version.
    * Every incremental maintainer (Bm25.appendToIndex, Similarity
    * ivf/sq/pqAppend, Sketches HLL/KLL grain appends, SemDedup
    * appendToModel) routes through here so the check-then-claim
    * semantics — the skip is an optimization; the GUARD is what makes
    * a zombie-vs-restart race safe — can't drift per call site.
    * `txn = None` degrades to a plain unguarded append.
    */
  private[graft] def withTxn(spark: SparkSession, path: String,
                             txn: Option[(String, Long)])
      (doAppend: (Map[String, String], Map[String, Long]) => Long): Long = {
    txn.foreach { case (app, batchId) =>
      if (lastTxnVersion(spark, path, app).exists(_ >= batchId))
        return versions(spark, path).last
    }
    val (meta, guard) = txn.map { case (app, batchId) =>
      txnClaim(app, batchId)
    }.getOrElse((Map.empty[String, String], Map.empty[String, Long]))
    doAppend(meta, guard)
  }

  /** Refuse a caller-supplied token that would break the manifest
    * meta grammar (space-separated `k=v` pairs, one per line) — THE
    * one definition every writer-facing API (streaming sinks,
    * follower views) must call, so a grammar change can't strand a
    * stale copy of the check at some call site.
    */
  private[graft] def requireTokenSafe(value: String, what: String): Unit =
    require(!value.exists(c => c == ' ' || c == '=' || c == '\n'),
      s"$what must be manifest-token-safe (no spaces, '=', or newlines)")

  /** Per-commit (NOT carried) meta token locating the commit's
    * row-level CHANGE DATA (Delta's Change Data Feed, reduced to the
    * log): `cdf=<uuid>` points at `_changes/<uuid>/` — parquet files
    * holding exactly the rows this commit changed, tagged
    * `_change_type` (insert / update_preimage / update_postimage /
    * delete) — and `cdf=0` declares the commit row-change-free (a
    * layout rewrite: OPTIMIZE/compact, or a DML whose predicate
    * matched nothing). Commits carrying NEITHER (plain appends,
    * overwrites, restores, pre-CDF history) fall back to
    * file-granular capture in [[readChanges]]. The change files ride
    * the same atomic manifest claim as the data (written before,
    * referenced by the winning manifest only), so the feed is
    * exactly-once under the same argument as the data itself.
    */
  private[graft] val ChangeDataMetaKey = "cdf"
  private val ChangesDir = "_changes"
  /** Column names of the change feed (Delta CDF's, minus the
    * per-commit columns Delta derives from its log the same way).
    */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  /** Write `changes` (data columns + [[ChangeTypeCol]]) as this
    * commit's change data; returns the `cdf` meta entry to ride in the
    * manifest head. An empty change frame (possible when file stats
    * over-approximated the DML's match set) records `cdf=0` — readers
    * then skip the commit instead of falling back to file-granular
    * churn. Cost: one extra bounded job over the CHANGED rows only —
    * never the table (the same order of work as the rewrite itself).
    */
  private def writeChangeData(fs: FileSystem, p: Path,
                              changes: DataFrame): Map[String, String] = {
    val uuid = java.util.UUID.randomUUID().toString
    val dir = new Path(p, s"$ChangesDir/$uuid")
    changes.write.parquet(dir.toString)
    val any = fs.listStatus(dir).exists(f =>
      f.getPath.getName.startsWith("part-") &&
        f.getPath.getName.endsWith(".parquet"))
    if (any) Map(ChangeDataMetaKey -> uuid)
    else { fs.delete(dir, true); Map(ChangeDataMetaKey -> "0") }
  }

  // ------------------------------------------------------------ file stats
  //
  // Each manifest FILE line is `relPath[\t<stats>]` where <stats> is
  // `;`-joined `name,tag,min,max[,nulls,rows]` tuples (URL-encoded
  // tokens — no collisions with the separators), one per column whose
  // parquet footer carries usable stats. tag `n` = compare numerically
  // (ints/longs/floats/doubles, dates as epoch days, timestamps as
  // micros — parquet's own physical encodings), tag `s` = compare as
  // UTF-8 strings, tag `x` = no comparable min/max (null counts only —
  // the min/max tokens are empty). The optional 5th/6th tokens are the
  // column's NULL COUNT and the file's row count (top-level columns
  // only), enabling `IS NULL` pruning (nulls = 0 → skip) and
  // `IS NOT NULL` / comparison pruning of all-null files
  // (nulls = rows → skip). Stats come from the FOOTERS of the freshly
  // written files — O(new files) driver metadata reads, never a data
  // scan — and ride in the same atomic manifest claim as the file
  // list, so [[readWhere]] can prune files the predicate provably
  // cannot match (Delta's data-skipping stats, reduced to its
  // essentials). At 100 TB this is the difference between a needle
  // query scanning the lake and scanning the handful of files whose
  // [min,max] straddles the needle. Pre-null-count manifests (4-token
  // tuples) keep working: absent null info is "may match".

  /** Manifest file line → relative path (stats suffix stripped). */
  private def pathOf(line: String): String = {
    val i = line.indexOf('\t')
    if (i < 0) line else line.substring(0, i)
  }

  /** One column's skipping stats as carried in a manifest line. `tag`
    * "x" = no comparable min/max (ignore `min`/`max`); `nulls`/`rows`
    * absent on pre-null-count manifests. `knownAllNull` marks a column
    * proven all-null WITHOUT counts — the hive default-partition dir
    * (every row's partition value is null, row count unknown).
    */
  private[ops] final case class ColStats(tag: String, min: String,
      max: String, nulls: Option[Long] = None, rows: Option[Long] = None,
      knownAllNull: Boolean = false) {
    def allNull: Boolean = knownAllNull ||
      (nulls.isDefined && rows.isDefined && nulls == rows && rows.get > 0)
  }

  /** Manifest file line → per-column stats, empty if none. */
  private def statsOf(line: String): Map[String, ColStats] = {
    val i = line.indexOf('\t')
    if (i < 0) Map.empty
    else line.substring(i + 1).split(';').toSeq.flatMap { t =>
      t.split(',') match {
        case Array(n, tag, mn, mx) =>
          Some(dec(n) -> ColStats(tag, dec(mn), dec(mx)))
        case Array(n, tag, mn, mx, nu, ro) =>
          val nulls = scala.util.Try(nu.toLong).toOption
          val rows = scala.util.Try(ro.toLong).toOption
          Some(dec(n) -> ColStats(tag, dec(mn), dec(mx), nulls, rows))
        case _ => None
      }
    }.toMap
  }

  /** Pseudo-stats for a partitioned file's PARTITION columns, parsed
    * from the hive `k=v` segments of its manifest path: min = max =
    * the partition value, tagged numeric when the value parses as a
    * number and string otherwise. Partition values never appear in
    * parquet footers, so without this a partition-column predicate
    * could never skip a file; with it [[readWhere]] prunes whole
    * partitions from the MANIFEST alone — zero footer or data I/O for
    * partitions the predicate cannot match. Tag/type mismatches
    * (string-typed columns with numeric-looking values, casts in the
    * predicate) fall through [[mayMatch]]'s conservative keep — a
    * missed skip, never a wrong prune. The hive null marker gets no
    * stats (conservative keep).
    */
  private def partitionStats(rel: String): Map[String, ColStats] =
    rel.split('/').drop(2).dropRight(1).filter(_.contains('='))
      .flatMap { seg =>
        val i = seg.indexOf('=')
        val k = seg.substring(0, i)
        val v = unescapePartition(seg.substring(i + 1))
        if (v == "__HIVE_DEFAULT_PARTITION__")
          // the null-partition dir: EVERY row's partition value is null
          // — `IS NOT NULL` and any comparison prune it from the path
          Some(k -> ColStats("x", "", "", knownAllNull = true))
        else {
          val tag =
            if (scala.util.Try(BigDecimal(v)).isSuccess) "n" else "s"
          // a non-null partition value means ZERO nulls in this file's
          // partition column — `IS NULL` prunes it from the path alone
          Some(k -> ColStats(tag, v, v, nulls = Some(0L)))
        }
      }.toMap

  /** Hive percent-escaping of partition-dir values (`%3A` → `:`), the
    * inverse of what the parquet writer applies. NOT URLDecoder: hive
    * leaves `+` literal. Multi-byte escapes decode as UTF-8.
    */
  private[graft] def unescapePartition(s: String): String =
    if (!s.contains('%')) s
    else {
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length &&
            s.substring(i + 1, i + 3).forall(h =>
              h.isDigit || ('a' to 'f').contains(h.toLower))) {
          bytes += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
          i += 3
        } else {
          bytes ++= c.toString.getBytes(StandardCharsets.UTF_8)
          i += 1
        }
      }
      new String(bytes.toArray, StandardCharsets.UTF_8)
    }

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Compare strings the way parquet compares binary statistics:
    * unsigned UTF-8 byte order. Java's `compareTo` (UTF-16 code units)
    * disagrees for code points above the BMP (surrogates sort below
    * U+E000..U+FFFF), which would mis-prune.
    */
  private def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  // ---- file-level bloom filters -----------------------------------
  // Equality skipping for HIGH-CARDINALITY columns, where min/max
  // windows cannot prune: an id scattered uniformly across every file
  // intersects every [min,max], so a point lookup scans the table.
  // A small per-file bloom answers "definitely absent" for = / IN,
  // the Delta/Iceberg bloom-index story reduced to the manifest line.

  /** Carried meta key holding the bloom configuration as URL-encoded
    * `col1,col2:bits:hashes`. Set by [[setBloomFilters]]; every later
    * data commit (append/overwrite/DML rewrite/compaction/streaming/
    * COPY INTO — they all share [[statsLines]]) computes one bloom per
    * configured column per NEW file. Files written before the config
    * (or under an older one) simply lack the token — conservative
    * keep, never a wrong prune; OPTIMIZE/compact regenerates.
    */
  private[graft] val BloomMetaKey = "graft.bloom"
  private val BloomStatPrefix = "bloom:"
  private val BloomTag = "b"

  private def bloomConfigOf(meta: Map[String, String])
      : Option[(Seq[String], Int, Int)] =
    meta.get(BloomMetaKey).map(dec).filter(_.nonEmpty).flatMap { s =>
      s.split(':') match {
        case Array(cols, bits, k) => scala.util.Try(
          (cols.split(',').toSeq.filter(_.nonEmpty), bits.toInt, k.toInt))
          .toOption.filter(_._1.nonEmpty)
        case _ => None
      }
    }

  /** Declare bloom filters on `cols` (integral or string data columns).
    * Metadata-only commit; takes effect for files written AFTER it.
    * `bits` is the filter size per file per column (8192 bits = 1 KiB
    * in the manifest before base64; at ~10 bits/distinct-value that
    * holds ~800 distinct values per file under 1% false positives —
    * size it to files' expected distinct counts, the classic
    * m ≈ 1.44·n·log2(1/fp)).
    */
  def setBloomFilters(spark: SparkSession, path: String, cols: Seq[String],
                      bits: Int = 8192, hashes: Int = 6): Long = {
    require(cols.nonEmpty, "setBloomFilters needs at least one column")
    require(bits >= 64 && bits <= (1 << 24) && bits % 64 == 0,
      s"bits must be in [64, 2^24] and a multiple of 64, got $bits")
    require(hashes >= 1 && hashes <= 16, s"hashes must be in [1,16], got $hashes")
    require(versions(spark, path).nonEmpty,
      s"$path is not a TxTable (no $LogDir manifests)")
    val schema = read(spark, path, mergeSchema = true).schema
    import org.apache.spark.sql.types._
    cols.foreach { c =>
      val f = schema.find(_.name == c).getOrElse(
        sys.error(s"setBloomFilters: no column '$c' in $path"))
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType,
          StringType).contains(f.dataType),
        s"bloom filters support integral and string columns; '$c' is " +
          f.dataType.simpleString)
    }
    val parts = declaredPartitionCols(spark, path).getOrElse(Nil)
    require(cols.intersect(parts).isEmpty,
      s"bloom on partition columns is pointless — partition-value " +
        s"pseudo-stats already prune them exactly: ${cols.intersect(parts)}")
    commitLines(spark, path, "setbloom", Seq.empty, (base, _) => base,
      Map(BloomMetaKey -> enc(s"${cols.mkString(",")}:$bits:$hashes")))
  }

  /** The [[BloomMetaKey]] entry for declaring blooms ATOMICALLY with a
    * data commit's `meta` (the commit computes the per-file tokens for
    * its own files in the same claim): an index builder that declares
    * blooms this way pays ONE commit where the declare-then-ANALYZE
    * sequence pays three plus a full re-read of the just-written data.
    * Same validation bounds as [[setBloomFilters]]; column existence/
    * type is the caller's contract (the frame being committed is in
    * hand).
    */
  private[graft] def bloomDeclarationMeta(cols: Seq[String],
                                          bits: Int = 8192,
                                          hashes: Int = 6)
      : Map[String, String] = {
    require(cols.nonEmpty, "bloom declaration needs at least one column")
    require(bits >= 64 && bits <= (1 << 24) && bits % 64 == 0,
      s"bits must be in [64, 2^24] and a multiple of 64, got $bits")
    require(hashes >= 1 && hashes <= 16,
      s"hashes must be in [1,16], got $hashes")
    Map(BloomMetaKey -> enc(s"${cols.mkString(",")}:$bits:$hashes"))
  }

  /** The table's bloom configuration — (columns, bits, hashes) — if
    * declared. */
  def bloomFilterConfig(spark: SparkSession,
                        path: String): Option[(Seq[String], Int, Int)] =
    versions(spark, path).lastOption
      .flatMap(v => bloomConfigOf(commitMeta(spark, path, v)))

  /** Remove the bloom configuration (tombstoned empty, like a dropped
    * constraint). Existing per-file tokens stay in the manifest and
    * keep pruning — they are still TRUE statements about their files.
    */
  def dropBloomFilters(spark: SparkSession, path: String): Long =
    commitLines(spark, path, "setbloom", Seq.empty, (base, _) => base,
      Map(BloomMetaKey -> ""))

  /** The double-hashing position columns: pos_i = (h1 + i·h2) mod m
    * with h1 = xxhash64(v) mod m and h2 = xxhash64(v, 1) mod (m−1) + 1
    * (step nonzero, and bounded so i·h2 stays far from 2^63 under ANSI
    * arithmetic). The PROBE side replays the identical Catalyst
    * expressions driver-side, so write and probe can never drift.
    */
  private def bloomPositions(v: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column,
                             bits: Int): org.apache.spark.sql.Column =
    pmod(pmod(xxhash64(v), lit(bits.toLong)) +
      i * (pmod(xxhash64(v, lit(1)), lit((bits - 1).toLong)) + lit(1L)),
      lit(bits.toLong))

  private def bloomProbePositions(s: String, bits: Int, k: Int): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.unsafe.types.UTF8String
    val lit0 = Literal.create(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)
    val x1 = XxHash64(Seq(lit0), 42L).eval(null).asInstanceOf[Long]
    val x2 = XxHash64(Seq(lit0, Literal(1)), 42L).eval(null).asInstanceOf[Long]
    def pm(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }
    val h1 = pm(x1, bits)
    val h2 = pm(x2, bits - 1) + 1
    (0 until k).map(i => pm(h1 + i * h2, bits).toInt)
  }

  /** Per-file bloom tokens for `cols` over freshly written `relFiles`:
    * one distributed pass per column (cheap: the files were just
    * written and are few), collecting ≤ `bits` set positions per file
    * — bounded regardless of row count. Token format rides the
    * existing 4-field stats grammar: `bloom:<col>, b, <base64 bits>,
    * <k:bits>` — older parsers see an extra pseudo-column whose name
    * can never collide with a real attribute.
    */
  private def bloomTokens(spark: SparkSession, fs: FileSystem, p: Path,
                          relFiles: Seq[String], cols: Seq[String],
                          bits: Int, k: Int): Map[String, String] =
    if (relFiles.isEmpty) Map.empty
    else try {
      val qualOf = relFiles.map { r =>
        fs.makeQualified(new Path(p, r)).toUri.getPath -> r
      }.toMap
      val df = spark.read.parquet(
        relFiles.map(r => fs.makeQualified(new Path(p, r)).toString): _*)
      val present = cols.filter(df.columns.contains)
      val perFile = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.ArrayBuffer[String]]
      present.foreach { c =>
        val rows = df
          .select(input_file_name().as("__f"), col(c).cast("string").as("__v"))
          .filter(col("__v").isNotNull)
          // generator first (explode must be top-level), arithmetic after
          .select(col("__f"), col("__v"),
            explode(sequence(lit(0L), lit((k - 1).toLong))).as("__i"))
          .select(col("__f"),
            bloomPositions(col("__v"), col("__i"), bits).as("__p"))
          .groupBy(col("__f")).agg(collect_set(col("__p")).as("__ps"))
          .collect()
        rows.foreach { r =>
          // input_file_name is a URI string; canonicalize to a decoded
          // filesystem path before matching the manifest-relative name
          val fp = scala.util.Try(
            new Path(new java.net.URI(r.getString(0))).toUri.getPath)
            .getOrElse(r.getString(0))
          qualOf.get(fp).foreach { rel =>
            val bs = new java.util.BitSet(bits)
            r.getSeq[Long](1).foreach(x => bs.set(x.toInt))
            val b64 = java.util.Base64.getEncoder.encodeToString(bs.toByteArray)
            perFile.getOrElseUpdate(rel,
              scala.collection.mutable.ArrayBuffer.empty[String]) +=
              Seq(enc(BloomStatPrefix + c), BloomTag, enc(b64),
                enc(s"$k:$bits")).mkString(",")
          }
        }
      }
      perFile.view.mapValues(_.mkString(";")).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Could a file whose stats carry bloom tokens contain a row matching
    * `conjunct`? Only = and IN probe; everything else — and any file
    * without a token for the column — keeps the file. An absent bit is
    * PROOF of absence (every write since the config computed the
    * token), so skipping is exact; false positives only cost a read.
    */
  private def bloomMayMatch(stats: Map[String, ColStats],
                            conjunct: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    if (!stats.keysIterator.exists(_.startsWith(BloomStatPrefix))) return true
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // literal → the exact string CAST(col AS STRING) yields at write
    def render(e: Expression): Option[String] = e match {
      case Literal(v, dt) if v != null =>
        import org.apache.spark.sql.types._
        dt match {
          case ByteType | ShortType | IntegerType | LongType | StringType =>
            Some(v.toString)
          case _ => None
        }
      case _ => None
    }
    def maybeHas(attr: Expression, lits: Seq[Expression]): Boolean =
      (for {
        n <- nameOf(attr)
        cs <- stats.get(BloomStatPrefix + n) if cs.tag == BloomTag
        r <- scala.util.Try {
          val bs = java.util.BitSet.valueOf(
            java.util.Base64.getDecoder.decode(cs.min))
          val Array(k, bits) = cs.max.split(':').map(_.toInt)
          lits.exists { l =>
            render(l) match {
              case None => true // un-renderable literal: keep
              case Some(s) =>
                bloomProbePositions(s, bits, k).forall(bs.get)
            }
          }
        }.toOption
      } yield r).getOrElse(true)

    conjunct match {
      case EqualTo(a, l: Literal) if nameOf(a).isDefined => maybeHas(a, Seq(l))
      case EqualTo(l: Literal, a) if nameOf(a).isDefined => maybeHas(a, Seq(l))
      case In(a, vs) if nameOf(a).isDefined && vs.forall(_.isInstanceOf[Literal]) =>
        maybeHas(a, vs)
      case _ => true
    }
  }

  /** Stats-bearing manifest lines for freshly written files: footer
    * min/max plus (when the table declares them) per-column bloom
    * tokens — the single formatting path every data commit shares.
    */
  /** `pendingMeta`: the meta of the commit IN FLIGHT — a bloom config
    * declared there (see [[bloomDeclarationMeta]]) applies to this
    * commit's own files, overriding the head's carried config.
    */
  private def statsLines(spark: SparkSession, fs: FileSystem, p: Path,
                         path: String, relFiles: Seq[String],
                         pendingMeta: Map[String, String] = Map.empty)
      : Seq[String] = {
    val stats = footerStats(fs, p, relFiles)
    val headMeta = versions(spark, path).lastOption
      .map(v => parseMeta(readManifest(fs, p, v)._1))
      .getOrElse(Map.empty[String, String])
    val blooms = bloomConfigOf(headMeta ++ pendingMeta)
      .map { case (cols, bits, k) =>
        bloomTokens(spark, fs, p, relFiles, cols, bits, k) }
      .getOrElse(Map.empty[String, String])
    relFiles.map { f =>
      val toks = Seq(stats.get(f), blooms.get(f)).flatten
      if (toks.isEmpty) f else s"$f\t${toks.mkString(";")}"
    }
  }

  /** Footer row count of one data file; −1 (treated as non-empty by
    * callers — conservative keep) when the footer is unreadable.
    */
  private def parquetRowCount(fs: FileSystem, p: Path, rel: String): Long =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(p, rel), fs.getConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        var n = 0L
        r.getFooter.getBlocks.forEach(b => n += b.getRowCount)
        n
      } finally r.close()
    } catch { case _: Throwable => -1L }

  /** Read min/max per column from the parquet footers of `relFiles`
    * (merged across row groups). Columns typed beyond the supported
    * comparable set — or whose chunks lack stats — are simply absent:
    * pruning treats absence as "may match", so stats are only ever an
    * optimization, never a correctness input.
    */
  private def footerStats(fs: FileSystem, p: Path,
                          relFiles: Seq[String]): Map[String, String] = {
    val conf = fs.getConf
    relFiles.flatMap { rel =>
      val statsStr =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(p, rel), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            // (tag, mn, mx) per column, merged across this file's blocks;
            // a column drops out the moment one chunk lacks usable stats
            var acc = Map.empty[String, (String, BigDecimal, BigDecimal, String, String)]
            var dropped = Set.empty[String]
            // null counts tracked independently of min/max (an all-null
            // or type-unsupported column can still carry them) — but
            // only for TOP-LEVEL columns (dot-free path): a nested or
            // repeated column's numNulls counts values, not records,
            // and comparing it to the file's row count would mis-prune
            var nullAcc = Map.empty[String, Long]
            var nullDropped = Set.empty[String]
            var totalRows = 0L
            r.getFooter.getBlocks.forEach { block =>
              totalRows += block.getRowCount
              block.getColumns.forEach { cc =>
                val name = cc.getPath.toDotString
                val st = cc.getStatistics
                if (!name.contains('.') && !nullDropped.contains(name)) {
                  if (st != null && st.isNumNullsSet && st.getNumNulls >= 0)
                    nullAcc += name ->
                      (nullAcc.getOrElse(name, 0L) + st.getNumNulls)
                  else { nullDropped += name; nullAcc -= name }
                }
                if (!dropped.contains(name)) {
                  // timestamp stats are only comparable when the file's
                  // unit matches Catalyst's internal micros — a MILLIS/
                  // NANOS file compared against a micros literal would
                  // mis-prune (wrong RESULTS, not just a missed skip)
                  val tsUnitSafe = cc.getPrimitiveType.getLogicalTypeAnnotation match {
                    case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                      t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
                    case _ => true
                  }
                  // decimal stats are UNSCALED ints (12.34 stored as 1234)
                  // — comparing them against a scaled literal mis-prunes,
                  // so decimal columns get no stats at all
                  val notDecimal = !cc.getPrimitiveType.getLogicalTypeAnnotation
                    .isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
                  val parsed: Option[(String, String, String)] =
                    if (st == null || !st.hasNonNullValue) None
                    else (st.genericGetMin, st.genericGetMax) match {
                      case (mn: java.lang.Number, mx: java.lang.Number)
                          if tsUnitSafe && notDecimal &&
                            !(mn.toString + mx.toString)
                              .exists(c => c == 'N' || c == 'I') =>
                        Some(("n", mn.toString, mx.toString))
                      case (mn: org.apache.parquet.io.api.Binary,
                            mx: org.apache.parquet.io.api.Binary)
                          if cc.getPrimitiveType.getLogicalTypeAnnotation ==
                            org.apache.parquet.schema.LogicalTypeAnnotation.stringType() =>
                        Some(("s", mn.toStringUsingUTF8, mx.toStringUsingUTF8))
                      case _ => None
                    }
                  parsed match {
                    case None => dropped += name; acc -= name
                    case Some((tag, mn, mx)) =>
                      val merged = acc.get(name) match {
                        case Some((t, amn, amx, smn, smx)) if t == tag && tag == "n" =>
                          val bmn = BigDecimal(mn); val bmx = BigDecimal(mx)
                          (t, amn.min(bmn), amx.max(bmx),
                            if (bmn < amn) mn else smn, if (bmx > amx) mx else smx)
                        case Some((t, _, _, smn, smx)) if t == tag && tag == "s" =>
                          // parquet orders binary stats by UNSIGNED UTF-8
                          // bytes; Java String compareTo (UTF-16) disagrees
                          // above the BMP — merge in parquet's order
                          (t, BigDecimal(0), BigDecimal(0),
                            if (utf8Cmp(mn, smn) < 0) mn else smn,
                            if (utf8Cmp(mx, smx) > 0) mx else smx)
                        case Some(_) => dropped += name; acc -= name; null
                        case None =>
                          if (tag == "n")
                            (tag, BigDecimal(mn), BigDecimal(mx), mn, mx)
                          else (tag, BigDecimal(0), BigDecimal(0), mn, mx)
                      }
                      if (merged != null) acc += name -> merged
                  }
                }
              }
            }
            (acc.keySet ++ nullAcc.keySet).toSeq.sorted.map { n =>
              val mm = acc.get(n)
              val nu = nullAcc.get(n)
              (mm, nu) match {
                case (Some((tag, _, _, smn, smx)), Some(c)) =>
                  Seq(enc(n), tag, enc(smn), enc(smx),
                    c.toString, totalRows.toString).mkString(",")
                case (Some((tag, _, _, smn, smx)), None) =>
                  Seq(enc(n), tag, enc(smn), enc(smx)).mkString(",")
                case (None, Some(c)) =>
                  // null-count-only entry (all-null or uncomparable
                  // type): tag "x", empty min/max tokens
                  Seq(enc(n), "x", "", "",
                    c.toString, totalRows.toString).mkString(",")
                case _ => ""
              }
            }.filter(_.nonEmpty).mkString(";")
          } finally r.close()
        } catch { case scala.util.control.NonFatal(_) => "" }
      if (statsStr.isEmpty) None else Some(rel -> statsStr)
    }.toMap
  }

  /** Could a file with these stats contain a row matching `conjunct`?
    * Conservative: unknown shapes, missing columns, or un-comparable
    * literals keep the file. Handles =, <, <=, >, >=, IN over one
    * column and one literal side (either order), plus IS NULL (skips
    * files with zero nulls in the column) and IS NOT NULL / any
    * comparison (skips all-null files).
    */
  private def mayMatch(stats: Map[String, ColStats],
                       conjunct: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // literal → comparable under the column's stats tag
    def litVal(e: Expression, tag: String): Option[Either[BigDecimal, String]] = e match {
      case Literal(v, dt) =>
        import org.apache.spark.sql.types._
        (dt, tag) match {
          case (_: NumericType, "n") =>
            scala.util.Try(scala.util.Left(BigDecimal(v.toString))).toOption
          case (DateType | TimestampType | TimestampNTZType, "n") =>
            // internal representations: days / micros — plain integers
            scala.util.Try(scala.util.Left(BigDecimal(v.toString))).toOption
          case (StringType, "s") =>
            // a null literal can never equal/compare true, but stats
            // can't prove that — decline to prune (row filter handles it)
            Option(v).map(x => scala.util.Right(x.toString))
          case _ => None
        }
      case _ => None
    }
    def cmp(tag: String, a: String, v: Either[BigDecimal, String]): Int = v match {
      case scala.util.Left(n) => BigDecimal(a).compare(n)
      // parquet's binary stats order: unsigned UTF-8 bytes (see merge
      // note in footerStats) — NOT Java String compareTo
      case scala.util.Right(s) => utf8Cmp(a, s)
    }
    def test(attr: Expression, lit: Expression,
             keep: (Int, Int) => Boolean): Boolean =
      (for {
        n <- nameOf(attr)
        cs <- stats.get(n)
        r <-
          // every value null → no comparison can be TRUE, skip the
          // file regardless of the literal (even an un-comparable one)
          if (cs.allNull) Some(false)
          else for {
            v <- litVal(lit, cs.tag)
            r2 <- scala.util.Try(
              keep(cmp(cs.tag, cs.min, v), cmp(cs.tag, cs.max, v))).toOption
          } yield r2
      } yield r).getOrElse(true)
    // prefix predicates (c LIKE 'p%' / startsWith): every matching
    // string lies in [p, nextAfterPrefix(p)) under unsigned UTF-8
    // order, so a file whose [min,max] window misses that range is
    // skipped. nextAfterPrefix increments the last non-0xFF byte (an
    // all-0xFF prefix has no upper bound — lower test only).
    def prefixUpper(p: String): Option[Array[Byte]] = {
      val b = p.getBytes(StandardCharsets.UTF_8)
      var i = b.length - 1
      while (i >= 0 && b(i) == 0xFF.toByte) i -= 1
      if (i < 0) None
      else {
        val c = java.util.Arrays.copyOf(b, i + 1)
        c(i) = (c(i) + 1).toByte
        Some(c)
      }
    }
    def testPrefix(attr: Expression, p: String): Boolean =
      (for { n <- nameOf(attr); cs <- stats.get(n) } yield {
        if (cs.allNull) false
        else if (cs.tag != "s") true // non-string stats: conservative keep
        else utf8Cmp(cs.max, p) >= 0 && (prefixUpper(p) match {
          case None => true
          case Some(u) => java.util.Arrays.compareUnsigned(
            cs.min.getBytes(StandardCharsets.UTF_8), u) < 0
        })
      }).getOrElse(true)
    // a LIKE whose pattern is a plain prefix (trailing %, no other
    // wildcards/escapes) prunes like startsWith; anything else keeps
    def likePrefix(pattern: String): Option[String] =
      if (pattern.nonEmpty && pattern.endsWith("%") &&
          !pattern.dropRight(1).exists(c => c == '%' || c == '_' || c == '\\'))
        Some(pattern.dropRight(1))
      else None

    // nulls known to be zero → `c IS NULL` cannot match
    def mayHaveNull(attr: Expression): Boolean =
      (for { n <- nameOf(attr); cs <- stats.get(n); nu <- cs.nulls }
        yield nu > 0).getOrElse(true)
    // all values null → `c IS NOT NULL` cannot match
    def mayHaveValue(attr: Expression): Boolean =
      nameOf(attr).flatMap(stats.get).forall(!_.allNull)

    conjunct match {
      case IsNull(a) if nameOf(a).isDefined => mayHaveNull(a)
      case IsNotNull(a) if nameOf(a).isDefined => mayHaveValue(a)
      case EqualTo(a, l) if nameOf(a).isDefined => test(a, l, (mn, mx) => mn <= 0 && mx >= 0)
      case EqualTo(l, a) if nameOf(a).isDefined => test(a, l, (mn, mx) => mn <= 0 && mx >= 0)
      case GreaterThan(a, l) if nameOf(a).isDefined => test(a, l, (_, mx) => mx > 0)
      case GreaterThan(l, a) if nameOf(a).isDefined => test(a, l, (mn, _) => mn < 0)
      case GreaterThanOrEqual(a, l) if nameOf(a).isDefined => test(a, l, (_, mx) => mx >= 0)
      case GreaterThanOrEqual(l, a) if nameOf(a).isDefined => test(a, l, (mn, _) => mn <= 0)
      case LessThan(a, l) if nameOf(a).isDefined => test(a, l, (mn, _) => mn < 0)
      case LessThan(l, a) if nameOf(a).isDefined => test(a, l, (_, mx) => mx > 0)
      case LessThanOrEqual(a, l) if nameOf(a).isDefined => test(a, l, (mn, _) => mn <= 0)
      case LessThanOrEqual(l, a) if nameOf(a).isDefined => test(a, l, (_, mx) => mx >= 0)
      case In(a, vs) if nameOf(a).isDefined =>
        vs.exists(v => test(a, v, (mn, mx) => mn <= 0 && mx >= 0))
      // null-safe equality: `<=> null` matches only nulls; `<=> v`
      // matches exactly like `= v` (nulls never equal a value)
      case EqualNullSafe(a, Literal(null, _)) if nameOf(a).isDefined =>
        mayHaveNull(a)
      case EqualNullSafe(Literal(null, _), a) if nameOf(a).isDefined =>
        mayHaveNull(a)
      case EqualNullSafe(a, l: Literal) if nameOf(a).isDefined =>
        test(a, l, (mn, mx) => mn <= 0 && mx >= 0)
      case EqualNullSafe(l: Literal, a) if nameOf(a).isDefined =>
        test(a, l, (mn, mx) => mn <= 0 && mx >= 0)
      // `!= v` can only prune a file whose every non-null value IS v
      // (min = max = v): value rows fail the inequality and null rows
      // evaluate it to NULL — neither matches
      case Not(EqualTo(a, l)) if nameOf(a).isDefined =>
        test(a, l, (mn, mx) => !(mn == 0 && mx == 0))
      case Not(EqualTo(l, a)) if nameOf(a).isDefined =>
        test(a, l, (mn, mx) => !(mn == 0 && mx == 0))
      case StartsWith(a, Literal(p, org.apache.spark.sql.types.StringType))
          if nameOf(a).isDefined && p != null =>
        testPrefix(a, p.toString)
      case Like(a, Literal(p, org.apache.spark.sql.types.StringType), esc)
          if nameOf(a).isDefined && p != null && esc == '\\' =>
        likePrefix(p.toString).forall(testPrefix(a, _))
      // boolean combinators: resolveConjuncts only splits TOP-LEVEL
      // ANDs, so a disjunctive predicate (`day = 1 OR day = 2`, or the
      // per-partition prune `(a=1 AND b=2) OR (a=3 AND b=4)`) arrives
      // here whole — a file may match an OR iff SOME branch may match,
      // an AND iff EVERY leg may (each recursion stays a conservative
      // upper bound, so composition is too)
      case Or(l, r) => mayMatch(stats, l) || mayMatch(stats, r)
      case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
      case _ => true
    }
  }

  /** Resolve `predicate` by analyzing a filter over the snapshot
    * relation and split the typed condition into top-level AND
    * conjuncts. A Spark 4 Column is a ColumnNode tree, not a Catalyst
    * expression; analysis both resolves it and types the literals into
    * their internal representations (dates → days, timestamps →
    * micros), which is what [[mayMatch]] compares stats against. Empty
    * when no Filter node survives analysis (e.g. `lit(true)`).
    */
  private def resolveConjuncts(spark: SparkSession, p: Path,
                               lines: Seq[String],
                               predicate: org.apache.spark.sql.Column,
                               mergeSchema: Boolean,
                               schema: Option[StructType]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression}
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    scanFiles(spark, p, lines.map(pathOf), mergeSchema, schema)
      .where(predicate).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          split(f.condition)
      }.getOrElse(Seq.empty)
  }

  /** Predicate-pruned snapshot read: drops every file whose manifest
    * stats prove the predicate cannot match, scans the rest, and
    * re-applies the full predicate (stats pruning is file-granular;
    * row filtering still happens — results are EXACTLY
    * `read(...).where(predicate)`). Top-level AND conjuncts prune
    * independently; anything stats can't reason about is ignored for
    * pruning and enforced by the row filter.
    */
  def readWhere(spark: SparkSession, path: String,
                predicate: org.apache.spark.sql.Column,
                mergeSchema: Boolean = false,
                schema: Option[StructType] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val pinned = schema.orElse(declaredSchemaAt(fs, p, vs.last))
    val cs =
      if (lines.isEmpty)
        Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]
      else resolveConjuncts(spark, p, lines, predicate, mergeSchema, pinned)
    val kept = lines.filter { l =>
      // footer stats + partition-value pseudo-stats: a partition-column
      // predicate prunes from the manifest path alone (no footer I/O);
      // bloom tokens additionally prune = / IN on high-cardinality cols
      val st = statsOf(l) ++ partitionStats(pathOf(l))
      cs.forall(c => mayMatch(st, c) && bloomMayMatch(st, c))
    }
    if (lines.isEmpty) pinned match {
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => sys.error(
        s"head of $path is an empty snapshot with no files — " +
        "pass an explicit schema to read it as an empty frame")
    }
    else if (kept.isEmpty)
      // no file can match: Catalyst folds Filter(false) to an empty
      // relation, so this reads nothing while keeping the snapshot schema
      scanFiles(spark, p, lines.map(pathOf), mergeSchema, pinned)
        .where(lit(false))
    else scanFiles(spark, p, kept.map(pathOf), mergeSchema, pinned)
      .where(predicate)
  }

  /** Snapshot read of the newest committed version. `mergeSchema` unions
    * the schemas of all referenced files — required once appends have
    * widened the table (see [[readVersion]]).
    */
  def read(spark: SparkSession, path: String,
           mergeSchema: Boolean = false,
           schema: Option[StructType] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    readVersion(spark, path, vs.last, mergeSchema, schema)
  }

  /** Time travel: snapshot read of an exact committed version.
    *
    * Schema evolution: data files are immutable, so a snapshot whose
    * appends added columns holds files with DIFFERENT schemas.
    * `mergeSchema = true` resolves the union schema across every file in
    * the snapshot (old files read the added columns as null) — the
    * mergeSchema=false default keeps single-footer schema resolution
    * (first listed file wins), which is only correct for homogeneous
    * snapshots.
    *
    * `schema` pins the read schema explicitly — in particular it pins
    * PARTITION column types, which are otherwise re-INFERRED from the
    * `key=value` directory strings (a string partition column holding
    * "07" infers as int 7 and would no longer equal "07"). Callers that
    * compare or merge against a frame with known types should pin.
    */
  def readVersion(spark: SparkSession, path: String, v: Long,
                  mergeSchema: Boolean = false,
                  schema: Option[StructType] = None): DataFrame = {
    val (fs, p) = fsFor(spark, path)
    val (_, files) = readManifest(fs, p, v)
    // an explicit caller pin wins; otherwise the schema the manifest
    // itself declares (create/evolveSchema) pins the read — files
    // written before an evolution surface the added columns as null
    val pinned = schema.orElse(declaredSchemaAt(fs, p, v))
    if (files.isEmpty) pinned match {
      // an empty snapshot has no parquet footer to infer from — a
      // pinned or declared schema reads it as an empty frame (same
      // contract as readWhere/readAppended), otherwise fail loudly
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => sys.error(
        s"version $v of $path is an empty snapshot with no files — " +
        "pass an explicit schema to read it as an empty frame")
    }
    else scanFiles(spark, p, files.map(pathOf), mergeSchema, pinned)
  }

  /** Absolute data-file paths of version `v`'s snapshot — the
    * file-list surface external readers (the `graft` DataSource V2
    * provider, [[graft.sources.GraftTableProvider]]) build on.
    */
  def snapshotFiles(spark: SparkSession, path: String, v: Long): Seq[String] = {
    val (fs, p) = fsFor(spark, path)
    readManifest(fs, p, v)._2.map(l => new Path(p, pathOf(l)).toString)
  }

  /** Version `v`'s parsed meta AND qualified snapshot files from ONE
    * manifest read — for per-version loops (streaming sources) that
    * would otherwise call [[commitMeta]] and [[snapshotFiles]]
    * back-to-back and read every manifest twice.
    */
  private[graft] def snapshotWithMeta(spark: SparkSession, path: String,
                                      v: Long)
      : (Map[String, String], Seq[String]) = {
    val (fs, p) = fsFor(spark, path)
    val (head, lines) = readManifest(fs, p, v)
    (parseMeta(head), lines.map(l => new Path(p, pathOf(l)).toString))
  }

  // ----------------------------------------------- metadata-only aggregates
  //
  // COUNT(*) / COUNT(col) / MIN / MAX answered from the manifest's
  // file statistics ALONE — O(manifest lines) driver work, zero data
  // or footer I/O. At 100 TB this is the difference between a
  // row-count taking milliseconds and a full-lake scan; it is how
  // Delta/Iceberg serve `SELECT COUNT(*)`. Every method returns None
  // the moment the manifest cannot PROVE the answer (pre-null-count
  // files, a column without usable stats) — callers fall back to a
  // scan; the metadata path never guesses.

  /** Exact snapshot row count (head, or `version` when >= 0) from
    * per-file row counts, or None if any live file's manifest line
    * lacks one.
    */
  def metaRowCount(spark: SparkSession, path: String,
                   version: Long = -1L): Option[Long] = {
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = if (version >= 0) version else vs.last
    require(vs.contains(v), s"version $v of $path does not exist")
    metaRowCountOfLines(readManifest(fs, p, v)._2)
  }

  private[graft] def metaRowCountOfLines(lines: Seq[String]): Option[Long] = {
    val per = lines.map(l => statsOf(l).values.flatMap(_.rows).headOption)
    if (per.forall(_.isDefined)) Some(per.iterator.flatten.sum) else None
  }

  /** Exact head-snapshot COUNT(column) — non-null values — from
    * per-file row and null counts (partition columns via their path
    * pseudo-stats: a concrete partition value is zero nulls, the hive
    * null dir is all nulls). None unless every live file proves its
    * contribution.
    */
  def metaColumnCount(spark: SparkSession, path: String,
                      column: String, version: Long = -1L): Option[Long] = {
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = if (version >= 0) version else vs.last
    require(vs.contains(v), s"version $v of $path does not exist")
    metaColumnCountOfLines(readManifest(fs, p, v)._2, column)
  }

  private[graft] def metaColumnCountOfLines(lines: Seq[String],
                                            column: String): Option[Long] = {
    val per = lines.map { l =>
      val st = statsOf(l)
      val cs = st.get(column).orElse(partitionStats(pathOf(l)).get(column))
      for {
        rows <- st.values.flatMap(_.rows).headOption
        nonNull <- cs.flatMap(c =>
          if (c.knownAllNull) Some(0L) else c.nulls.map(rows - _))
      } yield nonNull
    }
    if (per.forall(_.isDefined)) Some(per.iterator.flatten.sum) else None
  }

  /** Exact snapshot (MIN, MAX) of a column, rendered as the stats
    * strings, or None when the manifest can't prove them.
    *
    * `stringOrdered` declares the COLUMN's comparison semantics and
    * MUST be true iff the column is string-typed — the manifest alone
    * cannot know (a string partition value "2024" parses as a number
    * and would be tagged numeric, silently ordering "10" < "5" under
    * a numeric compare). With `stringOrdered = true` only partition
    * PATH values are accepted (exact by construction; data `s` stats
    * may be writer-truncated bounds) and extremes use unsigned UTF-8
    * byte order, regardless of the per-value tag guess. With the
    * numeric default, only `n`-tagged stats are accepted
    * (ints/longs/floats/doubles, dates as epoch days, micros
    * timestamps — parquet numeric chunk statistics are exact) and
    * extremes compare numerically. Provably all-null files contribute
    * nothing; an all-null or statless column returns None.
    */
  def metaMinMax(spark: SparkSession, path: String,
                 column: String, version: Long = -1L,
                 stringOrdered: Boolean = false)
      : Option[(String, String)] = {
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed versions at $path")
    val v = if (version >= 0) version else vs.last
    require(vs.contains(v), s"version $v of $path does not exist")
    metaMinMaxOfLines(readManifest(fs, p, v)._2, column, stringOrdered)
  }

  private[graft] def metaMinMaxOfLines(lines: Seq[String], column: String,
                                       stringOrdered: Boolean)
      : Option[(String, String)] = {
    // per live file: None = provably no values (all-null; skip),
    // Some((min, max)) otherwise — bail the moment a file can't prove
    // exact extremes under the declared ordering
    val contrib = lines.map { l =>
      val pstats = partitionStats(pathOf(l))
      val fromPath = pstats.get(column)
      fromPath.orElse(statsOf(l).get(column)) match {
        case Some(c) if c.allNull => Some(None)
        case Some(c) if stringOrdered && fromPath.isDefined =>
          Some(Some((c.min, c.max)))
        case Some(c) if !stringOrdered && c.tag == "n" =>
          Some(Some((c.min, c.max)))
        case _ => None
      }
    }
    if (contrib.exists(_.isEmpty)) return None
    val vals = contrib.flatten.flatten
    if (vals.isEmpty) return None
    val cmp: (String, String) => Int =
      if (stringOrdered) utf8Cmp
      else (a, b) => BigDecimal(a).compare(BigDecimal(b))
    Some((vals.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
      vals.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)))
  }

  /** The head (or `v`) snapshot's manifest lines grouped by partition
    * directory, with each group's partition values parsed from its
    * `k=v` path segments (`None` = the hive null partition). The
    * backing for PARTITION-GROUPED metadata aggregates: declines
    * (None) when the table declares no partition columns, or any live
    * file's path does not carry exactly the declared columns (mixed
    * or legacy layouts) — the scan path owns those.
    */
  private[graft] def metaPartitionLines(spark: SparkSession, path: String,
                                        v: Long)
      : Option[Seq[(Map[String, Option[String]], Seq[String])]] = {
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    if (!vs.contains(v)) return None
    val partCols = declaredPartitionColsAt(fs, p, v).getOrElse(Nil)
    if (partCols.isEmpty) return None
    val lines = readManifest(fs, p, v)._2
    val grouped = lines.groupBy(l => partitionDirOf(pathOf(l))).toSeq
    val parsed = grouped.map { case (dir, ls) =>
      val segs = dir.split('/').filter(_.contains('=')).map { seg =>
        val i = seg.indexOf('=')
        val raw = seg.substring(i + 1)
        seg.substring(0, i) ->
          (if (raw == "__HIVE_DEFAULT_PARTITION__") None
           else Some(unescapePartition(raw)))
      }.toMap
      if (segs.keySet == partCols.toSet) Some((segs, ls)) else None
    }
    if (parsed.exists(_.isEmpty)) None else Some(parsed.flatten)
  }

  /** Absolute paths of a commit's row-level change-data parquet files
    * (the `cdf=<uuid>` payload) — the file-list surface the streaming
    * change feed ([[graft.sources.GraftCdfMicroBatchStream]]) scans.
    */
  private[graft] def changeDataFiles(spark: SparkSession, path: String,
                                     uuid: String): Seq[String] = {
    val (fs, p) = fsFor(spark, path)
    fs.listStatus(new Path(p, s"$ChangesDir/$uuid")).toSeq
      .map(_.getPath)
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.toString).sorted
  }

  /** Scan an explicit manifest-relative file list as one DataFrame.
    *
    * Partition discovery walks each file's parents collecting
    * key=value dirs and requires every file to resolve the SAME
    * non-partition base — but a snapshot built by append/replace
    * holds files from several immutable commit dirs
    * (data/<uuidA>/day=10, data/<uuidB>/day=40), whose bases differ.
    * So: scan per commit dir (each is internally consistent:
    * key=value parents under one uuid base) and union the scans.
    * The union is N = live-commit-dirs branches — bounded by commits
    * since the last overwrite, vacuum resets it — and filters/pruning
    * push into every branch.
    */
  private def scanFiles(spark: SparkSession, p: Path, files: Seq[String],
                        mergeSchema: Boolean,
                        schema: Option[StructType]): DataFrame = {
    def scan(group: Seq[String]): DataFrame = {
      val r = spark.read.option("mergeSchema", mergeSchema.toString)
        .option("basePath", p.toString)
      schema.fold(r)(r.schema)
        .parquet(group.map(f => new Path(p, f).toString): _*)
    }
    val out = files.groupBy(_.split('/').take(2).mkString("/")).toSeq
      .sortBy(_._1).map(g => scan(g._2))
      // mergeSchema also widens ACROSS commit dirs (append may have
      // added columns); without it a heterogeneous union fails loudly
      .reduce(_.unionByName(_, allowMissingColumns = mergeSchema))
    // the file source surfaces hive-partition columns LAST regardless
    // of the pinned schema's order — project back to the declared order
    // so pinned reads are column-order-stable (and empty-snapshot reads,
    // built straight from the schema, agree with non-empty ones)
    schema.fold(out)(s =>
      out.select(s.fieldNames.toIndexedSeq.map(
        org.apache.spark.sql.functions.col): _*))
  }

  /** Manifest-relative data files added and removed between two
    * committed versions: `(added, removed)` where `added` is in
    * `toV`'s snapshot but not `fromV`'s and `removed` the reverse.
    * Pure log arithmetic — no data I/O; cost is two manifest reads
    * regardless of table size. Data files are immutable and
    * content-addressed by commit uuid, so path set-difference IS the
    * change set (a file is never rewritten in place).
    */
  def changedFiles(spark: SparkSession, path: String,
                   fromV: Long, toV: Long): (Seq[String], Seq[String]) = {
    val (fs, p) = fsFor(spark, path)
    val from = readManifest(fs, p, fromV)._2.map(pathOf).toSet
    val to = readManifest(fs, p, toV)._2.map(pathOf).toSet
    ((to -- from).toSeq.sorted, (from -- to).toSeq.sorted)
  }

  /** Incremental read: exactly the rows in files ADDED between `fromV`
    * (exclusive) and `toV` (inclusive; defaults to the head). This is
    * the consume-the-delta primitive for incremental pipelines — at
    * 100 TB the difference between re-scanning the lake and scanning
    * one day's commits. I/O is proportional to the appended data, not
    * the table; a consumer that remembers the last version it processed
    * gets at-least-once incremental processing with no full rescans.
    *
    * For append-only tables this is complete CDC. Commits that also
    * remove files (overwrite / replacePartitions / compact) surface
    * their rewritten rows as additions — pair with [[readChanges]] when
    * the removed side matters. `fromV = 0` reads the full head snapshot
    * (every live file is "added since before version 1").
    */
  def readAppended(spark: SparkSession, path: String, fromV: Long,
                   toV: Long = -1L,
                   mergeSchema: Boolean = false,
                   schema: Option[StructType] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val hi = if (toV < 0) vs.last else toV
    val (fs, p) = fsFor(spark, path)
    val base =
      if (fromV <= 0) Set.empty[String]
      else readManifest(fs, p, fromV)._2.map(pathOf).toSet
    val snapshot = readManifest(fs, p, hi)._2.map(pathOf)
    val pinned = schema.orElse(declaredSchemaAt(fs, p, hi))
    val added = snapshot.filterNot(base)
    if (added.nonEmpty) scanFiles(spark, p, added, mergeSchema, pinned)
    else if (snapshot.nonEmpty) // no new files: empty frame, snapshot schema
      scanFiles(spark, p, snapshot, mergeSchema, pinned).where(lit(false))
    else pinned match { // empty snapshot: no footer anywhere to infer from
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None => sys.error(
        s"version $hi of $path is an empty snapshot with no files — " +
        "pass an explicit schema to read it as an empty frame")
    }
  }

  /** Change-data-capture frame over the commits in `(fromV, toV]`, one
    * tagged row set PER COMMIT, stamped [[CommitVersionCol]] /
    * [[CommitTimestampCol]] — Delta's `table_changes`. Per commit:
    *
    *  - DML commits (MERGE / UPDATE / DELETE) carry ROW-LEVEL change
    *    data (`cdf=<uuid>` meta, see [[ChangeDataMetaKey]]): exactly
    *    the changed rows, tagged insert / update_preimage /
    *    update_postimage / delete. Rows the rewrite merely CARRIED
    *    (copy-on-write copies whole files) do NOT appear — an
    *    incremental consumer downstream of row-level DML stays
    *    exactly-once with no spurious re-ingest.
    *  - Layout commits (OPTIMIZE / compact) are `cdf=0`: data-identical
    *    by construction, zero change rows.
    *  - Everything else (append, overwrite, restore, replace,
    *    pre-CDF history) falls back to file-granular capture: rows of
    *    files added since the previous version tagged "insert", rows
    *    of removed files "delete" — the old contract, still correct,
    *    just coarser.
    *
    * I/O is proportional to the CHANGED rows/files only, never a
    * snapshot rescan. `fromV` must be 0 or a retained version (the
    * fallback diffs against it — vacuumed history fails loudly rather
    * than silently replaying a snapshot).
    */
  def readChanges(spark: SparkSession, path: String, fromV: Long,
                  toV: Long = -1L,
                  mergeSchema: Boolean = false,
                  schema: Option[StructType] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val hi = if (toV < 0) vs.last else toV
    // every version in (fromV, hi] must be retained — a vacuumed gap
    // would silently skip its changes (fromV itself is only needed by
    // the file-granular fallback, checked lazily below: a row-level
    // DML commit carries its own change data and doesn't need it)
    require(fromV == 0 || fromV + 1 >= vs.head,
      s"changes in ($fromV, ${vs.head - 1}] of $path were vacuumed — " +
      "incremental change reads cannot resume from it")
    val (fs, p) = fsFor(spark, path)
    val range = vs.filter(v => v > fromV && v <= hi)
    def stamped(df: DataFrame, v: Long, tsMs: Long): DataFrame =
      df.withColumn(CommitVersionCol, lit(v))
        .withColumn(CommitTimestampCol, lit(new java.sql.Timestamp(tsMs)))
    val frames = range.flatMap { v =>
      // ONE manifest read per version: the ts stamp comes from the
      // meta already in hand, not a second commitTimestamp read
      val meta = parseMeta(readManifest(fs, p, v)._1)
      val tsMs = commitTimestampOf(fs, p, v, meta)
      meta.get(ChangeDataMetaKey) match {
        case Some("0") => None // row-change-free commit
        case Some(uuid) =>
          Some(stamped(spark.read.parquet(
            new Path(p, s"$ChangesDir/$uuid").toString), v, tsMs))
        case None =>
          // v-1 vacuumed (v is the earliest retained version): under a
          // full-history read (fromV=0) the cumulative snapshot IS the
          // insert set — exact. A mid-history consumer has no baseline
          // to diff against: fail loudly, never double-ingest.
          val prev =
            if (v - 1 <= 0) Set.empty[String]
            else if (!vs.contains(v - 1)) {
              if (fromV == 0) Set.empty[String]
              else sys.error(
                s"version ${v - 1} of $path was vacuumed — file-granular " +
                s"change capture for v$v has no baseline to diff against")
            }
            else readManifest(fs, p, v - 1)._2.map(pathOf).toSet
          val cur = readManifest(fs, p, v)._2.map(pathOf)
          val added = cur.filterNot(prev)
          val removed = (prev -- cur.toSet).toSeq.sorted
          val pinned = schema.orElse(declaredSchemaAt(fs, p, v))
          def tagged(files: Seq[String], tag: String): Option[DataFrame] =
            if (files.isEmpty) None
            else Some(scanFiles(spark, p, files, mergeSchema, pinned)
              .withColumn(ChangeTypeCol, lit(tag)))
          (tagged(added, "insert") ++ tagged(removed, "delete"))
            .reduceOption(_.unionByName(_,
              allowMissingColumns = mergeSchema))
            .map(stamped(_, v, tsMs))
      }
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = mergeSchema))
      .getOrElse(stamped(
        readVersion(spark, path, hi, mergeSchema, schema)
          .withColumn(ChangeTypeCol, lit("insert")), hi,
        commitTimestamp(spark, path, hi)).where(lit(false)))
  }

  /** Row-level DELETE, copy-on-write: rewrite ONLY the files whose
    * manifest stats say they may hold matching rows; every other file
    * carries over untouched — same bytes, same manifest line, stats
    * included. SQL semantics: rows where the predicate is TRUE are
    * removed; FALSE and NULL rows survive. Commits one atomic
    * "replace" version; readers pinned to earlier versions still see
    * the deleted rows until [[vacuum]] (that is the time-travel
    * contract, and what makes this GDPR-complete only after a vacuum).
    *
    * At 100 TB this is the difference between a delete rewriting the
    * lake and rewriting the handful of files a needle predicate can
    * touch — the same pruning as [[readWhere]], applied to the WRITE
    * side. A predicate stats can't reason about degrades to a full
    * rewrite, never to a wrong result. Returns the committed version,
    * or None when no file could match (no commit at all).
    *
    * Concurrency: the rewrite is analyzed against the head snapshot at
    * call time; files appended by writers racing this delete are kept
    * verbatim (their rows are NOT filtered) — same last-writer
    * semantics as [[overwrite]].
    *
    * `changeFeed = false` skips the row-level change capture (one
    * bounded job saved); [[readChanges]] then falls back to
    * file-granular capture for this commit — honest coarseness, never
    * a false "no changes" claim. Same switch on [[update]], [[merge]],
    * [[applyChanges]].
    *
    * `meta`/`guard` — carried-meta updates and [[append]]-style
    * sequence preconditions riding IN the delete commit itself: an
    * engine component whose carried stats must stay consistent with
    * the row set (the BM25 index's N/Σ|d|) folds the stats transition
    * into the delete so readers never observe rows and stats from
    * different states. When pruning finds no candidate file, nothing
    * commits and `meta` is NOT applied (the caller's stats are still
    * exact, since no row changed).
    */
  def delete(spark: SparkSession, path: String,
             predicate: org.apache.spark.sql.Column,
             partitionCols: Seq[String] = Nil,
             mergeSchema: Boolean = false,
             schema: Option[StructType] = None,
             changeFeed: Boolean = true,
             meta: Map[String, String] = Map.empty,
             guard: Map[String, Long] = Map.empty): Option[Long] =
    rewriteMatching(spark, path, predicate, partitionCols, mergeSchema,
      schema, changeFeed, meta, guard)(
      rewrite = { (candidateRows, pred) =>
        // keep rows where the predicate is FALSE or NULL (SQL DELETE)
        candidateRows.where(not(coalesce(pred, lit(false))))
      },
      changesOf = { (candidateRows, pred) =>
        candidateRows.where(coalesce(pred, lit(false)))
          .withColumn(ChangeTypeCol, lit("delete"))
      })

  /** Row-level UPDATE, copy-on-write: in files that may hold matching
    * rows (stats-pruned like [[delete]]), each `set` column becomes
    * `CASE WHEN predicate THEN expr ELSE old END`; untouched files
    * carry over verbatim. NULL-predicate rows are not updated (SQL
    * semantics). Returns the committed version, or None when no file
    * could match.
    */
  def update(spark: SparkSession, path: String,
             predicate: org.apache.spark.sql.Column,
             set: Map[String, org.apache.spark.sql.Column],
             partitionCols: Seq[String] = Nil,
             mergeSchema: Boolean = false,
             schema: Option[StructType] = None,
             changeFeed: Boolean = true): Option[Long] = {
    require(set.nonEmpty, "update needs at least one SET column")
    // SET keys validated UP FRONT against the table schema — the
    // per-column projection below silently keeps the old value for a
    // key that matches no column, so a typo'd SET would otherwise
    // no-op (or, when pruning removes every file, skip the rewrite's
    // own check entirely) and the caller would believe the row changed
    val tableCols = schema.map(_.fieldNames.toSeq)
      .orElse(declaredSchema(spark, path).map(_.fieldNames.toSeq))
      .getOrElse(read(spark, path, mergeSchema).columns.toSeq)
    val unknownSet = set.keySet -- tableCols
    require(unknownSet.isEmpty,
      s"SET columns not in the table: ${unknownSet.mkString(", ")}")
    // the post-image projection: `set` applied unconditionally (callers
    // gate on the predicate) — one simultaneous select so every SET
    // expression reads the PRE-update row (SQL UPDATE semantics; a
    // sequential fold would let SET a = b, b = a read the updated a)
    def applySet(rows: DataFrame): DataFrame =
      rows.select(rows.columns.map { name =>
        set.get(name).map(_.as(name))
          .getOrElse(org.apache.spark.sql.functions.col(name))
      }.toIndexedSeq: _*)
    rewriteMatching(spark, path, predicate, partitionCols, mergeSchema,
      schema, changeFeed)(
      rewrite = { (candidateRows, pred) =>
        val unknown = set.keySet -- candidateRows.columns
        require(unknown.isEmpty,
          s"SET columns not in the table: ${unknown.mkString(", ")}")
        candidateRows.select(candidateRows.columns.map { name =>
          set.get(name) match {
            case Some(expr) =>
              org.apache.spark.sql.functions.when(coalesce(pred, lit(false)), expr)
                .otherwise(org.apache.spark.sql.functions.col(name)).as(name)
            case None => org.apache.spark.sql.functions.col(name)
          }
        }.toIndexedSeq: _*)
      },
      changesOf = { (candidateRows, pred) =>
        val matched = candidateRows.where(coalesce(pred, lit(false)))
        matched.withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(applySet(matched)
            .withColumn(ChangeTypeCol, lit("update_postimage")))
      })
  }

  /** Shared copy-on-write core of [[delete]]/[[update]]: stats-prune
    * the head snapshot's files against `predicate`, hand the candidate
    * rows (and the predicate) to `rewrite`, and commit its result plus
    * the untouched files as one atomic replace version. `changesOf`
    * produces the commit's row-level change feed (see
    * [[ChangeDataMetaKey]]) — one extra bounded job over the candidate
    * files only, written before the claim so the winning manifest
    * atomically references it.
    */
  private def rewriteMatching(spark: SparkSession, path: String,
                              predicate: org.apache.spark.sql.Column,
                              partitionCols: Seq[String],
                              mergeSchema: Boolean,
                              schema: Option[StructType],
                              changeFeed: Boolean = true,
                              meta: Map[String, String] = Map.empty,
                              guard: Map[String, Long] = Map.empty)
                             (rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame,
                              changesOf: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Option[Long] = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    if (lines.isEmpty) return None
    val pinned = schema.orElse(declaredSchemaAt(fs, p, vs.last))
    val layout = layoutOrDeclared(fs, p, vs.last, partitionCols)
    val cs = resolveConjuncts(spark, p, lines, predicate, mergeSchema, pinned)
    // footer stats + partition-path pseudo-stats: a DELETE/UPDATE whose
    // predicate names a partition column rewrites only that partition's
    // files — pruned from the manifest alone, same as readWhere
    val (candidates, _) = lines.partition { l =>
      val st = statsOf(l) ++ partitionStats(pathOf(l))
      cs.forall(c => mayMatch(st, c) && bloomMayMatch(st, c))
    }
    if (candidates.isEmpty) return None
    // drop exactly the files being rewritten; everything else survives —
    // including files a RACING writer appends between this analysis and
    // the slot claim (the commit retry re-reads the new head, and a
    // keep-only-the-analyzed-set filter would silently drop them)
    val candidatePaths = candidates.map(pathOf).toSet
    val candidateRows =
      scanFiles(spark, p, candidates.map(pathOf), mergeSchema, pinned)
    // build the rewrite plan FIRST: its eager validations (unknown SET
    // columns, …) must fail before any change file hits disk
    val rewritten = rewrite(candidateRows, predicate)
    // changeFeed=false skips the capture job AND the meta token, so
    // readers fall back to file-granular capture (honest coarseness,
    // never a false "no changes" claim)
    val cdfMeta =
      if (changeFeed) writeChangeData(fs, p, changesOf(candidateRows, predicate))
      else Map.empty[String, String]
    // a rewrite that empties every candidate while NON-candidate files
    // survive needs no schema-carrier part: the snapshot keeps real
    // files (a racing delete of those survivors would leave a
    // file-less snapshot — the metadata-only-commit situation
    // readVersion already handles via a pinned/declared schema)
    val survivorsExist = lines.exists(l => !candidatePaths.contains(pathOf(l)))
    Some(commit(spark, path, rewritten, "replace",
      (base, _) => base.filterNot(l => candidatePaths.contains(pathOf(l))),
      layout, meta = cdfMeta ++ meta, requirePresent = candidatePaths,
      guard = guard, allowZeroParts = survivorsExist))
  }

  /** Keyed MERGE (upsert), copy-on-write: rows of `updates` replace
    * existing rows with equal key tuples and insert otherwise —
    * `whenMatched update-all / whenNotMatched insert-all`, the Delta
    * MERGE fast path. Null keys never match (SQL equality): null-key
    * update rows insert, null-key existing rows survive.
    *
    * The rewrite set is bounded the same way as [[delete]]: a file can
    * hold a matching row only if EVERY key column's [min,max] window
    * intersects the updates' observed bounds (one small agg over the
    * update side), so a merge touching one day's keys rewrites one
    * day's files, not the table. Untouched files carry over verbatim,
    * matched candidates are anti-joined against the update keys and
    * re-written together with the updates in one atomic "replace"
    * commit. Update schema must match the table's (modulo
    * `mergeSchema` widening).
    *
    * `updates` is MATERIALIZED once (localCheckpoint) before use: its
    * plan is consumed three times (bounds agg, anti-join, union), and a
    * nondeterministic source re-evaluated per pass could yield keys
    * outside the observed bounds — leaving matched old rows alive in
    * pruned files. An empty update set is a no-op (no commit): without
    * observable bounds every file would be a rewrite candidate, and
    * "merge nothing" must not rewrite the table.
    *
    * `nullSafeKeys = true` switches key matching to null-safe equality
    * (`<=>`): existing null-key rows ARE replaced by null-key update
    * rows — what an aggregate-view maintainer needs (a null group is a
    * group). Since stats say nothing about null presence, any null key
    * in `updates` then disables file pruning for safety.
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            keyCols: Seq[String],
            partitionCols: Seq[String] = Nil,
            mergeSchema: Boolean = false,
            schema: Option[StructType] = None,
            meta: Map[String, String] = Map.empty,
            nullSafeKeys: Boolean = false,
            guard: Map[String, Long] = Map.empty,
            changeFeed: Boolean = true,
            checkUniqueKeys: Boolean = true): Long = {
    import org.apache.spark.sql.functions.{col, max, min}
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val pinned = schema.orElse(declaredSchemaAt(fs, p, vs.last))
    val layout = layoutOrDeclared(fs, p, vs.last, partitionCols)
    val u = updates.localCheckpoint()
    // key bounds + null-key flags layout shared by both probe shapes
    val boundAggs = keyCols.flatMap(k => Seq(min(col(k)), max(col(k)))) ++
      keyCols.map(k => max(col(k).isNull.cast("int")))
    // With checkUniqueKeys (the default): ONE aggregate over the
    // GROUPED update keys yields duplicate-key detection, emptiness,
    // key bounds, and null-key flags together — duplicate update keys
    // would land several rows per key in a table whose whole contract
    // is one-row-per-key convergence, so reject like mergeInto does
    // instead of silently corrupting the keyed table. A caller whose
    // updates are key-unique BY CONSTRUCTION (a groupBy's output, a
    // topOnePerGroup winner set) passes false and keeps the cheaper
    // map-side global agg — the grouped probe pays one extra exchange,
    // which matters on merge-per-microbatch hot paths.
    val (uIsEmpty, row) =
      if (checkUniqueKeys) {
        val cnt = graft.util.Cols.fresh(u, "__cnt")
        val g = u.groupBy(keyCols.map(col): _*)
          .agg(org.apache.spark.sql.functions.count(lit(1)).as(cnt))
        val aggs = boundAggs ++
          Seq(max(col(cnt)), org.apache.spark.sql.functions.sum(col(cnt)))
        val r = g.agg(aggs.head, aggs.tail: _*).head()
        val empty = r.isNullAt(aggs.size - 1)
        // the offending key is looked up only on the failure path
        if (!empty && r.getLong(aggs.size - 2) > 1) {
          val dupKey = g.where(col(cnt) > 1).limit(1).collect()
          throw new IllegalArgumentException(
            s"merge updates have duplicate key ${dupKey.headOption}" +
            " — aggregate the updates first (or pass latestBy in the" +
            " streaming sink) so exactly one row per key remains")
        }
        (empty, r)
      } else if (u.isEmpty) (true, null)
      else (false, u.agg(boundAggs.head, boundAggs.tail: _*).head())
    if (lines.isEmpty) {
      // merge into an empty table: every update row is an insert
      val cdfMeta =
        if (changeFeed) writeChangeData(fs, p,
          u.withColumn(ChangeTypeCol, lit("insert")))
        else Map.empty[String, String]
      return commit(spark, path, u, "replace", (_, _) => Seq.empty,
        layout, meta ++ cdfMeta, guard = guard)
    }
    if (uIsEmpty)
      // nothing to rewrite, but meta (e.g. a consumer offset) must
      // still land durably: a metadata-only commit — silently dropping
      // it would stall incremental consumers on empty increments. A
      // guard must be evaluated through the claim loop too, never
      // skipped: a guard-only caller is asking "did a concurrent
      // committer beat me", and a silent return would answer wrongly
      return if (meta.isEmpty && guard.isEmpty) vs.last
      else commitLines(spark, path, "append", Seq.empty,
        (base, _) => base, meta + (ChangeDataMetaKey -> "0"),
        guard = guard)

    // observed key bounds on the update side (from the same grouped
    // row); a null bound (all-null keys) disables pruning for that
    // column — conservative. Under null-safe matching a null key may
    // match rows in ANY file, so pruning is disabled entirely when one
    // is present.
    val anyNullKey =
      keyCols.indices.exists(i => row.getInt(2 * keyCols.size + i) == 1)
    val boundPreds = keyCols.zipWithIndex.flatMap { case (k, i) =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
      else Some(col(k).between(lit(row.get(2 * i)), lit(row.get(2 * i + 1))))
    }
    val cs =
      if (boundPreds.isEmpty)
        Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]
      else resolveConjuncts(spark, p, lines, boundPreds.reduce(_ && _),
        mergeSchema, pinned)
    // under null-safe matching a null update key may match rows in ANY
    // file whose key columns may hold nulls — but a file whose
    // null-count stats PROVE zero null keys can only match through the
    // non-null bounds, so it still prunes (pre-null-count manifests
    // have no counts and conservatively stay candidates)
    def mayHoldNullKey(st: Map[String, ColStats]): Boolean =
      keyCols.exists(k => st.get(k).flatMap(_.nulls).forall(_ > 0))
    val (candidates, _) = lines.partition { l =>
      lazy val st = statsOf(l) ++ partitionStats(pathOf(l))
      (cs.isEmpty || cs.forall(mayMatch(st, _))) ||
        (nullSafeKeys && anyNullKey && mayHoldNullKey(st))
    }
    // see rewriteMatching: drop exactly the rewritten files, so a racing
    // append between analysis and claim is never lost
    val candidatePaths = candidates.map(pathOf).toSet
    // change feed: matched existing rows are update_preimage, their
    // replacing update rows update_postimage, unmatched updates insert.
    // Null keys never match under plain equality (null-key updates land
    // as inserts, null-key existing rows untouched) — the semi/anti
    // joins below reproduce exactly that, and the null-safe variant
    // flips to <=> consistently with the rewrite.
    // with the change feed on, the candidate-file scan feeds TWO jobs
    // (feed write, then the rewrite) — persist it so the second pays a
    // cache read, not a parquet re-scan + re-decode (ADVICE r7)
    val existing: DataFrame =
      if (candidates.isEmpty) null
      else {
        val e = scanFiles(spark, p, candidates.map(pathOf),
          mergeSchema, pinned)
        if (changeFeed)
          e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else e
      }
    try {
      lazy val changes: DataFrame =
        if (candidates.isEmpty) u.withColumn(ChangeTypeCol, lit("insert"))
        else {
          val keys = u.select(keyCols.map(col): _*).distinct()
          val existingKeys =
            existing.select(keyCols.map(col): _*).distinct()
          def keyJoin(l: DataFrame, r: DataFrame, how: String): DataFrame =
            if (!nullSafeKeys) l.join(r.toDF(keyCols.map(k => s"__k_$k"): _*),
              keyCols.map(k => l(k) === col(s"__k_$k")).reduce(_ && _), how)
            else l.join(r.toDF(keyCols.map(k => s"__k_$k"): _*),
              keyCols.map(k => l(k) <=> col(s"__k_$k")).reduce(_ && _), how)
          keyJoin(existing, keys, "left_semi")
            .withColumn(ChangeTypeCol, lit("update_preimage"))
            .unionByName(keyJoin(u, existingKeys, "left_semi")
              .withColumn(ChangeTypeCol, lit("update_postimage")),
              allowMissingColumns = mergeSchema)
            .unionByName(keyJoin(u, existingKeys, "left_anti")
              .withColumn(ChangeTypeCol, lit("insert")),
              allowMissingColumns = mergeSchema)
        }
      val cdfMeta =
        if (changeFeed) writeChangeData(fs, p, changes)
        else Map.empty[String, String]
      val newData =
        if (candidates.isEmpty) u
        else {
          val keys = u.select(keyCols.map(col): _*).distinct()
          val joined =
            if (!nullSafeKeys) existing.join(keys, keyCols, "left_anti")
            else existing.join(keys.toDF(keyCols.map(k => s"__u_$k"): _*),
              keyCols.map(k => existing(k) <=> col(s"__u_$k")).reduce(_ && _),
              "left_anti")
          joined.unionByName(u, allowMissingColumns = mergeSchema)
        }
      commit(spark, path, newData, "replace",
        (base, _) => base.filterNot(l => candidatePaths.contains(pathOf(l))),
        layout, meta ++ cdfMeta, requirePresent = candidatePaths,
        guard = guard)
    } finally if (changeFeed && existing != null)
      existing.unpersist(blocking = false)
  }

  /** Source-column reference for [[mergeInto]] clause expressions: the
    * joined row exposes target columns under their own names and
    * source columns as `src_<name>` — `TxTable.src("x")` is sugar for
    * `col("src_x")`.
    */
  def src(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(s"src_$name")

  /** Conditional multi-clause MERGE — Delta's full
    * `WHEN MATCHED [AND cond] THEN UPDATE SET … / DELETE,
    * WHEN NOT MATCHED [AND cond] THEN INSERT` shape, against the
    * copy-on-write log. Clause semantics (per matched target row,
    * DELETE clause evaluated first, Delta's default clause order):
    *
    *  - matched ∧ `deleteWhen` → row removed;
    *  - else matched ∧ `updateWhen` → `updateSet` applied (one
    *    simultaneous projection; expressions read the PRE-update row
    *    and may reference source columns via [[src]]);
    *  - else → row carried unchanged.
    *  - source rows matching NO target key, passing `insertWhen`
    *    (evaluated over the source's own columns) → inserted. Inserts
    *    align BY NAME, so the source schema must match the table's
    *    (modulo `mergeSchema` widening) when `insertUnmatched` is on;
    *    a clause-only merge over a differently-shaped source sets
    *    `insertUnmatched = false`.
    *  - target rows whose key matches NO source row, passing
    *    `deleteBySourceWhen` (evaluated over the TARGET row alone —
    *    there is no source row to reference) → removed; else passing
    *    `updateBySourceWhen` → `updateBySourceSet` applied (values
    *    also target-only). These are Delta's `WHEN NOT MATCHED BY
    *    SOURCE THEN DELETE / UPDATE SET` — the replicate-a-snapshot
    *    and mark-stale clauses (`Some(lit(true))` hits every key
    *    absent from the source). NOTE the scale cost: a by-source
    *    clause makes EVERY file a rewrite candidate (any file may hold
    *    unmatched rows), so source-key-bounds pruning is disabled for
    *    the statement — exactly Delta's behavior, and why by-source
    *    merges belong in replication jobs, not hot upsert paths.
    *
    * Conditions evaluate over the target row joined with its matching
    * source row (source columns prefixed `src_` — no collisions by
    * construction). NULL conditions are false (SQL WHERE semantics);
    * null keys never match (plain equality), so null-key source rows
    * can only INSERT. Each source key should match at most one clause
    * application per target row; duplicate source keys are rejected
    * (Delta's multiple-matches error) because "which source row
    * updates the target" would be nondeterministic.
    *
    * Scale shape = [[merge]]: rewrite bounded by the source's key
    * bounds (stats + partition pruning), untouched files carried
    * verbatim, one atomic replace commit carrying the row-level change
    * feed (delete / update_preimage / update_postimage / insert).
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                keyCols: Seq[String],
                updateWhen: Option[org.apache.spark.sql.Column] = None,
                updateSet: Map[String, org.apache.spark.sql.Column] = Map.empty,
                deleteWhen: Option[org.apache.spark.sql.Column] = None,
                insertWhen: Option[org.apache.spark.sql.Column] = None,
                insertUnmatched: Boolean = true,
                deleteBySourceWhen: Option[org.apache.spark.sql.Column] = None,
                updateBySourceWhen: Option[org.apache.spark.sql.Column] = None,
                updateBySourceSet: Map[String, org.apache.spark.sql.Column] =
                  Map.empty,
                partitionCols: Seq[String] = Nil,
                mergeSchema: Boolean = false,
                schema: Option[StructType] = None,
                meta: Map[String, String] = Map.empty,
                guard: Map[String, Long] = Map.empty,
                changeFeed: Boolean = true): Long = {
    import org.apache.spark.sql.functions.{col, lit, max, min, when}
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    require(updateWhen.isEmpty || updateSet.nonEmpty,
      "updateWhen needs a non-empty updateSet")
    // Delta's `WHEN MATCHED THEN UPDATE` with no AND-condition is an
    // UNCONDITIONAL update — an updateSet without updateWhen means
    // lit(true), never a silently ignored clause
    val updWhen =
      if (updateWhen.isEmpty && updateSet.nonEmpty) Some(lit(true))
      else updateWhen
    require(updateBySourceWhen.isEmpty || updateBySourceSet.nonEmpty,
      "updateBySourceWhen needs a non-empty updateBySourceSet")
    val updBySrcWhen =
      if (updateBySourceWhen.isEmpty && updateBySourceSet.nonEmpty)
        Some(lit(true))
      else updateBySourceWhen
    // any by-source clause disables key-bounds pruning and the
    // empty-source fast path below
    val hasBySource = deleteBySourceWhen.nonEmpty || updBySrcWhen.nonEmpty
    require(updWhen.nonEmpty || deleteWhen.nonEmpty || insertUnmatched ||
        hasBySource,
      "mergeInto with no clauses would be a no-op — give it one")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val pinned = schema.orElse(declaredSchemaAt(fs, p, vs.last))
    val layout = layoutOrDeclared(fs, p, vs.last, partitionCols)
    val s0 = source.localCheckpoint()
    // duplicate source keys would make "which row wins" arbitrary
    val dup = s0.groupBy(keyCols.map(col): _*)
      .count().where(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"mergeInto source has duplicate key ${dup.headOption}" +
      " — aggregate the source first (Delta's multiple-matches error)")
    val inserts0 =
      if (!insertUnmatched) s0.where(lit(false))
      else insertWhen.fold(s0)(s0.where(_))
    if (lines.isEmpty)
      return commit(spark, path, inserts0, "replace", (_, _) => Seq.empty,
        layout, meta ++ (if (changeFeed)
          writeChangeData(fs, p,
            inserts0.withColumn(ChangeTypeCol, lit("insert")))
        else Map.empty[String, String]), guard = guard)
    // an empty source is NOT a no-op under a by-source clause: every
    // target row is then unmatched and subject to the by-source clauses
    if (s0.isEmpty && !hasBySource)
      return if (meta.isEmpty && guard.isEmpty) vs.last
      else commitLines(spark, path, "append", Seq.empty,
        (base, _) => base, meta + (ChangeDataMetaKey -> "0"),
        guard = guard)

    // SET keys validated against the TARGET's columns up front:
    // applyClauses projects over existing.columns and silently skips a
    // key that matches no target column, so a typo'd SET (through the
    // SQL surface too) would commit a version that changed nothing
    // and report success. Checked after the bootstrap path — an empty
    // table has no target schema to validate against, and its commit
    // never runs the clauses.
    val setKeys = updateSet.keySet ++ updateBySourceSet.keySet
    if (setKeys.nonEmpty) {
      val targetCols = pinned.map(_.fieldNames.toSeq)
        .getOrElse(read(spark, path, mergeSchema).columns.toSeq)
      val unknownSet = setKeys -- targetCols
      require(unknownSet.isEmpty,
        s"mergeInto SET columns not in the target: " +
        unknownSet.mkString(", "))
    }

    // key-bounds pruning, as in merge (null source keys never match,
    // so they constrain nothing). A by-source clause DISABLES pruning:
    // any file may hold source-unmatched rows, so every file is a
    // candidate (see scaladoc) — and then the source min/max job is
    // skipped entirely, not run and discarded
    val cs =
      if (hasBySource)
        Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]
      else {
        val aggs = keyCols.flatMap(k => Seq(min(col(k)), max(col(k))))
        val row = s0.agg(aggs.head, aggs.tail: _*).head()
        val boundPreds = keyCols.zipWithIndex.flatMap { case (k, i) =>
          if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
          else Some(col(k).between(lit(row.get(2 * i)),
            lit(row.get(2 * i + 1))))
        }
        if (boundPreds.isEmpty)
          Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]
        else resolveConjuncts(spark, p, lines, boundPreds.reduce(_ && _),
          mergeSchema, pinned)
      }
    val (candidates, _) = lines.partition { l =>
      lazy val st = statsOf(l) ++ partitionStats(pathOf(l))
      cs.isEmpty || cs.forall(mayMatch(st, _))
    }
    val candidatePaths = candidates.map(pathOf).toSet
    // nothing can match and inserts are off → the whole statement is a
    // no-op (meta/guard still honored, like the empty-source path)
    if (candidates.isEmpty && !insertUnmatched)
      return if (meta.isEmpty && guard.isEmpty) vs.last
      else commitLines(spark, path, "append", Seq.empty,
        (base, _) => base, meta + (ChangeDataMetaKey -> "0"),
        guard = guard)
    // changeFeed on → the joined candidate scan feeds two jobs (feed
    // write references it three times, the rewrite once); persist the
    // scan so each pays a cache read, not a parquet re-scan (ADVICE r7)
    val existing =
      if (candidates.isEmpty) null
      else {
        val e = scanFiles(spark, p, candidates.map(pathOf),
          mergeSchema, pinned)
        if (changeFeed)
          e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else e
      }
    // the joined frame: target columns by name, source as src_<name>,
    // plus a match marker (null-safe "did a source row join here").
    // Guard the namespace: a target column that already looks like a
    // source reference (or the marker) would make clause expressions
    // silently ambiguous — refuse loudly instead
    if (existing != null) {
      val clash = existing.columns.filter(c =>
        c == "__m" || c.startsWith("src_"))
      require(clash.isEmpty,
        s"mergeInto cannot run against target columns named " +
        s"${clash.mkString(", ")} — the src_ prefix and __m are " +
        "reserved for clause-expression scoping")
    }
    val srcPrefixed = s0.toDF(s0.columns.map(c => s"src_$c"): _*)
      .withColumn("__m", lit(true))
    def joined = existing.join(srcPrefixed,
      keyCols.map(k => existing(k) === col(s"src_$k")).reduce(_ && _),
      "left")
    val matched = coalesce(col("__m"), lit(false))
    val delCond = matched &&
      coalesce(deleteWhen.getOrElse(lit(false)), lit(false))
    // by-source clauses: target rows with NO source match; conditions
    // and SET values see the target row alone (source columns are all
    // null here). Delete evaluated first, mirroring the matched side.
    val bySrcDel = !matched &&
      coalesce(deleteBySourceWhen.getOrElse(lit(false)), lit(false))
    val updCond = matched && !delCond &&
      coalesce(updWhen.getOrElse(lit(false)), lit(false))
    val bySrcUpdCond = !matched && !bySrcDel &&
      coalesce(updBySrcWhen.getOrElse(lit(false)), lit(false))
    def applyClauses(j: DataFrame): DataFrame =
      j.where(!delCond && !bySrcDel).select(existing.columns.map { name =>
        // matched-update and by-source-update branches are mutually
        // exclusive (matched vs not); CaseWhen evaluates only the
        // taken branch, so a matched SET referencing src_ columns is
        // never evaluated over a source-absent row
        val branches =
          updateSet.get(name).filter(_ => updWhen.isDefined)
            .map(e => (updCond, e)).toSeq ++
          updateBySourceSet.get(name).filter(_ => updBySrcWhen.isDefined)
            .map(e => (bySrcUpdCond, e))
        branches match {
          case Seq() => col(name)
          case (c1, e1) +: rest =>
            rest.foldLeft(when(c1, e1)) { case (acc, (c2, e2)) =>
              acc.when(c2, e2)
            }.otherwise(col(name)).as(name)
        }
      }.toIndexedSeq: _*)
    val existingKeys =
      if (candidates.isEmpty) null
      else existing.select(keyCols.map(col): _*).distinct()
        .toDF(keyCols.map(k => s"__e_$k"): _*)
    def unmatchedInserts: DataFrame =
      if (candidates.isEmpty) inserts0
      else inserts0.join(existingKeys,
        keyCols.map(k => inserts0(k) === col(s"__e_$k")).reduce(_ && _),
        "left_anti")
    val newData =
      if (candidates.isEmpty) inserts0
      else {
        val base = applyClauses(joined)
        if (!insertUnmatched) base
        else base.unionByName(unmatchedInserts,
          allowMissingColumns = mergeSchema)
      }
    val cdfMeta =
      if (!changeFeed) Map.empty[String, String]
      else {
        val changes =
          if (candidates.isEmpty)
            inserts0.withColumn(ChangeTypeCol, lit("insert"))
          else {
            val tgtCols = existing.columns.toIndexedSeq.map(col)
            val deleted = joined.where(delCond || bySrcDel)
              .select(tgtCols: _*)
              .withColumn(ChangeTypeCol, lit("delete"))
            val pre = joined.where(updCond || bySrcUpdCond)
              .select(tgtCols: _*)
              .withColumn(ChangeTypeCol, lit("update_preimage"))
            val post = applyClauses(joined.where(updCond || bySrcUpdCond))
              .withColumn(ChangeTypeCol, lit("update_postimage"))
            val core = deleted
              .unionByName(pre, allowMissingColumns = mergeSchema)
              .unionByName(post, allowMissingColumns = mergeSchema)
            if (!insertUnmatched) core
            else core.unionByName(unmatchedInserts
              .withColumn(ChangeTypeCol, lit("insert")),
              allowMissingColumns = mergeSchema)
          }
        writeChangeData(fs, p, changes)
      }
    try commit(spark, path, newData, "replace",
      (base, _) => base.filterNot(l => candidatePaths.contains(pathOf(l))),
      layout, meta ++ cdfMeta, requirePresent = candidatePaths,
      guard = guard)
    finally if (changeFeed && existing != null)
      existing.unpersist(blocking = false)
  }

  /** Apply a keyed CHANGE SET — upserts plus deletes — as ONE atomic
    * commit: rows of `upserts` replace existing rows with equal key
    * tuples (insert otherwise, exactly [[merge]]), and existing rows
    * whose keys appear in `deleteKeys` are removed — all in the same
    * copy-on-write replace version, so a crash can never land the
    * upserts without the deletes. This is the APPLY side of the change
    * feed: a follower that reduced [[readChanges]] output to final
    * per-key actions materializes them here with one commit per
    * consumed increment ([[graft.streaming.TxFollower.processChanges]]).
    *
    * The rewrite set is bounded like [[merge]]: only files whose key
    * stats intersect the observed bounds of the CHANGED keys (upserts
    * and deletes together) are rewritten; everything else carries over
    * verbatim. Null keys never match under the default SQL equality
    * (null-key upserts insert, null-key deletes are no-ops);
    * `nullSafeKeys = true` switches every key comparison to `<=>` so
    * a null key is a real key — what an aggregate-view maintainer
    * needs (a null GROUP is a group) — at the cost of disabling file
    * pruning when the change set actually carries a null key (stats
    * say nothing about null presence; same trade as [[merge]]). An
    * empty change set commits metadata only (offset advance),
    * honoring `guard` — same contract as [[merge]]'s
    * empty-update path.
    */
  def applyChanges(spark: SparkSession, path: String, upserts: DataFrame,
                   deleteKeys: DataFrame, keyCols: Seq[String],
                   partitionCols: Seq[String] = Nil,
                   mergeSchema: Boolean = false,
                   schema: Option[StructType] = None,
                   meta: Map[String, String] = Map.empty,
                   guard: Map[String, Long] = Map.empty,
                   changeFeed: Boolean = true,
                   nullSafeKeys: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{col, max, min}
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val pinned = schema.orElse(declaredSchemaAt(fs, p, vs.last))
    val layout = layoutOrDeclared(fs, p, vs.last, partitionCols)
    val u = upserts.localCheckpoint()
    val dk = deleteKeys.select(keyCols.map(col): _*).distinct()
      .localCheckpoint()
    if (lines.isEmpty) {
      val cdfMeta =
        if (changeFeed) writeChangeData(fs, p,
          u.withColumn(ChangeTypeCol, lit("insert")))
        else Map.empty[String, String]
      return commit(spark, path, u, "replace", (_, _) => Seq.empty,
        layout, meta ++ cdfMeta, guard = guard)
    }
    if (u.isEmpty && dk.isEmpty)
      return if (meta.isEmpty && guard.isEmpty) vs.last
      else commitLines(spark, path, "append", Seq.empty,
        (base, _) => base, meta + (ChangeDataMetaKey -> "0"),
        guard = guard)
    // prune by the union of changed keys: a file can hold an affected
    // row only if every key column's [min,max] intersects the bounds.
    // Under null-safe keys an actual null key disables pruning: stats
    // carry no null-presence information, and a pruned file could hold
    // the null-key row this change set must replace.
    val allKeys = u.select(keyCols.map(col): _*).unionByName(dk)
    val hasNullKey = nullSafeKeys &&
      !allKeys.where(keyCols.map(k => col(k).isNull).reduce(_ || _)).isEmpty
    val aggs = keyCols.flatMap(k => Seq(min(col(k)), max(col(k))))
    val row = allKeys.agg(aggs.head, aggs.tail: _*).head()
    val boundPreds = keyCols.zipWithIndex.flatMap { case (k, i) =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
      else Some(col(k).between(lit(row.get(2 * i)), lit(row.get(2 * i + 1))))
    }
    val cs =
      if (boundPreds.isEmpty || hasNullKey)
        Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]
      else resolveConjuncts(spark, p, lines, boundPreds.reduce(_ && _),
        mergeSchema, pinned)
    val (candidates, _) = lines.partition { l =>
      lazy val st = statsOf(l) ++ partitionStats(pathOf(l))
      cs.isEmpty || cs.forall(mayMatch(st, _))
    }
    val candidatePaths = candidates.map(pathOf).toSet
    // this commit writes its OWN change feed (like merge/delete), so a
    // replica-of-a-replica consumer sees row-level changes, never the
    // rewritten files' carried-row churn. Upsert and delete key sets
    // SHOULD be disjoint (processChanges reduces to one final action
    // per key); on overlap the upsert wins in the DATA (anti-join then
    // union), so the delete-side FEED drops overlapping keys — the
    // feed must never claim a delete for a key the data kept, or a
    // downstream replica diverges (ADVICE r7).
    def keyJoin(l: DataFrame, r: DataFrame, how: String): DataFrame =
      l.join(r.toDF(keyCols.map(k => s"__c_$k"): _*),
        keyCols.map(k =>
          if (nullSafeKeys) l(k) <=> col(s"__c_$k")
          else l(k) === col(s"__c_$k")).reduce(_ && _), how)
    val (newData, changes, cached) =
      if (candidates.isEmpty)
        (u, u.withColumn(ChangeTypeCol, lit("insert")), null: DataFrame)
      else {
        val existing = scanFiles(spark, p, candidates.map(pathOf),
          mergeSchema, pinned)
        if (changeFeed)
          existing.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val uKeys = u.select(keyCols.map(col): _*).distinct()
        val existingKeys = existing.select(keyCols.map(col): _*).distinct()
        // one anti-join drops both the upserted and the deleted keys;
        // the union then re-adds the upserts' new images only
        val data = keyJoin(existing, allKeys.distinct(), "left_anti")
          .unionByName(u, allowMissingColumns = mergeSchema)
        val dkReal = keyJoin(keyJoin(dk, uKeys, "left_anti"),
          existingKeys, "left_semi")
        val ch = keyJoin(existing, uKeys, "left_semi")
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(keyJoin(existing, dkReal, "left_semi")
            .withColumn(ChangeTypeCol, lit("delete")),
            allowMissingColumns = mergeSchema)
          .unionByName(keyJoin(u, existingKeys, "left_semi")
            .withColumn(ChangeTypeCol, lit("update_postimage")),
            allowMissingColumns = mergeSchema)
          .unionByName(keyJoin(u, existingKeys, "left_anti")
            .withColumn(ChangeTypeCol, lit("insert")),
            allowMissingColumns = mergeSchema)
        (data, ch, existing)
      }
    val cdfMeta =
      if (changeFeed) writeChangeData(fs, p, changes)
      else Map.empty[String, String]
    try commit(spark, path, newData, "replace",
      (base, _) => base.filterNot(l => candidatePaths.contains(pathOf(l))),
      layout, meta ++ cdfMeta, requirePresent = candidatePaths,
      guard = guard)
    finally if (changeFeed && cached != null) cached.unpersist(blocking = false)
  }

  /** `ANALYZE TABLE`: refresh the head manifest's per-file statistics
    * WITHOUT touching any data file — recompute footer min/max (and,
    * under a declared bloom config, the bloom tokens) for every live
    * file whose manifest line is missing them, and commit the
    * enriched lines as one metadata-only "analyze" version. The two
    * backfill cases this closes:
    *
    *  - legacy/statless manifests (pre-stats history, stripped lines):
    *    metadata-only aggregates and skipping start working without a
    *    rewrite;
    *  - files written BEFORE a bloom declaration: they were
    *    conservatively kept on every point probe — after ANALYZE they
    *    prune like post-config files.
    *
    * Concurrency: `requirePresent` pins every refreshed file into the
    * claim, so a racing DML that removed one aborts this commit
    * instead of letting it resurrect dead rows. Already-complete
    * tables are a no-op (head version returned, no commit). Cost: one
    * footer read per incomplete file + (blooms only) one bounded scan
    * of those files.
    */
  def analyze(spark: SparkSession, path: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val bloomCfg = bloomConfigOf(parseMeta(readManifest(fs, p, vs.last)._1))
    def complete(l: String): Boolean = {
      val st = statsOf(l)
      val hasStats = st.exists(_._2.rows.isDefined)
      val hasBlooms = bloomCfg.forall { case (cols, _, _) =>
        cols.forall(c => st.contains(BloomStatPrefix + c))
      }
      hasStats && hasBlooms
    }
    val todo = lines.filterNot(complete)
    if (todo.isEmpty) return vs.last
    val refreshed = statsLines(spark, fs, p, path, todo.map(pathOf))
    // a FAILED recompute (a transient footer read error makes
    // footerStats yield nothing, so the refreshed line is a bare
    // path) must never replace a line that already carries partial
    // stats — that would regress existing skipping and metadata-only
    // aggregates for the file until a rewrite. Keep the original.
    val origByPath = todo.map(l => pathOf(l) -> l).toMap
    val kept = refreshed.map { l =>
      val orig = origByPath(pathOf(l))
      if (!l.contains('\t') && orig.contains('\t')) orig else l
    }
    if (kept.sorted == todo.sorted) return vs.last // nothing computable
    val todoPaths = todo.map(pathOf).toSet
    commitLines(spark, path, "analyze", kept,
      (base, _) => base.filterNot(l => todoPaths.contains(pathOf(l))),
      requirePresent = todoPaths)
  }

  /** Carried meta key declaring the table's standing CLUSTERING intent
    * (Delta liquid clustering reduced to carried meta + the z-order
    * rewrite): once set, [[optimize]] with no explicit columns — and
    * the SQL bare `OPTIMIZE graft.`t`` — re-clusters on the declared
    * columns instead of erroring / merely bin-packing.
    */
  private[graft] val ClusterMetaKey = "graft.cluster"

  /** The declared clustering columns (empty when none). */
  def clusteringColumns(spark: SparkSession, path: String): Seq[String] =
    versions(spark, path).lastOption
      .map(v => commitMeta(spark, path, v)).toSeq
      .flatMap(_.get(ClusterMetaKey)).map(dec).filter(_.nonEmpty)
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)

  /** Declare clustering columns (metadata-only commit; carried
    * forward). Data columns only — partition columns are already
    * path-separated and clustering them is a no-op the declaration
    * would dress up as progress.
    */
  def setClusteringColumns(spark: SparkSession, path: String,
                           cols: Seq[String]): Long = {
    require(cols.nonEmpty, "setClusteringColumns needs at least one column")
    require(versions(spark, path).nonEmpty,
      s"$path is not a TxTable (no $LogDir manifests)")
    val schema = read(spark, path, mergeSchema = true).schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"setClusteringColumns: no column '$c' in $path"))
    val parts = declaredPartitionCols(spark, path).getOrElse(Nil)
    require(cols.intersect(parts).isEmpty,
      s"clustering on partition columns is redundant: ${cols.intersect(parts)}")
    commitLines(spark, path, "cluster", Seq.empty, (base, _) => base,
      Map(ClusterMetaKey -> enc(cols.mkString(","))))
  }

  /** Remove the clustering declaration (tombstoned empty). */
  def dropClusteringColumns(spark: SparkSession, path: String): Long =
    commitLines(spark, path, "cluster", Seq.empty, (base, _) => base,
      Map(ClusterMetaKey -> ""))

  /** Rewrite the head snapshot Z-order-clustered on `zorderCols`
    * (Delta's `OPTIMIZE ... ZORDER BY`, as a log commit): rows with
    * nearby values across ALL the given columns land in the same files,
    * so the manifest's per-file min/max stats prune multi-column
    * predicates that a single-column sort cannot serve (see
    * [[ZOrder]]). Data-identical — only layout changes; time travel to
    * pre-optimize versions still works, and a concurrent APPEND during
    * the rewrite is kept (only the files this rewrite read are
    * replaced; a concurrent DML that removed one of them aborts the
    * optimize with the standard conflict error instead of resurrecting
    * its rows). File count targets `targetBytes` per file.
    */
  /** `where` SCOPES the rewrite (Delta's `OPTIMIZE … WHERE`): only
    * files whose stats/partition path may match the predicate are
    * re-clustered; everything else carries verbatim. The predicate is
    * a FILE-SELECTION hint, never a row filter — whole candidate files
    * are rewritten with all their rows, so even an over-approximate
    * selection stays data-identical. At 100 TB this is the difference
    * between optimizing one day's partition and re-clustering the
    * lake. A scope matching no file is a no-op (returns the head
    * version, no commit).
    */
  def optimize(spark: SparkSession, path: String, zorderCols: Seq[String],
               targetBytes: Long = 128L * 1024 * 1024,
               bitsPerCol: Int = 8,
               partitionCols: Seq[String] = Nil,
               mergeSchema: Boolean = false,
               where: Option[org.apache.spark.sql.Column] = None): Long = {
    // explicit columns win; otherwise the table's declared clustering
    // intent (CLUSTER BY) is the standing default
    val zc =
      if (zorderCols.nonEmpty) zorderCols
      else clusteringColumns(spark, path)
    require(zc.nonEmpty, "optimize needs z-order columns — pass them " +
      "explicitly or declare them with setClusteringColumns/CLUSTER BY")
    val layout =
      if (partitionCols.nonEmpty) partitionCols
      else declaredPartitionCols(spark, path).getOrElse(Nil)
    val (files, bytes) = scopedHeadFiles(spark, path, where, mergeSchema)
    if (files.isEmpty) return versions(spark, path).last
    rewriteClustered(spark, path, files, bytes, zc, targetBytes,
      bitsPerCol, layout, mergeSchema)
  }

  /** The clustered-rewrite core shared by [[optimize]] (whole/WHERE
    * scope) and [[optimizeIfFragmented]]'s fragment-only scope:
    * rewrite exactly `relFiles` (totalling `bytes`) into
    * ceil(bytes/targetBytes) files clustered on `zc` — or bin-packed
    * with no clustering when `zc` is empty (the [[compact]] layout,
    * for tables whose serve path has no range key to restore).
    */
  private def rewriteClustered(spark: SparkSession, path: String,
                               relFiles: Seq[String], bytes: Long,
                               zc: Seq[String], targetBytes: Long,
                               bitsPerCol: Int, layout: Seq[String],
                               mergeSchema: Boolean): Long = {
    val numFiles =
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    rewriteFiles(spark, path, relFiles, layout, mergeSchema,
      None) { snapshot =>
      // ONE clustering column = a plain range cluster: the 1-D
      // "z-order" is exactly a sort, it works for ANY orderable type
      // (bit interleaving needs numeric bounds — a string sort key
      // like an inverted index's token column would fail the cast),
      // and it reproduces byte-for-byte the range-sorted layout the
      // index builders (Bm25 tokenSorted, IVF idSorted) write — so
      // OPTIMIZE after fragmenting appends restores the BUILD layout,
      // not an approximation of it.
      if (zc.isEmpty) {
        if (layout.isEmpty) snapshot.repartition(numFiles)
        else snapshot.repartition(numFiles, layout.map(col): _*)
      } else if (zc.size == 1)
        snapshot.repartitionByRange(numFiles,
            (layout.map(col) :+ col(zc.head)): _*)
          .sortWithinPartitions((layout.map(col) :+ col(zc.head)): _*)
      else ZOrder.cluster(snapshot, zc, numFiles, bitsPerCol,
        leadCols = layout)
    }
  }

  /** OPTIMIZE only when the head snapshot is actually fragmented —
    * the POLICY half of the maintenance story the frag ladder prices
    * (`MAINT_FRAG_r14.json`: a 50-commit index serves 13–18× slower
    * than the single layout commit that fixes it). A `foreachBatch`
    * maintainer calls this after its append: when healthy it is one
    * manifest read (returns None — no commit, no data I/O); when
    * fragmented it runs [[optimize]] on `zorderCols` and returns the
    * new version.
    *
    * Fragmentation is the head's file count vs the count a HEALTHY
    * layout of the same bytes would have: optimize itself emits
    * `ceil(bytes / targetBytes)` files, so the trigger is
    * `files >= max(maxFiles, excessFactor * ceil(bytes/targetBytes))`
    * — an absolute threshold alone would re-run a FULL-table rewrite
    * on every micro-batch forever once the table outgrows
    * `maxFiles * targetBytes` (~8 GB at the 64-file/128 MB defaults):
    * freshly compacted it would STILL read >= maxFiles files. The
    * bytes side is manifest+FileStatus reads only, same cost class as
    * the file listing. File count is the right fragmentation measure
    * (one task setup + one footer read per file, plus manifest-prune
    * ranges that widen with every full-range fragment);
    * `excessFactor` is how many appends-worth of extra files to
    * tolerate between rewrites — amortization, not correctness.
    */
  /** The opt-in per-append maintenance policy an incremental index
    * appender threads through to [[optimizeIfFragmented]] — how a
    * `foreachBatch` maintainer keeps its table's file count bounded
    * WITHOUT the operator remembering to run OPTIMIZE (the measured
    * failure mode: 50 micro-batch appends degrade BM25/IVF serve
    * 18×/13×, `MAINT_FRAG_r14.json`). Each appender supplies its own
    * build-layout key (BM25 postings → token, IVF/SQ/PQ codes → the
    * id column), so the rewrite restores the exact layout the builder
    * writes; the policy only says WHEN. Replay-skipped batches never
    * trigger maintenance (no new fragment landed).
    */
  /** `retainVersions = Some(k)`: after each maintenance compaction
    * that actually committed, [[vacuum]] down to the newest `k`
    * manifests — the retention half of the lifecycle. Without it the
    * maintained trail's superseded fragments and pre-OPTIMIZE files
    * accumulate on disk forever (the log keeps every version
    * time-travelable); with it, disk is bounded at live-bytes +
    * `k` versions' worth of churn. Opt-in because it TRADES time
    * travel for disk: versions older than the newest `k` stop being
    * readable, so only set it when no reader pins old versions
    * (Delta's VACUUM retention contract). Vacuuming only after a
    * compaction (not every append) amortizes the file listing and is
    * when the reclaimable bytes actually appear.
    */
  case class Maintenance(maxFiles: Int = 64,
                         targetBytes: Long = 128L * 1024 * 1024,
                         excessFactor: Double = 2.0,
                         retainVersions: Option[Int] = None)

  /** Run `maintain`'s threshold check (and possibly one OPTIMIZE
    * commit, then the retention vacuum) for a table whose healthy
    * layout clusters on `layoutCols` — the one-line hook every
    * appender places after its landed append.
    *
    * A LOST MAINTENANCE RACE IS SUCCESS: when the compaction half
    * aborts with the standard conflict error (a concurrent committer
    * — another maintained appender's OPTIMIZE, a manual compaction, a
    * DML — moved the head first), the append this hook rides on has
    * ALREADY landed and the policy's goal (a bounded file count) was
    * just advanced by whoever won, so the conflict is swallowed
    * rather than failing a micro-batch whose data is durable. (The
    * failure mode this removes: two maintained appenders on one index
    * crossing the threshold in the same window — one compacts, the
    * other's replace aborts, and without the catch a checkpoint
    * retries a batch that needs no retry.) The EXPLICIT
    * [[optimizeIfFragmented]] API keeps the error: a caller invoking
    * maintenance by hand wants to know it lost.
    */
  private[graft] def maintainAfterAppend(spark: SparkSession, path: String,
                                         layoutCols: Seq[String],
                                         maintain: Option[Maintenance])
      : Unit =
    maintain.foreach { m =>
      val compacted =
        try optimizeIfFragmented(spark, path, layoutCols,
          maxFiles = m.maxFiles, targetBytes = m.targetBytes,
          excessFactor = m.excessFactor)
        catch {
          case _: java.util.ConcurrentModificationException => None
        }
      compacted.foreach(_ => m.retainVersions.foreach(k =>
        vacuum(spark, path, keepVersions = k)))
    }

  /** Rewrite scope selection: when the threshold trips, compact ONLY
    * the fragment files (those under `targetBytes / 2` — optimize's
    * own output lands near `targetBytes`, so a healthy file can never
    * re-qualify) whenever that suffices to bring the head back under
    * the threshold, and keep every already-healthy file byte- and
    * path-identical. The triggering micro-batch then pays O(trail),
    * not O(table) — at 100 TB the difference between a seconds-long
    * hiccup and an hours-long stream stall on whichever batch crosses
    * the line. Fragment-only output files cluster on `zorderCols` like
    * a full OPTIMIZE but cover the whole key range of their trail, so
    * healthy-but-overlapping files accumulate across partial passes;
    * the escalation below bounds that: when even a fragment-only pass
    * would leave `>= threshold` files (the overlap debt has piled up),
    * the FULL rewrite runs and restores the tight build layout. Every
    * maintenance pass therefore ends `< threshold` files, same serve
    * bound as before, while full rewrites amortize to once per
    * ~`healthy` partial passes instead of every threshold crossing.
    *
    * Empty `zorderCols` (after the declared-clustering fallback) is
    * the no-range-key table — a grain-less global sketch, a keyless
    * event log: maintenance bin-packs ([[compact]] semantics) instead
    * of erroring, because bounding the file count never needed a sort
    * key. An empty head returns None (nothing to maintain — reachable
    * when a maintained appender lands an empty batch on an empty
    * table).
    */
  def optimizeIfFragmented(spark: SparkSession, path: String,
                           zorderCols: Seq[String], maxFiles: Int = 64,
                           targetBytes: Long = 128L * 1024 * 1024,
                           partitionCols: Seq[String] = Nil,
                           mergeSchema: Boolean = false,
                           excessFactor: Double = 2.0): Option[Long] = {
    require(maxFiles > 0, "maxFiles must be positive")
    require(excessFactor >= 1.0,
      "excessFactor < 1 would re-optimize a freshly optimized table")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val sized = readManifest(fs, p, vs.last)._2.map(pathOf)
      .map(f => (f, fs.getFileStatus(new Path(p, f)).getLen))
    if (sized.isEmpty) return None
    val bytes = sized.map(_._2).sum
    val healthy =
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val threshold =
      math.max(maxFiles.toLong, math.ceil(excessFactor * healthy).toLong)
    if (sized.size < threshold) return None
    val zc =
      if (zorderCols.nonEmpty) zorderCols
      else clusteringColumns(spark, path)
    val layout =
      if (partitionCols.nonEmpty) partitionCols
      else declaredPartitionCols(spark, path).getOrElse(Nil)
    val frags = sized.filter(_._2 < targetBytes / 2)
    val fragBytes = frags.map(_._2).sum
    val projected = (sized.size - frags.size) +
      math.max(1, math.ceil(fragBytes.toDouble / targetBytes).toInt)
    if (frags.nonEmpty && projected < threshold)
      Some(rewriteClustered(spark, path, frags.map(_._1), fragBytes,
        zc, targetBytes, bitsPerCol = 8, layout, mergeSchema))
    else
      Some(rewriteClustered(spark, path, sized.map(_._1), bytes,
        zc, targetBytes, bitsPerCol = 8, layout, mergeSchema))
  }

  /** Commit pre-written data files as one streaming micro-batch append
    * — the driver half of the native `writeStream.format("graft")`
    * sink ([[graft.streaming.GraftStreamingWrite]]): executors have
    * already written `relFiles` (paths relative to the table root);
    * this claims them in one manifest carrying the
    * `txn.<app> = epochId` idempotence token. Returns None iff a
    * manifest already records `>= epochId` for this app — the replayed
    * epoch is already durable and the caller should discard its
    * re-written files. The check-then-commit race is closed by the
    * claim-loop `guard` (a concurrent same-app committer aborts), so
    * at most one attempt of an epoch ever lands.
    */
  private[graft] def commitStreamingFiles(spark: SparkSession, path: String,
                                          relFiles: Seq[String],
                                          txnApp: String,
                                          epochId: Long,
                                          partitionCols: Seq[String] = Nil)
      : Option[Long] = {
    val (fs, p) = fsFor(spark, path)
    val key = CarriedMetaPrefixes.head + txnApp
    val already = versions(spark, path).lastOption.exists(v =>
      parseMeta(readManifest(fs, p, v)._1).get(key)
        .flatMap(s => scala.util.Try(s.toLong).toOption).exists(_ >= epochId))
    if (already) None
    else {
      // same CHECK enforcement as batch commits; the micro-batch's
      // files belong to the stream's epoch dir, which the sink owns —
      // don't delete on failure, just refuse the commit (the thrown
      // error fails the batch and the checkpoint retries)
      val activeConstraints = headConstraints(spark, path)
      enforceConstraints(spark, path, fs, p, relFiles, None,
        activeConstraints)
      val newLines = statsLines(spark, fs, p, path, relFiles)
      val layoutMeta =
        if (partitionCols.isEmpty) Map.empty[String, String]
        else Map(PartitionsMetaKey -> enc(partitionCols.mkString(",")))
      try Some(commitLines(spark, path, "append", newLines,
        (base, _) => base,
        meta = layoutMeta + (key -> epochId.toString),
        guard = Map(key -> epochId),
        requireConstraints = Some(constraintFingerprint(activeConstraints))))
      catch {
        case cme: java.util.ConcurrentModificationException =>
          // a CME here is EITHER the claim-loop txn guard (a racing
          // same-app committer landed this epoch first — a replay,
          // discard ours) OR an unrelated conflict (the constraint
          // set changed under us). Only the first maps to None:
          // the caller deletes the epoch's data files on None, so
          // answering None to a constraint-fingerprint CME would
          // silently DROP the micro-batch. Re-check durability and
          // rethrow anything that isn't actually a replay — the
          // thrown error fails the batch and the checkpoint retries.
          val durable = versions(spark, path).lastOption.exists(v =>
            parseMeta(readManifest(fs, p, v)._1).get(key)
              .flatMap(s => scala.util.Try(s.toLong).toOption)
              .exists(_ >= epochId))
          if (durable) None else throw cme
      }
    }
  }

  /** Bin-pack compaction: rewrite the head snapshot into
    * ceil(bytes/targetBytes) files with NO re-clustering — the cheap
    * small-file fix for streaming-ingested tables (every micro-batch
    * commit adds files; a thousand 100 KB files make every scan pay a
    * thousand task setups). Data-identical, one atomic "replace"
    * commit, racing appends kept — same contract as [[optimize]] minus
    * the z-order shuffle's sort.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              partitionCols: Seq[String] = Nil,
              mergeSchema: Boolean = false,
              where: Option[org.apache.spark.sql.Column] = None): Long = {
    val layout =
      if (partitionCols.nonEmpty) partitionCols
      else declaredPartitionCols(spark, path).getOrElse(Nil)
    val (files, bytes) = scopedHeadFiles(spark, path, where, mergeSchema)
    if (files.isEmpty) return versions(spark, path).last
    // zc = Nil → rewriteClustered's bin-pack branch; when partitioned
    // it distributes BY the partition columns so each task holds whole
    // partitions — the per-dir writer then emits ~one file per
    // partition instead of (tasks × partitions) shards
    rewriteClustered(spark, path, files, bytes, Nil, targetBytes,
      bitsPerCol = 8, layout, mergeSchema)
  }

  /** The head snapshot's manifest-relative files that may match
    * `where` (all of them when None), plus their total bytes — the
    * scope-selection half of [[compact]]/[[optimize]]'s `WHERE`
    * support. Pure driver metadata: stats + partition-path pruning,
    * one `getFileStatus` per kept file.
    */
  private def scopedHeadFiles(spark: SparkSession, path: String,
                              where: Option[org.apache.spark.sql.Column],
                              mergeSchema: Boolean): (Seq[String], Long) = {
    val kept = headFilesMatching(spark, path, where, mergeSchema)
    val (fs, p) = fsFor(spark, path)
    val bytes = kept.map(f =>
      fs.getFileStatus(new Path(p, f)).getLen).sum
    (kept, bytes)
  }

  /** The head snapshot's manifest-relative files that may hold rows
    * matching `where` (all of them when None) — stats + partition-path
    * pruned, conservative. The manifest-only (no data I/O) way for a
    * partition-bounded writer to learn its conflict scope.
    */
  private[ops] def headFilesMatching(spark: SparkSession, path: String,
                                     where: Option[org.apache.spark.sql.Column],
                                     mergeSchema: Boolean = false): Seq[String] = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    require(lines.nonEmpty || where.isDefined,
      s"nothing to rewrite: head of $path is empty")
    val kept = where match {
      case None => lines
      case Some(pred) =>
        if (lines.isEmpty) Seq.empty
        else {
          val pinned = declaredSchemaAt(fs, p, vs.last)
          val cs = resolveConjuncts(spark, p, lines, pred, mergeSchema,
            pinned)
          lines.filter { l =>
            val st = statsOf(l) ++ partitionStats(pathOf(l))
            cs.forall(mayMatch(st, _))
          }
        }
    }
    kept.map(pathOf)
  }

  /** ceil(live snapshot bytes / targetBytes) — the file count a layout
    * rewrite should produce. O(files) driver metadata calls.
    */
  def headFileCountFor(spark: SparkSession, path: String,
                       targetBytes: Long): Int = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val liveBytes = lines.map(l =>
      fs.getFileStatus(new Path(p, pathOf(l))).getLen).sum
    math.max(1, math.ceil(liveBytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite the head snapshot's FILES through `transform` as one
    * replace commit — the layout-maintenance primitive (compaction,
    * clustering) whose result is data-identical by construction.
    * Racing APPENDS are kept: only the files this rewrite read are
    * replaced, anything committed meanwhile survives the baseKeep. A
    * conflicting DML that removed one of the read files aborts with
    * the standard conflict error instead of resurrecting its rows.
    * `schema` pins the read (notably hive-partition column types,
    * which directory-string re-inference would otherwise silently
    * retype — a string day "07" re-landing as int 7).
    */
  def rewriteSnapshot(spark: SparkSession, path: String,
                      partitionCols: Seq[String] = Nil,
                      mergeSchema: Boolean = false,
                      schema: Option[StructType] = None,
                      dataChange: Boolean = true)
                     (transform: DataFrame => DataFrame): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    require(lines.nonEmpty, s"nothing to rewrite: head of $path is empty")
    val layout = layoutOrDeclared(fs, p, vs.last, partitionCols)
    rewriteFiles(spark, path, lines.map(pathOf), layout, mergeSchema,
      schema, dataChange)(transform)
  }

  /** The maintenance core shared by [[rewriteSnapshot]] (whole head)
    * and the scoped [[compact]]/[[optimize]] (candidate files only):
    * rewrite EXACTLY `relFiles` through `transform`, keep every other
    * head file verbatim, commit one atomic replace. Racing APPENDS are
    * kept; a conflicting DML that removed one of the read files aborts
    * (requirePresent) instead of resurrecting its rows.
    */
  private def rewriteFiles(spark: SparkSession, path: String,
                           relFiles: Seq[String],
                           layout: Seq[String],
                           mergeSchema: Boolean,
                           schema: Option[StructType],
                           dataChange: Boolean = false)
                          (transform: DataFrame => DataFrame): Long = {
    val vs = versions(spark, path)
    val (fs, p) = fsFor(spark, path)
    // a hive-partitioned file set MUST be rewritten with its layout, or
    // the flat rewrite breaks directory pruning and a later
    // replacePartitions would keep (and so duplicate) the old rows;
    // tables with a manifest-declared layout resolve it automatically
    require(layout.nonEmpty ||
      !relFiles.exists(f => partitionDirOf(f).nonEmpty),
      s"$path is hive-partitioned — pass partitionCols so the rewrite " +
      "preserves the partition layout")
    val rewritten = relFiles.toSet
    val snapshot = scanFiles(spark, p, relFiles, mergeSchema,
      schema.orElse(declaredSchemaAt(fs, p, vs.last)))
    // dataChange=false (OPTIMIZE/compact): the transform is
    // data-identical by contract, so the commit declares zero change
    // rows — change-feed readers skip it instead of seeing the whole
    // snapshot churn as delete+insert
    val cdfMeta =
      if (dataChange) Map.empty[String, String]
      else Map(ChangeDataMetaKey -> "0")
    commit(spark, path, transform(snapshot), "replace",
      (base, _) => base.filterNot(l => rewritten.contains(pathOf(l))),
      layout, cdfMeta, requirePresent = rewritten)
  }

  /** Roll the table back (or forward) to EXACTLY the snapshot of
    * committed version `v`, as a NEW commit — Delta's RESTORE. History
    * is preserved: readers pinned to intermediate versions are
    * unaffected, the restore itself shows up in the log and is undoable
    * by another restore. No data is copied or rewritten — the new
    * manifest re-lists `v`'s files (stats included), O(manifest) driver
    * I/O; data files are immutable and vacuum retains everything a kept
    * manifest references, so if `v`'s manifest survives its files do
    * too. Carried `txn.*` offsets re-emit through the restore commit
    * unchanged (a restore is not a consumed increment).
    */
  def restore(spark: SparkSession, path: String, v: Long): Long = {
    val vs = versions(spark, path)
    require(vs.contains(v),
      s"version $v of $path does not exist or was vacuumed " +
      s"(retained: ${vs.headOption.getOrElse(-1L)}..${vs.lastOption.getOrElse(-1L)})")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, v)._2
    commitLines(spark, path, "restore", lines, (_, _) => Seq.empty)
  }

  /** Multiset row-level diff between two committed snapshots — the
    * "what changed between Monday's and Tuesday's table" answer when
    * no change feed was captured and the versions aren't
    * CDF-connected (readChanges replays HOW a table changed, commit
    * by commit; diff states WHAT differs, end to end — overwrites
    * included). Emits every version-`toV` row absent from `fromV` as
    * `_change_type = 'insert'` and every `fromV` row absent from
    * `toV` as `'delete'`, with MULTISET multiplicity (a row going
    * 3 copies → 1 emits 2 deletes) — SQL's `EXCEPT ALL` both ways.
    *
    * Plan (100 TB-shaped): one group-count per side over the whole
    * row packed as a struct (null field values group and join as
    * values — a null never silently drops a row), ONE null-safe
    * full-outer join of the two COUNT frames (each side shuffles its
    * distinct row-values once; output is bounded by the change
    * volume), then a bounded `sequence` explode of |Δcount|. Refuses
    * snapshots whose schemas differ — diff needs one row shape;
    * read with mergeSchema or evolve first.
    *
    * Map-typed columns are not groupable/joinable in Spark (map
    * equality is undefined — key order is unobservable), so any
    * column whose type CONTAINS a map is compared through its
    * canonical JSON render (`to_json` into the group key, `from_json`
    * back out — the [[graft.ops.AsofJoin]] normalization): two map
    * values are "the same row" iff they serialize identically, which
    * is also the only equality an independent engine can mirror.
    * TOP-LEVEL map columns are key-sorted before serializing
    * (`map_entries` → `array_sort` → `map_from_entries`), so two
    * logically equal maps whose keys arrived in different build
    * order — different upstream shuffles between the two versions —
    * do NOT surface as a phantom delete+insert pair. Maps NESTED
    * inside structs/arrays keep the serialize-identically caveat
    * (canonicalizing arbitrary nesting would need a recursive
    * rewrite; the render is still deterministic per build order).
    */
  def diff(spark: SparkSession, path: String, fromV: Long,
           toV: Long): DataFrame = {
    val a = readVersion(spark, path, fromV)
    val b = readVersion(spark, path, toV)
    val shape = (df: DataFrame) =>
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(a) == shape(b),
      s"versions $fromV and $toV of $path have different schemas " +
        s"(${a.schema.simpleString} vs ${b.schema.simpleString}) — " +
        "diff needs one row shape; read with mergeSchema or evolve first")
    val cols = a.columns.toSeq
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case st: StructType => st.fields.exists(f => hasMap(f.dataType))
      case arr: org.apache.spark.sql.types.ArrayType =>
        hasMap(arr.elementType)
      case _ => false
    }
    val mapCols = a.schema.fields.filter(f => hasMap(f.dataType))
      .map(_.name).toSet
    // key-order-canonical render for a top-level map: sort the entry
    // array before serializing so build order can't forge a change.
    // array_sort needs an ORDERABLE entry struct — a map whose value
    // type itself contains a map (map<string, map<string,int>>) has
    // none, and the sort would fail AT PLAN TIME; those fall back to
    // the plain render (deterministic per build order, the pre-
    // canonicalization contract)
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case st: StructType => st.fields.forall(f => orderable(f.dataType))
        case arr: org.apache.spark.sql.types.ArrayType =>
          orderable(arr.elementType)
        case _ => true
      }
    def mapRender(c: String): org.apache.spark.sql.Column =
      a.schema(c).dataType match {
        case m: org.apache.spark.sql.types.MapType
            if orderable(m.keyType) && orderable(m.valueType) =>
          to_json(org.apache.spark.sql.functions.map_from_entries(
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.map_entries(col(c)))))
        case _ => to_json(col(c))
      }
    def counted(df: DataFrame, cnt: String) =
      df.select(struct(cols.map(c =>
          if (mapCols(c)) mapRender(c).as(c) else col(c)): _*).as("__row"))
        .groupBy("__row").agg(count(lit(1)).as(cnt))
    val ka = counted(a, "__ca")
    val kb = counted(b, "__cb")
    val j = ka.join(kb, ka("__row") <=> kb("__row"), "full_outer")
      .select(coalesce(ka("__row"), kb("__row")).as("__row"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    j.filter(col("__ca") =!= col("__cb"))
      .select(col("__row"),
        when(col("__cb") > col("__ca"), lit("insert"))
          .otherwise(lit("delete")).as("_change_type"),
        explode(sequence(lit(1L),
          abs(col("__cb") - col("__ca")))).as("__i"))
      .select(cols.map(c =>
        if (mapCols(c))
          from_json(col(s"__row.`$c`"), a.schema(c).dataType).as(c)
        else col(s"__row.`$c`")) :+ col("_change_type"): _*)
  }

  /** Shallow-clone `srcPath` at `version` (default: head) into a NEW
    * table at `dstPath` — Delta's `CREATE TABLE … SHALLOW CLONE`,
    * reduced to the manifest. The clone's v1 manifest is the source
    * version's file list VERBATIM (stats suffixes included, so data
    * skipping works from the first query), its carried `graft.*` meta
    * (declared schema, partition layout, CHECK constraints) is the
    * source's as of that version, and the two tables then evolve fully
    * independently — DML, OPTIMIZE, even VACUUM on either side never
    * touches the other.
    *
    * Zero-copy mechanics: manifests reference table-RELATIVE paths, so
    * each referenced data file is materialized in the clone under the
    * same relative name as a HARD LINK (local FS — O(files) metadata
    * ops, no data bytes move; the same primitive the commit claim
    * uses). Vacuum safety is free: each table's vacuum only unlinks its
    * OWN directory's names, and the kernel frees the shared inode when
    * the last link goes — none of Delta's "vacuum on the source breaks
    * the clone" hazard. Filesystems without hard links (HDFS, object
    * stores) fall back to a byte copy per file (a real S3 deployment
    * would swap in server-side copy, which is metadata-fast).
    *
    * Deliberately NOT copied: `txn.*` streaming idempotence tokens (a
    * clone is a new table — suppressing its first micro-batch because
    * the SOURCE had seen that batch would lose data) and the source's
    * history (the clone starts at v1; its change feed reads as one
    * initial insert snapshot, exactly like a fresh table).
    */
  def cloneAt(spark: SparkSession, srcPath: String, dstPath: String,
              version: Long = -1L): Long = {
    val vs = versions(spark, srcPath)
    require(vs.nonEmpty, s"$srcPath is not a TxTable (no $LogDir manifests)")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v),
      s"version $v of $srcPath does not exist or was vacuumed " +
      s"(retained: ${vs.head}..${vs.last})")
    require(!exists(spark, dstPath),
      s"graft table $dstPath already exists — clone targets a fresh path")
    val (sfs, sp) = fsFor(spark, srcPath)
    val (dfs, dp) = fsFor(spark, dstPath)
    require(sfs.makeQualified(sp) != dfs.makeQualified(dp),
      "cannot clone a table onto itself")
    val (headLine, lines) = readManifest(sfs, sp, v)
    lines.map(pathOf).distinct.foreach { rel =>
      val srcF = new Path(sp, rel)
      val dstF = new Path(dp, rel)
      dfs.mkdirs(dstF.getParent)
      // a leftover file from a crashed earlier clone attempt is
      // unreferenced (the clone commit below never landed) — replace it
      if (dfs.exists(dstF)) dfs.delete(dstF, false)
      linkOrCopy(spark, sfs, srcF, dfs, dstF)
    }
    val carried = parseMeta(headLine).filter(_._1.startsWith("graft."))
    commitLines(spark, dstPath, "clone", lines, (_, _) => Seq.empty,
      carried, firstCommitOnly = true)
  }

  /** Hard-link `src` to `dst` when both sides are the local FS (zero
    * data movement); byte-copy otherwise, or when the link fails
    * because the paths straddle devices/volumes.
    */
  private def linkOrCopy(spark: SparkSession, sfs: FileSystem, src: Path,
                         dfs: FileSystem, dst: Path): Unit = {
    if (sfs.getScheme == "file" && dfs.getScheme == "file") {
      val s = java.nio.file.Paths.get(sfs.makeQualified(src).toUri)
      val d = java.nio.file.Paths.get(dfs.makeQualified(dst).toUri)
      try { java.nio.file.Files.createLink(d, s); return }
      catch {
        case _: UnsupportedOperationException => ()
        case e: java.nio.file.FileSystemException
          if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] => ()
      }
    }
    org.apache.hadoop.fs.FileUtil.copy(sfs, src, dfs, dst, false,
      spark.sparkContext.hadoopConfiguration)
  }

  /** Idempotent bulk file ingestion — Databricks' `COPY INTO`, reduced
    * to manifest membership. Every parquet file under `sourceDir`
    * matching `pattern` is loaded into the table EXACTLY ONCE across
    * any number of invocations: a source file's identity is the md5 of
    * its (qualified path, mtime, length), its in-table name is the
    * DETERMINISTIC `data/copyin_<identity>/<name>`, and "already
    * loaded" is simply "that name is in the head manifest" — no
    * side-car ledger to drift, survive-vacuum rules, or extra state.
    * A source file that is modified in place (new mtime/length) gets a
    * new identity and is loaded again as new data — append semantics,
    * matching COPY INTO's treat-changed-content-as-new-file behavior.
    *
    * Data movement is a hard link per new file on local FS (byte copy
    * where links don't exist) — ingestion cost is O(new files) metadata
    * ops, not a rewrite of the data. Footer min/max stats ride into the
    * manifest lines, so skipping works on copied-in files exactly as on
    * written ones; CHECK constraints are enforced on the new files
    * before the claim, like any data commit. A nonexistent target
    * bootstraps as v1 with the files' schema; an existing target
    * requires the incoming schema to match its read schema by
    * name→type (ingestion is not evolution — use [[evolveSchema]]).
    * Partitioned targets are refused: copied-in files carry no hive
    * path segments, and silently mixing layouts is the one thing the
    * resolver must never see.
    *
    * Concurrency: the append claim retries against the new head, and
    * `baseKeep` drops any base line a racing copyInto of the same
    * source already committed — the deterministic names make the
    * duplicate detectable at commit time, so two racers net exactly
    * one copy of each file. Returns (committed version — the head when
    * nothing was new, loaded relative paths, skipped-as-already-loaded
    * count).
    */
  def copyInto(spark: SparkSession, path: String, sourceDir: String,
               pattern: String = "*.parquet"): (Long, Seq[String], Int) = {
    val (fs, p) = fsFor(spark, path)
    val sq = new Path(sourceDir)
    val sfs = FileSystem.get(sq.toUri, spark.sparkContext.hadoopConfiguration)
    val srcs = Option(sfs.globStatus(new Path(sq, pattern))).toSeq.flatten
      .filter(_.isFile).sortBy(_.getPath.toString)
    val head = versions(spark, path).lastOption
    head.foreach { v =>
      require(declaredPartitionColsAt(fs, p, v).forall(_.isEmpty),
        s"COPY INTO a partitioned table is not supported ($path declares " +
        "partition columns; copied-in files carry no partition segments)")
    }
    val existing = head
      .map(v => readManifest(fs, p, v)._2.map(pathOf).toSet)
      .getOrElse(Set.empty)
    val targets = srcs.map { st =>
      val id = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${sfs.makeQualified(st.getPath)}|${st.getModificationTime}|${st.getLen}"
          .getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      (st.getPath, s"data/copyin_$id/${st.getPath.getName}")
    }
    val (skipped, fresh) = targets.partition(t => existing.contains(t._2))
    if (fresh.isEmpty)
      return (head.getOrElse(0L), Seq.empty, skipped.size)
    // schema gate BEFORE any linking: name→type equality with the
    // table's read schema (nullability aside)
    val incoming = spark.read.parquet(
      fresh.map(f => sfs.makeQualified(f._1).toString): _*).schema
    head.foreach { _ =>
      val have = read(spark, path).schema
        .map(f => f.name -> f.dataType).toMap
      val got = incoming.map(f => f.name -> f.dataType).toMap
      require(have == got,
        s"COPY INTO schema mismatch for $path: table reads " +
        s"${have.toSeq.sortBy(_._1).mkString(", ")} but the files carry " +
        s"${got.toSeq.sortBy(_._1).mkString(", ")}")
    }
    fresh.foreach { case (src, rel) =>
      val dstF = new Path(p, rel)
      fs.mkdirs(dstF.getParent)
      // an existing target is this source file's identical content —
      // either a crashed earlier attempt or a racing loader; reuse it
      // (deleting it could yank a file a racer just committed)
      if (!fs.exists(dstF)) linkOrCopy(spark, sfs, src, fs, dstF)
    }
    val freshRels = fresh.map(_._2)
    val activeConstraints = headConstraints(spark, path)
    // NO cleanup on failure, deliberately: the deterministic names are
    // SHARED across racing loaders of the same source, so "my" fresh
    // file may be exactly the file a racer just linked and committed —
    // deleting it would dangle the racer's manifest and break every
    // later read. Unreferenced files are invisible to readers, a retry
    // REUSES them via the exists-check above (the failure cost is
    // already paid), and vacuum's orphan grace collects genuine debris.
    enforceConstraints(spark, path, fs, p, freshRels, None,
      activeConstraints)
    val newLines = statsLines(spark, fs, p, path, freshRels)
    val freshSet = freshRels.toSet
    val v = commitLines(spark, path, "copyinto", newLines,
      (base, _) => base.filterNot(b => freshSet.contains(pathOf(b))),
      requireConstraints = Some(constraintFingerprint(activeConstraints)))
    (v, freshRels, skipped.size)
  }

  /** Overwrite-commit `df` as the next version (the whole snapshot
    * becomes exactly this write's files).
    */
  def overwrite(spark: SparkSession, path: String, df: DataFrame,
                partitionCols: Seq[String] = Nil,
                meta: Map[String, String] = Map.empty): Long =
    commit(spark, path, df, "overwrite", (_, _) => Seq.empty, partitionCols,
      meta)

  /** Append-commit `df`: next version = head's files + this write's.
    * `guard` — see [[commitLines]]: per-key carried-meta preconditions
    * that abort the commit if a concurrent writer already advanced the
    * key, the primitive exactly-once incremental consumers build on.
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             partitionCols: Seq[String] = Nil,
             meta: Map[String, String] = Map.empty,
             guard: Map[String, Long] = Map.empty): Long =
    commit(spark, path, df, "append", (base, _) => base, partitionCols, meta,
      guard = guard)

  /** Replace-commit: next version = the head's files that survive
    * `keepExisting` + this write's files. The partition-bounded publish
    * primitive — Delta's `replaceWhere`, reduced to a file-list filter.
    * `keepExisting` receives manifest-relative paths
    * (`data/<uuid>/[part=val/]file`).
    */
  def replace(spark: SparkSession, path: String, df: DataFrame,
              partitionCols: Seq[String],
              keepExisting: String => Boolean): Long =
    commit(spark, path, df, "replace",
      (base, _) => base.filter(l => keepExisting(pathOf(l))),
      partitionCols)

  /** Dynamic-partition-overwrite commit (Spark's
    * `partitionOverwriteMode=dynamic`, as a log commit): the next
    * version keeps every head file whose partition directory does NOT
    * appear among this write's partitions, and replaces the ones that
    * do. The publish step of [[Sinks.upsertPartitioned]] in tx mode —
    * untouched partitions keep their exact existing files (never
    * rewritten, never even read), replaced partitions swap atomically
    * with the manifest claim.
    */
  def replacePartitions(spark: SparkSession, path: String, df: DataFrame,
                        partitionCols: Seq[String],
                        expectUnchanged: Option[(Set[String], Set[String])] = None): Long =
    commit(spark, path, df, "replace", (base, newFiles) => {
      val replaced = newFiles.map(f => partitionDirOf(pathOf(f))).toSet
      base.filterNot(f => replaced.contains(partitionDirOf(pathOf(f))))
    }, partitionCols, requireUnchangedUnder = expectUnchanged)

  /** `data/<uuid>/day=10/part-x.parquet` → `day=10` (nested partitions
    * keep all `key=value` segments; unpartitioned files → ""). Writer
    * dir names are hive-escaped on BOTH sides, so string equality is
    * value equality.
    */
  private[ops] def partitionDirOf(rel: String): String =
    rel.split('/').drop(2).dropRight(1).mkString("/")

  /** Write `df` into a fresh immutable data dir and commit a manifest of
    * `baseKeep(head's files, this write's files) ++ the new files` under
    * the next version. The slot claim loop is lock-free optimistic
    * concurrency: losers recompute against the new head and retry, so no
    * committed version is ever lost (see [[claimSlot]] for the
    * atomicity argument).
    */
  private def commit(spark: SparkSession, path: String, df: DataFrame,
                     action: String,
                     baseKeep: (Seq[String], Seq[String]) => Seq[String],
                     partitionCols: Seq[String] = Nil,
                     meta: Map[String, String] = Map.empty,
                     requirePresent: Set[String] = Set.empty,
                     guard: Map[String, Long] = Map.empty,
                     requireUnchangedUnder: Option[(Set[String], Set[String])] = None,
                     requireHeadVersion: Option[Long] = None,
                     allowZeroParts: Boolean = false): Long = {
    val (fs, p) = fsFor(spark, path)
    val dataDir = s"data/${java.util.UUID.randomUUID()}"
    val w = df.write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(new Path(p, dataDir).toString)
    val allParts = {
      val it = fs.listFiles(new Path(p, dataDir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      val prefix = fs.makeQualified(new Path(p, dataDir)).toString
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          buf += s"$dataDir/${f.toString.stripPrefix(prefix).stripPrefix("/")}"
      }
      buf.toSeq.sorted
    }
    // Zero-row part files are NOT registered: a filter/rewrite task
    // that produced nothing writes an empty part whose footer carries
    // no column stats, so it would conservatively "may-match" every
    // predicate — defeating pruning-based no-op detection (a DELETE of
    // an absent key must return None, and whether Spark's task layout
    // emits an empty part is run-dependent, which made that contract
    // FLAKY). The files stay on disk unreferenced (vacuum's orphan
    // grace collects them). A commit whose every part is empty keeps
    // ONE as the snapshot's schema carrier — an intentionally-empty
    // overwrite must still be readable without a declared schema —
    // unless the caller proves the snapshot retains other files
    // (`allowZeroParts`: a rewrite that deleted every candidate row
    // while non-candidate files survive registers nothing).
    val newFiles = {
      val nonEmpty = allParts.filter(rel => parquetRowCount(fs, p, rel) != 0L)
      if (nonEmpty.nonEmpty) nonEmpty
      else if (allowZeroParts) Seq.empty
      else allParts.take(1)
    }
    // CHECK constraints validate the freshly written files before any
    // claim — a violating commit cleans up and throws, invisible to
    // readers; the validated set's fingerprint rides into the claim
    // loop so a concurrent ADD/DROP CONSTRAINT aborts this commit
    // instead of letting unvalidated data slip past the new rules
    val activeConstraints = headConstraints(spark, path)
    enforceConstraints(spark, path, fs, p, newFiles, Some(dataDir),
      activeConstraints)
    // footer min/max (+ declared blooms — including one declared by
    // THIS commit's meta) per new file ride in the manifest line;
    // failures degrade to stats-less lines
    val newLines = statsLines(spark, fs, p, path, newFiles, meta)
    // declare the layout in the manifest: partitioned commits state
    // their columns; overwrites own the WHOLE layout, so they also
    // clear a stale declaration when the new snapshot is flat. A flat
    // append into a partitioned table deliberately leaves the carried
    // declaration alone — the resolver's mixed-layout check owns that
    // failure mode.
    val layoutMeta =
      if (partitionCols.nonEmpty || action == "overwrite")
        Map(PartitionsMetaKey -> enc(partitionCols.mkString(",")))
      else Map.empty[String, String]
    commitLines(spark, path, action, newLines, baseKeep, layoutMeta ++ meta,
      requirePresent, guard, requireUnchangedUnder,
      requireConstraints = Some(constraintFingerprint(activeConstraints)),
      requireHeadVersion = requireHeadVersion)
  }

  /** The claim loop of [[commit]], usable on its own for METADATA-ONLY
    * commits (`newLines` empty, baseKeep identity): the snapshot's file
    * set is unchanged but the head manifest records new meta — how an
    * incremental consumer durably advances its offset over an empty
    * increment without writing a zero-row data file.
    *
    * `guard`: carried-meta preconditions revalidated on EVERY retry
    * against the current head — if the head already carries `key` at a
    * value >= the guard's, a concurrent committer for the same logical
    * transaction won the race and this commit aborts
    * (ConcurrentModificationException) instead of applying its work a
    * second time. This is what makes "check processedVersion, then
    * commit" safe under concurrent same-app writers: the check alone is
    * check-then-act; the guard closes the window because claims are
    * serialized by the slot.
    */
  /** Metadata-only commit updating carried `graft.*` meta keys — the
    * internal primitive behind config/stats refreshes. Bloom filters,
    * clustering and constraints have bespoke public wrappers with
    * their own validation; engine components maintaining their OWN
    * carried state (the BM25 index's corpus stats) use this directly.
    * `guard` — the [[append]] transaction guard: the commit aborts if
    * a concurrent committer already advanced a guarded key.
    */
  private[graft] def setCarriedMeta(spark: SparkSession, path: String,
                                    meta: Map[String, String],
                                    guard: Map[String, Long] = Map.empty): Long = {
    require(meta.nonEmpty, "setCarriedMeta needs at least one key")
    require(meta.keys.forall(_.startsWith("graft.")),
      s"carried meta keys must be graft.-prefixed (carry-forward " +
        s"contract): ${meta.keys.filterNot(_.startsWith("graft."))}")
    require(versions(spark, path).nonEmpty,
      s"$path is not a TxTable (no $LogDir manifests)")
    commitLines(spark, path, "setmeta", Seq.empty, (base, _) => base,
      meta, guard = guard)
  }

  private def commitLines(spark: SparkSession, path: String, action: String,
                          newLines: Seq[String],
                          baseKeep: (Seq[String], Seq[String]) => Seq[String],
                          meta: Map[String, String] = Map.empty,
                          requirePresent: Set[String] = Set.empty,
                          guard: Map[String, Long] = Map.empty,
                          requireUnchangedUnder: Option[(Set[String], Set[String])] = None,
                          firstCommitOnly: Boolean = false,
                          requireConstraints: Option[String] = None,
                          requireHeadVersion: Option[Long] = None): Long = {
    require(meta.forall { case (k, v) =>
      k.nonEmpty && !k.contains('=') &&
        !(k + v).exists(c => c == ' ' || c == '\n')
    }, "metadata keys must be nonempty and '='-free; keys and values " +
       "must not contain spaces or newlines (they live in the head line)")
    val (fs, p) = fsFor(spark, path)
    fs.mkdirs(new Path(p, LogDir))

    var committed = -1L
    while (committed < 0) {
      val head = versions(spark, path).lastOption
      // a first-commit-only claim (CREATE) may only land as v1: a lost
      // race means another creator won — surface "already exists"
      // instead of silently replacing its declared metadata as v2
      if (firstCommitOnly && head.isDefined)
        throw new IllegalArgumentException(
          s"graft table $path already exists (concurrent create)")
      val (prevHead, base) = head
        .map(v => readManifest(fs, p, v))
        .getOrElse(("", Seq.empty[String]))
      // copy-on-write conflict check: if a concurrent commit removed a
      // file THIS operation rewrote (another delete/update/merge or an
      // overwrite won the race), committing our rewrite of its stale
      // rows would duplicate or resurrect them — fail loudly instead
      // (Delta's ConcurrentDeleteReadException). Racing APPENDS leave
      // the required files in place and proceed safely.
      if (requirePresent.nonEmpty) {
        val basePaths = base.map(pathOf).toSet
        val gone = requirePresent -- basePaths
        if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
          s"conflicting commit on $path: files this rewrite read were " +
          s"removed by a concurrent commit (retry the operation): " +
          gone.take(3).mkString(", "))
      }
      // partition-scope conflict check: the files under the given
      // partition dirs must be EXACTLY the set this operation read —
      // a racing append INTO a replaced partition would otherwise be
      // silently dropped by the replace (requirePresent only catches
      // removals, not additions)
      requireUnchangedUnder.foreach { case (dirs, known) =>
        val cur = base.map(pathOf)
          .filter(f => dirs.contains(partitionDirOf(f))).toSet
        if (cur != known)
          throw new java.util.ConcurrentModificationException(
            s"conflicting commit on $path: partitions this rewrite " +
            s"replaces changed concurrently (retry the operation): " +
            ((cur -- known) ++ (known -- cur)).take(3).mkString(", "))
      }
      // transaction guard: abort if a concurrent committer already
      // advanced this key to (at least) the value we are claiming —
      // Delta's ConcurrentTransactionException, for same-app races
      if (guard.nonEmpty) {
        val prevMeta = parseMeta(prevHead)
        guard.foreach { case (k, v) =>
          prevMeta.get(k).flatMap(s => scala.util.Try(s.toLong).toOption)
            .filter(_ >= v).foreach { cur =>
              throw new java.util.ConcurrentModificationException(
                s"transaction guard on $path: $k already at $cur >= $v " +
                "— a concurrent committer applied this increment first")
            }
        }
      }
      // constraint-set conflict check (Delta's metadata-changed
      // semantics): this DATA commit was validated against a specific
      // CHECK-constraint set; if a concurrent ADD/DROP CONSTRAINT
      // moved the head's set since, committing unvalidated data would
      // silently break the new constraint's whole-table promise —
      // abort and let the caller retry under the new rules
      requireConstraints.foreach { fp =>
        val cur = constraintFingerprint(effectiveConstraints(
          parseMeta(prevHead)))
        if (cur != fp)
          throw new java.util.ConcurrentModificationException(
            s"conflicting commit on $path: CHECK constraints changed " +
            "concurrently (this write was validated against the old " +
            "set) — retry the operation")
      }
      // head-version pin: ADD CONSTRAINT validated — and the DDL
      // rewrites (RENAME/DROP COLUMN) snapshotted — a specific
      // version; anything committed since would escape that
      // validation or be erased by the rewrite
      requireHeadVersion.foreach { v0 =>
        if (head.getOrElse(0L) != v0)
          throw new java.util.ConcurrentModificationException(
            s"conflicting commit on $path: head advanced past $v0 " +
            "while this operation was pinned to it (retry)")
      }
      val next = head.getOrElse(0L) + 1
      val nonce = java.util.UUID.randomUUID().toString
      // carried keys survive manifest pruning: re-emit the previous
      // head's txn.*/graft.* tokens, this commit's own meta winning on
      // conflict; the ts stamp is per-commit and never carried
      val carried = parseMeta(prevHead)
        .filter(kv => CarriedMetaPrefixes.exists(kv._1.startsWith)) ++ meta
      val stamped = carried +
        (TimestampMetaKey -> System.currentTimeMillis().toString)
      val allTokens = stamped.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      val headLine = (action +: allTokens :+ nonce).mkString(" ")
      val body = (headLine +: (baseKeep(base, newLines) ++ newLines))
        .mkString("", "\n", "\n")
      val slot = new Path(new Path(p, LogDir), manifestName(next))
      if (claimSlot(fs, slot, body, nonce)) committed = next
      // lost the race: loop re-reads the NEW head, so an append/replace
      // rebuilt here includes the winner's files — nothing is dropped
    }
    committed
  }

  /** Atomically publish `body` as `slot`; true iff THIS commit owns the
    * slot. The manifest is first written complete to a dot-tmp name
    * (readers never see a torn manifest), then claimed:
    *  - local FS: `Files.createLink(slot, tmp)` — a hard link is
    *    O_EXCL-atomic at the kernel level, so of N concurrent committers
    *    exactly one creates the slot name and the rest get
    *    FileAlreadyExistsException. No check-then-act window at all.
    *  - other FS: `rename(tmp, slot)` — atomic-and-fails-on-existing on
    *    HDFS. Because some filesystems' rename silently REPLACES an
    *    existing destination, the slot is read back and must carry this
    *    commit's nonce; a foreign nonce means the claim was lost and the
    *    caller retries against the new head.
    *
    * STORAGE CONTRACT: multi-writer safety on the rename path requires
    * a filesystem whose rename is atomic AND fails on an existing
    * destination (HDFS, ABFS, GCS-with-precondition). On a store whose
    * rename clobbers, the nonce read-back only narrows the window — a
    * winner that validated its nonce can still be overwritten by a
    * later racer before anyone notices — it cannot close it. That is
    * the same boundary Delta draws (S3 proper needs a coordinating
    * LogStore / conditional PUT); deploy single-writer there, or swap
    * this claim for a conditional PUT.
    */
  private def claimSlot(fs: FileSystem, slot: Path, body: String,
                        nonce: String): Boolean = {
    val tmp = new Path(slot.getParent, s".tmp_$nonce.manifest")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    try {
      if (fs.getScheme == "file") {
        val slotNio = java.nio.file.Paths.get(fs.makeQualified(slot).toUri)
        val tmpNio = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri)
        try { java.nio.file.Files.createLink(slotNio, tmpNio); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else if (!fs.exists(slot) && fs.rename(tmp, slot)) {
        val in = fs.open(slot)
        val head = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                   finally in.close()
        head.split("\n").headOption.exists(_.endsWith(nonce))
      } else false
    } finally if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  /** Head-snapshot facts for `DESCRIBE DETAIL`: (version, file count,
    * total data bytes, partition columns, schema). O(files) driver
    * metadata calls, no data I/O; schema from the manifest declaration
    * when present, else the first footer.
    */
  def detail(spark: SparkSession, path: String)
      : (Long, Long, Long, Seq[String], StructType) = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path is not a TxTable (no $LogDir manifests)")
    val (fs, p) = fsFor(spark, path)
    val lines = readManifest(fs, p, vs.last)._2
    val bytes = lines.map(l =>
      fs.getFileStatus(new Path(p, pathOf(l))).getLen).sum
    val schema = declaredSchemaAt(fs, p, vs.last)
      .getOrElse(read(spark, path, mergeSchema = true).schema)
    val parts = declaredPartitionColsAt(fs, p, vs.last).getOrElse(
      lines.headOption.map(l => partitionDirOf(pathOf(l)).split('/')
        .filter(_.contains('=')).map(_.takeWhile(_ != '=')).toSeq)
        .getOrElse(Nil))
    (vs.last, lines.size.toLong, bytes, parts, schema)
  }

  /** Drop all but the newest `keepVersions` manifests and delete every
    * data file none of the kept snapshots references. Callers must
    * ensure no reader is pinned to a dropped version (same contract as
    * Delta's VACUUM retention). Returns the table-relative paths
    * removed (data/change dirs and manifests). `dryRun = true` reports
    * what WOULD be removed without touching anything — the
    * look-before-you-leap check a retention policy wants before an
    * irreversible prune.
    */
  /** `orphanGraceMs`: a data dir referenced by NO manifest at all is
    * either debris from a failed commit or an IN-FLIGHT commit that has
    * written its files but not yet claimed a slot (commit writes data
    * first) — deleting it would let the writer claim a manifest whose
    * files are gone. Such dirs are only removed once older than the
    * grace period (Delta's uncommitted-file retention, same reasoning);
    * dirs referenced by the DROPPED manifests were durably committed
    * and are reclaimed immediately.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1,
             orphanGraceMs: Long = 24L * 3600 * 1000,
             dryRun: Boolean = false): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the head version")
    val (fs, p) = fsFor(spark, path)
    val vs = versions(spark, path)
    if (vs.isEmpty) return Seq.empty
    val removed = Seq.newBuilder[String]
    def remove(rel: String, target: Path, recursive: Boolean): Unit = {
      removed += rel
      if (!dryRun) { fs.delete(target, recursive); () }
    }
    // drop may be empty — orphan-dir cleanup below still runs (vacuum's
    // job includes reclaiming failed-commit debris past the grace)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live = keep.flatMap(v => readManifest(fs, p, v)._2.map(pathOf)).toSet
    val dropped = drop.flatMap(v => readManifest(fs, p, v)._2.map(pathOf)).toSet
    val dataRoot = new Path(p, "data")
    val now = System.currentTimeMillis()
    // delete whole commit dirs whose files are all dead (files of one
    // commit are only ever referenced together)
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { d =>
      val rel = s"data/${d.getPath.getName}"
      val anyLive = live.exists(_.startsWith(rel + "/"))
      val wasCommitted = dropped.exists(_.startsWith(rel + "/"))
      if (!anyLive && (wasCommitted ||
          now - d.getModificationTime > orphanGraceMs))
        remove(rel, d.getPath, recursive = true)
    }
    // change-data dirs follow the same lifecycle: referenced by a kept
    // manifest → live; referenced only by dropped manifests → reclaim
    // now; referenced by nothing (a DML that lost its commit race) →
    // reclaim past the grace period
    def cdfOf(vsSet: Seq[Long]): Set[String] = vsSet.flatMap(v =>
      parseMeta(readManifest(fs, p, v)._1).get(ChangeDataMetaKey))
      .filter(_ != "0").toSet
    val liveCdf = cdfOf(keep)
    val droppedCdf = cdfOf(drop)
    val changesRoot = new Path(p, ChangesDir)
    if (fs.exists(changesRoot)) fs.listStatus(changesRoot).foreach { d =>
      val name = d.getPath.getName
      if (!liveCdf.contains(name) && (droppedCdf.contains(name) ||
          now - d.getModificationTime > orphanGraceMs))
        remove(s"$ChangesDir/$name", d.getPath, recursive = true)
    }
    drop.foreach(v =>
      remove(s"$LogDir/${manifestName(v)}",
        new Path(new Path(p, LogDir), manifestName(v)), recursive = false))
    removed.result().sorted
  }
}
