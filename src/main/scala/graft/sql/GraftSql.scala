package graft.sql

import org.apache.spark.sql.{GraftShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

import graft.ops.TxTable

/** The TxTable's SQL DDL/DML surface — an injected parser
  * (`GraftExtensions` wires it via `injectParser`) that recognizes
  * graft statements and delegates every other statement, expression,
  * and identifier untouched to Spark's own parser. A table is
  * addressed by path, Delta-style: `` graft.`/lake/events` ``.
  *
  * {{{
  *   CREATE [OR REPLACE] TABLE graft.`/t` [USING graft]
  *     [PARTITIONED BY (c, ...)] AS SELECT ...
  *   MERGE INTO graft.`/t` USING (SELECT ...) ON (key1, key2)
  *   UPDATE graft.`/t` SET c = expr, ... [WHERE cond]
  *   DELETE FROM graft.`/t` [WHERE cond]
  *   OPTIMIZE graft.`/t` [ZORDER BY (c1, c2)] [WHERE cond]
  *   VACUUM graft.`/t` [RETAIN n VERSIONS] [DRY RUN]
  *   DESCRIBE DETAIL graft.`/t`
  *   RESTORE graft.`/t` [TO] VERSION [AS OF] v
  *   RESTORE graft.`/t` [TO] TIMESTAMP [AS OF] 'ts'
  *   DESCRIBE HISTORY graft.`/t`
  * }}}
  *
  * Each statement routes to the corresponding [[TxTable]] call —
  * `merge`/`delete`/`update`/`optimize`/`vacuum`/`restore` — so SQL
  * and Scala users share one commit protocol, one conflict story, one
  * file layout. MERGE takes a key-column list (upsert-by-key, the
  * TxTable merge semantics), not an arbitrary ON predicate; sub-plans
  * (the CTAS query, the MERGE source) are parsed by the DELEGATE
  * parser at parse time and analyzed at execution time, so temp views
  * and graft SQL functions inside them work as in any query.
  *
  * Execution model: every command is a `LeafRunnableCommand` — the
  * TxTable call runs once on the driver when Spark executes the
  * command, and the data movement inside it is the usual distributed
  * plan (executors write the parquet; the driver claims the manifest).
  */
object GraftSql {

  private val Tbl = """graft\.`([^`]+)`"""

  private val CreateRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Tbl +
      """\s*(?:USING\s+graft\s*)?(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?AS\s+(.+)""").r
  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+""" + Tbl + """\s+USING\s+(.+)""").r
  private val DeleteRe =
    ("""(?is)\s*DELETE\s+FROM\s+""" + Tbl + """\s*(?:WHERE\s+(.+?))?\s*""").r
  private val UpdateRe =
    ("""(?is)\s*UPDATE\s+""" + Tbl + """\s+SET\s+(.+)""").r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+""" + Tbl +
      """\s+ZORDER\s+BY\s*\(([^)]*)\)\s*(?:WHERE\s+(.+?))?\s*""").r
  private val CompactRe =
    ("""(?is)\s*OPTIMIZE\s+""" + Tbl +
      """\s*(?:WHERE\s+(.+?))?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+""" + Tbl +
      """\s*(?:RETAIN\s+(\d+)\s+VERSIONS)?\s*(DRY\s+RUN)?\s*""").r
  private val DetailRe =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + Tbl + """\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+""" + Tbl +
      """\s+(?:TO\s+)?VERSION\s+(?:AS\s+OF\s+)?(\d+)\s*""").r
  private val RestoreTsRe =
    ("""(?is)\s*RESTORE\s+""" + Tbl +
      """\s+(?:TO\s+)?TIMESTAMP\s+(?:AS\s+OF\s+)?'([^']+)'\s*""").r
  private val HistoryRe =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Tbl + """\s*""").r

  /** Some(command) when `sqlText` is a graft statement; None → the
    * delegate parser owns it. The `graft.` backtick marker gates the
    * whole branch, so non-graft SQL never pays more than a substring
    * check.
    */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    // case-insensitive, matching the (?i) statement regexes — a
    // `MERGE INTO GRAFT.`…`` must not silently bypass this parser and
    // die in Spark's analyzer with an unrelated error
    if (!sqlText.toLowerCase(java.util.Locale.ROOT).contains("graft.`")) None
    else sqlText match {
      case CreateRe(replace, path, parts, query) =>
        Some(GraftCreateTableCommand(path, splitNames(parts),
          replace != null, delegate.parsePlan(query)))
      case MergeRe(path, rest) =>
        val (source, keys) = splitMergeSource(rest)
        // strip the outer parens only when they wrap the WHOLE source —
        // `(SELECT …) alias` keeps its parens and parses as a FROM-item
        // subquery (`SELECT * FROM (SELECT …) alias`), instead of the
        // mangled `SELECT …) alias` a blind stripSuffix would produce
        val plan =
          if (source.startsWith("(") && closesAtEnd(source))
            delegate.parsePlan(source.stripPrefix("(").stripSuffix(")"))
          else delegate.parsePlan(s"SELECT * FROM $source")
        Some(GraftMergeCommand(path, plan, splitNames(keys)))
      case UpdateRe(path, rest) =>
        val (setPart, where) = splitAtTopLevelWhere(rest)
        val set = splitTopLevel(setPart, ',').map { a =>
          val i = topLevelIndexOf(a, "=")
          require(i > 0, s"malformed SET assignment: $a")
          val name = a.substring(0, i).trim.stripPrefix("`").stripSuffix("`")
          name -> GraftShim.toColumn(
            delegate.parseExpression(a.substring(i + 1)))
        }.toMap
        val cond = where.map(w =>
          GraftShim.toColumn(delegate.parseExpression(w))).getOrElse(lit(true))
        Some(GraftUpdateCommand(path, cond, set))
      case DeleteRe(path, where) =>
        val cond = Option(where).map(w =>
          GraftShim.toColumn(delegate.parseExpression(w))).getOrElse(lit(true))
        Some(GraftDeleteCommand(path, cond))
      case OptimizeRe(path, cols, where) =>
        Some(GraftOptimizeCommand(path, splitNames(cols),
          Option(where).map(w =>
            GraftShim.toColumn(delegate.parseExpression(w)))))
      case CompactRe(path, where) =>
        Some(GraftCompactCommand(path,
          Option(where).map(w =>
            GraftShim.toColumn(delegate.parseExpression(w)))))
      case VacuumRe(path, keep, dry) =>
        Some(GraftVacuumCommand(path,
          Option(keep).map(_.toInt).getOrElse(1), dry != null))
      case DetailRe(path) =>
        Some(GraftDetailCommand(path))
      case RestoreRe(path, v) =>
        Some(GraftRestoreCommand(path, v.toLong))
      case RestoreTsRe(path, ts) =>
        Some(GraftRestoreTimestampCommand(path, ts))
      case HistoryRe(path) =>
        Some(GraftHistoryCommand(path))
      case _ => None
    }
  }

  private def splitNames(csv: String): Seq[String] =
    Option(csv).toSeq.flatMap(_.split(',')).map(
      _.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)

  /** MERGE's `<source> ON (keys)` tail: the source may be a
    * parenthesized query containing its own JOIN ... ON clauses, so the
    * split is on the LAST `ON` at paren-depth 0.
    */
  private def splitMergeSource(rest: String): (String, String) = {
    var i = 0
    var last = -1
    while (i >= 0 && i < rest.length) {
      i = topLevelIndexOf(rest, "ON", i)
      if (i >= 0) { last = i; i += 2 }
    }
    require(last > 0, s"MERGE INTO graft needs `USING <source> ON (keys)`")
    val keys = rest.substring(last + 2).trim
    require(keys.startsWith("(") && keys.endsWith(")"),
      s"MERGE key list must be parenthesized column names, got: $keys")
    (rest.substring(0, last).trim, keys.stripPrefix("(").stripSuffix(")"))
  }

  /** True iff the '(' at index 0 finds its matching ')' as the LAST
    * character of `s` (quote-aware) — i.e. the parens wrap the whole
    * string, not just a leading sub-expression.
    */
  private def closesAtEnd(s: String): Boolean = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i == s.length - 1
        case _ =>
      }
      i += 1
    }
    false
  }

  private def splitAtTopLevelWhere(s: String): (String, Option[String]) = {
    val i = topLevelIndexOf(s, "WHERE")
    if (i < 0) (s, None)
    else (s.substring(0, i), Some(s.substring(i + "WHERE".length)))
  }

  /** First index of keyword/operator `kw` at paren/bracket depth 0,
    * outside '…', "…" and `…` quoting (case-insensitive, word-bounded
    * for alphabetic keywords); -1 if absent.
    */
  private def topLevelIndexOf(s: String, kw: String, from: Int = 0): Int = {
    var depth = 0
    var quote: Char = 0
    var i = from.max(0)
    val alpha = kw.head.isLetter
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, kw, 0, kw.length)) {
            val okBefore = !alpha || i == 0 ||
              !(s.charAt(i - 1).isLetterOrDigit || s.charAt(i - 1) == '_')
            val after = i + kw.length
            val okAfter = !alpha || after >= s.length ||
              !(s.charAt(after).isLetterOrDigit || s.charAt(after) == '_')
            if (okBefore && okAfter) return i
          }
      }
      i += 1
    }
    -1
  }

  /** Split on `sep` at depth 0 (commas inside function calls, quotes,
    * or subqueries don't count).
    */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var quote: Char = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case `sep` if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private[sql] def versionAttr(nullable: Boolean): Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable)())
}

/** `CREATE [OR REPLACE] TABLE graft.`p` ... AS query` →
  * [[TxTable.append]] (create; errors if the table exists) or
  * [[TxTable.overwrite]] (replace).
  */
case class GraftCreateTableCommand(path: String, partitionCols: Seq[String],
                                   replace: Boolean, query: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftShim.ofRows(spark, query)
    val v =
      if (replace) TxTable.overwrite(spark, path, df, partitionCols)
      else {
        require(TxTable.versions(spark, path).isEmpty,
          s"graft table $path already exists — use CREATE OR REPLACE TABLE")
        TxTable.append(spark, path, df, partitionCols)
      }
    Seq(Row(v))
  }
}

/** `MERGE INTO graft.`p` USING src ON (keys)` → [[TxTable.merge]]
  * (upsert-by-key).
  */
case class GraftMergeCommand(path: String, source: LogicalPlan,
                             keyCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.merge(spark, path, GraftShim.ofRows(spark, source),
      keyCols)))
}

/** `DELETE FROM graft.`p` [WHERE cond]` → [[TxTable.delete]]. Version
  * is NULL when no file could match (nothing committed).
  */
case class GraftDeleteCommand(path: String,
                              cond: org.apache.spark.sql.Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = true)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.delete(spark, path, cond).map(Long.box).orNull))
}

/** `UPDATE graft.`p` SET ... [WHERE cond]` → [[TxTable.update]]. */
case class GraftUpdateCommand(path: String, cond: org.apache.spark.sql.Column,
                              set: Map[String, org.apache.spark.sql.Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = true)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.update(spark, path, cond, set).map(Long.box).orNull))
}

/** `OPTIMIZE graft.`p` ZORDER BY (cols) [WHERE cond]` →
  * [[TxTable.optimize]] (the WHERE scopes which FILES are rewritten —
  * stats/partition pruning, never a row filter).
  */
case class GraftOptimizeCommand(path: String, zorderCols: Seq[String],
                                where: Option[org.apache.spark.sql.Column] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.optimize(spark, path, zorderCols, where = where)))
}

/** `OPTIMIZE graft.`p` [WHERE cond]` (no ZORDER) → [[TxTable.compact]]
  * — bin-pack small files, no re-clustering; WHERE scopes the files.
  */
case class GraftCompactCommand(path: String,
                               where: Option[org.apache.spark.sql.Column] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.compact(spark, path, where = where)))
}

/** `VACUUM graft.`p` [RETAIN n VERSIONS] [DRY RUN]` →
  * [[TxTable.vacuum]]; one row per removed (or, dry, would-be-removed)
  * table-relative path.
  */
case class GraftVacuumCommand(path: String, keepVersions: Int,
                              dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxTable.vacuum(spark, path, keepVersions, dryRun = dryRun).map(Row(_))
}

/** `DESCRIBE DETAIL graft.`p`` → one row of head-snapshot facts
  * (Delta's DESCRIBE DETAIL, reduced to the log): version, file
  * count, total bytes, partition columns, schema.
  */
case class GraftDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("schema", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, n, bytes, parts, schema) = TxTable.detail(spark, path)
    Seq(Row(v, n, bytes, parts.mkString(","), schema.simpleString))
  }
}

/** `RESTORE graft.`p` VERSION AS OF v` → [[TxTable.restore]]. */
case class GraftRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.restore(spark, path, version)))
}

/** `RESTORE graft.`p` TIMESTAMP AS OF 'ts'` — the timestamp (epoch
  * millis, ISO instant, or `yyyy-MM-dd HH:mm:ss[.SSS]` in the session
  * zone) resolves to the newest commit at-or-before it via the
  * manifests' `ts` stamps, then restores exactly as the VERSION form.
  */
case class GraftRestoreTimestampCommand(path: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] = {
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID))
    val millis = scala.util.Try(ts.toLong).getOrElse(
      scala.util.Try(java.time.Instant.parse(ts).toEpochMilli).getOrElse(
        java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
          .atZone(zone).toInstant.toEpochMilli))
    Seq(Row(TxTable.restore(spark, path,
      TxTable.versionAsOfTimestamp(spark, path, millis))))
  }
}

/** `DESCRIBE HISTORY graft.`p`` → one row per retained commit, with
  * the commit time as a real TIMESTAMP column (from the manifest `ts`
  * stamp; pre-stamp manifests fall back to file mtime).
  */
case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_time", TimestampType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("meta", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    TxTable.history(spark, path).map { case (v, action, meta) =>
      Row(v,
        new java.sql.Timestamp(TxTable.commitTimestamp(spark, path, v)),
        action,
        meta.toSeq.sorted.map { case (k, x) => s"$k=$x" }.mkString(","))
    }
}

/** The injected parser: graft statements parse here, everything else —
  * plans, expressions, identifiers, schemas — goes verbatim to the
  * session's own parser.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSql.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String) =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
}
