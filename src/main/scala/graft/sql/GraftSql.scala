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
  *   MERGE INTO graft.`/t` [AS] t USING (SELECT ...) [AS] s ON (keys)
  *     WHEN MATCHED [AND cond] THEN UPDATE SET c = expr, ... | SET *
  *     WHEN MATCHED [AND cond] THEN DELETE
  *     WHEN NOT MATCHED [AND cond] THEN INSERT *
  *     WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE
  *     WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = expr, ...
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
  * TxTable merge semantics), not an arbitrary ON predicate. The
  * clause form (`WHEN MATCHED [AND cond] THEN UPDATE SET …/DELETE`,
  * `WHEN NOT MATCHED [AND cond] THEN INSERT *`) lowers onto
  * [[TxTable.mergeInto]]: clause conditions and SET values are parsed
  * by the delegate parser's expression API and rewritten at the
  * EXPRESSION level — source-alias-qualified attributes (`s.x`) become
  * `src_x` (the name the mergeInto joined row exposes source columns
  * under), target-alias-qualified (`t.x`) drop the qualifier —
  * never by string surgery, so arbitrary nesting (CASE, functions,
  * subfield access) scopes correctly. Sub-plans
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
    ("""(?is)\s*MERGE\s+INTO\s+""" + Tbl +
      """(?:\s+(?:AS\s+)?(?!USING\b)([A-Za-z_]\w*))?\s+USING\s+(.+)""").r
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
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+""" + Tbl +
      """\s+FROM\s+'([^']+)'\s*(?:PATTERN\s+'([^']+)')?\s*""").r
  private val CloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+""" + Tbl +
      """\s+SHALLOW\s+CLONE\s+""" + Tbl +
      """\s*(?:VERSION\s+AS\s+OF\s+(\d+))?\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+""" + Tbl +
      """\s+(?:TO\s+)?VERSION\s+(?:AS\s+OF\s+)?(\d+)\s*""").r
  private val RestoreTsRe =
    ("""(?is)\s*RESTORE\s+""" + Tbl +
      """\s+(?:TO\s+)?TIMESTAMP\s+(?:AS\s+OF\s+)?'([^']+)'\s*""").r
  private val HistoryRe =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Tbl + """\s*""").r
  private val AddConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+ADD\s+CONSTRAINT\s+([A-Za-z]\w*)\s+CHECK\s*\((.+)\)\s*""").r
  private val DropConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+DROP\s+CONSTRAINT\s+([A-Za-z]\w*)\s*""").r
  private val AddBloomRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+ADD\s+BLOOM\s*FILTER\s*\(([^)]+)\)""" +
      """\s*(?:WITH\s*\(\s*bits\s*=\s*(\d+)\s*(?:,\s*hashes\s*=\s*(\d+)\s*)?\)\s*)?""").r
  private val DropBloomRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+DROP\s+BLOOM\s*FILTER\s*""").r
  private val AnalyzeRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+""" + Tbl +
      """\s*(?:COMPUTE\s+STATISTICS\s*)?""").r
  private val ClusterByRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+CLUSTER\s+BY\s*\(([^)]+)\)\s*""").r
  private val ClusterNoneRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+CLUSTER\s+BY\s+NONE\s*""").r
  private val RenameColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+RENAME\s+COLUMN\s+`?([A-Za-z_]\w*)`?\s+TO\s+`?([A-Za-z_]\w*)`?\s*""").r
  private val DropColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tbl +
      """\s+DROP\s+COLUMN\s+`?([A-Za-z_]\w*)`?\s*""").r

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
      // before CreateRe: both start with CREATE TABLE (CreateRe cannot
      // match a clone — it requires AS <query> — but the order makes
      // the precedence explicit)
      case CloneRe(dst, src, v) =>
        Some(GraftCloneCommand(dst, src,
          Option(v).map(_.toLong).getOrElse(-1L)))
      case CopyIntoRe(path, srcDir, pat) =>
        Some(GraftCopyIntoCommand(path, srcDir,
          Option(pat).getOrElse("*.parquet")))
      case CreateRe(replace, path, parts, query) =>
        Some(GraftCreateTableCommand(path, splitNames(parts),
          replace != null, delegate.parsePlan(query)))
      case MergeRe(path, tgtAlias, rest) =>
        // clause-form MERGE starts at the first top-level WHEN (CASE-
        // aware: a WHEN inside a CASE expression never splits a clause)
        val wi = topLevelIndexOf(rest, "WHEN", caseAware = true)
        if (wi < 0) {
          val (source, keys) = splitMergeSource(rest)
          Some(GraftMergeCommand(path, parseMergeSource(source, delegate),
            splitNames(keys)))
        } else {
          val (source, keys) = splitMergeSource(rest.substring(0, wi))
          val (srcSql, srcAlias) = splitSourceAlias(source)
          Some(parseMergeClauses(path, Option(tgtAlias), srcAlias,
            parseMergeSource(srcSql, delegate), splitNames(keys),
            rest.substring(wi), delegate))
        }
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
      case AddConstraintRe(path, name, check) =>
        Some(GraftAddConstraintCommand(path, name, check.trim))
      case DropConstraintRe(path, name) =>
        Some(GraftDropConstraintCommand(path, name))
      case AddBloomRe(path, cols, bits, hashes) =>
        Some(GraftAddBloomCommand(path, splitNames(cols),
          Option(bits).map(_.toInt).getOrElse(8192),
          Option(hashes).map(_.toInt).getOrElse(6)))
      case DropBloomRe(path) =>
        Some(GraftDropBloomCommand(path))
      case RenameColRe(path, from, to) =>
        Some(GraftRenameColumnCommand(path, from, to))
      case DropColRe(path, name) =>
        Some(GraftDropColumnCommand(path, name))
      case AnalyzeRe(path) =>
        Some(GraftAnalyzeCommand(path))
      case ClusterNoneRe(path) =>
        Some(GraftClusterByCommand(path, Nil))
      case ClusterByRe(path, cols) =>
        Some(GraftClusterByCommand(path, splitNames(cols)))
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

  /** The MERGE source as a plan: strip the outer parens only when they
    * wrap the WHOLE source — `(SELECT …) alias` keeps its parens and
    * parses as a FROM-item subquery (`SELECT * FROM (SELECT …) alias`),
    * instead of the mangled `SELECT …) alias` a blind stripSuffix would
    * produce.
    */
  private def parseMergeSource(source: String,
                               delegate: ParserInterface): LogicalPlan =
    if (source.startsWith("(") && closesAtEnd(source))
      delegate.parsePlan(source.stripPrefix("(").stripSuffix(")"))
    else delegate.parsePlan(s"SELECT * FROM $source")

  /** `(query) [AS] alias` / `tbl [AS] alias` / bare `tbl` → (source
    * text without the alias, the qualifier clause expressions may use
    * for source columns). A bare table name is its own qualifier
    * (standard SQL); a bare parenthesized query has none — clause
    * expressions must then reference source columns unqualified or the
    * statement must alias the source.
    */
  private def splitSourceAlias(source: String): (String, Option[String]) = {
    val s = source.trim
    val IdRe = """(?s)(.+?)\s+(?:(?i:AS)\s+)?([A-Za-z_]\w*)\s*""".r
    s match {
      case IdRe(head, alias)
          if head.trim.endsWith(")") || !head.trim.exists(_.isWhitespace) =>
        (head.trim, Some(alias))
      case _ =>
        (s, if (s.matches("""[A-Za-z_][\w.]*""")) // bare table name
          Some(s.split('.').last)
        else None)
    }
  }

  /** One parsed `WHEN …` clause of a conditional MERGE. */
  private final case class MergeClause(notMatched: Boolean,
                                       cond: Option[String], action: String,
                                       bySource: Boolean = false)

  /** The clause tail of a conditional MERGE —
    * `WHEN MATCHED [AND cond] THEN UPDATE SET …|DELETE` /
    * `WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT *` — lowered
    * onto [[GraftMergeIntoCommand]]. Clause-condition and SET
    * expressions are parsed by the DELEGATE parser and rewritten at the
    * expression level (source-alias-qualified attributes → `src_…`,
    * target-alias-qualified → bare), never by string surgery.
    */
  private def parseMergeClauses(path: String, tgtAlias: Option[String],
                                srcAlias: Option[String], source: LogicalPlan,
                                keys: Seq[String], clauseText: String,
                                delegate: ParserInterface): GraftMergeIntoCommand = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    // split on top-level WHEN; each piece is one clause body
    val bodies = {
      val starts = Iterator.iterate(
        topLevelIndexOf(clauseText, "WHEN", caseAware = true))(i =>
        topLevelIndexOf(clauseText, "WHEN", i + 4, caseAware = true))
        .takeWhile(_ >= 0).toSeq
      starts.zipAll(starts.drop(1), -1, clauseText.length).map {
        case (a, b) => clauseText.substring(a + 4, b)
      }
    }
    val MatchedRe = """(?is)\s*MATCHED\b(.*)""".r
    val NotMatchedRe =
      """(?is)\s*NOT\s+MATCHED(?:\s+BY\s+TARGET)?\b(.*)""".r
    val NotMatchedBySourceRe =
      """(?is)\s*NOT\s+MATCHED\s+BY\s+SOURCE\b(.*)""".r
    val clauses = bodies.map {
      case NotMatchedBySourceRe(rest) =>
        splitClause(rest, notMatched = true).copy(bySource = true)
      case NotMatchedRe(rest) => splitClause(rest, notMatched = true)
      case MatchedRe(rest) => splitClause(rest, notMatched = false)
      case other => sys.error(s"malformed MERGE clause: WHEN$other")
    }

    // expression-level alias scoping (matched clauses): source-alias
    // attributes become src_<name>, target-alias attributes drop the
    // qualifier, unqualified names bind to the target row (the joined
    // frame mergeInto evaluates clauses over exposes exactly that).
    // Results are wrapped as Columns IMMEDIATELY: a raw Expression
    // field on a command is walked by CheckAnalysis, which rejects the
    // (deliberately) unresolved clause attributes before run() ever
    // hands them to mergeInto's own analysis
    def scopedExpr(sql: String): Expression =
      delegate.parseExpression(sql).transformUp {
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            srcAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          UnresolvedAttribute(
            s"src_${a.nameParts(1)}" +: a.nameParts.drop(2))
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            tgtAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
      }
    def scoped(sql: String): org.apache.spark.sql.Column =
      GraftShim.toColumn(scopedExpr(sql))
    // insert-clause scoping: the condition evaluates over the SOURCE's
    // own columns — source-alias attributes drop the qualifier, target
    // references are meaningless (no matched target row) and refused
    def scopedInsert(sql: String): org.apache.spark.sql.Column =
      GraftShim.toColumn(delegate.parseExpression(sql).transformUp {
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            srcAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            tgtAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          sys.error(s"MERGE INTO graft: a WHEN NOT MATCHED condition " +
            s"cannot reference the target (${a.sql}) — there is no " +
            "matched target row")
      })
    // by-source scoping is the mirror of scopedInsert: the condition
    // evaluates over the TARGET row alone — target-alias attributes
    // drop the qualifier, source references are meaningless (no
    // matching source row) and refused
    def scopedBySource(sql: String): org.apache.spark.sql.Column =
      GraftShim.toColumn(delegate.parseExpression(sql).transformUp {
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            tgtAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            srcAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
          sys.error(s"MERGE INTO graft: a WHEN NOT MATCHED BY SOURCE " +
            s"condition cannot reference the source (${a.sql}) — there " +
            "is no matching source row")
      })

    var updateWhen: Option[org.apache.spark.sql.Column] = None
    var updateSet: Map[String, org.apache.spark.sql.Column] = Map.empty
    var updateSetStar = false
    var deleteWhen: Option[org.apache.spark.sql.Column] = None
    var insertWhen: Option[org.apache.spark.sql.Column] = None
    var insertUnmatched = false
    var deleteBySourceWhen: Option[org.apache.spark.sql.Column] = None
    var updateBySourceWhen: Option[org.apache.spark.sql.Column] = None
    var updateBySourceSet: Map[String, org.apache.spark.sql.Column] = Map.empty
    var sawUpdate, sawDelete, sawInsert = false
    var sawBySourceDelete, sawBySourceUpdate = false
    var bySourceUpdateBeforeDelete = false
    var updateBeforeDelete = false
    val UpdateRe = """(?is)\s*UPDATE\s+SET\s+(.+?)\s*""".r
    val DeleteActRe = """(?is)\s*DELETE\s*""".r
    val InsertStarRe = """(?is)\s*INSERT\s*\*\s*""".r
    val InsertRe = """(?is)\s*INSERT\b.*""".r
    clauses.foreach { c =>
      if (c.bySource) c.action match {
        case DeleteActRe() =>
          require(!sawBySourceDelete, "MERGE INTO graft supports ONE " +
            "WHEN NOT MATCHED BY SOURCE … DELETE clause")
          sawBySourceDelete = true
          deleteBySourceWhen =
            Some(c.cond.map(scopedBySource).getOrElse(lit(true)))
        case UpdateRe(sets) =>
          require(!sawBySourceUpdate, "MERGE INTO graft supports ONE " +
            "WHEN NOT MATCHED BY SOURCE … UPDATE clause")
          sawBySourceUpdate = true
          bySourceUpdateBeforeDelete = !sawBySourceDelete
          updateBySourceWhen =
            Some(c.cond.map(scopedBySource).getOrElse(lit(true)))
          require(sets.trim != "*",
            "MERGE INTO graft: a BY SOURCE update has no source row — " +
            "SET * is meaningless; list target assignments")
          updateBySourceSet = splitTopLevel(sets, ',').map { a =>
            val i = topLevelIndexOf(a, "=")
            require(i > 0, s"malformed SET assignment: $a")
            val lhs = a.substring(0, i).trim
            val parts = lhs.split('.').map(
              _.trim.stripPrefix("`").stripSuffix("`"))
            val name =
              if (parts.length == 2 &&
                  tgtAlias.exists(_.equalsIgnoreCase(parts(0)))) parts(1)
              else {
                require(parts.length == 1 ||
                  !srcAlias.exists(_.equalsIgnoreCase(parts(0))),
                  s"SET target must be a TARGET column, got $lhs")
                parts.last
              }
            name -> scopedBySource(a.substring(i + 1))
          }.toMap
        case other => sys.error(
          "MERGE INTO graft: WHEN NOT MATCHED BY SOURCE supports THEN " +
          s"DELETE or THEN UPDATE SET …, got: $other")
      }
      else (c.notMatched, c.action) match {
        case (false, UpdateRe(sets)) =>
          require(!sawUpdate, "MERGE INTO graft supports ONE WHEN " +
            "MATCHED … UPDATE clause")
          sawUpdate = true
          updateBeforeDelete = !sawDelete
          updateWhen = c.cond.map(scoped)
          if (sets.trim == "*") updateSetStar = true
          else updateSet = splitTopLevel(sets, ',').map { a =>
            val i = topLevelIndexOf(a, "=")
            require(i > 0, s"malformed SET assignment: $a")
            val lhs = a.substring(0, i).trim
            // `SET t.col = …` sheds the target alias; a source alias
            // on the LHS is a user error worth naming
            val parts = lhs.split('.').map(
              _.trim.stripPrefix("`").stripSuffix("`"))
            val name =
              if (parts.length == 2 &&
                  tgtAlias.exists(_.equalsIgnoreCase(parts(0)))) parts(1)
              else {
                require(parts.length == 1 ||
                  !srcAlias.exists(_.equalsIgnoreCase(parts(0))),
                  s"SET target must be a TARGET column, got $lhs")
                parts.last
              }
            name -> scoped(a.substring(i + 1))
          }.toMap
        case (false, DeleteActRe()) =>
          require(!sawDelete, "MERGE INTO graft supports ONE WHEN " +
            "MATCHED … DELETE clause")
          sawDelete = true
          deleteWhen = Some(c.cond.map(scoped).getOrElse(lit(true)))
        case (true, InsertStarRe()) =>
          require(!sawInsert, "MERGE INTO graft supports ONE WHEN NOT " +
            "MATCHED … INSERT clause")
          sawInsert = true
          insertUnmatched = true
          insertWhen = c.cond.map(scopedInsert)
        case (true, InsertRe()) => sys.error(
          "MERGE INTO graft: WHEN NOT MATCHED THEN INSERT takes `*` " +
          "(by-name insert of the source row) — project the source " +
          "instead of a column-list INSERT")
        case (nm, other) => sys.error(
          s"malformed MERGE clause action for WHEN " +
          s"${if (nm) "NOT MATCHED" else "MATCHED"}: $other")
      }
    }
    require(sawUpdate || sawDelete || sawInsert || sawBySourceDelete ||
        sawBySourceUpdate,
      "MERGE INTO graft needs at least one WHEN clause")
    GraftMergeIntoCommand(path, source, keys, updateWhen, updateSet,
      updateSetStar, deleteWhen, insertWhen, insertUnmatched,
      updateBeforeDelete, deleteBySourceWhen, updateBySourceWhen,
      updateBySourceSet, bySourceUpdateBeforeDelete)
  }

  /** `[AND cond] THEN action` → (cond?, action). The THEN that ends the
    * condition is the first top-level CASE-aware one — a CASE … WHEN …
    * THEN … END inside the condition never terminates it.
    */
  private def splitClause(rest: String, notMatched: Boolean): MergeClause = {
    val ti = topLevelIndexOf(rest, "THEN", caseAware = true)
    require(ti >= 0, s"MERGE clause is missing THEN: $rest")
    val pre = rest.substring(0, ti).trim
    val cond =
      if (pre.isEmpty) None
      else {
        val AndRe = """(?is)\s*AND\b(.*)""".r
        pre match {
          case AndRe(c) => Some(c.trim)
          case _ => sys.error(
            s"MERGE clause condition must follow AND, got: $pre")
        }
      }
    MergeClause(notMatched, cond, rest.substring(ti + 4))
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
      if (quote != 0) {
        // inside '…'/"…" a backslash escapes the next char; skipping
        // both keeps the scanner in sync with Spark's LEXER, which
        // consumes \\' as an escaped quote under EVERY config —
        // escapedStringLiterals=true only disables the post-lex
        // unescaping ('it\\'s' stays one token whose value keeps the
        // backslash; a literal ending in a lone backslash is a parse
        // error in Spark itself), so this scan is config-independent.
        // Backticks escape by doubling, which the close-and-reopen
        // below already handles.
        if (c == '\\' && quote != '`') i += 1
        else if (c == quote) quote = 0
      }
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
    * for alphabetic keywords); -1 if absent. With `caseAware`, also
    * skips matches inside a `CASE … END` expression (tracked only at
    * paren depth 0 — a parenthesized CASE is already depth-skipped), so
    * MERGE clause scanning can find the WHEN/THEN that delimit clauses
    * without tripping over the WHEN/THEN of a CASE in a condition.
    */
  private def topLevelIndexOf(s: String, kw: String, from: Int = 0,
                              caseAware: Boolean = false): Int = {
    var depth = 0
    var caseDepth = 0
    var quote: Char = 0
    var i = from.max(0)
    val alpha = kw.head.isLetter
    def isWord(at: Int, w: String): Boolean =
      s.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 ||
          !(s.charAt(at - 1).isLetterOrDigit || s.charAt(at - 1) == '_')) && {
          val after = at + w.length
          after >= s.length ||
            !(s.charAt(after).isLetterOrDigit || s.charAt(after) == '_')
        }
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        // inside '…'/"…" a backslash escapes the next char; skipping
        // both keeps the scanner in sync with Spark's LEXER, which
        // consumes \\' as an escaped quote under EVERY config —
        // escapedStringLiterals=true only disables the post-lex
        // unescaping ('it\\'s' stays one token whose value keeps the
        // backslash; a literal ending in a lone backslash is a parse
        // error in Spark itself), so this scan is config-independent.
        // Backticks escape by doubling, which the close-and-reopen
        // below already handles.
        if (c == '\\' && quote != '`') i += 1
        else if (c == quote) quote = 0
      }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
          if (caseAware && depth == 0) {
            // no index advance: word-boundary checks make the letters
            // INSIDE a matched CASE/END unable to re-match, and the
            // loop's own i += 1 keeps paren/quote tracking intact
            if (isWord(i, "CASE")) caseDepth += 1
            else if (caseDepth > 0 && isWord(i, "END")) caseDepth -= 1
          }
          if (depth == 0 && caseDepth == 0 &&
              s.regionMatches(true, i, kw, 0, kw.length)) {
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
      if (quote != 0) {
        // inside '…'/"…" a backslash escapes the next char; skipping
        // both keeps the scanner in sync with Spark's LEXER, which
        // consumes \\' as an escaped quote under EVERY config —
        // escapedStringLiterals=true only disables the post-lex
        // unescaping ('it\\'s' stays one token whose value keeps the
        // backslash; a literal ending in a lone backslash is a parse
        // error in Spark itself), so this scan is config-independent.
        // Backticks escape by doubling, which the close-and-reopen
        // below already handles.
        if (c == '\\' && quote != '`') i += 1
        else if (c == quote) quote = 0
      }
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

/** Conditional multi-clause `MERGE INTO graft.`p`` →
  * [[TxTable.mergeInto]]. Clause expressions arrive pre-scoped
  * (source-qualified attributes already rewritten to `src_…`); this
  * command only restores SQL's first-matching-clause precedence:
  * [[TxTable.mergeInto]] always evaluates DELETE before UPDATE, so when
  * the UPDATE clause textually preceded the DELETE clause, the delete
  * condition is AND-ed with the update condition's negation — a row
  * both clauses match then updates, exactly as SQL orders it.
  */
case class GraftMergeIntoCommand(path: String, source: LogicalPlan,
    keyCols: Seq[String],
    updateWhen: Option[org.apache.spark.sql.Column],
    updateSet: Map[String, org.apache.spark.sql.Column],
    updateSetStar: Boolean,
    deleteWhen: Option[org.apache.spark.sql.Column],
    insertWhen: Option[org.apache.spark.sql.Column],
    insertUnmatched: Boolean, updateBeforeDelete: Boolean,
    deleteBySourceWhen: Option[org.apache.spark.sql.Column] = None,
    updateBySourceWhen: Option[org.apache.spark.sql.Column] = None,
    updateBySourceSet: Map[String, org.apache.spark.sql.Column] = Map.empty,
    bySourceUpdateBeforeDelete: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.coalesce
    val src = GraftShim.ofRows(spark, source)
    val updSet =
      if (updateSetStar) // SET * = every source column, by name
        src.columns.toSeq.map(c => c -> TxTable.src(c)).toMap
      else updateSet
    val delW = deleteWhen.map { d =>
      if (updateBeforeDelete && updSet.nonEmpty)
        d && !coalesce(updateWhen.getOrElse(lit(true)), lit(false))
      else d
    }
    // same textual-precedence rewrite on the by-source side: mergeInto
    // evaluates the by-source DELETE first, so an UPDATE clause that
    // textually preceded it claims the overlap by negation
    val delBySrcW = deleteBySourceWhen.map { d =>
      if (bySourceUpdateBeforeDelete && updateBySourceSet.nonEmpty)
        d && !coalesce(updateBySourceWhen.getOrElse(lit(true)), lit(false))
      else d
    }
    Seq(Row(TxTable.mergeInto(spark, path, src, keyCols,
      updateWhen = updateWhen, updateSet = updSet, deleteWhen = delW,
      insertWhen = insertWhen,
      insertUnmatched = insertUnmatched,
      deleteBySourceWhen = delBySrcW,
      updateBySourceWhen = updateBySourceWhen,
      updateBySourceSet = updateBySourceSet)))
  }
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
    // liquid-style: a declared CLUSTER BY makes bare OPTIMIZE
    // re-cluster; without one it stays the bin-packing compaction
    Seq(Row(
      if (TxTable.clusteringColumns(spark, path).nonEmpty)
        TxTable.optimize(spark, path, Nil, where = where)
      else TxTable.compact(spark, path, where = where)))
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
    AttributeReference("schema", StringType, nullable = false)(),
    AttributeReference("constraints", StringType, nullable = false)(),
    AttributeReference("bloom_filter", StringType, nullable = false)(),
    AttributeReference("clustering", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, n, bytes, parts, schema) = TxTable.detail(spark, path)
    val cons = TxTable.constraints(spark, path).toSeq.sorted
      .map { case (name, e) => s"$name CHECK ($e)" }.mkString("; ")
    val bloom = TxTable.bloomFilterConfig(spark, path)
      .map { case (cols, bits, k) =>
        s"${cols.mkString(",")} (bits=$bits, hashes=$k)" }.getOrElse("")
    Seq(Row(v, n, bytes, parts.mkString(","), schema.simpleString,
      cons, bloom, TxTable.clusteringColumns(spark, path).mkString(",")))
  }
}

/** `RESTORE graft.`p` VERSION AS OF v` → [[TxTable.restore]]. */
/** `COPY INTO graft.`t` FROM '<dir>' [PATTERN '<glob>']` →
  * [[TxTable.copyInto]]: idempotent bulk file ingestion — each
  * matching source file loads exactly once across re-runs. Returns
  * one row (version, n_loaded, n_skipped).
  */
case class GraftCopyIntoCommand(path: String, sourceDir: String,
    pattern: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("n_loaded", LongType, nullable = false)(),
    AttributeReference("n_skipped", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, loaded, skipped) = TxTable.copyInto(spark, path, sourceDir,
      pattern)
    Seq(Row(v, loaded.size.toLong, skipped.toLong))
  }
}

/** `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src` [VERSION AS OF
  * v]` → [[TxTable.cloneAt]]: a zero-copy (hard-linked) independent
  * table at the source's pinned snapshot. Returns the clone's v1.
  */
case class GraftCloneCommand(dstPath: String, srcPath: String,
    version: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.cloneAt(spark, srcPath, dstPath, version)))
}

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

/** `ALTER TABLE graft.`p` ADD CONSTRAINT name CHECK (expr)` →
  * [[TxTable.addConstraint]]: validates existing rows, then a
  * metadata-only commit; every later data commit enforces the check.
  * (Spark's own ALTER grammar has no CONSTRAINT form for V2 catalogs,
  * so this statement lives here with the other graft DDL.)
  */
case class GraftAddConstraintCommand(path: String, name: String,
                                     check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.addConstraint(spark, path, name, check)))
}

/** `ALTER TABLE graft.`p` DROP CONSTRAINT name` →
  * [[TxTable.dropConstraint]].
  */
case class GraftDropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.dropConstraint(spark, path, name)))
}

/** `ALTER TABLE graft.`p` ADD BLOOM FILTER (c1, c2) [WITH (bits=N[,
  * hashes=K])]` → [[TxTable.setBloomFilters]]: metadata-only commit;
  * every later data commit writes per-file blooms for the columns and
  * point lookups skip files that provably lack the value.
  */
case class GraftAddBloomCommand(path: String, cols: Seq[String],
                                bits: Int, hashes: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.setBloomFilters(spark, path, cols, bits, hashes)))
}

/** `ALTER TABLE graft.`p` DROP BLOOM FILTER` →
  * [[TxTable.dropBloomFilters]].
  */
case class GraftDropBloomCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.dropBloomFilters(spark, path)))
}

/** `ANALYZE TABLE graft.`p` [COMPUTE STATISTICS]` →
  * [[TxTable.analyze]]: backfill missing per-file stats and bloom
  * tokens as one metadata-only commit — no data file touched.
  */
case class GraftAnalyzeCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.analyze(spark, path)))
}

/** `ALTER TABLE graft.`p` CLUSTER BY (c1, c2)` / `CLUSTER BY NONE` →
  * [[TxTable.setClusteringColumns]] / [[TxTable.dropClusteringColumns]]
  * — the standing OPTIMIZE intent; a bare `OPTIMIZE graft.`p`` then
  * re-clusters instead of merely bin-packing.
  */
case class GraftClusterByCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(
      if (cols.isEmpty) TxTable.dropClusteringColumns(spark, path)
      else TxTable.setClusteringColumns(spark, path, cols)))
}

/** `ALTER TABLE graft.`p` RENAME COLUMN a TO b` →
  * [[TxTable.renameColumn]] (copy-on-write rewrite commit).
  */
case class GraftRenameColumnCommand(path: String, from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.renameColumn(spark, path, from, to)))
}

/** `ALTER TABLE graft.`p` DROP COLUMN c` → [[TxTable.dropColumn]]
  * (copy-on-write rewrite commit, cdf=0).
  */
case class GraftDropColumnCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSql.versionAttr(nullable = false)
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.dropColumn(spark, path, name)))
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
    // historyDetailed carries the ts from the same manifest read — a
    // commitTimestamp call per row would re-read every manifest
    TxTable.historyDetailed(spark, path).map { case (v, ts, action, meta) =>
      Row(v, new java.sql.Timestamp(ts), action,
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
