package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the hottest vector kernel: float-array
  * dot product in double precision, sequential accumulation.
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate per element through lambda-variable
  * indirection and sit outside whole-stage codegen — for a 2M-pair
  * similarity join that interpretive overhead dominates. This expression
  * generates a tight primitive loop via doGenCode (plus a matching
  * interpreted eval), the "(b) custom Catalyst Expression" tier of the
  * build brief's preference order.
  *
  * Semantics match the higher-order-function formulation bit-for-bit
  * (and therefore the DuckDB oracles): elements cast float→double,
  * products summed left-to-right from index 0. Null if either side is
  * null; errors on length mismatch (a wrong-dimension join should fail
  * loudly, not silently truncate).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  /** Element type per side, resolved lazily (children are unresolved at
    * construction). Float and double arrays are supported, mixed freely
    * (the LSH path dots float vectors against double hyperplanes).
    */
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(FloatType, _) => FloatType
    case ArrayType(DoubleType, _) => DoubleType
    case other => throw new IllegalArgumentException(
      s"graft_vec_dot: expected array<float|double>, got $other")
  }
  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  /** A null ELEMENT nulls the whole dot product — matching the
    * `aggregate(zip_with(...))` reference formulation (null product
    * poisons the sum) and the SQL oracles. The per-element null check
    * is only paid when a side's array type admits null elements; dense
    * parquet embeddings (containsNull=false) keep the tight loop.
    */
  @transient private lazy val checkElementNulls =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })
  override def nullable: Boolean =
    left.nullable || right.nullable || checkElementNulls

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"graft_vec_dot: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkElementNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (leftIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      val nullCheck =
        if (checkElementNulls)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_vec_dot: dimension mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ($getX) * ($getY);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot = copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API handle on the native kernel — no registration needed. */
  def vecDot(a: Column, b: Column): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    GraftShim.toColumn(FloatVecDot(
      GraftShim.toExpression(spark, a), GraftShim.toExpression(spark, b)))
  }
}

/** SparkSessionExtensions installer for pure-SQL users:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) exposes
  * `graft_vec_dot(a, b)` plus the sketch family —
  * `graft_kll_sketch_agg(x[, k])`, `graft_kll_union_agg(kll[, k])`,
  * `graft_kll_quantiles(kll, p...)`, `graft_freq_items_agg(s[, m])`,
  * `graft_freq_union_agg(freq[, m])`, `graft_freq_top_items(freq, k)`
  * — in SQL. Aggregate builders return the bare AggregateFunction;
  * the analyzer wraps it (standard FunctionRegistry contract).
  *
  * Also injects [[graft.sql.GraftSqlParser]]: the TxTable DDL/DML
  * statements (`CREATE TABLE graft.`p` ... AS`, `MERGE INTO`,
  * `UPDATE`, `DELETE FROM`, `OPTIMIZE [ZORDER BY]`, `VACUUM`,
  * `RESTORE`, `DESCRIBE HISTORY`) become plain `spark.sql(...)`
  * calls routing to the [[graft.ops.TxTable]] commit protocol — and
  * the incremental table-valued functions
  * `graft_changes('/t', from[, to])` (the CHANGE FEED: row-level
  * insert/update_preimage/update_postimage/delete for DML commits,
  * file-granular for appends — see [[graft.ops.TxTable.readChanges]])
  * and `graft_appended('/t', from[, to])` (delta-only incremental
  * read), which compose into any SQL query with I/O proportional to
  * the changed rows/files.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Foldable integer argument (e.g. a sketch size), else `default`. */
  private def intArg(args: Seq[Expression], i: Int, default: Int): Int =
    if (args.length <= i) default
    else args(i) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be a literal integer, got $other")
    }

  private def doubleArgs(args: Seq[Expression]): Seq[Double] =
    args.map {
      case e if e.foldable => e.eval() match {
        // SQL fractional literals parse as Decimal, not Double
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"quantile probabilities must be numbers, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"quantile probabilities must be literal numbers, got $other")
    }

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name), builder)

  /** Foldable string argument (a table path). */
  private def strArg(args: Seq[Expression], i: Int, what: String): String =
    args(i) match {
      case e if e.foldable && e.eval() != null => e.eval().toString
      case other => throw new IllegalArgumentException(
        s"$what must be a literal string, got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, what: String): Long =
    args(i) match {
      case e if e.foldable => e.eval().asInstanceOf[Number].longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }

  private def tvf(name: String,
                  builder: Seq[Expression] => org.apache.spark.sql.catalyst
                    .plans.logical.LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    // metadata-only COUNT(*): an ungrouped, unfiltered count-star over
    // a graft snapshot collapses to the manifest's row counts — no scan
    ext.injectOptimizerRule(_ => graft.plans.MetadataAggregateRule)
    // table-valued incremental surfaces: CDC and delta reads compose
    // into plain SQL — `SELECT * FROM graft_changes('/t', 1, 5)` —
    // with I/O proportional to the CHANGED files, never a rescan
    ext.injectTableFunction(tvf("graft_changes", args => {
      val s = org.apache.spark.sql.SparkSession.active
      graft.ops.TxTable.readChanges(s, strArg(args, 0, "table path"),
        longArg(args, 1, "fromVersion"),
        if (args.length > 2) longArg(args, 2, "toVersion") else -1L)
        .queryExecution.logical
    }))
    ext.injectTableFunction(tvf("graft_appended", args => {
      val s = org.apache.spark.sql.SparkSession.active
      graft.ops.TxTable.readAppended(s, strArg(args, 0, "table path"),
        longArg(args, 1, "fromVersion"),
        if (args.length > 2) longArg(args, 2, "toVersion") else -1L)
        .queryExecution.logical
    }))
    // Delta's spelling of the same feed: `table_changes('t', v1 [, v2])`
    // with an INCLUSIVE starting version (Delta semantics; our
    // graft_changes keeps readChanges's exclusive fromV). The path may
    // be bare or wrapped in the graft.`…` table marker so users can
    // paste the same identifier they use in DML statements.
    ext.injectTableFunction(tvf("table_changes", args => {
      val s = org.apache.spark.sql.SparkSession.active
      val raw = strArg(args, 0, "table path")
      val path = """(?s)\s*graft\.`([^`]+)`\s*""".r
        .findFirstMatchIn(raw).map(_.group(1)).getOrElse(raw)
      val start = longArg(args, 1, "startingVersion")
      require(start >= 1,
        s"table_changes: startingVersion must be >= 1 (versions are " +
          s"1-based), got $start")
      graft.ops.TxTable.readChanges(s, path, start - 1,
        if (args.length > 2) longArg(args, 2, "endingVersion") else -1L)
        .queryExecution.logical
    }))
    // retrieval as a table: `SELECT * FROM graft_search('/idx',
    // 'merge join', 10)` serves BM25 from the persisted inverted
    // index (manifest-pruned posting read, carried corpus stats) —
    // query_id is the query text so multi-query SQL composes via
    // UNION ALL of TVF calls
    ext.injectTableFunction(tvf("graft_search", args => {
      val s = org.apache.spark.sql.SparkSession.active
      val text = strArg(args, 1, "query text")
      graft.text.Bm25.searchIndexed(s, strArg(args, 0, "index path"),
          Seq((text, text)), topK = intArg(args, 2, 10))
        .queryExecution.logical
    }))
    // snapshot diff as a table: `SELECT * FROM graft_diff('/t', 1, 2)`
    // — EXCEPT ALL both ways with multiset multiplicity (see
    // TxTable.diff)
    ext.injectTableFunction(tvf("graft_diff", args => {
      val s = org.apache.spark.sql.SparkSession.active
      graft.ops.TxTable.diff(s, strArg(args, 0, "table path"),
          longArg(args, 1, "fromVersion"), longArg(args, 2, "toVersion"))
        .queryExecution.logical
    }))
    ext.injectFunction(
      (FunctionIdentifier("graft_vec_dot"),
        new ExpressionInfo(classOf[FloatVecDot].getName, "graft_vec_dot"),
        (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    ext.injectFunction(fn("graft_kll_sketch_agg",
      args => KllDoublesAgg(args(0), intArg(args, 1, 200))))
    ext.injectFunction(fn("graft_kll_union_agg",
      args => KllMergeAgg(args(0), intArg(args, 1, 200))))
    ext.injectFunction(fn("graft_kll_quantiles",
      args => KllQuantilesExpr(args(0), doubleArgs(args.tail))))
    ext.injectFunction(fn("graft_freq_items_agg",
      args => FreqItemsAgg(args(0), intArg(args, 1, 1024))))
    ext.injectFunction(fn("graft_freq_union_agg",
      args => FreqMergeAgg(args(0), intArg(args, 1, 1024))))
    ext.injectFunction(fn("graft_freq_top_items",
      args => FreqTopItemsExpr(args(0), intArg(args, 1, 10))))
  }
}
