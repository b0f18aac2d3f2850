package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxTable

/** Path-addressed `TableCatalog` for TxTables — the missing piece that
  * makes graft tables first-class in PLAIN SQL queries, Delta-style:
  *
  * {{{
  *   spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *
  *   SELECT * FROM graft.`/lake/events`
  *   SELECT * FROM graft.`/lake/events` VERSION AS OF 3   -- time travel
  *   INSERT INTO graft.`/lake/events` SELECT ...          -- tx append
  *   INSERT OVERWRITE graft.`/lake/events` SELECT ...     -- tx overwrite
  *   CREATE TABLE graft.`/lake/new` (id BIGINT, v STRING) -- empty table
  * }}}
  *
  * The identifier IS the filesystem path (backticked because of the
  * slashes); there are no namespaces to manage, `listTables` is empty
  * by construction, and every read resolves the manifest exactly once
  * into the same [[GraftTable]] the DataFrame source uses — SQL,
  * DataFrame, and streaming access share one table implementation and
  * one commit protocol. Writes through the catalog (INSERT INTO /
  * OVERWRITE) ride the V1Write fallback into [[TxTable.append]] /
  * [[TxTable.overwrite]]. `CREATE TABLE` commits a zero-row
  * single-file snapshot, so the schema lives in the table itself (the
  * standard create-then-INSERT flow needs no side-channel metadata);
  * partitioned CREATE goes through the DataFrame writer's
  * `partitionBy`, which owns partitioned layouts.
  *
  * [[GraftSqlParser]] intercepts the graft DML statements (MERGE /
  * UPDATE / DELETE / OPTIMIZE / ...) BEFORE catalog resolution, so the
  * two surfaces compose: DQL and INSERT resolve here, table
  * management routes straight to the TxTable calls.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String = {
    require(ident.namespace().isEmpty,
      s"graft tables are addressed by path only: ${catalogName}.`/path` " +
        s"(got namespace ${ident.namespace().mkString(".")})")
    ident.name()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no namespace to enumerate

  override def tableExists(ident: Identifier): Boolean =
    TxTable.exists(SparkSession.active, pathOf(ident))

  override def loadTable(ident: Identifier): Table =
    loadVersion(ident, None)

  /** `VERSION AS OF v` time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadVersion(ident, Some(version.toLong))

  private def loadVersion(ident: Identifier, version: Option[Long]): Table = {
    val path = pathOf(ident)
    val spark = SparkSession.active
    if (TxTable.versions(spark, path).isEmpty)
      throw new NoSuchTableException(ident)
    new GraftTable(path, spark,
      Some(GraftResolve.resolve(spark, path, version)))
  }

  /** `CREATE TABLE graft.`/p` (cols)`: a zero-row single-file snapshot
    * carrying the schema — created empty, filled by INSERT.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    val spark = SparkSession.active
    require(partitions.isEmpty,
      "CREATE partitioned graft tables via the DataFrame writer's " +
        "partitionBy (partitioned layouts are owned by the writer)")
    if (TxTable.exists(spark, path))
      throw new TableAlreadyExistsException(ident)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .coalesce(1)
    TxTable.overwrite(spark, path, empty)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported for graft tables — schema changes " +
        "go through the TxTable API (overwrite/mergeSchema)")

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    val spark = SparkSession.active
    if (!TxTable.exists(spark, path)) false
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME is not supported — a graft table's identity IS its path")
}
