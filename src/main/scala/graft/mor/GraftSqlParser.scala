package graft.mor

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.lake.{MorTable, PartitionedMorTable}

/** Delegating SQL parser for the engine's DDL spellings Spark's grammar
  * lacks — today exactly one statement, the Delta-spelled shallow clone:
  *
  * {{{ CREATE TABLE [IF NOT EXISTS] dst SHALLOW CLONE src [LOCATION 'p'] }}}
  *
  * Everything else falls through to the session parser verbatim (the
  * standard extension-parser shape: one regex gate, zero cost on the
  * non-matching path). The bootstrap sibling needs no parser — `CREATE
  * TABLE … USING graft.mor OPTIONS (bootstrap '<dir>')` is already plain
  * Spark DDL routed by [[DefaultSource]]. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([\w.`]+)\s+SHALLOW\s+CLONE\s+([\w.`]+)""" +
      """(?:\s+LOCATION\s+'([^']*)')?\s*;?\s*""").r

  /** Delta-spelled table maintenance: `OPTIMIZE t [ZORDER BY (c1, c2)]`
    * (→ compact / z-order clustering compaction) and `VACUUM t` (→
    * clean). Same routing as the CALL procedures — these are the
    * spellings an analyst's runbook already contains. */
  private val OptimizeStmt =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)""" +
      """(?:\s+ZORDER\s+BY\s+\(?\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\)?)?\s*;?\s*""").r
  private val VacuumStmt = """(?is)\s*VACUUM\s+([\w.`]+)\s*;?\s*""".r

  /** Hudi 1.0 index DDL: `CREATE INDEX record_index ON t` builds the
    * record-level index at the current compaction boundary;
    * `CREATE INDEX <name> ON t (c1[, c2])` declares secondary bloom
    * index columns (published by the NEXT compaction's stats pass — the
    * async-indexer contract). */
  private val CreateIndexStmt =
    ("""(?is)\s*CREATE\s+INDEX\s+([\w`]+)\s+ON\s+(?:TABLE\s+)?([\w.`]+)""" +
      """(?:\s*\(\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\))?\s*;?\s*""").r

  private val ShowIndexesStmt =
    """(?is)\s*SHOW\s+INDEXES\s+(?:ON|FROM|IN)\s+([\w.`]+)\s*;?\s*""".r

  private def clean(ident: String): String = ident.replace("`", "")

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CloneStmt(ine, dst, src, loc) =>
      GraftCloneTableCommand(clean(dst), clean(src), Option(loc), ine != null)
    case OptimizeStmt(tbl, zcols) =>
      GraftOptimizeCommand(clean(tbl),
        Option(zcols).toSeq.flatMap(_.split(',')).map(c => clean(c.trim))
          .filter(_.nonEmpty))
    case VacuumStmt(tbl) => GraftVacuumCommand(clean(tbl))
    case CreateIndexStmt(name, tbl, cols) =>
      GraftCreateIndexCommand(clean(name), clean(tbl),
        Option(cols).toSeq.flatMap(_.split(','))
          .map(c => clean(c.trim)).filter(_.nonEmpty))
    case ShowIndexesStmt(tbl) => GraftShowIndexesCommand(clean(tbl))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `CREATE TABLE dst SHALLOW CLONE src [LOCATION 'p']` — the SQL spelling
  * of [[MorTable.cloneTo]] / [[PartitionedMorTable.cloneTo]] (the CALL
  * `graft_ops.clone_table` twin): resolves the source through either
  * table surface — a `graft.mor` session-catalog table (its OPTIONS give
  * path/keys/partition) or a [[graft.GraftCatalog]]-registered handle —
  * clones zero-copy to LOCATION (default: `<warehouse>/<dst>`), and
  * registers the clone on the SAME surface the source came from, so the
  * new name is immediately SELECT-able. All clone semantics (compaction-
  * boundary refusals, the `clone_<dst>` source pin, divergence isolation)
  * live in the engine verb — this command only routes. `IF NOT EXISTS`
  * downgrades an existing destination NAME to a no-op; an existing
  * destination DIRECTORY is refused by the verb itself. */
case class GraftCloneTableCommand(dst: String, src: String,
                                  location: Option[String],
                                  ifNotExists: Boolean)
    extends LeafRunnableCommand {

  private def tid(n: String): TableIdentifier = n.split('.') match {
    case Array(t) => TableIdentifier(t)
    case Array(db, t) => TableIdentifier(t, Some(db))
    case _ => throw new IllegalArgumentException(
      s"SHALLOW CLONE: cannot parse table name '$n'")
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val dstId = tid(dst)
    val dstTaken = spark.sessionState.catalog.tableExists(dstId) ||
      graft.GraftCatalog.lookup(spark, dst).isDefined
    if (dstTaken) {
      if (ifNotExists) return Seq.empty
      throw new IllegalArgumentException(
        s"SHALLOW CLONE: destination table '$dst' already exists")
    }
    val dstPath = location.getOrElse(
      new Path(spark.sessionState.conf.warehousePath,
        dstId.identifier).toString)
    MorDml.morOptions(spark, tid(src)) match {
      case Some(opts) =>
        val path = opts.getOrElse("path", throw new IllegalArgumentException(
          s"graft.mor table $src has no path option"))
        val keys = opts.getOrElse("keys", "").split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        opts.get("partition") match {
          case Some(p) =>
            PartitionedMorTable.resolve(spark, path, keys, p).cloneTo(dstPath)
          case None =>
            MorTable.resolve(spark, path, keys).cloneTo(dstPath)
        }
        // register the clone as its own graft.mor catalog table: the
        // same keys/partition declaration over the new path
        val partOpt = opts.get("partition")
          .map(p => s", partition '$p'").getOrElse("")
        spark.sql(s"CREATE TABLE ${dstId.quotedString} USING `graft.mor` " +
          s"OPTIONS (path '$dstPath', keys '${keys.mkString(",")}'$partOpt)")
        ()
      case None => graft.GraftCatalog.handleOf(spark, src) match {
        case Some(Left(t)) =>
          graft.GraftCatalog.register(spark, dst, t.cloneTo(dstPath))
        case Some(Right(p)) =>
          graft.GraftCatalog.register(spark, dst, p.cloneTo(dstPath))
        case None => throw new IllegalArgumentException(
          s"SHALLOW CLONE: source '$src' is neither a graft.mor catalog " +
            "table nor a GraftCatalog-registered handle")
      }
    }
    Seq.empty
  }
}

/** Shared table resolution for the maintenance DDL: a `graft.mor`
  * session-catalog table (OPTIONS give path/keys/partition) or a
  * [[graft.GraftCatalog]]-registered handle — the same two surfaces the
  * CALL procedures and SHALLOW CLONE resolve. */
private[mor] object GraftMaintenance {
  private def tid(n: String): TableIdentifier = n.split('.') match {
    case Array(t) => TableIdentifier(t)
    case Array(db, t) => TableIdentifier(t, Some(db))
    case _ => throw new IllegalArgumentException(s"cannot parse table name '$n'")
  }

  def resolve(spark: SparkSession, name: String, verb: String)
      : Either[MorTable, PartitionedMorTable] =
    MorDml.morOptions(spark, tid(name)) match {
      case Some(opts) =>
        val path = opts.getOrElse("path", throw new IllegalArgumentException(
          s"graft.mor table $name has no path option"))
        val keys = opts.getOrElse("keys", "").split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        opts.get("partition") match {
          case Some(p) => Right(PartitionedMorTable.resolve(spark, path, keys, p))
          case None => Left(MorTable.resolve(spark, path, keys))
        }
      case None => graft.GraftCatalog.handleOf(spark, name).getOrElse(
        throw new IllegalArgumentException(
          s"$verb: '$name' is neither a graft.mor catalog table nor a " +
            "GraftCatalog-registered handle"))
    }
}

/** `OPTIMIZE t [ZORDER BY (c1, c2)]` — the Delta maintenance spelling
  * routed onto the engine's compaction verbs: plain → [[MorTable.compact]]
  * (partitioned: every child), ZORDER BY → [[MorTable.compactZOrder]]
  * (partitioned: every child re-clustered). Semantics — boundary
  * creation, manifest stats/blooms publication, record-index refresh —
  * all live in the verbs; this command only routes. */
case class GraftOptimizeCommand(table: String, zorderCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftMaintenance.resolve(spark, table, "OPTIMIZE") match {
      case Left(t) =>
        if (zorderCols.nonEmpty) t.compactZOrder(zorderCols) else t.compact()
      case Right(p) =>
        if (zorderCols.nonEmpty)
          p.compactZOrderPartitions(zorderCols, dueOnly = false,
            only = p.partitions())
        else p.compactPartitions(p.partitions())
    }
    Seq.empty
  }
}

/** `VACUUM t` — the Delta spelling of [[MorTable.clean]]: remove
  * unreferenced files past the retention point (savepoint pins, unfolded
  * stragglers and the live boundary all survive — the verb's contract). */
case class GraftVacuumCommand(table: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftMaintenance.resolve(spark, table, "VACUUM").fold(_.clean(), _.clean())
    Seq.empty
  }
}

/** `CREATE INDEX …` — the Hudi 1.0 index-DDL spellings:
  *
  *  - `CREATE INDEX record_index ON t` → [[MorTable.buildRecordIndex]]
  *    (both table forms; refuses before the first compaction like the
  *    verb itself — indexes describe a compacted base).
  *  - `CREATE INDEX <name> ON t (c1[, c2])` → declare secondary bloom
  *    index columns ([[MorTable.indexColumns]]) and compact, so the
  *    per-file filters EXIST when the statement returns (Hudi's
  *    CREATE INDEX runs the indexer synchronously); the build rides the
  *    compaction's single stats pass, never a dedicated scan, and later
  *    plain compactions inherit the column set from the manifest header.
  *    Single-table form only. */
/** `SHOW INDEXES ON t` — the index family's observability verb: one row
  * per index at the CURRENT compaction boundary (a declared-but-not-yet-
  * compacted secondary column set is not listed — what you see is what
  * the reads can prune on). Partitioned tables report per child; a
  * metadata-only listing, zero data jobs. */
case class GraftShowIndexesCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("index_name", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("kind", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("columns", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    def rowsOf(t: MorTable, part: String): Seq[Row] = {
      val rli =
        if (t.hasRecordIndex())
          Seq(Row("record_index", "record_level", t.keyCols.mkString(","), part))
        else Nil
      rli ++ t.indexedColumns().map(c =>
        Row(s"${c}_bloom", "secondary_bloom", c, part))
    }
    GraftMaintenance.resolve(spark, table, "SHOW INDEXES") match {
      case Left(t) => rowsOf(t, "")
      case Right(p) => p.partitions().flatMap(v => rowsOf(p.child(v), v))
    }
  }
}

case class GraftCreateIndexCommand(name: String, table: String,
                                   cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val resolved = GraftMaintenance.resolve(spark, table, "CREATE INDEX")
    if (cols.isEmpty) {
      require(name.equalsIgnoreCase("record_index"),
        s"CREATE INDEX $name: a column-free index must be the " +
          "record_index; secondary indexes need a column list")
      resolved.fold(_.buildRecordIndex(), _.buildRecordIndex())
    } else {
      resolved match {
        case Left(t) => t.indexColumns(cols).compact()
        case Right(_) => throw new IllegalArgumentException(
          "CREATE INDEX (columns): secondary bloom indexes are declared " +
            "per child table; partitioned-table declaration is not " +
            "supported — declare on the child or use the unpartitioned form")
      }
    }
    Seq.empty
  }
}
