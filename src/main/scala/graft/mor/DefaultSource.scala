package graft.mor

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, InsertableRelation, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType
import graft.lake.{MorTable, PartitionedMorTable}

/** Spark DataSource for MOR lake tables — the cross-engine/cross-session
  * metadata seam (the reference registers its Hudi table in Glue so a
  * DIFFERENT engine, Athena, queries it live:
  * `lib/rds-cdc-flink-hudi-stack.ts:458-519`, `README.md:116-124`).
  *
  * Surface:
  * {{{
  *   spark.read.format("graft.mor").option("keys", "user_id").load(path)
  *   df.write.format("graft.mor").option("keys", "user_id").mode("append").save(path)
  *   spark.sql("CREATE TABLE t USING graft.mor OPTIONS (path '...', keys 'user_id')")
  *   // PARTITIONED BY form (routes through PartitionedMorTable):
  *   ....option("partition", "event_type")             // reads AND writes
  *   ....option("partitionValues", "click,purchase")   // pruned read
  * }}}
  * The CREATE TABLE form persists (path, keys) in the shared external
  * catalog — every session of the application (and, with a Hive metastore,
  * every future application) resolves `t` by name, the Glue analog.
  *
  * Freshness: the relation is just (path, keys); `buildScan` re-resolves
  * the table's CURRENT timeline on every query execution, so a catalog
  * table — even one cached in the session's relation cache — always reads
  * the latest commit, like Athena reading a Glue-registered Hudi table.
  * (Schema is pinned at relation creation, standard DataSource behavior.)
  *
  * This is the V1 `RelationProvider` seam (the one Hudi's own Spark
  * integration began with) rather than DSv2: the MOR snapshot is a
  * base ⟕ deltas merge that needs a key shuffle, which a DSv2
  * `PartitionReader` cannot express — `buildScan` may run a full
  * distributed plan, so the merge stays a Spark plan, not a reimplemented
  * reader.
  *
  * Writes: `mode("append")` = keyed upsert (the only MOR write mode;
  * SaveMode.Append maps to upsert exactly like Hudi's default). `keys` is
  * required on first write; `order` (comma-separated columns, default the
  * keys) breaks ties within the batch.
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-mor"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val (path, keys) = pathAndKeys(parameters)
    MorRelation(sqlContext, path, keys,
      asOf = parameters.get("asOf").map(_.toLong),
      sinceSeq = parameters.get("sinceSeq").map(_.toLong),
      partitionCol = parameters.get("partition"),
      partitionValues = partitionValues(parameters))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val (path, keys) = pathAndKeys(parameters)
    val order = parameters.get("order")
      .map(_.split(",").toSeq.map(_.trim)).getOrElse(keys)
    val partCol = parameters.get("partition")
    def exists = partCol match {
      case Some(p) =>
        new PartitionedMorTable(sqlContext.sparkSession, path, keys, p)
          .partitions().nonEmpty
      case None => MorTable(sqlContext.sparkSession, path, keys).timeline().nonEmpty
    }
    def upsert(): Unit = partCol match {
      case Some(p) =>
        new PartitionedMorTable(sqlContext.sparkSession, path, keys, p)
          .upsert(data, order.map(col)): Unit
      case None =>
        MorTable(sqlContext.sparkSession, path, keys)
          .upsert(data, order.map(col)): Unit
    }
    def drop(): Unit = partCol match {
      case Some(p) =>
        new PartitionedMorTable(sqlContext.sparkSession, path, keys, p).drop()
      case None => MorTable(sqlContext.sparkSession, path, keys).drop()
    }
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"graft.mor table already exists: $path")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite => drop(); upsert()
      case _ => upsert() // Append / first write: keyed upsert, Hudi's default
    }
    MorRelation(sqlContext, path, keys, partitionCol = partCol)
  }

  private def partitionValues(parameters: Map[String, String]): Seq[String] =
    parameters.get("partitionValues")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)

  private def pathAndKeys(parameters: Map[String, String]): (String, Seq[String]) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft.mor requires a path"))
    val keys = parameters.getOrElse("keys",
      throw new IllegalArgumentException(
        "graft.mor requires OPTIONS (keys 'k1[,k2]') — the record key columns"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    (path, keys)
  }
}

/** The (path, keys) relation: schema pinned at creation, data resolved
  * from the CURRENT timeline on every scan.
  *
  * Read modes (mirroring the engine's read surface):
  *  - default — latest snapshot;
  *  - `asOf` = commit seq — time-travel read ([[MorTable.readAt]];
  *    unpartitioned tables only);
  *  - `sinceSeq` = commit seq/token — incremental pull
  *    ([[MorTable.readIncremental]]: net effect of newer commits, latest
  *    image per touched key, `_deleted` tombstones included so a consumer
  *    sees what vanished — the Hudi incremental-query analog).
  *
  * `partition` = column name routes everything through a
  * [[PartitionedMorTable]] (the `PARTITIONED BY` lake form);
  * `partitionValues` = comma list prunes the scan to those partitions
  * without touching the others' timelines. */
final case class MorRelation(sqlContext: SQLContext, path: String,
                             keys: Seq[String],
                             asOf: Option[Long] = None,
                             sinceSeq: Option[Long] = None,
                             partitionCol: Option[String] = None,
                             partitionValues: Seq[String] = Seq.empty)
    extends BaseRelation with TableScan with InsertableRelation {

  require(asOf.isEmpty || sinceSeq.isEmpty,
    "graft.mor: asOf and sinceSeq are mutually exclusive")
  require(asOf.isEmpty || partitionCol.isEmpty,
    "graft.mor: asOf time travel is not supported on partitioned tables")

  private def table = MorTable(sqlContext.sparkSession, path, keys)
  private def partTable =
    new PartitionedMorTable(sqlContext.sparkSession, path, keys, partitionCol.get)

  private def scanDf() = (partitionCol, asOf, sinceSeq) match {
    case (Some(_), _, Some(seq)) => partTable.readIncremental(seq, partitionValues)
    case (Some(_), _, _) => partTable.read(partitionValues)
    case (None, Some(seq), _) => table.readAt(seq)
    case (None, _, Some(seq)) => table.readIncremental(seq)
    case _ => table.read()
  }

  override val schema: StructType = scanDf().schema

  override def buildScan(): RDD[Row] =
    scanDf().select(schema.fieldNames.map(col).toSeq: _*).rdd

  /** SQL write surface — `INSERT INTO t SELECT …` is a keyed upsert
    * (Hudi's default, the reference's Flink-SQL `INSERT INTO` semantics);
    * `INSERT OVERWRITE` replaces the table contents. Spark has already
    * cast the incoming rows to this relation's schema by position. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(asOf.isEmpty && sinceSeq.isEmpty,
      "graft.mor: cannot INSERT into a time-travel or incremental read")
    partitionCol match {
      case Some(_) =>
        if (overwrite) partTable.drop()
        partTable.upsert(data, keys.map(col)): Unit
      case None =>
        if (overwrite) table.drop()
        table.upsert(data, keys.map(col)): Unit
    }
  }
}
