package graft.mor

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim
import graft.lake.{MorTable, PartitionedMorTable}

/** SQL-text row-level DML over graft.mor tables — `DELETE FROM t WHERE …`,
  * `UPDATE t SET … WHERE …`, `MERGE INTO t USING s ON … WHEN …` typed by an
  * analyst resolve onto the engine verbs that already exist
  * ([[graft.lake.MorTable.deleteWhere]]/`updateWhere`/changelog apply).
  * The reference's entire user surface is SQL (`CDC-Hudi-Notebook
  * .zpln:2317,:2757`) and Hudi-on-Spark accepts all three statements; with
  * only the v1 relation, Spark's analyzer used to reject them ("only
  * supported with v2 tables") while the semantics sat one call away.
  *
  * Wiring: Spark's parser already produces `DeleteFromTable` /
  * `UpdateTable` / `MergeIntoTable` plans and resolves their expressions
  * against the relation; this POST-HOC resolution rule (it must see fully
  * resolved children, and must run before checkAnalysis rejects v1
  * targets) rewrites the plan onto a driver-side command. Condition and
  * assignment expressions are rebound BY NAME (a fresh scan has fresh
  * exprIds, so the analyzed attribute references cannot be reused
  * directly): DELETE/UPDATE references see the target row; MERGE
  * expressions are qualified `t.`/`s.` by which side's output carried the
  * attribute — the same aliases [[graft.lake.MorTable.mergeInto]]
  * documents.
  */
class MorDmlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private object MorTarget {
    @annotation.tailrec
    def unapply(plan: LogicalPlan): Option[MorRelation] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case lr: LogicalRelation if lr.relation.isInstanceOf[MorRelation] =>
        Some(lr.relation.asInstanceOf[MorRelation])
      case _ => None
    }
  }

  /** Rebind a resolved expression by NAME for evaluation against a fresh
    * scan of the same table (DELETE/UPDATE: every reference is a target
    * column). */
  private def byName(e: Expression): Column =
    GraftSqlShim.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** MERGE form: qualify references `s.`/`t.` by originating side. */
  private def bySide(e: Expression, sourceOut: AttributeSet): Column =
    GraftSqlShim.column(e.transform {
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference =>
        UnresolvedAttribute(Seq("t", a.name))
    })

  private def assignKey(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"graft.mor DML supports only top-level column assignments, got ${other.sql}")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(MorTarget(rel), cond) if d.childrenResolved && cond.resolved =>
      GraftDeleteCommand(rel, byName(cond))

    case u @ UpdateTable(MorTarget(rel), assigns, cond)
        if u.childrenResolved && assigns.forall(_.resolved) && cond.forall(_.resolved) =>
      val set = assigns.map(a => assignKey(a) -> byName(a.value)).toMap
      GraftUpdateCommand(rel, set, cond.map(byName).getOrElse(lit(true)))

    case m @ MergeIntoTable(MorTarget(rel), source, cond,
        matched, notMatched, notMatchedBySource, _) if m.resolved =>
      val srcOut = source.outputSet
      def q(e: Expression): Column = bySide(e, srcOut)
      def updOrDel(a: MergeAction, where: String): MorMergeAction = a match {
        case UpdateAction(c, assigns, _) =>
          MorMergeAction("U", c.map(q).getOrElse(lit(true)),
            assigns.map(x => assignKey(x) -> q(x.value)).toMap)
        case DeleteAction(c) =>
          MorMergeAction("D", c.map(q).getOrElse(lit(true)), Map.empty)
        case other => throw new UnsupportedOperationException(
          s"graft.mor MERGE: unsupported $where action $other")
      }
      val matchedSql = matched.map(updOrDel(_, "matched"))
      val insertSql: Seq[MorMergeAction] = notMatched.map {
        case InsertAction(c, assigns) =>
          MorMergeAction("I", c.map(q).getOrElse(lit(true)),
            assigns.map(a => assignKey(a) -> q(a.value)).toMap)
        case other => throw new UnsupportedOperationException(
          s"graft.mor MERGE: unsupported not-matched action $other")
      }
      // NOT MATCHED BY SOURCE: UPDATE/DELETE over target rows with no
      // source match (their conditions reference the target only — the
      // analyzer enforces it)
      val nmbsSql = notMatchedBySource.map(updOrDel(_, "not-matched-by-source"))
      GraftMergeCommand(rel, source, q(cond), matchedSql, insertSql, nmbsSql)
  }
}

/** One WHEN clause, pre-converted: kind ∈ U/D/I, fire condition, column
  * assignments (`t.`/`s.`-qualified Columns). */
final case class MorMergeAction(kind: String, cond: Column, set: Map[String, Column])

/** SQL time-travel syntax over graft.mor catalog tables — `SELECT … FROM t
  * VERSION AS OF <seq>` / `TIMESTAMP AS OF <ts>` (the Hudi/Delta read
  * surface; the engine verb is [[graft.lake.MorTable.readAt]], oracle
  * `s15`): a RESOLUTION rule (the parser's `RelationTimeTravel` is an
  * unresolved leaf that checkAnalysis would reject for a v1 table)
  * resolves the identifier through the session catalog, checks the
  * provider, and rebuilds the relation with `asOf` pinned — a timestamp
  * resolves to the LAST commit at or before it via the table's timeline
  * (commit wall-clock millis), exactly Hudi's `as.of.instant` rule. */
class MorTimeTravelResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}

  private def morOptions(ident: Seq[String]): Option[Map[String, String]] = {
    val catalog = spark.sessionState.catalog
    val tid = ident match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case _ => return None
    }
    if (!catalog.tableExists(tid)) return None
    val meta = catalog.getTableMetadata(tid)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft.mor"))) None
    else {
      val props = meta.storage.properties.map { case (k, v) => k.toLowerCase -> v }
      // the catalog promotes the `path` option to storage.locationUri
      val withPath = meta.storage.locationUri.map(u => props + ("path" -> u.toString))
        .getOrElse(props)
      Some(withPath)
    }
  }

  private def toEpochMs(e: Expression): Long = e.eval() match {
    case l: Long => l / 1000L // timestamp literal: epoch micros
    case s: org.apache.spark.unsafe.types.UTF8String =>
      java.sql.Timestamp.valueOf(s.toString.replace("T", " ")).getTime
    case other => throw new UnsupportedOperationException(
      s"TIMESTAMP AS OF expects a timestamp or timestamp-string literal, got $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version)
        if morOptions(u.multipartIdentifier).isDefined =>
      val opts = morOptions(u.multipartIdentifier).get
      val path = opts.getOrElse("path", throw new IllegalArgumentException(
        s"graft.mor table ${u.multipartIdentifier.mkString(".")} has no path option"))
      val keys = opts.getOrElse("keys", "").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      require(!opts.contains("partition"),
        "time travel is not supported on partitioned graft.mor tables")
      val asOf: Long = version match {
        case Some(v) => v.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"VERSION AS OF expects a commit seq for graft.mor tables, got '$v'"))
        case None =>
          val ms = toEpochMs(ts.getOrElse(throw new IllegalStateException(
            s"time travel with neither version nor timestamp: $tt")))
          MorTable.resolve(spark, path, keys).timeline()
            .filter(_.commitMs <= ms).lastOption.map(_.seq)
            .getOrElse(throw new IllegalArgumentException(
              s"no commit at or before timestamp $ms ms on $path"))
      }
      val rel = MorRelation(
        org.apache.spark.sql.SQLContext.getOrCreate(spark.sparkContext),
        path, keys, asOf = Some(asOf))
      LogicalRelation(rel)
  }
}

private object MorDml {
  /** The table verbs behind a relation, partitioned-aware. */
  def guards(rel: MorRelation): Unit =
    require(rel.asOf.isEmpty && rel.sinceSeq.isEmpty,
      "graft.mor: DML on a time-travel or incremental read is meaningless")
}

case class GraftDeleteCommand(rel: MorRelation, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MorDml.guards(rel)
    rel.partitionCol match {
      case Some(p) =>
        PartitionedMorTable.resolve(spark, rel.path, rel.keys, p)
          .deleteWhere(cond, values = rel.partitionValues)
      case None =>
        MorTable.resolve(spark, rel.path, rel.keys).deleteWhere(cond)
    }
    Seq.empty
  }
}

case class GraftUpdateCommand(rel: MorRelation, set: Map[String, Column],
                              cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    MorDml.guards(rel)
    // updateWhere rewrites images and re-upserts under the SAME key — an
    // assignment to a key column would insert a new key and strand the old
    // row, so refuse it (Hudi's record-key immutability rule)
    val badKeys = set.keySet.intersect(rel.keys.toSet)
    require(badKeys.isEmpty,
      s"UPDATE cannot reassign record key column(s) ${badKeys.mkString(", ")}")
    rel.partitionCol match {
      case Some(p) =>
        PartitionedMorTable.resolve(spark, rel.path, rel.keys, p)
          .updateWhere(cond, set, values = rel.partitionValues)
      case None =>
        MorTable.resolve(spark, rel.path, rel.keys).updateWhere(cond, set)
    }
    Seq.empty
  }
}

/** SQL `MERGE INTO`, compiled to ONE changelog micro-batch commit: the
  * source joins the current snapshot on the (arbitrary) merge condition,
  * each row resolves its FIRST matching WHEN clause (SQL action-order
  * semantics, a when()-chain per column), and the resulting op/before/
  * after envelope applies through the same exactly-once
  * [[graft.lake.MorTable.applyChangelog]] path as CDC ingestion — so
  * commit cost is O(|source| matches), never a table rewrite, and the
  * plan shape is the ONE key-equi/condition join AQE broadcasts for the
  * typical small merge batch. The MERGE cardinality rule is enforced
  * (two source rows resolving to one target key fail loudly rather than
  * nondeterministically). */
case class GraftMergeCommand(rel: MorRelation, source: LogicalPlan,
                             cond: Column,
                             matched: Seq[MorMergeAction],
                             inserts: Seq[MorMergeAction],
                             nmbs: Seq[MorMergeAction] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    MorDml.guards(rel)
    val keyCols = rel.keys
    require((matched ++ nmbs).flatMap(_.set.keySet).toSet.intersect(keyCols.toSet).isEmpty,
      "MERGE cannot reassign record key column(s) in an UPDATE clause")
    val src = GraftSqlShim.ofRows(spark, source)
      .withColumn("__srcm", lit(true)).alias("s")
    val (readDf, dataCols) = rel.partitionCol match {
      case Some(p) =>
        val t = PartitionedMorTable.resolve(spark, rel.path, rel.keys, p)
        val df = t.read(rel.partitionValues)
        (df, df.columns.toSeq)
      case None =>
        val df = MorTable.resolve(spark, rel.path, rel.keys).read()
        (df, df.columns.toSeq)
    }
    val tgt = readDf.withColumn("__matched", lit(true)).alias("t")
    // NOT MATCHED BY SOURCE must examine every target row (inherent to
    // its semantics) → full outer; without those clauses the join stays
    // source-sided and the scan cost O(|source| probes)
    val joined = src.join(tgt, cond, if (nmbs.isEmpty) "left_outer" else "full_outer")
    val isMatched = col("s.__srcm").isNotNull && col("t.__matched").isNotNull
    val srcOnly = col("s.__srcm").isNotNull && col("t.__matched").isNull
    val tgtOnly = col("s.__srcm").isNull

    // first-matching-WHEN-clause semantics: an ordered when()-chain (no
    // otherwise → null = "no clause fired, row untouched")
    def chain(actions: Seq[MorMergeAction], value: MorMergeAction => Column): Column =
      actions.foldLeft(when(lit(false), lit(null))) { (w, a) => w.when(a.cond, value(a)) }
    def chainOr(actions: Seq[MorMergeAction], value: MorMergeAction => Column,
                empty: Column): Column =
      if (actions.isEmpty) empty else chain(actions, value)
    val op = when(isMatched, chainOr(matched, a => lit(a.kind), lit(null).cast("string")))
      .when(srcOnly, chainOr(inserts, a => lit(a.kind), lit(null).cast("string")))
      .otherwise(chainOr(nmbs, a => lit(a.kind), lit(null).cast("string")))
    def afterOf(c: String): Column = {
      val tCol = col(s"t.$c")
      when(isMatched, chainOr(matched, a => a.set.getOrElse(c, tCol), tCol))
        .when(srcOnly, chainOr(inserts, a => a.set.getOrElse(c, lit(null)), lit(null)))
        .otherwise(chainOr(nmbs, a => a.set.getOrElse(c, tCol), tCol))
    }
    val keyOf = concat_ws("|", keyCols.map(k =>
      when(isMatched || tgtOnly, col(s"t.$k"))
        .otherwise(chainOr(inserts, a => a.set.getOrElse(k, lit(null)), lit(null)))
        .cast("string")): _*)
    val env = joined.select(
      op.as("op"), keyOf.as("key"),
      struct(dataCols.map(c => col(s"t.$c").cast(readDf.schema(c).dataType).as(c)): _*).as("before"),
      struct(dataCols.map(c => afterOf(c).cast(readDf.schema(c).dataType).as(c)): _*).as("after"),
      lit(0L).as("seq"))
      .filter(col("op").isNotNull)
      .localCheckpoint(true) // pinned: cardinality check + commit reuse it
    // MERGE cardinality rule: one envelope row per key, else the LWW
    // window would resolve the conflict nondeterministically
    val dup = env.groupBy(col("key")).count().filter(col("count") > 1).limit(1).count()
    require(dup == 0L,
      "MERGE cardinality violation: multiple source rows resolve to one target key")
    rel.partitionCol match {
      case Some(p) =>
        PartitionedMorTable.resolve(spark, rel.path, rel.keys, p).applyChangelog(env)
      case None =>
        MorTable.resolve(spark, rel.path, rel.keys).applyChangelog(env)
    }
    Seq.empty
  }
}
