package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.mor.MorRelation

/** MATERIALIZED-VIEW auto-substitution (the aggregate-rewrite every
  * warehouse ships — Oracle MV rewrite / BigQuery BI Engine /
  * Materialize's raison d'être): a grouped aggregate over a mor base
  * table whose EXACT shape a registered, incrementally-maintained view
  * answers is rewritten to read the groups-sized VIEW relation instead of
  * scanning the base. At 100 TB the difference is a metadata-sized read
  * versus the full fact-table scan+shuffle — per dashboard refresh.
  *
  * Soundness rests on three gates, each failing CLOSED to the scan plan:
  *
  *  - SHAPE: grouping must be exactly the view's grouping columns (bare
  *    attributes), and every aggregate a non-DISTINCT, un-FILTERed
  *    `count(*)`/`count(lit)` or `sum(<bare col>)` the view declares a
  *    measure for, with IDENTICAL result dtype. Any filter between the
  *    aggregate and the scan, any derived grouping/agg expression, any
  *    extra measure → no rewrite.
  *  - PLAIN SNAPSHOT: the scanned relation must be the current-state
  *    read — no time travel / incremental / CDC / read-optimized mode,
  *    no partition pruning (a pruned scan aggregates a subset the view
  *    cannot see).
  *  - FRESHNESS, checked AT REWRITE TIME: the registered `isFresh`
  *    closure (typically "base table's latest commit seq == the seq the
  *    maintainer last folded") must hold. A base commit after the last
  *    maintenance cycle silently reverts queries to the scan — a stale
  *    view is never served (the Delta/Materialize freshness contract;
  *    the s22 incremental maintenance machinery is how the view keeps
  *    up in O(changes)).
  *
  * The substituted plan preserves the aggregate's output attribute ids
  * (the TopKRewrite discipline), so parent operators re-resolve against
  * the view projection without a schema seam. Session-gated off by
  * default (`spark.graft.rewrite.matviews`). */
object ViewRewrite {

  /** One view measure: `fn` ∈ count|sum, `arg` the base column (empty
    * for count), `viewCol` the view column holding the maintained
    * aggregate. */
  final case class Measure(fn: String, arg: String, viewCol: String)

  /** A registered view: the base table path it aggregates, its grouping
    * columns, its measures, a fresh scan of the view relation, and the
    * freshness proof. */
  final case class ViewDef(basePath: String, groupCols: Seq[String],
                           measures: Seq[Measure],
                           viewScan: () => DataFrame,
                           isFresh: () => Boolean)

  /** Registry keyed by the CANONICAL filesystem path: a catalog table's
    * location round-trips as a `file:/…` URI while the engine handle was
    * registered with the raw `/…` form — the two never string-match (the
    * three-encodings rule), so both sides canonicalize through the same
    * Hadoop Path machinery before compare. */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private val registry = new ConcurrentHashMap[String, ViewDef]()
  def register(vd: ViewDef): Unit = registry.put(canon(vd.basePath), vd)
  def unregister(basePath: String): Unit = { registry.remove(canon(basePath)); () }
  private[plans] def lookup(path: String): Option[ViewDef] =
    Option(registry.get(canon(path)))

  val confKey = "spark.graft.rewrite.matviews"
}

class ViewRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  import ViewRewrite._

  private def enabled: Boolean =
    session.conf.getOption(confKey).contains("true")

  /** The aggregate's input must be a PLAIN current-state mor scan —
    * subquery aliases and pure-attribute projections only on the way
    * down (an intervening Filter or computed projection disables the
    * rewrite). */
  private object PlainMorScan {
    @annotation.tailrec
    def unapply(plan: LogicalPlan): Option[MorRelation] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(p.child)
      case lr: LogicalRelation if lr.relation.isInstanceOf[MorRelation] =>
        val rel = lr.relation.asInstanceOf[MorRelation]
        // access-policy relations fail closed: a row filter restricts the
        // scan invisibly, and masks change the very values the view
        // grouped/summed — neither aggregate equals the registered view's
        if (rel.asOf.isEmpty && rel.sinceSeq.isEmpty &&
          rel.changelogFrom.isEmpty && !rel.readOptimized &&
          rel.partitionValues.isEmpty && rel.rowFilter.isEmpty &&
          rel.maskOpts.isEmpty) Some(rel)
        else None
      case _ => None
    }
  }

  /** The view column answering one aggregate expression, or None. */
  private def measureCol(vd: ViewDef, ae: AggregateExpression): Option[String] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(children) if children.nonEmpty && children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        vd.measures.find(_.fn == "count").map(_.viewCol)
      case s: Sum => s.child match {
        case a: AttributeReference =>
          vd.measures.find(m => m.fn == "sum" && m.arg == a.name).map(_.viewCol)
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, PlainMorScan(rel), _) =>
        rewrite(agg, groupExprs, aggExprs, rel).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      rel: MorRelation): Option[LogicalPlan] = {
    val vd = lookup(rel.path).getOrElse(return None)
    val gAttrs = groupExprs.flatMap {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (gAttrs.size != groupExprs.size) return None
    val gNames = gAttrs.map(_.name)
    // exact grouping → pure projection of the view; a strict SUBSET of
    // the view's grouping → ROLLUP over the groups-sized view (count(*)
    // re-sums the view's count, sum(col) re-sums its partial — both
    // decomposable by construction, which is exactly why only count/sum
    // are registrable measures). Grouping columns the view lacks, or
    // duplicates, fail closed.
    if (gNames.distinct.size != gNames.size) return None
    if (!gNames.forall(vd.groupCols.contains)) return None
    // a grouping-free rollup (SELECT count(*) FROM t) would turn an
    // EMPTY view into one NULL row where the scan answers 0 — fail
    // closed (the metadata-count rewrite owns that shape anyway)
    if (gNames.isEmpty) return None
    val exact = gNames.sorted == vd.groupCols.sorted
    // analyze the view side ONCE per matched aggregate
    val viewPlan = vd.viewScan().queryExecution.analyzed
    def viewAttr(name: String): Option[Attribute] =
      viewPlan.output.find(_.name == name)
    def rollup(v: Attribute): Expression =
      Sum(v).toAggregateExpression()
    val outputs: Seq[Option[NamedExpression]] = aggExprs.map {
      case a: AttributeReference if gNames.contains(a.name) =>
        viewAttr(a.name).filter(_.dataType == a.dataType)
          .map(v => Alias(v, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        measureCol(vd, ae).flatMap(viewAttr)
          .map(v => if (exact) v else rollup(v))
          .filter(_.dataType == al.dataType)
          .map(v => Alias(v, name)(exprId = al.exprId))
      case _ => None
    }
    if (outputs.exists(_.isEmpty)) return None
    if (!vd.isFresh()) return None // freshness LAST: shape checks are free
    if (exact) Some(Project(outputs.map(_.get), viewPlan))
    else {
      val vGroup = gNames.flatMap(viewAttr)
      if (vGroup.size != gNames.size) return None
      Some(Aggregate(vGroup, outputs.map(_.get), viewPlan))
    }
  }
}
