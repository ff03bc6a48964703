package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DoubleType

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
  *    `count(*)`/`count(lit)`, `count(<bare col>)`, `sum(<bare col>)`,
  *    `min`/`max(<bare col>)` or `avg(<bare col>)` the view declares a
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
  * ROLLUP: a query grouping by a strict SUBSET of the view's grouping
  * columns re-aggregates the groups-sized view — count/sum re-sum, min/
  * max re-min/max, avg recombines its maintained (sum, count) pair. All
  * five are decomposable by construction, which is exactly why they are
  * the registrable measure set.
  *
  * The substituted plan preserves the aggregate's output attribute ids
  * (the TopKRewrite discipline), so parent operators re-resolve against
  * the view projection without a schema seam. Session-gated off by
  * default (`spark.graft.rewrite.matviews`). */
object ViewRewrite {

  /** One view measure: `fn` ∈ count|sum|min|max|avg, `arg` the base
    * column (empty for count(*)), `viewCol` the view column holding the
    * maintained aggregate. `avg` is the decomposed pair: `viewCol` holds
    * the maintained SUM of `arg` and `auxCol` the maintained NON-NULL
    * COUNT of `arg` (count(arg), not count(*) — avg ignores nulls). */
  final case class Measure(fn: String, arg: String, viewCol: String,
                           auxCol: String = "")

  /** A registered view: the base table path it aggregates, its grouping
    * columns, its measures, a fresh scan of the view relation, the
    * freshness proof, and `version` — a monotone token identifying the
    * view's CONTENT (typically the view table's last commit seq), keying
    * the analyzed-plan cache; -1 opts out of caching. */
  final case class ViewDef(basePath: String, groupCols: Seq[String],
                           measures: Seq[Measure],
                           viewScan: () => DataFrame,
                           isFresh: () => Boolean,
                           version: () => Long = () => -1L)

  /** Registry keyed by the CANONICAL filesystem path: a catalog table's
    * location round-trips as a `file:/…` URI while the engine handle was
    * registered with the raw `/…` form — the two never string-match (the
    * three-encodings rule), so both sides canonicalize through the same
    * Hadoop Path machinery before compare. */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private val registry = new ConcurrentHashMap[String, ViewDef]()
  def register(vd: ViewDef): Unit = registry.put(canon(vd.basePath), vd)
  def unregister(basePath: String): Unit = {
    registry.remove(canon(basePath))
    planCache.remove(canon(basePath))
    ()
  }
  private[graft] def lookup(path: String): Option[ViewDef] =
    Option(registry.get(canon(path)))

  /** Analyzed view plan per base path, keyed by the view's version token
    * — a dashboard firing hundreds of identical queries pays ONE analysis
    * per view commit instead of one per query (r13 advisory). The cached
    * plan is only reused at the SAME version; a maintenance commit bumps
    * the token and the next query re-analyzes. version() = -1 (the
    * programmatic default) disables reuse. */
  private val planCache = new ConcurrentHashMap[String, (Long, LogicalPlan)]()
  private[plans] def analyzedViewPlan(basePath: String, vd: ViewDef,
                                      allowCache: Boolean): LogicalPlan = {
    val v = vd.version()
    // fresh analysis when caching is off (version -1, the programmatic
    // default) or disallowed (a SECOND substitution in the same query
    // tree must carry fresh exprIds — two branches sharing the cached
    // subtree's attribute ids would alias like an unfixed self-join)
    if (v < 0L || !allowCache) return vd.viewScan().queryExecution.analyzed
    val key = canon(basePath)
    planCache.get(key) match {
      case (`v`, plan) => plan
      case _ =>
        val plan = vd.viewScan().queryExecution.analyzed
        planCache.put(key, (v, plan))
        plan
    }
  }
  /** Test probe: cached (version, plan) for the base path, if any. */
  private[graft] def cachedPlanVersion(basePath: String): Option[Long] =
    Option(planCache.get(canon(basePath))).map(_._1)

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

  /** The view measure answering one aggregate expression, or None. */
  private def measureOf(vd: ViewDef, ae: AggregateExpression): Option[Measure] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    def arg(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def find(fn: String, a: String): Option[Measure] =
      vd.measures.find(m => m.fn == fn && m.arg == a)
    ae.aggregateFunction match {
      case Count(children) if children.nonEmpty && children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        find("count", "")
      case Count(Seq(a: AttributeReference)) =>
        // count(col) counts NON-NULL values — answered by an avg
        // measure's aux column (count(arg)) or a dedicated count measure
        find("count", a.name).orElse(
          vd.measures.find(m => m.fn == "avg" && m.arg == a.name)
            .map(m => Measure("count", a.name, m.auxCol)))
      case s: Sum => arg(s.child).flatMap(find("sum", _))
      case m: Min => arg(m.child).flatMap(find("min", _))
      case m: Max => arg(m.child).flatMap(find("max", _))
      case a: Average => arg(a.child).flatMap(find("avg", _))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // cache only the FIRST substitution of each base path per query tree
    // (see analyzedViewPlan — repeats need fresh exprIds)
    val substituted = scala.collection.mutable.Set.empty[String]
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, PlainMorScan(rel), _) =>
        rewrite(agg, groupExprs, aggExprs, rel,
            allowCache = !substituted.contains(rel.path)) match {
          case Some(p) => substituted += rel.path; p
          case None => agg
        }
    }
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      rel: MorRelation, allowCache: Boolean): Option[LogicalPlan] = {
    val vd = lookup(rel.path).getOrElse(return None)
    val gAttrs = groupExprs.flatMap {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (gAttrs.size != groupExprs.size) return None
    val gNames = gAttrs.map(_.name)
    // exact grouping → pure projection of the view; a strict SUBSET of
    // the view's grouping → ROLLUP over the groups-sized view (each
    // measure re-aggregates by its own decomposition rule). Grouping
    // columns the view lacks, or duplicates, fail closed.
    if (gNames.distinct.size != gNames.size) return None
    if (!gNames.forall(vd.groupCols.contains)) return None
    // a grouping-free rollup (SELECT count(*) FROM t) would turn an
    // EMPTY view into one NULL row where the scan answers 0 — fail
    // closed (the metadata-count rewrite owns that shape anyway)
    if (gNames.isEmpty) return None
    val exact = gNames.sorted == vd.groupCols.sorted
    // analyzed view plan from the version-keyed cache (one analysis per
    // view commit, not per query)
    val viewPlan = analyzedViewPlan(rel.path, vd, allowCache)
    def viewAttr(name: String): Option[Attribute] =
      viewPlan.output.find(_.name == name)
    /** The substituted expression for one matched measure. Exact form
      * projects (or recombines, for avg); rollup re-aggregates by the
      * measure's decomposition. Returns None when a needed view column
      * is missing (malformed registration — fail closed). */
    def substituted(m: Measure): Option[Expression] = m.fn match {
      case "avg" =>
        for (sv <- viewAttr(m.viewCol); cn <- viewAttr(m.auxCol)) yield {
          // Average(col)'s result is sum/count evaluated in the result
          // dtype (double for the numeric inputs this matches; the
          // dtype-identity filter below rejects decimal/interval forms
          // where Spark's internal accumulation differs)
          if (exact)
            Divide(Cast(sv, DoubleType), Cast(cn, DoubleType))
          else
            Divide(Cast(Sum(sv).toAggregateExpression(), DoubleType),
              Cast(Sum(cn).toAggregateExpression(), DoubleType))
        }
      case fn =>
        viewAttr(m.viewCol).map { v =>
          if (exact) v
          else fn match {
            case "min" => Min(v).toAggregateExpression()
            case "max" => Max(v).toAggregateExpression()
            case _ => Sum(v).toAggregateExpression() // count, sum re-sum
          }
        }
    }
    val outputs: Seq[Option[NamedExpression]] = aggExprs.map {
      case a: AttributeReference if gNames.contains(a.name) =>
        viewAttr(a.name).filter(_.dataType == a.dataType)
          .map(v => Alias(v, a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        measureOf(vd, ae).flatMap(substituted)
          .filter(_.dataType == al.dataType)
          .map(v => Alias(v, name)(exprId = al.exprId))
      case _ => None
    }
    if (outputs.exists(_.isEmpty)) return None
    if (!vd.isFresh()) return None // freshness LAST: shape checks are free
    if (exact) {
      // an avg projection is scalar arithmetic, fine under Project; all
      // other exact measures are bare attributes
      Some(Project(outputs.map(_.get), viewPlan))
    } else {
      val vGroup = gNames.flatMap(viewAttr)
      if (vGroup.size != gNames.size) return None
      Some(Aggregate(vGroup, outputs.map(_.get), viewPlan))
    }
  }
}
