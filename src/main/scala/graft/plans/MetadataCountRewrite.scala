package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.mor.MorRelation

/** Metadata-only COUNT(*) (the Delta/Hudi count-from-stats optimization):
  * a grouping-free `count( * )` / `count(<non-null literal>)` aggregate
  * whose input is a PLAIN mor snapshot scan collapses to a
  * [[LocalRelation]] holding the manifest header's exact live-row total —
  * the query never lists a data file, let alone scans one. At 100 TB the
  * difference is a free answer versus a full-table job.
  *
  * Soundness is delegated to [[MorRelation.metadataCount]], which fails
  * CLOSED (returns None → the scan plan stands) unless the metadata
  * provably equals the snapshot count: plain snapshot read (no
  * travel/incremental/CDC/RO modes), the live state exactly one managed
  * fully-folded compaction with NO live deltas (delta footer counts say
  * nothing about merged cardinality: a delta row may update, insert, or
  * tombstone), and a manifest that recorded the non-tombstone total
  * (round 13+); the partitioned form requires EVERY selected child at
  * such a boundary. The count is read at REWRITE time from the live
  * timeline — never a pinned relation statistic — so it can never be
  * staler than the scan it replaces.
  *
  * Scope guards: grouping list empty; every aggregate expression is a
  * non-DISTINCT, un-FILTERed `Count` of non-null literals; the path from
  * the aggregate to the relation crosses only Projects/subquery aliases
  * (row-count-preserving by construction — a Filter anywhere disables
  * the rewrite). Multiple count columns are fine (all equal the total). */
class MetadataCountRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private object PlainMorScan {
    @annotation.tailrec
    def unapply(plan: LogicalPlan): Option[MorRelation] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case p: Project => unapply(p.child) // projections preserve row count
      case lr: LogicalRelation if lr.relation.isInstanceOf[MorRelation] =>
        // a row-filter ACCESS POLICY restricts the scan invisibly to the
        // logical plan — its count is NOT the table total (fail closed);
        // masks rewrite values only, so they leave counts untouched
        val rel = lr.relation.asInstanceOf[MorRelation]
        if (rel.rowFilter.isEmpty) Some(rel) else None
      case _ => None
    }
  }

  /** A count whose only restriction is a partition-column pin:
    * `Filter(pt = 'x' | pt IN (…), <plain scan>)` over a PARTITIONED
    * relation — answered by summing the pinned children's header fields.
    * The condition must be EXACTLY that single node (any residual
    * predicate, OR-tree, null literal, cast around the attribute, or a
    * pin on a non-partition column keeps the scan plan — fail closed).
    * Values render through the same cast-to-string the engine's
    * partition dirs use ([[MorDml.litEqValues]]'s contract). */
  private object PartitionPinnedScan {
    def unapply(plan: LogicalPlan): Option[(MorRelation, Seq[String])] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case p: Project => unapply(p.child)
      case f @ Filter(cond, PlainMorScan(rel)) if rel.partitionCol.isDefined =>
        val pt = rel.partitionCol.get
        val strictShape = cond match {
          case EqualTo(a: AttributeReference, l: Literal) =>
            a.name == pt && l.value != null
          case EqualTo(l: Literal, a: AttributeReference) =>
            a.name == pt && l.value != null
          case In(a: AttributeReference, vs) => a.name == pt &&
            vs.nonEmpty && vs.forall {
              case l: Literal => l.value != null
              case _ => false
            }
          case _ => false
        }
        if (!strictShape) None
        else graft.mor.MorDml.litEqValues(SparkSession.active, cond).get(pt)
          .filter(_.nonEmpty).map(vs => (rel, vs.distinct))
      case _ => None
    }
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      ae.filter.isEmpty && !ae.isDistinct && (ae.aggregateFunction match {
        case Count(children) =>
          children.nonEmpty && children.forall {
            case l: Literal => l.value != null
            case _ => false
          }
        case _ => false
      })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
      val answer = child match {
        case PlainMorScan(rel) => rel.metadataCount()
        case PartitionPinnedScan(rel, values) => rel.metadataCount(values)
        case _ => None
      }
      answer match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(Seq.fill(aggExprs.size)(n))))
        case None => agg // fail closed: the scan answers
      }
  }
}
