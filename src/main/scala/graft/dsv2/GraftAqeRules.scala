package graft.dsv2

import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.Exchange

/**
 * Query-stage-prep rule: turn OFF the key-grouped (bucketed) layout of a
 * graft scan when nothing downstream benefits from it.
 *
 * Reporting `KeyGroupedPartitioning` is what makes storage-partitioned
 * joins and exchange-free aggregations possible, but it also pins the scan
 * to one Spark partition per (table partition, bucket) group. For a plan
 * that never exploits that clustering — a plain projection/filter, or an
 * aggregation whose clustering is destroyed by an intervening shuffle
 * anyway — the pinned layout only costs: a 32-bucket table scanned for
 * `SELECT count(*)` schedules ≥32 tasks however small the files are, and
 * AQE cannot coalesce them (there is no exchange at the scan). With the
 * layout off, the scan bin-packs files across key groups into
 * `files.maxPartitionBytes`-sized tasks like a plain file scan.
 *
 * The walk is the classic "interesting order" test (Selinger et al., Access
 * Path Selection, SIGMOD'79), the same criterion as Spark's own
 * [[org.apache.spark.sql.execution.bucketing.DisableUnnecessaryBucketedScan]]
 * for v1 file scans and the reference connector's v2 flavor
 * (paimon-spark-common/.../execution/adaptive/DisableUnnecessaryPaimonBucketedScan.scala:1,
 * injected at queryStagePrep in PaimonSparkSessionExtensions.scala:113).
 * A scan keeps its bucketed layout only when some ancestor requires a
 * clustering or ordering of its input AND no shuffle sits between that
 * ancestor and the scan (a shuffle re-partitions, so whatever the scan
 * reported is moot). Traversal state mirrors Spark's rule exactly —
 * (ancestorWantsLayout, exchangeSeen, allowedNode):
 * `ancestorWantsLayout` is PRESERVED through every operator (this rule runs
 * after EnsureRequirements, so an elided exchange may depend on the scan's
 * clustering flowing through an operator we can't classify, e.g. a
 * partitioning-preserving GenerateExec — resetting the flag there would
 * disable a layout the already-planned exchanges rely on → wrong results);
 * `allowedNode` is ANDed false at any operator outside the pass-through
 * set, so the disable in the exchange-present case only fires when the
 * whole (exchange → scan) path is provably layout-oblivious. Disable iff
 * `!ancestorWantsLayout || (exchangeSeen && allowedNode)`.
 *
 * Honors the same gates as Spark's v1 rule: both
 * `spark.sql.sources.v2.bucketing.enabled` and
 * `spark.sql.sources.bucketing.autoBucketedScanEnabled` must be true.
 */
object DisableUnnecessaryGraftBucketedScan extends Rule[SparkPlan] {

  /** An operator whose required child distribution/ordering makes the
    * scan's reported layout worth keeping (join keys, final aggregation,
    * global sort). */
  private def wantsLayout(p: SparkPlan): Boolean =
    p.requiredChildDistribution.exists {
      case _: ClusteredDistribution | AllTuples => true
      case _ => false
    } || p.requiredChildOrdering.exists(_.nonEmpty)

  /** Operators a (layout-wanting ancestor → scan) path may cross without
    * invalidating the layout requirement: row-local transforms and the
    * partial half of an aggregate (no distribution requirement of its
    * own). */
  private def passThrough(p: SparkPlan): Boolean = p match {
    case _: ProjectExec | _: FilterExec => true
    case s: SortExec => !s.global
    case agg: BaseAggregateExec => agg.requiredChildDistributionExpressions.isEmpty
    case _ => false
  }

  private def graftBucketedScan(p: SparkPlan): Option[(BatchScanExec, GraftBatchScan)] =
    p match {
      case b: BatchScanExec => b.scan match {
        // only scans that actually REPORT the key-grouped layout — an
        // unbucketed/unpartitioned scan already packs freely and must not
        // be copied (same gate as the reference's
        // `scan.inputPartitions.forall(_.bucketed)`)
        case g: GraftBatchScan if g.reportsBucketedLayout => Some((b, g))
        case _ => None
      }
      case _ => None
    }

  private def rewrite(plan: SparkPlan, ancestorWants: Boolean,
                      exchangeSeen: Boolean, allowedNode: Boolean): SparkPlan = plan match {
    case p if wantsLayout(p) =>
      p.mapChildren(rewrite(_, ancestorWants = true, exchangeSeen = false,
        allowedNode = true))
    case ex: Exchange =>
      ex.mapChildren(rewrite(_, ancestorWants, exchangeSeen = true, allowedNode))
    case p if graftBucketedScan(p).isDefined =>
      val (batch, scan) = graftBucketedScan(p).get
      if (!ancestorWants || (exchangeSeen && allowedNode)) {
        // also clear the exec node's cached key grouping: BatchScanExec
        // groups input partitions into one task per distinct partition key
        // when spjParams carries keyGroupedPartitioning, which would fuse
        // the disabled scan's packed partitions into a single task
        val replaced = batch.copy(scan = scan.disableBucketedScan(),
          spjParams = org.apache.spark.sql.execution.joins.StoragePartitionJoinParams(
            None, None, None, None, false, false))
        replaced.copyTagsFrom(batch)
        replaced
      } else batch
    case p =>
      // ancestorWants survives EVERY operator (an elided exchange may rely
      // on the layout flowing through it); only the allowed-path flag
      // degrades at operators outside the pass-through set
      p.mapChildren(rewrite(_, ancestorWants, exchangeSeen,
        allowedNode && passThrough(p)))
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    val v2Bucketing =
      conf.getConfString("spark.sql.sources.v2.bucketing.enabled", "false").toBoolean
    if (!v2Bucketing || !conf.autoBucketedScanEnabled) return plan
    if (!plan.exists(p => graftBucketedScan(p).isDefined)) return plan
    rewrite(plan, ancestorWants = false, exchangeSeen = false, allowedNode = true)
  }
}
