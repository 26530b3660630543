package graft.dsv2

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructField

/** A scan serving a pushed variant extraction that can additionally
  * file-skip on a shred-column predicate. Implemented by BOTH variant scan
  * kinds so [[GraftVariantPrune]] cannot silently miss one. */
private[dsv2] trait GraftVariantPrunable {
  this: org.apache.spark.sql.connector.read.Scan =>
  def variantColsMap: Map[String, Seq[(StructField, String)]]
  def withShredPrune(extra: org.apache.spark.sql.Column)
      : org.apache.spark.sql.connector.read.Scan with GraftVariantPrunable
}

/**
 * File skipping for SQL filters on SHREDDED variant paths.
 *
 * Spark's scan pushdown offers filters BEFORE it offers variant
 * extractions, so a predicate like `variant_get(meta,'$.x','int') > 5` is
 * never convertible when [[GraftScanBuilder.pushFilters]] sees it; after the
 * extraction pushdown is accepted, the optimizer rewrites it to
 * `GetStructField(meta, ord) > 5` over the retyped attribute and leaves it
 * as a plain Filter ABOVE the scan — every file is read even though the
 * serving physical column carries min/max stats (the write materialized
 * typed shred columns exactly so predicates can skip; at 100 TB a filtered
 * extraction read must not scan the corpus).
 *
 * This rule runs in the session's post-optimization user batch (the only
 * hook AFTER Early Scan Push-Down, where the rewritten filter shape
 * exists): it translates struct-field conjuncts over pushed variant columns
 * onto their shredded PHYSICAL columns and swaps in a scan whose manifest
 * entries are stats-pruned by that predicate. The Filter node itself is
 * untouched (row-level evaluation still happens); only the file set
 * narrows, so partial translation stays conservative. The V1 merge path
 * ([[GraftVariantScan]]) routes the predicate through `planFiles`, whose
 * merge-safe restriction drops value conjuncts on unmerged PK buckets
 * (pruning pre-merge input by a value column resurrects stale versions);
 * the native path ([[GraftVariantBatchScan]]) only ever serves final rows
 * (raw-convertible), so the full predicate may prune.
 */
object GraftVariantPrune extends Rule[LogicalPlan] {

  /** Idempotently append this rule to `spark.experimental.extraOptimizations`
    * (the "User Provided Optimizers" batch). Called from the catalog init
    * and the path-based TableProvider — both resolve during ANALYSIS, so the
    * first variant query's own optimization run already carries the rule. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ LFilter(cond, rel: DataSourceV2ScanRelation) =>
      rel.scan match {
        case s: GraftVariantPrunable =>
          shredPredicate(cond, s.variantColsMap) match {
            case Some(extra) =>
              val pruned = s.withShredPrune(extra)
              if (pruned eq s) f else f.copy(child = rel.copy(scan = pruned))
            case None => f
          }
        case _ => f
      }
  }

  /** A boolean tree over `GetStructField(variantAttr, ord) cmp literal`
    * leaves translated onto the ord-th offered extraction's shredded
    * physical column. The translation WEAKENS: it returns a predicate
    * IMPLIED by `cond` (None = no information), so files failing it are
    * provably skippable —
    *  - AND: conjunction of whichever sides translate (dropping a conjunct
    *    keeps a superset of files);
    *  - OR: BOTH branches must translate — `a∧b ⇒ a` and `c ⇒ c'` give
    *    `(a∧b)∨c ⇒ a∨c'`, so a disjunction of per-branch weakenings is
    *    still implied, but one untranslatable branch voids the whole OR
    *    (it could match anything);
    *  - NOT is never descended (¬ of a weakening is not a weakening).
    * The `$` root field (served by the variant binary itself) has no stats
    * and is skipped. */
  private def shredPredicate(cond: Expression,
      vc: Map[String, Seq[(StructField, String)]]): Option[Column] = {
    def phys(e: Expression): Option[String] = e match {
      case GetStructField(a: AttributeReference, ord, _) =>
        vc.get(a.name).flatMap { fs =>
          if (ord < fs.length && fs(ord)._2 != a.name) Some(fs(ord)._2) else None
        }
      case _ => None
    }
    def sv(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    def leaf(e: Expression): Option[Column] = e match {
      case EqualTo(e0, l: Literal) => phys(e0).map(col(_) === lit(sv(l)))
      case EqualTo(l: Literal, e0) => phys(e0).map(col(_) === lit(sv(l)))
      case GreaterThan(e0, l: Literal) => phys(e0).map(col(_) > lit(sv(l)))
      case GreaterThan(l: Literal, e0) => phys(e0).map(col(_) < lit(sv(l)))
      case GreaterThanOrEqual(e0, l: Literal) => phys(e0).map(col(_) >= lit(sv(l)))
      case GreaterThanOrEqual(l: Literal, e0) => phys(e0).map(col(_) <= lit(sv(l)))
      case LessThan(e0, l: Literal) => phys(e0).map(col(_) < lit(sv(l)))
      case LessThan(l: Literal, e0) => phys(e0).map(col(_) > lit(sv(l)))
      case LessThanOrEqual(e0, l: Literal) => phys(e0).map(col(_) <= lit(sv(l)))
      case LessThanOrEqual(l: Literal, e0) => phys(e0).map(col(_) >= lit(sv(l)))
      case In(e0, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        phys(e0).map(p =>
          col(p).isin(vs.map(v => sv(v.asInstanceOf[Literal])): _*))
      case IsNotNull(e0) => phys(e0).map(col(_).isNotNull)
      case _ => None
    }
    def translate(e: Expression): Option[Column] = e match {
      case And(l, r) =>
        (translate(l), translate(r)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for { a <- translate(l); b <- translate(r) } yield a || b
      case other => leaf(other)
    }
    translate(cond)
  }
}
