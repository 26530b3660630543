package graft.dsv2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * Literal-key MAP access pushdown onto declared shredded key sub-columns.
 *
 * `SELECT id, attrs['k1'] FROM t WHERE attrs['k2'] > 5` on a table that
 * declares `fields.attrs.shred-keys = k1,k2` must not deserialize whole map
 * values: the write materialized each declared key as a typed physical side
 * column (stats included), so the scan can serve `attrs` retyped as
 * `struct<k1, k2>` reading ONLY those columns — at 100 TB a wide
 * metadata-map column (the common training-data shape) otherwise dominates
 * the scan's bytes. Capability of the reference's shared-shredding MAP
 * storage layout + `PushDownMapSelectedKeys.scala:36`
 * (PushDownMapSelectedKeysBase), re-expressed over this engine's declared
 * hot-key side columns.
 *
 * Runs in the session's post-optimization user batch (after Early Scan
 * Push-Down, so the scan and its pruned read schema exist). Shapes handled:
 * Project over the scan relation, and Project over Filter over it (the
 * filter condition is rewritten too, which lets [[GraftVariantPrune]] —
 * same batch, fixed-point — file-skip on the side columns' stats). A MAP
 * column used WHOLESALE anywhere (projected as a value, non-literal key,
 * undeclared key) is left untouched; only columns whose every use is a
 * declared literal-key lookup are rewritten. Merge-needing PK reads keep
 * the V1 plan (correct, unpruned), mirroring the reference's
 * PaimonScan-only match.
 */
object GraftMapShredRule extends Rule[LogicalPlan] {

  /** Idempotently append to `spark.experimental.extraOptimizations` —
    * same registration idiom as [[GraftVariantPrune]]. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, rel: DataSourceV2ScanRelation) =>
      rewrite(p.projectList, None, rel)
        .map { case (list, r, _) => Project(list, r) }.getOrElse(p)
    case p @ Project(_, LFilter(cond, rel: DataSourceV2ScanRelation)) =>
      rewrite(p.projectList, Some(cond), rel)
        .map { case (list, r, c) => Project(list, LFilter(c.get, r)) }
        .getOrElse(p)
  }

  private def rewrite(projectList: Seq[NamedExpression],
                      cond: Option[Expression],
                      rel: DataSourceV2ScanRelation)
      : Option[(Seq[NamedExpression], DataSourceV2ScanRelation, Option[Expression])] = {
    val scan = rel.scan match {
      // plain raw scans only: the variant/map-shred subclasses are already
      // rewritten (idempotence under the fixed-point batch), merge scans
      // must keep their physical schema
      case s: GraftBatchScan if !s.isInstanceOf[GraftVariantPrunable] => s
      case _ => return None
    }
    val specs = scan.graftTable.mapShredSpecs
    if (specs.isEmpty) return None

    // collect per-attribute declared literal keys; an attribute with ANY
    // other use (wholesale projection, non-literal or undeclared key) fails
    val keysByAttr = mutable.LinkedHashMap
      .empty[ExprId, (AttributeReference, mutable.LinkedHashSet[String])]
    val failed = mutable.Set.empty[ExprId]
    def walk(e: Expression): Unit = e match {
      case GetMapValue(a: AttributeReference, Literal(k: UTF8String, StringType))
          if specs.contains(a.name) && specs(a.name)._2.contains(k.toString) =>
        keysByAttr.getOrElseUpdate(a.exprId,
          (a, mutable.LinkedHashSet.empty[String]))._2 += k.toString
      case a: AttributeReference if specs.contains(a.name) =>
        failed += a.exprId
      case other => other.children.foreach(walk)
    }
    (projectList ++ cond).foreach(walk)
    val selected = keysByAttr.filterNot { case (id, _) => failed.contains(id) }
    if (selected.isEmpty) return None

    // build the retyped attributes + scan serving maps
    val rewrites = selected.map { case (id, (a, keys)) =>
      val (vt, physByKey) = specs(a.name)
      val ordered = keys.toSeq
      val fields = ordered.zipWithIndex.map { case (k, i) =>
        (StructField(i.toString, vt, nullable = true), physByKey(k))
      }
      val newAttr = a.withDataType(StructType(fields.map(_._1)))
        .asInstanceOf[AttributeReference]
      id -> (newAttr, ordered, fields)
    }.toMap
    val mapCols = rewrites.map { case (_, (attr, _, fields)) =>
      attr.name -> fields
    }
    val newScan = scan.withMapShred(mapCols)
    val newOutput = rel.output.map(a =>
      rewrites.get(a.exprId).map(_._1).getOrElse(a))
    val newRel = rel.copy(scan = newScan, output = newOutput)

    def rw(e: Expression): Expression = e.transformUp {
      case GetMapValue(a: AttributeReference, Literal(k: UTF8String, StringType))
          if rewrites.contains(a.exprId) =>
        val (newAttr, ordered, _) = rewrites(a.exprId)
        GetStructField(newAttr, ordered.indexOf(k.toString),
          Some(s"${a.name}[${k.toString}]"))
    }
    val newList = projectList.map(rw(_).asInstanceOf[NamedExpression])
    Some((newList, newRel, cond.map(rw)))
  }
}
