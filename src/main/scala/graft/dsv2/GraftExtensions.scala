package graft.dsv2

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.SparkShims

/**
 * SQL row-level operations for graft catalog tables:
 *
 * {{{
 *   DELETE FROM graft.db.t WHERE ...
 *   UPDATE graft.db.t SET c = expr, ... WHERE ...
 *   MERGE INTO graft.db.t t USING src s ON ... WHEN MATCHED ... / NOT MATCHED ...
 * }}}
 *
 * Registered via `spark.sql.extensions=graft.dsv2.GraftSparkExtensions`.
 * A post-hoc resolution rule replaces the analyzed DeleteFromTable /
 * UpdateTable / MergeIntoTable nodes with runnable commands that execute the
 * engine's tested paths (RowOps.delete/deleteDv/update, MergeIntoBuilder) —
 * one implementation behind both the Scala and SQL front-ends. This is the
 * architecture of the reference connector's command rewrites
 * (paimon-spark/.../PaimonSparkSessionExtensions.scala:41-62 injecting
 * DeleteFromPaimonTableCommand / UpdatePaimonTableCommand /
 * MergeIntoPaimonTable), re-expressed over graft's engine.
 *
 * Scale note: these commands inherit the engine's distributed shape — the
 * DELETE/UPDATE rewrite is a per-touched-bucket DataFrame job, MERGE is a
 * join + append commit; the driver only handles metadata.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(session => new GraftRowLevelSql(session))
    ext.injectPostHocResolutionRule(session => GraftCreateTableLike(session))
    ext.injectResolutionRule(session => GraftViewResolver(session))
    // CALL sys.* / SHOW TAGS / tag DDL (reference grammar
    // PaimonSqlExtensions.g4:72-89); everything else delegates to Spark
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    // AQE stage prep: drop the key-grouped scan layout when no operator
    // downstream exploits it (lets small per-bucket files bin-pack across
    // buckets instead of pinning one task per bucket)
    ext.injectQueryStagePrepRule(_ => DisableUnnecessaryGraftBucketedScan)
    GraftTableFunctions.all.foreach(ext.injectTableFunction)
    // SQL LATERAL vector search: collapse LateralJoin over a correlated
    // graft_vector_search into ONE batched top-k corpus pass (the
    // reference's resolveLateralVectorSearch surface, batched shape)
    ext.injectResolutionRule(session => GraftLateralVectorSearchRule(session))
    ext.injectPlannerStrategy(_ => GraftLateralStrategy)
    // scalar fn: graft_bucket(numBuckets, key...) — the write path's exact
    // bucket routing, exposed for debugging/repartitioning (paimon
    // `fixed_bucket` SQL function, docs/spark/sql-functions.md)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bucket"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, "graft_bucket"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_bucket(numBuckets, key, ...)")
        Cast(Pmod(new XxHash64(args.tail), Cast(args.head, LongType)), IntegerType)
      }))
    // the native text-pipeline expressions as SQL scalars: simhash
    // fingerprints, word-n-gram shingle hashes, language marker scores
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(text)")
        graft.functions.SimHash32(args.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingle_hashes(text, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle size must be an INT literal, got $other")
        }
        graft.functions.ShingleHashes(args.head, n)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lang_scores"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, "graft_lang_scores"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_lang_scores(text)")
        graft.functions.LangMarkerScores(args.head)
      }))
  }
}

/** Extracts (relation, engine table) when a plan is a graft DSv2 relation. */
object GraftRel {
  def unapply(plan: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSparkTable => Some((r, g.t))
        case _ => None
      }
      case _ => None
    }
}

class GraftRowLevelSql(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GraftRel(_, gt), cond) if d.resolved =>
      GraftDeleteCommand(gt, toColumn(cond))
    case u: UpdateTable if u.resolved =>
      u.table match {
        case GraftRel(_, gt) =>
          val sets = u.assignments.map { a =>
            topLevelName(a.key) -> toColumn(a.value)
          }.toMap
          GraftUpdateCommand(gt, sets, u.condition.map(toColumn).getOrElse(lit(true)))
        case _ => plan
      }
    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case GraftRel(rel, gt) => rewriteMerge(m, rel, gt)
        case _ => plan
      }
    // df.writeTo(t).overwritePartitions() / INSERT OVERWRITE in dynamic
    // partition-overwrite mode: Spark's OverwritePartitionsDynamicExec needs
    // a native BatchWrite (no V1 fallback), so route it to the engine's
    // dynamic overwrite like the other row-level commands
    case o: OverwritePartitionsDynamic if o.resolved =>
      o.table match {
        case GraftRel(_, gt) => GraftDynamicOverwriteCommand(gt, o.query)
        case _ => plan
      }
    case _ => plan
  }

  /** Swap resolved attributes for name-based unresolved ones so the engine
    * can re-resolve the predicate against its own DataFrame plans. */
  private def toColumn(e: Expression): Column =
    SparkShims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def topLevelName(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"graft SQL UPDATE/MERGE supports top-level column assignment only, got $other")
  }

  /** Qualify attributes by side ("t" = target, "s" = source) to match the
    * aliases MergeIntoBuilder puts on its join inputs. */
  private def sideColumn(e: Expression, targetIds: Set[ExprId], sourceIds: Set[ExprId]): Column =
    SparkShims.column(e.transform {
      case a: AttributeReference if targetIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sourceIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", a.name))
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def rewriteMerge(m: MergeIntoTable, rel: DataSourceV2Relation,
                           gt: GraftTable): LogicalPlan = {
    val targetIds = rel.output.map(_.exprId).toSet
    val sourceIds = m.sourceTable.output.map(_.exprId).toSet
    def c(e: Expression): Column = sideColumn(e, targetIds, sourceIds)
    def actOf(a: MergeAction): MergeActionSpec = a match {
      case UpdateAction(cond, assigns, _) =>
        MergeActionSpec("update", cond.map(c),
          assigns.map(x => topLevelName(x.key) -> c(x.value)).toMap)
      case DeleteAction(cond) => MergeActionSpec("delete", cond.map(c), Map.empty)
      case InsertAction(cond, assigns) =>
        MergeActionSpec("insert", cond.map(c),
          assigns.map(x => topLevelName(x.key) -> c(x.value)).toMap)
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported action $other (star actions expand during analysis)")
    }
    GraftMergeCommand(gt, m.sourceTable, c(m.mergeCondition),
      m.matchedActions.map(actOf), m.notMatchedActions.map(actOf),
      m.notMatchedBySourceActions.map(actOf))
  }
}

case class MergeActionSpec(kind: String, condition: Option[Column],
                           set: Map[String, Column])

case class GraftDeleteCommand(t: GraftTable, cond: Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // deletion-vectors mode: mark positions instead of rewriting files
    if (t.config.option("deletion-vectors.enabled", "false") == "true") t.deleteDv(cond)
    else t.delete(cond)
    Nil
  }
}

case class GraftDynamicOverwriteCommand(t: GraftTable, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    t.overwrite(SparkShims.ofRows(session, query), dynamic = true)
    Nil
  }
}

case class GraftUpdateCommand(t: GraftTable, sets: Map[String, Column],
                              cond: Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = { t.update(sets, cond); Nil }
}

case class GraftMergeCommand(t: GraftTable, source: LogicalPlan, cond: Column,
                             matched: Seq[MergeActionSpec],
                             notMatched: Seq[MergeActionSpec],
                             notMatchedBySource: Seq[MergeActionSpec])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val src = SparkShims.ofRows(session, source)
    val b = t.mergeInto(src, cond)
    matched.foreach { a =>
      a.kind match {
        case "update" => b.whenMatchedUpdate(a.condition, a.set)
        case "delete" => b.whenMatchedDelete(a.condition)
        case other => throw new UnsupportedOperationException(s"matched action $other")
      }
    }
    notMatched.foreach { a =>
      require(a.kind == "insert", s"not-matched action ${a.kind}")
      b.whenNotMatchedInsert(a.condition, a.set)
    }
    notMatchedBySource.foreach { a =>
      a.kind match {
        case "delete" => b.whenNotMatchedBySourceDelete(a.condition)
        case "update" => b.whenNotMatchedBySourceUpdate(a.condition, a.set)
        case other => throw new UnsupportedOperationException(s"not-matched-by-source action $other")
      }
    }
    b.execute()
    Nil
  }
}
