package graft.dsv2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.CharVarcharUtils
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.sql.Row

/**
 * Catalog views over a graft warehouse (capability of paimon catalog views:
 * SupportView.java + PaimonViewResolver.scala + RewritePaimonViewCommands
 * .scala — same pattern: stock Spark has no analyzer path for V2 view
 * catalogs, so the extension intercepts the statements and resolves view
 * relations itself).
 *
 * Statements (intercepted by [[GraftSqlParser]] only when the target
 * catalog is a [[GraftCatalog]]): CREATE [OR REPLACE] VIEW, DROP VIEW,
 * SHOW VIEWS, ALTER VIEW ... RENAME TO. Reads resolve through
 * [[GraftViewResolver]]; `CALL sys.alter_view_dialect` manages per-engine
 * query dialects stored as view properties.
 */
object GraftViewCommands {

  /** Resolve `ident` to (GraftCatalog, view Identifier) — None when the
    * statement targets some other catalog (then the stock parser/analyzer
    * handles it, e.g. session-catalog or temp views). */
  def graftViewTarget(session: SparkSession,
                      ident: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    // temp views always win (Spark semantics)
    if (ident.length == 1 &&
        session.sessionState.catalog.isTempView(ident)) return None
    val (cat, rest) =
      (if (ident.length > 1) GraftSqlParser.namedCatalog(session, ident.head)
       else None) match {
        case Some(c) => (c, ident.tail)
        case None => (cm.currentCatalog, ident)
      }
    cat match {
      case g: GraftCatalog if rest.nonEmpty =>
        val (ns, name) =
          if (rest.length == 1) (cm.currentNamespace.toSeq, rest.head)
          else (rest.init, rest.last)
        Some((g, Identifier.of(ns.toArray, name)))
      case _ => None
    }
  }
}

case class GraftCreateViewCommand(ident: Seq[String], orReplace: Boolean,
                                  ifNotExists: Boolean, queryText: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, vid) = GraftViewCommands.graftViewTarget(session, ident).get
    if (g.viewExists(vid)) {
      if (ifNotExists) return Nil
      if (orReplace) g.dropView(vid)
      else throw new IllegalArgumentException(s"view $vid already exists")
    }
    val cm = session.sessionState.catalogManager
    // analyze (not execute) the defining query to pin the view schema
    val schema = CharVarcharUtils.replaceCharVarcharWithStringInSchema(
      session.sql(queryText).schema)
    g.createView(new ViewInfo(vid, queryText,
      cm.currentCatalog.name(), cm.currentNamespace,
      schema, schema.fieldNames, schema.fieldNames,
      new Array[String](schema.fields.length),
      java.util.Collections.emptyMap[String, String]()))
    Nil
  }
}

case class GraftDropViewCommand(ident: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, vid) = GraftViewCommands.graftViewTarget(session, ident).get
    if (!g.dropView(vid) && !ifExists)
      throw new IllegalArgumentException(s"no view $vid")
    Nil
  }
}

case class GraftRenameViewCommand(ident: Seq[String], to: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (g, vid) = GraftViewCommands.graftViewTarget(session, ident).get
    val (_, newId) = GraftViewCommands.graftViewTarget(session, to).get
    g.renameView(vid, newId)
    Nil
  }
}

case class GraftShowViewsCommand(ns: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val cm = session.sessionState.catalogManager
    val (cat, rest) =
      (if (ns.nonEmpty) GraftSqlParser.namedCatalog(session, ns.head)
       else None) match {
        case Some(c) => (c, ns.tail)
        case None => (cm.currentCatalog, ns)
      }
    cat match {
      case g: GraftCatalog =>
        val db = if (rest.nonEmpty) rest else cm.currentNamespace.toSeq
        g.listViews(db: _*).toSeq
          .map(id => Row(db.mkString("."), id.name(), false))
      case _ => throw new IllegalArgumentException(
        s"SHOW VIEWS: ${ns.mkString(".")} is not a graft namespace")
    }
  }
}

/** Resolves reads of graft catalog views: the stored (dialect-aware) SQL is
  * parsed and substituted for the relation (paimon PaimonViewResolver
  * pattern). Runs in the resolution fixed-point, so nested views resolve
  * recursively; missing tables stay unresolved for stock error reporting. */
case class GraftViewResolver(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedRelation(parts, _, _) =>
      GraftViewCommands.graftViewTarget(spark, parts) match {
        case Some((g, vid)) if g.viewExists(vid) =>
          val v = g.loadView(vid)
          SubqueryAlias(parts.last,
            spark.sessionState.sqlParser.parsePlan(v.query()))
        case _ => u
      }
  }
}
