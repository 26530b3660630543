package graft.dsv2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.{CreateTableLikeCommand, LeafRunnableCommand}
import org.apache.spark.sql.graft.SparkShims

import scala.jdk.CollectionConverters._

/**
 * `CREATE TABLE target LIKE source` for graft catalogs (reference
 * docs/spark/sql-ddl.md "Create Table Like"; rewrite architecture of
 * paimon-spark's RewriteCreateTableLikeCommand.scala:33 +
 * PaimonCreateTableLikeCommand.scala): Spark plans the statement as the
 * session-catalog-only v1 `CreateTableLikeCommand`, so a post-hoc rule
 * re-targets it when the target resolves to a [[GraftCatalog]] (always) or
 * to a [[GraftGenericCatalog]] (only under an explicit `USING graft`, per
 * the reference's SparkGenericCatalog gate).
 *
 * Copy semantics (reference doc): schema and partitioning always; table
 * properties only when the SOURCE is a graft table too; `path`, `provider`,
 * `location`, `owner`, `external`, `is-managed-location` never. A LOCATION
 * clause on the statement creates the target as an external table. User
 * TBLPROPERTIES override everything inherited.
 */
case class GraftCreateTableLike(spark: SparkSession) extends Rule[LogicalPlan] {

  private def parts(ti: TableIdentifier): Seq[String] =
    ti.catalog.toSeq ++ ti.database.toSeq :+ ti.table

  // STORED AS / ROW FORMAT SERDE — hive storage syntax the engine rejects
  private def hiveStorage(f: CatalogStorageFormat): Boolean =
    f.serde.isDefined || f.inputFormat.isDefined || f.outputFormat.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case c: CreateTableLikeCommand =>
      SparkShims.catalogAndIdentifier(spark, parts(c.targetTable)) match {
        case Some((tc: GraftCatalog, tIdent)) =>
          if (hiveStorage(c.fileFormat))
            throw new UnsupportedOperationException(
              "graft tables manage their own storage layout; drop the " +
                "STORED AS / ROW FORMAT clause from CREATE TABLE LIKE")
          require(c.provider.forall(_.equalsIgnoreCase("graft")),
            s"graft catalog can only create graft tables, got USING ${c.provider.get}")
          rewrite(c, tc, tIdent).getOrElse(c)
        case Some((tc: GraftGenericCatalog, tIdent))
            if !hiveStorage(c.fileFormat) &&
              c.provider.exists(_.equalsIgnoreCase("graft")) =>
          rewrite(c, tc, tIdent).getOrElse(c)
        case _ => c
      }
  }

  private def rewrite(c: CreateTableLikeCommand, tc: TableCatalog,
                      tIdent: Identifier): Option[LogicalPlan] =
    SparkShims.catalogAndIdentifier(spark, parts(c.sourceTable)).collect {
      case (sc: TableCatalog, sIdent) =>
        GraftCreateTableLikeCommand(tc, tIdent, sc, sIdent,
          c.fileFormat.locationUri.map(_.toString), c.properties, c.ifNotExists)
    }
}

case class GraftCreateTableLikeCommand(
    targetCatalog: TableCatalog, targetIdent: Identifier,
    sourceCatalog: TableCatalog, sourceIdent: Identifier,
    location: Option[String], userProps: Map[String, String],
    ifNotExists: Boolean) extends LeafRunnableCommand {

  // keys that describe the SOURCE's placement/identity, never copied
  private val neverCopied = Set("path", "provider", "location", "owner",
    "external", "is-managed-location", "partition", "transient_lastDdlTime")

  override def run(spark: SparkSession): Seq[Row] = {
    if (targetCatalog.tableExists(targetIdent)) {
      if (ifNotExists) return Nil
      throw new TableAlreadyExistsException(
        (targetIdent.namespace() :+ targetIdent.name()).toSeq)
    }
    val src = sourceCatalog.loadTable(sourceIdent)
    val srcProps = src.properties().asScala.toMap
    val inherited =
      if (src.isInstanceOf[GraftSparkTable]) srcProps -- neverCopied
      else srcProps.view.filterKeys(_ == "comment").toMap // cross-provider: comment only
    // provider=graft routes GraftGenericCatalog's delegation to the graft
    // side; the graft catalog itself strips the key before persisting
    val props = inherited ++ userProps ++ location.map("location" -> _) +
      ("provider" -> "graft")
    targetCatalog.createTable(targetIdent, src.schema(), src.partitioning(),
      props.asJava)
    Nil
  }
}
