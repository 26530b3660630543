package graft.dsv2

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.Row

/**
 * SQL surface for maintenance: `CALL sys.<proc>(...)`, `SHOW TAGS t`, and
 * tag DDL — the reference's parser extension
 * (paimon-spark/.../antlr4/.../PaimonSqlExtensions.g4:72-89 + its
 * PaimonSqlExtensionsParser delegate chain), re-expressed as a lightweight
 * delegating parser: the handful of statement shapes Spark's grammar lacks
 * are recognized here and compiled straight to runnable commands over the
 * Procedures registry; EVERYTHING else falls through to Spark's parser.
 *
 * {{{
 *   CALL sys.compact(table => 'graft.db.t', order_strategy => 'zorder', order_by => 'x,y')
 *   CALL sys.expire_snapshots(table => 'graft.db.t', retain_last => 2)
 *   SHOW TAGS graft.db.t
 *   ALTER TABLE graft.db.t CREATE TAG v1 [AS OF VERSION 3]
 *   ALTER TABLE graft.db.t DELETE TAG v1
 *   ALTER TABLE graft.db.t RENAME TAG v1 TO v2
 * }}}
 */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim.stripSuffix(";")
    t match {
      case CallRe(proc, argStr) =>
        val args = parseArgs(argStr)
        if (GraftSqlParser.catalogProcs(proc)) GraftCatalogCallCommand(proc, args)
        else {
          val table = args.getOrElse("table", throw new IllegalArgumentException(
            s"CALL sys.$proc: required named argument table => '<ident>'"))
          GraftCallCommand(splitIdent(table), proc, args - "table")
        }
      case GraftCopyInto.HeadRe(target, rest) => GraftCopyInto.plan(target, rest)
      // catalog-qualified CREATE TABLE LIKE: Spark's own grammar caps the
      // identifiers at db.table, so 3-part spellings re-parse through a
      // placeholder statement and the real names are restored on the parsed
      // command (reference PaimonSqlExtensions.g4:87 #createTableLike +
      // PaimonSqlExtensionsAstBuilder.visitCreateTableLike)
      case CreateTableLikeRe(ifNx, tgt, src, rest)
          if splitIdent(tgt).length > 2 || splitIdent(src).length > 2 =>
        val inx = if (ifNx != null) "IF NOT EXISTS " else ""
        delegate.parsePlan(
          s"CREATE TABLE ${inx}__graft_like_tgt LIKE __graft_like_src $rest") match {
          case c: org.apache.spark.sql.execution.command.CreateTableLikeCommand =>
            c.copy(targetTable = toTableIdent(splitIdent(tgt)),
              sourceTable = toTableIdent(splitIdent(src)))
          case other => other
        }
      case ShowTagsRe(ident) => GraftShowTagsCommand(splitIdent(ident))
      case ShowBranchesRe(ident) => GraftShowBranchesCommand(splitIdent(ident))
      case CreateBranchRe(ident, branch, version) =>
        GraftBranchDdlCommand(splitIdent(ident), "create", branch,
          Option(version).map(_.toLong))
      case DeleteBranchRe(ident, branch) =>
        GraftBranchDdlCommand(splitIdent(ident), "delete", branch, None)
      case CreateTagRe(ident, tag, version) =>
        GraftTagDdlCommand(splitIdent(ident), "create", tag,
          Option(version).map(_.toLong), None)
      case DeleteTagRe(ident, tag) =>
        GraftTagDdlCommand(splitIdent(ident), "delete", tag, None, None)
      case RenameTagRe(ident, tag, to) =>
        GraftTagDdlCommand(splitIdent(ident), "rename", tag, None, Some(to))
      // catalog views — intercepted ONLY when the target catalog is ours
      // (temp views and session-catalog views delegate untouched)
      case CreateViewRe(orRepl, ifNx, ident, query)
          if GraftViewCommands.graftViewTarget(session, splitIdent(ident)).isDefined =>
        GraftCreateViewCommand(splitIdent(ident), orRepl != null, ifNx != null, query)
      case DropViewRe(ifEx, ident)
          if GraftViewCommands.graftViewTarget(session, splitIdent(ident)).isDefined =>
        GraftDropViewCommand(splitIdent(ident), ifEx != null)
      case RenameViewRe(ident, to)
          if GraftViewCommands.graftViewTarget(session, splitIdent(ident)).isDefined =>
        GraftRenameViewCommand(splitIdent(ident), splitIdent(to))
      case ShowViewsRe(ns)
          if GraftSqlParser.namedCatalog(session,
            splitIdent(ns).head).exists(_.isInstanceOf[GraftCatalog]) ||
            (session.sessionState.catalogManager.currentCatalog
              .isInstanceOf[GraftCatalog]) =>
        GraftShowViewsCommand(splitIdent(ns))
      case _ => delegate.parsePlan(sqlText)
    }
  }

  // everything else delegates untouched
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {
  // CALL [cat.]sys.proc(args)
  private val CallRe =
    """(?is)^CALL\s+(?:[\w`]+\.)?sys\.(\w+)\s*\((.*)\)\s*$""".r
  private val ShowTagsRe = """(?is)^SHOW\s+TAGS\s+([\w`.]+)\s*$""".r
  private val CreateViewRe =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w`.]+)\s+AS\s+(.+)$""".r
  private val DropViewRe =
    """(?is)^DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w`.]+)\s*$""".r
  private val RenameViewRe =
    """(?is)^ALTER\s+VIEW\s+([\w`.]+)\s+RENAME\s+TO\s+([\w`.]+)\s*$""".r
  private val ShowViewsRe =
    """(?is)^SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w`.]+)\s*$""".r
  private val ShowBranchesRe = """(?is)^SHOW\s+BRANCHES\s+([\w`.]+)\s*$""".r
  private val CreateBranchRe =
    """(?is)^ALTER\s+TABLE\s+([\w`.]+)\s+CREATE\s+BRANCH\s+(?:IF\s+NOT\s+EXISTS\s+)?[`']?([\w.-]+)[`']?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$""".r
  private val DeleteBranchRe =
    """(?is)^ALTER\s+TABLE\s+([\w`.]+)\s+DELETE\s+BRANCH\s+(?:IF\s+EXISTS\s+)?[`']?([\w.-]+)[`']?\s*$""".r
  private val CreateTagRe =
    """(?is)^ALTER\s+TABLE\s+([\w`.]+)\s+CREATE\s+TAG\s+(?:IF\s+NOT\s+EXISTS\s+)?[`']?([\w.-]+)[`']?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*$""".r
  private val DeleteTagRe =
    """(?is)^ALTER\s+TABLE\s+([\w`.]+)\s+DELETE\s+TAG\s+(?:IF\s+EXISTS\s+)?[`']?([\w.-]+)[`']?\s*$""".r
  private val RenameTagRe =
    """(?is)^ALTER\s+TABLE\s+([\w`.]+)\s+RENAME\s+TAG\s+[`']?([\w.-]+)[`']?\s+TO\s+[`']?([\w.-]+)[`']?\s*$""".r

  /** Procedures scoped to the CATALOG, not a table. */
  private[dsv2] val catalogProcs: Set[String] =
    Set("create_function", "alter_function", "drop_function", "list_functions",
      "compact_database", "migrate_database", "alter_view_dialect",
      "init_file_based_privilege", "create_privileged_user",
      "drop_privileged_user", "grant_privilege_to_user",
      "revoke_privilege_from_user")

  private val CreateTableLikeRe =
    """(?is)^CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w`.]+)\s+LIKE\s+([\w`.]+)\s*(.*)$""".r

  private[dsv2] def splitIdent(s: String): Seq[String] =
    s.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq

  private[dsv2] def toTableIdent(parts: Seq[String]): TableIdentifier = parts match {
    case Seq(t) => TableIdentifier(t)
    case Seq(d, t) => TableIdentifier(t, Some(d))
    case Seq(c, d, t) => TableIdentifier(t, Some(d), Some(c))
    case _ => throw new IllegalArgumentException(
      s"expected [catalog.][db.]table, got ${parts.mkString(".")}")
  }

  /** `k => v` pairs; values are 'quoted strings' or bare literals. */
  private[dsv2] def parseArgs(s: String): Map[String, String] = {
    if (s.trim.isEmpty) return Map.empty
    val ArgRe = """(\w+)\s*=>\s*(?:'((?:[^']|'')*)'|([^,\s][^,]*?))\s*(?:,|$)""".r
    ArgRe.findAllMatchIn(s).map { m =>
      val v = Option(m.group(2)).map(_.replace("''", "'"))
        .getOrElse(m.group(3).trim)
      m.group(1) -> v
    }.toMap
  }

  /** Resolve a multipart identifier to the engine table through the DSv2
    * catalog (honors current catalog/namespace for short names). */
  /** `cm.catalog(name)` instantiates lazily; isCatalogRegistered only sees
    * already-instantiated ones — probe by lookup instead. */
  private[dsv2] def namedCatalog(
      session: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(session.sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }

  def resolveTable(session: SparkSession, ident: Seq[String]): GraftTable = {
    val cm = session.sessionState.catalogManager
    val (catalog, rest) =
      (if (ident.length > 1) namedCatalog(session, ident.head) else None) match {
        case Some(c) => (c, ident.tail)
        case None => (cm.currentCatalog, ident)
      }
    val (ns, name) =
      if (rest.length == 1) (cm.currentNamespace.toSeq, rest.head)
      else (rest.init, rest.last)
    catalog match {
      case tc: TableCatalog =>
        tc.loadTable(Identifier.of(ns.toArray, name)) match {
          case g: GraftSparkTable => g.t
          case other => throw new IllegalArgumentException(
            s"${ident.mkString(".")} is not a graft table (${other.getClass.getSimpleName})")
        }
      case _ => throw new IllegalArgumentException(
        s"catalog of ${ident.mkString(".")} is not a TableCatalog")
    }
  }
}

/** CALL sys.<proc>(table => 't', k => v, ...) → Procedures registry. */
case class GraftCallCommand(ident: Seq[String], proc: String,
                            args: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(session, ident)
    Procedures.call(session, t, proc, args).collect().toSeq
      .map(r => Row(r.toSeq.mkString(", ")))
  }
}

/** Catalog-scoped procedures: persisted lambda functions
  * (paimon CreateFunctionProcedure / DropFunctionProcedure). */
case class GraftCatalogCallCommand(proc: String, args: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())

  private def graftCatalog(session: SparkSession,
                           ident: Seq[String]): (GraftCatalog, Seq[String]) = {
    val cm = session.sessionState.catalogManager
    val (cat, rest) =
      (if (ident.length > 1) GraftSqlParser.namedCatalog(session, ident.head)
       else None) match {
        case Some(c) => (c, ident.tail)
        case None => (cm.currentCatalog, ident)
      }
    cat match {
      case g: GraftCatalog => (g, rest)
      case other => throw new IllegalArgumentException(
        s"${other.name()} is not a graft catalog")
    }
  }

  override def run(session: SparkSession): Seq[Row] = proc match {
    case "create_function" =>
      val ident = GraftSqlParser.splitIdent(args("name"))
      val (g, rest) = graftCatalog(session, ident)
      require(rest.length == 2, "function name must be <db>.<name>")
      GraftUserFunctions.create(session, g.warehousePath, rest.head, rest.last,
        args("lambda"))
      Seq(Row(s"function ${rest.mkString(".")} created"))
    case "alter_function" =>
      // paimon AlterFunctionProcedure: replace the lambda of an existing fn
      val ident = GraftSqlParser.splitIdent(args("name"))
      val (g, rest) = graftCatalog(session, ident)
      require(rest.length == 2, "function name must be <db>.<name>")
      require(GraftUserFunctions.load(session, g.warehousePath,
        rest.head, rest.last).isDefined, s"no function ${rest.mkString(".")}")
      GraftUserFunctions.create(session, g.warehousePath, rest.head, rest.last,
        args("lambda"))
      Seq(Row(s"function ${rest.mkString(".")} altered"))
    case "drop_function" =>
      val ident = GraftSqlParser.splitIdent(args("name"))
      val (g, rest) = graftCatalog(session, ident)
      require(rest.length == 2, "function name must be <db>.<name>")
      val dropped = GraftUserFunctions.drop(session, g.warehousePath, rest.head, rest.last)
      Seq(Row(s"function ${rest.mkString(".")} dropped: $dropped"))
    case "alter_view_dialect" =>
      // paimon AlterViewDialectProcedure: add/update/drop a per-engine
      // query dialect on a catalog view (stored as dialect.<engine> props;
      // the spark dialect overrides the view's query at load)
      val ident = GraftSqlParser.splitIdent(args("view"))
      val (g, rest) = graftCatalog(session, ident)
      require(rest.length == 2, "view name must be <db>.<name>")
      val vid = org.apache.spark.sql.connector.catalog.Identifier
        .of(Array(rest.head), rest.last)
      val engine = args.getOrElse("engine", "spark")
      val action = args.getOrElse("action", "add")
      import org.apache.spark.sql.connector.catalog.ViewChange
      val change = action match {
        case "add" | "update" =>
          ViewChange.setProperty(s"dialect.$engine", args("query"))
        case "drop" => ViewChange.removeProperty(s"dialect.$engine")
        case other => throw new IllegalArgumentException(s"unknown action $other")
      }
      g.alterView(vid, change)
      Seq(Row(s"view ${rest.mkString(".")} dialect $engine ${action}ed"))
    case "migrate_database" =>
      // paimon MigrateDatabaseProcedure: import every table of a raw
      // source directory (parquet subdirs) into graft tables in `database`
      import graft.core.RowOps._
      val (g, rest) = graftCatalog(session,
        GraftSqlParser.splitIdent(args("database")))
      val db = rest.mkString(".")
      val src = new org.apache.hadoop.fs.Path(args("source"))
      val fs = src.getFileSystem(session.sessionState.newHadoopConf())
      val results = fs.listStatus(src).toSeq.filter(_.isDirectory).map { d =>
        val name = d.getPath.getName
        val df = session.read.format(args.getOrElse("format", "parquet"))
          .load(d.getPath.toString)
        val t = GraftTable.createOrReplace(session,
          g.tableLocation(db, name), df.schema, TableConfig())
        t.write(df)
        Row(s"$db.$name: ${t.read().count()} rows")
      }
      if (results.isEmpty) Seq(Row("no tables found")) else results
    case "list_functions" =>
      val ident = GraftSqlParser.splitIdent(args.getOrElse("database", ""))
      val (g, rest) = graftCatalog(session, ident)
      GraftUserFunctions.list(session, g.warehousePath, rest.mkString(".")).map(Row(_))
    case "compact_database" =>
      // compact every table of a database, filtered by including/excluding
      // regex patterns — '|'-separated, fleet-maintenance shape (paimon
      // CompactDatabaseProcedure.java:49 includingTables/excludingTables)
      import graft.core.RowOps._
      val ident = GraftSqlParser.splitIdent(args("database"))
      val (g, rest) = graftCatalog(session, ident)
      val db = rest.mkString(".")
      // each arg is ONE regex (alternation with '|' stays inside it, as the
      // reference compiles the whole string — '(ods|dim)_.*' is one pattern)
      def pattern(k: String): Option[java.util.regex.Pattern] =
        args.get(k).map(_.trim).filter(_.nonEmpty)
          .map(java.util.regex.Pattern.compile)
      val inc = pattern("including_tables")
      val exc = pattern("excluding_tables")
      def selected(n: String): Boolean =
        inc.forall(_.matcher(n).matches()) &&
          !exc.exists(_.matcher(n).matches())
      val results = g.listTables(Array(db)).toSeq
        .filter(id => selected(id.name())).map { id =>
          val t = GraftTable.load(session,
            g.tableLocation(db, id.name()))
          val r = t.compact()
          s"${id.name()}: ${r.map(s => s"compacted to ${s.id}").getOrElse("no-op")}"
        }
      if (results.isEmpty) Seq(Row("no tables matched"))
      else results.map(Row(_))

    // ---- privilege system (paimon manage-privileges.mdx procedures) ----
    case "init_file_based_privilege" =>
      val g = targetCatalog(session)
      GraftPrivileges.init(privFs(session, g), g.warehousePath,
        args("root_password"))
      Seq(Row("privilege system initialized (user root)"))
    case "create_privileged_user" =>
      val g = targetCatalog(session); g.requireAdmin()
      GraftPrivileges.createUser(privFs(session, g), g.warehousePath,
        args("name"), args("password"))
      Seq(Row(s"user ${args("name")} created"))
    case "drop_privileged_user" =>
      val g = targetCatalog(session); g.requireAdmin()
      GraftPrivileges.dropUser(privFs(session, g), g.warehousePath, args("name"))
      Seq(Row(s"user ${args("name")} dropped"))
    case "grant_privilege_to_user" =>
      val g = targetCatalog(session); g.requireAdmin()
      GraftPrivileges.grant(privFs(session, g), g.warehousePath,
        args("name"), args("privilege").toUpperCase, privScope(args))
      Seq(Row(s"granted ${args("privilege")} on ${privScope(args)} to ${args("name")}"))
    case "revoke_privilege_from_user" =>
      val g = targetCatalog(session); g.requireAdmin()
      GraftPrivileges.revoke(privFs(session, g), g.warehousePath,
        args("name"), args("privilege").toUpperCase, privScope(args))
      Seq(Row(s"revoked ${args("privilege")} on ${privScope(args)} from ${args("name")}"))
  }

  /** Grant scope from `database` / `table` args: `*` | db | db.table. */
  private def privScope(args: Map[String, String]): String =
    (args.get("database"), args.get("table")) match {
      case (Some(d), Some(t)) => s"$d.$t"
      case (Some(d), None) => d
      case _ => "*"
    }

  private def privFs(session: SparkSession, g: GraftCatalog) =
    new org.apache.hadoop.fs.Path(g.warehousePath)
      .getFileSystem(session.sessionState.newHadoopConf())

  /** The `catalog` arg, else the session's current catalog. */
  private def targetCatalog(session: SparkSession): GraftCatalog = {
    val c = args.get("catalog")
      .flatMap(n => GraftSqlParser.namedCatalog(session, n))
      .getOrElse(session.sessionState.catalogManager.currentCatalog)
    c match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"${other.name()} is not a graft catalog")
    }
  }
}

/** SHOW TAGS t (paimon ShowTagsCommand). */
case class GraftShowTagsCommand(ident: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("snapshot_id", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(session, ident)
    t.sm.listTags().map(tm => Row(tm.name, tm.snapshotId))
  }
}

/** SHOW BRANCHES t (paimon ShowBranchesCommand). */
case class GraftShowBranchesCommand(ident: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("branch", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(session, ident)
    t.sm.listBranches().map(Row(_))
  }
}

/** ALTER TABLE t CREATE/DELETE BRANCH (paimon branch DDL). */
case class GraftBranchDdlCommand(ident: Seq[String], op: String, branch: String,
                                 version: Option[Long]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import graft.core.RowOps._
    val t = GraftSqlParser.resolveTable(session, ident)
    op match {
      case "create" => t.createBranch(branch, version)
      case "delete" => t.deleteBranch(branch)
    }
    Nil
  }
}

/** ALTER TABLE t CREATE/DELETE/RENAME TAG (paimon CreateOrReplaceTag /
  * DeleteTag / RenameTag commands). */
case class GraftTagDdlCommand(ident: Seq[String], op: String, tag: String,
                              version: Option[Long], to: Option[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(session, ident)
    op match {
      case "create" =>
        val snap = version.orElse(t.sm.latestSnapshotId).getOrElse(
          throw new IllegalStateException("table has no snapshots to tag"))
        require(t.sm.snapshotExists(snap), s"no snapshot $snap")
        t.sm.createTag(tag, snap)
      case "delete" => t.sm.deleteTag(tag)
      case "rename" =>
        val tm = t.sm.readTag(tag)
        t.sm.createTag(to.get, tm.snapshotId)
        t.sm.deleteTag(tag)
    }
    Nil
  }
}
