package graft.rest

import graft.core.{GraftTable, Json}
import graft.dsv2.{GraftDataFrameTable, GraftSparkTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util
import scala.jdk.CollectionConverters._

/**
 * REST catalog CLIENT (reference `RESTCatalog`, docs/docs/concepts/rest/):
 * a Spark `TableCatalog` whose metadata operations — namespace/table listing,
 * creation, drop, rename, resolution — go through the catalog service's REST
 * API with bear-token auth, while the data path (scans, writes, row-level
 * ops) runs directly against storage through the same DSv2 table
 * implementation the filesystem catalog uses. Register with:
 *
 *   spark.sql.catalog.rc       = graft.rest.GraftRestCatalog
 *   spark.sql.catalog.rc.uri   = http://host:port
 *   spark.sql.catalog.rc.token = <bearer token>
 *
 * On initialize the client fetches `/v1/config` (prefix + warehouse
 * defaults), mirroring the reference's config-endpoint bootstrap.
 */
class GraftRestCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var baseUri: String = _
  private var token: String = _
  private var prefix: String = _
  private val http = HttpClient.newHttpClient()
  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    baseUri = Option(options.get("uri")).getOrElse(
      throw new IllegalArgumentException("REST catalog requires `uri`")).stripSuffix("/")
    token = Option(options.get("token")).getOrElse("")
    val cfg = get("/v1/config")
    prefix = cfg("defaults").asInstanceOf[Map[String, Any]]("prefix").toString
  }

  override def name(): String = catalogName

  // ------------------------------------------------------------- transport

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  private def req(method: String, path: String, body: Option[String]): Map[String, Any] = {
    val b = HttpRequest.newBuilder(URI.create(baseUri + path))
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", "application/json")
    val r = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
    }).build()
    val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
    val parsed: Map[String, Any] =
      if (resp.body() == null || resp.body().isEmpty) Map.empty
      else Json.mapper.readValue(resp.body(), classOf[Map[String, Any]])
    resp.statusCode() match {
      case 200 => parsed
      case 404 => throw RestNotFound(parsed.getOrElse("message", "not found").toString)
      case c => throw new IllegalStateException(
        s"REST catalog $method $path → $c: ${parsed.getOrElse("message", "")}")
    }
  }

  private def get(path: String) = req("GET", path, None)
  private def post(path: String, body: Map[String, Any]) =
    req("POST", path, Some(Json.write(body)))
  private def delete(path: String) = req("DELETE", path, None)

  private case class RestNotFound(msg: String) extends RuntimeException(msg)

  /** Follow the server's pagination contract to exhaustion. */
  private def listAll(path: String, key: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var tok: Option[String] = None
    var more = true
    while (more) {
      val q = tok.map(t => s"?pageToken=${enc(t)}").getOrElse("")
      val r = get(path + q)
      out ++= (r.get(key) match {
        case Some(xs: Seq[_]) => xs.map(_.toString)
        case Some(xs: java.util.List[_]) => xs.asScala.toSeq.map(_.toString)
        case _ => Nil
      })
      tok = r.get("nextPageToken").map(_.toString)
      more = tok.isDefined
    }
    out.result()
  }

  // ------------------------------------------------------------ namespaces

  private def db(namespace: Array[String]): String = {
    require(namespace.length == 1, s"nested namespaces unsupported: ${namespace.mkString(".")}")
    namespace.head
  }

  override def listNamespaces(): Array[Array[String]] =
    listAll(s"/v1/$prefix/databases", "databases").map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    try {
      get(s"/v1/$prefix/databases/${enc(db(namespace))}")
      new util.HashMap[String, String]()
    } catch { case RestNotFound(m) => throw new NoSuchNamespaceException(namespace) }

  override def namespaceExists(namespace: Array[String]): Boolean =
    try { get(s"/v1/$prefix/databases/${enc(db(namespace))}"); true }
    catch { case RestNotFound(_) => false }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    post(s"/v1/$prefix/databases", Map("name" -> db(namespace))); ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = ()

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    try { delete(s"/v1/$prefix/databases/${enc(db(namespace))}"); true }
    catch { case RestNotFound(_) => false }

  // ---------------------------------------------------------------- tables

  private def tableUrl(ident: Identifier, tname: String): String =
    s"/v1/$prefix/databases/${enc(db(ident.namespace()))}/tables/${enc(tname)}"

  private def resolvePath(ident: Identifier, tname: String): String =
    try get(tableUrl(ident, tname))("path").toString
    catch { case RestNotFound(_) =>
      throw new NoSuchTableException(ident.namespace() :+ ident.name()) }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    try listAll(s"/v1/$prefix/databases/${enc(db(namespace))}/tables", "tables")
      .map(Identifier.of(namespace, _)).toArray
    catch { case RestNotFound(_) => throw new NoSuchNamespaceException(namespace) }

  override def loadTable(ident: Identifier): Table = {
    // `t$snapshots` etc.: resolve the base table via REST, serve the system
    // view locally (system tables are storage-derived DataFrames)
    if (ident.name().contains('$')) {
      val Array(base, sys) = ident.name().split('$')
      import graft.core.RowOps._
      return new GraftDataFrameTable(s"$base$$$sys",
        GraftTable.load(spark, resolvePath(ident, base)).systemTable(sys))
    }
    new GraftSparkTable(GraftTable.load(spark, resolvePath(ident, ident.name())))
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val t = GraftTable.load(spark, resolvePath(ident, ident.name()))
    val snapId =
      if (version.matches("\\d+")) version.toLong
      else t.sm.readTag(version).snapshotId
    new GraftSparkTable(t, Some(snapId))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = GraftTable.load(spark, resolvePath(ident, ident.name()))
    val tsMillis = timestamp / 1000L
    val ids = t.sm.snapshotIds.filter(id => t.sm.readSnapshot(id).timestampMs <= tsMillis)
    if (ids.isEmpty) throw new NoSuchTableException(ident.namespace() :+ ident.name())
    new GraftSparkTable(t, Some(ids.max))
  }

  override def tableExists(ident: Identifier): Boolean =
    try { get(tableUrl(ident, ident.name())); true }
    catch { case RestNotFound(_) => false }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    val partitionKeys = partitions.toSeq.map { tr =>
      if (tr.name() == "identity") tr.references().head.fieldNames().mkString(".")
      else throw new UnsupportedOperationException(
        s"graft supports identity partitioning only, got $tr")
    }
    post(s"/v1/$prefix/databases/${enc(db(ident.namespace()))}/tables", Map(
      "name" -> ident.name(),
      "schemaJson" -> schema.json,
      "primaryKeys" -> props.get("primary-key").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil),
      "partitionKeys" -> partitionKeys,
      "numBuckets" -> props.getOrElse("bucket", "4").toInt,
      "options" -> (props -- Seq("primary-key", "bucket", "path", "provider",
        "location", "owner"))))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE via the REST catalog: route DDL through the filesystem catalog")

  override def dropTable(ident: Identifier): Boolean =
    try { delete(tableUrl(ident, ident.name())); true }
    catch { case RestNotFound(_) => false }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    post(s"/v1/$prefix/tables/rename", Map(
      "source" -> s"${db(oldIdent.namespace())}.${oldIdent.name()}",
      "destination" -> s"${db(newIdent.namespace())}.${newIdent.name()}"))
    ()
  }
}
