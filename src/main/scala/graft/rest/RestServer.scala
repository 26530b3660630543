package graft.rest

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Json, SnapshotManager, TableConfig, TableSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/**
 * REST catalog SERVER (reference: docs/docs/concepts/rest/, API shape
 * paimon-api/.../rest/ResourcePaths.java): a lightweight metadata service
 * over a warehouse directory, speaking the reference's endpoint layout —
 *
 *   GET    /v1/config                                  → {defaults:{prefix,warehouse}}
 *   GET    /v1/{p}/databases[?maxResults&pageToken]     → {databases:[...],nextPageToken}
 *   POST   /v1/{p}/databases                            {name}
 *   GET    /v1/{p}/databases/{db}                       → {name, options}
 *   DELETE /v1/{p}/databases/{db}
 *   GET    /v1/{p}/databases/{db}/tables[?...]          → {tables:[...],nextPageToken}
 *   POST   /v1/{p}/databases/{db}/tables                {name, schemaJson, primaryKeys,
 *                                                        partitionKeys, numBuckets, options}
 *   GET    /v1/{p}/databases/{db}/tables/{t}            → {name, path, schemaJson, ...}
 *   DELETE /v1/{p}/databases/{db}/tables/{t}
 *   POST   /v1/{p}/tables/rename                        {source, destination}
 *
 * Auth is the reference's bear-token scheme (rest/bear.md): every request
 * must carry `Authorization: Bearer <token>`; mismatch → 401.
 *
 * The server is deliberately Spark-free (plain Hadoop FS + the core metadata
 * codecs): it models the reference's standalone catalog service, where all
 * technology-specific logic lives server-side. Data-path reads/writes go
 * straight to storage — only metadata crosses this API (the reference's
 * decoupled-architecture posture).
 */
class GraftRestServer(warehouse: String, token: String, prefix: String = "main") {

  private val conf = new Configuration()
  private val whPath = new Path(warehouse)
  private def fs = whPath.getFileSystem(conf)
  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    fs.mkdirs(whPath)
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v1", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    // start from a daemon thread: HttpServer's internal dispatcher/timer
    // threads inherit daemon status, so an embedded server never blocks JVM
    // exit (a main() that forgets stop() would otherwise hang the process)
    val starter = new Thread(() => server.start(), "graft-rest-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  // ---------------------------------------------------------------- routing

  private case class Resp(code: Int, body: Map[String, Any])

  private def handle(ex: HttpExchange): Unit = {
    val resp =
      try {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (!auth.contains(s"Bearer $token"))
          Resp(401, Map("message" -> "invalid or missing bearer token"))
        else route(ex)
      } catch {
        case e: IllegalArgumentException => Resp(409, Map("message" -> e.getMessage))
        case e: Throwable => Resp(500, Map("message" -> String.valueOf(e.getMessage)))
      }
    val bytes = Json.write(resp.body).getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(resp.code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def body(ex: HttpExchange): Map[String, Any] = {
    val s = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    if (s.isEmpty) Map.empty
    else Json.mapper.readValue(s, classOf[Map[String, Any]])
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split('&').toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> URLDecoder.decode(v, UTF_8))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  /** Stable paged listing: sorted names after `pageToken`, up to
    * `maxResults`, `nextPageToken` = last returned name (reference RESTApi
    * pagination contract). */
  private def page(all: Seq[String], q: Map[String, String],
                   key: String): Map[String, Any] = {
    val sorted = all.sorted
    val after = q.get("pageToken").map(t => sorted.dropWhile(_ <= t)).getOrElse(sorted)
    val max = q.get("maxResults").map(_.toInt).getOrElse(Int.MaxValue)
    val slice = after.take(max)
    val base: Map[String, Any] = Map(key -> slice)
    if (slice.size == max && after.size > max && slice.nonEmpty)
      base + ("nextPageToken" -> slice.last)
    else base
  }

  private def dbPath(db: String): Path = new Path(warehouse, s"$db.db")
  private def tablePath(db: String, t: String): Path = new Path(dbPath(db), t)

  private def listDatabases: Seq[String] =
    if (!fs.exists(whPath)) Nil
    else fs.listStatus(whPath).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".db")).map(_.stripSuffix(".db"))

  private def listTables(db: String): Seq[String] =
    if (!fs.exists(dbPath(db))) throw NotFound(s"database $db not found")
    else fs.listStatus(dbPath(db)).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.startsWith("_"))
      .filter(n => new SnapshotManager(tablePath(db, n).toString, conf).tableExists)

  private case class NotFound(msg: String) extends RuntimeException(msg)

  private def route(ex: HttpExchange): Resp = {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.stripPrefix("/v1").split('/').toSeq
      .filter(_.nonEmpty).map(URLDecoder.decode(_, UTF_8))
    try {
      (method, parts) match {
        case ("GET", Seq("config")) =>
          Resp(200, Map("defaults" -> Map("prefix" -> prefix, "warehouse" -> warehouse)))

        case ("GET", Seq(`prefix`, "databases")) =>
          Resp(200, page(listDatabases, query(ex), "databases"))
        case ("POST", Seq(`prefix`, "databases")) =>
          val name = body(ex)("name").toString
          require(!fs.exists(dbPath(name)), s"database $name exists")
          fs.mkdirs(dbPath(name))
          Resp(200, Map("name" -> name))
        case ("GET", Seq(`prefix`, "databases", db)) =>
          if (!fs.exists(dbPath(db))) throw NotFound(s"database $db not found")
          Resp(200, Map("name" -> db, "options" -> Map.empty[String, String]))
        case ("DELETE", Seq(`prefix`, "databases", db)) =>
          if (!fs.exists(dbPath(db))) throw NotFound(s"database $db not found")
          require(listTables(db).isEmpty, s"database $db is not empty")
          fs.delete(dbPath(db), true)
          Resp(200, Map("name" -> db))

        case ("GET", Seq(`prefix`, "databases", db, "tables")) =>
          Resp(200, page(listTables(db), query(ex), "tables"))
        case ("POST", Seq(`prefix`, "databases", db, "tables")) =>
          if (!fs.exists(dbPath(db))) throw NotFound(s"database $db not found")
          val b = body(ex)
          val name = b("name").toString
          val loc = tablePath(db, name)
          val sm = new SnapshotManager(loc.toString, conf)
          require(!sm.tableExists, s"table $db.$name exists")
          val schema = DataType.fromJson(b("schemaJson").toString).asInstanceOf[StructType]
          def strs(k: String): Seq[String] = b.get(k) match {
            case Some(xs: Seq[_]) => xs.map(_.toString)
            case Some(xs: java.util.List[_]) => xs.asScala.toSeq.map(_.toString)
            case _ => Nil
          }
          val opts = b.get("options") match {
            case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> String.valueOf(v) }
            case Some(m: java.util.Map[_, _]) =>
              m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
            case _ => Map.empty[String, String]
          }
          val cfg = TableConfig(
            primaryKeys = strs("primaryKeys"), partitionKeys = strs("partitionKeys"),
            numBuckets = b.get("numBuckets").map(_.toString.toInt).getOrElse(4),
            mergeEngine = opts.getOrElse("merge-engine", "deduplicate"),
            sequenceField = opts.get("sequence.field"),
            options = opts -- Seq("merge-engine", "sequence.field"))
          cfg.primaryKeys.foreach(k => require(schema.fieldNames.contains(k),
            s"primary key $k not in schema"))
          // same bucket-routing layout stamp as GraftTable.create
          val stamped =
            if (cfg.numBuckets > 0 && cfg.primaryKeys.nonEmpty &&
                !cfg.options.contains("bucket.key-layout"))
              cfg.copy(options = cfg.options + ("bucket.key-layout" -> "trimmed-pk"))
            else cfg
          sm.writeSchema(TableSchema.fromSpark(0, schema, stamped))
          Resp(200, tableInfo(db, name))
        case ("GET", Seq(`prefix`, "databases", db, "tables", t)) =>
          val sm = new SnapshotManager(tablePath(db, t).toString, conf)
          if (!sm.tableExists) throw NotFound(s"table $db.$t not found")
          Resp(200, tableInfo(db, t))
        case ("DELETE", Seq(`prefix`, "databases", db, "tables", t)) =>
          val loc = tablePath(db, t)
          if (!new SnapshotManager(loc.toString, conf).tableExists)
            throw NotFound(s"table $db.$t not found")
          fs.delete(loc, true)
          Resp(200, Map("name" -> t))

        case ("POST", Seq(`prefix`, "tables", "rename")) =>
          val b = body(ex)
          val Array(sdb, st) = b("source").toString.split('.')
          val Array(ddb, dt) = b("destination").toString.split('.')
          if (!new SnapshotManager(tablePath(sdb, st).toString, conf).tableExists)
            throw NotFound(s"table $sdb.$st not found")
          require(!fs.exists(tablePath(ddb, dt)), s"table $ddb.$dt exists")
          fs.mkdirs(dbPath(ddb))
          require(fs.rename(tablePath(sdb, st), tablePath(ddb, dt)),
            s"rename $sdb.$st -> $ddb.$dt failed")
          Resp(200, Map("name" -> dt))

        case _ => Resp(404, Map("message" -> s"no route $method /v1/${parts.mkString("/")}"))
      }
    } catch { case NotFound(m) => Resp(404, Map("message" -> m)) }
  }

  private def tableInfo(db: String, t: String): Map[String, Any] = {
    val loc = tablePath(db, t).toString
    val sm = new SnapshotManager(loc, conf)
    val sc = sm.latestSchema
    Map("name" -> t, "path" -> loc, "schemaJson" -> sc.sparkSchema.json,
      "primaryKeys" -> sc.config.primaryKeys,
      "partitionKeys" -> sc.config.partitionKeys,
      "options" -> sc.config.options)
  }
}
