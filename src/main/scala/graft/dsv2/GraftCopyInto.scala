package graft.dsv2

import graft.core.{GraftTable, Json}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * `COPY INTO` SQL statement (capability of the reference's Snowflake-style
 * extension, docs/docs/spark/sql-write.md:324-480):
 *
 * {{{
 *   -- import (csv/json/parquet)
 *   COPY INTO db.t [(c1, c2)] FROM '/data/dir/'
 *   FILE_FORMAT = (TYPE = CSV [, SKIP_HEADER = 1, FIELD_DELIMITER = '|',
 *                  NULL_IF = ('NULL', ''), MULTI_LINE = TRUE])
 *   [PATTERN = '.*\.csv'] [FORCE = TRUE|FALSE]
 *   [ON_ERROR = ABORT_STATEMENT|CONTINUE|SKIP_FILE]
 *
 *   -- export (csv/json/parquet)
 *   COPY INTO '/export/dir/' FROM { db.t | (SELECT ...) }
 *   FILE_FORMAT = (TYPE = CSV [, HEADER = TRUE, FIELD_DELIMITER = ','])
 *   [OVERWRITE = TRUE|FALSE]
 * }}}
 *
 * Import semantics: files under the source dir (recursive, non-hidden) are
 * listed once on the driver — a bulk load's file inventory, not a per-row
 * loop; the listed names feed Spark's distributed reader. A per-table load
 * history (`<table>/copy-history.json`) makes re-runs idempotent: already
 * loaded files are skipped unless FORCE = TRUE (the reference's load-history
 * behavior). ON_ERROR: ABORT_STATEMENT = FAILFAST, CONTINUE = drop malformed
 * rows, SKIP_FILE = validate each file and load only the readable ones.
 */
object GraftCopyInto {

  private[dsv2] val HeadRe = """(?is)^COPY\s+INTO\s+(.+?)\s+FROM\s+(.+)$""".r

  /** Option entries: KEY = 'str' | ('a','b') | bare. */
  // entries may be separated by commas (FILE_FORMAT body) or just
  // whitespace/newlines (the statement's trailing options)
  private val OptRe =
    """(?i)(\w+)\s*=\s*(?:\(([^)]*)\)|'((?:[^']|'')*)'|([^,\s()]+))\s*,?""".r
  private val QuotedRe = """'((?:[^']|'')*)'""".r

  private def parseOpts(s: String): Map[String, (String, Seq[String])] =
    OptRe.findAllMatchIn(s).map { m =>
      val key = m.group(1).toUpperCase
      val list = Option(m.group(2)).map(b =>
        QuotedRe.findAllMatchIn(b).map(_.group(1).replace("''", "'")).toSeq)
      val scalar = Option(m.group(3)).map(_.replace("''", "'"))
        .orElse(Option(m.group(4)).map(_.trim)).getOrElse("")
      key -> (scalar, list.getOrElse(Nil))
    }.toMap

  /** Find `FILE_FORMAT = ( ... )` at paren depth 0 outside quotes; returns
    * (before, formatBody, after). */
  private def splitFileFormat(s: String): (String, String, String) = {
    val up = s.toUpperCase
    var i = 0; var depth = 0; var inQ = false; var at = -1
    while (i < s.length && at < 0) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("FILE_FORMAT", i)) at = i
      }
      i += 1
    }
    require(at >= 0, "COPY INTO requires FILE_FORMAT = (TYPE = ...)")
    val open = s.indexOf('(', at)
    require(open > 0, "FILE_FORMAT must be followed by (...)")
    var j = open; var d = 0; var q = false; var close = -1
    while (j < s.length && close < 0) {
      val c = s.charAt(j)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) close = j
        case _ =>
      }
      j += 1
    }
    require(close > 0, "unbalanced parens in FILE_FORMAT")
    (s.substring(0, at).trim, s.substring(open + 1, close),
      s.substring(close + 1).trim)
  }

  /** Build the command from the matched head groups. */
  def plan(target: String, rest: String): GraftCopyIntoCommand = {
    val (source, fmtBody, tail) = splitFileFormat(rest)
    val fmt = parseOpts(fmtBody)
    val tailOpts = parseOpts(tail)
    val format = fmt.getOrElse("TYPE",
      throw new IllegalArgumentException("FILE_FORMAT requires TYPE"))._1.toLowerCase
    require(Set("csv", "json", "parquet")(format), s"unsupported TYPE $format")
    target.trim match {
      case QuotedRe(path) => // export: COPY INTO '<path>' FROM source
        val (srcTable, srcQuery) = source.trim match {
          case q if q.startsWith("(") && q.endsWith(")") =>
            (None, Some(q.stripPrefix("(").stripSuffix(")")))
          case ident => (Some(ident), None)
        }
        GraftCopyIntoCommand(export = true, targetPath = Some(path),
          sourceTable = srcTable, sourceQuery = srcQuery, format = format,
          fmt = fmt, overwrite =
            tailOpts.get("OVERWRITE").exists(_._1.equalsIgnoreCase("TRUE")))
      case t => // import: COPY INTO tbl [(cols)] FROM '<path>'
        val ColsRe = """(?s)^([\w`.]+)\s*(?:\(([^)]*)\))?$""".r
        val (ident, cols) = t match {
          case ColsRe(id, cs) =>
            (id, Option(cs).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(Nil))
          case other => throw new IllegalArgumentException(
            s"cannot parse COPY INTO target: $other")
        }
        val path = source.trim match {
          case QuotedRe(p) => p
          case other => throw new IllegalArgumentException(
            s"import source must be a quoted path, got: $other")
        }
        GraftCopyIntoCommand(export = false,
          targetTable = Some(GraftSqlParser.splitIdent(ident)),
          targetCols = cols, sourcePath = Some(path), format = format,
          fmt = fmt,
          pattern = tailOpts.get("PATTERN").map(_._1),
          force = tailOpts.get("FORCE").exists(_._1.equalsIgnoreCase("TRUE")),
          onError = tailOpts.get("ON_ERROR").map(_._1.toUpperCase)
            .getOrElse("ABORT_STATEMENT"))
    }
  }

  // ---- load history (<table>/copy-history.json) ----
  /** History key: path + length + mtime (the reference's
    * CopyLoadHistoryManager identity — a re-upload changes len/mtime and
    * reloads). */
  def historyKey(path: String, len: Long, mtime: Long): String =
    s"$path@$len@$mtime"
  case class History(loaded: Seq[String])
  private def historyPath(t: GraftTable) = new Path(t.location, "copy-history.json")
  def loadHistory(fs: FileSystem, t: GraftTable): Seq[String] = {
    val p = historyPath(t)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      Json.read(bytes.toString("UTF-8"), classOf[History]).loaded
    } finally in.close()
  }
  def saveHistory(fs: FileSystem, t: GraftTable, loaded: Seq[String]): Unit = {
    val out = fs.create(historyPath(t), true)
    try out.write(Json.write(History(loaded)).getBytes("UTF-8"))
    finally out.close()
  }
}

case class GraftCopyIntoCommand(
    export: Boolean,
    targetTable: Option[Seq[String]] = None,
    targetCols: Seq[String] = Nil,
    targetPath: Option[String] = None,
    sourcePath: Option[String] = None,
    sourceTable: Option[String] = None,
    sourceQuery: Option[String] = None,
    format: String = "csv",
    fmt: Map[String, (String, Seq[String])] = Map.empty,
    pattern: Option[String] = None,
    force: Boolean = false,
    onError: String = "ABORT_STATEMENT",
    overwrite: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())

  private def readerOptions: Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    format match {
      case "csv" =>
        fmt.get("FIELD_DELIMITER").foreach { case (v, _) => m += "sep" -> v }
        if (fmt.get("SKIP_HEADER").exists(_._1.toInt >= 1)) m += "header" -> "true"
        fmt.get("NULL_IF").foreach { case (v, list) =>
          m += "nullValue" -> list.headOption.getOrElse(v) }
      case "json" =>
        if (fmt.get("MULTI_LINE").exists(_._1.equalsIgnoreCase("TRUE")))
          m += "multiLine" -> "true"
      case _ =>
    }
    if (onError == "CONTINUE" && format != "parquet") m += "mode" -> "DROPMALFORMED"
    else if (format != "parquet") m += "mode" -> "FAILFAST"
    m.toMap
  }

  private def writerOptions: Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    if (format == "csv") {
      fmt.get("FIELD_DELIMITER").foreach { case (v, _) => m += "sep" -> v }
      if (fmt.get("HEADER").exists(_._1.equalsIgnoreCase("TRUE")))
        m += "header" -> "true"
    }
    m.toMap
  }

  override def run(session: SparkSession): Seq[Row] =
    if (export) runExport(session) else runImport(session)

  private def runExport(session: SparkSession): Seq[Row] = {
    val df = sourceQuery.map(session.sql)
      .getOrElse(session.table(sourceTable.get))
    // one pass: the row count rides the write as an Observation (listener-
    // backed) instead of a separate count() job — a 100-TB export must not
    // scan twice
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.format(format).options(writerOptions)
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .save(targetPath.get)
    val rows = obs.get("rows")
    Seq(Row(s"exported $rows rows to ${targetPath.get}"))
  }

  private def runImport(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolveTable(session, targetTable.get)
    val src = new Path(sourcePath.get)
    val fs = src.getFileSystem(session.sessionState.newHadoopConf())
    // file inventory: recursive list, non-hidden, PATTERN regex on the
    // path relative to the source dir (the reference's Snowflake PATTERN)
    val all = {
      val it = fs.listFiles(src, true)
      val buf = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith("."))
          buf += ((f.getPath.toString, f.getLen, f.getModificationTime))
      }
      buf.result()
    }
    val base = src.toString.stripSuffix("/") + "/"
    val matched = pattern match {
      case Some(re) =>
        val rx = re.r
        all.filter { case (p, _, _) =>
          rx.findFirstIn(p.stripPrefix(base)).isDefined ||
            rx.findFirstIn(p).isDefined }
      case None => all
    }
    // history entries key on (path, length, mtime) like the reference's
    // CopyLoadHistoryManager — a re-uploaded file (same name, new bytes)
    // must RELOAD, not silently skip. Legacy bare-path entries still match
    // by path alone.
    val history = GraftCopyInto.loadHistory(fs, t).toSet
    def isLoaded(f: (String, Long, Long)): Boolean =
      history.contains(GraftCopyInto.historyKey(f._1, f._2, f._3)) ||
        history.contains(f._1)
    val freshF = if (force) matched else matched.filterNot(isLoaded)
    val fresh = freshF.map(_._1)
    val keyOf: Map[String, String] =
      matched.map(f => f._1 -> GraftCopyInto.historyKey(f._1, f._2, f._3)).toMap
    if (fresh.isEmpty)
      return Seq(Row(s"0 files to load (${matched.size} matched, " +
        s"${matched.size - fresh.size} already loaded)"))

    def readFiles(files: Seq[String]): DataFrame = {
      val reader = session.read.format(format).options(readerOptions)
      val schema: Option[StructType] =
        if (format == "parquet") None
        else if (targetCols.nonEmpty) Some(StructType(
          targetCols.map(c => t.schema.sparkSchema(c))))
        else Some(t.schema.sparkSchema)
      val df = schema.map(reader.schema).getOrElse(reader).load(files: _*)
      val projected = if (targetCols.nonEmpty) df.select(targetCols.map(col): _*) else df
      // NULL_IF beyond the first value: post-read null-out on string columns
      fmt.get("NULL_IF").map(_._2.drop(1)).filter(_.nonEmpty) match {
        case Some(extra) =>
          projected.schema.fields.filter(_.dataType == StringType)
            .foldLeft(projected) { (d, f) =>
              d.withColumn(f.name,
                when(col(f.name).isin(extra.map(_.asInstanceOf[Any]): _*), lit(null))
                  .otherwise(col(f.name)))
            }
        case None => projected
      }
    }

    val (loadable, skipped) =
      if (onError == "SKIP_FILE" && format != "parquet") {
        // per-file validation pass (the price of skip-file semantics)
        fresh.partition { f =>
          try { readFiles(Seq(f)).foreach(_ => ()); true }
          catch { case _: Exception => false }
        }
      } else (fresh, Nil)
    if (loadable.isEmpty)
      return Seq(Row(s"0 files loadable (${skipped.size} skipped)"))

    val df = readFiles(loadable)
    t.write(df)
    GraftCopyInto.saveHistory(fs, t,
      (history ++ loadable.map(p => keyOf.getOrElse(p, p))).toSeq.sorted)
    Seq(Row(s"loaded ${loadable.size} files " +
      s"(${skipped.size} skipped, ${matched.size - fresh.size} already loaded)")) ++
      skipped.map(f => Row(s"skipped $f"))
  }
}
