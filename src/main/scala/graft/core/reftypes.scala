package graft.core

import org.apache.spark.sql.types._

/**
 * Reference-dialect type strings → Spark types: the complete SURVEY §1.2
 * matrix, matching what the reference's own Spark connector does
 * (paimon-spark/.../SparkTypeUtils.java; DataTypeRoot.java:50-115 for the
 * dialect). Most spellings are valid Spark DDL already and pass through
 * `DataType.fromDDL`; this module adds the reference-only spellings:
 *
 *  - TIME(p)        → IntegerType, millis-of-day (SparkTypeUtils.java:241)
 *  - MULTISET<e>    → MapType(e, IntegerType, valueContainsNull = false) —
 *                     element → multiplicity (SparkTypeUtils.java:276)
 *  - VECTOR<t, n>   → ArrayType(t, containsNull = false); the fixed
 *                     dimension n lives in table options, not the Spark type
 *                     (SparkTypeUtils.java:271; docs vector.mdx:78)
 *  - BLOB / BYTES / VARBINARY → BinaryType (SparkTypeUtils.java:191)
 *  - TIMESTAMP_LTZ / TIMESTAMP WITH LOCAL TIME ZONE → TimestampType;
 *    plain TIMESTAMP(p) → TimestampNTZType (SparkTypeUtils.java:246,255)
 *  - ROW<...>       → StructType (the dialect's name for STRUCT)
 *
 * Nesting recurses, so `ARRAY<MULTISET<INT>>` or `MAP<STRING, TIME(3)>`
 * parse. Used by ingestion surfaces that accept a reference-dialect schema;
 * the engine's own persisted schemas stay Spark DDL.
 */
object RefTypes {

  /** Parse a type string in the reference dialect (a superset of Spark DDL:
    * every Spark spelling still parses). NOT NULL suffixes are accepted and
    * ignored (Spark nullability is per-field, applied by [[fieldToSpark]]). */
  def toSpark(refType: String): DataType = {
    val (t, _) = parse(refType.trim)
    t
  }

  /** (field name, reference type string) → StructField, honoring a trailing
    * NOT NULL on the type string. */
  def fieldToSpark(name: String, refType: String): StructField = {
    val (t, nullable) = parse(refType.trim)
    StructField(name, t, nullable)
  }

  /** A reference-dialect schema — Seq of (name, typeString) — to Spark. */
  def schemaToSpark(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (n, t) => fieldToSpark(n, t) })

  /** The declared dimension of a TOP-LEVEL `VECTOR<t, n>` spelling (the
    * reference's VectorType carries it as part of the type,
    * paimon-api VectorType.java:40); None for any other type. Nested
    * vectors (`ARRAY<VECTOR<FLOAT, 4>>`) parse but carry no per-column
    * dimension — enforcement is a column-level contract. */
  def vectorDim(refType: String): Option[Int] = {
    val s = refType.trim
    val u = s.toUpperCase
    if (!u.startsWith("VECTOR<")) None
    else {
      parseType(if (u.endsWith(" NOT NULL")) s.dropRight(9).trim else s)
      Some(splitTop(s.substring(s.indexOf('<') + 1, s.lastIndexOf('>')))(1)
        .trim.toInt)
    }
  }

  /** Table options a reference-dialect schema IMPLIES: every top-level
    * `VECTOR<t, n>` column contributes `fields.<name>.dimension = n`, so
    * declaring the type is enough to arm the write-time dimension
    * enforcement (table.scala fixed-dimension check) — the DDL-first loop
    * of the reference's VECTOR type (vector.mdx:78 dimension directive). */
  def impliedOptions(fields: Seq[(String, String)]): Map[String, String] =
    fields.flatMap { case (n, t) =>
      vectorDim(t).map(d => s"fields.$n.dimension" -> d.toString)
    }.toMap

  private def parse(s0: String): (DataType, Boolean) = {
    val upper = s0.toUpperCase
    val (s, nullable) =
      if (upper.endsWith(" NOT NULL")) (s0.dropRight(9).trim, false)
      else (s0, true)
    (parseType(s), nullable)
  }

  private def parseType(s: String): DataType = {
    val u = s.toUpperCase
    def arg: String = s.substring(s.indexOf('<') + 1, s.lastIndexOf('>'))
    def intArgs: Seq[Int] =
      s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
        .split(',').map(_.trim.toInt).toSeq
    u match {
      case _ if u.startsWith("TIME(") || u == "TIME" ||
          u == "TIME_WITHOUT_TIME_ZONE" =>
        IntegerType // millis-of-day
      case _ if u.startsWith("MULTISET<") =>
        // element → multiplicity; the count is never null, and element
        // nullability is not representable in a map KEY
        MapType(parse(arg)._1, IntegerType, valueContainsNull = false)
      case _ if u.startsWith("VECTOR<") =>
        // VECTOR<t, n>: the trailing dimension is table metadata
        // ([[vectorDim]] surfaces it; [[impliedOptions]] turns it into the
        // fields.<col>.dimension option the write path enforces)
        val parts = splitTop(arg)
        require(parts.size == 2 && parts(1).trim.toInt > 0,
          s"VECTOR needs <element-type, positive-dimension>, got $s")
        ArrayType(parse(parts.head)._1, containsNull = false)
      case "BLOB" => BinaryType
      case _ if u == "TIMESTAMP_LTZ" || u.startsWith("TIMESTAMP_LTZ(") ||
          u.endsWith("WITH LOCAL TIME ZONE") =>
        TimestampType
      case _ if u == "TIMESTAMP" || u.startsWith("TIMESTAMP(") ||
          u == "TIMESTAMP_WITHOUT_TIME_ZONE" =>
        TimestampNTZType
      case _ if u.startsWith("ROW<") =>
        StructType(splitTop(arg).map { f =>
          val (name, tp) = f.trim.span(c => !c.isWhitespace)
          fieldToSpark(name, tp.trim)
        })
      case _ if u.startsWith("ARRAY<") =>
        val (e, en) = parse(arg)
        ArrayType(e, containsNull = en)
      case _ if u.startsWith("MAP<") =>
        val Seq(k, v) = splitTop(arg)
        val (vt, vn) = parse(v)
        MapType(parse(k)._1, vt, valueContainsNull = vn)
      case _ if u.startsWith("DECIMAL(") || u.startsWith("NUMERIC(") =>
        val Seq(p, sc) = intArgs
        DecimalType(p, sc)
      case _ if u.startsWith("CHAR(") || u.startsWith("VARCHAR(") ||
          u == "STRING" => StringType
      case "BOOLEAN" => BooleanType
      case "TINYINT" => ByteType
      case "SMALLINT" => ShortType
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case "DATE" => DateType
      case "BYTES" | "BINARY" | "VARBINARY" => BinaryType
      case _ if u.startsWith("VARBINARY(") || u.startsWith("BINARY(") =>
        BinaryType
      case "VARIANT" => VariantType
      // everything else (incl. STRUCT<...>) is already Spark DDL
      case _ => DataType.fromDDL(s)
    }
  }

  /** Split a type-argument list on top-level commas (nesting-aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    s.zipWithIndex.foreach {
      case (c, i) =>
        if (c == '<' || c == '(') depth += 1
        else if (c == '>' || c == ')') depth -= 1
        else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
