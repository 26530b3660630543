package graft.pipeline

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * CDC ingestion (SURVEY §2.1 "CDC ingestion"): parse database change-event
 * streams (Debezium / Canal / Maxwell JSON — the Kafka CDC formats of the
 * reference's kafka-cdc docs, docs/docs/cdc-ingestion/kafka-cdc.mdx) into
 * typed rows + row kinds and upsert them into a primary-key table, evolving
 * the table schema as new columns appear in the stream.
 *
 * The reference implements this Flink-side (paimon-flink-cdc
 * `RichCdcSinkBuilder` / `KafkaSyncTableAction`); here it is Spark-first:
 *  - schema inference is `spark.read.json` over the message payloads — a
 *    distributed pass, no driver-side sampling loop;
 *  - parsing is one codegen'd `from_json`-equivalent pass (the inference read
 *    IS the parse — messages are read once);
 *  - row kinds ride the existing `rowkind.field` write path (+I/+U → upsert,
 *    -D → delete tombstone), so ingestion is one LSM write per batch;
 *  - new columns evolve the table via `write.merge-schema` before alignment.
 *
 * Ordering: events in one batch resolve last-input-wins per key (the write
 * path's `__pos`); cross-batch ordering is commit order. For out-of-order
 * streams configure `sequence.field` on the table (e.g. the event timestamp)
 * when creating it.
 *
 * Streaming: `messages.writeStream.foreachBatch((b, _) => Cdc.ingest(t, b,
 * "value", fmt))` — exactly-once per the engine's idempotent-commit support.
 */
object Cdc {

  val KindCol = "_cdc_kind"

  val Debezium = "debezium-json"
  val Canal = "canal-json"
  val Maxwell = "maxwell-json"

  /** Null-safe struct field access: absent fields read as null (schema drift
    * within a batch — e.g. delete events carrying only key fields). */
  private def pick(structCol: Column, structType: StructType, field: StructField): Column =
    if (structType.fieldNames.contains(field.name)) {
      val have = structType(field.name)
      if (have.dataType == field.dataType) structCol.getField(field.name)
      else structCol.getField(field.name).cast(field.dataType)
    } else lit(null).cast(field.dataType)

  /** Widest-wins merge of two payload struct schemas by field name (after
    * wins on conflict; before-only fields appended). */
  private def mergedPayloadFields(after: Option[StructType],
                                  before: Option[StructType]): Seq[StructField] = {
    val a = after.map(_.fields.toSeq).getOrElse(Nil)
    val an = a.map(_.name).toSet
    a ++ before.map(_.fields.toSeq).getOrElse(Nil).filterNot(f => an(f.name))
  }

  private def structOf(schema: StructType, name: String): Option[StructType] =
    schema.fields.find(_.name == name).map(_.dataType) match {
      case Some(s: StructType) => Some(s)
      case _ => None
    }

  /**
   * Parse a batch of CDC messages (one JSON string per row in `valueCol`)
   * into payload columns + a `_cdc_kind` column ("+I"/"+U"/"-D"). Tombstone
   * messages (null/empty value, null payload) and non-row events (DDL in
   * canal streams) are dropped.
   */
  def parse(spark: SparkSession, messages: DataFrame, valueCol: String,
            format: String): DataFrame = {
    val values = messages.select(col(valueCol).cast(StringType))
      .filter(col(valueCol).isNotNull && length(col(valueCol)) > 0)
      .as(Encoders.STRING)
    // one distributed pass: spark.read.json infers the envelope schema AND
    // parses; corrupt records surface in _corrupt_record and are dropped
    val parsed = spark.read.json(values)
    val schema = parsed.schema
    val clean =
      if (schema.fieldNames.contains("_corrupt_record"))
        parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
      else parsed

    format match {
      case Debezium =>
        // {"op":"c|u|d|r","before":{...},"after":{...},"ts_ms":N}
        require(schema.fieldNames.contains("op"), "debezium-json: no `op` field")
        val aT = structOf(schema, "after"); val bT = structOf(schema, "before")
        val fields = mergedPayloadFields(aT, bT)
        require(fields.nonEmpty, "debezium-json: no before/after payload")
        val isDel = col("op") === "d"
        val cols = fields.map { f =>
          val a = aT.map(t => pick(col("after"), t, f)).getOrElse(lit(null).cast(f.dataType))
          val b = bT.map(t => pick(col("before"), t, f)).getOrElse(lit(null).cast(f.dataType))
          when(isDel, b).otherwise(a).as(f.name)
        }
        val kind = when(isDel, "-D").when(col("op") === "u", "+U").otherwise("+I")
        clean.filter(col("op").isin("c", "u", "d", "r"))
          .select(cols :+ kind.as(KindCol): _*)

      case Canal =>
        // {"data":[{...}],"old":[{...}],"type":"INSERT|UPDATE|DELETE","es":N}
        require(schema.fieldNames.contains("type"), "canal-json: no `type` field")
        val rowT = schema.fields.find(_.name == "data").map(_.dataType) match {
          case Some(ArrayType(s: StructType, _)) => s
          case other => throw new IllegalArgumentException(
            s"canal-json: `data` must be an array of objects, got $other")
        }
        val kind = when(col("type") === "DELETE", "-D")
          .when(col("type") === "UPDATE", "+U").otherwise("+I")
        clean.filter(col("type").isin("INSERT", "UPDATE", "DELETE"))
          .select(explode(col("data")).as("__row"), kind.as(KindCol))
          .select(rowT.fields.map(f => col(s"__row.${f.name}")).toSeq :+ col(KindCol): _*)

      case Maxwell =>
        // {"data":{...},"old":{...},"type":"insert|update|delete","ts":N}
        require(schema.fieldNames.contains("type"), "maxwell-json: no `type` field")
        val dT = structOf(schema, "data").getOrElse(
          throw new IllegalArgumentException("maxwell-json: `data` must be an object"))
        val kind = when(col("type") === "delete", "-D")
          .when(col("type") === "update", "+U").otherwise("+I")
        clean.filter(col("type").isin("insert", "update", "delete", "bootstrap-insert"))
          .select(dT.fields.map(f => pick(col("data"), dT, f).as(f.name)).toSeq :+
            kind.as(KindCol): _*)

      case other => throw new IllegalArgumentException(
        s"unknown CDC format $other (debezium-json | canal-json | maxwell-json)")
    }
  }

  /** Ingest one batch of CDC messages into an existing table: parse →
    * merge-schema evolution → one rowkind-aware LSM write. Returns the
    * number of change records applied. */
  def ingest(t: GraftTable, messages: DataFrame, valueCol: String,
             format: String): Long = {
    val rows = parse(t.spark, messages, valueCol, format).persist()
    try {
      val n = rows.count()
      if (n > 0) t.write(rows)
      n
    } finally { rows.unpersist(); () }
  }

  /**
   * kafka_sync_table, Spark-first: create the target PK table from the first
   * batch's inferred payload schema (if absent) and ingest the batch. The
   * created table carries `rowkind.field=_cdc_kind` + full write-side schema
   * evolution, so later batches add columns / widen types on their own.
   */
  def syncTable(spark: SparkSession, location: String, messages: DataFrame,
                valueCol: String, format: String, primaryKeys: Seq[String],
                partitionKeys: Seq[String] = Nil, numBuckets: Int = 4,
                options: Map[String, String] = Map.empty): GraftTable = {
    val rows = parse(spark, messages, valueCol, format).persist()
    try {
      val t =
        if (GraftTable.exists(spark, location)) GraftTable.load(spark, location)
        else GraftTable.create(spark, location, rows.schema, TableConfig(
          primaryKeys = primaryKeys, partitionKeys = partitionKeys,
          numBuckets = numBuckets,
          options = Map(
            "rowkind.field" -> KindCol,
            "write.merge-schema" -> "true",
            "write.merge-schema.type-widening" -> "true") ++ options))
      t.write(rows)
      t
    } finally { rows.unpersist(); () }
  }
}
