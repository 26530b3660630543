package graft.dsv2

import graft.core.GraftTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/**
 * Native Structured Streaming sink: `df.writeStream.format("graft")
 * .option("path", ...).start()` (capability of paimon-spark's
 * sources/PaimonSink.scala:40 — the V1 `Sink` bridge, which receives each
 * micro-batch as a DataFrame on the driver and routes it through the same
 * engine write paths as batch INSERT, keeping one commit protocol for both
 * front-ends).
 *
 * Exactly-once: each micro-batch commits with identifier
 * `<streamPrefix><batchId>` where the prefix is derived from the query's
 * checkpoint location (stable across restarts). On restart Spark replays the
 * last uncommitted-by-Spark batch; if the engine already committed it we skip
 * (paimon Snapshot.java:139 commitIdentifier dedup). Output modes:
 * Append/Update = LSM write (upsert semantics on PK tables — Update mode IS
 * the upsert sink), Complete = full overwrite of the table per batch.
 */
class GraftSink(sqlContext: SQLContext, t: GraftTable, outputMode: OutputMode,
                streamPrefix: String) extends Sink {

  override def name(): String = s"GraftSink(${t.location})"
  override def schema(): StructType = t.schema.sparkSchema

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (t.sm.maxCommittedBatch(streamPrefix).exists(_ >= batchId)) return
    val batch = SparkShims.unstream(data)
    val id = Some(s"$streamPrefix$batchId")
    if (outputMode == OutputMode.Complete()) t.overwrite(batch, identifier = id)
    else t.write(batch, identifier = id)
    ()
  }
}

object GraftSink {
  /** Stable per-query commit-identifier prefix from the checkpoint location
    * (two different queries writing the same table must not collide). */
  def prefixFor(checkpointLocation: Option[String], path: String): String = {
    val seed = checkpointLocation.getOrElse(path)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"stream-${md.take(8)}-"
  }
}
