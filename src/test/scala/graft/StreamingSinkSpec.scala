package graft

import graft.core._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Native streaming sink (`writeStream.format("graft")` → GraftSink):
  * end-to-end micro-batch upsert through the real Structured Streaming
  * engine, plus direct idempotency / Complete-mode checks on the sink. */
class StreamingSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writeStream.format(graft): micro-batches upsert into a PK table") {
    val loc = tmpLoc("sink")
    val schema = Seq((1L, "x")).toDF("k", "v").schema
    GraftTable.create(spark, loc, schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
    val input = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val q = input.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("path", loc)
      .outputMode("append")
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "b2"), (3L, "c"))
    q.processAllAvailable()
    q.stop()

    val t = GraftTable.load(spark, loc)
    val got = t.read().as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")), s"got $got")
    // two micro-batches = two snapshots with the stream's identifier prefix
    val ids = t.sm.snapshotIds.map(t.sm.readSnapshot).map(_.identifier)
    assert(ids.count(_.startsWith("stream-")) == 2, s"identifiers: $ids")
  }

  test("sink replay of an already-committed batch is a no-op (exactly-once)") {
    val loc = tmpLoc("sinkidem")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    val sqlCtx = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val sink = new graft.dsv2.GraftSink(sqlCtx, t, OutputMode.Append(), "stream-test-")
    sink.addBatch(0, df)
    sink.addBatch(0, df) // restart replay: same batch id must not double-commit
    assert(t.sm.latestSnapshotId.contains(1L),
      s"expected exactly one commit, got ${t.sm.snapshotIds}")
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    assert(GraftTable.load(spark, loc).read().count() == 3)
  }

  test("Complete output mode overwrites the table each batch") {
    val loc = tmpLoc("sinkcomplete")
    val df = Seq((1L, 10L)).toDF("word", "cnt").toDF("k", "cnt")
    val t = GraftTable.create(spark, loc, df.schema, TableConfig())
    val sqlCtx = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val sink = new graft.dsv2.GraftSink(sqlCtx, t, OutputMode.Complete(), "stream-c-")
    sink.addBatch(0, Seq((1L, 10L), (2L, 5L)).toDF("k", "cnt"))
    sink.addBatch(1, Seq((1L, 12L), (2L, 5L), (3L, 1L)).toDF("k", "cnt"))
    val got = GraftTable.load(spark, loc).read().as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 12L), (2L, 5L), (3L, 1L)), s"got $got")
  }
}
