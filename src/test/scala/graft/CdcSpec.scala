package graft

import graft.core._
import graft.pipeline.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** CDC ingestion (SURVEY §2.1): debezium/canal/maxwell JSON parsing, rowkind
  * mapping, schema evolution on drift, streaming ingestion via foreachBatch. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def msgs(s: String*): DataFrame = s.toDF("value")

  test("debezium: insert/update/delete + schema drift evolves the table") {
    val loc = tmpLoc("cdc-dbz")
    val t = Cdc.syncTable(spark, loc, msgs(
      """{"op":"c","after":{"id":1,"name":"a","qty":10},"ts_ms":1}""",
      """{"op":"c","after":{"id":2,"name":"b","qty":20},"ts_ms":2}""",
      """{"op":"r","after":{"id":3,"name":"c","qty":30},"ts_ms":3}"""),
      "value", Cdc.Debezium, primaryKeys = Seq("id"))
    assert(t.read().count() == 3)
    // batch 2: update with a NEW column (grade), delete id=2 (before only has key)
    val n = Cdc.ingest(t, msgs(
      """{"op":"u","before":{"id":1,"name":"a","qty":10},"after":{"id":1,"name":"a2","qty":11,"grade":"A"},"ts_ms":4}""",
      """{"op":"d","before":{"id":2},"ts_ms":5}"""), "value", Cdc.Debezium)
    assert(n == 2)
    val out = GraftTable.load(spark, loc).read()
      .select("id", "name", "qty", "grade", Cdc.KindCol).as[(Long, String, Long, String, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a2", 11L, "A", "+U"), (3L, "c", 30L, null, "+I")))
  }

  test("canal: data array explodes; DELETE tombstones; DDL events dropped") {
    val loc = tmpLoc("cdc-canal")
    val t = Cdc.syncTable(spark, loc, msgs(
      """{"data":[{"id":1,"v":"x"},{"id":2,"v":"y"}],"type":"INSERT","es":1}""",
      """{"data":null,"type":"QUERY","es":2}""",
      """{"data":[{"id":2,"v":"y2"}],"old":[{"v":"y"}],"type":"UPDATE","es":3}""",
      """{"data":[{"id":1,"v":"x"}],"type":"DELETE","es":4}"""),
      "value", Cdc.Canal, primaryKeys = Seq("id"))
    val out = t.read().select("id", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "y2")))
  }

  test("maxwell: insert/update/delete") {
    val loc = tmpLoc("cdc-maxwell")
    val t = Cdc.syncTable(spark, loc, msgs(
      """{"data":{"id":1,"v":10},"type":"insert","ts":1}""",
      """{"data":{"id":2,"v":20},"type":"insert","ts":2}""",
      """{"data":{"id":1,"v":11},"old":{"v":10},"type":"update","ts":3}""",
      """{"data":{"id":2},"type":"delete","ts":4}"""),
      "value", Cdc.Maxwell, primaryKeys = Seq("id"))
    val out = t.read().select("id", "v").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 11L)))
  }

  test("corrupt records are dropped, not fatal") {
    val loc = tmpLoc("cdc-corrupt")
    val t = Cdc.syncTable(spark, loc, msgs(
      """{"op":"c","after":{"id":1,"v":"a"}}""",
      """not json at all"""),
      "value", Cdc.Debezium, primaryKeys = Seq("id"))
    assert(t.read().count() == 1)
  }

  test("fuzz: random debezium op sequences replay to the model state") {
    val rnd = new scala.util.Random(4242)
    val loc = tmpLoc("cdc-fuzz")
    val model = scala.collection.mutable.Map[Int, (String, Int)]()
    var t: Option[GraftTable] = None
    (1 to 6).foreach { batch =>
      val events = (1 to 40).flatMap { _ =>
        val id = rnd.nextInt(15)
        if (model.contains(id) && rnd.nextInt(4) == 0) {
          model.remove(id)
          Some(s"""{"op":"d","before":{"id":$id},"ts_ms":$batch}""")
        } else {
          val v = (s"s${rnd.nextInt(100)}", rnd.nextInt(1000))
          val op = if (model.contains(id)) "u" else "c"
          model(id) = v
          Some(s"""{"op":"$op","after":{"id":$id,"s":"${v._1}","n":${v._2}},"ts_ms":$batch}""")
        }
      }
      t match {
        case None => t = Some(Cdc.syncTable(spark, loc, msgs(events: _*),
          "value", Cdc.Debezium, primaryKeys = Seq("id")))
        case Some(tab) => Cdc.ingest(tab, msgs(events: _*), "value", Cdc.Debezium)
      }
      val got = GraftTable.load(spark, loc).read()
        .select("id", "s", "n").as[(Long, String, Long)]
        .collect().map(r => r._1.toInt -> ((r._2, r._3.toInt))).toMap
      assert(got == model.toMap, s"batch $batch: engine deviates from model")
    }
  }

  test("streaming CDC ingestion via foreachBatch is exactly-once") {
    val loc = tmpLoc("cdc-stream")
    val inDir = java.nio.file.Files.createTempDirectory("cdc-in")
    // seed the table so the stream only ever calls ingest()
    val t = Cdc.syncTable(spark, loc,
      msgs("""{"op":"c","after":{"id":0,"v":0},"ts_ms":0}"""),
      "value", Cdc.Debezium, primaryKeys = Seq("id"))
    java.nio.file.Files.writeString(inDir.resolve("b1.json"),
      (1 to 5).map(i => s"""{"op":"c","after":{"id":$i,"v":$i},"ts_ms":$i}""")
        .mkString("\n"))
    java.nio.file.Files.writeString(inDir.resolve("b2.json"),
      Seq("""{"op":"u","before":{"id":3,"v":3},"after":{"id":3,"v":33},"ts_ms":9}""",
          """{"op":"d","before":{"id":5},"ts_ms":9}""").mkString("\n"))
    val stream = spark.readStream.schema("value STRING").option("maxFilesPerTrigger", "1")
      .text(inDir.toString).withColumnRenamed("value", "value")
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$loc-ckpt")
      .foreachBatch { (b: DataFrame, _: Long) => Cdc.ingest(t, b, "value", Cdc.Debezium); () }
      .start()
    q.awaitTermination(120000)
    val out = GraftTable.load(spark, loc).read()
      .select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 33L), (4L, 4L)))
  }
}
