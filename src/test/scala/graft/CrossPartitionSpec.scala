package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.functions._

/** KEY_DYNAMIC cross-partition updates (§2.3): a PK whose partition column
  * changes must move — old partition tombstoned, exactly one row per key. */
class CrossPartitionSpec extends SparkTestBase {
  import spark.implicits._

  private def mkTable(name: String): GraftTable = {
    val loc = tmpLoc(name)
    val df = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "B", 40.0)
    ).toDF("k", "seg", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), partitionKeys = Seq("seg"),
        numBuckets = -1,
        options = Map("dynamic-bucket.target-row-count" -> "2")))
    t.write(df)
    t
  }

  test("update that changes the partition column moves the row") {
    val t = mkTable("xp-move")
    assert(t.isCrossPartition)
    // k=2 moves A→C; k=3 stays B but value changes; k=5 brand new in C
    t.write(Seq((2L, "C", 21.0), (3L, "B", 31.0), (5L, "C", 50.0))
      .toDF("k", "seg", "v"))
    val expected = Seq((1L, "A", 10.0), (2L, "C", 21.0), (3L, "B", 31.0),
      (4L, "B", 40.0), (5L, "C", 50.0)).toDF("k", "seg", "v")
    assertSameRows(t.read(), expected)
    // partition-scoped reads: the old partition no longer shows the key
    assertSameRows(t.read(filter = Some(col("seg") === "A")),
      expected.filter(col("seg") === "A"))
    assertSameRows(t.read(filter = Some(col("seg") === "C")),
      expected.filter(col("seg") === "C"))
    // no duplicate keys anywhere
    assert(t.read().groupBy("k").count().filter(col("count") > 1).isEmpty)
  }

  test("chained moves and move-back converge; compaction preserves state") {
    val t = mkTable("xp-chain")
    t.write(Seq((1L, "B", 11.0)).toDF("k", "seg", "v")) // A→B
    t.write(Seq((1L, "C", 12.0)).toDF("k", "seg", "v")) // B→C
    t.write(Seq((1L, "A", 13.0)).toDF("k", "seg", "v")) // C→A (back)
    val expected = Seq((1L, "A", 13.0), (2L, "A", 20.0), (3L, "B", 30.0),
      (4L, "B", 40.0)).toDF("k", "seg", "v")
    assertSameRows(t.read(), expected)
    assert(t.compact().isDefined)
    assertSameRows(t.read(), expected)
    for (s <- Seq("A", "B", "C"))
      assertSameRows(t.read(filter = Some(col("seg") === s)),
        expected.filter(col("seg") === s))
  }

  test("within-batch duplicate keys: last input wins, including partition") {
    val t = mkTable("xp-batchdup")
    t.write(Seq((2L, "C", 97.0), (2L, "D", 98.0)).toDF("k", "seg", "v"))
    val got = t.read().filter(col("k") === 2L).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "D" && got.head.getDouble(2) == 98.0)
  }
}
