package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.functions._

/** Data-evolution UPDATE (paimon data evolution / `_ROW_ID` column patches):
  * on a row-tracking append table, UPDATE writes only (row id → new values
  * for the assigned columns); base files — including wide blob/embedding
  * columns — never move. Reads join patches back by row id, pruning files
  * whose row-id range no patch touches. */
class DataEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def mkTable(name: String): GraftTable = {
    val df = (1L to 100L).map(i =>
      (i, s"doc-$i", 0.0, Seq.fill(8)(i.toFloat))).toDF("id", "title", "score", "emb")
    val t = GraftTable.create(spark, tmpLoc(name), df.schema,
      TableConfig(options = Map("row-tracking.enabled" -> "true")))
    t.write(df.filter(col("id") <= 50))
    t.write(df.filter(col("id") > 50))
    t
  }

  test("update writes a patch, base files never move; reads merge by row id") {
    val t = mkTable("de-basic")
    val before = t.planFiles(None, None).map(_.path).toSet
    t.update(Map("score" -> lit(9.5)), col("id") % 10 === 0)
    assert(t.planFiles(None, None).map(_.path).toSet == before,
      "UPDATE must not rewrite base data files")
    assert(t.sm.latestSnapshot.get.patchList.size == 1)
    assert(t.sm.latestSnapshot.get.patchList.head.cols == Seq("score"))
    val got = t.read().select("id", "score").as[(Long, Double)].collect().toMap
    (1L to 100L).foreach { i =>
      assert(got(i) == (if (i % 10 == 0) 9.5 else 0.0), s"row $i")
    }
    // wide column untouched and still correct through the patch join
    assert(t.read(Some(col("id") === 20L)).select("emb").head()
      .getSeq[Float](0) == Seq.fill(8)(20.0f))
  }

  test("patch generations compose; explicit NULL assignment survives") {
    val t = mkTable("de-gen")
    t.update(Map("score" -> lit(1.0)), col("id") <= 10)
    // second generation reads the PATCHED value (score + 1 over patched 1.0)
    t.update(Map("score" -> (col("score") + 1.0)), col("id") <= 5)
    t.update(Map("title" -> lit(null)), col("id") === 3L)
    val got = t.read().select("id", "score", "title").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.isNullAt(2)))).toMap
    assert(got(3L) == ((2.0, true)), "null patch must stick")
    assert(got(5L)._1 == 2.0 && got(7L)._1 == 1.0 && got(50L)._1 == 0.0)
    assert(t.sm.latestSnapshot.get.patchList.size == 3)
  }

  test("filters over patched columns find patched rows despite stale stats") {
    val t = mkTable("de-stale")
    // base stats say score ∈ [0,0] everywhere: a naive prune would drop all
    t.update(Map("score" -> lit(100.0)), col("id").isin(7L, 77L))
    val hits = t.read(Some(col("score") > 50.0)).select("id")
      .as[Long].collect().sorted
    assert(hits.toSeq == Seq(7L, 77L))
    // and a filter on an unpatched column still prunes + returns patched vals
    assert(t.read(Some(col("id") === 7L)).select("score").head().getDouble(0) == 100.0)
  }

  test("time travel, rollback, and compaction materialization") {
    val t = mkTable("de-tt")
    val preUpdate = t.sm.latestSnapshotId.get
    t.update(Map("score" -> lit(5.0)), col("id") === 1L)
    assert(t.read(None, Some(preUpdate)).filter(col("score") =!= 0.0).count() == 0)
    // compaction folds patches into the rewrite and clears them
    t.compact()
    assert(t.sm.latestSnapshot.get.patchList.isEmpty)
    assert(t.rawPlan(None, None).isDefined, "no patches → raw plan again")
    assert(t.read(Some(col("id") === 1L)).select("score").head().getDouble(0) == 5.0)
    // rollback to the pre-update snapshot clears post-target patches
    t.update(Map("score" -> lit(7.0)), col("id") === 2L)
    t.rollback(preUpdate)
    assert(t.sm.latestSnapshot.get.patchList.isEmpty)
    assert(t.read().filter(col("score") =!= 0.0).count() == 0)
  }

  test("delete on a patched table keeps row ids and patched values") {
    val t = mkTable("de-del")
    t.update(Map("score" -> lit(3.0)), col("id") <= 20)
    // delete ON the patched column: victims chosen from the patched view
    t.delete(col("score") === 3.0 && col("id") <= 10)
    val got = t.read().select("id", "score").as[(Long, Double)].collect().toMap
    assert(!got.keySet.exists(_ <= 10L))
    (11L to 20L).foreach(i => assert(got(i) == 3.0, s"row $i lost its patch"))
    assert(got(30L) == 0.0)
    assert(t.read().count() == 90)
  }

  test("SQL UPDATE routes row-tracking append tables to the patch path") {
    val wh = java.nio.file.Files.createTempDirectory("graft-de-wh").toString
    spark.conf.set("spark.sql.catalog.graft_de", "graft.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_de.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_de.db")
    spark.sql("""CREATE TABLE graft_de.db.docs (id BIGINT, score DOUBLE)
                 TBLPROPERTIES ('row-tracking.enabled'='true')""")
    spark.sql("INSERT INTO graft_de.db.docs VALUES (1, 0.0), (13, 0.0), (20, 0.0)")
    spark.sql("UPDATE graft_de.db.docs SET score = 42.0 WHERE id = 13")
    val t2 = GraftTable.load(spark, s"$wh/db.db/docs")
    assert(t2.sm.latestSnapshot.get.patchList.size == 1)
    assert(t2.read(Some(col("id") === 13L)).select("score").head().getDouble(0) == 42.0)
    assert(spark.sql("SELECT sum(score) FROM graft_de.db.docs").head().getDouble(0) == 42.0)
  }
}
