package graft

import graft.core._
import graft.pipeline.GlobalIndex
import org.apache.spark.sql.functions._

/** Global secondary indexes (§2.11): equality + sorted lookups over an
  * unclustered column, with pruned-file assertions and staleness fallback. */
class GlobalIndexSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows, unique v, spread RANDOMLY over 10 files: column stats cannot
  // prune (every file spans ~the full v range); only the index can.
  private def mkIndexed(name: String): (String, GraftTable) = {
    val loc = tmpLoc(name)
    val df = spark.range(10000).select(
      col("id").as("v"),
      (col("id") % 97).as("tag"),
      concat(lit("p"), col("id")).as("payload"))
    val t = GraftTable.create(spark, loc, df.schema, TableConfig())
    t.write(df.repartition(10)) // round-robin: values scatter across files
    GlobalIndex.build(spark, loc, "v")
    (loc, t)
  }

  test("equality lookup plans only files containing the value") {
    val (loc, t) = mkIndexed("gi-eq")
    val total = t.planFiles().size
    assert(total == 10)
    // stats cannot prune this (v is unclustered): the engine would scan all
    val expr = StatsPrune.resolve(spark, t.dataSchema, col("v") === 4242L)
    val statPruned = t.planFiles(filter = Some(col("v") === 4242L)).size
    assert(statPruned == total, "unclustered column must defeat stats pruning")
    // the index prunes to exactly the one file holding v=4242
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L)) == 1)
    val got = GlobalIndex.readEquality(spark, loc, "v", Seq(4242L, 7L))
    assertSameRows(got, t.read().filter(col("v").isin(4242L, 7L)))
  }

  test("global-index.enabled=false disables acceleration, keeps the files, " +
      "and flips back on (reference ALTER TABLE toggle)") {
    val (loc, t) = mkIndexed("gi-toggle")
    val total = t.planFiles().size
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L)) == 1)
    // disable: lookups fall back to the plain scan, results stay correct,
    // index files stay on disk
    t.setOption("global-index.enabled", "false")
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L))
      == total, "disabled index must not prune")
    assertSameRows(
      GlobalIndex.readEquality(spark, loc, "v", Seq(4242L)),
      t.read().filter(col("v") === 4242L))
    // re-enable: the KEPT files accelerate again, no rebuild needed
    GraftTable.load(spark, loc).setOption("global-index.enabled", "true")
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L)) == 1)
  }

  test("partition-restricted build: exact lookups under partial coverage") {
    // the 100-TB operational mode (reference create_global_index
    // partitions => ...): index ONLY region=eu; region=us files must stay
    // full candidates so equality/TopN remain exact, while covered-side
    // pruning still works
    val loc = tmpLoc("gi-part")
    val df = spark.range(8000).select(
      col("id").as("v"),
      when(col("id") % 2 === 0, "eu").otherwise("us").as("region"),
      concat(lit("p"), col("id")).as("payload"))
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(partitionKeys = Seq("region")))
    t.write(df.repartition(8))
    Procedures.call(spark, t, "create_global_index",
      Map("column" -> "v", "index_type" -> "bitmap",
        "partitions" -> "region=eu")).collect()
    val total = t.planFiles().size
    val usFiles = t.planFiles().count(_.partition.get("region").contains("us"))
    // equality on an EU value: covered side prunes to its file; US files ride
    val evenPlanned = GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L))
    assert(evenPlanned < total && evenPlanned <= usFiles + 1,
      s"covered-side pruning: planned=$evenPlanned total=$total us=$usFiles")
    // results are EXACT for values in covered AND uncovered partitions
    assertSameRows(GlobalIndex.readEquality(spark, loc, "v", Seq(4242L, 7L)),
      t.read().filter(col("v").isin(4242L, 7L)))
    // TopN stays exact: global top rows live in BOTH partitions
    val cands = GlobalIndex.topNCandidates(spark, loc, "v", 5, desc = true)
    val got = cands.orderBy(col("v").desc).limit(5)
      .select("v").as[Long].collect().toSeq
    assert(got == (7995L to 7999L).reverse, s"got $got")
    // refresh after an append stays scoped to the covered partition
    t.write(spark.range(8000, 8400).select(col("id").as("v"),
      when(col("id") % 2 === 0, "eu").otherwise("us").as("region"),
      concat(lit("p"), col("id")).as("payload")))
    GlobalIndex.refresh(spark, loc, "v")
    assertSameRows(GlobalIndex.readEquality(spark, loc, "v", Seq(8100L, 8101L)),
      t.read().filter(col("v").isin(8100L, 8101L)))
    // no US row ever entered the index: every indexed (value,file) pair's
    // value is even (region=eu ⇔ even v)
    val vals = GraftTable.load(spark, s"$loc/index/global-v").read()
      .select("value").as[Long].collect()
    assert(vals.nonEmpty && vals.forall(_ % 2 == 0),
      "index must hold only the covered partition's values")
  }

  test("sorted TopN reads only boundary files and stays exact") {
    val (loc, t) = mkIndexed("gi-topn")
    val total = t.planFiles().size
    val planned = GlobalIndex.plannedFilesForTopN(spark, loc, "v", 5, desc = true)
    assert(planned <= 5 && planned < total,
      s"TopN should touch at most k files, got $planned of $total")
    val got = GlobalIndex.topNCandidates(spark, loc, "v", 5, desc = true)
      .orderBy(col("v").desc).limit(5)
    assertSameRows(got, t.read().orderBy(col("v").desc).limit(5))
    // ascending too
    val gotAsc = GlobalIndex.topNCandidates(spark, loc, "v", 3, desc = false)
      .orderBy(col("v").asc).limit(3)
    assertSameRows(gotAsc, t.read().orderBy(col("v").asc).limit(3))
  }

  test("stale index falls back to a full correct scan; rebuild re-arms") {
    val (loc, t) = mkIndexed("gi-stale")
    t.write(Seq((20001L, 3L, "new1"), (20002L, 4L, "new2"))
      .toDF("v", "tag", "payload"))
    // snapshot moved past the index build → fallback, but results correct
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(20001L))
      == GraftTable.load(spark, loc).planFiles().size)
    val got = GlobalIndex.readEquality(spark, loc, "v", Seq(20001L, 42L))
    assert(rowsOf(got) == Set(Seq(20001L, 3L, "new1"), Seq(42L, 42L, "p42")))
    // rebuild covers the new snapshot and prunes again
    GlobalIndex.build(spark, loc, "v")
    val planned = GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(20001L))
    assert(planned <= 2, s"rebuilt index should prune, planned=$planned")
  }

  test("incremental refresh: pays for the delta, prunes again, exact after moves") {
    val (loc, t) = mkIndexed("gi-refresh")
    import graft.core.RowOps._
    // append new rows + overwrite (removes some files)
    t.write(spark.range(10000, 10100).select(col("id").as("v"),
      (col("id") % 97).as("tag"), concat(lit("p"), col("id")).as("payload")))
    val idxBefore = GraftTable.load(spark, s"$loc/index/global-v")
    val idxSnapBefore = idxBefore.sm.latestSnapshotId.get
    GlobalIndex.refresh(spark, loc, "v")
    // refresh appended to the index instead of rebuilding it from scratch
    val idxAfter = GraftTable.load(spark, s"$loc/index/global-v")
    assert(idxAfter.sm.latestSnapshotId.get > idxSnapBefore)
    // fresh again: point lookups on old AND new values prune + answer
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(4242L)) == 1)
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(10042L)) <= 2)
    assertSameRows(GlobalIndex.readEquality(spark, loc, "v", Seq(10042L, 7L)),
      t.read().filter(col("v").isin(10042L, 7L)))
    // no-op refresh when already current
    val s0 = idxAfter.sm.latestSnapshotId.get
    GlobalIndex.refresh(spark, loc, "v")
    assert(GraftTable.load(spark, s"$loc/index/global-v").sm.latestSnapshotId.get == s0)
    // COW delete rewrites files → refresh must retire DEAD files' entries
    t.delete(col("v") < 5000L)
    GlobalIndex.refresh(spark, loc, "v")
    assert(GlobalIndex.readEquality(spark, loc, "v", Seq(4242L)).isEmpty)
    assertSameRows(GlobalIndex.readEquality(spark, loc, "v", Seq(7777L)),
      t.read().filter(col("v") === 7777L))
    // retired entries really left the index table
    val idxRows = GraftTable.load(spark, s"$loc/index/global-v").read()
    assert(idxRows.filter(col("value") === 4242L).isEmpty)
  }

  test("incremental IVF: new vectors append under existing centroids") {
    import graft.pipeline.{Indexes, Similarity}
    val loc = tmpLoc("ivf-incr")
    val base = spark.range(200).select(col("id"),
      array((0 until 8).map(i => (rand(seed = i) * 2 - 1).cast("float")): _*).as("emb"))
    Indexes.buildIvf(spark, base, "emb", loc, nClusters = 4)
    // append a distinctive vector; search must find it without a rebuild
    val probe = Seq.fill(8)(0.9f)
    val extra = Seq((9999L, probe)).toDF("id", "emb")
    Indexes.appendToIvf(spark, extra, "emb", loc)
    val hits = Indexes.ivfSearch(spark, loc, "emb", probe, k = 1, nprobe = 2)
      .select("id").as[Long].collect()
    assert(hits.headOption.contains(9999L), s"got ${hits.toSeq}")
  }

  test("procedures create_global_index / drop_global_index round-trip") {
    val loc = tmpLoc("gi-proc")
    val df = spark.range(1000).select(col("id").as("v"), (col("id") * 2).as("w"))
    val t = GraftTable.create(spark, loc, df.schema, TableConfig())
    t.write(df.repartition(4))
    Procedures.call(spark, t, "create_global_index", Map("column" -> "v"))
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(500L)) == 1)
    Procedures.call(spark, t, "drop_global_index", Map("column" -> "v"))
    assert(GlobalIndex.plannedFilesForEquality(spark, loc, "v", Seq(500L)) == 4)
  }
}
