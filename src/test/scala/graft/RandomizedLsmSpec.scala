package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.functions._

import scala.util.Random

/**
 * Randomized model test of the LSM table against an in-memory oracle,
 * mirroring the reference's randomized write/compact/read cycles
 * (paimon-core MergeTreeTestBase.testRandom). A scripted random op sequence
 * (upsert batches, deletes, updates, compactions, dv-deletes) runs against
 * both the table and a plain Map; every checkpoint must agree exactly.
 */
class RandomizedLsmSpec extends SparkTestBase {
  import spark.implicits._

  private[graft] def runScenarioPublic(seed: Long, ops: Int, numBuckets: Int = 3,
                          extraOpts: Map[String, String] = Map.empty): Unit =
    runScenario(seed, ops, numBuckets, extraOpts)

  private def runScenario(seed: Long, ops: Int, numBuckets: Int = 3,
                          extraOpts: Map[String, String] = Map.empty): Unit = {
    val rnd = new Random(seed)
    val loc = tmpLoc(s"rand-$seed-$numBuckets")
    val t = GraftTable.create(spark, loc,
      Seq((1L, "s", 1.0)).toDF("k", "s", "p").schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = numBuckets,
        options = (if (numBuckets < 0)
          Map("dynamic-bucket.target-row-count" -> "10")
        else Map.empty[String, String]) ++ extraOpts))
    var model = Map.empty[Long, (String, Double)]
    val history = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, (String, Double)])]

    def check(): Unit = {
      val got = t.read().as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == model, s"seed=$seed mismatch: " +
        s"missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"diff=${model.keySet.intersect(got.keySet).filter(k => model(k) != got(k)).take(5)}")
    }

    for (i <- 0 until ops) {
      rnd.nextInt(8) match {
        case 0 | 1 => // upsert batch
          val rows = (0 until (1 + rnd.nextInt(15))).map { _ =>
            val k = rnd.nextInt(40).toLong
            (k, s"v$i-$k", rnd.nextInt(1000) / 10.0)
          }
          // last occurrence per key wins within a batch (write pre-merges)
          val byKey = rows.groupBy(_._1).map { case (k, vs) => vs.last }
          t.write(rows.toDF("k", "s", "p"))
          byKey.foreach { case (k, s, p) => model += k -> (s, p) }
        case 2 => // delete a key range (COW)
          val lo = rnd.nextInt(40).toLong
          val hi = lo + rnd.nextInt(10)
          t.delete(col("k").between(lo, hi))
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case 3 if model.nonEmpty => // delete one existing key (DV when the
          // format supports deletion vectors, COW otherwise)
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          if (extraOpts.getOrElse("file.format", "parquet") == "parquet")
            t.deleteDv(col("k") === k)
          else t.delete(col("k") === k)
          model -= k
        case 4 => // PARTIAL compaction of one random bucket (DVs on other
          // buckets must carry forward through the index rewrite)
          val b = rnd.nextInt(math.max(1, numBuckets.max(1)))
          t.compactWhere(_.bucket == b)
        case 5 => // COW update of a key range
          val lo = rnd.nextInt(40).toLong
          val hi = lo + rnd.nextInt(8)
          t.update(Map("s" -> concat(col("s"), lit(s"!u$i"))),
            col("k").between(lo, hi))
          model = model.map { case (k, (s, p)) =>
            if (k >= lo && k <= hi) k -> (s + s"!u$i", p) else k -> (s, p) }
        case 6 if i % 4 == 1 => // INSERT OVERWRITE: table state = the batch
          val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
            val k = rnd.nextInt(40).toLong
            (k, s"ow$i-$k", rnd.nextInt(1000) / 10.0)
          }
          val byKey = rows.groupBy(_._1).map { case (_, vs) => vs.last }
          t.overwrite(rows.toDF("k", "s", "p"))
          model = byKey.map { case (k, s, p) => k -> (s, p) }.toMap
        case _ => // full compact
          t.compact()
      }
      if (i % 3 == 2) check()
      history += (t.sm.latestSnapshotId.getOrElse(0L) -> model)
    }
    t.compact()
    check()

    // every recorded snapshot must still read back exactly (snapshot
    // immutability under later DV deletes, compactions, COW rewrites)
    val byId = history.toMap
    byId.toSeq.sortBy(_._1).foreach { case (sid, m) =>
      if (sid > 0) {
        val got = t.read(snapshotId = Some(sid)).as[(Long, String, Double)]
          .collect().map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == m, s"seed=$seed time travel to $sid diverged: " +
          s"missing=${(m.keySet -- got.keySet).take(5)} extra=${(got.keySet -- m.keySet).take(5)}")
      }
    }
    // rollback to a random mid-history snapshot restores that exact state
    // (DV index and patch set must revert to the target's, not carry the
    // current ones)
    val mids = byId.keys.filter(_ > 0).toSeq.sorted
    if (mids.size > 2) {
      val target = mids(rnd.nextInt(mids.size - 1))
      t.rollback(target)
      val got = t.read().as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == byId(target), s"seed=$seed rollback to $target diverged")
    }
  }

  test("changelog replay reconstructs the final state (lookup producer, random ops)") {
    // ops restricted to upserts + dv-deletes (the changelog-producing
    // paths); folding the cumulative changelog by key must equal the table
    val rnd = new Random(4242L)
    val loc = tmpLoc("rand-cl")
    val t = GraftTable.create(spark, loc,
      Seq((1L, "s", 1.0)).toDF("k", "s", "p").schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        options = Map("changelog-producer" -> "lookup")))
    var model = Map.empty[Long, (String, Double)]
    for (i <- 0 until 8) {
      rnd.nextInt(4) match {
        case 3 if model.nonEmpty =>
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          t.deleteDv(col("k") === k)
          model -= k
        case _ =>
          val rows = (0 until (1 + rnd.nextInt(12))).map { _ =>
            val k = rnd.nextInt(30).toLong
            (k, s"v$i-$k", rnd.nextInt(1000) / 10.0)
          }
          val byKey = rows.groupBy(_._1).map { case (_, vs) => vs.last }
          t.write(rows.toDF("k", "s", "p"))
          byKey.foreach { case (k, s, p) => model += k -> (s, p) }
      }
    }
    val last = t.sm.latestSnapshotId.get
    // seed with snapshot 1's state, then replay snapshot-by-snapshot
    // windows (within a window each key appears at most once per kind, so
    // per-window fold order is irrelevant); -U/-D drop the key, +I/+U set it
    val seed = t.read(snapshotId = Some(1L)).as[(Long, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val replayed = (2L to last).foldLeft(seed) { (st0, sid) =>
      val cl = t.changelog(sid - 1, sid)
        .select(col("k"), col("s"), col("p"), col("_row_kind"))
        .as[(Long, String, Double, String)].collect()
      val dropped = cl.collect { case (k, _, _, "-D") => k }.toSet
      val set = cl.collect { case (k, s, p, kind) if kind == "+I" || kind == "+U" =>
        k -> (s, p) }.toMap
      st0 -- dropped ++ set
    }
    assert(replayed == model,
      s"replay diverged: missing=${(model.keySet -- replayed.keySet).take(5)} " +
        s"extra=${(replayed.keySet -- model.keySet).take(5)} " +
        s"diff=${model.keySet.intersect(replayed.keySet).filter(k => model(k) != replayed(k)).take(5)}")
    val got = t.read().as[(Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == model)
  }

  test("random op sequence with size-rolled compaction output") {
    // tiny roll threshold: compactions emit several level-1 files per bucket
    runScenario(seed = 99L, ops = 10, numBuckets = 1,
      extraOpts = Map("write.max-records-per-file" -> "7"))
  }

  test("random op sequences agree with the in-memory model (3 seeds)") {
    runScenario(seed = 7L, ops = 10)
    runScenario(seed = 42L, ops = 10)
    runScenario(seed = 1337L, ops = 8)
  }

  test("random op sequence with dynamic buckets (bucket = -1)") {
    runScenario(seed = 99L, ops = 10, numBuckets = -1)
  }

  test("random op sequence with write-time compaction trigger") {
    // hot buckets self-compact mid-sequence; the model must still agree
    runScenario(seed = 2024L, ops = 10, numBuckets = 2,
      extraOpts = Map("num-sorted-run.compaction-trigger" -> "3",
        "write.max-records-per-file" -> "9"))
  }

  test("random bucketed-append ops: key filters agree with model through bucket pruning") {
    val rnd = new Random(555L)
    val loc = tmpLoc("rand-bapp")
    val t = GraftTable.create(spark, loc,
      Seq((1L, "s", 1.0)).toDF("k", "s", "p").schema,
      TableConfig(numBuckets = 4, options = Map("bucket-key" -> "k")))
    var model = Vector.empty[(Long, String, Double)]
    for (i <- 0 until 12) {
      rnd.nextInt(5) match {
        case 0 | 1 | 2 => // append batch (duplicates kept)
          val rows = (0 until (1 + rnd.nextInt(12))).map { _ =>
            val k = rnd.nextInt(30).toLong
            (k, s"v$i-$k", rnd.nextInt(1000) / 10.0)
          }
          t.write(rows.toDF("k", "s", "p"))
          model ++= rows
        case 3 => // COW delete of a key range
          val lo = rnd.nextInt(30).toLong
          val hi = lo + rnd.nextInt(6)
          t.delete(col("k").between(lo, hi))
          model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
        case _ => t.compact() // file consolidation re-hashes consistently
      }
      // = and IN on the bucket key flow through bucketPrune — results must
      // match the model exactly (a pruning bug DROPS rows, caught here)
      val k = rnd.nextInt(30).toLong
      val got = t.read(filter = Some(col("k") === k))
        .as[(Long, String, Double)].collect().sortBy(_._2).toVector
      assert(got == model.filter(_._1 == k).sortBy(_._2),
        s"op=$i point filter k=$k mismatch")
      val ks = Seq.fill(3)(rnd.nextInt(30).toLong).distinct
      val gotIn = t.read(filter = Some(col("k").isin(ks: _*))).count()
      assert(gotIn == model.count(r => ks.contains(r._1)), s"op=$i IN mismatch")
    }
    assert(t.read().count() == model.size)
  }

  /** KEY_DYNAMIC: partitioned by a mutable column — random upserts MOVE
    * keys across partitions; full and partition-scoped reads must both
    * match the model at every checkpoint. */
  private def runCrossPartitionScenario(seed: Long, ops: Int): Unit = {
    val rnd = new Random(seed)
    val segs = Vector("A", "B", "C")
    val loc = tmpLoc(s"rand-xp-$seed")
    val t = GraftTable.create(spark, loc,
      Seq((1L, "A", 1.0)).toDF("k", "seg", "p").schema,
      TableConfig(primaryKeys = Seq("k"), partitionKeys = Seq("seg"),
        numBuckets = -1,
        options = Map("dynamic-bucket.target-row-count" -> "10")))
    var model = Map.empty[Long, (String, Double)]

    def check(): Unit = {
      val got = t.read().as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == model, s"xp seed=$seed mismatch: " +
        s"missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"diff=${model.keySet.intersect(got.keySet).filter(k => model(k) != got(k)).take(5)}")
      val s = segs(rnd.nextInt(segs.size))
      val gotSeg = t.read(filter = Some(col("seg") === s))
        .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(gotSeg == model.filter(_._2._1 == s),
        s"xp seed=$seed partition-scoped read of $s diverged")
    }

    for (i <- 0 until ops) {
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert batch with random partitions → random moves
          val rows = (0 until (1 + rnd.nextInt(10))).map { _ =>
            val k = rnd.nextInt(25).toLong
            (k, segs(rnd.nextInt(segs.size)), rnd.nextInt(1000) / 10.0)
          }
          val byKey = rows.groupBy(_._1).map { case (_, vs) => vs.last }
          t.write(rows.toDF("k", "seg", "p"))
          byKey.foreach { case (k, s, p) => model += k -> (s, p) }
        case 2 => // COW delete of a key range
          val lo = rnd.nextInt(25).toLong
          val hi = lo + rnd.nextInt(6)
          t.delete(col("k").between(lo, hi))
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
        case _ => t.compact()
      }
      if (i % 3 == 2) check()
    }
    t.compact()
    check()
  }

  test("random nested-evolution sequences agree with a field-identity model (2 seeds)") {
    // model: the struct's live fields as (stableKey, name) in order; data per
    // row per stableKey. Random add/rename/drop/reorder interleaved with
    // writes; every read must show each row's value under the field's
    // CURRENT name iff its stable identity survived.
    for (seed <- Seq(11L, 23L)) {
      val rnd = new Random(seed)
      val loc = tmpLoc(s"nested-fuzz-$seed")
      import org.apache.spark.sql.types._
      val t0 = GraftTable.create(spark, loc,
        StructType(Seq(StructField("k", LongType),
          StructField("info", StructType(Seq(
            StructField("f0", LongType), StructField("f1", LongType)))))),
        TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
      // fields: ordered (stableKey, name); rows: k -> Map[stableKey -> value]
      var fields = Vector(0 -> "f0", 1 -> "f1")
      var nextKey = 2
      var nextName = 2
      var rows = Map.empty[Long, Map[Int, Long]]
      var written = 0L

      def table = GraftTable.load(spark, loc)
      def writeBatch(): Unit = {
        val fs = fields
        val ks = (written until written + 5L) ++
          (if (rows.nonEmpty) Seq(rows.keys.head) else Nil) // one overwrite
        written += 5
        val data = ks.map { k =>
          val vals = fs.map { case (sk, _) => sk -> (k * 100 + sk) }
          rows += k -> vals.toMap
          org.apache.spark.sql.Row(k, org.apache.spark.sql.Row(vals.map(_._2): _*))
        }
        val st = StructType(Seq(StructField("k", LongType),
          StructField("info", StructType(
            fs.map { case (_, n) => StructField(n, LongType) }))))
        table.write(spark.createDataFrame(
          spark.sparkContext.parallelize(data.toSeq), st))
      }
      def check(): Unit = {
        val fs = fields
        val sel = Seq(col("k")) ++ fs.map { case (_, n) => col(s"info.$n") }
        val got = table.read().select(sel: _*).collect()
          .map(r => r.getLong(0) -> fs.indices.map(i =>
            if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))).toVector).toMap
        val want = rows.map { case (k, vals) =>
          k -> fs.map { case (sk, _) => vals.get(sk) }.toVector
        }
        assert(got == want, s"seed=$seed fields=$fs " +
          s"sampleGot=${got.toSeq.sortBy(_._1).take(2)} " +
          s"sampleWant=${want.toSeq.sortBy(_._1).take(2)}")
      }

      writeBatch()
      for (_ <- 0 until 12) {
        rnd.nextInt(5) match {
          case 0 => // add
            val name = s"g$nextName"; nextName += 1
            table.addNestedColumn("info", name, LongType)
            fields :+= (nextKey -> name); nextKey += 1
            // existing model rows have no value for the new key (None)
          case 1 => // rename
            val i = rnd.nextInt(fields.size)
            val name = s"g$nextName"; nextName += 1
            table.renameNestedColumn("info", fields(i)._2, name)
            fields = fields.updated(i, fields(i)._1 -> name)
          case 2 if fields.size > 1 => // drop
            val i = rnd.nextInt(fields.size)
            table.dropNestedColumn("info", fields(i)._2)
            val sk = fields(i)._1
            fields = fields.patch(i, Nil, 1)
            rows = rows.view.mapValues(_ - sk).toMap
          case 3 => // reorder
            val perm = rnd.shuffle(fields)
            table.reorderNestedColumns("info", perm.map(_._2))
            fields = perm
          case _ => writeBatch()
        }
        check()
      }
    }
  }

  test("random cross-partition moves agree with the model (2 seeds)") {
    runCrossPartitionScenario(seed = 11L, ops = 10)
    runCrossPartitionScenario(seed = 523L, ops = 9)
  }
}
