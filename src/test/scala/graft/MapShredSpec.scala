package graft

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Literal-key MAP pruning (`fields.<col>.shred-keys` + GraftMapShredRule):
 * `SELECT attrs['k']` on a declared key reads ONLY the shredded side
 * column — the map value bytes never decode — and filters on it file-skip
 * by the side column's stats. Capability of the reference's
 * shared-shredding MAP layout + PushDownMapSelectedKeys.
 */
class MapShredSpec extends SparkTestBase {
  import spark.implicits._

  private def mkTable(loc: String, n: Int = 200): GraftTable = {
    val df = spark.range(n).select(col("id").as("k"),
      map(lit("status"), concat(lit("s"), col("id") % 3),
        lit("score"), concat(lit(""), col("id") % 100),
        lit("rare"), when(col("id") === 7, lit("hit")).otherwise(lit("miss")))
        .as("attrs"),
      (col("id") * 1.5).as("v"))
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(options = Map(
        "fields.attrs.shred-keys" -> "status,score",
        "write.max-records-per-file" -> "40")))
    t.write(df.repartition(4))
    t
  }

  private def dsv2(loc: String): DataFrame = spark.read.format("graft").load(loc)

  private def scanDesc(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("literal-key access reads shredded side columns, not the map") {
    val loc = tmpLoc("mapshred")
    mkTable(loc)
    val q = dsv2(loc).select(col("k"), col("attrs")("status").as("st"))
    val plan = scanDesc(q)
    assert(plan.contains("GraftMapShredBatchScan"),
      s"map access not pushed to shred columns:\n$plan")
    assert(plan.contains("mapKeys=attrs:"), plan)
    // correctness: identical to the decoded-map answer
    val got = q.as[(Long, String)].collect().toMap
    assert(got.size == 200)
    assert((0 until 200).forall(i => got(i.toLong) == s"s${i % 3}"))
    // multiple keys in one query share the retyped column
    val q2 = dsv2(loc).select(col("attrs")("status").as("st"),
      col("attrs")("score").as("sc"))
    assert(scanDesc(q2).contains("GraftMapShredBatchScan"))
    val r2 = q2.as[(String, String)].collect()
    assert(r2.length == 200 && r2.contains(("s1", "1")))
  }

  test("filter on a declared key file-skips via side-column stats") {
    val loc = tmpLoc("mapshred-skip")
    mkTable(loc)
    val q = dsv2(loc).filter(col("attrs")("score") === "5")
      .select(col("k"), col("attrs")("status").as("st"))
    val plan = scanDesc(q)
    assert(plan.contains("GraftMapShredBatchScan"), plan)
    // GraftVariantPrune extends the swapped scan with stats pruning
    assert(plan.contains("shredPruned=true"),
      s"expected side-column file skipping:\n$plan")
    val got = q.as[(Long, String)].collect()
    assert(got.length == 2 && got.map(_._1).toSet == Set(5L, 105L))
  }

  test("wholesale or undeclared uses keep the map column untouched") {
    val loc = tmpLoc("mapshred-fallback")
    mkTable(loc)
    // wholesale projection alongside a key access: no rewrite, still correct
    val q1 = dsv2(loc).select(col("attrs"), col("attrs")("status").as("st"))
    val p1 = scanDesc(q1)
    assert(!p1.contains("GraftMapShredBatchScan"), p1)
    assert(q1.count() == 200)
    // undeclared key: no rewrite, still correct
    val q2 = dsv2(loc).select(col("k"), col("attrs")("rare").as("r"))
      .filter(col("r") === "hit")
    assert(!scanDesc(q2).contains("GraftMapShredBatchScan"))
    assert(q2.as[(Long, String)].collect().toSeq == Seq((7L, "hit")))
    // mixed: declared keys rewrite even when an undeclared one forces the
    // map to stay? No — one undeclared use fails the whole column
    val q3 = dsv2(loc).select(col("attrs")("status").as("st"),
      col("attrs")("rare").as("r"))
    assert(!scanDesc(q3).contains("GraftMapShredBatchScan"))
    assert(q3.count() == 200)
  }

  test("aggregate shapes rewrite: count over a shredded-key filter reads side columns") {
    val loc = tmpLoc("mapshred-agg")
    mkTable(loc)
    // Filter under Aggregate, NO Project of the map anywhere — the shape
    // the reference rule (Project-only) misses
    val q = dsv2(loc).filter(col("attrs")("score") === "5")
      .agg(count(lit(1)).as("cnt"))
    val plan = scanDesc(q)
    assert(plan.contains("GraftMapShredBatchScan"),
      s"filter-under-aggregate not pushed to shred columns:\n$plan")
    assert(plan.contains("shredPruned=true"), plan) // side-column file skip
    assert(q.collect().head.getLong(0) == 2L) // ids 5 and 105
    // grouped aggregate keyed on a declared key, no filter
    val q2 = dsv2(loc).groupBy(col("attrs")("status").as("st"))
      .agg(count(lit(1)).as("cnt"))
    val p2 = scanDesc(q2)
    assert(p2.contains("GraftMapShredBatchScan"), p2)
    val g2 = q2.as[(String, Long)].collect().toMap
    assert(g2 == Map("s0" -> 67L, "s1" -> 67L, "s2" -> 66L), g2)
    // wholesale use inside the aggregate still refuses the rewrite (NB:
    // count(attrs) would not do — the optimizer folds count(non-nullable)
    // to count(1) before this rule runs, legitimately leaving only the
    // literal-key use; max(size(attrs)) keeps the wholesale reference)
    val q3 = dsv2(loc).filter(col("attrs")("score") === "5")
      .agg(max(size(col("attrs"))).as("mx"))
    assert(!scanDesc(q3).contains("GraftMapShredBatchScan"))
    assert(q3.collect().head.getInt(0) == 3)
  }

  test("shred-keys on a PK table: merge path stays correct, compacted reads prune") {
    val loc = tmpLoc("mapshred-pk")
    val df = spark.range(100).select(col("id").as("k"),
      map(lit("status"), concat(lit("s"), col("id") % 3)).as("attrs"))
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        options = Map("fields.attrs.shred-keys" -> "status")))
    t.write(df)
    t.write(spark.range(10).select(col("id").as("k"),
      map(lit("status"), lit("UPD")).as("attrs")))
    // merge-needed read: no swap, correct values (updates win)
    val q = dsv2(loc).select(col("k"), col("attrs")("status").as("st"))
    val got = q.as[(Long, String)].collect().toMap
    assert(got.size == 100 && got(3L) == "UPD" && got(50L) == "s2")
    // compacted: raw path → swap applies, same values
    import graft.core.RowOps._
    t.compact()
    val q2 = dsv2(loc).select(col("k"), col("attrs")("status").as("st"))
    val plan2 = scanDesc(q2)
    assert(plan2.contains("GraftMapShredBatchScan"), plan2)
    val got2 = q2.as[(Long, String)].collect().toMap
    assert(got2 == got)
  }

  test("shred-keys rejects non-map columns loudly") {
    val loc = tmpLoc("mapshred-bad")
    val df = Seq((1L, "x")).toDF("k", "s")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(options = Map("fields.s.shred-keys" -> "a")))
    val e = intercept[IllegalArgumentException](t.write(df))
    assert(e.getMessage.contains("requires MAP<STRING"), e.getMessage)
  }
}
