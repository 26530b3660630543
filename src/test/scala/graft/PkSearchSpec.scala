package graft

import graft.core._
import graft.core.RowOps._
import graft.pipeline._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-aligned PK search (SURVEY §2.11): snapshot-consistent, DV-aware
  * vector + full-text search over primary-key tables, with index-snapshot
  * reconciliation from the changelog instead of rebuilds. */
class PkSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private def mkEmbeddings(n: Int): DataFrame =
    spark.range(n).select(col("id").as("vid"),
      array((0 until dim).map(i => (rand(seed = i) * 2 - 1).cast("float")): _*)
        .as("emb"))

  private def exactTopK(df: DataFrame, query: Seq[Float], k: Int): Seq[Long] =
    Similarity.bruteForceTopK(df, "emb", query, k, "cosine", "s")
      .select("vid").as[Long].collect().toSeq

  test("pk vector search reconciles updates and DV deletes after the index snapshot") {
    val loc = tmpLoc("pksearch")
    val emb = mkEmbeddings(500).cache()
    val t = GraftTable.create(spark, loc, emb.schema,
      TableConfig(primaryKeys = Seq("vid"), numBuckets = 2))
    t.write(emb)
    val idxLoc = loc + "-vidx"
    PkSearch.buildVectorIndex(t, "emb", idxLoc, nClusters = 4)

    val query = emb.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)

    // fresh index == brute force over the table
    val atBuild = PkSearch.vectorSearch(t, idxLoc, "emb", query, 10, nprobe = 4)
      .select("vid").as[Long].collect().toSeq
    assert(atBuild == exactTopK(t.read(), query, 10))

    // advance the table: reverse every 10th vector, DV-delete every 7th
    t.write(emb.filter(col("vid") % 10 === 0)
      .withColumn("emb", reverse(col("emb"))))
    t.deleteDv(col("vid") % 7 === 0)

    val expected = exactTopK(t.read(), query, 10)
    val gotPoint = PkSearch.vectorSearch(t, idxLoc, "emb", query, 10, nprobe = 4)
      .select("vid").as[Long].collect().toSeq
    assert(gotPoint == expected, "point-read reconciliation path")
    val gotJoin = PkSearch.vectorSearch(t, idxLoc, "emb", query, 10, nprobe = 4,
      maxPointKeys = 0) // force the semi-join path
      .select("vid").as[Long].collect().toSeq
    assert(gotJoin == expected, "semi-join reconciliation path")

    // deleted keys must never surface even though the index still holds them
    val all = PkSearch.vectorSearch(t, idxLoc, "emb", query, 1000, nprobe = 4)
      .select("vid").as[Long].collect().toSet
    assert(all.forall(_ % 7 != 0), "DV-deleted keys leaked from the index route")
    assert(all == t.read().select("vid").as[Long].collect().toSet)

    // the SQL TVF spelling routes the TABLE path through the same
    // file-aligned search (back-reference sidecar) — DV-leak assertion
    // re-run through graft_vector_search
    val arr = query.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
    val viaTvf = spark.sql(
      s"SELECT vid, score FROM graft_vector_search('$loc', 1000, 4, $arr)")
      .select("vid").as[Long].collect().toSet
    assert(viaTvf.forall(_ % 7 != 0), "DV-deleted keys leaked through the TVF")
    assert(viaTvf == all, "TVF route must equal the Scala API route")
    emb.unpersist()
  }

  test("pk full-text search reflects merged text and drops DV-deleted docs") {
    val loc = tmpLoc("pkft")
    val docs = Seq(
      (1L, "spark table scan performance"),
      (2L, "merge on read table"),
      (3L, "unrelated words entirely"),
      (4L, "table table table scan")
    ).toDF("doc_id", "text")
    val t = GraftTable.create(spark, loc, docs.schema,
      TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 2))
    t.write(docs)
    // update: doc 3 becomes relevant; delete: doc 4 disappears
    t.write(Seq((3L, "table scan table scan")).toDF("doc_id", "text"))
    t.deleteDv(col("doc_id") === 4)

    val got = PkSearch.fullTextSearch(t, "doc_id", "text",
      Seq("table", "scan"), 10).select("doc_id").as[Long].collect().toSeq
    assert(!got.contains(4L), "DV-deleted doc surfaced")
    assert(got.contains(3L), "updated doc missing")
    // doc 3 (two hits of each query term, short doc) must outrank doc 2
    assert(got.indexOf(3L) < got.indexOf(2L))
  }
}
