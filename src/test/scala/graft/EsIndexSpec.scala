package graft

import graft.core._
import graft.pipeline.{EsIndex, Indexes, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** es-index equivalent (§2.11): ONE composite index over a vector column +
  * companion keyword/scalar columns + a text column, queried under a filter
  * that masks candidates on every modality. */
class EsIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** 2k docs: deterministic embedding, a keyword (`cat`), a scalar (`score`),
    * and text containing searchable marker words. */
  private lazy val docs = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val emb = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      val words =
        (if (i % 5 == 0) "merge scan table " else "alpha beta gamma ") +
          s"w$i filler text"
      Row(i.toLong, emb.toSeq, s"cat${i % 7}", i % 100, words)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("emb", ArrayType(FloatType, false), false),
      StructField("cat", StringType, false),
      StructField("score100", IntegerType, false),
      StructField("text", StringType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  private lazy val loc = {
    val l = tmpLoc("esix")
    EsIndex.build(spark, docs, "id", l, embedCol = Some("emb"),
      textCol = Some("text"), keywordCols = Seq("cat"), nClusters = 8)
    l
  }

  private def queryVec: Seq[Float] =
    docs.filter(col("id") === 3L).select("emb").head().getSeq[Float](0)

  test("filtered vector search matches filtered brute force at nprobe=all") {
    val got = EsIndex.search(spark, loc, k = 10, vector = Some(queryVec),
      filter = Some(col("cat") === "cat2"), nprobe = 8)
    val want = Similarity.bruteForceTopK(
      docs.filter(col("cat") === "cat2"), "emb", queryVec, 10,
      "cosine", "score").select(col("id"), col("score"))
    assertSameRows(got.withColumn("score", round(col("score"), 6)),
      want.withColumn("score", round(col("score"), 6)))
  }

  test("filtered text search: filter masks candidates, stats stay whole-index") {
    val got = EsIndex.search(spark, loc, k = 5, terms = Seq("merge", "scan"),
      filter = Some(col("score100") < 50))
    val ids = got.select("id").as[Long].collect()
    assert(ids.nonEmpty)
    // every hit satisfies BOTH the term match (i%5==0) and the filter
    assert(ids.forall(i => i % 5 == 0 && i % 100 < 50), ids.toSeq.toString)
    // unfiltered search over the same terms must produce the same scores for
    // those docs (filter must NOT change BM25 statistics)
    val all = EsIndex.search(spark, loc, k = 2000, terms = Seq("merge", "scan"))
      .withColumnRenamed("score", "s_all")
    val joined = got.join(all, "id")
    assert(joined.filter(abs(col("score") - col("s_all")) > 1e-9).isEmpty)
  }

  test("hybrid vector+text under one filter fuses by RRF") {
    val got = EsIndex.search(spark, loc, k = 10, vector = Some(queryVec),
      terms = Seq("merge"), filter = Some(col("score100") >= 20), nprobe = 8)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // rrf scores descend and all ids satisfy the filter
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(rows.forall(_.getLong(0) % 100 >= 20))
  }

  test("hybrid rankers: mrr and weighted_score fuse like their FullText definitions") {
    for (r <- Seq("mrr", "weighted_score")) {
      val got = EsIndex.search(spark, loc, k = 10, vector = Some(queryVec),
        terms = Seq("merge"), filter = Some(col("score100") >= 20),
        nprobe = 8, ranker = r)
      val rows = got.collect()
      assert(rows.nonEmpty && rows.length <= 10, s"$r returned ${rows.length}")
      val scores = rows.map(_.getDouble(1))
      assert(scores.sameElements(scores.sortBy(-(_: Double))), s"$r not sorted")
      assert(rows.forall(_.getLong(0) % 100 >= 20), r)
    }
    intercept[IllegalArgumentException] {
      EsIndex.search(spark, loc, k = 1, vector = Some(queryVec),
        terms = Seq("merge"), ranker = "nope").collect()
    }
  }

  test("hybrid rankers survive an EMPTY side (no document matches the terms)") {
    // no posting contains "zzznohit": the BM25 side is an empty frame — each
    // ranker must pass the vector-only ranking through the full-outer fuse
    // (weighted_score used to NPE in min/max normalization of zero rows)
    for (r <- Seq("rrf", "mrr", "weighted_score")) {
      val rows = EsIndex.search(spark, loc, k = 5, vector = Some(queryVec),
        terms = Seq("zzznohit"), nprobe = 8, ranker = r).collect()
      assert(rows.length == 5, s"$r returned ${rows.length}")
      assert(rows.head.getLong(0) == 3L, s"$r lost the vector top hit")
    }
  }

  test("vector probe is partition pruning; keyword filter is file skipping") {
    // nprobe=2 of 8 clusters → at most 2 partitions' files planned
    val model = Indexes.loadIvfModel(spark, loc)
    val probes = model.nearestClusters(queryVec, 2)
    val t = GraftTable.load(spark, loc)
    val total = t.planFiles().size
    val pruned = t.planFiles(
      filter = Some(col("__ivf_cluster").isin(probes: _*))).size
    assert(pruned < total, s"probe pruning: $pruned of $total")
    // bloom file-index on `cat` skips files lacking the keyword
    val bloomed = t.planFiles(
      filter = Some(col("cat") === "no-such-keyword")).size
    assert(bloomed == 0, s"bloom should prove absence, planned $bloomed")
  }

  test("append indexes only the delta; new docs are searchable") {
    val l = tmpLoc("esix-append")
    EsIndex.build(spark, docs, "id", l, embedCol = Some("emb"),
      textCol = Some("text"), nClusters = 8)
    val extra = docs.filter(col("id") < 3)
      .withColumn("id", col("id") + 10000L)
      .withColumn("text", lit("zebra quokka unique"))
    EsIndex.append(spark, extra, l)
    val hit = EsIndex.search(spark, l, k = 5, terms = Seq("zebra"))
    assert(hit.select("id").as[Long].collect().toSet == Set(10000L, 10001L, 10002L))
    // vector search still finds an appended row exactly (nprobe = all).
    // The appended row shares its embedding with original id 1 (only the
    // text changed), so the two tie at cosine 1.0 — top-2 must be exactly
    // that pair, deterministically (bruteForceTopK id tiebreak; the old
    // top-1 assert flipped with partition order under load)
    val v = extra.filter(col("id") === 10001L).select("emb").head().getSeq[Float](0)
    val top = EsIndex.search(spark, l, k = 2, vector = Some(v), nprobe = 8)
    assert(top.select("id").as[Long].collect().toSet == Set(1L, 10001L))
  }

  test("filtered text search past the df gate plans a NON-broadcast join") {
    // 'merge'/'scan' hit 400 docs each → sum(df) = 800 > limit 10: the
    // broadcast hint must be absent, so with auto-broadcast disabled Spark
    // plans a shuffle join (an unbounded postings set must never be forced
    // through the driver; sizes are AQE's call past the gate)
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k =>
      k -> conf.getOption(k))
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val got = EsIndex.search(spark, loc, k = 5, terms = Seq("merge", "scan"),
        filter = Some(col("score100") < 50), broadcastDfLimit = 10L)
      val rows = got.collect()
      assert(rows.nonEmpty)
      // the candidate↔scores join (on doc_id) must NOT broadcast; the
      // term-stats join inside fullTextScores (on term, bounded by #query
      // terms) legitimately keeps its hint. Inspect the executed join nodes
      // structurally (plan-string matching is brittle across Spark versions).
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      // AQE wraps executed stages in leaf QueryStageExec nodes — recurse
      // through them to reach the actual join operators
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => allNodes(q.plan)
        case o => o.children.flatMap(allNodes)
      })
      def keyNames(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        keys.flatMap(_.references.map(_.name)).toSet
      val nodes = allNodes(got.queryExecution.executedPlan)
      val bcastOnDocId = nodes.collect {
        case j: BroadcastHashJoinExec if keyNames(j.leftKeys).contains("doc_id") => j
      }
      assert(bcastOnDocId.isEmpty,
        s"df gate must drop the broadcast hint on the scores join:\n$nodes.head")
      val shuffledOnDocId = nodes.collect {
        case j: SortMergeJoinExec if keyNames(j.leftKeys).contains("doc_id") => j
        case j: ShuffledHashJoinExec if keyNames(j.leftKeys).contains("doc_id") => j
      }
      assert(shuffledOnDocId.nonEmpty,
        s"expected a shuffle join on doc_id:\n${nodes.head}")
      // same result as the broadcast path
      val bc = EsIndex.search(spark, loc, k = 5, terms = Seq("merge", "scan"),
        filter = Some(col("score100") < 50))
      assertSameRows(got, bc)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("selective filter with starved probes escalates to exact search") {
    // one surviving row; at nprobe=1 its cluster is likely unprobed — the
    // candidate count (< k) walks the progressive ladder (1 → 4 → exact),
    // so the row is found regardless of the filter × nprobe interplay
    val (got, effNp) = EsIndex.searchDetail(spark, loc, k = 10,
      vector = Some(queryVec), filter = Some(col("id") === 1234L), nprobe = 1)
    assert(got.select("id").as[Long].collect().toSeq == Seq(1234L))
    assert(effNp == 8, s"a 1-row filter must end exact, effective nprobe=$effNp")
  }

  test("moderately selective filter resolves WITHOUT an index-wide exact scan") {
    // ~286 survivors (cat2, ~36 per cluster) with oversample target 10·k=100:
    // nprobe=1 holds ~36 < 100 so the ladder steps to 4 (~143 ≥ 100) and
    // stops — escalated, but never the index-wide exact scan of the r06
    // probe→exact cliff
    val (got, effNp) = EsIndex.searchDetail(spark, loc, k = 10,
      vector = Some(queryVec), filter = Some(col("cat") === "cat2"), nprobe = 1)
    val ids = got.select("id").as[Long].collect()
    assert(ids.length == 10)
    assert(ids.forall(_ % 7 == 2), ids.toSeq.toString)
    assert(effNp > 1, s"thin probe should have widened: $effNp")
    assert(effNp < 8, s"escalated to exact on a non-starved filter: $effNp")
    // a filter with fewer survivors than the oversample target ANYWHERE
    // (~60 total) must end exact — and exact-within-filter matches filtered
    // brute force
    val (got2, effNp2) = EsIndex.searchDetail(spark, loc, k = 10,
      vector = Some(queryVec), filter = Some(col("score100") < 3), nprobe = 1)
    assert(effNp2 == 8, s"sub-target filter must end exact: $effNp2")
    val want2 = Similarity.bruteForceTopK(
      docs.filter(col("score100") < 3), "emb", queryVec, 10,
      "cosine", "score").select(col("id"), col("score"))
    assertSameRows(got2.withColumn("score", round(col("score"), 6)),
      want2.withColumn("score", round(col("score"), 6)))
  }

  test("filter-only keyword index without a vector column") {
    val l = tmpLoc("esix-kw")
    EsIndex.build(spark, docs.drop("emb"), "id", l, textCol = Some("text"),
      keywordCols = Seq("cat"))
    val got = EsIndex.search(spark, l, k = 5, terms = Seq("merge"),
      filter = Some(col("cat") === "cat0"))
    val ids = got.select("id").as[Long].collect()
    assert(ids.nonEmpty && ids.forall(i => i % 5 == 0 && i % 7 == 0))
  }
}
