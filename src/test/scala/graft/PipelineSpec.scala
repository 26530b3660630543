package graft

import graft.core._
import graft.core.RowOps._
import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra"),
    (3L, "completely different content about spark query engines and columnar storage"),
    (4L, "der hund und die katze und das haus und der garten sind schoen")
  ).toDF("doc_id", "text")

  test("int8-quantized ANN: candidate pass + exact rerank recovers the true top-k") {
    val n = 2000; val dim = 16
    val emb = spark.range(n).select(col("id"),
      array((0 until dim).map(i => (rand(seed = i) * 2 - 1).cast("float")): _*).as("emb"))
      .withColumn("q8", Similarity.quantizeInt8(col("emb")))
      .cache()
    val query = emb.filter(col("id") === 7).select("emb").first().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(emb, "emb", query, 10, "cosine", "sim")
      .select("id").as[Long].collect().toSeq
    val quant = Similarity.quantizedTopK(emb, "emb", "q8", query, 10, rerank = 100)
      .select("id").as[Long].collect().toSeq
    assert(quant.head == 7L, "the query vector itself must rank first")
    val overlap = exact.toSet.intersect(quant.toSet).size
    assert(overlap >= 8, s"top-10 recall too low: $overlap/10 (exact=$exact quant=$quant)")
    // codes hold the UNIT vector (cosine candidate ranking): each component
    // round-trips within half a quantization step of x/||x||
    val row = emb.filter(col("id") === 7)
      .select(col("emb"), col("q8.scale"), col("q8.codes")).first()
    val (e, s, codes) = (row.getSeq[Float](0), row.getDouble(1), row.getSeq[Byte](2))
    val nrm = math.sqrt(e.map(x => x.toDouble * x).sum)
    e.zip(codes).foreach { case (x, c) =>
      assert(math.abs(x / nrm - c * s) <= s / 2 + 1e-9) }
    emb.unpersist()
  }

  test("product quantization: ADC candidates + exact rerank recover the true top-k") {
    val n = 2000; val dim = 16
    val emb = spark.range(n).select(col("id"),
      array((0 until dim).map(i => (rand(seed = i) * 2 - 1).cast("float")): _*).as("emb"))
      .cache()
    val model = Similarity.trainPq(emb, "emb", dim, m = 4, ks = 16)
    assert(model.m == 4 && model.dsub == 4)
    val coded = emb.withColumn("pq", model.encodeUdf(col("emb")))
    // codes are m raw BINARY bytes per row — the compression the scan pays
    assert(coded.select(length(col("pq"))).distinct().as[Long].collect().toSeq == Seq(4L))
    val query = emb.filter(col("id") === 7).select("emb").first().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(emb, "emb", query, 10, "cosine", "sim")
      .select("id").as[Long].collect().toSeq
    val pq = Similarity.pqTopK(coded, "emb", "pq", model, query, 10, rerank = 200)
      .select("id").as[Long].collect().toSeq
    assert(pq.head == 7L, "the query vector itself must rank first")
    val overlap = exact.toSet.intersect(pq.toSet).size
    assert(overlap >= 7, s"top-10 recall too low: $overlap/10 (exact=$exact pq=$pq)")
    emb.unpersist()
  }

  test("decontamination: benchmark n-gram containment flags copies, not fresh text") {
    val bench = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val train = Seq(
      // full copy with a short suffix: near-total containment
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra words here"),
      // disjoint content: zero containment
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      // partial overlap: a single shared 5-gram window
      (3L, "alpha beta gamma delta epsilon different tail of words goes on here")
    ).toDF("doc_id", "text")
    val scores = Dedup.contaminationScores(train, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(scores(1L)._3 > 0.6, s"copy should be contaminated: ${scores(1L)}")
    assert(scores(2L)._1 == 0L, s"fresh text should have zero hits: ${scores(2L)}")
    assert(scores(3L)._1 == 1L && scores(3L)._3 < 0.3,
      s"partial overlap = exactly the one shared 5-gram: ${scores(3L)}")
  }

  test("semantic dedup: within-cluster near-dup groups keep the min-id doc") {
    val dim = 8
    // three planted groups of near-identical vectors + two singletons.
    // Base directions are orthogonal unit axes → organic cross-group cosine
    // is ~0, group-internal cosine is ~1.
    def v(axis: Int, eps: Float): Seq[Float] =
      (0 until dim).map(i => if (i == axis) 1.0f else if (i == (axis + 1) % dim) eps else 0.0f)
    val rows = Seq(
      (1L, v(0, 0.001f)), (2L, v(0, 0.002f)), (3L, v(0, 0.003f)), // group {1,2,3}
      (10L, v(2, 0.001f)), (11L, v(2, 0.002f)),                   // group {10,11}
      (20L, v(4, 0.0f)),                                          // singleton
      (30L, v(6, 0.0f)))                                          // singleton
    val df = rows.toDF("id", "emb")
    // k=1: every pair considered → survivors are exactly the group minima
    val s1 = Dedup.semanticDedup(df, "id", "emb", k = 1, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(s1 == Set(1L, 10L, 20L, 30L), s"got $s1")
    // higher k: identical-direction vectors still co-cluster (same nearest
    // centroid), so planted groups still collapse
    val s4 = Dedup.semanticDedup(df, "id", "emb", k = 4, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(s4 == Set(1L, 10L, 20L, 30L), s"got $s4")
    // survivors carry the FULL row (left_semi keeps all columns)
    assert(Dedup.semanticDedup(df, "id", "emb", 1, 0.999).columns.toSeq ==
      Seq("id", "emb"))
  }

  test("connected components: chains propagate to the minimum label") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (6L, 5L))
      .toDF("v1", "v2")
    val cc = Dedup.connectedComponents(pairs, "v1", "v2")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L))
    // canonicalize: docs outside any pair map to themselves
    val allDocs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 99L).toDF("doc_id")
    val canon = Dedup.canonicalize(allDocs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(canon(99L) == 99L && canon(4L) == 1L && canon(11L) == 10L)
  }

  test("connected components: ONE driver action per propagation round " +
      "(convergence rides the label-materialization job, no probe action)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // a single edge converges in EXACTLY two rounds (one label move + one
    // confirming round), so the action budget is fully determined
    val pairs = Seq((2L, 1L)).toDF("v1", "v2")
    // one Dataset action = one root SQL execution; AQE stage and broadcast
    // jobs all ride under their action's root id, so counting DISTINCT
    // root ids counts driver ACTIONS (Spark 4 job properties carry no
    // callSite — execution ids are the reliable signal)
    val roots = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = j.properties
        val root = Option(p.getProperty("spark.sql.execution.root.id"))
          .orElse(Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse(s"job-${j.jobId}")
        roots.add(root)
      }
    }
    spark.sparkContext.addSparkListener(l)
    val cc =
      try {
        roots.clear()
        val out = Dedup.connectedComponents(pairs, "v1", "v2")
          .as[(Long, Long)].collect().toMap
        org.apache.spark.sql.graft.SparkShims.waitListenerBus(spark)
        out
      } finally spark.sparkContext.removeSparkListener(l)
    assert(cc == Map(1L -> 1L, 2L -> 1L), cc)
    // budget: edges checkpoint + initial-labels checkpoint + 1 checkpoint
    // per round (2 rounds) + the test's own collect = 5. The pre-fusion
    // per-round limit(1).count() probe would add one more action per round
    // (7 total) — this pins it out
    assert(roots.size <= 5,
      s"expected ≤ 5 driver actions (one per round), saw ${roots.size}")
  }

  test("native shingle hashes equal the relational form on adversarial inputs") {
    val rows = Seq(
      "alpha Beta GAMMA delta epsilon",  // case folding
      "a\tb\nc  d\r\ne",                 // every ws kind, double ws
      "  leading and trailing  ",        // trim interplay
      "Thé straße ĳs grüß",              // unicode lowercase + multi-byte
      "one two",                         // fewer tokens than n → empty
      "", "   ")
      .toDF("text")
    val both = rows.select(
      TextOps.shingleHashesNative(col("text"), 3).as("nat"),
      TextOps.shingleHashes(TextOps.shingles(col("text"), 3)).as("rel"))
    assert(both.filter(!(col("nat") <=> col("rel"))).isEmpty,
      both.collect().mkString("; "))
    // null text → null
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextOps.shingleHashesNative(col("text"), 3).isNull)
    assert(nulls.head().getBoolean(0))
  }

  test("native simhash32 equals the relational form on adversarial inputs") {
    val rows = Seq(
      "alpha Beta GAMMA delta", "a\tb\nc  d\r\ne", "  x  ",
      "Thé straße ĳs grüß", "", "the der le el")
      .toDF("text")
    val both = rows.select(
      TextOps.simhash32(col("text")).as("nat"),
      TextOps.simhash32Relational(col("text")).as("rel"))
    assert(both.filter(!(col("nat") <=> col("rel"))).isEmpty,
      both.collect().mkString("; "))
    // NULL text → 0 on BOTH forms (the relational when(null>0).otherwise(0)
    // folds null to the empty fingerprint; a null-fingerprint doc must
    // still band-join with empty-text docs)
    val nulls = Seq[Option[String]](None).toDF("text").select(
      TextOps.simhash32(col("text")).as("nat"),
      TextOps.simhash32Relational(col("text")).as("rel")).head()
    assert(nulls.getLong(0) == 0L && nulls.getLong(1) == 0L, nulls.toString)
  }

  test("one-pass minhash signature equals the per-seed form; empty set is null") {
    val docs = Seq("alpha beta gamma delta epsilon", "x y z w v u",
      "one two three four five six seven", "a b").toDF("text")
    val sh = TextOps.shingles(col("text"), 3)
    val both = docs.select(
      TextOps.minhashSignature(sh, 8).as("fast"),
      TextOps.minhashFromHashes(TextOps.shingleHashes(sh), 8).as("ref"),
      TextOps.minhashFromHashesNative(
        TextOps.shingleHashesNative(col("text"), 3), 8).as("nat"))
    assert(both.filter(!(col("fast") <=> col("ref"))).isEmpty,
      both.collect().mkString("; "))
    assert(both.filter(!(col("nat") <=> col("ref"))).isEmpty,
      both.collect().mkString("; "))
    // "a b" has <3 words → empty shingle set → all-null signature
    val nulls = docs.filter(col("text") === "a b")
      .select(TextOps.minhashSignature(sh, 8).as("s"))
      .select(forall(col("s"), _.isNull)).head().getBoolean(0)
    assert(nulls)
  }

  test("minhash LSH finds the near-duplicate pair and only it") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.5)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("persisted minhash signature index: O(delta) refresh, identical pairs") {
    val loc = java.nio.file.Files.createTempDirectory("graft-mh-idx")
      .toString + "/idx"
    val idx = Dedup.createMinhashIndex(spark, loc, "doc_id",
      shingleN = 3, sigLen = 8)
    // initial refresh computes one signature per non-empty doc
    val n0 = Dedup.refreshMinhashIndex(idx, docs, "doc_id", "text")
    assert(n0 == docs.count(), s"initial refresh computed $n0")
    // no-change refresh computes ZERO — the O(delta) gate
    assert(Dedup.refreshMinhashIndex(idx, docs, "doc_id", "text") == 0L)
    // index pairs == inline pairs, byte-identical
    val fromIdx = Dedup.minhashPairsFromIndex(idx, "doc_id",
      nBands = 4, threshold = 0.5).select("v1", "v2", "jac")
    val inline = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.5)
      .select("v1", "v2", "jac")
    assert(rowsOf(fromIdx) == rowsOf(inline))
    // appending k new docs computes exactly k signatures; a CHANGED doc
    // recomputes (fingerprint mismatch) and the upsert replaces its entry
    val more = Seq((100L, "totally new text about ships and sails and sea"),
      (1L, "alpha beta gamma delta epsilon zeta CHANGED"))
      .toDF("doc_id", "text")
    assert(Dedup.refreshMinhashIndex(idx, more, "doc_id", "text") == 2L)
    val stored = idx.read().count()
    assert(stored == docs.count() + 1, s"stored=$stored") // 1L replaced, 100L new
  }

  test("delta-scoped index pairs: O(touched buckets), equal to the full run's new-pair subset") {
    val loc = java.nio.file.Files.createTempDirectory("graft-mh-since")
      .toString + "/idx"
    val idx = Dedup.createMinhashIndex(spark, loc, "doc_id",
      shingleN = 3, sigLen = 8)
    Dedup.refreshMinhashIndex(idx, docs, "doc_id", "text")
    val snap0 = idx.sm.snapshotIds.max
    val metrics = graft.core.GraftMetrics.forTable(idx.location)
    def gauge(n: String): Long = metrics.rows
      .collectFirst { case (`n`, _, v) => v.toLong }.getOrElse(-1L)
    // no-change repeat: empty output, ZERO delta docs, ZERO touched buckets
    val none = Dedup.minhashPairsFromIndexSince(idx, "doc_id", snap0,
      nBands = 4, threshold = 0.5)
    assert(none.count() == 0)
    assert(gauge("lastMinhashDeltaDocs") == 0L &&
      gauge("lastMinhashTouchedBuckets") == 0L)
    // delta: a near-dup of doc 1 (cross-group pair), an EXACT dup of doc 3
    // (within-group pair), and an unrelated new doc (no pair)
    val doc3Text = docs.filter(col("doc_id") === 3L).select("text").first().getString(0)
    val more = Seq(
      (501L, "the quick brown fox jumps over the lazy dog near the river bank today more"),
      (600L, doc3Text),
      (700L, "nothing shares any shingle with this isolated brand new sentence at all"))
      .toDF("doc_id", "text")
    assert(Dedup.refreshMinhashIndex(idx, more, "doc_id", "text") == 3L)
    val since = Dedup.minhashPairsFromIndexSince(idx, "doc_id", snap0,
      nBands = 4, threshold = 0.5)
    val deltaIds = Set(501L, 600L, 700L)
    val full = Dedup.minhashPairsFromIndex(idx, "doc_id",
      nBands = 4, threshold = 0.5)
    val expected = full.filter(col("v1").isin(deltaIds.toSeq: _*) ||
      col("v2").isin(deltaIds.toSeq: _*))
    assert(rowsOf(since.select("v1", "v2", "jac")) ==
      rowsOf(expected.select("v1", "v2", "jac")))
    val got = since.select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(got.contains((3L, 600L)), s"within-group delta pair missing: $got") // exact dup
    assert(got.exists { case (a, b) => a == 501L || b == 501L },
      s"cross-group delta pair missing: $got")
    assert(got.forall { case (a, b) => deltaIds(a) || deltaIds(b) }, got)
    // metrics gate: banding touched at most |delta| × nBands buckets
    assert(gauge("lastMinhashDeltaDocs") == 3L)
    val touched = gauge("lastMinhashTouchedBuckets")
    assert(touched > 0L && touched <= 3L * 4L, s"touched=$touched")
  }

  /** The UNGUARDED pre-r9 minhash pipeline (collect_list of raw doc ids per
    * bucket, no exact-duplicate collapse) — the differential baseline for the
    * mega-cluster guard: on any corpus the guarded path must emit the
    * byte-identical pair set. */
  private def unguardedMinhashPairs(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, shingleN: Int, sigLen: Int,
      nBands: Int, threshold: Double): org.apache.spark.sql.DataFrame = {
    val rpb = sigLen / nBands
    val base = df
      .select(col(idCol), TextOps.shingleHashesNative(col(textCol), shingleN).as("__hs"))
      .filter(size(col("__hs")) > 0)
      .select(col(idCol), array_distinct(col("__hs")).as("__hsd"),
        TextOps.minhashFromHashesNative(col("__hs"), sigLen).as("__sig"))
      .withColumn("__n", size(col("__hsd")))
      .persist()
    val banded = base.select(col(idCol),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), TextOps.bandKey(col("__sig"), b, rpb).as("bk"))): _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bk").as("bk"))
    val cand = banded.groupBy("band", "bk")
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(filter(__ids, y -> y > x), y -> struct(x AS v1, y AS v2))))"""
          .stripMargin)).as("p"))
      .select(col("p.v1"), col("p.v2")).distinct()
    val s1 = base.select(col(idCol).as("v1"), col("__hsd").as("sh1"), col("__n").as("n1"))
    val s2 = base.select(col(idCol).as("v2"), col("__hsd").as("sh2"), col("__n").as("n2"))
    cand.join(s1, "v1").join(s2, "v2")
      .withColumn("__i", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jac", when(col("n1") + col("n2") === col("__i"), lit(1.0))
        .otherwise(col("__i") / (col("n1") + col("n2") - col("__i"))))
      .filter(col("jac") >= threshold)
      .select(col("v1"), col("v2"), round(col("jac"), 4).as("jac"))
  }

  test("guarded minhash emits the identical pair set on a corpus WITH exact duplicates") {
    // normal corpus: real documents + near-dup copies (suffix edit) + exact
    // duplicate copies — within-group, cross-group and near-dup pairs all in
    // play; guarded output must equal the unguarded pipeline's byte-for-byte
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 120)
    val corpus = docs0
      .unionAll(docs0.filter(col("doc_id") < 60).select(
        (col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text")))   // near-dups
      .unionAll(docs0.filter(col("doc_id") % 3 === 0).select(
        (col("doc_id") + 2000L).as("doc_id"), col("text")))   // exact dups
    val guarded = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val unguarded = unguardedMinhashPairs(corpus, "doc_id", "text",
      shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(guarded == unguarded,
      s"only-guarded: ${(guarded -- unguarded).take(5)}; " +
        s"only-unguarded: ${(unguarded -- guarded).take(5)}")
    assert(guarded.nonEmpty && guarded.exists(_._3 == 1.0) &&
      guarded.exists(p => p._3 < 1.0), s"corpus must exercise both pair kinds")
  }

  test("minhash survives a 10k-duplicate mega-cluster with bounded aggregation rows") {
    // web boilerplate shape: one text duplicated 10^4 times — unguarded,
    // every band bucket holds all 10^4 ids (an O(m) aggregation row and an
    // O(m^2) single-task expansion); guarded, the cluster collapses to ONE
    // fingerprint before banding, so buckets hold 1 entry and the pair set
    // re-expands distributively. 10 distinct extra docs stay pair-free.
    val m = 10000L
    val cluster = spark.range(m).select(col("id").as("doc_id"),
      lit("the same boilerplate page body repeated across the whole web corpus").as("text"))
    val extras = spark.range(10).select((col("id") + 100000L).as("doc_id"),
      concat(lit("unique document number "), col("id").cast("string"),
        lit(" with entirely distinct content words "),
        md5(col("id").cast("string"))).as("text"))
    val pairs = Dedup.minhashLshPairs(cluster.unionAll(extras), "doc_id", "text",
      shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.8)
    assert(pairs.count() == m * (m - 1) / 2, "all within-cluster pairs, nothing else")
    // the cap knob: maxBucketIds=1 silences every RESIDUAL (cross-group)
    // candidate, but exact-duplicate pairs don't ride buckets at all
    val capped = Dedup.minhashLshPairs(
      docs.unionAll(docs.select((col("doc_id") + 10L).as("doc_id"), col("text"))),
      "doc_id", "text", shingleN = 3, sigLen = 8, nBands = 4,
      threshold = 0.5, maxBucketIds = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.nonEmpty && capped.forall(_._3 == 1.0),
      s"cap must leave only exact-duplicate pairs: $capped")
  }

  test("full-text tokenizers: build-side and query-side agree per kind") {
    import graft.pipeline.FullText
    import graft.pipeline.FullText.TokenizerSpec
    val text = "Spark-SQL scans  Parquet FAST"
    def colTokens(spec: TokenizerSpec): Seq[String] =
      Seq(text).toDF("t").select(FullText.tokens(col("t"), spec).as("w"))
        .head().getSeq[String](0)
    // default: lowercase + whitespace (the pre-tokenizer behavior, so every
    // existing index keeps its semantics)
    assert(colTokens(TokenizerSpec()) ==
      Seq("spark-sql", "scans", "parquet", "fast"))
    // simple splits on non-alphanumerics; whitespace keeps case when asked
    assert(colTokens(TokenizerSpec("simple")) ==
      Seq("spark", "sql", "scans", "parquet", "fast"))
    assert(colTokens(TokenizerSpec("whitespace", lowerCase = false)) ==
      Seq("Spark-SQL", "scans", "Parquet", "FAST"))
    // raw keeps one token; max-token-length drops oversized tokens
    assert(colTokens(TokenizerSpec("raw")) == Seq("spark-sql scans  parquet fast"))
    assert(colTokens(TokenizerSpec("raw", maxTokenLength = 5)).isEmpty)
    // ngram: grams of the whole value; prefix-only anchors at position 1
    assert(colTokens(TokenizerSpec("ngram", minGram = 4, maxGram = 4)).take(3) ==
      Seq("spar", "park", "ark-"))
    assert(colTokens(TokenizerSpec("ngram", minGram = 4, maxGram = 5,
      prefixOnly = true)) == Seq("spar", "spark"))
    // query-side tokenization mirrors the build side for every kind
    for (spec <- Seq(TokenizerSpec(), TokenizerSpec("simple"),
        TokenizerSpec("whitespace", lowerCase = false), TokenizerSpec("raw"),
        TokenizerSpec("ngram", minGram = 4, maxGram = 4))) {
      assert(FullText.tokenizeQuery(text, spec).toSet ==
        colTokens(spec).toSet, spec.toString)
    }
    // jieba needs a segmentation dictionary: rejected loudly, never silent
    val ex = intercept[IllegalArgumentException] { TokenizerSpec("jieba") }
    assert(ex.getMessage.contains("jieba"), ex.getMessage)
    // option-spelling parser (the reference's full-text.* keys)
    val parsed = TokenizerSpec.fromOptions(Map(
      "full-text.tokenizer" -> "ngram", "full-text.ngram.min-gram" -> "2",
      "full-text.ngram.max-gram" -> "3", "full-text.lower-case" -> "false",
      "full-text.ngram.prefix-only" -> "true"))
    assert(parsed == TokenizerSpec("ngram", 2, 3, prefixOnly = true,
      lowerCase = false))
  }

  test("randomized tokenizer parity: column tokens == driver query tokens") {
    // the DSL's correctness hinges on query-side (driver Java) tokenization
    // producing EXACTLY the build-side (Spark SQL expression) tokens — a
    // divergence (split semantics, casing, offsets) silently empties search
    // results. Differential over random strings per tokenizer kind.
    import graft.pipeline.FullText
    import graft.pipeline.FullText.TokenizerSpec
    val rnd = new scala.util.Random(97)
    // CODE POINTS, not chars — the astral emoji is a surrogate pair and a
    // lone surrogate would be invalid UTF-16, not a tokenizer case
    val alphabet = Seq("a", "b", " ", "C", ".", ",", "-", "_", "\t", "\n",
      "X", "y", "z", "0", "9", " ", "é", "汉", "t", "a", " ", "😀")
    val strings = ((1 to 60).map { _ =>
      (0 until rnd.nextInt(24)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "   " :+ "one" :+ " lead trail " :+ "a😀b c").distinct
    val specs = Seq(TokenizerSpec(), TokenizerSpec("simple"),
      TokenizerSpec("whitespace"), TokenizerSpec("whitespace", lowerCase = false),
      TokenizerSpec("raw"), TokenizerSpec("ngram", minGram = 2, maxGram = 3),
      TokenizerSpec("ngram", minGram = 3, maxGram = 3, prefixOnly = true),
      TokenizerSpec("simple", maxTokenLength = 3))
    val df = strings.toDF("t")
    for (spec <- specs) {
      val colSide = df.select(col("t"),
        FullText.tokens(col("t"), spec).as("w")).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      strings.foreach { s =>
        val q = FullText.tokenizeQuery(s, spec)
        // tokenizeQuery dedups ngram QUERY grams (a query term set);
        // compare as multisets for the others, sets for ngram
        if (spec.kind == "ngram")
          assert(q.toSet == colSide(s).toSet,
            s"$spec on '$s': query=${q.toSet} column=${colSide(s).toSet}")
        else assert(q == colSide(s),
          s"$spec on '$s': query=$q column=${colSide(s)}")
      }
    }
  }

  test("full-text query DSL: operators, boolean, boost, fuzzy, phrase, slop") {
    import graft.pipeline.FullText
    import graft.pipeline.FullText._
    val corpus = Seq(
      (1L, "spark reads parquet fast and spark scans tables"),
      (2L, "parquet scans are fast"),
      (3L, "tables without the magic word"),
      (4L, "spark writes parquet slowly"),
      (5L, "fast spark fast parquet")).toDF("doc_id", "text")
    val spec = TokenizerSpec()
    val postings = FullText
      .buildPostings(corpus, "doc_id", "text", spec, withPositions = true)
      .persist()
    val s = PostingsDslScorer(postings, spec)
    def ids(json: String): Seq[Long] =
      evalDsl(parseDsl(json), s).orderBy(col("score").desc, col("doc_id"))
        .select("doc_id").as[Long].collect().toSeq
    // operator And requires every term; Or matches any
    assert(ids("""{"match":{"query":"spark parquet","operator":"And"}}""")
      .toSet == Set(1L, 4L, 5L))
    assert(ids("""{"match":{"query":"spark parquet"}}""")
      .toSet == Set(1L, 2L, 4L, 5L))
    // boolean must + must_not (object form AND the native queries-pair form)
    assert(ids("""{"boolean":{"must":[{"match":{"query":"parquet"}}],
      "must_not":[{"match":{"query":"fast"}}]}}""").toSet == Set(4L))
    assert(ids("""{"boolean":{"queries":[["Must",{"match":{"query":"parquet"}}],
      ["MustNot",{"match":{"query":"fast"}}]]}}""").toSet == Set(4L))
    // boost demotion: a negative match multiplies by negative_boost; a
    // non-matching doc keeps its exact positive score
    def scores(json: String): Map[Long, Double] =
      evalDsl(parseDsl(json), s).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val demoted = scores("""{"boost":{"positive":{"match":{"query":"parquet"}},
      "negative":{"match":{"query":"fast"}},"negative_boost":0.5}}""")
    val plain = scores("""{"match":{"query":"parquet"}}""")
    assert(math.abs(demoted(4L) - plain(4L)) < 1e-12, "no-negative doc unchanged")
    assert(math.abs(demoted(2L) - plain(2L) / 2) < 1e-12, "negative match halves")
    // match boost scales the contribution
    val doubled = scores("""{"match":{"query":"parquet","boost":2.0}}""")
    assert(math.abs(doubled(2L) - 2 * plain(2L)) < 1e-12)
    // fuzziness: 'spak' expands to 'spark' through the term dictionary
    assert(ids("""{"match":{"query":"spak","fuzziness":1}}""")
      .toSet == Set(1L, 4L, 5L))
    // AUTO fuzziness is length-dependent (0 for 1-2 chars, 1 for 3-5,
    // 2 for 6+): 'spak' (4) gets 1 edit and finds 'spark'; 'fa' (2) gets 0
    // edits so it does NOT match 'fast'; 'parqXXt' (7) gets 2 edits and
    // finds 'parquet'
    assert(parseDsl("""{"match":{"query":"x","fuzziness":"auto"}}""")
      .asInstanceOf[DslMatch].fuzziness == -1)
    assert(ids("""{"match":{"query":"spak","fuzziness":"auto"}}""")
      .toSet == Set(1L, 4L, 5L))
    assert(ids("""{"match":{"query":"fa","fuzziness":"auto"}}""").isEmpty)
    assert(ids("""{"match":{"query":"parqxxt","fuzziness":"auto"}}""")
      .toSet == Set(1L, 2L, 4L, 5L))
    // phrase: exact adjacency at slop 0; slop extends the window
    assert(ids("""{"match_phrase":{"query":"spark reads"}}""") == Seq(1L))
    assert(ids("""{"match_phrase":{"query":"spark parquet"}}""").isEmpty)
    // slop 1 admits one-word gaps: 'spark reads parquet' (1), 'spark writes
    // parquet' (4), 'spark fast parquet' (5)
    assert(ids("""{"match_phrase":{"query":"spark parquet","slop":1}}""")
      .toSet == Set(1L, 4L, 5L))
    // phrase frequency counts every occurrence: doc 1 has 'spark' twice but
    // 'spark reads' once — tf comes from position alignment, not term tf
    val phr = scores("""{"match_phrase":{"query":"spark reads"}}""")
    assert(phr.keySet == Set(1L))
    // a phrase against positions-less postings fails loudly
    val noPos = PostingsDslScorer(
      FullText.buildPostings(corpus, "doc_id", "text", spec), spec)
    val ex = intercept[Exception] {
      evalDsl(parseDsl("""{"match_phrase":{"query":"spark reads"}}"""), noPos)
        .collect() }
    assert(ex.getMessage.contains("with-position"), ex.getMessage)
    // unknown node types are rejected with the supported list
    val bad = intercept[IllegalArgumentException] { parseDsl("""{"nope":{}}""") }
    assert(bad.getMessage.contains("match | match_phrase"), bad.getMessage)
    // multi_match: parses with per-column boosts; column-wise union-sum of
    // per-column scorers (here: the same corpus serving both "columns")
    val mm = parseDsl("""{"multi_match":{"query":"parquet",
      "columns":["title","body"],"boosts":[2.0,1.0]}}""")
      .asInstanceOf[DslMultiMatch]
    assert(mm.columns == Seq("title", "body") && mm.boosts == Seq(2.0, 1.0))
    val fused = evalMultiMatch(mm, Seq(s, s)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == fused.keySet &&
      plain.forall { case (id, sc) => math.abs(fused(id) - 3 * sc) < 1e-12 },
      "2x + 1x of the same column = 3x the plain score")
    // single-scorer evaluation rejects it with routing guidance
    val mmErr = intercept[IllegalArgumentException] { evalDsl(mm, s) }
    assert(mmErr.getMessage.contains("one scorer per column"), mmErr.getMessage)
    postings.unpersist()
  }

  test("randomized DSL differential: evalDsl equals an independent scoring model") {
    // random query-DSL trees evaluated two ways: the DataFrame evaluator
    // (PostingsDslScorer) vs a from-scratch in-memory model that computes
    // BM25/phrase/boolean/boost semantics over plain Maps — same doc sets,
    // same scores to 1e-9, across 2 seeds x 25 trees incl. fuzzy and slop
    import graft.pipeline.FullText
    import graft.pipeline.FullText._
    val vocab = Vector("table", "scan", "merge", "fast", "slow", "spark",
      "row", "batch", "query", "join")
    for (seed <- Seq(5, 41)) {
      val rnd = new scala.util.Random(seed)
      val docsM: Map[Long, Vector[String]] = (0L until 60L).map { id =>
        id -> Vector.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
      }.toMap
      val corpus = docsM.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val spec = TokenizerSpec()
      val postings = FullText
        .buildPostings(corpus, "doc_id", "text", spec, withPositions = true)
        .persist()
      val scorer = PostingsDslScorer(postings, spec)
      // ---- the independent model ----
      val n = docsM.size
      val avgdl = docsM.values.map(_.size).sum.toDouble / n
      def dfOf(t: String) = docsM.count(_._2.contains(t))
      def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      def w(tf: Int, len: Int, df: Int) =
        idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      def modelMatch(m: DslMatch): Map[Long, Double] = {
        val base = m.query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
        def variants(t: String) =
          if (m.fuzziness <= 0) Seq(t)
          else (t +: vocab.filter(v => v != t && lev(v, t) <= m.fuzziness)).distinct
        def orScore(ts: Seq[String]): Map[Long, Double] =
          docsM.flatMap { case (id, ws) =>
            val sc = ts.distinct.collect {
              case t if ws.contains(t) => w(ws.count(_ == t), ws.size, dfOf(t))
            }.sum
            if (sc > 0) Some(id -> sc) else None
          }
        val frames =
          if (m.operator.equalsIgnoreCase("and") && base.length > 1)
            base.toSeq.map(t => orScore(variants(t)))
          else Seq(orScore(base.toSeq.flatMap(variants).distinct))
        val joined = frames.reduce { (a, b) =>
          a.keySet.intersect(b.keySet).map(k => k -> (a(k) + b(k))).toMap }
        joined.map { case (k, v) => k -> v * m.boost }
      }
      def modelPhrase(p: DslPhrase): Map[Long, Double] = {
        val ts = p.query.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (ts.length == 1) return modelMatch(DslMatch(p.query))
        val tfp = docsM.flatMap { case (id, ws) =>
          val c = ws.indices.count { s =>
            ws(s) == ts(0) && ts.indices.drop(1).forall(i =>
              (s + i to s + i + p.slop).exists(q =>
                q < ws.size && ws(q) == ts(i)))
          }
          if (c > 0) Some(id -> c) else None
        }
        val df = tfp.size
        tfp.map { case (id, c) => id -> w2(c, docsM(id).size, df) }
      }
      def w2(tfp: Int, len: Int, df: Int) =
        idf(df) * tfp * 2.2 / (tfp + 1.2 * (0.25 + 0.75 * len / avgdl))
      def model(q: Dsl): Map[Long, Double] = q match {
        case m: DslMatch => modelMatch(m)
        case p: DslPhrase => modelPhrase(p)
        case DslBool(must, should, mustNot) =>
          val base =
            if (must.nonEmpty) must.map(model).reduce { (a, b) =>
              a.keySet.intersect(b.keySet).map(k => k -> (a(k) + b(k))).toMap }
            else should.map(model).reduce { (a, b) =>
              (a.keySet ++ b.keySet).map(k =>
                k -> (a.getOrElse(k, 0.0) + b.getOrElse(k, 0.0))).toMap }
          val withSh =
            if (must.isEmpty) base
            else should.map(model).foldLeft(base) { (acc, sh) =>
              acc.map { case (k, v) => k -> (v + sh.getOrElse(k, 0.0)) } }
          val excluded = mustNot.map(model).flatMap(_.keySet).toSet
          withSh.filterNot { case (k, _) => excluded(k) }
        case DslBoost(pos, neg, nb) =>
          val negKeys = model(neg).keySet
          model(pos).map { case (k, v) =>
            k -> (if (negKeys(k)) v * nb else v) }
        case _: DslMultiMatch => throw new IllegalStateException("not generated")
      }
      // ---- random tree generator ----
      def word() = vocab(rnd.nextInt(vocab.size))
      def nearMiss() = { val t = word(); t.dropRight(1) + "x" }
      def leaf(): Dsl = rnd.nextInt(5) match {
        case 0 => DslMatch(s"${word()} ${word()}",
          if (rnd.nextBoolean()) "And" else "Or")
        case 1 => DslMatch(word(), boost = 1 + rnd.nextInt(3))
        case 2 => DslMatch(if (rnd.nextBoolean()) nearMiss() else word(),
          fuzziness = 1)
        case 3 => DslPhrase(s"${word()} ${word()}", slop = rnd.nextInt(2))
        case _ => DslMatch(s"${word()} ${word()} ${word()}")
      }
      def tree(): Dsl = rnd.nextInt(4) match {
        case 0 => leaf()
        case 1 => DslBool(Seq.fill(1 + rnd.nextInt(2))(leaf()),
          if (rnd.nextBoolean()) Seq(leaf()) else Nil,
          if (rnd.nextBoolean()) Seq(leaf()) else Nil)
        case 2 => DslBool(Nil, Seq.fill(1 + rnd.nextInt(2))(leaf()), Nil)
        case _ => DslBoost(leaf(), leaf(), 0.25 + rnd.nextDouble() / 2)
      }
      (1 to 25).foreach { i =>
        val q = tree()
        val got = evalDsl(q, scorer).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val want = model(q)
        assert(got.keySet == want.keySet,
          s"seed=$seed tree#$i $q:\nmissing=${want.keySet -- got.keySet} " +
            s"extra=${got.keySet -- want.keySet}")
        want.foreach { case (k, v) =>
          assert(math.abs(got(k) - v) < 1e-9,
            s"seed=$seed tree#$i $q doc=$k: got ${got(k)} want $v") }
      }
      postings.unpersist()
    }
  }

  test("simhash pairs: near-dups at small hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("native lang-score expression equals the relational form on adversarial inputs") {
    val rows = Seq(
      "THE the ThE\tand\nof  to",      // case + every ws kind + double space
      "  der die und das  ",            // leading/trailing ws
      "le,la et les",                   // punctuation glues tokens (no match for 'le,la')
      "the and",                   // NBSP is NOT regex-\s: one long token
      "thé der el y q que los und x",   // accents + mixed languages
      "", "   ", "a b c d e f g",       // empties and no-marker text
      "to to to to der",                // repeats
      "\u0000to el\u0000 a\u0000b")     // NUL is token CONTENT, not \s —
                                        // "\0to" must NOT alias marker "to"
      .toDF("text")
    val both = rows.select(
      TextOps.langScores(col("text")).as("n"),
      TextOps.langScoresRelational(col("text")).as("r"))
    assert(both.filter(col("n") =!= col("r")).isEmpty,
      both.filter(col("n") =!= col("r")).collect().mkString("; "))
    // null text → null struct on both forms
    val nulls = Seq[Option[String]](None).toDF("text").select(
      TextOps.langScores(col("text")).isNull.as("n"))
    assert(nulls.head().getBoolean(0))
    // and the plan stays inside whole-stage codegen (no UDF boundary) —
    // over a distributed frame (a local Seq constant-folds the projection)
    val dist = spark.range(100).select(concat(lit("the and x"), col("id")).as("text"))
    val plan = dist.select(TextOps.langScores(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not inside whole-stage codegen:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("langId classifies marker languages") {
    val got = docs.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(4L) == "de")
  }

  test("persisted full-text index: pruned term read matches in-memory bm25") {
    val loc = tmpLoc("ftidx")
    // larger corpus: distinct vocab ranges so term files separate
    val corpus = (1L to 200L).map { i =>
      (i, if (i % 7 == 0) s"alpha zulu shared w$i" else s"kilo mike w$i w${i + 1}")
    }.toDF("doc_id", "text")
    val idx = Indexes.buildFullText(spark, corpus, "doc_id", "text", loc)
    val expected = FullText.search(
      FullText.buildPostings(corpus, "doc_id", "text"), Seq("alpha", "zulu"), 5)
      .select("doc_id").as[Long].collect().toSet
    val got = Indexes.fullTextSearch(spark, loc, Seq("alpha", "zulu"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
    // manifest pruning: the two query terms touch fewer files than the table
    val total = idx.planFiles().size
    val pruned = idx.planFiles(filter = Some(col("term").isin("alpha", "zulu"))).size
    assert(pruned < total, s"pruned=$pruned total=$total")
    // the term-stats table is compacted at build: the per-query df point
    // read takes the RAW path — no MOR merge stage (window/exchange) in
    // the search hot path
    val dfPlan = GraftTable.load(spark, Indexes.termStatsLoc(loc))
      .read(filter = Some(col("term").isin("alpha", "zulu")))
      .queryExecution.executedPlan.toString
    assert(!dfPlan.contains("Window") && !dfPlan.contains("Exchange"),
      s"term-stats read still merges:\n$dfPlan")
  }

  test("incremental full-text maintenance: appends merge df deltas, no rebuild") {
    val locInc = tmpLoc("ftinc"); val locFull = tmpLoc("ftfull")
    val corpus = (1L to 300L).map { i =>
      (i, if (i % 7 == 0) s"alpha zulu shared w$i" else s"kilo mike w$i w${i + 1}")
    }.toDF("doc_id", "text")
    val (first, rest) = (corpus.filter($"doc_id" <= 150), corpus.filter($"doc_id" > 150))
    Indexes.buildFullText(spark, first, "doc_id", "text", locInc)
    Indexes.appendToFullText(spark, rest, "doc_id", "text", locInc)
    Indexes.buildFullText(spark, corpus, "doc_id", "text", locFull)
    def top(loc: String) = Indexes.fullTextSearch(spark, loc, Seq("alpha", "zulu"), 8)
      .select(col("doc_id"), round(col("score"), 6).as("s"))
    assertSameRows(top(locInc), top(locFull))
    // the appended-to df table merged (aggregation engine), not rewritten:
    // 'alpha' df equals the one-shot build's
    val dfInc = GraftTable.load(spark, Indexes.termStatsLoc(locInc))
      .read(filter = Some($"term" === "alpha")).select("df").as[Long].head()
    val dfFull = GraftTable.load(spark, Indexes.termStatsLoc(locFull))
      .read(filter = Some($"term" === "alpha")).select("df").as[Long].head()
    assert(dfInc == dfFull && dfInc == (1 to 300).count(_ % 7 == 0))
    // re-clustering restores term-range pruning over appended files
    Indexes.compactFullText(spark, locInc)
    val idx = GraftTable.load(spark, locInc)
    val pruned = idx.planFiles(filter = Some($"term".isin("alpha", "zulu"))).size
    assert(pruned < idx.planFiles().size)
    assertSameRows(top(locInc), top(locFull))
  }

  test("batched ANN (vector lateral): per-query top-k equals per-query brute force") {
    val n = 1000; val dim = 12
    val emb = spark.range(n).select(col("id").as("vid"),
      array((0 until dim).map(i => (rand(seed = 100 + i) * 2 - 1).cast("float")): _*)
        .as("emb")).repartition(8).cache()
    val queries = Seq(3L, 7L, 11L).map { q =>
      q -> emb.filter(col("vid") === q).select("emb").first().getSeq[Float](0)
    }
    val got = Similarity.batchTopK(emb, "vid", "emb", queries, 10)
      .select("qid", "vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.foreach { case (qid, v) =>
      val expected = Similarity.bruteForceTopK(emb, "emb", v, 10, "cosine", "s")
        .select("vid").as[Long].collect().toSeq
      assert(got(qid).toSet == expected.toSet, s"query $qid mismatch")
      assert(got(qid).size == 10 && got(qid).head == qid,
        s"query $qid should rank itself first")
    }
    // batched IVF route: full probe = exact, scan pruned to probed clusters
    val loc = tmpLoc("ivfbatch")
    Indexes.buildIvf(spark, emb, "emb", loc, nClusters = 4)
    val viaIvf = Indexes.ivfBatchSearch(spark, loc, "vid", "emb", queries, 10, nprobe = 4)
      .select("qid", "vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    queries.foreach { case (qid, _) =>
      assert(viaIvf(qid) == got(qid).toSet, s"ivf batch mismatch for $qid") }
    emb.unpersist()
  }

  test("batchTopKCols: carried columns survive the heaps — nulls, arrays, strings") {
    val n = 200; val dim = 6
    val emb = spark.range(n).select(col("id").as("vid"),
      array((0 until dim).map(i => (rand(seed = 40 + i) * 2 - 1).cast("float")): _*)
        .as("emb"),
      when(col("id") % 3 === 0, lit(null: String))
        .otherwise(concat(lit("t"), col("id"))).as("tag"),
      array(col("id"), col("id") * 2).as("pair")).cache()
    val queries = Seq(5L, 9L).map { q =>
      q -> emb.filter(col("vid") === q).select("emb").first().getSeq[Float](0)
    }
    val got = Similarity.batchTopKCols(emb, "vid", "emb", queries, 7,
      Seq("tag", "pair"))
    // ids + scores identical to the carry-free path
    assertSameRows(
      got.select(col("qid"), col("__id"), round(col("__score"), 6)),
      Similarity.batchTopK(emb, "vid", "emb", queries, 7)
        .select(col("qid"), col("vid"), round(col("__score"), 6)))
    // carried values are the hit rows' own (incl. null tags), never crossed
    val ref = emb.select(col("vid"), col("tag"), col("pair")).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getSeq[Long](2))).toMap
    got.select(col("__id"), col("__c_0"), col("__c_1")).collect().foreach { r =>
      val (tag, pair) = ref(r.getLong(0))
      assert(Option(r.getString(1)) == tag, s"tag mismatch for id ${r.getLong(0)}")
      assert(r.getSeq[Long](2) == pair, s"pair mismatch for id ${r.getLong(0)}")
    }
    emb.unpersist()
  }

  test("persisted IVF index: probe = partition pruning; full probe = exact") {
    val loc = tmpLoc("ivfidx")
    val rnd = new scala.util.Random(7)
    // two well-separated blobs
    val vecs = (1L to 100L).map { i =>
      val base = if (i % 2 == 0) 10.0f else -10.0f
      (i, Array.fill(8)(base + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    Indexes.buildIvf(spark, vecs, "embedding", loc, nClusters = 4)
    val q = vecs.filter($"vec_id" === 2).select("embedding").first().getSeq[Float](0)
    // nprobe=1 reads fewer files than the table holds
    val model = Indexes.loadIvfModel(spark, loc)
    val probes1 = model.nearestClusters(q, 1)
    val allFiles = GraftTable.load(spark, loc).planFiles().size
    assert(Indexes.ivfPlannedFiles(spark, loc, probes1) < allFiles)
    // full probe equals brute force
    val exact = Similarity.bruteForceTopK(vecs, "embedding", q, 5, "cosine", "s")
      .select("vec_id").as[Long].collect().toSeq
    val viaIdx = Indexes.ivfSearch(spark, loc, "embedding", q, 5, nprobe = 4,
      scoreCol = "s").select("vec_id").as[Long].collect().toSeq
    assert(viaIdx == exact)
    // nprobe=1 still finds same-blob neighbors
    val near = Indexes.ivfSearch(spark, loc, "embedding", q, 5, nprobe = 1,
      scoreCol = "s").select("vec_id").as[Long].collect().toSeq
    assert(near.forall(_ % 2 == 0))
  }

  test("hybrid rankers: weighted_score and mrr fuse sanely") {
    val a = Seq((1L, 10.0, 1), (2L, 5.0, 2)).toDF("id", "score", "rank")
    val b = Seq((2L, 0.9, 1), (3L, 0.5, 2)).toDF("id", "score", "rank")
    val w = FullText.weightedFuse(a, b, "id", "score").as[(Long, Double)].collect().toMap
    assert(w(2L) > w(1L) || w(2L) > w(3L)) // shared id benefits from both sides
    val m = FullText.mrrFuse(a, b, "id").as[(Long, Double)].collect().toMap
    assert(m(2L) == 1.0 / 2 + 1.0 && m(1L) == 1.0)
  }

  test("pii redaction scrubs emails/phones/ips; counts match; clean text untouched") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or call 415-555-0142 from 10.1.2.3"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io and ip 192.168.0.1")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextOps.redactPii(col("text")).as("red"),
      TextOps.piiCounts(col("text")).as("c")).collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) == "mail me at <EMAIL> or call <PHONE> from <IP>")
    assert(out(0).getStruct(2).toSeq == Seq(1L, 1L, 1L))
    assert(out(1).getString(1) == "no pii here at all")
    assert(out(2).getString(1) == "two mails <EMAIL> <EMAIL> and ip <IP>")
    assert(out(2).getStruct(2).toSeq == Seq(2L, 0L, 1L))
  }

  test("domain extraction + registered domain + hash split are stable") {
    val df = Seq("https://a.b.example.com/x?q=1", "http://cdn-7.net/p",
      "www.site.org", "bare.io:8080/z").toDF("url")
    val hosts = df.select(TextOps.registeredDomain(
      TextOps.extractDomain(col("url"))).as("d")).as[String].collect().toSeq
    assert(hosts == Seq("example.com", "cdn-7.net", "site.org", "bare.io"))
    // split assignment: deterministic, and roughly proportional on 10k keys
    val ids = spark.range(10000).select(TextOps.splitAssign(col("id"), 90, 5).as("s"))
    val counts = ids.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 8500 && counts("val") > 250 && counts("test") > 250)
    // re-evaluation gives identical assignment (pure function of the key)
    assert(ids.distinct().count() == 3)
  }

  test("gopher rules: prose passes, degenerate docs fail for the right reason") {
    val prose = ("the project is a story about a fox and a dog that " * 5).trim
    val df = Seq(
      (1L, prose),                                  // passes all rules
      (2L, "x " * 40),                              // mean word len < 3
      (3L, ("#tag " * 40).trim),                    // symbol ratio + no stopwords
      (4L, Seq.fill(30)("- item").mkString("\n"))   // bullet lines
    ).toDF("id", "text")
    val res = df.select(col("id"), TextOps.gopherSignals(col("text")).as("g"))
      .select(col("id"), TextOps.gopherPass(col("g"), 20, 100000).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(res(1L) && !res(2L) && !res(3L) && !res(4L))
  }

  test("ngram repetition + paragraph dedup quantify duplication") {
    val rep = Dedup.ngramRepetition(
      Seq((1L, "ab cd ab cd ab cd"), (2L, "all words here are unique now"))
        .toDF("id", "text"), "id", "text", 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // doc 1: "ab cd" occurs 3x of 5 bigrams; "cd ab" 2x — all bigrams dup'd
    assert(rep(1L)._1 > rep(2L)._1 && rep(1L)._2 > 0.8)
    assert(rep(2L)._2 == 0.0)
    val paras = Dedup.dedupParagraphs(
      Seq((1L, "alpha\ncommon footer"), (2L, "beta\ncommon footer"),
        (3L, "alpha\nunique tail")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(paras(1L) == (2L, 2L))  // first occurrence of both paras
    assert(paras(2L) == (2L, 1L))  // footer already seen in doc 1
    assert(paras(3L) == (2L, 1L))  // "alpha" already seen in doc 1
  }

  test("blob store: out-of-line payloads round-trip through descriptors") {
    val dir = java.nio.file.Files.createTempDirectory("blobtest").toString
    val df = (1L to 50L).map(i => (i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8")))
      .toDF("id", "blob").repartition(4)
    val withDesc = Blob.writeBlobs(df, "blob", dir).cache()
    assert(withDesc.schema("blob").dataType == Blob.descriptorType)
    val back = withDesc
      .withColumn("bytes", Blob.readBlob(spark)(col("blob")))
      .select(col("id"), expr("cast(bytes as string)").as("s"))
      .as[(Long, String)].collect().toMap
    (1L to 50L).foreach(i => assert(back(i) == s"payload-$i-${"x" * i.toInt}"))
    // fewer blob files than rows (task-level packing, no per-blob small files)
    val blobFiles = new java.io.File(dir).listFiles().count(_.getName.startsWith("blob-"))
    assert(blobFiles <= 4 && blobFiles >= 1, s"got $blobFiles blob files")
    // decode stub runs over descriptors (real plumbing, fake codec)
    val meta = withDesc.withColumn("bytes", Blob.readBlob(spark)(col("blob")))
      .withColumn("img", Blob.fakeDecodeImage(col("bytes")))
      .select("img.width", "img.height", "img.format").collect()
    assert(meta.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }

  test("bm25 ranks the matching doc first; hybrid rrf fuses") {
    val postings = FullText.buildPostings(docs, "doc_id", "text")
    val top = FullText.search(postings, Seq("spark", "columnar"), 2)
      .select("doc_id").as[Long].collect()
    assert(top.head == 3L)
    val textR = FullText.ranked(FullText.search(postings, Seq("spark"), 10), "doc_id", "score")
    val vecR = textR // self-fusion sanity: fused rank must keep doc 3 first
    val fused = FullText.rrfFuse(textR, vecR, "doc_id")
      .orderBy(col("rrf").desc).select("id").as[Long].collect()
    assert(fused.head == 3L)
  }

  test("ivf topk equals brute force at full nprobe") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.0f, 0.0f, 1.0f)),
      (5L, Array(0.5f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq(1.0f, 0.05f, 0.0f)
    val brute = Similarity.bruteForceTopK(emb, "embedding", q, 3, "cosine")
      .select("vec_id").as[Long].collect().toSeq
    val model = Similarity.trainIvf(emb, "embedding", 2)
    val indexed = emb.withColumn("c", model.assignExpr(col("embedding")))
    val ivf = Similarity.ivfTopK(indexed, model, "embedding", "c", q, 3, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(brute == ivf)
  }

  test("consumers: batch consumption advances cursor; procedures dispatch") {
    val loc = tmpLoc("consumer")
    val src = Seq((1L, "a", 1.0, "d1"), (2L, "b", 2.0, "d1")).toDF("k", "s", "p", "dt")
    val t = GraftTable.create(spark, loc, src.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    t.write(src)
    val (end1, b1) = Consumers.nextBatch(t, "c1").get
    assert(b1.count() == 2); Consumers.commit(t, "c1", end1)
    assert(Consumers.nextBatch(t, "c1").isEmpty)
    t.write(Seq((3L, "c", 3.0, "d1")).toDF("k", "s", "p", "dt"))
    val (end2, b2) = Consumers.nextBatch(t, "c1").get
    assert(b2.count() == 1); Consumers.commit(t, "c1", end2)

    val r = Procedures.call(spark, t, "compact")
    assert(r.head().getString(0).contains("compacted"))
    Procedures.call(spark, t, "create_tag", Map("tag" -> "pt"))
    assert(t.sm.listTags().exists(_.name == "pt"))
    Procedures.call(spark, t, "expire_snapshots", Map("retain_last" -> "1"))
    assert(t.read().count() == 3)
  }

  test("copy into round-trips csv") {
    val loc = tmpLoc("copyin")
    val out = tmpLoc("copyout")
    val src = Seq((1L, "x", 5.0, "d1")).toDF("k", "s", "p", "dt")
    val t = GraftTable.create(spark, loc, src.schema, TableConfig())
    t.write(src)
    CopyInto.copyOut(t, out, "csv", Map("header" -> "true"))
    val t2 = GraftTable.create(spark, tmpLoc("copy2"), src.schema, TableConfig())
    CopyInto.copyIn(spark, t2, out, "csv", Map("header" -> "true"))
    assertSameRows(t2.read(), src)
  }

  test("copy into round-trips avro (engine FileFormat as interchange)") {
    val out = tmpLoc("copyout-avro")
    val src = Seq((1L, "x", 5.0), (2L, "y", 6.5)).toDF("k", "s", "p")
    val t = GraftTable.create(spark, tmpLoc("copyin-avro"), src.schema, TableConfig())
    t.write(src)
    CopyInto.copyOut(t, out, "avro")
    val t2 = GraftTable.create(spark, tmpLoc("copy2-avro"), src.schema, TableConfig())
    CopyInto.copyIn(spark, t2, out, "avro")
    assertSameRows(t2.read(), src)
  }

  test("stream-static lookup join enriches a micro-batch against a table") {
    val loc = tmpLoc("lkj")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val t = GraftTable.create(spark, loc, dim.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    t.write(dim)
    // paimon lookup join ≙ stream-static join re-resolved per micro-batch
    val facts = Seq((1L, 10.0), (2L, 20.0), (1L, 30.0)).toDF("k", "amt")
    val joined = facts.join(t.read(), Seq("k"), "left")
    assert(joined.filter(col("tier") === "gold").count() == 2)
  }
}

class StatsWatermarkSpec extends SparkTestBase {
  import spark.implicits._

  test("watermarks persist, carry forward, and time-travel") {
    val loc = tmpLoc("wm")
    val src = Seq((1L, "a")).toDF("k", "s")
    val t = GraftTable.create(spark, loc, src.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    t.write(src, watermark = Some(1000L))
    t.write(Seq((2L, "b")).toDF("k", "s")) // no watermark → carries 1000
    t.write(Seq((3L, "c")).toDF("k", "s"), watermark = Some(2000L))
    assert(t.sm.readSnapshot(2).watermarkLong.contains(1000L))
    // reference laterOrEqualWatermark: EARLIEST snapshot whose wm >= value
    assert(t.readWatermark(1000L).count() == 1) // snapshot 1 (wm 1000)
    assert(t.readWatermark(1500L).count() == 3) // snapshot 3 first reaches 1500
    assert(t.readWatermark(2000L).count() == 3)
    intercept[Exception] { t.readWatermark(9999L) }
    val r = Procedures.call(spark, t, "rollback_to_watermark", Map("watermark" -> "1500"))
    assert(r.head().getString(0).contains("rolled back"))
    assert(t.read().count() == 2)
  }

  test("batched feature extraction + frame sampling + resize plumbing") {
    import graft.pipeline.Blob
    val df = (1 to 150).map(i => (i.toLong, Array.fill(100 + i)(i.toByte)))
      .toDF("id", "payload")
    // mapPartitions batch shape: every row gets a dim-8 vector, deterministic
    val feats = Blob.extractFeatures(df, "payload", dim = 8, batchSize = 32)
    assert(feats.count() == 150)
    val f1 = feats.filter(col("id") === 1L).select("features").head().getSeq[Float](0)
    assert(f1.length == 8)
    val f1again = Blob.extractFeatures(df, "payload", 8, batchSize = 7)
      .filter(col("id") === 1L).select("features").head().getSeq[Float](0)
    assert(f1 == f1again, "features must not depend on batch boundaries")
    // frame sampling: stride 64, frame 32 → ceil(len/64) frames, last partial
    val frames = df.select(col("id"),
      explode(Blob.sampleFrames(col("payload"), 64, 32)).as("f"))
    val n101 = frames.filter(col("id") === 1L).count() // len 101 → 2 frames
    assert(n101 == 2, s"got $n101")
    val lens = frames.filter(col("id") === 1L)
      .select(length(col("f.frame"))).as[Int].collect().sorted.toSeq
    assert(lens == Seq(32, 32)) // offsets 0 and 64 both have ≥32 bytes left
    // resize stub halves the payload
    assert(df.select(length(Blob.fakeResize(col("payload"), 50)))
      .as[Int].head() == 50)
  }

  test("chunkDocs: window boundaries, overlap, and contained-tail suppression") {
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "a b c"),               // shorter than one chunk
      (3L, "")                     // empty → one empty chunk
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkDocs(d, "text", chunkTokens = 4, overlap = 2)
      .select("doc_id", "__chunk", "__n_tok", "__chunk_text")
      .as[(Long, Int, Int, String)].collect().groupBy(_._1)
    // doc 1: starts 0,2,4,6,8 → but start 8 has 8+2 = n → NOT emitted
    val c1 = out(1L).sortBy(_._2)
    assert(c1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(c1.head._4 == "a b c d" && c1(1)._4 == "c d e f")
    assert(c1.last._4 == "g h i j" && c1.last._3 == 4)
    assert(out(2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(out(3L).head._3 == 1) // [""] tokenization, same as the oracle's
  }

  test("sessionize: gap boundary is strict (> gap starts a session)") {
    import java.sql.Timestamp
    val base = 1700000000000L
    val ev = Seq(
      (1L, 10L, new Timestamp(base)),
      (1L, 11L, new Timestamp(base + 1800000L)), // exactly gap → same session
      (1L, 12L, new Timestamp(base + 3600001L)), // gap+1 → new session
      (2L, 20L, new Timestamp(base))
    ).toDF("user_id", "event_id", "ts")
    val s = Events.sessionize(ev, col("user_id"), col("ts"), 1800000L, col("event_id"))
      .select("user_id", "event_id", "__session")
      .as[(Long, Long, Long)].collect().toSet
    assert(s == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L), (2L, 20L, 1L)))
  }

  test("funnel: min-over-filtered recurrence, same-ms steps count") {
    import java.sql.Timestamp
    val base = 1700000000000L
    val ev = Seq(
      // user 1: full funnel, click at the SAME ms as view (>= bound counts)
      (1L, new Timestamp(base), "view"), (1L, new Timestamp(base), "click"),
      (1L, new Timestamp(base + 10), "purchase"),
      // user 2: purchase BEFORE view → depth 1 only
      (2L, new Timestamp(base), "purchase"), (2L, new Timestamp(base + 10), "view"),
      // user 3: no view at all → depth 0 even with later steps present
      (3L, new Timestamp(base), "click"), (3L, new Timestamp(base + 10), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val d = Events.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 3, 2L -> 1, 3L -> 0))
  }

  test("kmeansAssign: every row lands on its max-cosine centroid; ties to smallest cid") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)),
      (5L, Array(1f, 1f)) // equidistant from both axis vectors → smaller cid
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 2, seed = 1)
      .select("vec_id", "__cluster").as[(Long, Long)].collect().toMap
    // replicate the selection + assignment locally (portable md5-prefix hash)
    val vecs = Map(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(0.9f, 0.1f),
      4L -> Seq(0.1f, 0.9f), 5L -> Seq(1f, 1f))
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("1" + s).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val cents = vecs.keys.toSeq.sortBy(id => (h32(id.toString), id)).take(2)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val n = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)
      if (n == 0.0) 0.0 else d / n
    }
    val expected = vecs.map { case (id, v) =>
      id -> cents.map(c => (cos(v, vecs(c)), c))
        .maxBy { case (s, c) => (s, -c) }._2
    }
    assert(out == expected)
  }

  test("incremental dedup: admits fresh fingerprints once, idempotent on re-run") {
    val state = GraftTable.create(spark, tmpLoc("idstate"),
      new org.apache.spark.sql.types.StructType()
        .add("fp", "string").add("first_id", "long"),
      TableConfig(primaryKeys = Seq("fp"), numBuckets = 2))
    val wave1 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val a1 = Dedup.incrementalDedup(state, wave1, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(a1 == Set(1L, 2L))
    // wave 2: one known text (normalized-equal), one batch-internal dup,
    // one fresh
    val wave2 = Seq(
      (10L, "  ALPHA   beta "), // fingerprint-equal to doc 1 → rejected
      (11L, "epsilon zeta"), (12L, "epsilon zeta"), // keep-first within batch
      (13L, "eta theta")
    ).toDF("doc_id", "text")
    val a2 = Dedup.incrementalDedup(state, wave2, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(a2 == Set(11L, 13L))
    // replay of wave 2 admits nothing; state has exactly 4 fingerprints
    assert(Dedup.incrementalDedup(state, wave2, "doc_id", "text").isEmpty)
    assert(state.read().count() == 4)
  }

  test("analyze produces column statistics") {
    val loc = tmpLoc("an")
    val src = Seq((1L, "a"), (2L, "a"), (3L, Option.empty[String].orNull)).toDF("k", "s")
    val t = GraftTable.create(spark, loc, src.schema, TableConfig())
    t.write(src)
    val stats = t.analyze().collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("k")._1 == 3 && stats("s")._2 == 1)
    assert(t.systemTable("statistics").head().getString(0).contains("mergedRecordCount"))
  }
}
