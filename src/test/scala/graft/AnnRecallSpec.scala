package graft

import graft.core._
import graft.pipeline.{Indexes, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Recall harness for the approximate ANN paths (SURVEY §7 "document recall
  * targets"): recall@10 of IVF vs nprobe and PQ(+rerank) vs m against exact
  * brute-force cosine on a seeded 50k-vector clustered corpus — the
  * realistic shape for IVF (mixture of gaussians; embeddings of natural
  * corpora cluster, uniform noise does not). Asserts the DOCUMENTED
  * defaults hit ≥0.9; the sweep table is recorded in README.md. */
class AnnRecallSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val nVectors = 50000
  private val nCenters = 64
  private val nQueries = 10
  private val k = 10

  /** Seeded clustered corpus: vector = center(id % centers) + N(0, 0.5).
    * σ=0.5 vs inter-center distance ≈3.3 gives GRADED neighborhoods
    * (overlapping clusters, distinguishable ranks) — the embedding-corpus
    * regime, where recall is a meaningful metric; σ→0 would make every
    * cluster-mate equidistant and recall@10 noise. */
  private val sigma = 0.5
  private lazy val centers = {
    val rnd = new scala.util.Random(42)
    Array.fill(nCenters, dim)((rnd.nextDouble() * 2 - 1).toFloat)
  }
  private lazy val corpus = {
    val rnd = new scala.util.Random(43)
    val rows = (0 until nVectors).map { i =>
      val c = centers(i % nCenters)
      Row(i.toLong, c.map(x => x + (rnd.nextGaussian() * sigma).toFloat).toSeq)
    }
    val schema = StructType(Seq(StructField("vid", LongType, false),
      StructField("emb", ArrayType(FloatType, false), false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
      .persist()
  }

  /** Queries are fresh draws from the same mixture (a "new document"). */
  private lazy val queries: Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(7)
    (0 until nQueries).map { i =>
      val c = centers((i * 13) % nCenters)
      c.map(x => x + (rnd.nextGaussian() * sigma).toFloat).toSeq
    }
  }

  private def exactTop(q: Seq[Float]): Set[Long] =
    Similarity.bruteForceTopK(corpus, "emb", q, k)
      .select("vid").as[Long].collect().toSet

  private def recall(approx: Seq[Set[Long]], exact: Seq[Set[Long]]): Double =
    approx.zip(exact).map { case (a, e) => a.intersect(e).size.toDouble / k }
      .sum / approx.size

  test("IVF recall@10 sweep over nprobe; default nprobe=8 reaches 0.9") {
    val loc = tmpLoc("ivf-recall")
    Indexes.buildIvf(spark, corpus, "emb", loc, nClusters = nCenters, seed = 42L)
    val exact = queries.map(exactTop)
    val sweep = Seq(1, 2, 4, 8).map { nprobe =>
      val got = queries.map(q =>
        Indexes.ivfSearch(spark, loc, "emb", q, k, nprobe)
          .select("vid").as[Long].collect().toSet)
      nprobe -> recall(got, exact)
    }
    info(sweep.map { case (p, r) => f"nprobe=$p%d recall@10=$r%.3f" }.mkString("  "))
    // recall is non-decreasing in nprobe and the documented default passes
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 0.02, s"recall dropped along the sweep: $sweep") }
    val atDefault = sweep.toMap.apply(8)
    assert(atDefault >= 0.9, f"recall@10 at nprobe=8 was $atDefault%.3f: $sweep")
  }

  test("PQ recall@10 sweep over m; default m=8 with rerank reaches 0.9") {
    val exact = queries.map(exactTop)
    val sweep = Seq(4, 8).map { m =>
      // documented defaults: ks=64 centroids/subspace (6-bit codes; ks=16
      // leaves m=8 at ~0.87 on this corpus), rerank = 10·k
      val model = Similarity.trainPq(corpus, "emb", dim, m = m, ks = 64,
        sampleFraction = 0.2, seed = 42L)
      val encoded = corpus.withColumn("codes", model.encodeUdf(col("emb"))).persist()
      encoded.count()
      // documented default: rerank = 10·k exact rescores from the ADC
      // candidate list (the scan is still over m-byte codes)
      val got = queries.map(q =>
        Similarity.pqTopK(encoded, "emb", "codes", model, q, k, rerank = 10 * k)
          .select("vid").as[Long].collect().toSet)
      encoded.unpersist()
      m -> recall(got, exact)
    }
    info(sweep.map { case (m, r) => f"m=$m%d recall@10=$r%.3f" }.mkString("  "))
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 0.02, s"recall dropped as m grew: $sweep") }
    val atDefault = sweep.toMap.apply(8)
    assert(atDefault >= 0.9, f"recall@10 at m=8 was $atDefault%.3f: $sweep")
  }

  test("IVF-RQ recall@10 sweep over nprobe; default nprobe=8 + rerank reaches 0.9") {
    // residual quantization: same m=8 code budget as the PQ sweep but only
    // ks=16 centroids/subspace (4-bit-equivalent) — residual variance is a
    // fraction of raw variance, so the smaller codebook suffices
    val loc = tmpLoc("ivf-rq-recall")
    Indexes.buildIvfRq(spark, corpus, "emb", loc, dim, nClusters = nCenters,
      m = 8, ks = 16, sampleFraction = 0.2, seed = 42L)
    val exact = queries.map(exactTop)
    val sweep = Seq(2, 4, 8).map { nprobe =>
      val got = queries.map(q =>
        Indexes.rqSearch(spark, loc, "emb", q, k, nprobe, rerank = 10 * k)
          .select("vid").as[Long].collect().toSet)
      nprobe -> recall(got, exact)
    }
    info(sweep.map { case (p, r) => f"nprobe=$p%d recall@10=$r%.3f" }.mkString("  "))
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 0.02, s"recall dropped along the sweep: $sweep") }
    val atDefault = sweep.toMap.apply(8)
    assert(atDefault >= 0.9, f"recall@10 at nprobe=8 was $atDefault%.3f: $sweep")
    // scale posture: a probe is manifest-level partition pruning — nprobe=2
    // of 64 clusters must plan a small fraction of the index's files
    val model = Indexes.loadRqModel(spark, loc)
    val all = Indexes.ivfPlannedFiles(spark, loc, 0 until nCenters)
    val probed = Indexes.ivfPlannedFiles(spark, loc,
      model.nearestClusters(queries.head, 2))
    info(s"planned files: nprobe=2 -> $probed of $all")
    assert(probed <= all / 8, s"probe must prune files: $probed of $all")
    // metric parameter on the RQ route: the exact re-rank honors l2 —
    // candidates still rank in unit space (the unit-sphere cosine and l2
    // orders coincide), the rerank window absorbs raw-norm differences
    val exactL2 = queries.map(q =>
      Similarity.bruteForceTopK(corpus, "emb", q, k, "l2")
        .select("vid").as[Long].collect().toSet)
    // a wider rerank window than the cosine sweep (20k vs 10k): the ADC
    // candidate order is unit-space, so raw-norm outliers sit deeper in it
    val gotL2 = queries.map(q =>
      Indexes.rqSearch(spark, loc, "emb", q, k, nprobe = 8, rerank = 20 * k,
          metric = "l2")
        .select("vid").as[Long].collect().toSet)
    val rL2 = recall(gotL2, exactL2)
    info(f"l2 recall@10 at nprobe=8: $rL2%.3f")
    assert(rL2 >= 0.9, f"l2 RQ-route recall@10 was $rL2%.3f")
  }

  test("refine_factor: recall@10 strictly improves from factor 1 to 4 on " +
      "the compressed RQ route (the reference's recall/latency dial)") {
    val loc = tmpLoc("rq-refine")
    Indexes.buildIvfRq(spark, corpus, "emb", loc, dim, nClusters = nCenters,
      m = 8, ks = 16, sampleFraction = 0.2, seed = 42L)
    val exact = queries.map(exactTop)
    // factor f = rerank window k×f (SearchOptions.rerankFor — the same
    // mapping the TVF options surface uses); factor 1 STILL exact-reranks
    // the k ADC candidates (reference vector.mdx:296-298)
    def got(factor: Int): Seq[Set[Long]] = {
      val rerank = Indexes.SearchOptions(refineFactor = Some(factor)).rerankFor(k)
      queries.map(q =>
        Indexes.rqSearch(spark, loc, "emb", q, k, nprobe = 8, rerank = rerank)
          .select("vid").as[Long].collect().toSet)
    }
    val r1 = recall(got(1), exact)
    val r4 = recall(got(4), exact)
    info(f"refine_factor=1 recall@10=$r1%.3f  refine_factor=4 recall@10=$r4%.3f")
    assert(r4 > r1,
      f"refine_factor=4 must beat factor=1: $r4%.3f vs $r1%.3f")
    assert(r4 >= 0.85, f"refine_factor=4 recall@10 was $r4%.3f")
  }

  test("per-query search options: spellings, prefixes, validation, auto nprobe") {
    import Indexes.SearchOptions
    // both separators, underscore/hyphen names, ivf-family prefixes
    assert(SearchOptions.parse("ivf.nprobe=16,ivf.refine_factor=4") ==
      SearchOptions(Some(16), Some(4)))
    assert(SearchOptions.parse("ivf.nprobe=16;ivf.refine-factor=4") ==
      SearchOptions(Some(16), Some(4)))
    assert(SearchOptions.parse("rerank_factor=2") == SearchOptions(None, Some(2)))
    assert(SearchOptions.parse("ivf-pq.refine-factor=3").refineFactor.contains(3))
    assert(SearchOptions.parse("IVF_RQ.RERANK-FACTOR=5").refineFactor.contains(5))
    assert(SearchOptions.parse("nprobe=4") == SearchOptions(Some(4), None))
    assert(SearchOptions.parse("") == SearchOptions.empty)
    assert(SearchOptions.parse(" ivf.nprobe = 8 ") == SearchOptions(Some(8), None))
    // rerank window mapping (reference VectorSearchRefineOptions.searchLimit)
    assert(SearchOptions(refineFactor = Some(4)).rerankFor(10) == 40)
    assert(SearchOptions.empty.rerankFor(10) == 0)
    // loud failures: unknown keys/prefixes, malformed pairs, bad values
    intercept[IllegalArgumentException](SearchOptions.parse("diskann.l_search=100"))
    intercept[IllegalArgumentException](SearchOptions.parse("typo_factor=2"))
    intercept[IllegalArgumentException](SearchOptions.parse("ivf.nprobe"))
    intercept[IllegalArgumentException](SearchOptions.parse("ivf.nprobe=0"))
    intercept[IllegalArgumentException](SearchOptions.parse("ivf.refine_factor=-1"))
    // automatic probe width: √nClusters, k-scaled, clamped to the index
    assert(Indexes.autoNprobe(64, 10) == 8)
    assert(Indexes.autoNprobe(8, 10) == 3)
    assert(Indexes.autoNprobe(4, 1000) == 4)
    assert(Indexes.autoNprobe(1024, 1000) == 63)
  }

  test("es-index filtered recall@10 across filter selectivities; starved case exact") {
    // EsIndex filtered vector search: recall@10 vs EXACT filtered brute force
    // at filter selectivities 50% / 10% / 1% (filter independent of the
    // embedding — the adversarial case for probe pruning, since survivors
    // spread across all clusters). Default nprobe=8 of 64 must hold ≥0.9 at
    // every selectivity; progressive escalation only widens starved probes.
    import graft.pipeline.EsIndex
    val loc = tmpLoc("es-filtered-recall")
    EsIndex.build(spark, corpus.withColumn("pct", (col("vid") % 100).cast("int")),
      "vid", loc, embedCol = Some("emb"), nClusters = nCenters, seed = 42L)
    val sweep = Seq(50, 10, 1).map { cut =>
      val exact = queries.map(q =>
        Similarity.bruteForceTopK(corpus.filter(col("vid") % 100 < cut),
            "emb", q, k)
          .select("vid").as[Long].collect().toSet)
      val got = queries.map(q =>
        EsIndex.search(spark, loc, k, vector = Some(q),
            filter = Some(col("pct") < cut), nprobe = 8)
          .select("vid").as[Long].collect().toSet)
      cut -> recall(got, exact)
    }
    info(sweep.map { case (c, r) => f"sel=$c%d%% recall@10=$r%.3f" }.mkString("  "))
    sweep.foreach { case (c, r) =>
      assert(r >= 0.9, f"filtered recall@10 at $c%% selectivity was $r%.3f: $sweep") }
    // ultra-selective starved case: 10 survivors corpus-wide — the probe can
    // never fill k, so the ladder must end exact and recall is 1.0
    val starvedExact = queries.map(q =>
      Similarity.bruteForceTopK(corpus.filter(col("vid") % 5000 === 0), "emb", q, k)
        .select("vid").as[Long].collect().toSet)
    val starvedGot = queries.map { q =>
      val (df, effNp) = EsIndex.searchDetail(spark, loc, k, vector = Some(q),
        filter = Some(col("vid") % 5000 === 0), nprobe = 8)
      assert(effNp == nCenters, s"starved filter must end exact, got nprobe=$effNp")
      df.select("vid").as[Long].collect().toSet
    }
    val rStarved = recall(starvedGot, starvedExact)
    info(f"starved (10 survivors) recall@10=$rStarved%.3f")
    assert(rStarved == 1.0, f"escalation must make the starved case exact: $rStarved%.3f")
  }

  test("plain IVF filtered recall@10 across filter selectivities; starved case exact") {
    // same grid as the es-index sweep but through the PLAIN persisted index
    // route (Indexes.ivfSearch with a filter) — the escalation ladder is
    // SHARED (Indexes.escalateNprobe), so the recall contract must hold
    // identically without building a composite index
    val loc = tmpLoc("ivf-filtered-recall")
    Indexes.buildIvf(spark,
      corpus.withColumn("pct", (col("vid") % 100).cast("int")),
      "emb", loc, nClusters = nCenters, seed = 42L)
    val sweep = Seq(50, 10, 1).map { cut =>
      val exact = queries.map(q =>
        Similarity.bruteForceTopK(corpus.filter(col("vid") % 100 < cut),
            "emb", q, k)
          .select("vid").as[Long].collect().toSet)
      val got = queries.map(q =>
        Indexes.ivfSearch(spark, loc, "emb", q, k, nprobe = 8,
            filter = Some(col("pct") < cut))
          .select("vid").as[Long].collect().toSet)
      cut -> recall(got, exact)
    }
    info(sweep.map { case (c, r) => f"sel=$c%d%% recall@10=$r%.3f" }.mkString("  "))
    sweep.foreach { case (c, r) =>
      assert(r >= 0.9, f"filtered recall@10 at $c%% selectivity was $r%.3f: $sweep") }
    // starved filter (10 survivors corpus-wide): the shared ladder must end
    // exact, so recall is 1.0 by construction
    val starvedExact = queries.map(q =>
      Similarity.bruteForceTopK(corpus.filter(col("vid") % 5000 === 0), "emb", q, k)
        .select("vid").as[Long].collect().toSet)
    val starvedGot = queries.map(q =>
      Indexes.ivfSearch(spark, loc, "emb", q, k, nprobe = 8,
          filter = Some(col("vid") % 5000 === 0))
        .select("vid").as[Long].collect().toSet)
    val rStarved = recall(starvedGot, starvedExact)
    info(f"starved (10 survivors) plain-route recall@10=$rStarved%.3f")
    assert(rStarved == 1.0, f"shared ladder must make the starved case exact: $rStarved%.3f")
    // filtered RQ search shares the same ladder — spot-check one starved query
    val rqLoc = tmpLoc("rq-filtered-recall")
    Indexes.buildIvfRq(spark,
      corpus.withColumn("pct", (col("vid") % 100).cast("int")), "emb", rqLoc,
      dim, nClusters = nCenters, m = 8, ks = 16, sampleFraction = 0.2, seed = 42L)
    val rqGot = Indexes.rqSearch(spark, rqLoc, "emb", queries.head, k,
        nprobe = 8, rerank = 10 * k, filter = Some(col("vid") % 5000 === 0))
      .select("vid").as[Long].collect().toSet
    assert(rqGot == starvedExact.head,
      s"starved filtered RQ search must be exact: got $rqGot, want ${starvedExact.head}")
  }

  test("probe restriction flips from IN-list to broadcast join past inListMax; results identical") {
    // past ClusterInListMax probed clusters the cluster restriction must stop
    // being an O(nProbes) literal tree (Catalyst-hostile past ~10³ literals at
    // 100-TB cluster counts) and become a broadcast join on __ivf_cluster —
    // with the IDENTICAL row set. Force the flip with a tiny inListMax.
    val loc = tmpLoc("ivf-inlist-flip")
    Indexes.buildIvf(spark, corpus, "emb", loc, nClusters = nCenters, seed = 42L)
    val q = queries.head
    val viaInList = Indexes.ivfSearch(spark, loc, "emb", q, k, nprobe = 8,
      inListMax = Indexes.ClusterInListMax)
    val viaJoin = Indexes.ivfSearch(spark, loc, "emb", q, k, nprobe = 8,
      inListMax = 2)
    assert(viaJoin.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "past inListMax the probe restriction must plan as a broadcast join")
    assert(!viaInList.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "within inListMax the probe restriction must stay a pushed IN-list")
    val a = viaInList.select("vid").as[Long].collect().toSeq
    val b = viaJoin.select("vid").as[Long].collect().toSeq
    assert(a == b, s"join-based probe restriction changed the result: $a vs $b")
  }

  test("int8 recall@10 with exact rerank reaches 0.95") {
    val exact = queries.map(exactTop)
    val quant = corpus.withColumn("q8", Similarity.quantizeInt8(col("emb"))).persist()
    quant.count()
    val got = queries.map(q =>
      Similarity.quantizedTopK(quant, "emb", "q8", q, k)
        .select("vid").as[Long].collect().toSet)
    quant.unpersist()
    val r = recall(got, exact)
    info(f"int8 recall@10=$r%.3f")
    assert(r >= 0.95, f"int8 recall@10 was $r%.3f")
  }
}
