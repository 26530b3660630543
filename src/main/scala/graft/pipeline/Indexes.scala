package graft.pipeline

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/**
 * PERSISTED search indexes — the scale path for full-text and vector search
 * (round-1 built both indexes per query; at 100 TB that is a full corpus
 * scan per search). Capability parity with paimon's global index tables
 * (reference: paimon-core/.../globalindex/, docs/docs/multimodal-table/
 * global-index.mdx:110,318-340), re-expressed as graft tables so the
 * existing manifest machinery provides the pruning:
 *
 *  - Full-text: postings persisted as a graft table whose files are
 *    term-range clustered (repartitionByRange + sort on `term` via sort
 *    compaction). A query's terms stats-prune to the few files covering
 *    those term ranges — query cost scales with posting-list size, not
 *    corpus size.
 *  - IVF: rows persisted with their coarse-quantizer cluster as a PARTITION
 *    column; centroids in a JSON sidecar. A probe of `nprobe` clusters is
 *    partition pruning — only those clusters' files are read.
 *
 * Both builds are one-shot distributed jobs (explode+groupBy / k-means fit +
 * assignment scan); queries are incremental reads of the index tables.
 */
object Indexes {

  // ------------------------------------------------------------------
  // FULL-TEXT (BM25 over a persisted inverted index)
  // ------------------------------------------------------------------

  private def statsPath(loc: String, name: String) =
    new Path(loc, s"index/$name.json")

  /** Location of the per-term document-frequency table that rides along with
    * a postings index: a PK table (term → df) on the AGGREGATION merge
    * engine with `sum(df)`, so incremental appends MERGE frequency deltas
    * instead of forcing a postings rebuild. */
  def termStatsLoc(loc: String): String = loc + "__termstats"

  private def writeCorpusSidecar(t: GraftTable, loc: String,
                                 docs: Long, totalLen: Long): Unit =
    t.sm.writeString(statsPath(loc, "fulltext-stats"),
      Json.write(Map("docs" -> docs, "total_len" -> totalLen)))

  private def readCorpusSidecar(t: GraftTable, loc: String): (Long, Long) = {
    val m = Json.mapper.readValue(t.sm.readString(statsPath(loc, "fulltext-stats")),
      classOf[java.util.Map[String, Any]])
    (m.get("docs").asInstanceOf[Number].longValue(),
      m.get("total_len").asInstanceOf[Number].longValue())
  }

  /** (doc count, summed doc length) of a postings batch — the corpus-stat
    * deltas an append contributes. */
  private def batchCorpus(postings: DataFrame): (Long, Long) = {
    val r = postings.select(col("doc_id"), col("doc_len")).distinct()
      .agg(count(lit(1)), coalesce(sum("doc_len"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The tokenizer an index was built with — persisted at build so refresh
    * and query-side tokenization always match (the reference stores
    * tokenizer settings in the index file metadata,
    * global-index/full-text.mdx:150). Default for pre-tokenizer indexes. */
  def readTokenizer(spark: SparkSession, loc: String): FullText.TokenizerSpec = {
    val t = GraftTable.load(spark, loc)
    val p = statsPath(loc, "fulltext-tokenizer")
    if (!t.sm.fs.exists(p)) FullText.TokenizerSpec()
    else FullText.TokenizerSpec.fromMap(
      Json.read(t.sm.readString(p), classOf[Map[String, String]]))
  }

  /** True when the index at `loc` carries per-term position arrays (built
    * with full-text.with-position=true) — what phrase search needs. */
  def readWithPositions(spark: SparkSession, loc: String): Boolean = {
    val t = GraftTable.load(spark, loc)
    val p = statsPath(loc, "fulltext-tokenizer")
    t.sm.fs.exists(p) && Json.read(t.sm.readString(p),
      classOf[Map[String, String]]).get("withPositions").contains("true")
  }

  /** Build (or replace) the postings index table at `loc`, plus the per-term
    * df table and corpus-stat sidecar. All three support INCREMENTAL
    * maintenance via [[appendToFullText]]. The tokenizer spec persists in
    * the index metadata; `withPositions` (full-text.with-position) stores
    * per-term position arrays for phrase search. */
  def buildFullText(spark: SparkSession, docs: DataFrame, idCol: String,
                    textCol: String, loc: String,
                    spec: FullText.TokenizerSpec = FullText.TokenizerSpec(),
                    withPositions: Boolean = false)
      : GraftTable = {
    import graft.core.RowOps._
    val postings = FullText.buildPostings(docs, idCol, textCol, spec,
      withPositions)
    val t = GraftTable.createOrReplace(spark, loc, postings.schema, TableConfig())
    t.write(postings)
    // cluster files by term range → a query's terms prune to few files
    t.compactSorted("order", Seq("term"))
    val termDf = postings.groupBy("term")
      .agg(count_distinct(col("doc_id")).as("df"))
    val st = GraftTable.createOrReplace(spark, termStatsLoc(loc), termDf.schema,
      TableConfig(primaryKeys = Seq("term"), numBuckets = 4,
        mergeEngine = "aggregation", fieldAggregates = Map("df" -> "sum")))
    st.write(termDf)
    // compact the PK term-stats table so the per-query df read is a single
    // level-max file per bucket — raw-convertible, no merge stage in the
    // search hot path
    st.compact()
    val (n, totalLen) = batchCorpus(postings)
    writeCorpusSidecar(t, loc, n, totalLen)
    t.sm.writeString(statsPath(loc, "fulltext-tokenizer"),
      Json.write(spec.toMap + ("withPositions" -> withPositions.toString)))
    t
  }

  /** Incremental full-text maintenance: append NEW documents' postings and
    * MERGE their df deltas into the term-stats table (aggregation engine) —
    * each refresh pays for the delta only; no postings or df rebuild.
    * Callers compact the postings periodically ([[compactFullText]]) to
    * restore term-range clustering over the appended files. */
  def appendToFullText(spark: SparkSession, newDocs: DataFrame, idCol: String,
                       textCol: String, loc: String): GraftTable = {
    // the delta tokenizes with the INDEX's recorded spec (positions
    // included when the index carries them), never a default
    val postings = FullText.buildPostings(newDocs, idCol, textCol,
      readTokenizer(spark, loc), readWithPositions(spark, loc))
    val t = GraftTable.load(spark, loc)
    t.write(postings)
    GraftTable.load(spark, termStatsLoc(loc))
      .write(postings.groupBy("term").agg(count_distinct(col("doc_id")).as("df")))
    val (n0, l0) = readCorpusSidecar(t, loc)
    val (n1, l1) = batchCorpus(postings)
    writeCorpusSidecar(t, loc, n0 + n1, l0 + l1)
    t
  }

  /** Re-cluster the postings by term range after a run of appends; also
    * compacts the aggregation-engine term-stats table so df point reads
    * stay on the raw (merge-free) path. */
  def compactFullText(spark: SparkSession, loc: String): Unit = {
    import graft.core.RowOps._
    GraftTable.load(spark, loc).compactSorted("order", Seq("term"))
    GraftTable.load(spark, termStatsLoc(loc)).compact()
  }

  /** BM25 scores for EVERY doc matching the query terms — the un-truncated
    * form [[fullTextSearch]] tops-k over. Exposed so composite searches
    * (es-index) can apply a companion-column candidate mask BEFORE the
    * limit (ES filter semantics: the filter masks candidates but corpus
    * statistics stay whole-index). */
  def fullTextScores(spark: SparkSession, loc: String, query: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the (term, df) side joins as a BROADCAST of the term-stats point
    // read rather than a driver collect: same rows, but the df lookup
    // becomes part of the ONE search job instead of a separate collect
    // job per query (r13 — a fixed job-dispatch floor paid by every
    // full-text/hybrid/es search). Callers that also need df sums on the
    // driver (es gate, fuzzy expansion) keep [[termDfRows]] +
    // [[fullTextScoresFromDf]], which still scan term-stats exactly once.
    val qTerms = FullText.normalizeTerms(query, readTokenizer(spark, loc))
    val dfs = GraftTable.load(spark, termStatsLoc(loc))
      .read(filter = Some(col("term").isin(qTerms: _*)))
      .select(col("term"), col("df").cast("long").as("df"))
    scoresWithDfSide(spark, loc, qTerms, broadcast(dfs), k1, b)
  }

  /** (term, df) rows of `query` terms — ONE point read of the term-stats
    * table (bounded by #query terms), collected so callers can reuse it for
    * both the BM25 idf join ([[fullTextScoresFromDf]] turns it into a local
    * relation) and driver-side size estimates (sum(df) upper-bounds the row
    * count [[fullTextScores]] can return — each scored doc contains at least
    * one query term). */
  def termDfRows(spark: SparkSession, loc: String,
                 query: Seq[String]): Array[org.apache.spark.sql.Row] = {
    val qTerms = FullText.normalizeTerms(query, readTokenizer(spark, loc))
    GraftTable.load(spark, termStatsLoc(loc))
      .read(filter = Some(col("term").isin(qTerms: _*)))
      .select(col("term"), col("df").cast("long").as("df")).collect()
  }

  /** [[fullTextScores]] with the (term, df) point read already done — the df
    * side joins as a broadcast local relation, so composite searches that
    * also need sum(df) on the driver (es-index broadcast gate) scan the
    * term-stats table exactly once per query. */
  def fullTextScoresFromDf(spark: SparkSession, loc: String, query: Seq[String],
                           dfRows: Array[org.apache.spark.sql.Row],
                           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.types._
    val qTerms = FullText.normalizeTerms(query, readTokenizer(spark, loc))
    val dfs = spark.createDataFrame(
      java.util.Arrays.asList(dfRows: _*),
      StructType(Seq(StructField("term", StringType), StructField("df", LongType))))
    scoresWithDfSide(spark, loc, qTerms, broadcast(dfs), k1, b)
  }

  /** Shared BM25 scoring body: posting hits of `qTerms` joined with a
    * caller-supplied (term, df) side (broadcast local relation or the
    * broadcast term-stats point read). */
  private def scoresWithDfSide(spark: SparkSession, loc: String,
                               qTerms: Seq[String],
                               dfs: DataFrame,
                               k1: Double, b: Double): DataFrame = {
    val t = GraftTable.load(spark, loc)
    val (n, totalLen) = readCorpusSidecar(t, loc)
    val avgdl = if (n == 0) 0.0 else totalLen.toDouble / n
    val hits = t.read(filter = Some(col("term").isin(qTerms: _*)))
    hits.join(dfs, "term")
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("doc_len") / lit(avgdl))))
      .groupBy("doc_id").agg(sum("w").as("score"))
  }

  /** Summed document frequency of `query` terms — a point read of the
    * term-stats table (bounded by #query terms). This is the driver-side
    * size estimate composite searches use to decide whether the candidate
    * score set is small enough to broadcast: sum(df) upper-bounds the row
    * count [[fullTextScores]] can return (each scored doc contains at least
    * one query term). */
  def termDfSum(spark: SparkSession, loc: String, query: Seq[String]): Long =
    termDfRows(spark, loc, query).map(_.getLong(1)).sum

  /** BM25 top-k against the persisted index: one manifest-pruned scan of the
    * query terms' posting files + a point read of those terms' df rows. */
  def fullTextSearch(spark: SparkSession, loc: String, query: Seq[String],
                     k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    fullTextScores(spark, loc, query, k1, b)
      .orderBy(col("score").desc, col("doc_id")).limit(k)

  /** [[fullTextSearch]] from a RAW query string: a JSON object routes
    * through the full Query DSL ([[FullText.parseDsl]] — match operators,
    * fuzziness, phrase, boolean, boost); plain text tokenizes with the
    * INDEX's recorded tokenizer (an ngram index grams the query; a raw
    * index matches the whole value). The SQL TVF's text entry point. */
  def fullTextSearchText(spark: SparkSession, loc: String, query: String,
                         k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    if (query.trim.startsWith("{"))
      FullText.evalDsl(FullText.parseDsl(query), IndexDslScorer(spark, loc))
        .orderBy(col("score").desc, col("doc_id")).limit(k)
    else fullTextSearch(spark, loc,
      FullText.tokenizeQuery(query, readTokenizer(spark, loc)), k, k1, b)

  /** DSL scorer over a PERSISTED postings index: every operation is a
    * term-pruned scan or a term-stats point read — bounded by the query
    * terms' posting sizes, never the corpus. */
  case class IndexDslScorer(spark: SparkSession,
                            loc: String) extends FullText.DslScorer {
    val spec: FullText.TokenizerSpec = readTokenizer(spark, loc)
    def termScores(terms: Seq[String]): DataFrame =
      fullTextScores(spark, loc, terms)
    def positionRows(terms: Seq[String]): DataFrame = {
      val t = GraftTable.load(spark, loc)
      val rows = t.read(filter = Some(col("term").isin(terms: _*)))
      require(rows.columns.contains("positions"),
        s"$loc: phrase search needs an index built with " +
          "full-text.with-position=true")
      rows
    }
    def corpus: (Long, Double) = {
      val t = GraftTable.load(spark, loc)
      val (n, totalLen) = readCorpusSidecar(t, loc)
      (n, if (n == 0) 0.0 else totalLen.toDouble / n)
    }
    def expand(term: String, fuzz: Int, prefixLen: Int,
               maxExp: Int): Seq[String] = {
      // dictionary scan over the (metadata-scale) term-stats table:
      // prefix + length push down to stats pruning; levenshtein filters
      val st = GraftTable.load(spark, termStatsLoc(loc))
      val pref = term.take(prefixLen)
      val base = st.read(filter =
        if (prefixLen > 0) Some(col("term").startsWith(pref)) else None)
      base
        .filter(length(col("term"))
          .between(term.length - fuzz, term.length + fuzz))
        .withColumn("__d", levenshtein(col("term"), lit(term)))
        .filter(col("__d") <= fuzz && col("__d") > 0)
        .orderBy(col("__d").asc, col("df").desc, col("term"))
        .limit(maxExp).select("term").collect().map(_.getString(0)).toSeq
    }
  }

  /** DSL scorer for `full-text-index.search-mode = full | detail`
    * (reference full-text.mdx:285-288): the persisted postings PLUS a
    * query-time-tokenized `delta` postings frame covering rows appended
    * since the index snapshot, scored under MERGED document-frequency and
    * corpus statistics — results equal what the index would return right
    * after a refresh (differential-tested), while the persisted index stays
    * untouched. Cost: the usual term-pruned scan + O(delta) tokenize; the
    * delta between refreshes is bounded by the refresh cadence, so `fast`
    * remains the scale default. */
  object MergedDslScorer {
    // bounded cache registry: each search-mode=full query persists its
    // delta-postings frame (it is read 3-4× while scoring); without a cap a
    // long-lived session would accumulate one cached RDD per query. Evicted
    // frames recompute if a straggling plan still references them — safe.
    private val persisted = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private def track(df: DataFrame): DataFrame = {
      persisted.add(df)
      while (persisted.size > 4) Option(persisted.poll()).foreach(_.unpersist(false))
      df
    }
  }

  case class MergedDslScorer(spark: SparkSession, loc: String,
                             delta: DataFrame) extends FullText.DslScorer {
    val spec: FullText.TokenizerSpec = readTokenizer(spark, loc)
    private val base = IndexDslScorer(spark, loc)
    private lazy val d = MergedDslScorer.track(delta.persist())
    private lazy val deltaCorpus = batchCorpus(d)
    def corpus: (Long, Double) = {
      val t = GraftTable.load(spark, loc)
      val (n0, l0) = readCorpusSidecar(t, loc)
      val n = n0 + deltaCorpus._1
      (n, if (n == 0) 0.0 else (l0 + deltaCorpus._2).toDouble / n)
    }
    def termScores(terms: Seq[String]): DataFrame = {
      import org.apache.spark.sql.types._
      val t = GraftTable.load(spark, loc)
      val (nAll, avgdl) = corpus
      val cols = Seq("term", "doc_id", "tf", "doc_len").map(col)
      val hits = t.read(filter = Some(col("term").isin(terms: _*)))
        .select(cols: _*)
        .unionByName(d.filter(col("term").isin(terms: _*)).select(cols: _*))
      // merged df: the terms' point read + a bounded delta aggregate
      val dfIdx = termDfRows(spark, loc, terms)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val dfDelta = d.filter(col("term").isin(terms: _*))
        .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows: Seq[org.apache.spark.sql.Row] = terms.distinct.flatMap { tm =>
        val df = dfIdx.getOrElse(tm, 0L) + dfDelta.getOrElse(tm, 0L)
        if (df == 0) None else Some(org.apache.spark.sql.Row(tm, df))
      }
      val dfs = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("term", StringType),
          StructField("df", LongType))))
      val (k1, b) = (1.2, 0.75)
      hits.join(broadcast(dfs), "term")
        .withColumn("idf", log(lit(1.0) +
          (lit(nAll.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
        .withColumn("w", col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0) - b + lit(b) * col("doc_len") / lit(avgdl))))
        .groupBy("doc_id").agg(sum("w").as("score"))
    }
    def positionRows(terms: Seq[String]): DataFrame = {
      val idx = base.positionRows(terms)
      require(d.columns.contains("positions"),
        s"$loc: phrase search in full mode needs the delta tokenized with " +
          "positions (index built with full-text.with-position=true)")
      val cols = Seq("term", "doc_id", "doc_len", "positions").map(col)
      idx.select(cols: _*)
        .unionByName(d.filter(col("term").isin(terms: _*)).select(cols: _*))
    }
    def expand(term: String, fuzz: Int, prefixLen: Int,
               maxExp: Int): Seq[String] = {
      val pref = term.take(prefixLen)
      val fromDelta = d.select(col("term")).distinct()
        .filter(if (prefixLen > 0) col("term").startsWith(pref) else lit(true))
        .filter(length(col("term")).between(term.length - fuzz, term.length + fuzz))
        .withColumn("__d", levenshtein(col("term"), lit(term)))
        .filter(col("__d") <= fuzz && col("__d") > 0)
        .orderBy(col("__d").asc, col("term")).limit(maxExp)
        .select("term").collect().map(_.getString(0)).toSeq
      (base.expand(term, fuzz, prefixLen, maxExp) ++ fromDelta)
        .distinct.take(maxExp)
    }
  }

  // ------------------------------------------------------------------
  // IVF (persisted coarse-quantizer index, cluster = partition column)
  // ------------------------------------------------------------------

  /** Tight-loop nearest-centroid assignment over broadcast centroids (no
    * O(k) expression unrolling — survives k≈1024 where a when-chain breaks
    * Catalyst; round-1 advisor finding on IvfModel.assignExpr). */
  def assignUdf(model: Similarity.IvfModel): UserDefinedFunction = {
    val cents = model.centroids
    udf { (v: Seq[Float]) =>
      var best = 0; var bestD = Double.MaxValue; var i = 0
      while (i < cents.length) {
        val c = cents(i); var d = 0.0; var j = 0
        while (j < c.length && d < bestD) {
          val z = c(j) - v(j); d += z * z; j += 1
        }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
  }

  /** Normalize a distance-metric spelling to [[Similarity.bruteForceTopK]]'s
    * vocabulary (the reference accepts l2 | cosine | inner_product,
    * global-index/vector.mdx:184). */
  def normalizeMetric(m: String): String = m.trim.toLowerCase match {
    case "inner_product" | "inner-product" | "ip" | "dot" => "dot"
    case "l2" | "euclidean" => "l2"
    case "cosine" | "" => "cosine"
    case other => throw new IllegalArgumentException(
      s"unknown distance metric $other (l2 | cosine | inner_product)")
  }

  /** Per-QUERY vector search options (the reference's search-time option
    * map, vector.mdx:284-297): `ivf.nprobe` widens/narrows the probe,
    * `ivf.refine_factor` sizes the exact re-rank window as
    * `top_k × refine_factor` on compressed (RQ/PQ/SQ) routes. Spelling
    * tolerance mirrors the reference's resolver
    * (VectorSearchRefineOptions-style): an optional `ivf*`-family prefix
    * (`ivf.`, `ivf-pq.`, `ivf_rq.`, …) and `refine_factor` /
    * `refine-factor` / `rerank_factor` / `rerank-factor` all name the same
    * dial. Unknown keys fail loudly — a typo must not silently run with
    * defaults. */
  case class SearchOptions(nprobe: Option[Int] = None,
                           refineFactor: Option[Int] = None) {
    nprobe.foreach(n => require(n > 0, s"ivf.nprobe must be positive, got $n"))
    refineFactor.foreach(r => require(r > 0,
      s"ivf.refine_factor must be positive, got $r"))
    /** The exact-rerank candidate count for `k` results; 0 = caller default. */
    def rerankFor(k: Int): Int = refineFactor.map { r =>
      require(k <= Int.MaxValue / r, s"rerank overflow: k=$k × factor=$r")
      k * r
    }.getOrElse(0)
  }

  object SearchOptions {
    val empty: SearchOptions = SearchOptions()

    /** Parse `k=v` pairs separated by `;` (the reference TVF string form) or
      * `,` (the CALL options form). */
    def parse(s: String): SearchOptions =
      if (s == null || s.trim.isEmpty) empty
      else fromMap(s.split("[;,]").iterator.map(_.trim).filter(_.nonEmpty)
        .map { kv =>
          val parts = kv.split("=", 2)
          require(parts.length == 2, s"invalid search option '$kv' (key=value)")
          parts(0).trim -> parts(1).trim
        }.toMap)

    def fromMap(m: Map[String, String]): SearchOptions = {
      var np: Option[Int] = None
      var rf: Option[Int] = None
      m.foreach { case (k0, v) =>
        val k = k0.trim.toLowerCase
        val (prefix, name0) = k.lastIndexOf('.') match {
          case -1 => ("", k)
          case i => (k.substring(0, i), k.substring(i + 1))
        }
        require(prefix.isEmpty || prefix.replace('-', '_').startsWith("ivf"),
          s"unknown search-option prefix '$prefix' in '$k0' " +
            "(ivf-family options only)")
        name0.replace('-', '_') match {
          case "nprobe" => np = Some(v.trim.toInt)
          case "refine_factor" | "rerank_factor" => rf = Some(v.trim.toInt)
          case other => throw new IllegalArgumentException(
            s"unknown search option '$k0' " +
              "(supported: ivf.nprobe, ivf.refine_factor)")
        }
      }
      SearchOptions(np, rf)
    }
  }

  /** Default probe width when the query gives no `ivf.nprobe` (the
    * reference's "Automatic": derived from the index and top_k,
    * vector.mdx:288): √nClusters scaled up for large k, clamped to the
    * cluster count — wide enough for recall on typical nlist sizings,
    * narrow enough to keep the partition-pruned read small. */
  def autoNprobe(nClusters: Int, k: Int): Int =
    math.min(nClusters,
      math.max(math.ceil(math.sqrt(nClusters)).toInt, (k + 15) / 16))

  /** Build (or replace) an IVF index table: rows + `__ivf_cluster` partition
    * column, centroids in a sidecar. The build-time `metric` is RECORDED in
    * the meta sidecar and becomes the index's default query metric (the
    * reference's `<index-type>.distance.metric`, set at build, used at
    * query — vector.mdx:184,292). `extraOptions` reach the index table's
    * TableConfig (es-index uses this for bloom file-indexes on companion
    * keyword columns). */
  def buildIvf(spark: SparkSession, df: DataFrame, embedCol: String,
               loc: String, nClusters: Int, seed: Long = 42L,
               extraOptions: Map[String, String] = Map.empty,
               metric: String = "cosine"): GraftTable = {
    val model = Similarity.trainIvf(df, embedCol, nClusters, seed = seed)
    val indexed = df.withColumn("__ivf_cluster", assignUdf(model)(col(embedCol)))
    val t = GraftTable.createOrReplace(spark, loc, indexed.schema,
      TableConfig(partitionKeys = Seq("__ivf_cluster"), options = extraOptions))
    t.write(indexed)
    t.sm.writeString(statsPath(loc, "ivf-centroids"),
      Json.write(model.centroids.map(_.toSeq)))
    t.sm.writeString(statsPath(loc, "ivf-meta"),
      Json.write(Map("embedCol" -> embedCol,
        "metric" -> normalizeMetric(metric))))
    t
  }

  private def ivfMeta(spark: SparkSession,
                      loc: String): Option[java.util.Map[String, String]] = {
    val t = GraftTable.load(spark, loc)
    val p = statsPath(loc, "ivf-meta")
    if (!t.sm.fs.exists(p)) None
    else Some(Json.mapper.readValue(t.sm.readString(p),
      classOf[java.util.Map[String, String]]))
  }

  /** The embedding column an IVF/IVF-RQ index was built over, from its meta
    * sidecar — lets SQL spellings (hybrid TVF) omit the column name. None
    * for indexes built before the sidecar existed. */
  def ivfEmbedCol(spark: SparkSession, loc: String): Option[String] =
    ivfMeta(spark, loc).flatMap(m => Option(m.get("embedCol")))

  /** The index's build-time distance metric (cosine for indexes built
    * before the field existed) — what a TABLE-path search scores with when
    * the caller names none. */
  def ivfMetric(spark: SparkSession, loc: String): String =
    ivfMeta(spark, loc).flatMap(m => Option(m.get("metric"))).getOrElse("cosine")

  /** Cluster count of a persisted IVF/IVF-RQ index (centroids-sidecar point
    * read) — sizes [[autoNprobe]] when a query passes no `ivf.nprobe`. */
  def ivfNClusters(spark: SparkSession, loc: String): Int = {
    val t = GraftTable.load(spark, loc)
    Json.mapper.readValue(t.sm.readString(statsPath(loc, "ivf-centroids")),
      classOf[Array[Array[Double]]]).length
  }

  /** Incremental IVF maintenance: assign ONLY the new batch against the
    * EXISTING centroids and append into the cluster-partitioned index —
    * each refresh pays for the delta (standard IVF posture: centroid drift
    * is handled by a periodic full rebuild, not per-batch retraining). */
  def appendToIvf(spark: SparkSession, df: DataFrame, embedCol: String,
                  loc: String): GraftTable = {
    val model = loadIvfModel(spark, loc)
    val t = GraftTable.load(spark, loc)
    t.write(df.withColumn("__ivf_cluster", assignUdf(model)(col(embedCol))))
    t
  }

  def loadIvfModel(spark: SparkSession, loc: String): Similarity.IvfModel = {
    val t = GraftTable.load(spark, loc)
    val cents = Json.mapper.readValue(
      t.sm.readString(statsPath(loc, "ivf-centroids")),
      classOf[Array[Array[Double]]])
    Similarity.IvfModel(cents)
  }

  /** Max probed-cluster ids carried as an IN-list read predicate. Past this
    * the probe restriction becomes a broadcast join on `__ivf_cluster`
    * instead — an O(nProbes) literal tree is Catalyst-hostile past ~10³
    * entries (expression-tree build/codegen cost grows with every literal),
    * and a late escalation rung at 100-TB cluster counts probes thousands.
    * The join keeps the ROW set identical to the IN-list (same candidates,
    * same top-k); only manifest-level pruning is ceded, which at that probe
    * breadth skips little anyway. */
  val ClusterInListMax = 1024

  /** Read the probed clusters' rows, composing an optional extra filter that
    * always pushes down to the scan. Three shapes:
    *  - probe covers every cluster → plain (filtered) read, no cluster pred;
    *  - ≤ `inListMax` probes → pushed `isin` (manifest partition pruning);
    *  - wider → filtered read + broadcast inner join on `__ivf_cluster`
    *    (identical row set, no giant literal tree). */
  private[graft] def readProbed(t: GraftTable, probes: Seq[Int], nClusters: Int,
      extra: Option[Column], inListMax: Int = ClusterInListMax): DataFrame = {
    if (probes.size >= nClusters) t.read(filter = extra)
    else if (probes.size <= inListMax)
      t.read(filter = Some((col("__ivf_cluster").isin(probes: _*) +:
        extra.toSeq).reduce(_ && _)))
    else {
      import t.spark.implicits._
      val cdf = probes.toDF("__ivf_cluster")
      t.read(filter = extra).join(broadcast(cdf), "__ivf_cluster")
    }
  }

  /** Progressive filtered-probe escalation, shared by the plain IVF/RQ
    * searches and the es-index composite: a filter that keeps few rows
    * decimates the probed clusters' candidate pool (most survivors live in
    * clusters the query vector does not probe), silently degrading recall
    * long before the probe is starved. Require `escalateFactor × k`
    * filter-surviving candidates inside the probed clusters — counted with a
    * partition-pruned, column-pruned distributed COUNT (no vector bytes
    * read, nothing collected) — and widen nprobe ×4 per rung; exact (all
    * clusters) only as the last rung. Returns the effective nprobe. */
  private[graft] def escalateNprobe(t: GraftTable, model: Similarity.IvfModel,
      query: Seq[Float], k: Int, nprobe: Int, filter: Option[Column],
      escalateFactor: Int, inListMax: Int = ClusterInListMax): Int = {
    val nClusters = model.centroids.length
    // clamp to ≥1: a 0 (or negative) nprobe with a filter would probe zero
    // clusters forever (survivors(0)=0 and 0*4=0 never progresses) — the TVF
    // surface reaches here with any user-typed integer
    var np = math.min(math.max(nprobe, 1), nClusters)
    if (filter.nonEmpty) {
      val target = escalateFactor.toLong * k
      def survivors(np0: Int): Long =
        readProbed(t, model.nearestClusters(query, np0), nClusters, filter,
          inListMax).count()
      while (np < nClusters && survivors(np) < target)
        np = math.min(np * 4, nClusters)
    }
    np
  }

  /** Top-k over the persisted IVF index: `nprobe` clusters = partition
    * pruning, exact scoring only within probed clusters. An optional
    * `filter` masks candidates (pushed into the scan) and rides the shared
    * escalation ladder ([[escalateNprobe]]) so selective filters cannot
    * silently starve recall. */
  def ivfSearch(spark: SparkSession, loc: String, embedCol: String,
                query: Seq[Float], k: Int, nprobe: Int,
                metric: String = "cosine", scoreCol: String = "__score",
                filter: Option[Column] = None, escalateFactor: Int = 10,
                inListMax: Int = ClusterInListMax): DataFrame = {
    val t = GraftTable.load(spark, loc)
    val model = loadIvfModel(spark, loc)
    val np = escalateNprobe(t, model, query, k, nprobe, filter,
      escalateFactor, inListMax)
    val hits = readProbed(t, model.nearestClusters(query, np),
      model.centroids.length, filter, inListMax)
    Similarity.bruteForceTopK(hits.drop("__ivf_cluster"), embedCol, query, k,
      metric, scoreCol)
  }

  /** BATCHED IVF search ("vector lateral" over the persisted index): the
    * scan reads only the UNION of all queries' probed clusters (partition
    * pruning), and each row scores only against the queries probing its
    * cluster; per-partition k-heaps + one window merge the top-k per query
    * ([[Similarity.batchTopK]]). */
  def ivfBatchSearch(spark: SparkSession, loc: String, idCol: String,
                     embedCol: String, queries: Seq[(Long, Seq[Float])],
                     k: Int, nprobe: Int): DataFrame = {
    val t = GraftTable.load(spark, loc)
    val model = loadIvfModel(spark, loc)
    val probes = queries.map { case (qid, v) =>
      qid -> model.nearestClusters(v, nprobe).toSet
    }.toMap
    val union = probes.values.flatten.toSeq.distinct
    val hits = readProbed(t, union, model.centroids.length, None)
    Similarity.batchTopK(hits, idCol, embedCol, queries, k,
      clusterCol = "__ivf_cluster", clusterProbes = probes)
  }

  /** Planned file count for a probe set — lets tests assert that probing
    * prunes at the manifest level. */
  def ivfPlannedFiles(spark: SparkSession, loc: String, probes: Seq[Int]): Int =
    GraftTable.load(spark, loc)
      .planFiles(filter = Some(col("__ivf_cluster").isin(probes: _*))).size

  // ---- IVF-RQ persisted index (reference ivf-rq indexer family) ----

  /** Build an IVF-RQ index table: rows partitioned by unit-space cluster,
    * plus an m-byte residual code per row ([[Similarity.RqModel]]). A probe
    * is partition pruning; candidate ranking reads the code bytes, not the
    * float vectors; only the re-rank set touches floats. */
  def buildIvfRq(spark: SparkSession, df: DataFrame, embedCol: String,
                 loc: String, dim: Int, nClusters: Int = 8, m: Int = 8,
                 ks: Int = 16, sampleFraction: Double = 1.0,
                 seed: Long = 42L, metric: String = "cosine"): GraftTable = {
    val model = Similarity.trainRq(df, embedCol, dim, nClusters, m, ks,
      sampleFraction, seed)
    val indexed = encodeRq(df, embedCol, model)
    val t = GraftTable.createOrReplace(spark, loc, indexed.schema,
      TableConfig(partitionKeys = Seq("__ivf_cluster")))
    t.write(indexed)
    t.sm.writeString(statsPath(loc, "ivf-centroids"),
      Json.write(model.ivf.centroids.map(_.toSeq)))
    t.sm.writeString(statsPath(loc, "rq-codebooks"),
      Json.write(model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq))
    t.sm.writeString(statsPath(loc, "ivf-meta"),
      Json.write(Map("embedCol" -> embedCol,
        "metric" -> normalizeMetric(metric))))
    t
  }

  private def encodeRq(df: DataFrame, embedCol: String,
                       model: Similarity.RqModel): DataFrame =
    df.withColumn("__ivf_cluster", model.assignUdf(col(embedCol)))
      .withColumn("__rq", model.encodeUdf(col(embedCol), col("__ivf_cluster")))

  /** Incremental IVF-RQ maintenance: assign + encode ONLY the new batch
    * against the persisted model and append (same posture as
    * [[appendToIvf]] — drift is a periodic rebuild, not per-batch). */
  def appendToIvfRq(spark: SparkSession, df: DataFrame, embedCol: String,
                    loc: String): GraftTable = {
    val t = GraftTable.load(spark, loc)
    t.write(encodeRq(df, embedCol, loadRqModel(spark, loc)))
    t
  }

  /** True when the index at `loc` is an IVF-RQ index (carries residual
    * codebooks) — lets the SQL TVF route to the ADC search automatically. */
  def isRqIndex(spark: SparkSession, loc: String): Boolean =
    GraftTable.load(spark, loc).sm.fs.exists(statsPath(loc, "rq-codebooks"))

  def loadRqModel(spark: SparkSession, loc: String): Similarity.RqModel = {
    val t = GraftTable.load(spark, loc)
    val cents = Json.mapper.readValue(
      t.sm.readString(statsPath(loc, "ivf-centroids")),
      classOf[Array[Array[Double]]])
    val cbs = Json.mapper.readValue(
      t.sm.readString(statsPath(loc, "rq-codebooks")),
      classOf[Array[Array[Array[Double]]]])
    // dsub is the codebook width — no separate sidecar field
    Similarity.RqModel(Similarity.IvfModel(cents),
      Similarity.PqModel(cbs(0)(0).length, cbs))
  }

  /** Top-k over the persisted IVF-RQ index: nprobe partitions read, ADC
    * candidate ranking over the code bytes, exact re-rank. An optional
    * `filter` masks candidates BEFORE ADC ranking (pushed into the scan) and
    * rides the shared escalation ladder ([[escalateNprobe]]). The exact
    * re-rank honors `metric` (cosine | dot | l2); candidate RANKING stays in
    * unit space either way — |q̂−v̂|² = 2−2·cos, so the ADC candidate order
    * is simultaneously the unit-space cosine AND l2 order, and the rerank
    * window absorbs the raw-norm differences. */
  def rqSearch(spark: SparkSession, loc: String, embedCol: String,
               query: Seq[Float], k: Int, nprobe: Int, rerank: Int = 0,
               metric: String = "cosine", scoreCol: String = "__score",
               filter: Option[Column] = None, escalateFactor: Int = 10,
               inListMax: Int = ClusterInListMax): DataFrame = {
    val t = GraftTable.load(spark, loc)
    val model = loadRqModel(spark, loc)
    val np = escalateNprobe(t, model.ivf, query, k, nprobe, filter,
      escalateFactor, inListMax)
    val hits = readProbed(t, model.nearestClusters(query, np),
      model.ivf.centroids.length, filter, inListMax)
    val r = if (rerank > 0) rerank else math.max(4 * k, 50)
    val cands = hits
      .withColumn("__adc",
        model.adcScoreUdf(query)(col("__rq"), col("__ivf_cluster")))
      .orderBy(col("__adc").desc).limit(r)
    Similarity.bruteForceTopK(
      cands.drop("__adc", "__rq", "__ivf_cluster"), embedCol, query, k,
      metric, scoreCol)
  }
}
