package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Full-text search with BM25 scoring over an inverted-index table, plus
 * vector+text hybrid fusion — capability parity with paimon's
 * `full_text_search` / `hybrid_search` TVFs (reference:
 * paimon-spark/.../PaimonTableValuedFunctions.scala:59-61,
 * paimon-core/.../predicate/FullTextSearch.java:28, HybridSearch.java:34;
 * rankers per docs/docs/primary-key-table/global-index.mdx:466-495).
 *
 * Index build is a flat-map + aggregate (explode → groupBy term): pure
 * shuffle-once DataFrame work. Search touches only the query's terms from
 * the postings (predicate pushdown on `term`), joins them broadcast, and
 * top-k's with TakeOrdered — no full corpus scan at query time.
 */
object FullText {

  /** Configurable index tokenizer (the reference's `full-text.*` option
    * family, global-index/full-text.mdx:127-138): `default` is the engine's
    * lowercase whitespace pipeline; `simple` splits on non-alphanumerics;
    * `whitespace` splits on whitespace without case folding unless asked;
    * `raw` keeps the whole trimmed value as one token; `ngram` emits
    * character grams of length minGram..maxGram (prefixOnly = grams
    * anchored at position 1 only — prefix search). `jieba` (dictionary
    * segmentation) is rejected with a clear error — declared non-goal.
    * Settings persist in the index metadata so refresh and query-side
    * tokenization always match the build. */
  case class TokenizerSpec(kind: String = "default", minGram: Int = 3,
                           maxGram: Int = 3, prefixOnly: Boolean = false,
                           lowerCase: Boolean = true, maxTokenLength: Int = 40) {
    require(Seq("default", "simple", "whitespace", "raw", "ngram").contains(kind),
      if (kind == "jieba")
        "the jieba tokenizer needs a segmentation dictionary (not bundled); " +
          "use default | simple | whitespace | raw | ngram"
      else s"unknown tokenizer $kind (default | simple | whitespace | raw | ngram)")
    require(minGram >= 1 && maxGram >= minGram, "need 1 <= min-gram <= max-gram")
    def toMap: Map[String, String] = Map(
      "kind" -> kind, "minGram" -> minGram.toString,
      "maxGram" -> maxGram.toString, "prefixOnly" -> prefixOnly.toString,
      "lowerCase" -> lowerCase.toString,
      "maxTokenLength" -> maxTokenLength.toString)
  }

  object TokenizerSpec {
    /** Parse the reference's `full-text.*` option spellings (CALL options or
      * table options; unknown keys ignored — they belong to other families). */
    def fromOptions(opts: Map[String, String]): TokenizerSpec = {
      def g(k: String) = opts.get(s"full-text.$k")
      TokenizerSpec(
        kind = g("tokenizer").getOrElse("default").trim.toLowerCase,
        minGram = g("ngram.min-gram").map(_.toInt).getOrElse(3),
        maxGram = g("ngram.max-gram").map(_.toInt).getOrElse(3),
        prefixOnly = g("ngram.prefix-only").exists(_.toBoolean),
        lowerCase = g("lower-case").forall(_.toBoolean),
        maxTokenLength = g("max-token-length").map(_.toInt).getOrElse(40))
    }

    def fromMap(m: Map[String, String]): TokenizerSpec = TokenizerSpec(
      m.getOrElse("kind", "default"), m.getOrElse("minGram", "3").toInt,
      m.getOrElse("maxGram", "3").toInt,
      m.getOrElse("prefixOnly", "false").toBoolean,
      m.getOrElse("lowerCase", "true").toBoolean,
      m.getOrElse("maxTokenLength", "40").toInt)
  }

  /** Column-level tokenization per spec (the build side). */
  def tokens(text: Column, spec: TokenizerSpec): Column = {
    def cased(c: Column) = if (spec.lowerCase) lower(c) else c
    def capped(arr: Column) =
      filter(arr, w => length(w) > 0 && length(w) <= spec.maxTokenLength)
    spec.kind match {
      case "default" => TextOps.words(text)
      case "whitespace" => capped(split(cased(trim(text)), "\\s+"))
      case "simple" => capped(split(cased(trim(text)), "[^\\p{L}\\p{N}]+"))
      case "raw" =>
        capped(when(length(trim(text)) > 0, array(cased(trim(text))))
          .otherwise(array().cast("array<string>")))
      case "ngram" =>
        val t = cased(trim(text))
        (spec.minGram to spec.maxGram).map { n =>
          if (spec.prefixOnly)
            when(length(t) >= n, array(t.substr(lit(1), lit(n))))
              .otherwise(array().cast("array<string>"))
          else
            when(length(t) >= n,
              transform(sequence(lit(1), length(t) - n + 1),
                i => t.substr(i, lit(n))))
              .otherwise(array().cast("array<string>"))
        }.reduce(concat(_, _))
    }
  }

  /** Driver-side QUERY tokenization — must mirror [[tokens]] so query terms
    * meet the index's postings (ngram queries gram the query string). */
  def tokenizeQuery(q: String, spec: TokenizerSpec): Seq[String] = {
    def cased(s: String) = if (spec.lowerCase) s.toLowerCase else s
    def capped(ts: Seq[String]) =
      ts.filter(t => t.nonEmpty && t.length <= spec.maxTokenLength)
    spec.kind match {
      case "default" => q.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      case "whitespace" => capped(cased(q.trim).split("\\s+").toSeq)
      case "simple" => capped(cased(q.trim).split("[^\\p{L}\\p{N}]+").toSeq)
      case "raw" => capped(Seq(cased(q.trim)))
      case "ngram" =>
        val t = cased(q.trim)
        (spec.minGram to spec.maxGram).flatMap { n =>
          if (t.length < n) Nil
          else if (spec.prefixOnly) Seq(t.substring(0, n))
          else (0 to t.length - n).map(i => t.substring(i, i + n))
        }.distinct
    }
  }

  /** Query-term normalization WITHOUT splitting (terms already tokenized):
    * the casing/length rules of the spec, applied idempotently — keeps the
    * pre-split public surfaces (`search(query: Seq[String])`) correct for
    * every tokenizer. */
  def normalizeTerms(terms: Seq[String], spec: TokenizerSpec): Seq[String] = {
    def cased(s: String) = if (spec.lowerCase) s.toLowerCase else s
    spec.kind match {
      case "default" => terms.map(_.toLowerCase)
      case _ => terms.map(cased)
        .filter(t => t.nonEmpty && t.length <= spec.maxTokenLength)
    }
  }

  /** Inverted index: one row per (term, doc) with term frequency, plus
    * per-doc length — the postings a search needs for BM25. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    spec: TokenizerSpec = TokenizerSpec()): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol), spec).as("ws"))
    toks
      .select(col("doc_id"), size(col("ws")).as("doc_len"), explode(col("ws")).as("term"))
      .groupBy("term", "doc_id", "doc_len")
      .agg(count(lit(1)).as("tf"))
  }

  /** Corpus stats needed at query time: N docs, average doc length. */
  def corpusStats(postings: DataFrame): (Long, Double) = {
    val r = postings.select(col("doc_id"), col("doc_len")).distinct()
      .agg(count(lit(1)), avg("doc_len")).head()
    (r.getLong(0), r.getDouble(1))
  }

  /**
   * BM25 top-k for a bag-of-words query. k1/b are the classic defaults.
   * idf = ln(1 + (N - df + 0.5)/(df + 0.5)); deterministic tiebreak doc_id.
   * `spec` normalizes the query terms the same way the postings were built.
   */
  def search(postings: DataFrame, query: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75,
             spec: TokenizerSpec = TokenizerSpec()): DataFrame = {
    val (n, avgdl) = corpusStats(postings)
    val qTerms = normalizeTerms(query, spec)
    bm25(postings.filter(col("term").isin(qTerms: _*)), n, avgdl, k, k1, b)
  }

  /** BM25 scoring over pre-filtered postings rows (the query terms' hits)
    * with externally supplied corpus stats — the path the persisted index
    * takes ([[Indexes.fullTextSearch]]): df comes exactly from the hits. */
  def bm25(hits: DataFrame, n: Long, avgdl: Double, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val df_ = hits.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val scored = hits.join(broadcast(df_), "term")
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("doc_len") / lit(avgdl))))
      .groupBy("doc_id").agg(sum("w").as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Reciprocal-rank-fusion of two ranked result sets (paimon hybrid_search
    * `rrf` ranker): score = Σ 1/(k0 + rank). Inputs need (id, rank). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k0: Int = 60): DataFrame = {
    val sa = a.select(col(idCol).as("id"), (lit(1.0) / (lit(k0) + col("rank"))).as("s1"))
    val sb = b.select(col(idCol).as("id"), (lit(1.0) / (lit(k0) + col("rank"))).as("s2"))
    sa.join(sb, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))).as("rrf"))
  }

  /** Rank column (1-based) by score desc with id tiebreak. */
  def ranked(df: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))))
  }

  /** weighted_score ranker (paimon hybrid_search ranker variant): min-max
    * normalize each side's score to [0,1], combine w1·s1 + w2·s2. Inputs
    * need (id, score) columns named per args. */
  def weightedFuse(a: DataFrame, b: DataFrame, idCol: String, scoreCol: String,
                   w1: Double = 0.5, w2: Double = 0.5): DataFrame = {
    def norm(df: DataFrame, out: String): DataFrame = {
      val mm = df.agg(min(scoreCol).as("mn"), max(scoreCol).as("mx")).head()
      // an EMPTY side (e.g. no document contains any query term) aggregates
      // to null min/max — normalize over zero rows is a no-op, not an NPE;
      // the other side's ranking passes through the full-outer fuse
      val (mn, mx) =
        if (mm.isNullAt(0)) (0.0, 0.0)
        else (mm.getDouble(0), mm.getDouble(1))
      val denom = if (mx > mn) mx - mn else 1.0
      df.select(col(idCol).as("id"), ((col(scoreCol) - mn) / denom).as(out))
    }
    norm(a, "s1").join(norm(b, "s2"), Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(col("s1"), lit(0.0)) * w1 + coalesce(col("s2"), lit(0.0)) * w2).as("fused"))
  }

  /** Fuse two (id, score) result sets with a NAMED ranker (the reference
    * hybrid_search ranker surface: rrf | mrr | weighted_score) — one place
    * owns the name→fusion dispatch for the es-index composite, the
    * separate-index hybrid search, and their SQL TVF spellings. Inputs carry
    * (`idCol`, score); output is (id, score) un-truncated. */
  def fuse(v: DataFrame, x: DataFrame, idCol: String, ranker: String,
           rrfK0: Int = 60): DataFrame = ranker match {
    case "rrf" =>
      rrfFuse(ranked(v, idCol, "score"), ranked(x, idCol, "score"), idCol, rrfK0)
        .select(col("id"), col("rrf").as("score"))
    case "mrr" =>
      mrrFuse(ranked(v, idCol, "score"), ranked(x, idCol, "score"), idCol)
        .select(col("id"), col("mrr").as("score"))
    case "weighted_score" =>
      weightedFuse(v, x, idCol, "score")
        .select(col("id"), col("fused").as("score"))
    case other => throw new IllegalArgumentException(
      s"unknown hybrid ranker $other (rrf | mrr | weighted_score)")
  }

  /** Min-max normalize a route's scores to [0,1] as (id, ns) — the
    * weighted_score ranker's per-route normalization (empty route → no
    * rows, a no-op under union-fusion). */
  private def normScore(df: DataFrame, idCol: String): DataFrame = {
    val mm = df.agg(min("score").as("mn"), max("score").as("mx")).head()
    val (mn, mx) =
      if (mm.isNullAt(0)) (0.0, 0.0) else (mm.getDouble(0), mm.getDouble(1))
    val denom = if (mx > mn) mx - mn else 1.0
    df.select(col(idCol).as("id"), ((col("score") - mn) / denom).as("ns"))
  }

  /** N-ROUTE weighted fusion (the reference's multi-route hybrid_search,
    * docs/multimodal-table/global-index/hybrid-search.mdx:61-90): each route
    * is a (ranked result set, weight); contributions sum per id —
    *  - rrf:            Σ weight / (k0 + rank)
    *  - mrr:            Σ weight / rank        (weighted reciprocal rank)
    *  - weighted_score: Σ weight · minmax(score)
    * Fusion is a union + one hash aggregation (N-way full-outer join
    * semantics without N-1 join stages); routes are k-truncated upstream so
    * the shuffle carries Σ route-limits rows at most. */
  def fuseRoutes(routes: Seq[(DataFrame, Double)], ranker: String,
                 rrfK0: Int = 60): DataFrame = {
    require(routes.nonEmpty, "hybrid fusion needs at least one route")
    val parts = ranker match {
      case "rrf" => routes.map { case (df, w) =>
        ranked(df, "id", "score")
          .select(col("id"), (lit(w) / (lit(rrfK0) + col("rank"))).as("c")) }
      case "mrr" => routes.map { case (df, w) =>
        ranked(df, "id", "score")
          .select(col("id"), (lit(w) / col("rank")).as("c")) }
      case "weighted_score" => routes.map { case (df, w) =>
        normScore(df, "id").select(col("id"), (col("ns") * w).as("c")) }
      case other => throw new IllegalArgumentException(
        s"unknown hybrid ranker $other (rrf | mrr | weighted_score)")
    }
    parts.reduce(_ unionAll _).groupBy("id").agg(sum("c").as("score"))
  }

  /** Hybrid search over TWO SEPARATE persisted indexes — a vector index
    * ([[Indexes.buildIvf]]) and a full-text index ([[Indexes.buildFullText]])
    * built independently over the same id space — fused with a named ranker.
    * This is the reference's standalone `hybrid_search` TVF shape
    * (paimon-spark/.../PaimonTableValuedFunctions.scala:60), distinct from
    * the es-index composite (ONE index, shared filter): a user with two
    * existing indexes fuses them without rebuilding anything. Both sides are
    * k-truncated rankings; the vector side reads nprobe partitions of the
    * IVF table, the text side the query terms' posting files. */
  def hybridIndexSearch(spark: SparkSession, vecLoc: String, textLoc: String,
                        idCol: String, query: Seq[Float], terms: Seq[String],
                        k: Int, ranker: String = "rrf", nprobe: Int = 8,
                        rrfK0: Int = 60,
                        embedCol: Option[String] = None): DataFrame = {
    val e = embedCol.orElse(Indexes.ivfEmbedCol(spark, vecLoc))
      .getOrElse("embedding")
    val vecTop = Indexes.ivfSearch(spark, vecLoc, e, query, k, nprobe,
        scoreCol = "score")
      .select(col(idCol).as("id"), col("score"))
    val txtTop = Indexes.fullTextSearch(spark, textLoc, terms, k)
      .select(col("doc_id").as("id"), col("score"))
    fuse(vecTop, txtTop, "id", ranker, rrfK0)
      .orderBy(col("score").desc, col("id")).limit(k)
      .withColumnRenamed("id", idCol)
  }

  /** mrr ranker: score = Σ 1/rank over the result sets containing the id. */
  def mrrFuse(a: DataFrame, b: DataFrame, idCol: String): DataFrame = {
    val sa = a.select(col(idCol).as("id"), (lit(1.0) / col("rank")).as("s1"))
    val sb = b.select(col(idCol).as("id"), (lit(1.0) / col("rank")).as("s2"))
    sa.join(sb, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))).as("mrr"))
  }
}
