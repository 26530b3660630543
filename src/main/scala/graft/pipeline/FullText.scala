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
    * `whitespace` splits on whitespace without case folding (fromOptions
    * defaults lower-case OFF for this kind; `full-text.lower-case=true`
    * turns it back on);
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
      val kind = g("tokenizer").getOrElse("default").trim.toLowerCase
      TokenizerSpec(
        kind = kind,
        minGram = g("ngram.min-gram").map(_.toInt).getOrElse(3),
        maxGram = g("ngram.max-gram").map(_.toInt).getOrElse(3),
        prefixOnly = g("ngram.prefix-only").exists(_.toBoolean),
        // whitespace tokenizers conventionally do NOT fold case; every
        // other kind folds unless `full-text.lower-case=false`
        lowerCase = g("lower-case").map(_.toBoolean)
          .getOrElse(kind != "whitespace"),
        maxTokenLength = g("max-token-length").map(_.toInt).getOrElse(40))
    }

    def fromMap(m: Map[String, String]): TokenizerSpec = TokenizerSpec(
      m.getOrElse("kind", "default"), m.getOrElse("minGram", "3").toInt,
      m.getOrElse("maxGram", "3").toInt,
      m.getOrElse("prefixOnly", "false").toBoolean,
      m.getOrElse("lowerCase", "true").toBoolean,
      m.getOrElse("maxTokenLength", "40").toInt)
  }

  /** Whitespace trim covering ALL \s (Spark's `trim` strips only spaces;
    * the driver side mirrors with the same regex — a tab-prefixed document
    * must tokenize identically on both sides). */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")
  private def wsTrim(s: String): String =
    s.replaceAll("^\\s+|\\s+$", "")

  /** Column-level tokenization per spec (the build side). */
  def tokens(text: Column, spec: TokenizerSpec): Column = {
    def cased(c: Column) = if (spec.lowerCase) lower(c) else c
    def capped(arr: Column) =
      filter(arr, w => length(w) > 0 && length(w) <= spec.maxTokenLength)
    spec.kind match {
      case "default" => TextOps.words(text)
      case "whitespace" => capped(split(cased(wsTrim(text)), "\\s+"))
      case "simple" => capped(split(cased(wsTrim(text)), "[^\\p{L}\\p{N}]+"))
      case "raw" =>
        capped(when(length(wsTrim(text)) > 0, array(cased(wsTrim(text))))
          .otherwise(array().cast("array<string>")))
      case "ngram" =>
        val t = cased(wsTrim(text))
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
    * meet the index's postings (ngram queries gram the query string). The
    * mirror is exact down to the character model: Spark's length/substr
    * count CODE POINTS, so grams and length caps here do too (a naive
    * String.substring would split an emoji's surrogate pair and the query
    * grams would never match the index), and lowercasing is locale-ROOT
    * (Spark's lower is locale-independent; default-locale toLowerCase would
    * diverge under e.g. a Turkish JVM). */
  def tokenizeQuery(q: String, spec: TokenizerSpec): Seq[String] = {
    def cased(s: String) =
      if (spec.lowerCase) s.toLowerCase(java.util.Locale.ROOT) else s
    def cpLen(s: String) = s.codePointCount(0, s.length)
    def capped(ts: Seq[String]) =
      ts.filter(t => t.nonEmpty && cpLen(t) <= spec.maxTokenLength)
    spec.kind match {
      case "default" =>
        q.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty).toSeq
      case "whitespace" => capped(cased(wsTrim(q)).split("\\s+").toSeq)
      case "simple" => capped(cased(wsTrim(q)).split("[^\\p{L}\\p{N}]+").toSeq)
      case "raw" => capped(Seq(cased(wsTrim(q))))
      case "ngram" =>
        val cps = cased(wsTrim(q)).codePoints().toArray
        def sub(from: Int, n: Int) = new String(cps, from, n)
        (spec.minGram to spec.maxGram).flatMap { n =>
          if (cps.length < n) Nil
          else if (spec.prefixOnly) Seq(sub(0, n))
          else (0 to cps.length - n).map(i => sub(i, n))
        }.distinct
    }
  }

  /** Query-term normalization WITHOUT splitting (terms already tokenized):
    * the casing/length rules of the spec, applied idempotently — keeps the
    * pre-split public surfaces (`search(query: Seq[String])`) correct for
    * every tokenizer. */
  def normalizeTerms(terms: Seq[String], spec: TokenizerSpec): Seq[String] = {
    def cased(s: String) =
      if (spec.lowerCase) s.toLowerCase(java.util.Locale.ROOT) else s
    spec.kind match {
      case "default" => terms.map(_.toLowerCase(java.util.Locale.ROOT))
      case _ => terms.map(cased)
        .filter(t => t.nonEmpty &&
          t.codePointCount(0, t.length) <= spec.maxTokenLength)
    }
  }

  /** Inverted index: one row per (term, doc) with term frequency, plus
    * per-doc length — the postings a search needs for BM25. With
    * `withPositions` (the reference's `full-text.with-position=true`) each
    * row also carries the term's sorted in-document positions, the input
    * phrase search needs; the array is bounded by that term's tf in that
    * one document. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    spec: TokenizerSpec = TokenizerSpec(),
                    withPositions: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol), spec).as("ws"))
    if (!withPositions)
      toks.select(col("doc_id"), size(col("ws")).as("doc_len"),
          explode(col("ws")).as("term"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(count(lit(1)).as("tf"))
    else
      toks.select(col("doc_id"), size(col("ws")).as("doc_len"),
          posexplode(col("ws")).as(Seq("pos", "term")))
        .groupBy("term", "doc_id", "doc_len")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
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

  /** UN-truncated BM25 per-doc scores over pre-filtered postings rows (the
    * query terms' hits) with externally supplied corpus stats: df comes
    * exactly from the hits. (doc_id, score). */
  def bm25Scores(hits: DataFrame, n: Long, avgdl: Double,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val df_ = hits.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    hits.join(broadcast(df_), "term")
      .withColumn("idf", log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("doc_len") / lit(avgdl))))
      .groupBy("doc_id").agg(sum("w").as("score"))
  }

  /** BM25 top-k over pre-filtered postings rows — the path the persisted
    * index takes ([[Indexes.fullTextSearch]]). */
  def bm25(hits: DataFrame, n: Long, avgdl: Double, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(hits, n, avgdl, k1, b)
      .orderBy(col("score").desc, col("doc_id")).limit(k)

  // ------------------------------------------------------------------
  // QUERY DSL (the reference's full-text Query DSL,
  // global-index/full-text.mdx "Query DSL": match with operator/boost/
  // fuzziness, match_phrase, boolean must/should/must_not, boost demotion)
  // ------------------------------------------------------------------

  sealed trait Dsl
  /** `fuzziness` -1 means AUTO: resolved PER TERM at expansion time the way
    * the reference/ES family does — 0 edits for 1-2 char terms, 1 for 3-5,
    * 2 for 6+ (a constant 2 would let 2-char terms match almost anything). */
  case class DslMatch(query: String, operator: String = "Or",
                      boost: Double = 1.0, fuzziness: Int = 0,
                      prefixLength: Int = 0, maxExpansions: Int = 50) extends Dsl
  /** Ordered-terms phrase. `slop` is the per-gap tolerance: term i+1 may sit
    * up to `slop` positions past its exact slot (the reference's positional
    * move budget, approximated per gap; slop=0 is the exact phrase). */
  case class DslPhrase(query: String, slop: Int = 0) extends Dsl
  case class DslBool(must: Seq[Dsl], should: Seq[Dsl], mustNot: Seq[Dsl]) extends Dsl
  case class DslBoost(positive: Dsl, negative: Dsl,
                      negativeBoost: Double = 0.5) extends Dsl
  /** Search several TABLE columns in one query (one index per column, the
    * reference's per-column build path): per-column match scores
    * boost-weighted and union-summed. Evaluated at the ROUTING layer (one
    * scorer per column) — top level only. */
  case class DslMultiMatch(query: String, columns: Seq[String],
                           boosts: Seq[Double]) extends Dsl

  /** Parse the JSON query DSL (one top-level query type per node). */
  def parseDsl(json: String): Dsl =
    parseDslNode(graft.core.Json.read(json, classOf[Map[String, Any]]))

  private def parseDslNode(m: Map[String, Any]): Dsl = {
    require(m.size == 1, s"a DSL node has ONE top-level query type, got " +
      m.keys.mkString(", "))
    def num(v: Any): Double = v match {
      case s: String => s.toDouble
      case n => n.asInstanceOf[Number].doubleValue()
    }
    def subqs(v: Any): Seq[Dsl] = v.asInstanceOf[Seq[Any]]
      .map(x => parseDslNode(x.asInstanceOf[Map[String, Any]]))
    val (kind, body0) = m.head
    val body = body0.asInstanceOf[Map[String, Any]]
    kind match {
      case "match" =>
        DslMatch(String.valueOf(body("query")),
          body.get("operator").map(String.valueOf).getOrElse("Or"),
          body.get("boost").map(num).getOrElse(1.0),
          body.get("fuzziness").map {
            case s: String if s.equalsIgnoreCase("auto") => -1 // per-term AUTO
            case v => num(v).toInt
          }.getOrElse(0),
          body.get("prefix_length").orElse(body.get("prefixLength"))
            .map(v => num(v).toInt).getOrElse(0),
          body.get("max_expansions").orElse(body.get("maxExpansions"))
            .map(v => num(v).toInt).getOrElse(50))
      case "match_phrase" =>
        DslPhrase(String.valueOf(body("query")),
          body.get("slop").map(v => num(v).toInt).getOrElse(0))
      case "boolean" | "bool" =>
        body.get("queries") match {
          case Some(pairs) =>
            // the native reader's occurrence/query pair array form
            val tagged = pairs.asInstanceOf[Seq[Any]].map { p =>
              val pair = p.asInstanceOf[Seq[Any]]
              String.valueOf(pair.head).toLowerCase.replace("_", "") ->
                parseDslNode(pair(1).asInstanceOf[Map[String, Any]])
            }
            DslBool(tagged.collect { case ("must", q) => q },
              tagged.collect { case ("should", q) => q },
              tagged.collect { case ("mustnot", q) => q })
          case None =>
            DslBool(body.get("must").map(subqs).getOrElse(Nil),
              body.get("should").map(subqs).getOrElse(Nil),
              body.get("must_not").orElse(body.get("mustNot"))
                .map(subqs).getOrElse(Nil))
        }
      case "boost" =>
        DslBoost(parseDslNode(body("positive").asInstanceOf[Map[String, Any]]),
          parseDslNode(body("negative").asInstanceOf[Map[String, Any]]),
          body.get("negative_boost").orElse(body.get("negativeBoost"))
            .map(num).getOrElse(0.5))
      case "multi_match" =>
        val cols = body("columns").asInstanceOf[Seq[Any]].map(String.valueOf)
        val boosts = body.get("boosts")
          .map(_.asInstanceOf[Seq[Any]].map(num))
          .getOrElse(Seq.fill(cols.size)(1.0))
        require(boosts.size == cols.size, "multi_match: one boost per column")
        DslMultiMatch(String.valueOf(body("query")), cols, boosts)
      case other => throw new IllegalArgumentException(
        s"unsupported query DSL type $other " +
          "(match | match_phrase | boolean | boost)")
    }
  }

  /** True when any node of the DSL is a phrase — the caller must then serve
    * positions (an index built with full-text.with-position=true, or
    * query-time postings built with positions). */
  def needsPositions(q: Dsl): Boolean = q match {
    case _: DslPhrase => true
    case _: DslMatch | _: DslMultiMatch => false
    case DslBool(m, s, n) => (m ++ s ++ n).exists(needsPositions)
    case DslBoost(p, n, _) => needsPositions(p) || needsPositions(n)
  }

  /** The index-shaped operations the DSL evaluator composes — implemented by
    * the persisted-index route ([[Indexes.IndexDslScorer]]: term-pruned
    * postings scans, term-stats point reads) and the PK merged-state route
    * ([[PostingsDslScorer]]). Every frame is bounded by the query terms'
    * posting sizes, never the corpus. */
  trait DslScorer {
    def spec: TokenizerSpec
    /** UN-truncated BM25 per-doc scores of `terms` (already normalized). */
    def termScores(terms: Seq[String]): DataFrame // (doc_id, score)
    /** Postings rows of `terms` INCLUDING the positions column. */
    def positionRows(terms: Seq[String]): DataFrame
    def corpus: (Long, Double) // (n docs, avg doc length)
    /** Dictionary terms within `fuzz` edits of `term` (sharing its first
      * `prefixLen` chars), ranked (distance asc, df desc, term), capped. */
    def expand(term: String, fuzz: Int, prefixLen: Int, maxExp: Int): Seq[String]
  }

  /** DSL scorer over an in-memory/merged-state postings frame (the PK-table
    * route: postings derive from the merged snapshot at query time). */
  case class PostingsDslScorer(postings: DataFrame,
                               spec: TokenizerSpec) extends DslScorer {
    lazy val corpus: (Long, Double) = corpusStats(postings)
    def termScores(terms: Seq[String]): DataFrame = {
      val (n, avgdl) = corpus
      bm25Scores(postings.filter(col("term").isin(terms: _*)), n, avgdl)
    }
    def positionRows(terms: Seq[String]): DataFrame = {
      require(postings.columns.contains("positions"),
        "phrase search needs positions (full-text.with-position=true)")
      postings.filter(col("term").isin(terms: _*))
    }
    def expand(term: String, fuzz: Int, prefixLen: Int, maxExp: Int): Seq[String] = {
      val pref = term.take(prefixLen)
      postings.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
        .filter(length(col("term")).between(term.length - fuzz, term.length + fuzz) &&
          (if (prefixLen > 0) col("term").startsWith(pref) else lit(true)))
        .withColumn("__d", levenshtein(col("term"), lit(term)))
        .filter(col("__d") <= fuzz && col("__d") > 0)
        .orderBy(col("__d").asc, col("df").desc, col("term"))
        .limit(maxExp).select("term").collect().map(_.getString(0)).toSeq
    }
  }

  private def innerSum(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("doc_id"), col("score").as("__a"))
      .join(b.select(col("doc_id"), col("score").as("__b")), "doc_id")
      .select(col("doc_id"), (col("__a") + col("__b")).as("score"))

  private def outerSum(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("doc_id"), col("score").as("__a"))
      .join(b.select(col("doc_id"), col("score").as("__b")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("__a"), lit(0.0)) + coalesce(col("__b"), lit(0.0))).as("score"))

  /** Evaluate a DSL query to UN-truncated (doc_id, score) rows. Shapes:
    *  - match Or: one term-pruned scan over all (possibly fuzzy-expanded)
    *    variants; And: per-base-term frames inner-joined (each base term —
    *    or one of its fuzzy variants — must match; BM25 is per-term
    *    additive, so the joined sum equals the Or score on matching docs);
    *  - match_phrase: position-array alignment inside each candidate doc,
    *    BM25 over phrase frequency with df = matching-doc count;
    *  - boolean: musts inner-join (sum), shoulds add via left join (pure
    *    shoulds union-sum), must_nots anti-join;
    *  - boost: negative matches multiply the positive score by
    *    negativeBoost. Every stage is bounded by query-term posting sizes. */
  def evalDsl(q: Dsl, s: DslScorer): DataFrame = q match {
    case m: DslMatch =>
      val baseTerms = normalizeTerms(
        tokenizeQuery(m.query, s.spec), s.spec).distinct
      require(baseTerms.nonEmpty, s"match query '${m.query}' has no terms")
      def variants(t: String): Seq[String] = {
        // AUTO (-1) resolves per term length like the reference/ES family
        val fuzz =
          if (m.fuzziness >= 0) m.fuzziness
          else { val n = t.codePointCount(0, t.length)
                 if (n < 3) 0 else if (n < 6) 1 else 2 }
        if (fuzz <= 0) Seq(t)
        else (t +: s.expand(t, fuzz, m.prefixLength, m.maxExpansions)).distinct
      }
      val frames =
        if (m.operator.equalsIgnoreCase("and") && baseTerms.size > 1)
          baseTerms.map(t => s.termScores(variants(t)))
        else Seq(s.termScores(baseTerms.flatMap(variants).distinct))
      val joined = frames.reduce(innerSum)
      if (m.boost == 1.0) joined
      else joined.select(col("doc_id"), (col("score") * m.boost).as("score"))
    case p: DslPhrase =>
      val ts = normalizeTerms(tokenizeQuery(p.query, s.spec), s.spec)
      require(ts.nonEmpty, s"phrase query '${p.query}' has no terms")
      if (ts.size == 1) return evalDsl(DslMatch(p.query), s)
      val rows = s.positionRows(ts.distinct)
      val frames = ts.zipWithIndex.map { case (t, i) =>
        val f = rows.filter(col("term") === t)
        if (i == 0) f.select(col("doc_id"), col("doc_len"),
          col("positions").as("__p0"))
        else f.select(col("doc_id"), col("positions").as(s"__p$i"))
      }
      val aligned = frames.reduce(_.join(_, "doc_id"))
      // phrase occurrences: starts in term-0's positions whose every
      // successor term has a position in [start+i, start+i+slop] (slop = a
      // shared rightward displacement budget; slop=0 is the exact phrase)
      val tfp = size(filter(col("__p0"), start =>
        (1 until ts.size).map { i =>
          exists(col(s"__p$i"), q =>
            q >= start + i && q <= start + i + p.slop)
        }.reduce(_ && _)))
      val matched = aligned.withColumn("__tfp", tfp).filter(col("__tfp") > 0)
        .select(col("doc_id"), col("doc_len"), col("__tfp"))
      val (n, avgdl) = s.corpus
      // phrase df = matching docs; the matched set is bounded by the rarest
      // term's postings, so the unpartitioned count window stays tiny
      matched
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .select(col("doc_id"),
          (log(lit(1.0) + (lit(n.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5)) *
            col("__tfp") * (lit(1.2) + 1.0) /
            (col("__tfp") + lit(1.2) * (lit(1.0) - 0.75 +
              lit(0.75) * col("doc_len") / lit(avgdl)))).as("score"))
    case DslBool(must, should, mustNot) =>
      require(must.nonEmpty || should.nonEmpty,
        "boolean query needs at least one must or should")
      val base =
        if (must.nonEmpty) must.map(evalDsl(_, s)).reduce(innerSum)
        else should.map(evalDsl(_, s)).reduce(outerSum)
      val withShould =
        if (must.isEmpty) base
        else should.map(evalDsl(_, s)).foldLeft(base) { (acc, sh) =>
          acc.join(sh.withColumnRenamed("score", "__sh"), Seq("doc_id"), "left")
            .select(col("doc_id"),
              (col("score") + coalesce(col("__sh"), lit(0.0))).as("score"))
        }
      mustNot.map(evalDsl(_, s)).foldLeft(withShould)((acc, mn) =>
        acc.join(mn.select("doc_id"), Seq("doc_id"), "left_anti"))
    case DslBoost(pos, neg, nb) =>
      val p = evalDsl(pos, s)
      val n = evalDsl(neg, s).select(col("doc_id"), lit(true).as("__neg"))
      p.join(n, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__neg").isNotNull, col("score") * nb)
            .otherwise(col("score")).as("score"))
    case _: DslMultiMatch => throw new IllegalArgumentException(
      "multi_match needs one scorer per column — supported at the table-path" +
        " TVF (graft_full_text_search('<table>', …)); per-column indexes " +
        "compose through boolean/hybrid otherwise")
  }

  /** Evaluate a top-level multi_match given one scorer per column: each
    * column's Or-match, boost-weighted, union-summed across columns. */
  def evalMultiMatch(m: DslMultiMatch,
                     scorers: Seq[DslScorer]): DataFrame = {
    require(scorers.size == m.columns.size, "one scorer per column")
    m.columns.indices.map { i =>
      evalDsl(DslMatch(m.query, boost = m.boosts(i)), scorers(i))
    }.reduce(outerSum)
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
