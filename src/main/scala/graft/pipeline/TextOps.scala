package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization stats, language ID, quality scoring, fingerprinting, and the
 * hashing primitives behind MinHash/SimHash deduplication.
 *
 * All built from codegen'd `org.apache.spark.sql.functions` (no UDFs on the
 * hot path) so they survive whole-stage codegen at 100 TB. Hash functions are
 * md5-prefix based — deliberately portable (identical values are computable
 * in any engine with md5), which also makes results oracle-checkable.
 */
object TextOps {

  /** Whitespace token count (empty/blank text → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: letter runs split into ≤4-char chunks, each
    * digit and each non-alphanumeric symbol its own token — a deterministic,
    * engine-portable stand-in for a real BPE vocabulary (the pattern avoids
    * lookahead so Java regex and RE2 agree). Tracks real tokenizers within
    * ~±15% on English prose. */
  val bpeishPattern = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    // count-only: regexp_count walks matches without MATERIALIZING an
    // array of every token string the way size(regexp_extract_all) does
    regexp_count(text, lit(bpeishPattern)).cast(LongType)

  /** Duplicate-line ratio (Gopher-style repetition signal): 1 − distinct
    * non-empty lines / non-empty lines; 0 for texts of ≤1 line. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val n = size(lines)
    when(n <= 1, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(lines)).cast("double") / n.cast("double"))
  }

  /** Stopword ratio: fraction of whitespace tokens that are common English
    * stopwords — high-signal quality feature (very low = listy/non-prose,
    * very high = filler). */
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, 0.0).otherwise(
      size(filter(ws, w => stopwords.map(s => w === s).reduce(_ || _)))
        .cast("double") / size(ws).cast("double"))
  }

  /** Words (lowercased, whitespace split). */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Occurrences of a literal substring. */
  def countOccurrences(text: Column, sub: String): Column =
    ((length(text) - length(replace(text, lit(sub), lit("")))) / sub.length)
      .cast(LongType)

  /** Tiny stopword-profile language scorer: count tokens equal to a
    * per-language marker word. Deterministic, portable. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "que", "y"))

  /** Marker-token count over a pre-tokenized word array (one split for all
    * languages — the old per-marker substring-replace form rescanned the full
    * text 4× per language). */
  def langScoreTokens(ws: Column, lang: String): Column =
    size(filter(ws, w => langMarkers(lang).map(m => w === m).reduce(_ || _)))
      .cast(LongType)

  def langScore(text: Column, lang: String): Column =
    langScoreTokens(words(text), lang)

  val langOrder = Seq("en", "de", "fr", "es")

  /** All four language scores in ONE struct, computed by a native Catalyst
    * expression ([[graft.functions.LangMarkerScores]]): a single byte-scan
    * per row, zero token-array materialization, inside whole-stage codegen.
    * Same result as the relational form (kept below for cross-checking). */
  def langScores(text: Column): Column =
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.LangMarkerScores(
        org.apache.spark.sql.graft.SparkShims.expression(text)))

  /** Relational form of [[langScores]] (split + filter + per-language
    * counts) — the reference implementation the native expression is
    * tested against. */
  def langScoresRelational(text: Column): Column = {
    val ws = words(text)
    // pre-filter to the union of all 16 markers first: ONE pass over the full
    // token array; the 4 per-language counts then scan only the marker hits
    // (a few % of tokens), not the whole document again
    val allMarkers = langOrder.flatMap(langMarkers)
    val hits = filter(ws, w => allMarkers.map(m => w === m).reduce(_ || _))
    struct(langOrder.map(l => langScoreTokens(hits, l).as(s"s_$l")): _*)
  }

  /** Predicted language = argmax marker score, 'und' when all zero.
    * Ties break by fixed language order en,de,fr,es. */
  def langIdFromScores(scoresStruct: Column): Column = {
    val scores = langOrder.map(l => scoresStruct.getField(s"s_$l"))
    val best = greatest(scores: _*)
    langOrder.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  def langId(text: Column): Column = langIdFromScores(langScores(text))

  /** Punctuation character count (.,;:!?). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Quality heuristics: word count, mean word length, punctuation ratio,
    * uppercase-start ratio — composed into a [0,1] score. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val nChar = length(text).cast(DoubleType)
    val meanWordLen = when(nTok > 0, nChar / nTok).otherwise(0.0)
    val punctRatio = when(nChar > 0, punctCount(text) / nChar).otherwise(0.0)
    val lenScore = least(nTok / 100.0, lit(1.0))
    val wordLenScore =
      when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    val punctScore = when(punctRatio <= 0.1, 1.0).otherwise(0.5)
    round(lenScore * 0.5 + wordLenScore * 0.3 + punctScore * 0.2, 4)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Portable 32-bit hash: first 8 hex chars of md5(seed || s) as a long.
    * Matches `('0x'||substr(md5(seed||s),1,8))::UBIGINT` in other engines. */
  def h32(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), s)), 1, 8), 16, 10).cast(LongType)

  /** Word n-gram shingles of a document. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " ")))
  }

  /** Per-seed affine constants for MinHash: `a` odd and < 2^31 so
    * `a*h + b` stays inside a signed 64-bit long for h < 2^32 (and inside
    * DuckDB UBIGINT), `b` < 2^32. Same constants on both engine and oracle. */
  def mhA(j: Int): Long = ((2654435761L * (j + 1)) % 2147483647L) | 1L
  def mhB(j: Int): Long = (40503L * (2L * j + 1L)) % 4294967296L

  /** Portable 32-bit hash of each shingle (md5-prefix), computed ONCE per
    * shingle; the k MinHash functions are affine transforms of it. */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol,
      s => conv(substring(md5(s), 1, 8), 16, 10).cast(LongType))

  /** `shingleHashes(shingles(text, n))` as ONE native byte-scan per row
    * ([[graft.functions.ShingleHashes]]): no token array, no per-shingle
    * string materialization — same hashes, same DuckDB-oracle contract. */
  def shingleHashesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.ShingleHashes(
        org.apache.spark.sql.graft.SparkShims.expression(text), n))

  /** MinHash signature from precomputed shingle hashes: min over shingles of
    * `(a_j*h + b_j) mod 2^32` per seed j — one md5 per shingle total, versus
    * the k-md5s-per-shingle direct form. (MinHash per Broder '97; affine
    * rehash family per the MMDS LSH chapter.) */
  def minhashFromHashes(hashCol: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(transform(hashCol,
        h => pmod(lit(mhA(j)) * h + lit(mhB(j)), lit(4294967296L))))
    }: _*)

  /** [[minhashFromHashes]] as ONE native array pass
    * ([[graft.functions.MinhashFromHashes]]): k running minima instead of k
    * `array_min(transform(...))` re-walks — identical signature values. */
  def minhashFromHashesNative(hashCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.MinhashFromHashes(
        org.apache.spark.sql.graft.SparkShims.expression(hashCol), k))

  /** MinHash signature of a shingle array (empty set → nulls).
    *
    * NOT `minhashFromHashes(shingleHashes(c), k)`: inlining the hash array
    * under each of the k `array_min(transform(...))` elements re-evaluates
    * every md5 k times (no common-subexpression elimination across array
    * elements — measured 8x the hash cost at k=8). One `aggregate` pass
    * folds elementwise mins of all k affine transforms over the hash array
    * evaluated ONCE. Pipelines that already stage the hash array in its own
    * projection ([[graft.pipeline.Dedup.minhashLshPairs]]) keep using
    * [[minhashFromHashes]] on the staged column. */
  def minhashSignature(shingleCol: Column, k: Int): Column = {
    val folded = aggregate(
      shingleHashes(shingleCol),
      array((0 until k).map(_ => lit(4294967296L)): _*),
      (acc, h) => zip_with(acc,
        array((0 until k).map(j =>
          pmod(lit(mhA(j)) * h + lit(mhB(j)), lit(4294967296L))): _*),
        (a, b) => least(a, b)))
    // empty shingle set → null mins (the minhashFromHashes contract)
    when(size(shingleCol) > 0, folded)
      .otherwise(array((0 until k).map(_ => lit(null).cast(LongType)): _*))
  }

  /** LSH band key: hash of the signature slice for `band` (rows per band =
    * sigLen / nBands). Docs sharing any band key are candidate duplicates. */
  def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat(lit(band.toString), lit("_"),
      array_join(slice(sig, band * rowsPerBand + 1, rowsPerBand), ",")))

  /** SimHash-32: per bit, sign-sum of token-hash bits; bit set iff the sum is
    * positive. Near-duplicate docs land at small Hamming distance. Token
    * hashes are the portable 32-bit md5 prefix, so the whole fingerprint is
    * reproducible in any md5-capable engine. */
  def simhash32(text: Column): Column =
    org.apache.spark.sql.graft.SparkShims.column(
      graft.functions.SimHash32(
        org.apache.spark.sql.graft.SparkShims.expression(text)))

  /** Relational form of [[simhash32]] — the reference implementation the
    * native expression is tested against. (It re-evaluates the md5 token
    * hashes under each of the 32 per-bit aggregate passes, so it is 30x+
    * the hash cost; kept for cross-checking only.) */
  def simhash32Relational(text: Column): Column = {
    val tokenHashes = transform(words(text),
      w => conv(substring(md5(w), 1, 8), 16, 10).cast(LongType))
    (0 until 32).map { i =>
      val pow2 = 1L << i
      val bitSum = aggregate(tokenHashes, lit(0L), (acc, h) =>
        acc + when(pmod(floor(h / lit(pow2.toDouble)).cast(LongType), lit(2)) === 1, 1L)
          .otherwise(-1L))
      when(bitSum > 0, lit(pow2)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Jaccard similarity of two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column =
    jaccardOnSets(array_distinct(a), array_distinct(b))

  /** [[jaccard]] over arrays that are ALREADY distinct — callers that
    * evaluate per candidate pair distinct once per row instead
    * (ngramJaccardPairs; identical value either way). */
  def jaccardOnSets(ad: Column, bd: Column): Column = {
    val inter = size(array_intersect(ad, bd)).cast(DoubleType)
    val uni = size(array_union(ad, bd)).cast(DoubleType)
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  // --- PII redaction -------------------------------------------------------
  // Training corpora are scrubbed of emails / phone numbers / IP addresses
  // before use. Patterns are deliberately RE2-compatible (no lookahead, no
  // backreferences) so the same regex runs in Spark (java.util.regex) and in
  // any RE2-based engine with identical results — which also makes the op
  // oracle-checkable.

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count of regex matches in `text` (codegen'd, no UDF). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(LongType)

  /** Redact emails, then phone numbers, then IPv4 addresses (that order —
    * emails can embed digit runs; fixed order keeps the result
    * deterministic). Replacement tokens match common corpus conventions. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val p = regexp_replace(e, phonePattern, "<PHONE>")
    regexp_replace(p, ipv4Pattern, "<IP>")
  }

  /** Per-category PII match counts as a struct (email, phone, ipv4) —
    * computed on the ORIGINAL text, before redaction. */
  def piiCounts(text: Column): Column = struct(
    matchCount(text, emailPattern).as("n_email"),
    matchCount(text, phonePattern).as("n_phone"),
    matchCount(text, ipv4Pattern).as("n_ipv4"))

  // --- URL / domain filtering ---------------------------------------------

  /** Host part of a URL: strips scheme, then cuts at the first `/:?#`. */
  def extractDomain(url: Column): Column =
    regexp_extract(regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "^([^/:?#]+)", 1)

  /** Registered domain = last two dot-labels of the host (heuristic: no
    * public-suffix list; fine for filtering pipelines where the blocklist is
    * built with the same rule). */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 2, host)
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  // --- Deterministic hash-based dataset splits ----------------------------

  /** Stable split bucket in [0, buckets): md5-prefix hash of the key — the
    * standard leakage-free train/val/test assignment (same document always
    * lands in the same split, independent of partitioning or row order). */
  def splitBucket(key: Column, buckets: Int = 100): Column =
    pmod(h32(key.cast(StringType), 0), lit(buckets.toLong))

  /** Named split from percentage cut points, e.g. (98, 1) → 98% train,
    * 1% val, remainder test. */
  def splitAssign(key: Column, trainPct: Int = 98, valPct: Int = 1): Column = {
    val b = splitBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  // --- Gopher-style quality rules (Rae et al. 2021, appendix A1.1) --------

  /** Raw signals referenced by the Gopher document-filter rules, one struct
    * per doc so the tokenization passes run once. */
  def gopherSignals(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws).cast(LongType)
    val nChars = length(text).cast(LongType)
    val meanWordLen = when(nWords > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast(DoubleType) /
        nWords.cast(DoubleType)).otherwise(0.0)
    val alphaWords = size(filter(ws, w => w.rlike("[a-z]"))).cast(LongType)
    val nHash = matchCount(text, "#")
    val nEllipsis = matchCount(text, "\\.\\.\\.")
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val bulletLines = size(filter(lines,
      l => trim(l).startsWith("-") || trim(l).startsWith("*"))).cast(LongType)
    val stopHits = size(array_intersect(ws,
      array(stopwords.map(lit): _*))).cast(LongType)
    struct(
      nWords.as("n_words"), nChars.as("n_chars"),
      round(meanWordLen, 4).as("mean_word_len"),
      alphaWords.as("alpha_words"), nHash.as("n_hash"),
      nEllipsis.as("n_ellipsis"), size(lines).cast(LongType).as("n_lines"),
      bulletLines.as("bullet_lines"), stopHits.as("stop_hits"))
  }

  /** Gopher pass/fail: word count in [minWords, maxWords], mean word length
    * in [3, 10], symbol-to-word ratio (# + …) ≤ 0.1, < 90% bullet lines,
    * ≥ 80% words with an alphabetic char, ≥ 2 distinct stopwords. Ratio
    * rules are expressed in exact integer arithmetic (×10, ×5/×4, ×10/×9)
    * so any engine evaluates the boundary cases identically. */
  def gopherPass(sig: Column, minWords: Int = 50,
                 maxWords: Int = 100000): Column =
    sig.getField("n_words").between(minWords, maxWords) &&
      sig.getField("mean_word_len").between(3.0, 10.0) &&
      (sig.getField("n_hash") + sig.getField("n_ellipsis")) * 10 <=
        sig.getField("n_words") &&
      sig.getField("bullet_lines") * 10 < sig.getField("n_lines") * 9 &&
      sig.getField("alpha_words") * 5 >= sig.getField("n_words") * 4 &&
      sig.getField("stop_hits") >= 2
}
