package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Training-corpus assembly operators: deterministic global shuffle keys,
 * stratified sampling (fraction + exact quota), weighted source mixing with
 * epoch repetition, and token-budget shard packing.
 *
 * These are the steps between "filtered documents" and "training manifest"
 * in an LLM data pipeline. All of them are pure functions of a portable
 * md5-prefix hash (TextOps.h32), so results are reproducible across engines
 * (oracle-checkable) and independent of partitioning or row order — the
 * property that makes a 100 TB re-run produce byte-identical shards.
 *
 * Scale posture: no global windows. Sampling is a map-side filter; quota
 * selection pre-filters to O(quota) candidates per stratum before its
 * per-stratum window; shard packing splits the global running sum into an
 * order-aligned bucket cumsum (distributed) plus a tiny bucket-offset
 * prefix sum (driver-size: one row per bucket).
 */
object CorpusOps {

  /** Deterministic shuffle key in [0, 2^32): sorting by (key, tiebreak)
    * yields the canonical training order for a given seed. Exposed as a
    * column (readers sort by it with a distributed range sort) — a global
    * rank column would serialize the sort, the key itself never does. */
  def shuffleKey(key: Column, seed: Int): Column =
    TextOps.h32(key.cast(org.apache.spark.sql.types.StringType), seed)

  /** Per-stratum fraction sampling: keep a row iff its hash falls under the
    * stratum's fraction of the 32-bit hash space. Zero shuffles, exact
    * determinism, approximate counts (binomial around fraction*n). */
  def sampleFraction(df: DataFrame, stratum: Column, key: Column,
                     fractions: Map[String, Double], default: Double = 0.0,
                     seed: Int = 0): DataFrame = {
    val h = shuffleKey(key, seed)
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(stratum === s, lit(f)).otherwise(acc)
    }
    df.filter(h < (frac * pow2_32).cast(LongType))
  }

  private val pow2_32 = lit(4294967296L)

  /** Exact per-stratum quotas: the `quota` rows with the smallest hashes in
    * each stratum (deterministic "random" selection). A candidate pre-filter
    * keeps only hashes below `slack`× the expected quota-th hash, so the
    * per-stratum window sees O(slack*quota) rows instead of the stratum —
    * the filter is part of the operator's DEFINITION (an identical oracle
    * can reproduce it), not a heuristic that can disagree with one. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, key: Column,
                      quotas: Map[String, Long], seed: Int = 0,
                      slack: Double = 3.0): DataFrame = {
    val h = shuffleKey(key, seed)
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col(stratumCol) === s, lit(q)).otherwise(acc)
    }
    val counts = df.groupBy(col(stratumCol).as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
    val withCnt = df.join(broadcast(counts),
      col(stratumCol) === col("__stratum"), "left")
    val threshold = least(pow2_32,
      ceil(pow2_32 * lit(slack) * quota.cast("double") /
        greatest(col("__cnt"), quota, lit(1L)).cast("double")).cast(LongType))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h.asc, key.asc)
    withCnt.filter(h < threshold)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn", "__stratum", "__cnt")
  }

  /** Weighted source mixing: repeat each document `weight(source)` times —
    * the integer part as full epochs, the fractional part as a hash-sampled
    * extra epoch (e.g. weight 2.25 → every doc twice, a deterministic
    * quarter of docs a third time). Output adds `__epoch` (1-based) and
    * `__order` (shuffle key spanning copies, so epochs interleave in the
    * training order instead of concatenating). Map-side only. */
  def mixSources(df: DataFrame, source: Column, key: Column,
                 weights: Map[String, Double], default: Double = 1.0,
                 seed: Int = 0): DataFrame = {
    val w = weights.foldLeft(lit(default)) { case (acc, (s, x)) =>
      when(source === s, lit(x)).otherwise(acc)
    }
    val whole = floor(w).cast(LongType)
    val extra = when(
      shuffleKey(key, seed + 1) < ((w - floor(w)) * pow2_32).cast(LongType),
      1L).otherwise(0L)
    val copies = (whole + extra).cast("int")
    // sequence(1, 0) yields a DESCENDING [1, 0] in Spark, not empty — guard
    // zero-copy docs explicitly (explode drops the empty array)
    df.withColumn("__epoch", explode(when(copies >= 1,
        sequence(lit(1), copies)).otherwise(array().cast("array<int>"))))
      .withColumn("__order",
        shuffleKey(concat(key.cast("string"), lit(":"), col("__epoch")), seed))
  }

  /**
   * Sliding-window document chunking (training-sample / RAG prep): split
   * on whitespace, emit windows of `chunkTokens` tokens advancing by
   * `chunkTokens - overlap`. A window starts at offset s ∈ {0, step, 2·step,
   * …} while s == 0 or s + overlap < n (a tail window fully contained in
   * the previous one is not emitted). Adds `__chunk` (0-based index),
   * `__chunk_text`, `__n_tok`. Map-side only — explode of a per-row
   * transform, no shuffle; token arrays never leave the task.
   */
  def chunkDocs(df: DataFrame, textCol: String, chunkTokens: Int,
                overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunk")
    val step = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    val starts = filter(sequence(lit(0), greatest(n - 1, lit(0)), lit(step)),
      s => s === 0 || (s + overlap) < n)
    df.withColumn("__toks", toks)
      .withColumn("__s", explode(starts))
      .withColumn("__chunk", (col("__s") / step).cast("int"))
      .withColumn("__chunk_text",
        array_join(slice(col("__toks"), col("__s") + 1, lit(chunkTokens)), " "))
      .withColumn("__n_tok",
        least(lit(chunkTokens), size(col("__toks")) - col("__s")))
      .drop("__toks", "__s")
  }

  /** Token-budget shard packing: lay documents out in shuffle order and cut
    * a new shard every `budget` tokens (a document belongs to the shard its
    * FIRST token lands in). Equivalent to a global running sum, computed
    * scalably: the hash's high bits give an order-aligned coarse bucket, the
    * running sum = within-bucket cumsum (distributed window) + the sum of
    * all earlier buckets (tiny prefix sum, one row per bucket, broadcast
    * back). Identical to the serial definition because bucket order is a
    * prefix of hash order. */
  def packShards(df: DataFrame, key: Column, tokens: Column, budget: Long,
                 seed: Int = 0, buckets: Int = 256): DataFrame = {
    require(Integer.bitCount(buckets) == 1, "buckets must be a power of two")
    val h = shuffleKey(key, seed)
    val b = (h / (4294967296L / buckets)).cast(LongType)
    val withB = df.withColumn("__h", h).withColumn("__b", b)
    val offsets = withB.groupBy("__b").agg(sum(tokens).as("__btok"))
      .withColumn("__offset",
        coalesce(sum(col("__btok")).over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__btok")
    val wIn = Window.partitionBy("__b").orderBy(col("__h").asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), "__b")
      .withColumn("__start", col("__offset") + sum(tokens).over(wIn) - tokens)
      .withColumn("__shard", floor(col("__start") / budget))
      .drop("__b", "__offset")
  }

  /**
   * Unigram-LM perplexity proxy (the CCNet-style quality signal: documents
   * whose tokens are improbable under a corpus language model are noise):
   * fit a unigram model ON the corpus itself (count every token, one
   * shuffle), then score each document by the mean negative log-likelihood
   * of its tokens, nats/token. Returns (id, n_tokens, nll).
   *
   * Scale shape: token counting is one hash shuffle on the token; scoring
   * re-derives each token's count via an equi-join of the exploded corpus
   * against the count table (token-hash co-partitioned — at 100 TB both
   * sides shuffle once on the same key, no broadcast of a possibly-huge
   * vocabulary), then one per-doc aggregation. The model could equally be a
   * persisted graft table fit on a reference corpus; fitting on the scored
   * corpus keeps the op self-contained.
   *
   * Determinism: `ln` of integer counts + one mean, rounded to 3 decimals —
   * bit-agreement across engines' libm at that precision.
   */
  def unigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextOps.words(col(textCol))).as("__tok"))
    val counts = toks.groupBy("__tok").agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum("__cnt")).head().getLong(0).toDouble
    toks.join(counts, "__tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(lit(math.log(total)) - avg(log(col("__cnt"))), 3).as("nll"))
  }
}
