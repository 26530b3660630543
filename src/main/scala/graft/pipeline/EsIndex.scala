package graft.pipeline

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ES-INDEX: one composite index over a primary VECTOR column plus companion
 * text / keyword / scalar / date columns, queried with a filter that masks
 * candidates on every modality (capability of paimon's es-index,
 * paimon-eslib/README.md:20-35, eslib/index/ESIndexGlobalIndexer.java —
 * there a Lucene index per bucket; here re-expressed as graft index tables
 * so the manifest machinery does the pruning Lucene segments would):
 *
 *  - MAIN table at `loc`: all indexed rows, IVF-cluster PARTITIONED when a
 *    vector column is indexed, companion columns stored alongside. A
 *    filtered vector query = partition pruning (nprobe clusters) + stats
 *    file-skipping on scalar/date companions + bloom file-index skipping on
 *    keyword companions + in-scan residual predicate. Nothing outside the
 *    probed clusters' surviving files is read.
 *  - TEXT postings at `loc + "__text"` ([[Indexes.buildFullText]]):
 *    term-range-clustered BM25 postings + aggregation-engine term stats.
 *    A text query scans only the query terms' posting files; the filter is
 *    applied by joining candidates back to the (filter-pruned) main table
 *    — ES semantics: the filter masks candidates, corpus statistics stay
 *    whole-index.
 *
 * Hybrid queries (vector AND text under one filter) fuse by reciprocal-rank
 * fusion ([[FullText.rrfFuse]]), the reference's `rrf` ranker.
 *
 * Scale posture: the index is a partitioned table, so builds are one
 * distributed write, appends assign only the delta against existing
 * centroids ([[append]]), and both query modalities read a pruned subset of
 * files bounded by the probe set / posting lists, never the corpus.
 */
object EsIndex {

  private def textLoc(loc: String) = loc + "__text"
  private def metaPath(loc: String) = new Path(loc, "index/es-index.json")

  case class Meta(idCol: String, embedCol: Option[String],
                  textCol: Option[String], keywordCols: Seq[String])

  private def writeMeta(t: GraftTable, loc: String, m: Meta): Unit =
    t.sm.writeString(metaPath(loc), Json.write(Map(
      "idCol" -> m.idCol, "embedCol" -> m.embedCol.orNull,
      "textCol" -> m.textCol.orNull, "keywordCols" -> m.keywordCols)))

  def readMeta(spark: SparkSession, loc: String): Meta = {
    val t = GraftTable.load(spark, loc)
    val m = Json.read(t.sm.readString(metaPath(loc)),
      classOf[Map[String, Any]])
    Meta(m("idCol").asInstanceOf[String],
      Option(m.getOrElse("embedCol", null).asInstanceOf[String]),
      Option(m.getOrElse("textCol", null).asInstanceOf[String]),
      m.getOrElse("keywordCols", Nil).asInstanceOf[Seq[String]])
  }

  /** Build (or replace) the composite index over `df`. Companion columns are
    * everything in `df` besides the indexed ones; `keywordCols` additionally
    * get per-file bloom indexes (equality skipping beyond min/max stats —
    * high-cardinality keywords defeat range stats). The text column, when
    * given, is indexed as BM25 postings but NOT stored in the main table
    * (the reference stores companion text out of the doc-values path too).
    */
  def build(spark: SparkSession, df: DataFrame, idCol: String, loc: String,
            embedCol: Option[String] = None, textCol: Option[String] = None,
            keywordCols: Seq[String] = Nil, nClusters: Int = 16,
            seed: Long = 42L): GraftTable = {
    require(embedCol.nonEmpty || textCol.nonEmpty,
      "es-index needs a vector and/or a text column")
    val mainDf = textCol.fold(df)(df.drop(_))
    val opts = if (keywordCols.nonEmpty)
      Map("file-index.bloom-filter.columns" -> keywordCols.mkString(","))
    else Map.empty[String, String]
    val t = embedCol match {
      case Some(e) =>
        Indexes.buildIvf(spark, mainDf, e, loc, nClusters, seed, opts)
      case None =>
        val tt = GraftTable.createOrReplace(spark, loc, mainDf.schema,
          TableConfig(options = opts))
        tt.write(mainDf); tt
    }
    textCol.foreach { tc =>
      Indexes.buildFullText(spark, df.select(col(idCol), col(tc)),
        idCol, tc, textLoc(loc))
    }
    writeMeta(t, loc, Meta(idCol, embedCol, textCol, keywordCols))
    t
  }

  /** Incremental maintenance: assign the batch against EXISTING centroids
    * and append; merge the batch's posting/term-stat deltas. Pays for the
    * delta only — same posture as [[Indexes.appendToIvf]] /
    * [[Indexes.appendToFullText]]. */
  def append(spark: SparkSession, df: DataFrame, loc: String): Unit = {
    val m = readMeta(spark, loc)
    val mainDf = m.textCol.fold(df)(df.drop(_))
    m.embedCol match {
      case Some(e) => Indexes.appendToIvf(spark, mainDf, e, loc)
      case None    => GraftTable.load(spark, loc).write(mainDf)
    }
    m.textCol.foreach { tc =>
      Indexes.appendToFullText(spark, df.select(col(m.idCol), col(tc)),
        m.idCol, tc, textLoc(loc))
    }
  }

  /**
   * Composite search: any of {vector, terms} plus an optional companion
   * filter. Returns (id, score) top-k:
   *  - vector only  → cosine/dot/l2 top-k within the probed clusters'
   *    filter-surviving files (`score` = similarity)
   *  - terms only   → BM25 top-k over filter-surviving candidates
   *    (`score` = BM25)
   *  - both         → RRF fusion of the two rankings (`score` = rrf)
   * `nprobe` bounds the vector read; pass `nClusters` for exact search.
   *
   * Selective-filter escalation: a filter that keeps few rows decimates the
   * probed clusters' candidate pool (filter × nprobe interplay — most
   * survivors live in clusters the query vector does not probe), which
   * silently degrades recall long before the probe is fully starved. The
   * search therefore requires `escalateFactor × k` filter-surviving
   * candidates inside the probed clusters before trusting the approximate
   * result — candidates are counted with a partition-pruned count scan (a
   * distributed count; nothing is collected) and nprobe widens ×4 per step,
   * exact (all clusters) only as the last rung. A moderately selective
   * filter pays one or two wider probes; a filter that starves every rung
   * ends exact with full recall. Cost shape: each rung's count scan is
   * COLUMN-PRUNED to the filter + cluster columns (no vector bytes read —
   * the expensive top-k scan that follows reads embeddings exactly once,
   * at the final rung), and an index smaller than ~escalateFactor·k·
   * (nClusters/nprobe) rows deliberately rides the ladder to exact — at
   * that size the exact scan is as cheap as the probe. Filtered
   * approximate searches are therefore eager at call time (the count jobs
   * run in `search`), but the returned frame itself stays lazy. AnnRecallSpec's "es-index filtered
   * recall@10" test sweeps filter selectivities {50%, 10%, 1%} at the
   * default nprobe (all ≥0.9) and asserts a starved filter comes back
   * exact.
   *
   * Broadcast posture: the BM25 candidate set is size-gated by the query
   * terms' summed document frequency (one point read of the term-stats
   * table, reused for the BM25 idf join — [[Indexes.termDfRows]]). Small
   * sets broadcast into the filter-pruned main scan; past the gate the join
   * carries no hint and AQE plans from actual sizes. The default gate is
   * 100k rows ≈ 5 MB at ~48 B per (doc_id, score) row — inside Spark's
   * ~10 MB broadcast guidance, unlike a row-count-only 1M gate.
   */
  def search(spark: SparkSession, loc: String, k: Int,
             vector: Option[Seq[Float]] = None, terms: Seq[String] = Nil,
             filter: Option[Column] = None, nprobe: Int = 8,
             metric: String = "cosine", rrfK0: Int = 60,
             broadcastDfLimit: Long = 100000L,
             escalateFactor: Int = 10,
             ranker: String = "rrf"): DataFrame =
    searchDetail(spark, loc, k, vector, terms, filter, nprobe, metric,
      rrfK0, broadcastDfLimit, escalateFactor, ranker)._1

  /** [[search]] plus the vector route's EFFECTIVE nprobe after escalation
    * (0 when no vector query; == nClusters means exact). Tests use this to
    * assert progressive escalation stops before an index-wide exact scan. */
  private[graft] def searchDetail(spark: SparkSession, loc: String, k: Int,
             vector: Option[Seq[Float]] = None, terms: Seq[String] = Nil,
             filter: Option[Column] = None, nprobe: Int = 8,
             metric: String = "cosine", rrfK0: Int = 60,
             broadcastDfLimit: Long = 100000L,
             escalateFactor: Int = 10,
             ranker: String = "rrf"): (DataFrame, Int) = {
    require(vector.nonEmpty || terms.nonEmpty, "empty es-index query")
    val m = readMeta(spark, loc)
    val t = GraftTable.load(spark, loc)
    val id = col(m.idCol)
    var effNprobe = 0

    val vecTop: Option[DataFrame] = vector.map { q =>
      val e = m.embedCol.getOrElse(
        throw new IllegalArgumentException("index has no vector column"))
      val model = Indexes.loadIvfModel(spark, loc)
      // the escalation ladder and the probed read are SHARED with the plain
      // persisted IVF/RQ searches (Indexes.escalateNprobe / readProbed) —
      // one place owns the recall contract and the IN-list→join flip
      val np = Indexes.escalateNprobe(t, model, q, k, nprobe, filter,
        escalateFactor)
      effNprobe = np
      val hits = Indexes.readProbed(t, model.nearestClusters(q, np),
        model.centroids.length, filter)
      Similarity.bruteForceTopK(hits, e, q, k, metric, "score",
        tieBreak = Seq(id))
        .select(id.as("id"), col("score"))
    }

    val txtTop: Option[DataFrame] = if (terms.isEmpty) None else Some {
      require(m.textCol.nonEmpty, "index has no text column")
      // one point read of (term, df) rows serves both the BM25 idf join and
      // the driver-side broadcast gate (sum(df) upper-bounds candidates)
      val dfRows = Indexes.termDfRows(spark, textLoc(loc), terms)
      val dfSum = dfRows.map(_.getLong(1)).sum
      val scores = Indexes.fullTextScoresFromDf(spark, textLoc(loc), terms, dfRows)
      val masked = filter match {
        case Some(f) =>
          // candidate side is term-pruned (docs containing a query term) —
          // broadcast it into the filter-pruned main scan when the term-stats
          // point read proves it small; past the gate, no hint (AQE plans it)
          val cand = t.read(filter = Some(f)).select(id.as("doc_id"))
          if (dfSum <= broadcastDfLimit)
            cand.join(broadcast(scores), "doc_id")
          else cand.join(scores, "doc_id")
        case None => scores
      }
      masked.orderBy(col("score").desc, col("doc_id")).limit(k)
        .select(col("doc_id").as("id"), col("score"))
    }

    val out = (vecTop, txtTop) match {
      case (Some(v), Some(x)) =>
        // hybrid fusion ranker (reference hybrid_search rankers):
        // rrf (default), mrr, weighted_score — shared with the
        // separate-index hybrid search ([[FullText.fuse]])
        FullText.fuse(v, x, "id", ranker, rrfK0)
      case (Some(v), None) => v
      case (None, Some(x)) => x
      case _ => throw new IllegalStateException("unreachable")
    }
    (out.orderBy(col("score").desc, col("id")).limit(k)
      .withColumnRenamed("id", m.idCol), effNprobe)
  }
}
