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
   * Selective-filter cliff: a filter that keeps few rows can empty out the
   * probed clusters (filter × nprobe interplay — the survivors live in
   * clusters the query vector does not probe). When a filtered probe yields
   * fewer than k candidates the search ESCALATES to exact within the
   * filter-surviving files (all clusters), so selective filters trade the
   * probe bound for full recall instead of returning a starved result.
   * AnnRecallSpec sweeps recall@10 across filter selectivities.
   *
   * Broadcast posture: the BM25 candidate set is size-gated by the query
   * terms' summed document frequency ([[Indexes.termDfSum]], a driver-side
   * point read). Small sets broadcast into the filter-pruned main scan; a
   * high-df term's candidates (potentially millions of rows) join without a
   * hint and AQE plans from actual sizes.
   */
  def search(spark: SparkSession, loc: String, k: Int,
             vector: Option[Seq[Float]] = None, terms: Seq[String] = Nil,
             filter: Option[Column] = None, nprobe: Int = 8,
             metric: String = "cosine", rrfK0: Int = 60,
             broadcastDfLimit: Long = 1000000L): DataFrame = {
    require(vector.nonEmpty || terms.nonEmpty, "empty es-index query")
    val m = readMeta(spark, loc)
    val t = GraftTable.load(spark, loc)
    val id = col(m.idCol)

    val vecTop: Option[DataFrame] = vector.map { q =>
      val e = m.embedCol.getOrElse(
        throw new IllegalArgumentException("index has no vector column"))
      val model = Indexes.loadIvfModel(spark, loc)
      def topkWithin(clusterPred: Option[Column]): DataFrame = {
        val pred = (clusterPred.toSeq ++ filter.toSeq).reduceOption(_ && _)
        Similarity.bruteForceTopK(t.read(filter = pred), e, q, k,
          metric, "score").select(id.as("id"), col("score"))
      }
      val probes = model.nearestClusters(q, nprobe)
      val probed = topkWithin(Some(col("__ivf_cluster").isin(probes: _*)))
      if (filter.isEmpty || nprobe >= model.centroids.length) probed
      else {
        // top-k is at most k rows — materialize once to both count the
        // filter-surviving candidates and serve the non-escalated result
        // without re-running the probe scan
        val rows = probed.collect()
        if (rows.length >= k)
          spark.createDataFrame(java.util.Arrays.asList(rows: _*), probed.schema)
        else topkWithin(None) // starved probes: exact within the filter
      }
    }

    val txtTop: Option[DataFrame] = if (terms.isEmpty) None else Some {
      require(m.textCol.nonEmpty, "index has no text column")
      val scores = Indexes.fullTextScores(spark, textLoc(loc), terms)
      val masked = filter match {
        case Some(f) =>
          // candidate side is term-pruned (docs containing a query term) —
          // broadcast it into the filter-pruned main scan when the term-stats
          // point read proves it small; past the gate, no hint (AQE plans it)
          val cand = t.read(filter = Some(f)).select(id.as("doc_id"))
          if (Indexes.termDfSum(spark, textLoc(loc), terms) <= broadcastDfLimit)
            cand.join(broadcast(scores), "doc_id")
          else cand.join(scores, "doc_id")
        case None => scores
      }
      masked.orderBy(col("score").desc, col("doc_id")).limit(k)
        .select(col("doc_id").as("id"), col("score"))
    }

    val out = (vecTop, txtTop) match {
      case (Some(v), Some(x)) =>
        FullText.rrfFuse(
          FullText.ranked(v, "id", "score"),
          FullText.ranked(x, "id", "score"), "id", rrfK0)
          .select(col("id"), col("rrf").as("score"))
      case (Some(v), None) => v
      case (None, Some(x)) => x
      case _ => throw new IllegalStateException("unreachable")
    }
    out.orderBy(col("score").desc, col("id")).limit(k)
      .withColumnRenamed("id", m.idCol)
  }
}
