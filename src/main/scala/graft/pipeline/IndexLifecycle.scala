package graft.pipeline

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SQL lifecycle for the SEARCH index families — the `CALL
 * sys.create_global_index / refresh_global_index / drop_global_index`
 * surface of the reference with `index_type => 'ivf' | 'full-text' | 'es'`
 * (docs/docs/multimodal-table/global-index.mdx:119-175; btree/bitmap are
 * [[GlobalIndex]]). Indexes live at CONVENTIONAL locations inside the table
 * directory and write the table→index back-references
 * ([[PkSearch.VectorRef]]/[[PkSearch.FullTextRef]]), so after one CALL the
 * existing search TVFs route the TABLE path with no further wiring:
 *
 * {{{
 *   CALL <table>.create_global_index(index_column => 'embedding',
 *                                    index_type => 'ivf', clusters => '16')
 *   SELECT * FROM graft_vector_search('<table>', 10, 4, array(...))
 * }}}
 *
 * Build/refresh posture by table kind:
 *  - PRIMARY-KEY table + ivf → [[PkSearch.buildVectorIndex]] (file-aligned,
 *    changelog-reconciled at query time); refresh = re-align rebuild.
 *  - PK table + full-text → [[PkSearch.registerFullText]] (merged-state
 *    postings are derived at query time — nothing to build or refresh).
 *  - APPEND table + ivf/full-text/es → persisted index over the current
 *    snapshot plus a source-snapshot sidecar; REFRESH assigns/tokenizes
 *    only the `incremental(s0, cur)` delta — maintenance pays O(delta),
 *    never O(table) — and falls back to a rebuild over non-append history
 *    ([[appendOnlySince]]).
 */
object IndexLifecycle {

  def vectorIndexLoc(tableLoc: String, col: String): String =
    s"$tableLoc/index/ivf-$col"
  def fullTextIndexLoc(tableLoc: String, col: String): String =
    s"$tableLoc/index/fulltext-$col"

  /** Source-snapshot sidecar for append-table indexes (what refresh diffs
    * against). PK vector indexes keep their own (pk-search.json). */
  private def sourcePath(idxLoc: String) = new Path(idxLoc, "index/source.json")

  private def writeSource(spark: SparkSession, idxLoc: String, snap: Long): Unit =
    GraftTable.load(spark, idxLoc).sm.writeString(sourcePath(idxLoc),
      Json.write(Map("sourceSnapshot" -> snap)))

  private def readSource(spark: SparkSession, idxLoc: String): Long = {
    val t = GraftTable.load(spark, idxLoc)
    Json.mapper.readValue(t.sm.readString(sourcePath(idxLoc)),
      classOf[java.util.Map[String, Any]])
      .get("sourceSnapshot").asInstanceOf[Number].longValue()
  }

  private def currentSnapshot(tbl: GraftTable): Long =
    tbl.sm.latestSnapshotId.getOrElse(
      throw new IllegalStateException(s"${tbl.location}: empty table"))

  /** Delta refresh is sound only over pure-APPEND history: an OVERWRITE
    * commit (row-level DELETE/UPDATE on an append table) rewrites files, so
    * its delta re-lists the surviving rows — appending that delta would
    * DUPLICATE them in the index while the removed rows kept scoring.
    * (COMPACT snapshots are already excluded by `incremental`.) UNREADABLE
    * history (snapshots expired between the index build and the refresh —
    * routine at scale, where expire_snapshots runs on a schedule) also
    * answers false: the delta cannot be read, so refresh falls back to the
    * rebuild branch instead of throwing — same posture as
    * [[PkSearch.refreshVectorIndex]]'s catch-and-rebuild. */
  private def appendOnlySince(tbl: GraftTable, s0: Long, cur: Long): Boolean =
    try (s0 + 1 to cur).forall(id => tbl.sm.readSnapshot(id).kind != "OVERWRITE")
    catch { case _: Exception => false }

  /** CREATE index_type=ivf: file-aligned for PK tables, persisted
    * IVF-partitioned index + source sidecar for append tables. Either way
    * the back-reference makes `graft_vector_search('<table>', …)` work.
    * `nClusters`/`metric` resolve CALL argument → per-field table option
    * (`fields.<col>.nlist` / `fields.<col>.distance.metric`) → shared table
    * option (`ivf.nlist` / `ivf.distance.metric`) → default — the
    * reference's per-field option precedence (vector.mdx "Per-Field
    * Options"); the metric is recorded in the index meta and becomes the
    * TABLE path's query metric. */
  def createVector(tbl: GraftTable, embedCol: String,
                   nClusters: Option[Int] = None, seed: Long = 42L,
                   metric: Option[String] = None): String = {
    def opt(field: String, shared: String): Option[String] =
      tbl.config.options.get(s"fields.$embedCol.$field")
        .orElse(tbl.config.options.get(shared))
    val n = nClusters.orElse(opt("nlist", "ivf.nlist").map(_.toInt)).getOrElse(16)
    val m = Indexes.normalizeMetric(
      metric.orElse(opt("distance.metric", "ivf.distance.metric"))
        .getOrElse("cosine"))
    val loc = vectorIndexLoc(tbl.location, embedCol)
    if (tbl.config.isPrimaryKeyed) {
      PkSearch.buildVectorIndex(tbl, embedCol, loc, n, seed, m)
      s"file-aligned ivf index built at $loc (metric $m)"
    } else {
      val snap = currentSnapshot(tbl)
      Indexes.buildIvf(tbl.spark, tbl.read(None, Some(snap)), embedCol, loc,
        n, seed, metric = m)
      writeSource(tbl.spark, loc, snap)
      PkSearch.writeVectorRef(tbl, PkSearch.VectorRef(loc, embedCol, "plain"))
      s"ivf index built at $loc (snapshot $snap, metric $m)"
    }
  }

  /** CREATE index_type=ivf-rq: the persisted COMPRESSED vector family
    * (reference paimon-vindex `ivf-rq`, vector.mdx:58,190) — unit-space
    * cluster partitions + m-byte residual codes per row; search is
    * partition-pruned probe → ADC over code bytes → exact re-rank (honors
    * per-query ivf.refine_factor). Option resolution follows the
    * reference's `<index-type>.*` spellings (vector.mdx:179-192):
    * `ivf-rq.nlist`, `ivf-rq.distance.metric`, `ivf-rq.rq.bits` (code
    * width per subspace — ks = 2^bits, rebuild required to change),
    * `ivf-rq.pq.m` (subspace count), `ivf-rq.dimension` /
    * `fields.<col>.dimension` (else probed from the data); CALL argument →
    * per-field table option → shared table option → default. Delta refresh
    * assigns + encodes only appended rows against the stored model
    * ([[refreshVector]] dispatches on the index kind). PK tables keep the
    * file-aligned exact family — rejected loudly here. */
  def createVectorRq(tbl: GraftTable, embedCol: String,
                     callOpts: Map[String, String] = Map.empty): String = {
    require(!tbl.config.isPrimaryKeyed,
      "ivf-rq is the append-table compressed index; a PK table keeps the " +
        "file-aligned exact family (index_type => 'ivf')")
    def opt(field: String): Option[String] =
      callOpts.get(s"ivf-rq.$field").orElse(callOpts.get(field))
        .orElse(tbl.config.options.get(s"fields.$embedCol.$field"))
        .orElse(tbl.config.options.get(s"ivf-rq.$field"))
    val n = opt("nlist").orElse(callOpts.get("clusters")).map(_.toInt)
      .getOrElse(16)
    val metric = Indexes.normalizeMetric(
      opt("distance.metric").orElse(callOpts.get("metric")).getOrElse("cosine"))
    val bits = opt("rq.bits").map(_.toInt).getOrElse(4)
    require(bits >= 1 && bits <= 8, s"ivf-rq.rq.bits must be 1..8, got $bits")
    val m = opt("pq.m").map(_.toInt).getOrElse(8)
    val seed = callOpts.getOrElse("seed", "42").toLong
    val snap = currentSnapshot(tbl)
    val df = tbl.read(None, Some(snap))
    val dim = opt("dimension").map(_.toInt)
      .getOrElse(df.select(embedCol).first().getSeq[Float](0).size)
    require(dim % m == 0, s"dimension $dim must divide by pq.m $m")
    val loc = vectorIndexLoc(tbl.location, embedCol)
    Indexes.buildIvfRq(tbl.spark, df, embedCol, loc, dim, n, m,
      ks = 1 << bits, seed = seed, metric = metric)
    writeSource(tbl.spark, loc, snap)
    PkSearch.writeVectorRef(tbl, PkSearch.VectorRef(loc, embedCol, "plain"))
    s"ivf-rq index built at $loc (snapshot $snap, metric $metric, " +
      s"nlist $n, bits $bits)"
  }

  /** Query entry for a PLAIN (persisted ivf / ivf-rq) vector ref honoring
    * the reference's `vector-index.search-mode` table option
    * (global-index.mdx:314-359; legacy fallback `global-index.search-mode`,
    * per-field `fields.<col>.search-mode` wins): `fast` (default) serves
    * the indexed snapshot only; `full` / `detail` also cover rows appended
    * since the index's recorded snapshot with an EXACT brute-force over the
    * delta (the reference's raw-data search of unindexed row ranges),
    * merged with the index candidates and re-top-k'd — vector scores are
    * corpus-independent, so the merge is exact. Non-append history since
    * the build (deletes/rewrites) falls back to the indexed snapshot until
    * the next refresh rebuilds. */
  def vectorQuery(tbl: GraftTable, ref: PkSearch.VectorRef, vec: Seq[Float],
                  k: Int, nprobe: Int, rerank: Int = 0,
                  filter: Option[org.apache.spark.sql.Column] = None)
      : org.apache.spark.sql.DataFrame = {
    val spark = tbl.spark
    val loc = ref.idxLoc
    val metric = Indexes.ivfMetric(spark, loc)
    def idxSearch() =
      if (Indexes.isRqIndex(spark, loc))
        Indexes.rqSearch(spark, loc, ref.embedCol, vec, k, nprobe,
          rerank = rerank, metric = metric, scoreCol = "score", filter = filter)
      else
        Indexes.ivfSearch(spark, loc, ref.embedCol, vec, k, nprobe,
          metric = metric, scoreCol = "score", filter = filter)
    val mode = tbl.config.options.getOrElse(
      s"fields.${ref.embedCol}.search-mode",
      tbl.config.options.getOrElse("vector-index.search-mode",
        tbl.config.options.getOrElse("global-index.search-mode", "fast")))
    require(Seq("fast", "full", "detail").contains(mode),
      s"unknown vector-index.search-mode $mode (fast | full | detail)")
    lazy val s0 = readSource(spark, loc)
    lazy val cur = currentSnapshot(tbl)
    if (mode == "fast" || cur == s0 || !appendOnlySince(tbl, s0, cur))
      idxSearch()
    else {
      val delta0 = tbl.incremental(s0, cur)
      val delta = filter.map(delta0.filter).getOrElse(delta0)
      val deltaTop =
        Similarity.bruteForceTopK(delta, ref.embedCol, vec, k, metric, "score")
      val ord = if (metric == "l2") col("score").asc else col("score").desc
      idxSearch().unionByName(deltaTop).orderBy(ord).limit(k)
    }
  }

  /** Resolve ONE of the table's per-column vector refs: an explicit
    * `index_column` wins; with none given the sole index is unambiguous and
    * several indexed columns are an error naming them. */
  private def resolveVectorRef(tbl: GraftTable,
                               column: Option[String]): PkSearch.VectorRef = {
    val refs = PkSearch.vectorRefs(tbl)
    if (refs.isEmpty)
      throw new IllegalArgumentException(s"${tbl.location}: no vector index")
    column match {
      case Some(c) => refs.getOrElse(c, throw new IllegalArgumentException(
        s"${tbl.location}: no vector index on column $c " +
          s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})"))
      case None if refs.size == 1 => refs.values.head
      case None => throw new IllegalArgumentException(
        s"${tbl.location}: multiple vector indexes " +
          s"(${refs.keys.toSeq.sorted.mkString(", ")}) — pass index_column")
    }
  }

  private def resolveFullTextRef(tbl: GraftTable,
                                 column: Option[String]): PkSearch.FullTextRef = {
    val refs = PkSearch.fullTextRefs(tbl)
    if (refs.isEmpty)
      throw new IllegalArgumentException(s"${tbl.location}: no full-text index")
    column match {
      case Some(c) => refs.getOrElse(c, throw new IllegalArgumentException(
        s"${tbl.location}: no full-text index on column $c " +
          s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})"))
      case None if refs.size == 1 => refs.values.head
      case None => throw new IllegalArgumentException(
        s"${tbl.location}: multiple full-text indexes " +
          s"(${refs.keys.toSeq.sorted.mkString(", ")}) — pass index_column")
    }
  }

  /** REFRESH index_type=ivf: PK tables DELTA-align when the changed key set
    * is small — COW-delete the touched keys out of the index and append
    * their CURRENT merged rows assigned to the existing centroids, then
    * bump the source snapshot so query-time reconciliation goes back to
    * zero cost. A wide delta (or an expired changelog) falls back to a
    * rebuild. Append tables assign ONLY the rows appended since the
    * recorded snapshot. `column` names the index when several embedding
    * columns are indexed. */
  def refreshVector(tbl: GraftTable, column: Option[String] = None): String = {
    val ref = resolveVectorRef(tbl, column)
    if (ref.kind == "pk") {
      PkSearch.refreshVectorIndex(tbl, ref.idxLoc, ref.embedCol)
    } else {
      val s0 = readSource(tbl.spark, ref.idxLoc)
      val cur = currentSnapshot(tbl)
      if (cur == s0) return s"ivf index already at snapshot $cur"
      // the ref points at either family: dispatch on the persisted kind so
      // an ivf-rq index never degrades to plain ivf on rebuild (and its
      // delta never hits the plain append path, whose schema lacks codes)
      val isRq = Indexes.isRqIndex(tbl.spark, ref.idxLoc)
      val kind = if (isRq) "ivf-rq" else "ivf"
      if (!appendOnlySince(tbl, s0, cur)) {
        // a rebuild PRESERVES the index's build-time metric and, for the
        // compressed family, its recorded nlist / subspace / code-width
        val metric = Indexes.ivfMetric(tbl.spark, ref.idxLoc)
        if (isRq) {
          val model = Indexes.loadRqModel(tbl.spark, ref.idxLoc)
          val m = model.pq.codebooks.length
          Indexes.buildIvfRq(tbl.spark, tbl.read(None, Some(cur)),
            ref.embedCol, ref.idxLoc, dim = m * model.pq.dsub,
            nClusters = model.ivf.centroids.length, m = m,
            ks = model.pq.codebooks(0).length, metric = metric)
        } else {
          val n = Indexes.loadIvfModel(tbl.spark, ref.idxLoc).centroids.length
          Indexes.buildIvf(tbl.spark, tbl.read(None, Some(cur)), ref.embedCol,
            ref.idxLoc, n, metric = metric)
        }
        writeSource(tbl.spark, ref.idxLoc, cur)
        return s"$kind index rebuilt at snapshot $cur (non-append or unreadable history)"
      }
      val delta = tbl.incremental(s0, cur)
      if (isRq) Indexes.appendToIvfRq(tbl.spark, delta, ref.embedCol, ref.idxLoc)
      else Indexes.appendToIvf(tbl.spark, delta, ref.embedCol, ref.idxLoc)
      writeSource(tbl.spark, ref.idxLoc, cur)
      s"$kind index refreshed ${s0}→$cur (delta only)"
    }
  }

  def dropVector(tbl: GraftTable, column: Option[String] = None): String = {
    val ref = resolveVectorRef(tbl, column)
    tbl.sm.fs.delete(new Path(ref.idxLoc), true)
    PkSearch.dropVectorRef(tbl, ref.embedCol)
    s"vector index dropped (${ref.idxLoc})"
  }

  /** CREATE index_type=full-text: PK tables only register (idCol, textCol)
    * — merged-state postings derive at query time; append tables build the
    * persisted postings index + source sidecar. Tokenizer options resolve
    * CALL argument → per-field table option (`fields.<col>.<opt>`) → shared
    * table option (`full-text.<opt>`) → default, and persist with the index
    * so refresh and query tokenization always match
    * (global-index/full-text.mdx:127-150). */
  def createFullText(tbl: GraftTable, idCol: String, textCol: String,
                     callOpts: Map[String, String] = Map.empty): String = {
    val suffixes = Seq("tokenizer", "ngram.min-gram", "ngram.max-gram",
      "ngram.prefix-only", "lower-case", "max-token-length")
    val resolved = suffixes.flatMap { sfx =>
      callOpts.get(s"full-text.$sfx")
        .orElse(tbl.config.options.get(s"fields.$textCol.$sfx"))
        .orElse(tbl.config.options.get(s"full-text.$sfx"))
        .map(v => s"full-text.$sfx" -> v)
    }.toMap
    val spec = FullText.TokenizerSpec.fromOptions(resolved)
    val withPos = callOpts.get("full-text.with-position")
      .orElse(tbl.config.options.get(s"fields.$textCol.with-position"))
      .orElse(tbl.config.options.get("full-text.with-position"))
      .exists(_.toBoolean)
    if (tbl.config.isPrimaryKeyed) {
      // merged-state postings derive at query time, positions included when
      // a phrase query asks — nothing to persist
      PkSearch.registerFullText(tbl, idCol, textCol, spec)
      s"merged-state full-text search registered on ($idCol, $textCol, " +
        s"tokenizer ${spec.kind})"
    } else {
      val loc = fullTextIndexLoc(tbl.location, textCol)
      val snap = currentSnapshot(tbl)
      Indexes.buildFullText(tbl.spark,
        tbl.read(None, Some(snap)).select(col(idCol), col(textCol)),
        idCol, textCol, loc, spec, withPos)
      writeSource(tbl.spark, loc, snap)
      PkSearch.writeFullTextRef(tbl,
        PkSearch.FullTextRef(idCol, textCol, "plain", Some(loc), spec.toMap))
      s"full-text index built at $loc (snapshot $snap, tokenizer ${spec.kind})"
    }
  }

  /** Query entry for a PLAIN (persisted) full-text ref honoring the
    * reference's `full-text-index.search-mode` table option
    * (full-text.mdx:285-288): `fast` (default) serves the indexed snapshot
    * only; `full` / `detail` also cover rows appended since the index's
    * recorded snapshot, by tokenizing the delta at query time with the
    * index's recorded tokenizer and scoring under merged corpus statistics
    * ([[Indexes.MergedDslScorer]] — results equal a post-refresh search).
    * The per-field spelling `fields.<col>.search-mode` wins over the shared
    * option. Non-append history since the build (deletes) cannot be covered
    * by an unindexed-range read — the search falls back to the indexed
    * snapshot until the next refresh rebuilds. */
  def fullTextQuery(tbl: GraftTable, ref: PkSearch.FullTextRef,
                    rawQuery: String, k: Int): DataFrame = {
    val loc = ref.idxLoc.get
    val mode = tbl.config.options.getOrElse(
      s"fields.${ref.textCol}.search-mode",
      tbl.config.options.getOrElse("full-text-index.search-mode",
        tbl.config.options.getOrElse("global-index.search-mode", "fast")))
    require(Seq("fast", "full", "detail").contains(mode),
      s"unknown full-text-index.search-mode $mode (fast | full | detail)")
    lazy val s0 = readSource(tbl.spark, loc)
    lazy val cur = currentSnapshot(tbl)
    if (mode == "fast" || cur == s0 || !appendOnlySince(tbl, s0, cur))
      Indexes.fullTextSearchText(tbl.spark, loc, rawQuery, k)
    else {
      val spec = Indexes.readTokenizer(tbl.spark, loc)
      val withPos = Indexes.readWithPositions(tbl.spark, loc)
      val delta = FullText.buildPostings(
        tbl.incremental(s0, cur).select(col(ref.idCol), col(ref.textCol)),
        ref.idCol, ref.textCol, spec, withPos)
      val scorer = Indexes.MergedDslScorer(tbl.spark, loc, delta)
      val dsl =
        if (rawQuery.trim.startsWith("{")) FullText.parseDsl(rawQuery)
        else FullText.DslMatch(rawQuery)
      FullText.evalDsl(dsl, scorer)
        .orderBy(col("score").desc, col("doc_id")).limit(k)
    }
  }

  /** Search-mode-aware DSL scorer for ONE CALL-managed full-text index —
    * the per-column building block of a top-level multi_match (which unions
    * several columns' scorers and so cannot route through [[fullTextQuery]]
    * directly). Same mode resolution and delta coverage as fullTextQuery:
    * `full`/`detail` merge rows appended since the indexed snapshot. */
  def fullTextScorer(tbl: GraftTable,
                     ref: PkSearch.FullTextRef): FullText.DslScorer = {
    val loc = ref.idxLoc.get
    val mode = tbl.config.options.getOrElse(
      s"fields.${ref.textCol}.search-mode",
      tbl.config.options.getOrElse("full-text-index.search-mode",
        tbl.config.options.getOrElse("global-index.search-mode", "fast")))
    lazy val s0 = readSource(tbl.spark, loc)
    lazy val cur = currentSnapshot(tbl)
    if (mode == "fast" || cur == s0 || !appendOnlySince(tbl, s0, cur))
      Indexes.IndexDslScorer(tbl.spark, loc)
    else {
      val spec = Indexes.readTokenizer(tbl.spark, loc)
      val withPos = Indexes.readWithPositions(tbl.spark, loc)
      val delta = FullText.buildPostings(
        tbl.incremental(s0, cur).select(col(ref.idCol), col(ref.textCol)),
        ref.idCol, ref.textCol, spec, withPos)
      Indexes.MergedDslScorer(tbl.spark, loc, delta)
    }
  }

  /** REFRESH index_type=full-text: append tables tokenize only the delta
    * rows and MERGE their df/corpus-stat contributions (aggregation-engine
    * term stats); PK registration needs no refresh. `column` names the index
    * when several text columns are indexed. */
  def refreshFullText(tbl: GraftTable, column: Option[String] = None): String = {
    val ref = resolveFullTextRef(tbl, column)
    if (ref.kind == "pk")
      return "merged-state full-text search needs no refresh"
    val loc = ref.idxLoc.get
    val s0 = readSource(tbl.spark, loc)
    val cur = currentSnapshot(tbl)
    if (cur == s0) return s"full-text index already at snapshot $cur"
    if (!appendOnlySince(tbl, s0, cur)) {
      // A rebuild must keep the index's RECORDED tokenizer + positions flag
      // (the vector path likewise keeps its recorded metric): resetting to
      // the default tokenizer would silently change query semantics for
      // ngram/whitespace/raw indexes and break phrase queries.
      val spec = Indexes.readTokenizer(tbl.spark, loc)
      val withPos = Indexes.readWithPositions(tbl.spark, loc)
      Indexes.buildFullText(tbl.spark,
        tbl.read(None, Some(cur)).select(col(ref.idCol), col(ref.textCol)),
        ref.idCol, ref.textCol, loc, spec, withPos)
      writeSource(tbl.spark, loc, cur)
      return s"full-text index rebuilt at snapshot $cur (non-append or unreadable history)"
    }
    Indexes.appendToFullText(tbl.spark,
      tbl.incremental(s0, cur).select(col(ref.idCol), col(ref.textCol)),
      ref.idCol, ref.textCol, loc)
    writeSource(tbl.spark, loc, cur)
    s"full-text index refreshed ${s0}→$cur (delta only)"
  }

  // ---- es-index (composite) lifecycle ----

  def esIndexLoc(tableLoc: String): String = s"$tableLoc/index/es"
  private def esRefPath(tableLoc: String) = new Path(tableLoc, "index/es-ref.json")

  /** The es-index location a TABLE path routes to in `graft_es_search`
    * (written by [[createEs]]); None when the table has no CALL-managed
    * composite index. */
  def esRef(tbl: GraftTable): Option[String] = {
    val p = esRefPath(tbl.location)
    if (!tbl.sm.fs.exists(p)) None
    else Option(Json.mapper.readValue(tbl.sm.readString(p),
      classOf[java.util.Map[String, String]]).get("idxLoc"))
  }

  /** CREATE index_type=es: ONE composite index (vector and/or text plus
    * bloom-indexed keyword companions) at the conventional location, plus
    * the back-reference so `graft_es_search('<table>', …)` routes the table
    * path. Refresh is delta-only like the other append-table families. */
  def createEs(tbl: GraftTable, idCol: String, embedCol: Option[String],
               textCol: Option[String], keywordCols: Seq[String],
               nClusters: Int = 16, seed: Long = 42L): String = {
    val loc = esIndexLoc(tbl.location)
    val snap = currentSnapshot(tbl)
    EsIndex.build(tbl.spark, tbl.read(None, Some(snap)), idCol, loc,
      embedCol, textCol, keywordCols, nClusters, seed)
    writeSource(tbl.spark, loc, snap)
    tbl.sm.writeString(esRefPath(tbl.location), Json.write(Map("idxLoc" -> loc)))
    s"es index built at $loc (snapshot $snap)"
  }

  /** REFRESH index_type=es: APPEND tables assign/tokenize only the rows
    * appended since the recorded snapshot ([[EsIndex.append]] — existing
    * centroids, postings + term-stat deltas merged through the aggregation
    * engine). PRIMARY-KEY tables re-derive from the merged state instead —
    * an upsert delta appended into an append-shaped composite index would
    * leave the superseded versions scoring alongside the new ones. */
  def refreshEs(tbl: GraftTable): String = {
    val loc = esRef(tbl).getOrElse(
      throw new IllegalArgumentException(s"${tbl.location}: no es index"))
    val s0 = readSource(tbl.spark, loc)
    val cur = currentSnapshot(tbl)
    if (cur == s0) return s"es index already at snapshot $cur"
    if (tbl.config.isPrimaryKeyed || !appendOnlySince(tbl, s0, cur)) {
      val m = EsIndex.readMeta(tbl.spark, loc)
      val n = m.embedCol.map(_ =>
        Indexes.loadIvfModel(tbl.spark, loc).centroids.length).getOrElse(16)
      EsIndex.build(tbl.spark, tbl.read(None, Some(cur)), m.idCol, loc,
        m.embedCol, m.textCol, m.keywordCols, n)
      writeSource(tbl.spark, loc, cur)
      s"es index re-derived from the merged state at snapshot $cur"
    } else {
      EsIndex.append(tbl.spark, tbl.incremental(s0, cur), loc)
      writeSource(tbl.spark, loc, cur)
      s"es index refreshed ${s0}→$cur (delta only)"
    }
  }

  def dropEs(tbl: GraftTable): String = {
    val loc = esRef(tbl).getOrElse(
      throw new IllegalArgumentException(s"${tbl.location}: no es index"))
    val fs = tbl.sm.fs
    fs.delete(new Path(loc), true)
    fs.delete(new Path(loc + "__text"), true)
    fs.delete(new Path(Indexes.termStatsLoc(loc + "__text")), true)
    fs.delete(esRefPath(tbl.location), false)
    s"es index dropped ($loc)"
  }

  // ---- multi-route hybrid search over a table's CALL-managed indexes ----

  /** One vector route of the reference's multi-route hybrid_search
    * (hybrid-search.mdx:73-81): search `field`'s index with `query`,
    * keep `limit` candidates (defaults to the final limit), contribute with
    * `weight`. `nprobe` and `refineFactor` come from the route's options
    * (`ivf.nprobe` / `ivf.refine_factor` — the reference's per-query
    * search-time options, vector.mdx:284-297); the refine factor sizes the
    * exact re-rank window (`limit × factor`) on compressed (RQ) routes. */
  case class VectorRoute(field: String, query: Seq[Float],
                         limit: Option[Int] = None, weight: Double = 1.0,
                         nprobe: Int = 8, refineFactor: Option[Int] = None)

  /** One full-text route (hybrid-search.mdx:84-90): `query` is either a
    * plain terms string or the reference's JSON match form
    * `{"match":{"query":"..."}}`. */
  case class TextRoute(column: String, query: String,
                       limit: Option[Int] = None, weight: Double = 1.0)

  // route query strings: plain text tokenizes with the routed index's
  // tokenizer; a JSON object is the full Query DSL ([[FullText.parseDsl]])

  /** The id column hybrid fusion joins routes on: the table's primary key,
    * else the id a registered full-text/es index recorded. */
  private def inferIdCol(tbl: GraftTable): String =
    tbl.config.primaryKeys.headOption
      .orElse(PkSearch.fullTextRefs(tbl).toSeq.sortBy(_._1)
        .headOption.map(_._2.idCol))
      .orElse(esRef(tbl).map(l => EsIndex.readMeta(tbl.spark, l).idCol))
      .getOrElse(throw new IllegalArgumentException(
        s"${tbl.location}: cannot infer the id column — the table needs a " +
          "primary key or a registered full-text/es index"))

  /** MULTI-ROUTE hybrid search over a TABLE's CALL-managed indexes — the
    * reference's `hybrid_search(table, vector_routes, full_text_routes,
    * limit[, ranker])` TVF semantics: every route is served from its own
    * persisted index (file-aligned for PK tables), k-truncated at its route
    * limit, then fused by [[FullText.fuseRoutes]] with the route weights. */
  def hybridSearch(tbl: GraftTable, vecRoutes: Seq[VectorRoute],
                   textRoutes: Seq[TextRoute], k: Int,
                   ranker: String = "rrf", rrfK0: Int = 60): DataFrame = {
    require(vecRoutes.nonEmpty || textRoutes.nonEmpty, "no routes given")
    val spark = tbl.spark
    val idCol = inferIdCol(tbl)
    val vecRefs = PkSearch.vectorRefs(tbl)
    val txtRefs = PkSearch.fullTextRefs(tbl)
    val vecDfs = vecRoutes.map { r =>
      val lim = r.limit.getOrElse(k)
      // route per FIELD through that column's own back-reference: a PK ref
      // gets the reconciled file-aligned search even when several embedding
      // columns are indexed (the pre-r9 single-ref layout silently fell back
      // to the unreconciled plain search for all but the newest index); each
      // route scores with ITS index's build-time metric
      // a compressed (RQ) index honors the route's refine factor: the exact
      // re-rank window is limit × factor; uncompressed IVF scores its probed
      // candidates exactly already
      def searchLoc(loc: String, embedCol: String,
                    m: String): org.apache.spark.sql.DataFrame =
        if (Indexes.isRqIndex(spark, loc))
          Indexes.rqSearch(spark, loc, embedCol, r.query, lim, r.nprobe,
            rerank = r.refineFactor.map(_ * lim).getOrElse(0), metric = m,
            scoreCol = "score")
        else
          Indexes.ivfSearch(spark, loc, embedCol, r.query, lim, r.nprobe,
            metric = m, scoreCol = "score")
      val (df0, metric) = vecRefs.get(r.field) match {
        case Some(ref) if ref.kind == "pk" =>
          val m = Indexes.ivfMetric(spark, ref.idxLoc)
          (PkSearch.vectorSearch(tbl, ref.idxLoc, ref.embedCol, r.query, lim,
            r.nprobe, metric = m, scoreCol = "score"), m)
        case Some(ref) =>
          // plain persisted ref: the same mode-aware entry as the TVF
          // (honors vector-index.search-mode)
          val m = Indexes.ivfMetric(spark, ref.idxLoc)
          (vectorQuery(tbl, ref, r.query, lim, r.nprobe,
            rerank = r.refineFactor.map(_ * lim).getOrElse(0)), m)
        case None =>
          val loc = vectorIndexLoc(tbl.location, r.field)
          require(GraftTable.exists(spark, loc),
            s"no ivf index on ${r.field} — CALL create_global_index(" +
              s"index_column => '${r.field}', index_type => 'ivf') first")
          val m = Indexes.ivfMetric(spark, loc)
          (searchLoc(loc, r.field, m), m)
      }
      // l2 scores are DISTANCES (smaller = better): negate before fusion so
      // every ranker's larger-is-better route ordering holds uniformly
      val df = if (metric == "l2") df0.withColumn("score", -col("score")) else df0
      (df.select(col(idCol).as("id"), col("score")), r.weight)
    }
    val txtDfs = textRoutes.map { r =>
      val lim = r.limit.getOrElse(k)
      // a JSON route query is the full Query DSL (a bare {"match":…} scores
      // identically to its plain-text spelling); plain text tokenizes with
      // the route's index tokenizer
      val isDsl = r.query.trim.startsWith("{")
      val df = txtRefs.get(r.column) match {
        case Some(ref) if ref.kind == "pk" && isDsl =>
          PkSearch.fullTextDslSearch(tbl, ref.idCol, ref.textCol, r.query,
            lim, ref.spec)
        case Some(ref) if ref.kind == "pk" =>
          PkSearch.fullTextSearch(tbl, ref.idCol, ref.textCol,
            FullText.tokenizeQuery(r.query, ref.spec), lim, spec = ref.spec)
        case Some(ref) =>
          // plain persisted ref: same mode-aware entry as the TVF (honors
          // full-text-index.search-mode)
          fullTextQuery(tbl, ref, r.query, lim)
        case None =>
          val loc = fullTextIndexLoc(tbl.location, r.column)
          require(GraftTable.exists(spark, loc),
            s"no full-text index on ${r.column} — CALL create_global_index(" +
              s"index_column => '${r.column}', index_type => 'full-text') first")
          Indexes.fullTextSearchText(spark, loc, r.query, lim)
      }
      (df.select(col("doc_id").as("id"), col("score")), r.weight)
    }
    FullText.fuseRoutes(vecDfs ++ txtDfs, ranker, rrfK0)
      .orderBy(col("score").desc, col("id")).limit(k)
      .withColumnRenamed("id", idCol)
  }

  def dropFullText(tbl: GraftTable, column: Option[String] = None): String = {
    val ref = resolveFullTextRef(tbl, column)
    ref.idxLoc.foreach { loc =>
      tbl.sm.fs.delete(new Path(loc), true)
      tbl.sm.fs.delete(new Path(Indexes.termStatsLoc(loc)), true)
    }
    PkSearch.dropFullTextRef(tbl, ref.textCol)
    s"full-text index dropped"
  }
}
