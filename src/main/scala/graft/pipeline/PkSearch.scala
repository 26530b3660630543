package graft.pipeline

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-aligned search over PRIMARY-KEY tables (SURVEY §2.11 "File-aligned PK
 * search"; capability of paimon's snapshot-consistent, DV-aware PK search —
 * reference: paimon-core/.../table/source/FullTextScan.java,
 * BatchVectorSearchBuilderImpl.java, spark
 * read/SparkVectorSearchBuilderImpl.scala — the reference keeps per-bucket
 * index archives aligned with the data files; we align a persisted index
 * with a SNAPSHOT and reconcile later commits from the changelog).
 *
 * Semantics the reference guarantees, reproduced here:
 *  - snapshot-consistent: a search reflects exactly the merged (MOR) state
 *    of the table's current snapshot — updates replace, deletes disappear;
 *  - DV-aware: rows masked by deletion vectors never surface;
 *  - partition predicates prune BEFORE the search route (the TopN/filter
 *    interplay rule: partition filters compose with top-k, arbitrary row
 *    predicates do not push into the index route);
 *  - distributed top-k merge: per-partition TakeOrdered then driver merge
 *    (Spark's `orderBy().limit(k)` physical shape).
 *
 * Index freshness without rebuilds: the vector index records its source
 * snapshot. A search against a LATER snapshot anti-joins the keys touched
 * since (from the exact changelog) out of the index route and scores those
 * keys' CURRENT merged rows instead — cost O(changelog since the index),
 * never O(table). Small key sets collapse to a manifest-pruned point read.
 */
object PkSearch {

  private def sidecar(loc: String) = new Path(loc, "index/pk-search.json")
  // back-references are PER COLUMN (multimodal tables routinely carry a
  // text-embedding AND an image-embedding index — the reference tracks many
  // indexes per table, TableIndexesTable.java); the suffix-less spellings are
  // the pre-r9 single-index layout, still read and migrated on next write
  private def vecRefPath(tblLoc: String, column: String) =
    new Path(tblLoc, s"index/pk-search-ref-$column.json")
  private def legacyVecRefPath(tblLoc: String) =
    new Path(tblLoc, "index/pk-search-ref.json")
  private def ftRefPath(tblLoc: String, column: String) =
    new Path(tblLoc, s"index/pk-fulltext-$column.json")
  private def legacyFtRefPath(tblLoc: String) =
    new Path(tblLoc, "index/pk-fulltext.json")

  /** The table→index back-reference [[buildVectorIndex]] (kind "pk") or
    * [[IndexLifecycle.createVector]] (kind "plain") writes: lets the SQL TVF
    * (`graft_vector_search('<table>', …)`) route a TABLE path to the right
    * search without naming the index — the reference's TVFs take the table,
    * not the index (BatchVectorSearchBuilderImpl wiring). kind "pk" =
    * file-aligned, changelog-reconciled search; "plain" = direct
    * [[Indexes.ivfSearch]] against the referenced index. One ref per
    * embedding column; lifecycle calls disambiguate with `index_column`. */
  case class VectorRef(idxLoc: String, embedCol: String, kind: String = "pk")

  private def parseVectorRef(json: String): VectorRef = {
    val m = Json.mapper.readValue(json, classOf[java.util.Map[String, String]])
    VectorRef(m.get("idxLoc"), m.get("embedCol"),
      Option(m.get("kind")).getOrElse("pk"))
  }

  private[pipeline] def writeVectorRef(tbl: GraftTable, ref: VectorRef): Unit = {
    // migrate a legacy single-index ref out of the way: same column → this
    // write supersedes it; different column → re-home it per-column so it
    // stays independently refreshable/droppable
    val legacy = legacyVecRefPath(tbl.location)
    if (tbl.sm.fs.exists(legacy)) {
      val old = parseVectorRef(tbl.sm.readString(legacy))
      if (old.embedCol != ref.embedCol)
        tbl.sm.writeString(vecRefPath(tbl.location, old.embedCol),
          Json.write(Map("idxLoc" -> old.idxLoc, "embedCol" -> old.embedCol,
            "kind" -> old.kind)))
      tbl.sm.fs.delete(legacy, false)
    }
    tbl.sm.writeString(vecRefPath(tbl.location, ref.embedCol),
      Json.write(Map("idxLoc" -> ref.idxLoc, "embedCol" -> ref.embedCol,
        "kind" -> ref.kind)))
  }

  /** ALL vector back-references on the table, keyed by embedding column —
    * per-column files plus (read-compat) the pre-r9 single-ref spelling. */
  def vectorRefs(tbl: GraftTable): Map[String, VectorRef] = {
    val fs = tbl.sm.fs
    val legacy = legacyVecRefPath(tbl.location)
    val old =
      if (fs.exists(legacy)) Some(parseVectorRef(tbl.sm.readString(legacy)))
      else None
    val dir = new Path(tbl.location, "index")
    val perCol =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("pk-search-ref-") && n.endsWith(".json"))
        .map(n => parseVectorRef(
          tbl.sm.readString(new Path(dir, n))))
    (old.toSeq ++ perCol).map(r => r.embedCol -> r).toMap // per-column wins
  }

  /** The table's SOLE vector back-reference: None when un-indexed; throws
    * when several columns are indexed (callers that can name a column use
    * [[vectorRefs]]). */
  def vectorRef(tbl: GraftTable): Option[VectorRef] = {
    val refs = vectorRefs(tbl)
    require(refs.size <= 1,
      s"${tbl.location}: multiple vector indexes " +
        s"(${refs.keys.toSeq.sorted.mkString(", ")}) — name the index column")
    refs.values.headOption
  }

  private[pipeline] def dropVectorRef(tbl: GraftTable, column: String): Unit = {
    tbl.sm.fs.delete(vecRefPath(tbl.location, column), false)
    val legacy = legacyVecRefPath(tbl.location)
    if (tbl.sm.fs.exists(legacy) &&
        parseVectorRef(tbl.sm.readString(legacy)).embedCol == column)
      tbl.sm.fs.delete(legacy, false)
  }

  /** Register the (idCol, textCol) pair [[fullTextSearch]] needs so the SQL
    * TVF (`graft_full_text_search('<pk-table>', …)`) can route a TABLE path
    * through the merged-state BM25 search. Kind "plain" (written by
    * [[IndexLifecycle.createFullText]]) instead points at a PERSISTED
    * postings index for the append-table route. One ref per text column.
    * `tokenizer` carries the column's [[FullText.TokenizerSpec]] (as its
    * map form) so PK merged-state searches tokenize like the registration
    * asked, not like a default. */
  case class FullTextRef(idCol: String, textCol: String, kind: String = "pk",
                         idxLoc: Option[String] = None,
                         tokenizer: Map[String, String] = Map.empty) {
    def spec: FullText.TokenizerSpec =
      if (tokenizer.isEmpty) FullText.TokenizerSpec()
      else FullText.TokenizerSpec.fromMap(tokenizer)
  }

  def registerFullText(tbl: GraftTable, idCol: String, textCol: String,
      spec: FullText.TokenizerSpec = FullText.TokenizerSpec()): Unit =
    writeFullTextRef(tbl, FullTextRef(idCol, textCol, tokenizer = spec.toMap))

  private def parseFullTextRef(json: String): FullTextRef = {
    val m0 = Json.mapper.readValue(json, classOf[java.util.Map[String, String]])
    import scala.jdk.CollectionConverters._
    val m = m0.asScala
    FullTextRef(m("idCol"), m("textCol"), m.getOrElse("kind", "pk"),
      m.get("idxLoc"),
      // tokenizer settings ride the same flat map under a "tok." prefix
      m.collect { case (k, v) if k.startsWith("tok.") =>
        k.stripPrefix("tok.") -> v }.toMap)
  }

  private def ftRefJson(ref: FullTextRef): String =
    Json.write(Map("idCol" -> ref.idCol, "textCol" -> ref.textCol,
      "kind" -> ref.kind) ++ ref.idxLoc.map("idxLoc" -> _) ++
      ref.tokenizer.map { case (k, v) => s"tok.$k" -> v })

  private[pipeline] def writeFullTextRef(tbl: GraftTable, ref: FullTextRef): Unit = {
    val legacy = legacyFtRefPath(tbl.location)
    if (tbl.sm.fs.exists(legacy)) {
      val old = parseFullTextRef(tbl.sm.readString(legacy))
      if (old.textCol != ref.textCol)
        tbl.sm.writeString(ftRefPath(tbl.location, old.textCol), ftRefJson(old))
      tbl.sm.fs.delete(legacy, false)
    }
    tbl.sm.writeString(ftRefPath(tbl.location, ref.textCol), ftRefJson(ref))
  }

  /** ALL full-text back-references on the table, keyed by text column. */
  def fullTextRefs(tbl: GraftTable): Map[String, FullTextRef] = {
    val fs = tbl.sm.fs
    val legacy = legacyFtRefPath(tbl.location)
    val old =
      if (fs.exists(legacy)) Some(parseFullTextRef(tbl.sm.readString(legacy)))
      else None
    val dir = new Path(tbl.location, "index")
    val perCol =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("pk-fulltext-") && n.endsWith(".json"))
        .map(n => parseFullTextRef(tbl.sm.readString(new Path(dir, n))))
    (old.toSeq ++ perCol).map(r => r.textCol -> r).toMap
  }

  /** The table's SOLE full-text back-reference (same contract as
    * [[vectorRef]]). */
  def fullTextRef(tbl: GraftTable): Option[FullTextRef] = {
    val refs = fullTextRefs(tbl)
    require(refs.size <= 1,
      s"${tbl.location}: multiple full-text indexes " +
        s"(${refs.keys.toSeq.sorted.mkString(", ")}) — name the index column")
    refs.values.headOption
  }

  private[pipeline] def dropFullTextRef(tbl: GraftTable, column: String): Unit = {
    tbl.sm.fs.delete(ftRefPath(tbl.location, column), false)
    val legacy = legacyFtRefPath(tbl.location)
    if (tbl.sm.fs.exists(legacy) &&
        parseFullTextRef(tbl.sm.readString(legacy)).textCol == column)
      tbl.sm.fs.delete(legacy, false)
  }

  /** Build a vector index table aligned to `tbl`'s current snapshot: the
    * merged (MOR + DV-applied) rows, IVF-cluster-partitioned; the sidecar
    * records the source snapshot for reconciliation at query time. */
  def buildVectorIndex(tbl: GraftTable, embedCol: String, loc: String,
                       nClusters: Int, seed: Long = 42L,
                       metric: String = "cosine"): GraftTable = {
    require(tbl.config.isPrimaryKeyed, "PkSearch indexes a primary-key table")
    val snap = tbl.sm.latestSnapshotId
      .getOrElse(throw new IllegalStateException(s"${tbl.location}: empty table"))
    val idx = Indexes.buildIvf(tbl.spark, tbl.read(None, Some(snap)), embedCol,
      loc, nClusters, seed, metric = metric)
    idx.sm.writeString(sidecar(loc),
      Json.write(Map("sourceSnapshot" -> snap, "sourceLocation" -> tbl.location)))
    writeVectorRef(tbl, VectorRef(loc, embedCol, "pk"))
    idx
  }

  /** Re-align a file-aligned index with the table's CURRENT snapshot,
    * paying O(changed keys) instead of O(table) when the delta is small:
    * COW-delete the keys touched since the index snapshot out of the index
    * table, append their current merged rows (assigned against the EXISTING
    * centroids), and advance the recorded source snapshot — query-time
    * reconciliation then short-circuits (cur == s0) until the next write.
    * A wide delta, a composite key, or an unreadable changelog falls back
    * to a full rebuild (same nClusters). */
  def refreshVectorIndex(tbl: GraftTable, idxLoc: String, embedCol: String,
                         maxDeltaKeys: Int = PointReadMaxKeys): String = {
    import graft.core.RowOps._
    val spark = tbl.spark
    val s0 = indexSourceSnapshot(spark, idxLoc)
    val cur = tbl.sm.latestSnapshotId
      .getOrElse(throw new IllegalStateException(s"${tbl.location}: empty table"))
    if (cur == s0) return s"file-aligned ivf index already at snapshot $cur"
    def rebuild(): String = {
      buildVectorIndex(tbl, embedCol, idxLoc,
        Indexes.loadIvfModel(spark, idxLoc).centroids.length,
        metric = Indexes.ivfMetric(spark, idxLoc)) // preserve the metric
      s"file-aligned ivf index rebuilt at $idxLoc (snapshot $cur)"
    }
    val pks = tbl.config.primaryKeys
    if (pks.length != 1) return rebuild()
    val pk = pks.head
    val keys =
      try tbl.changelog(s0, cur).select(col(pk)).distinct()
        .limit(maxDeltaKeys + 1).collect().map(_.get(0)).toIndexedSeq
      catch { case _: Exception => return rebuild() }
    if (keys.length > maxDeltaKeys) return rebuild()
    if (keys.nonEmpty) {
      val idx = GraftTable.load(spark, idxLoc)
      idx.delete(col(pk).isin(keys: _*)) // COW rewrite of affected index files
      val fresh = tbl.read(filter = Some(col(pk).isin(keys: _*)))
      if (!fresh.isEmpty) Indexes.appendToIvf(spark, fresh, embedCol, idxLoc)
    }
    val idx2 = GraftTable.load(spark, idxLoc)
    idx2.sm.writeString(sidecar(idxLoc),
      Json.write(Map("sourceSnapshot" -> cur, "sourceLocation" -> tbl.location)))
    s"file-aligned ivf index delta-aligned ${s0}→$cur (${keys.length} keys)"
  }

  private def indexSourceSnapshot(spark: SparkSession, loc: String): Long = {
    val t = GraftTable.load(spark, loc)
    val m = Json.mapper.readValue(t.sm.readString(sidecar(loc)),
      classOf[java.util.Map[String, Any]])
    m.get("sourceSnapshot").asInstanceOf[Number].longValue()
  }

  /** Keys-touched-since threshold below which reconciliation collects the
    * key set and re-reads it as a manifest-pruned IN filter (point-lookup
    * shape) instead of a scan + semi-join. */
  val PointReadMaxKeys = 10000

  /**
   * Snapshot-consistent, DV-aware top-k vector search over a PK table,
   * served from a [[buildVectorIndex]] index. If the table has advanced past
   * the index snapshot, keys from the intervening changelog are served from
   * the CURRENT merged state (exact), everything else from the index's
   * partition-pruned probes.
   */
  def vectorSearch(tbl: GraftTable, idxLoc: String, embedCol: String,
                   query: Seq[Float], k: Int, nprobe: Int,
                   metric: String = "cosine", scoreCol: String = "__score",
                   partitionFilter: Option[Column] = None,
                   maxPointKeys: Int = PointReadMaxKeys): DataFrame = {
    val spark = tbl.spark
    val s0 = indexSourceSnapshot(spark, idxLoc)
    val cur = tbl.sm.latestSnapshotId
      .getOrElse(throw new IllegalStateException(s"${tbl.location}: empty table"))
    val idx = GraftTable.load(spark, idxLoc)
    val model = Indexes.loadIvfModel(spark, idxLoc)
    val probes = model.nearestClusters(query, nprobe)
    val pks = tbl.config.primaryKeys

    val idxProbe0 = Indexes
      .readProbed(idx, probes, model.centroids.length, None)
      .drop("__ivf_cluster")
    val idxProbe = partitionFilter.map(idxProbe0.filter).getOrElse(idxProbe0)

    val base =
      if (cur == s0) idxProbe
      else {
        // exact set of keys whose merged value changed after the index:
        // inserts, updates (either image), and deletes (incl. DV deletes —
        // the changelog emits -D for them)
        val changed = tbl.changelog(s0, cur)
          .select(pks.map(col): _*).distinct()
        val freshAll: DataFrame = pks match {
          case Seq(pk) =>
            val keys = changed.limit(maxPointKeys + 1).collect().map(_.get(0))
            if (keys.length <= maxPointKeys)
              // manifest stats prune the point read to the keys' buckets
              tbl.read(filter = Some(col(pk).isin(keys.toIndexedSeq: _*)))
            else tbl.read().join(changed, pks, "left_semi")
          case _ => tbl.read().join(changed, pks, "left_semi")
        }
        val fresh = partitionFilter.map(freshAll.filter).getOrElse(freshAll)
        idxProbe.join(changed, pks, "left_anti")
          .unionByName(fresh.select(idxProbe.columns.map(col): _*))
      }
    Similarity.bruteForceTopK(base, embedCol, query, k, metric, scoreCol)
  }

  /**
   * Snapshot-consistent, DV-aware BM25 top-k over a PK table's text column:
   * postings are derived from the MERGED state of the current (or AS OF)
   * snapshot, so updated documents score with their new text and deleted
   * documents never match. Partition predicates prune before tokenization.
   */
  def fullTextSearch(tbl: GraftTable, idCol: String, textCol: String,
                     query: Seq[String], k: Int,
                     partitionFilter: Option[Column] = None,
                     snapshotId: Option[Long] = None,
                     spec: FullText.TokenizerSpec = FullText.TokenizerSpec())
      : DataFrame = {
    require(tbl.config.isPrimaryKeyed, "PkSearch searches a primary-key table")
    val docs = tbl.read(partitionFilter, snapshotId)
    FullText.search(FullText.buildPostings(docs, idCol, textCol, spec),
      query, k, spec = spec)
  }

  /** Query-DSL search over a PK table's MERGED state (match operators,
    * fuzziness, phrase, boolean, boost — [[FullText.parseDsl]]): postings
    * derive from the current snapshot at query time, with positions exactly
    * when the query carries a phrase. */
  def fullTextDslSearch(tbl: GraftTable, idCol: String, textCol: String,
                        json: String, k: Int,
                        spec: FullText.TokenizerSpec = FullText.TokenizerSpec())
      : DataFrame = {
    require(tbl.config.isPrimaryKeyed, "PkSearch searches a primary-key table")
    val dsl = FullText.parseDsl(json)
    val postings = FullText.buildPostings(tbl.read(), idCol, textCol, spec,
      withPositions = FullText.needsPositions(dsl))
    FullText.evalDsl(dsl, FullText.PostingsDslScorer(postings, spec))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }
}
