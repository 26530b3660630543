package graft.dsv2

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL table-valued functions — the TVF surface of the reference
 * (paimon-spark/.../catalyst/plans/logical/PaimonTableValuedFunctions.scala:56-61:
 * paimon_incremental_query, vector_search, full_text_search, hybrid_search),
 * registered through SparkSessionExtensions.injectTableFunction:
 *
 * {{{
 *   SELECT * FROM graft_incremental_query('<table>', 1, 3)
 *   SELECT * FROM graft_changelog('<table>', 1, 3)
 *   SELECT * FROM graft_full_text_search('<index-path>', 'query terms', 10)
 *   SELECT * FROM graft_vector_search('<ivf-path>', 10, 4, array(0.1, ...))
 *   SELECT * FROM graft_system('<table>', 'snapshots')
 *   SELECT * FROM graft_call('<table>', 'compact', 'k=v,...')   -- CALL sugar
 * }}}
 *
 * `<table>` is a filesystem location or a `catalog.db.table` identifier
 * resolved through the session's catalog manager.
 */
object GraftTableFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)

  private def spark: SparkSession = SparkSession.active

  private def str(e: Expression): String = e.eval() match {
    case s: UTF8String => s.toString
    case null => throw new IllegalArgumentException("null argument")
    case o => o.toString
  }
  private def lng(e: Expression): Long = e.eval() match {
    case n: java.lang.Number => n.longValue()
    case o => o.toString.toLong
  }
  /** Snapshot designator: a numeric snapshot id or a TAG name (paimon
    * incremental-between tags). */
  private def snapArg(t: graft.core.GraftTable, e: Expression): Long =
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case o =>
        val s = String.valueOf(o)
        try s.toLong
        catch { case _: NumberFormatException => t.sm.readTag(s).snapshotId }
    }
  private def floatElems(a: ArrayData,
      et: org.apache.spark.sql.types.DataType): Seq[Float] =
    a.toObjectArray(et).toSeq.map {
      case d: java.lang.Number => d.floatValue()
      // Spark parses uncast fractional literals as DECIMAL — the doc
      // example array(0.1, ...) arrives as Decimal, not a j.l.Number
      case d: org.apache.spark.sql.types.Decimal => d.toFloat
      case o => throw new IllegalArgumentException(s"non-numeric element $o")
    }

  private def floats(e: Expression): Seq[Float] = e.eval() match {
    case a: ArrayData =>
      // honor the literal's ELEMENT type — array(1.0F,…) and array(1.0,…)
      // are both legitimate SQL spellings of a query vector
      val et = e.dataType match {
        case org.apache.spark.sql.types.ArrayType(t, _) => t
        case o => throw new IllegalArgumentException(s"expected array, got $o")
      }
      floatElems(a, et)
    case o => throw new IllegalArgumentException(s"expected array, got $o")
  }

  // ---- multi-route hybrid_search struct parsing (reference named_struct
  // route configs, hybrid-search.mdx:73-90) ----

  import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}

  /** Evaluate an `array(named_struct(...), ...)` argument into per-route
    * field maps; a bare `array()` (NullType elements) is an empty list. */
  private def routeStructs(e: Expression)
      : Seq[(StructType, org.apache.spark.sql.catalyst.InternalRow)] =
    e.dataType match {
      case ArrayType(st: StructType, _) =>
        val arr = e.eval().asInstanceOf[ArrayData]
        (0 until arr.numElements()).map(i => (st, arr.getStruct(i, st.length)))
      case _: ArrayType => Nil
      case o => throw new IllegalArgumentException(
        s"expected an array of route structs, got $o")
    }

  private def fieldIdx(st: StructType, names: Seq[String]): Option[Int] =
    st.fieldNames.zipWithIndex.collectFirst {
      case (fn, i) if names.exists(_.equalsIgnoreCase(fn)) => i
    }

  private def strAt(st: StructType,
      row: org.apache.spark.sql.catalyst.InternalRow,
      names: Seq[String]): Option[String] =
    fieldIdx(st, names).filterNot(row.isNullAt)
      .map(i => row.get(i, st.fields(i).dataType).toString)

  private def numAt(st: StructType,
      row: org.apache.spark.sql.catalyst.InternalRow,
      names: Seq[String]): Option[Double] =
    fieldIdx(st, names).filterNot(row.isNullAt)
      .map(i => row.get(i, st.fields(i).dataType) match {
        case n: java.lang.Number => n.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case o => o.toString.toDouble
      })

  private def vecAt(st: StructType,
      row: org.apache.spark.sql.catalyst.InternalRow,
      names: Seq[String]): Option[Seq[Float]] =
    fieldIdx(st, names).filterNot(row.isNullAt).map { i =>
      st.fields(i).dataType match {
        case ArrayType(et, _) => floatElems(row.getArray(i), et)
        case o => throw new IllegalArgumentException(s"query_vector must be an array, got $o")
      }
    }

  private def optsAt(st: StructType,
      row: org.apache.spark.sql.catalyst.InternalRow,
      names: Seq[String]): Map[String, String] =
    fieldIdx(st, names).filterNot(row.isNullAt).map { i =>
      st.fields(i).dataType match {
        case MapType(kt, vt, _) =>
          val m = row.getMap(i)
          (0 until m.numElements()).map { j =>
            m.keyArray().get(j, kt).toString -> m.valueArray().get(j, vt).toString
          }.toMap
        case o => throw new IllegalArgumentException(s"options must be a map, got $o")
      }
    }.getOrElse(Map.empty)

  /** Per-query search options argument: a `k=v` string (';' or ','
    * separated — both the reference TVF's string form and the CALL options
    * form) or a map literal. NULL/'' = no options. */
  private def searchOpts(e: Expression): graft.pipeline.Indexes.SearchOptions =
    e.eval() match {
      case null => graft.pipeline.Indexes.SearchOptions.empty
      case s: UTF8String => graft.pipeline.Indexes.SearchOptions.parse(s.toString)
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val mt = e.dataType.asInstanceOf[MapType]
        graft.pipeline.Indexes.SearchOptions.fromMap(
          (0 until m.numElements()).map { j =>
            m.keyArray().get(j, mt.keyType).toString ->
              m.valueArray().get(j, mt.valueType).toString
          }.toMap)
      case o => throw new IllegalArgumentException(
        s"search options must be a 'k=v[;k=v]' string or a map, got $o")
    }

  /** Raw per-query options argument as a string map: a `k=v` string (';'
    * or ',' separated) or a map literal; NULL/'' = none. */
  private def rawOptsMap(e: Expression): Map[String, String] =
    e.eval() match {
      case null => Map.empty
      case s: UTF8String =>
        val str = s.toString
        if (str.trim.isEmpty) Map.empty
        else str.split("[;,]").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
          val p = kv.split("=", 2)
          require(p.length == 2, s"invalid search option '$kv' (key=value)")
          p(0).trim -> p(1).trim
        }.toMap
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val mt = e.dataType.asInstanceOf[MapType]
        (0 until m.numElements()).map { j =>
          m.keyArray().get(j, mt.keyType).toString ->
            m.valueArray().get(j, mt.valueType).toString
        }.toMap
      case o => throw new IllegalArgumentException(
        s"search options must be a 'k=v[;k=v]' string or a map, got $o")
    }

  /** Per-query FULL-TEXT search options. The reference reserves the
    * full-text options map and accepts only an empty one
    * (hybrid-search.mdx "Reserved for future full-text search options");
    * graft additionally accepts the Query-DSL match keys — operator,
    * fuzziness, prefix_length, max_expansions, boost — by compiling a
    * plain-text query + options into the equivalent `{"match": …}` DSL
    * query, and rejects every other key loudly. A DSL query already
    * carries its own options, so combining the two forms is an error. */
  private def applyTextOpts(query: String, opts0: Map[String, String]): String = {
    if (opts0.isEmpty) return query
    val allowed = Set("operator", "fuzziness", "prefix_length",
      "max_expansions", "boost")
    val norm = opts0.map { case (k, v) =>
      k.trim.toLowerCase.replace('-', '_') -> v.trim
    }
    val bad = norm.keys.filterNot(allowed).toSeq.sorted
    require(bad.isEmpty, s"unknown full-text search option(s): " +
      s"${bad.mkString(", ")} (supported: ${allowed.toSeq.sorted.mkString(", ")})")
    require(!query.trim.startsWith("{"),
      "per-query options apply to plain-text queries; a DSL query carries " +
        "its own options inside the JSON")
    graft.core.Json.write(Map("match" -> (Map("query" -> query) ++ norm)))
  }

  /** Resolve a path or `catalog.db.table` identifier to an engine table. */
  def resolveTable(ref: String): GraftTable = {
    if (ref.contains("/")) return GraftTable.load(spark, ref)
    val parts = ref.split('.')
    require(parts.length == 3, s"expected path or catalog.db.table, got $ref")
    SparkShims.catalogPlugin(spark, parts(0)) match {
      case g: GraftCatalog => GraftTable.load(spark, g.tableLocation(parts(1), parts(2)))
      case other => throw new IllegalArgumentException(
        s"${parts(0)} is not a graft catalog: $other")
    }
  }

  private def fd(name: String)(builder: Seq[Expression] => LogicalPlan): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, name), builder)

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  val all: Seq[FunctionDescription] = Seq(
    fd("graft_incremental_query") { args =>
      require(args.length == 3, "graft_incremental_query(table, from, to)")
      val t = resolveTable(str(args(0)))
      plan(t.incremental(snapArg(t, args(1)), snapArg(t, args(2))))
    },
    fd("graft_changelog") { args =>
      require(args.length == 3, "graft_changelog(table, from, to)")
      val t = resolveTable(str(args(0)))
      plan(t.changelog(snapArg(t, args(1)), snapArg(t, args(2))))
    },
    // paimon_incremental_between_timestamp: epoch-millis or
    // 'yyyy-MM-dd HH:mm:ss' boundaries resolved to snapshots (session-UTC)
    fd("graft_incremental_between_timestamp") { args =>
      require(args.length == 3,
        "graft_incremental_between_timestamp(table, t1, t2)")
      val t = resolveTable(str(args(0)))
      def millis(s: String): Long =
        try s.toLong
        catch { case _: NumberFormatException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli }
      val (ts1, ts2) = (millis(str(args(1))), millis(str(args(2))))
      val from = t.snapshotAtOrBeforeTime(ts1).orElse(t.sm.snapshotIds.minOption)
      val to = t.snapshotAtOrBeforeTime(ts2).orElse(t.sm.latestSnapshotId)
      plan((from, to) match {
        case (Some(f), Some(e)) if e > f => t.incremental(f, e)
        case _ => t.incremental(0L, 0L)
      })
    },
    // paimon_incremental_to_auto_tag: diff vs the previous auto period tag
    fd("graft_incremental_to_auto_tag") { args =>
      require(args.length == 2, "graft_incremental_to_auto_tag(table, tag)")
      val t = resolveTable(str(args(0)))
      val end = str(args(1))
      require(end.matches("\\d{4}-\\d{2}-\\d{2}( \\d{2})?"),
        s"'$end' is not an auto-created period tag")
      val tags = t.sm.listTags()
      plan(tags.find(_.name == end).flatMap { e =>
        tags.filter(tm => tm.name < e.name &&
            tm.name.matches("\\d{4}-\\d{2}-\\d{2}( \\d{2})?"))
          .sortBy(_.name).lastOption
          .map(p => t.incrementalDiff(p.snapshotId, e.snapshotId))
      }.getOrElse(t.incremental(0L, 0L)))
    },
    // full_text_search over an INDEX path (BM25 postings) or a PK TABLE path
    // (file-aligned, merged-state search — reference FullTextScan.java routes
    // PK tables through the snapshot-consistent, DV-aware path). A PK table
    // registers its (idCol, textCol) once via PkSearch.registerFullText.
    // The query is plain terms OR the reference's JSON Query DSL (match with
    // operator/boost/fuzziness, match_phrase, boolean, boost demotion,
    // multi_match across per-column indexes — full-text.mdx "Query DSL").
    fd("graft_full_text_search") { args =>
      require(args.length >= 3 && args.length <= 5,
        "graft_full_text_search(indexOrPkTable, query, k[, 'indexColumn'[, options]]) | " +
          "graft_full_text_search(table, 'column', query, k[, options])")
      val t = resolveTable(str(args(0)))
      // the reference's argument order (PaimonTableValuedFunctions:906 —
      // table, column, query, limit) puts the integer LAST; graft's original
      // puts it third with the column trailing. Disjoint by arg-3's type.
      val refShape = args.length >= 4 && args(3).dataType != StringType
      val (rawQuery0, k, colArg, ftOpts) =
        if (refShape) (str(args(2)), lng(args(3)).toInt, Some(str(args(1))),
          if (args.length == 5) rawOptsMap(args(4)) else Map.empty[String, String])
        else (str(args(1)), lng(args(2)).toInt,
          // '' routes like an absent column (the 5-arg spelling needs the
          // placeholder to reach the options slot on single-index tables)
          if (args.length >= 4) Some(str(args(3))).filter(_.nonEmpty) else None,
          if (args.length == 5) rawOptsMap(args(4)) else Map.empty[String, String])
      // per-query options (operator / fuzziness / …) compile a plain query
      // into the equivalent Query-DSL match — one scoring path either way
      val rawQuery = applyTextOpts(rawQuery0, ftOpts)
      // the column argument picks ONE of a multi-indexed table's
      // back-references; without it a sole index routes and several error
      val refs = graft.pipeline.PkSearch.fullTextRefs(t)
      // a top-level multi_match names ITS columns — one scorer per column,
      // boost-weighted union-sum (the reference's several-columns query
      // over per-column indexes)
      val multi = if (!rawQuery.trim.startsWith("{")) None
        else graft.pipeline.FullText.parseDsl(rawQuery) match {
          case mm: graft.pipeline.FullText.DslMultiMatch => Some(mm)
          case _ => None
        }
      multi match {
        case Some(mm) =>
          import graft.pipeline.{FullText, Indexes}
          import org.apache.spark.sql.functions.col
          val scorers = mm.columns.map { c =>
            refs.get(c) match {
              case Some(ref) if ref.kind == "pk" =>
                FullText.PostingsDslScorer(FullText.buildPostings(
                  t.read(), ref.idCol, ref.textCol, ref.spec), ref.spec)
              // search-mode-aware (full/detail cover the unindexed delta) —
              // a multi_match spelling must see the same corpus as match
              case Some(ref) =>
                graft.pipeline.IndexLifecycle.fullTextScorer(t, ref)
              case None => throw new IllegalArgumentException(
                s"${t.location}: no full-text index on column $c " +
                  s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})")
            }
          }
          plan(FullText.evalMultiMatch(mm, scorers)
            .orderBy(col("score").desc, col("doc_id")).limit(k))
        case None =>
          val refOpt = colArg match {
            case Some(c) if refs.nonEmpty =>
              Some(refs.getOrElse(c, throw new IllegalArgumentException(
                s"${t.location}: no full-text index on column $c " +
                  s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})")))
            case Some(_) => None // bare index path + column name: route it
            case None if refs.size > 1 =>
              throw new IllegalArgumentException(
                s"${t.location}: multiple full-text indexes " +
                  s"(${refs.keys.toSeq.sorted.mkString(", ")}) — pass the index " +
                  "column argument")
            case None => refs.values.headOption
          }
          // a JSON query routes through the full Query DSL (match operators,
          // fuzziness, phrase, boolean, boost); plain text tokenizes with the
          // ROUTED index's recorded tokenizer (an ngram index grams the query)
          val isDsl = rawQuery.trim.startsWith("{")
          plan(refOpt match {
            case Some(ref) if ref.kind == "pk" && isDsl =>
              graft.pipeline.PkSearch.fullTextDslSearch(t, ref.idCol, ref.textCol,
                rawQuery, k, ref.spec)
            case Some(ref) if ref.kind == "pk" =>
              graft.pipeline.PkSearch.fullTextSearch(t, ref.idCol, ref.textCol,
                graft.pipeline.FullText.tokenizeQuery(rawQuery, ref.spec), k,
                spec = ref.spec)
            case Some(ref) => // "plain": CALL-created persisted postings
              // index — the TABLE route honors full-text-index.search-mode
              // (fast | full | detail, reference full-text.mdx:285)
              graft.pipeline.IndexLifecycle.fullTextQuery(t, ref, rawQuery, k)
            case None =>
              graft.pipeline.Indexes.fullTextSearchText(spark, t.location,
                rawQuery, k)
          })
      }
    },
    // vector_search over an IVF / IVF-RQ INDEX path or a PK TABLE path — a
    // PK table with a file-aligned index (PkSearch.buildVectorIndex writes
    // the back-reference) routes through the snapshot-consistent, DV-aware
    // search (reference BatchVectorSearchBuilderImpl wiring); an IVF-RQ
    // index routes through ADC + exact re-rank; the score column is `score`
    // either way. The optional trailing filterSql masks candidates INSIDE
    // the search (recall-ladder semantics, reference
    // global-index.mdx:297-305) — filtering the returned top-k instead
    // silently yields < k rows.
    // vector_search — two argument shapes:
    //  (a) graft's original:  (ivfOrPkTable, k, nprobe, queryVec
    //        [, 'filterSql'[, 'indexColumn'[, options]]])
    //  (b) the reference's (vector.mdx:306, PaimonTableValuedFunctions:473):
    //        (table, 'column', queryVec, k[, options[, 'filterSql']])
    //      where nprobe is AUTOMATIC (derived from the index + k) unless
    //      `ivf.nprobe` is given.
    // `options` in either shape is a `k=v` string (';' or ',' separated) or
    // a map literal with the reference's per-query search options:
    // ivf.nprobe widens/narrows the probe (overriding shape (a)'s
    // positional value), ivf.refine_factor sizes the exact re-rank window
    // (k × factor) on compressed (RQ) routes — uncompressed IVF/PK routes
    // already score candidates exactly, so the factor adds no work there.
    fd("graft_vector_search") { args =>
      // LATERAL (correlated) form — reference shape (b) with a NON-literal
      // query vector (`q.embedding` from the outer row): return a
      // placeholder leaf; GraftLateralVectorSearchRule collapses the
      // enclosing LateralJoin into one batched search (GraftLateralSearch)
      def litStr(e: Expression): Option[String] = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
          s: UTF8String, org.apache.spark.sql.types.StringType) => Some(s.toString)
        case _ => None
      }
      def litInt(e: Expression): Option[Int] = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v.isInstanceOf[java.lang.Number] => Some(v.toString.toInt)
        case _ => None
      }
      val dynShape = args.length == 4 && litStr(args(0)).isDefined &&
        litStr(args(1)).isDefined && litInt(args(3)).isDefined &&
        !(args(2).resolved && args(2).foldable)
      if (dynShape) {
        val t0 = resolveTable(litStr(args(0)).get)
        GraftDynamicVectorSearch(t0.location, litStr(args(1)).get,
          args(2), litInt(args(3)).get, GraftLateralSearch.outputFor(t0))
      } else {
      val refShape = args.length >= 4 && args(1).dataType == StringType
      require(args.length >= 4 && args.length <= (if (refShape) 6 else 7),
        "graft_vector_search(ivfOrPkTable, k, nprobe, queryVec" +
          "[, 'filterSql'[, 'indexColumn'[, options]]]) | " +
          "graft_vector_search(table, 'column', queryVec, k" +
          "[, options[, 'filterSql']])")
      def filterOf(e: Expression) = Option(e.eval())
        .map(_.toString.trim).filter(_.nonEmpty)
        .map(org.apache.spark.sql.functions.expr)
      val t = resolveTable(str(args(0)))
      val (k, vec, colOpt, opts, filter, np0) =
        if (refShape)
          (lng(args(3)).toInt, floats(args(2)), Some(str(args(1))),
            if (args.length >= 5) searchOpts(args(4))
            else graft.pipeline.Indexes.SearchOptions.empty,
            if (args.length == 6) filterOf(args(5)) else None,
            None)
        else
          (lng(args(1)).toInt, floats(args(3)),
            if (args.length >= 6) Some(str(args(5))).filter(_.nonEmpty) else None,
            if (args.length == 7) searchOpts(args(6))
            else graft.pipeline.Indexes.SearchOptions.empty,
            if (args.length >= 5) filterOf(args(4)) else None,
            Some(lng(args(2)).toInt))
      // the index column picks ONE of a multi-indexed table's per-column
      // back-references; without it a sole index routes and several indexed
      // columns error
      val refs = graft.pipeline.PkSearch.vectorRefs(t)
      val refOpt = colOpt match {
        case Some(c) if refs.nonEmpty || refShape =>
          // shape (b) also reaches here with a bare index path + column
          // name: no refs registered means route the path directly below
          refs.get(c).orElse {
            if (refs.isEmpty) None
            else throw new IllegalArgumentException(
              s"${t.location}: no vector index on column $c " +
                s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})")
          }
        case _ if refs.size > 1 =>
          throw new IllegalArgumentException(
            s"${t.location}: multiple vector indexes " +
              s"(${refs.keys.toSeq.sorted.mkString(", ")}) — pass the index " +
              "column argument")
        case _ => refs.values.headOption
      }
      import graft.pipeline.Indexes
      // ivf.nprobe (per-query option) > positional nprobe > automatic width
      def npFor(loc: String): Int = opts.nprobe.orElse(np0)
        .getOrElse(Indexes.autoNprobe(Indexes.ivfNClusters(spark, loc), k))
      val rerank = opts.rerankFor(k)
      // the index's BUILD-TIME metric is the query metric (the reference's
      // use-the-same-metric-at-build-and-query contract, vector.mdx:292)
      def metricOf(loc: String) = Indexes.ivfMetric(spark, loc)
      def routeLoc(loc: String, embedCol: String) =
        if (Indexes.isRqIndex(spark, loc))
          Indexes.rqSearch(spark, loc, embedCol, vec, k, npFor(loc),
            rerank = rerank, metric = metricOf(loc), scoreCol = "score",
            filter = filter)
        else
          Indexes.ivfSearch(spark, loc, embedCol, vec, k, npFor(loc),
            metric = metricOf(loc), scoreCol = "score", filter = filter)
      plan(refOpt match {
        case Some(ref) if ref.kind == "pk" =>
          graft.pipeline.PkSearch.vectorSearch(t, ref.idxLoc, ref.embedCol,
            vec, k, npFor(ref.idxLoc), metric = metricOf(ref.idxLoc),
            scoreCol = "score", partitionFilter = filter)
        case Some(ref) => // "plain": CALL-created persisted IVF/RQ index —
          // the TABLE route honors vector-index.search-mode (fast | full |
          // detail, reference global-index.mdx:314-359)
          graft.pipeline.IndexLifecycle.vectorQuery(t, ref, vec, k,
            npFor(ref.idxLoc), rerank = rerank, filter = filter)
        case None =>
          routeLoc(t.location,
            colOpt.orElse(Indexes.ivfEmbedCol(spark, t.location))
              .getOrElse("embedding"))
      })
      }
    },
    // hybrid search — two spellings:
    //  (a) the reference's MULTI-ROUTE shape (hybrid-search.mdx:61):
    //      graft_hybrid_search(table, array(named_struct('field', c,
    //        'query_vector', v [, 'limit', n, 'weight', w,
    //        'options', map('ivf.nprobe','8')]), ...),
    //        array(named_struct('column', c, 'query', 'terms or
    //        {"match":{"query":...}}' [, 'limit', n, 'weight', w]), ...),
    //        k [, ranker]) — every route served from its CALL-managed index
    //  (b) two EXPLICIT index paths:
    //      graft_hybrid_search(vecIdx, textIdx, idCol, k, queryVec,
    //        'terms'[, ranker])
    fd("graft_hybrid_search") { args =>
      val multiShape = (args.length == 4 || args.length == 5) &&
        args(1).dataType.isInstanceOf[ArrayType]
      if (multiShape) {
        import graft.pipeline.IndexLifecycle
        val t = resolveTable(str(args(0)))
        val vecRoutes = routeStructs(args(1)).map { case (st, row) =>
          val o = graft.pipeline.Indexes.SearchOptions.fromMap(
            optsAt(st, row, Seq("options")))
          IndexLifecycle.VectorRoute(
            strAt(st, row, Seq("field", "vector_column")).getOrElse(
              throw new IllegalArgumentException("vector route needs field")),
            vecAt(st, row, Seq("query_vector")).getOrElse(
              throw new IllegalArgumentException("vector route needs query_vector")),
            numAt(st, row, Seq("limit")).map(_.toInt),
            numAt(st, row, Seq("weight")).getOrElse(1.0),
            o.nprobe.getOrElse(8), o.refineFactor)
        }
        val txtRoutes = routeStructs(args(2)).map { case (st, row) =>
          // the text route's options map: empty per the reference contract,
          // or graft's DSL-key extension (operator/fuzziness/…) — compiled
          // into the route query; unknown keys reject loudly
          val q = applyTextOpts(
            strAt(st, row, Seq("query")).getOrElse(
              throw new IllegalArgumentException("text route needs query")),
            optsAt(st, row, Seq("options")))
          IndexLifecycle.TextRoute(
            strAt(st, row, Seq("column")).getOrElse(
              throw new IllegalArgumentException("text route needs column")),
            q,
            numAt(st, row, Seq("limit")).map(_.toInt),
            numAt(st, row, Seq("weight")).getOrElse(1.0))
        }
        val ranker = if (args.length == 5) str(args(4)) else "rrf"
        plan(IndexLifecycle.hybridSearch(t, vecRoutes, txtRoutes,
          lng(args(3)).toInt, ranker))
      } else {
        require(args.length == 6 || args.length == 7,
          "graft_hybrid_search(vecIdx, textIdx, idCol, k, queryVec, 'terms'[, ranker])")
        val ranker = if (args.length == 7) str(args(6)) else "rrf"
        val terms = str(args(5)).split("\\s+").filter(_.nonEmpty).toSeq
        plan(graft.pipeline.FullText.hybridIndexSearch(spark,
          str(args(0)), str(args(1)), str(args(2)), floats(args(4)), terms,
          lng(args(3)).toInt, ranker))
      }
    },
    // Composite es-index search: vector and/or terms under one companion
    // filter ('' / NULL to omit a part); filter is a SQL boolean over the
    // index's companion columns; optional trailing ranker for hybrid
    // queries (rrf default | mrr | weighted_score)
    fd("graft_es_search") { args =>
      require(args.length == 6 || args.length == 7,
        "graft_es_search(indexPath, k, 'terms', queryVec, nprobe, 'filterSql'[, ranker])")
      val terms = Option(args(2).eval()).map(_.toString)
        .map(_.split("\\s+").filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val vec = Option(args(3).eval()).map(_ => floats(args(3)))
      val filter = Option(args(5).eval()).map(_.toString.trim).filter(_.nonEmpty)
        .map(org.apache.spark.sql.functions.expr)
      val ranker = if (args.length == 7) str(args(6)) else "rrf"
      // a TABLE path with a CALL-managed composite index routes to it
      val target = resolveTable(str(args(0)))
      val idxLoc = graft.pipeline.IndexLifecycle.esRef(target)
        .getOrElse(target.location)
      plan(graft.pipeline.EsIndex.search(spark, idxLoc,
        lng(args(1)).toInt, vec, terms, filter, nprobe = lng(args(4)).toInt,
        ranker = ranker))
    },
    fd("graft_system") { args =>
      require(args.length == 2, "graft_system(table, name)")
      plan(resolveTable(str(args(0))).systemTable(str(args(1))))
    },
    fd("graft_call") { args =>
      require(args.length >= 2, "graft_call(table, procedure[, 'k=v,k=v'])")
      val t = resolveTable(str(args(0)))
      val opts =
        if (args.length < 3) Map.empty[String, String]
        else str(args(2)).split(',').filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2); k.trim -> v.trim
        }.toMap
      plan(Procedures.call(spark, t, str(args(1)), opts))
    },
    // ---- pipeline operators as TVFs (SQL surface of graft.pipeline) ----
    fd("graft_chunk") { args =>
      require(args.length == 4, "graft_chunk(table, textCol, chunkTokens, overlap)")
      val t = resolveTable(str(args(0)))
      plan(graft.pipeline.CorpusOps.chunkDocs(t.read(), str(args(1)),
        lng(args(2)).toInt, lng(args(3)).toInt))
    },
    fd("graft_sessionize") { args =>
      require(args.length == 5,
        "graft_sessionize(table, userCol, tsCol, gapMs, tieCol)")
      val t = resolveTable(str(args(0)))
      import org.apache.spark.sql.functions.col
      plan(graft.pipeline.Events.sessionize(t.read(), col(str(args(1))),
        col(str(args(2))), lng(args(3)), col(str(args(4)))))
    },
    fd("graft_minhash_pairs") { args =>
      require(args.length == 4,
        "graft_minhash_pairs(table, idCol, textCol, threshold)")
      val t = resolveTable(str(args(0)))
      val thr = args(3).eval() match {
        case n: java.lang.Number => n.doubleValue()
        case o => o.toString.toDouble
      }
      plan(graft.pipeline.Dedup.minhashLshPairs(t.read(), str(args(1)),
        str(args(2)), threshold = thr))
    })
}
