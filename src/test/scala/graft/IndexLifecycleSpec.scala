package graft

import graft.core._
import graft.core.RowOps._
import graft.pipeline.{FullText, IndexLifecycle, PkSearch, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL lifecycle for the search index families (reference
  * CALL sys.create_global_index / refresh / drop with index_type ivf /
  * full-text): one CALL builds the index at its conventional location and
  * back-references it, after which the search TVFs route the TABLE path;
  * refresh pays only for the delta on append tables. */
class IndexLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** Vectors are a pure function of the id (hash-derived), so appended
    * ranges can never duplicate earlier rows — rand(seed) regenerates the
    * same stream per partition offset, which makes exact score ties. */
  private def mkEmbeddings(from: Int, until: Int): DataFrame =
    spark.range(from, until).select(col("id").as("vid"),
      array((0 until dim).map(i =>
        ((pmod(hash(col("id"), lit(i)), lit(2001)) - 1000) / lit(1000.0))
          .cast("float")): _*).as("emb"))

  private def arr(q: Seq[Float]): String =
    q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")

  test("append table ivf: CALL create -> TVF; refresh assigns only the delta; drop") {
    val loc = tmpLoc("lc-ivf")
    val e0 = mkEmbeddings(0, 250)
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    // create through the SQL procedure spelling (graft_call TVF)
    val msg = spark.sql(s"""SELECT * FROM graft_call('$loc',
      'create_global_index', 'index_column=emb,index_type=ivf,clusters=4')""")
      .head().getString(0)
    assert(msg.contains("ivf index built"), msg)
    assert(PkSearch.vectorRef(t).exists(_.kind == "plain"))

    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    def tvf(): Seq[Long] = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)})")
      .as[Long].collect().toSeq
    def exact(df: DataFrame): Seq[Long] =
      Similarity.bruteForceTopK(df, "emb", q, 10, "cosine", "s")
        .select("vid").as[Long].collect().toSeq
    assert(tvf() == exact(t.read()), "nprobe=all over the fresh index is exact")

    // the index serves its build snapshot until REFRESH; the delta-only
    // refresh then assigns just the appended rows to existing centroids
    t.write(mkEmbeddings(250, 300))
    assert(tvf() == exact(t.read(None, Some(1L))), "index reflects snapshot 1")
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(rmsg.contains("delta only"), rmsg)
    assert(tvf() == exact(t.read()), "refreshed index covers the delta")
    // idempotent refresh is a no-op
    assert(Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0).contains("already at"))

    val dmsg = Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(dmsg.contains("dropped"), dmsg)
    assert(PkSearch.vectorRef(GraftTable.load(spark, loc)).isEmpty)
    assert(!t.sm.fs.exists(new org.apache.hadoop.fs.Path(
      IndexLifecycle.vectorIndexLoc(loc, "emb"))))
  }

  test("append table refresh with expired history falls back to rebuild") {
    // expire_snapshots between build and refresh makes the s0..cur delta
    // unreadable — refresh must rebuild, not throw (same posture as the
    // PK route's catch-and-rebuild)
    val loc = tmpLoc("lc-expire")
    val e0 = mkEmbeddings(0, 200)
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    t.write(mkEmbeddings(200, 240))
    t.write(mkEmbeddings(240, 260))
    t.expireSnapshots(retainLast = 1)
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(rmsg.contains("rebuilt"), rmsg)
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    val got = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)})")
      .as[Long].collect().toSeq
    val want = Similarity.bruteForceTopK(t.read(), "emb", q, 10, "cosine", "s")
      .select("vid").as[Long].collect().toSeq
    assert(got == want, "rebuilt index serves the full current snapshot")
  }

  test("drop_global_index dry_run reports matched files without deleting") {
    val loc = tmpLoc("lc-dryrun")
    val e0 = mkEmbeddings(0, 150)
      .withColumn("txt", concat(lit("doc words here "), col("vid")))
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "txt", "index_type" -> "full-text",
        "id_column" -> "vid")).collect()
    val vmsg = Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "ivf", "dry_run" -> "true")).head().getString(0)
    assert(vmsg.contains("dry run") && vmsg.contains("files"), vmsg)
    assert("\\d+".r.findFirstIn(vmsg).exists(_.toInt > 0), vmsg)
    val fmsg = Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "full-text", "dry_run" -> "true")).head().getString(0)
    assert(fmsg.contains("dry run"), fmsg)
    // nothing was deleted: both indexes still route
    assert(PkSearch.vectorRefs(t).keySet == Set("emb"))
    assert(PkSearch.fullTextRefs(t).keySet == Set("txt"))
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    assert(spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 5, 4, ${arr(q)})")
      .count() == 5)
    // the real drop still works after a dry run
    Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "ivf")).collect()
    assert(PkSearch.vectorRefs(t).isEmpty)
  }

  test("filtered search with nprobe=0 terminates (clamped to 1 probe)") {
    // escalateNprobe used to loop forever: min(0*4, n)=0 never progresses;
    // reachable from SQL via graft_vector_search(idx, k, 0, vec, 'filter')
    val loc = tmpLoc("lc-np0")
    val e0 = mkEmbeddings(0, 200)
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    val got = spark.sql(s"""SELECT vid FROM graft_vector_search('$loc', 5, 0,
      ${arr(q)}, 'vid % 2 = 0')""").as[Long].collect().toSeq
    assert(got.length == 5 && got.forall(_ % 2 == 0), s"got $got")
  }

  test("per-column back-references: two vector indexes live independently") {
    // the multimodal norm — text-embedding + image-embedding on one table:
    // each column's index must create/refresh/drop WITHOUT touching the
    // other (the pre-r9 single ref silently repointed lifecycle + routing
    // at the newest index, orphaning the first)
    val loc = tmpLoc("lc-multi")
    val e0 = mkEmbeddings(0, 200).withColumn("emb2", reverse(col("emb")))
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb2", "index_type" -> "ivf", "clusters" -> "4")).collect()
    assert(PkSearch.vectorRefs(t).keySet == Set("emb", "emb2"))

    // ambiguous lifecycle calls must name the columns instead of guessing
    val ex = intercept[Exception] {
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf")).collect() }
    assert(ex.getMessage.contains("emb") && ex.getMessage.contains("emb2"), ex.getMessage)

    // append + per-column refresh: BOTH indexes pick up the delta
    t.write(mkEmbeddings(200, 240).withColumn("emb2", reverse(col("emb"))))
    Seq("emb", "emb2").foreach { c =>
      val m = Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf", "index_column" -> c)).head().getString(0)
      assert(m.contains("delta only"), s"$c: $m")
    }
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    def tvf(c: String): Seq[Long] = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)}, '', '$c')")
      .as[Long].collect().toSeq
    def exact(c: String): Seq[Long] =
      Similarity.bruteForceTopK(t.read(), c, q, 10, "cosine", "s")
        .select("vid").as[Long].collect().toSeq
    assert(tvf("emb") == exact("emb"), "emb route after its refresh")
    assert(tvf("emb2") == exact("emb2"), "emb2 route after its refresh")
    // without a column, a multi-indexed table path must error, not guess
    val exTvf = intercept[Exception] { spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)})").collect() }
    assert(exTvf.getMessage.contains("multiple vector indexes"), exTvf.getMessage)

    // dropping one leaves the other routed (and now unambiguous)
    Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "ivf", "index_column" -> "emb")).collect()
    assert(PkSearch.vectorRefs(t).keySet == Set("emb2"))
    assert(!t.sm.fs.exists(new org.apache.hadoop.fs.Path(
      IndexLifecycle.vectorIndexLoc(loc, "emb"))))
    assert(tvf("emb2") == exact("emb2"), "emb2 survives emb's drop")
    // sole-index short form works again after the drop
    val sole = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)})")
      .as[Long].collect().toSeq
    assert(sole == exact("emb2"), "sole remaining index routes without a column")
  }

  test("PK table with two vector columns: every hybrid route is changelog-reconciled") {
    // the advice-flagged hole: pre-r9, a PK table's SECOND index displaced
    // the single back-reference and that column's hybrid route fell back to
    // the plain (unreconciled) search — superseded rows could score. With
    // per-column refs, BOTH routes carry kind=pk and reconcile post-index
    // updates from the changelog.
    val loc = tmpLoc("lc-pk-multi")
    val e0 = mkEmbeddings(0, 120).withColumn("emb2", reverse(col("emb")))
    val t = GraftTable.create(spark, loc, e0.schema,
      TableConfig(primaryKeys = Seq("vid"), numBuckets = 2,
        options = Map("changelog-producer" -> "input")))
    t.write(e0)
    Seq("emb", "emb2").foreach { c =>
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> c, "index_type" -> "ivf", "clusters" -> "4")).collect()
    }
    assert(PkSearch.vectorRefs(t).values.forall(_.kind == "pk"))
    // UPDATE vid=7's vectors AFTER both indexes were built: the merged state
    // moves, the indexes stay at their build snapshot
    val upd = mkEmbeddings(300, 301).select(lit(7L).as("vid"),
      col("emb")).withColumn("emb2", reverse(col("emb")))
    t.write(upd)
    val q = upd.select("emb").first().getSeq[Float](0)
    // route 1 on emb with vid=7's NEW vector; route 2 on emb2 with its
    // reverse — both must surface vid=7 at rank 1 (reconciled), which the
    // unreconciled index route cannot (it still holds the old vectors)
    import graft.pipeline.IndexLifecycle.VectorRoute
    val fused = IndexLifecycle.hybridSearch(t,
      Seq(VectorRoute("emb", q, nprobe = 4),
        VectorRoute("emb2", q.reverse, nprobe = 4)),
      Nil, k = 3, ranker = "rrf")
      .select("vid").as[Long].collect().toSeq
    assert(fused.head == 7L, s"reconciled routes must rank the update first: $fused")
    val viaEmb2 = PkSearch.vectorRefs(t)("emb2")
    val direct = PkSearch.vectorSearch(t, viaEmb2.idxLoc, "emb2", q.reverse,
      3, 4, scoreCol = "score").select("vid").as[Long].collect().toSeq
    assert(direct.head == 7L, s"emb2's own file-aligned route reconciles: $direct")
  }

  test("append table refresh over a COW delete rebuilds instead of duplicating survivors") {
    // an OVERWRITE commit (row-level delete on an append table) rewrites
    // files; its delta re-lists surviving rows — a delta refresh would
    // duplicate them in the index while the removed rows kept scoring
    val loc = tmpLoc("lc-cow")
    import graft.core.RowOps._
    val e0 = mkEmbeddings(0, 200)
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    t.delete(col("vid") % 3 === 0) // COW rewrite
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(rmsg.contains("rebuilt") && rmsg.contains("non-append"), rmsg)
    val idxLoc = IndexLifecycle.vectorIndexLoc(loc, "emb")
    val idxKeys = GraftTable.load(spark, idxLoc).read()
      .select("vid").as[Long].collect().toSeq
    assert(idxKeys.size == idxKeys.distinct.size, "no duplicated survivors")
    assert(idxKeys.toSet == t.read().select("vid").as[Long].collect().toSet,
      "index equals the post-delete table")
  }

  test("append table full-text: CALL create -> TVF; refresh merges delta postings; drop") {
    val loc = tmpLoc("lc-ft")
    val docs0 = Seq(
      (1L, "spark table scan performance"),
      (2L, "merge on read table"),
      (3L, "unrelated words entirely")).toDF("doc_id", "text")
    val t = GraftTable.create(spark, loc, docs0.schema, TableConfig())
    t.write(docs0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "text", "index_type" -> "full-text",
        "id_column" -> "doc_id")).collect()
    assert(PkSearch.fullTextRef(t).exists(r => r.kind == "plain" && r.idxLoc.nonEmpty))

    def tvf(): Seq[(Long, Double)] = spark.sql(
      s"""SELECT doc_id, round(score, 4) AS score
         |FROM graft_full_text_search('$loc', 'table scan', 10)""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    def exact(df: DataFrame): Seq[(Long, Double)] =
      FullText.search(FullText.buildPostings(df, "doc_id", "text"),
          Seq("table", "scan"), 10)
        .select(col("doc_id"), round(col("score"), 4)).as[(Long, Double)]
        .collect().toSeq
    assert(tvf() == exact(t.read()))

    // delta append + refresh: BOTH postings and corpus/df statistics must
    // merge — scores after refresh equal a from-scratch rebuild's
    t.write(Seq((4L, "table table table scan")).toDF("doc_id", "text"))
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "full-text")).head().getString(0)
    assert(rmsg.contains("delta only"), rmsg)
    assert(tvf() == exact(t.read()), "refreshed scores equal a full rebuild")

    Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "full-text")).collect()
    assert(PkSearch.fullTextRef(GraftTable.load(spark, loc)).isEmpty)
  }

  test("CALL index_type=ivf-rq: compressed index lifecycle — create with " +
      "<index-type>.* options, delta refresh, RQ-preserving rebuild, TVF route") {
    import graft.core.RowOps._
    import graft.pipeline.Indexes
    val loc = tmpLoc("lc-rq-call")
    val e0 = mkEmbeddings(0, 300)
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig())
    t.write(e0)
    val cmsg = Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf-rq",
        "ivf-rq.nlist" -> "4", "ivf-rq.rq.bits" -> "4",
        "ivf-rq.pq.m" -> "4")).head().getString(0)
    assert(cmsg.contains("ivf-rq index built") && cmsg.contains("bits 4"), cmsg)
    val idxLoc = IndexLifecycle.vectorIndexLoc(loc, "emb")
    assert(Indexes.isRqIndex(spark, idxLoc), "persisted kind is RQ")
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    // the TABLE path routes through the back-reference onto the RQ search;
    // refine 40×10 ≥ corpus → exact re-rank == direct rqSearch
    def tvf(): Seq[Long] = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 'emb', ${arr(q)}, 10, " +
        "'ivf.nprobe=4;ivf.refine_factor=40')").as[Long].collect().toSeq
    def direct(): Seq[Long] = Indexes
      .rqSearch(spark, idxLoc, "emb", q, 10, nprobe = 4, rerank = 400)
      .select("vid").as[Long].collect().toSeq
    assert(tvf() == direct(), s"TVF vs direct:\n${tvf()}\n${direct()}")
    // delta refresh: appended rows assign + encode against the STORED model
    t.write(mkEmbeddings(300, 400))
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf-rq")).head().getString(0)
    assert(rmsg.contains("ivf-rq index refreshed") &&
      rmsg.contains("delta only"), rmsg)
    assert(tvf() == direct(), "post-refresh TVF equals direct RQ search")
    // COW delete → rebuild branch: the index must STAY ivf-rq with its
    // recorded geometry, never degrade to plain ivf
    t.delete(col("vid") % 5 === 0)
    val rb = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf-rq")).head().getString(0)
    assert(rb.contains("ivf-rq index rebuilt"), rb)
    assert(Indexes.isRqIndex(spark, idxLoc), "rebuild preserved the RQ kind")
    val model = Indexes.loadRqModel(spark, idxLoc)
    assert(model.ivf.centroids.length == 4 &&
      model.pq.codebooks.length == 4 && model.pq.codebooks(0).length == 16,
      "rebuild preserved nlist/pq.m/code width")
    assert(tvf() == direct(), "post-rebuild TVF equals direct RQ search")
    // unsupported compressed spellings are rejected loudly, naming ivf-rq
    val ex = intercept[Exception] { Procedures.call(spark, t,
      "create_global_index", Map("index_column" -> "emb",
        "index_type" -> "ivf-pq")).collect() }
    assert(ex.getMessage.contains("ivf-rq"), ex.getMessage)
    // drop accepts the family alias
    Procedures.call(spark, t, "drop_global_index",
      Map("index_type" -> "ivf-rq")).collect()
    assert(PkSearch.vectorRef(GraftTable.load(spark, loc)).isEmpty)
  }

  test("search-mode=full covers unindexed rows: equals the post-refresh " +
      "search across match/And/fuzzy/phrase, fast mode stays snapshot-bound") {
    import graft.pipeline.Indexes
    val docs0 = Seq(
      (1L, "spark reads parquet fast and spark scans tables"),
      (2L, "parquet scans are fast"),
      (3L, "tables without the magic word"),
      (4L, "spark writes parquet slowly")).toDF("doc_id", "text")
    val delta = Seq(
      (5L, "fast spark fast parquet"),
      (6L, "spark scans parquet tables")).toDF("doc_id", "text")
    def mk(mode: String, name: String): GraftTable = {
      val loc = tmpLoc(name)
      val t = GraftTable.create(spark, loc, docs0.schema, TableConfig(
        options = Map("full-text-index.search-mode" -> mode)))
      t.write(docs0)
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "text", "index_type" -> "full-text",
          "id_column" -> "doc_id", "full-text.with-position" -> "true")).collect()
      t.write(delta) // unindexed rows
      t
    }
    def search(t: GraftTable, q: String): Seq[(Long, Double)] = spark.sql(
      s"""SELECT doc_id, round(score, 6) AS s
         |FROM graft_full_text_search('${t.location}', '$q', 100)
         |ORDER BY s DESC, doc_id""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    val full = mk("full", "lc-mode-full")
    val fast = mk("fast", "lc-mode-fast")
    // the post-refresh ground truth: same corpus, index refreshed
    val refreshed = mk("fast", "lc-mode-refd")
    Procedures.call(spark, refreshed, "refresh_global_index",
      Map("index_type" -> "full-text")).collect()
    val queries = Seq(
      "spark parquet",                                      // plain Or
      """{"match":{"query":"spark parquet","operator":"And"}}""",
      """{"match":{"query":"spak","fuzziness":1}}""",       // delta term hits
      """{"match_phrase":{"query":"spark scans"}}""",       // delta doc 6
      """{"boolean":{"must":[{"match":{"query":"parquet"}}],
        |"must_not":[{"match":{"query":"slowly"}}]}}""".stripMargin)
    queries.foreach { q =>
      assert(search(full, q) == search(refreshed, q),
        s"mode=full must equal post-refresh for $q")
    }
    // fast mode stays bound to the indexed snapshot: doc 5/6 invisible
    assert(!search(fast, "fast spark").exists(r => r._1 == 5L || r._1 == 6L),
      "fast mode must not see unindexed rows")
    // and mode=full sees them
    assert(search(full, "fast spark").exists(_._1 == 5L))
    // unknown mode fails loudly
    val bad = mk("nope", "lc-mode-bad")
    val ex = intercept[Exception] { search(bad, "spark") }
    assert(ex.getMessage.contains("search-mode"), ex.getMessage)
  }

  test("vector-index.search-mode=full covers unindexed rows: equals the " +
      "post-refresh search for ivf AND ivf-rq; fast stays snapshot-bound") {
    import graft.pipeline.Indexes
    for (family <- Seq("ivf", "ivf-rq")) {
      val createArgs =
        if (family == "ivf")
          Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")
        else Map("index_column" -> "emb", "index_type" -> "ivf-rq",
          "ivf-rq.nlist" -> "4", "ivf-rq.pq.m" -> "4")
      def mk(mode: String, name: String): GraftTable = {
        val loc = tmpLoc(name)
        val e0 = mkEmbeddings(0, 200)
        val t = GraftTable.create(spark, loc, e0.schema, TableConfig(
          options = Map("vector-index.search-mode" -> mode)))
        t.write(e0)
        Procedures.call(spark, t, "create_global_index", createArgs).collect()
        t.write(mkEmbeddings(200, 260)) // unindexed rows
        t
      }
      val q = mkEmbeddings(0, 200).filter(col("vid") === 3)
        .select("emb").first().getSeq[Float](0)
      // refine 40×10 ≥ corpus on the RQ route so both families are exact
      // within their probed candidates — the full/refreshed equality is
      // then deterministic
      def search(t: GraftTable): Seq[Long] = spark.sql(
        s"SELECT vid FROM graft_vector_search('${t.location}', 10, 4, " +
          s"${arr(q)}, '', '', 'ivf.refine_factor=40')")
        .as[Long].collect().toSeq
      val full = mk("full", s"lc-vmode-full-$family")
      val fast = mk("fast", s"lc-vmode-fast-$family")
      val refreshed = mk("fast", s"lc-vmode-refd-$family")
      Procedures.call(spark, refreshed, "refresh_global_index",
        Map("index_type" -> family)).collect()
      assert(search(full) == search(refreshed),
        s"$family: mode=full must equal the post-refresh search")
      assert(!search(fast).exists(_ >= 200L),
        s"$family: fast mode must not see unindexed rows")
    }
  }

  test("hybrid vector route honors ivf.refine_factor on a CALL-managed " +
      "RQ index (route options drive the rerank window)") {
    import graft.pipeline.Indexes
    val loc = tmpLoc("lc-hyb-rq")
    val emb = mkEmbeddings(0, 300)
    // a text column rides along so the table carries a full-text ref (the
    // id-column source for hybrid fusion on an append table)
    val docs = emb.withColumn("text",
      concat(lit("doc word"), (col("vid") % 3).cast("string")))
    val t = GraftTable.create(spark, loc, docs.schema, TableConfig())
    t.write(docs)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "text", "index_type" -> "full-text",
        "id_column" -> "vid")).collect()
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf-rq",
        "ivf-rq.nlist" -> "4", "ivf-rq.pq.m" -> "4")).collect()
    val idxLoc = IndexLifecycle.vectorIndexLoc(loc, "emb")
    assert(Indexes.isRqIndex(spark, idxLoc))
    val q = emb.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    // ONE vector route ⇒ fusion order = route order; refine 40×10 ≥ corpus
    // ⇒ the route must equal the direct RQ search with rerank 400
    def hyb(opts: String): Seq[Long] = spark.sql(
      s"""SELECT vid FROM graft_hybrid_search('$loc',
         |  array(named_struct('field', 'emb', 'query_vector', ${arr(q)},
         |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
         |    'options', map($opts))),
         |  array(), 10, 'rrf')""".stripMargin).as[Long].collect().toSeq
    val direct = Indexes
      .rqSearch(spark, idxLoc, "emb", q, 10, nprobe = 4, rerank = 400)
      .select("vid").as[Long].collect().toSeq
    assert(hyb("'ivf.nprobe', '4', 'ivf.refine_factor', '40'") == direct,
      "hybrid RQ route with refine must equal the direct RQ search")
  }

  test("graft_full_text_search accepts the reference's argument order " +
      "(table, column, query, limit)") {
    val loc = tmpLoc("lc-ft-refshape")
    val docs0 = Seq(
      (1L, "spark table scan performance"),
      (2L, "merge on read table"),
      (3L, "unrelated words entirely")).toDF("doc_id", "text")
    val t = GraftTable.create(spark, loc, docs0.schema, TableConfig())
    t.write(docs0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "text", "index_type" -> "full-text",
        "id_column" -> "doc_id")).collect()
    val viaGraft = spark.sql(
      s"""SELECT doc_id, round(score, 4) AS s
         |FROM graft_full_text_search('$loc', 'table scan', 10)""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    val viaRef = spark.sql(
      s"""SELECT doc_id, round(score, 4) AS s
         |FROM graft_full_text_search('$loc', 'text', 'table scan', 10)""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    assert(viaRef == viaGraft, s"$viaRef vs $viaGraft")
    // the reference shape + JSON query routes the DSL too
    val viaDsl = spark.sql(
      s"""SELECT doc_id, round(score, 4) AS s FROM graft_full_text_search(
         |'$loc', 'text', '{"match":{"query":"table scan"}}', 10)""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    assert(viaDsl == viaGraft, s"$viaDsl vs $viaGraft")
    // a wrong column still errors with the indexed list
    val ex = intercept[Exception] { spark.sql(
      s"SELECT doc_id FROM graft_full_text_search('$loc', 'nope', 'x', 5)")
      .collect() }
    assert(ex.getMessage.contains("no full-text index on column nope"),
      ex.getMessage)
  }

  test("full-text REBUILD preserves the recorded tokenizer + positions " +
      "(non-append history must not reset ngram/phrase semantics)") {
    import graft.core.RowOps._
    import graft.pipeline.Indexes
    val loc = tmpLoc("lc-ft-rebuild")
    val docs0 = Seq(
      (1L, "spark table scan"), (2L, "sparkly stable plans"),
      (3L, "unrelated words entirely")).toDF("doc_id", "text")
    val t = GraftTable.create(spark, loc, docs0.schema, TableConfig())
    t.write(docs0)
    // an ngram(3) index WITH positions — both settings must survive rebuild
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "text", "index_type" -> "full-text",
        "id_column" -> "doc_id", "full-text.tokenizer" -> "ngram",
        "full-text.with-position" -> "true")).collect()
    val idxLoc = IndexLifecycle.fullTextIndexLoc(loc, "text")
    val spec0 = Indexes.readTokenizer(spark, idxLoc)
    assert(spec0.kind == "ngram")
    def substrHits(): Set[Long] = spark.sql(
      s"""SELECT doc_id FROM graft_full_text_search('$loc', 'park', 10)"""
      ).as[Long].collect().toSet
    assert(substrHits() == Set(1L, 2L), "ngram substring search works")
    // COW delete forces the REBUILD branch (non-append history)
    t.delete(col("doc_id") === 3L)
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "full-text")).head().getString(0)
    assert(rmsg.contains("rebuilt"), rmsg)
    // pre-fix, the rebuild silently reset to the default tokenizer and
    // dropped positions: substring queries found nothing, phrase broke
    val spec1 = Indexes.readTokenizer(spark, idxLoc)
    assert(spec1 == spec0, s"rebuild changed the tokenizer: $spec0 -> $spec1")
    assert(Indexes.readWithPositions(spark, idxLoc),
      "rebuild dropped the positions flag")
    assert(substrHits() == Set(1L, 2L),
      "ngram substring search must survive the rebuild")
  }

  test("append table es: CALL create -> graft_es_search on the TABLE path; refresh; drop") {
    val loc = tmpLoc("lc-es")
    val docs0 = Seq(
      (1L, "spark table scan performance", "en"),
      (2L, "merge on read table", "en"),
      (3L, "unrelated words entirely", "de"),
      (4L, "table scan table scan", "de")).toDF("doc_id", "text", "lang")
    val t = GraftTable.create(spark, loc, docs0.schema, TableConfig())
    t.write(docs0)
    val msg = Procedures.call(spark, t, "create_global_index",
      Map("index_type" -> "es", "id_column" -> "doc_id",
        "text_column" -> "text", "keyword_columns" -> "lang"))
      .head().getString(0)
    assert(msg.contains("es index built"), msg)

    def tvf(): Seq[Long] = spark.sql(
      s"""SELECT doc_id FROM graft_es_search('$loc', 10,
         |  'table scan', NULL, 8, "lang = 'en'")""".stripMargin)
      .as[Long].collect().toSeq
    assert(tvf() == Seq(1L, 2L), s"filtered BM25 through the table path: ${tvf()}")

    // delta append + refresh: the new en doc outranks (3× term hits)
    t.write(Seq((5L, "table scan table scan table scan", "en"))
      .toDF("doc_id", "text", "lang"))
    assert(tvf() == Seq(1L, 2L), "index serves its build snapshot until refresh")
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "es")).head().getString(0)
    assert(rmsg.contains("delta only"), rmsg)
    assert(tvf().head == 5L, s"refreshed index must surface the new doc first: ${tvf()}")

    // the lifecycle is visible in the table_indexes system table
    val kinds = t.systemTable("table_indexes").select("index_type")
      .as[String].collect().toSet
    assert(kinds.contains("es"), s"table_indexes must list the es index: $kinds")

    Procedures.call(spark, t, "drop_global_index", Map("index_type" -> "es")).collect()
    assert(graft.pipeline.IndexLifecycle.esRef(GraftTable.load(spark, loc)).isEmpty)
  }

  test("PK table es refresh re-derives from the merged state, never appends stale versions") {
    val loc = tmpLoc("lc-es-pk")
    val docs0 = Seq(
      (1L, "spark table scan performance", "en"),
      (2L, "merge on read table", "en"),
      (3L, "table scan table scan", "en")).toDF("doc_id", "text", "lang")
    val t = GraftTable.create(spark, loc, docs0.schema,
      TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 2))
    t.write(docs0)
    Procedures.call(spark, t, "create_global_index",
      Map("index_type" -> "es", "id_column" -> "doc_id",
        "text_column" -> "text", "keyword_columns" -> "lang")).collect()
    def tvf(): Seq[Long] = spark.sql(
      s"""SELECT doc_id FROM graft_es_search('$loc', 10,
         |  'table scan', NULL, 8, "lang = 'en'")""".stripMargin)
      .as[Long].collect().toSeq
    assert(tvf().head == 3L)

    // UPSERT: doc 3's new text no longer matches — after refresh it must
    // DISAPPEAR from the ranking (an append-shaped refresh would keep the
    // old version scoring)
    t.write(Seq((3L, "completely different words now", "en"))
      .toDF("doc_id", "text", "lang"))
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "es")).head().getString(0)
    assert(rmsg.contains("re-derived"), rmsg)
    val after = tvf()
    assert(!after.contains(3L), s"superseded version leaked into the ranking: $after")
    assert(after == Seq(1L, 2L), after)
  }

  test("multi-route hybrid TVF: weighted fusion across CALL-managed indexes") {
    // the reference hybrid_search(table, vector_routes, full_text_routes,
    // limit[, ranker]) shape: named_struct route configs with per-route
    // limit/weight/options, every route served from its own index
    val loc = tmpLoc("lc-hybrid")
    val docs = mkEmbeddings(0, 100).withColumnRenamed("vid", "doc_id")
      .withColumn("text",
        when(col("doc_id") % 3 === 0, concat(lit("table scan fast doc "), col("doc_id")))
          .otherwise(concat(lit("merge read words doc "), col("doc_id"))))
    val t = GraftTable.create(spark, loc, docs.schema, TableConfig())
    t.write(docs)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")).collect()
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "text", "index_type" -> "full-text",
        "id_column" -> "doc_id")).collect()

    val q = docs.filter(col("doc_id") === 7).select("emb").first().getSeq[Float](0)
    val got = spark.sql(
      s"""SELECT doc_id, round(score, 6) AS score
         |FROM graft_hybrid_search('$loc',
         |  array(named_struct('field', 'emb', 'query_vector', ${arr(q)},
         |    'limit', 20, 'weight', CAST(2.0 AS DOUBLE),
         |    'options', map('ivf.nprobe', '4'))),
         |  array(named_struct('column', 'text',
         |    'query', '{"match":{"query":"table scan"}}',
         |    'limit', 20, 'weight', CAST(1.0 AS DOUBLE))),
         |  10, 'mrr')""".stripMargin)
      .as[(Long, Double)].collect().toSeq

    // independent model: rank each route's top-20, fuse Σ weight/rank
    val idxLoc = graft.pipeline.IndexLifecycle.vectorIndexLoc(loc, "emb")
    val vecTop = graft.pipeline.Indexes
      .ivfSearch(spark, idxLoc, "emb", q, 20, nprobe = 4, scoreCol = "score")
      .select(col("doc_id").cast("long"), col("score").cast("double"))
      .as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), r) => id -> 2.0 / (r + 1) }
    val ftLoc = graft.pipeline.IndexLifecycle.fullTextIndexLoc(loc, "text")
    val txtTop = graft.pipeline.Indexes
      .fullTextSearch(spark, ftLoc, Seq("table", "scan"), 20)
      .select(col("doc_id").cast("long"), col("score").cast("double"))
      .as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), r) => id -> 1.0 / (r + 1) }
    val want = (vecTop ++ txtTop).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .map { case (id, s) => (id, BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got == want, s"\ngot:  $got\nwant: $want")

    // text-only spelling: an empty array() for the vector routes
    val textOnly = spark.sql(
      s"""SELECT doc_id FROM graft_hybrid_search('$loc', array(),
         |  array(named_struct('column', 'text', 'query', 'table scan',
         |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE))), 5, 'rrf')""".stripMargin)
      .as[Long].collect().toSeq
    assert(textOnly.nonEmpty && textOnly.forall(_ % 3 == 0),
      s"text route must only surface 'table scan' docs: $textOnly")

    // text-route per-query options: an empty map passes (the reference
    // contract), the DSL-key extension compiles into the route query
    // (operator=And narrows to docs carrying BOTH terms), and an unknown
    // key rejects loudly instead of silently steering the search
    val emptyOpts = spark.sql(
      s"""SELECT doc_id FROM graft_hybrid_search('$loc', array(),
         |  array(named_struct('column', 'text', 'query', 'table scan',
         |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
         |    'options', map())), 5, 'rrf')""".stripMargin)
      .as[Long].collect().toSeq
    assert(emptyOpts == textOnly, s"empty options must not change the route")
    val andOpts = spark.sql(
      s"""SELECT doc_id FROM graft_hybrid_search('$loc', array(),
         |  array(named_struct('column', 'text', 'query', 'table scan',
         |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
         |    'options', map('operator', 'And'))), 5, 'rrf')""".stripMargin)
      .as[Long].collect().toSeq
    assert(andOpts.nonEmpty && andOpts.forall(_ % 3 == 0), s"and-opts: $andOpts")
    val badKey = intercept[Exception] {
      spark.sql(
        s"""SELECT doc_id FROM graft_hybrid_search('$loc', array(),
           |  array(named_struct('column', 'text', 'query', 'table scan',
           |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
           |    'options', map('es.mystery', '1'))), 5, 'rrf')""".stripMargin).collect()
    }
    assert(badKey.getMessage.contains("unknown full-text search option"),
      badKey.getMessage)

    // TWO vector routes, no text route (the reference's doc case): each
    // field served from its own index, empty array() for the text routes
    import graft.core.RowOps._
    GraftTable.load(spark, loc).addColumns(
      org.apache.spark.sql.types.StructField("emb2",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true)))
    val t2 = GraftTable.load(spark, loc)
    t2.update(Map("emb2" -> reverse(col("emb"))), lit(true))
    Procedures.call(spark, t2, "create_global_index",
      Map("index_column" -> "emb2", "index_type" -> "ivf", "clusters" -> "4")).collect()
    val twoVec = spark.sql(
      s"""SELECT doc_id FROM graft_hybrid_search('$loc',
         |  array(
         |    named_struct('field', 'emb', 'query_vector', ${arr(q)},
         |      'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
         |      'options', map('ivf.nprobe', '4')),
         |    named_struct('field', 'emb2', 'query_vector', ${arr(q.reverse)},
         |      'limit', 10, 'weight', CAST(1.0 AS DOUBLE),
         |      'options', map('ivf.nprobe', '4'))),
         |  array(), 5, 'rrf')""".stripMargin)
      .as[Long].collect().toSeq
    // emb2 = reverse(emb) and the second query = reverse(q): both routes
    // rank identically, so the fusion's top hit is the shared top-1 (doc 7)
    assert(twoVec.head == 7L, s"two-vector-route fusion: $twoVec")
  }

  test("graft_vector_search routes an IVF-RQ index path through ADC + re-rank") {
    val loc = tmpLoc("lc-rq-route")
    val emb = mkEmbeddings(0, 400)
    graft.pipeline.Indexes.buildIvfRq(spark, emb, "emb", loc, dim,
      nClusters = 4, m = 4, ks = 16)
    val q = emb.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    val viaTvf = spark.sql(
      s"SELECT vid, round(score, 4) AS s FROM graft_vector_search('$loc', 10, 4, ${arr(q)})")
      .as[(Long, Double)].collect().toSeq
    val direct = graft.pipeline.Indexes
      .rqSearch(spark, loc, "emb", q, 10, nprobe = 4, scoreCol = "score")
      .select(col("vid"), round(col("score"), 4)).as[(Long, Double)]
      .collect().toSeq
    assert(viaTvf == direct, s"TVF must take the ADC route:\n$viaTvf\n$direct")
  }

  test("per-query search options: both TVF shapes, string + map forms, " +
      "refine_factor drives the RQ rerank, ivf.nprobe overrides positional") {
    val loc = tmpLoc("lc-rq-opts")
    val emb = mkEmbeddings(0, 400)
    graft.pipeline.Indexes.buildIvfRq(spark, emb, "emb", loc, dim,
      nClusters = 4, m = 4, ks = 16)
    val q = emb.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    def run(sql: String): Seq[Long] = spark.sql(sql).as[Long].collect().toSeq
    // the reference's shape (table, column, vec, k) with AUTOMATIC nprobe
    // (vector.mdx:306): docs examples run verbatim
    val auto = run(
      s"SELECT vid FROM graft_vector_search('$loc', 'emb', ${arr(q)}, 10)")
    assert(auto.size == 10, s"automatic-nprobe search returned ${auto.size}")
    // refine_factor=40 re-ranks 400 ≥ corpus candidates — exact, and every
    // spelling (string/map options, reference/positional shape) must take
    // the same rerank machinery as the direct Scala call
    val direct = graft.pipeline.Indexes
      .rqSearch(spark, loc, "emb", q, 10, nprobe = 4, rerank = 400)
      .select("vid").as[Long].collect().toSeq
    val viaStr = run(s"SELECT vid FROM graft_vector_search('$loc', 'emb', " +
      s"${arr(q)}, 10, 'ivf.nprobe=4;ivf.refine_factor=40')")
    val viaMap = run(s"SELECT vid FROM graft_vector_search('$loc', 'emb', " +
      s"${arr(q)}, 10, map('ivf.nprobe', '4', 'rerank-factor', '40'))")
    val viaPos = run(s"SELECT vid FROM graft_vector_search('$loc', 10, 4, " +
      s"${arr(q)}, '', '', 'ivf.refine_factor=40')")
    assert(viaStr == direct, s"string options: $viaStr vs $direct")
    assert(viaMap == direct, s"map options: $viaMap vs $direct")
    assert(viaPos == direct, s"positional shape + options: $viaPos vs $direct")
    // the per-query ivf.nprobe option overrides the positional nprobe
    val overridden = run(s"SELECT vid FROM graft_vector_search('$loc', 10, 1, " +
      s"${arr(q)}, '', '', 'ivf.nprobe=4,ivf.refine_factor=40')")
    assert(overridden == direct, s"ivf.nprobe override: $overridden vs $direct")
    // unknown options fail loudly (typo safety), as do non-ivf prefixes
    val ex = intercept[Exception] { run(s"SELECT vid FROM graft_vector_search(" +
      s"'$loc', 'emb', ${arr(q)}, 10, 'diskann.l_search=10')") }
    assert(ex.getMessage.contains("ivf"), ex.getMessage)
  }

  test("randomized lifecycle differential: refresh always converges to the table state") {
    // random interleavings of {append, COW delete, refresh} against a model:
    // after every refresh the index must hold EXACTLY the table's current
    // rows (delta refreshes over pure-append runs, rebuilds after deletes),
    // with no duplicated or resurrected ids — 2 seeds per index family
    // (plain ivf AND compressed ivf-rq, which must also never degrade to
    // plain on a rebuild)
    for ((seed, family) <- Seq(11 -> "ivf", 23 -> "ivf", 31 -> "ivf-rq",
                               47 -> "ivf-rq")) {
      val rnd = new scala.util.Random(seed)
      val loc = tmpLoc(s"lc-fuzz-$family-$seed")
      var next = 120L
      val t = GraftTable.create(spark, loc, mkEmbeddings(0, 1).schema, TableConfig())
      t.write(mkEmbeddings(0, next.toInt))
      val createArgs =
        if (family == "ivf")
          Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4")
        else Map("index_column" -> "emb", "index_type" -> "ivf-rq",
          "ivf-rq.nlist" -> "4", "ivf-rq.pq.m" -> "4")
      Procedures.call(spark, t, "create_global_index", createArgs).collect()
      val idxLoc = IndexLifecycle.vectorIndexLoc(loc, "emb")
      def checkKind(): Unit = if (family == "ivf-rq")
        assert(graft.pipeline.Indexes.isRqIndex(spark, idxLoc),
          s"seed=$seed: refresh degraded the RQ index to plain ivf")
      def tableIds = t.read().select("vid").as[Long].collect().toSeq
      def idxIds = GraftTable.load(spark, idxLoc).read()
        .select("vid").as[Long].collect().toSeq
      (1 to 8).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val n = 20 + rnd.nextInt(40)
            t.write(mkEmbeddings(next.toInt, next.toInt + n)); next += n
          case 1 =>
            import graft.core.RowOps._
            val (p, r) = (2 + rnd.nextInt(5), rnd.nextInt(2))
            t.delete(col("vid") % p === r)
          case 2 =>
            Procedures.call(spark, t, "refresh_global_index",
              Map("index_type" -> family)).collect()
            checkKind()
            val (ti, ii) = (tableIds, idxIds)
            assert(ii.size == ii.distinct.size, s"seed=$seed: duplicated ids in index")
            assert(ii.toSet == ti.toSet,
              s"seed=$seed: index diverged (missing=${ti.toSet -- ii.toSet}, " +
                s"extra=${ii.toSet -- ti.toSet})")
        }
      }
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> family)).collect()
      checkKind()
      assert(idxIds.toSet == tableIds.toSet, s"seed=$seed: final refresh diverged")
    }
  }

  test("build-time distance.metric resolves per-field options and survives rebuilds") {
    import graft.pipeline.Indexes
    val loc = tmpLoc("lc-metric")
    val e0 = mkEmbeddings(0, 200)
    // metric + nlist from TABLE options (CALL names neither): the per-field
    // spelling wins for its column, the shared ivf.* form supplies the rest
    val t = GraftTable.create(spark, loc, e0.schema, TableConfig(
      options = Map("fields.emb.distance.metric" -> "l2", "ivf.nlist" -> "4")))
    t.write(e0)
    val msg = Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf")).head().getString(0)
    assert(msg.contains("metric l2"), msg)
    val idxLoc = IndexLifecycle.vectorIndexLoc(loc, "emb")
    assert(Indexes.ivfMetric(spark, idxLoc) == "l2")
    assert(Indexes.loadIvfModel(spark, idxLoc).centroids.length == 4)
    val q = e0.filter(col("vid") === 3).select("emb").first().getSeq[Float](0)
    def tvf() = spark.sql(
      s"SELECT vid FROM graft_vector_search('$loc', 10, 4, ${arr(q)})")
      .as[Long].collect().toSeq
    def exactL2() = Similarity.bruteForceTopK(t.read(), "emb", q, 10, "l2", "s")
      .select("vid").as[Long].collect().toSeq
    assert(tvf() == exactL2(), "table path must score with the index's l2 metric")
    // a COW delete forces the rebuild branch: the metric must survive it
    import graft.core.RowOps._
    t.delete(col("vid") % 9 === 0)
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(rmsg.contains("rebuilt"), rmsg)
    assert(Indexes.ivfMetric(spark, idxLoc) == "l2", "rebuild dropped the metric")
    assert(tvf() == exactL2(), "post-rebuild table path still scores l2")
  }

  test("randomized multi-column differential: per-column refreshes converge independently") {
    // two vector indexes on one table under random {append, COW delete,
    // refresh-emb, refresh-emb2} interleavings: after refreshing column c,
    // c's index holds EXACTLY the table's current rows regardless of how
    // stale the OTHER column's index is — per-column sidecars must never
    // cross-contaminate (shared-source-snapshot bugs would surface as a
    // skipped rebuild or duplicated delta here)
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val loc = tmpLoc(s"lc-fuzz2-$seed")
      var next = 100L
      def withCols(df: DataFrame) = df.withColumn("emb2", reverse(col("emb")))
      val t = GraftTable.create(spark, loc,
        withCols(mkEmbeddings(0, 1)).schema, TableConfig())
      t.write(withCols(mkEmbeddings(0, next.toInt)))
      Seq("emb", "emb2").foreach { c =>
        Procedures.call(spark, t, "create_global_index",
          Map("index_column" -> c, "index_type" -> "ivf", "clusters" -> "4")).collect()
      }
      def tableIds = t.read().select("vid").as[Long].collect().toSet
      def idxIds(c: String) = GraftTable.load(spark,
        IndexLifecycle.vectorIndexLoc(loc, c)).read()
        .select("vid").as[Long].collect().toSeq
      (1 to 10).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 =>
            val n = 15 + rnd.nextInt(30)
            t.write(withCols(mkEmbeddings(next.toInt, next.toInt + n))); next += n
          case 1 =>
            import graft.core.RowOps._
            val (p, r) = (2 + rnd.nextInt(5), rnd.nextInt(2))
            t.delete(col("vid") % p === r)
          case k =>
            val c = if (k == 2) "emb" else "emb2"
            Procedures.call(spark, t, "refresh_global_index",
              Map("index_type" -> "ivf", "index_column" -> c)).collect()
            val ii = idxIds(c)
            assert(ii.size == ii.distinct.size, s"seed=$seed: dup ids in $c index")
            assert(ii.toSet == tableIds,
              s"seed=$seed: $c index diverged (missing=${tableIds -- ii.toSet}, " +
                s"extra=${ii.toSet -- tableIds})")
        }
      }
      Seq("emb", "emb2").foreach { c =>
        Procedures.call(spark, t, "refresh_global_index",
          Map("index_type" -> "ivf", "index_column" -> c)).collect()
        assert(idxIds(c).toSet == tableIds, s"seed=$seed: final $c refresh diverged")
      }
    }
  }

  test("query DSL on a PK table: phrase + boolean served from the merged state") {
    // the TVF routes a JSON query through the DSL; PK tables derive
    // postings (positions included, when a phrase asks) from the CURRENT
    // merged state, so upserts re-rank immediately with no index refresh
    val loc = tmpLoc("lc-pk-dsl")
    val df = Seq(
      (1L, "fast table scan wins"),
      (2L, "table scan is slow here"),
      (3L, "scan table inverted")).toDF("k", "txt")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    t.write(df)
    Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "txt", "index_type" -> "full-text",
        "id_column" -> "k")).collect()
    def q(json: String) = spark.sql(
      s"SELECT doc_id FROM graft_full_text_search('$loc', '$json', 10)")
      .as[Long].collect().toSet
    assert(q("""{"match_phrase":{"query":"table scan"}}""") == Set(1L, 2L))
    assert(q("""{"boolean":{"must":[{"match":{"query":"scan"}}],
      "must_not":[{"match":{"query":"slow"}}]}}""") == Set(1L, 3L))
    // an upsert moves the merged state; the DSL search reflects it at once
    t.write(Seq((2L, "entirely different content")).toDF("k", "txt"))
    assert(q("""{"match_phrase":{"query":"table scan"}}""") == Set(1L))
  }

  test("PK table: ivf create delegates to the file-aligned route; full-text only registers") {
    val loc = tmpLoc("lc-pk")
    val e0 = mkEmbeddings(0, 200).withColumnRenamed("vid", "k")
      .withColumn("txt", concat(lit("doc number "), col("k")))
    val t = GraftTable.create(spark, loc, e0.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
    t.write(e0)
    val msg = Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "emb", "index_type" -> "ivf", "clusters" -> "4"))
      .head().getString(0)
    assert(msg.contains("file-aligned"), msg)
    assert(PkSearch.vectorRef(t).exists(_.kind == "pk"))
    // refresh with no table advance is a no-op
    assert(Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0).contains("already at"))

    // advance the table (upsert wave + DV delete), then DELTA-align: the
    // touched keys are COW-deleted out of the index and re-appended from
    // the merged state — after refresh the index ITSELF is current (no
    // query-time changelog reconciliation, no deleted keys in the index)
    import graft.core.RowOps._
    t.write(t.read().filter(col("k") % 10 === 0)
      .withColumn("emb", reverse(col("emb"))))
    t.deleteDv(col("k") % 7 === 0)
    val rmsg = Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "ivf")).head().getString(0)
    assert(rmsg.contains("delta-aligned"), rmsg)
    val q = t.read().filter(col("k") === 3).select("emb").first().getSeq[Float](0)
    val got = PkSearch.vectorSearch(t, IndexLifecycle.vectorIndexLoc(loc, "emb"),
        "emb", q, 10, nprobe = 4)
      .select("k").as[Long].collect().toSeq
    val want = Similarity.bruteForceTopK(t.read(), "emb", q, 10, "cosine", "s")
      .select("k").as[Long].collect().toSeq
    assert(got == want, s"delta-aligned index must serve the merged state: $got vs $want")
    val idxKeys = GraftTable.load(spark, IndexLifecycle.vectorIndexLoc(loc, "emb"))
      .read().select("k").as[Long].collect().toSet
    assert(idxKeys.forall(_ % 7 != 0), "DV-deleted keys must be gone from the index files")
    assert(idxKeys == t.read().select("k").as[Long].collect().toSet)

    val fmsg = Procedures.call(spark, t, "create_global_index",
      Map("index_column" -> "txt", "index_type" -> "full-text"))
      .head().getString(0)
    assert(fmsg.contains("registered"), fmsg)
    assert(Procedures.call(spark, t, "refresh_global_index",
      Map("index_type" -> "full-text")).head().getString(0)
      .contains("no refresh"))
  }
}
