package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.collection.concurrent.TrieMap

/**
 * Engine-table fixtures for the correctness/bench queries: each builder
 * writes a graft table from the driver-generated parquet inputs with a
 * DETERMINISTIC transformation, so every result is expressible as DuckDB
 * SQL over the raw tables (the driver's oracle).
 *
 * Built once per (sfDir, name) per JVM; table dirs live under /tmp.
 */
object Fixtures {

  private val built = TrieMap[(String, String), GraftTable]()

  private val queryVecs = TrieMap[(String, Long), Seq[Float]]()

  /** Memoized ANN query vector (one embeddings-row point read per (sfDir,
    * id) per JVM): the benched search queries must not pay a Spark action
    * fetching their query vector inside the timed lambda — fetch-once here,
    * reuse everywhere (same prepare/measure separation as the fixture
    * builds). */
  def queryVec(spark: SparkSession, sfDir: String, vecId: Long): Seq[Float] =
    queryVecs.getOrElseUpdate((sfDir, vecId),
      src(spark, sfDir, "embeddings").filter(col("vec_id") === vecId)
        .select("embedding").first().getSeq[Float](0))

  // v2: bucket routing changed to trimmed-pk keys (paimon alignment) —
  // the versioned root invalidates fixtures persisted under the old layout
  // v3: bucket.key-layout stamping landed — v2 fixtures carry trimmed-
  // routed files under UNSTAMPED schemas, which the layout-versioned
  // routingKeys now (correctly) reads as full-pk; they must rebuild
  // v4: PK-search TVF routing sidecars landed (pk-search-ref / pk-fulltext
  // back-references written at fixture build) — v3 embed_pk/docs_pk
  // fixtures lack them, so the TVF rows would silently take the wrong route
  // v5: the sorted-write guarantee (writeFiles (pt, bucket, pks) local
  // sort) — v4 fixtures may hold preMerged files in scrambled order, which
  // the k-way MOR merge now refuses loudly
  private def fixRoot(sfDir: String): String =
    s"/tmp/graft-fixtures/v5/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  /** One sfDir per session for catalog fixtures: Spark caches the
    * instantiated `graft_fix` catalog, so a later warehouse-conf change is
    * IGNORED — a second sfDir would silently read the first one's data.
    * Fail loudly instead (harness sessions always use a single sfDir). */
  private val catalogSfDir = new java.util.concurrent.atomic.AtomicReference[String]()

  /** Catalog-SQL fixture builder shared by every `graft_fix` table:
    * registers the catalog (+ v2 bucketing for the bucket-keyed tables —
    * scans report KeyGroupedPartitioning only under it), then atomically
    * builds `graft_fix.db.<table>` via CREATE + INSERT from the named
    * source parquet. `ddlBody` is the column list + suffix clauses. */
  private def ensureFixCatalog(spark: SparkSession, sfDir: String): String = {
    val prev = catalogSfDir.getAndUpdate(v => if (v == null) sfDir else v)
    require(prev == null || prev == sfDir,
      s"graft_fix catalog already bound to $prev; cannot serve $sfDir")
    val wh = s"${fixRoot(sfDir)}/sql-warehouse"
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.catalog.graft_fix", "graft.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_fix.warehouse", wh)
    wh
  }

  private def catalogFixture(spark: SparkSession, sfDir: String, table: String,
                             ddlBody: String, srcName: String): String = {
    val wh = ensureFixCatalog(spark, sfDir)
    built.getOrElseUpdate((sfDir, s"__cat_$table"), {
      val loc = s"$wh/db.db/$table"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fix.db")
      spark.sql(s"CREATE TABLE graft_fix.db.$table $ddlBody")
      src(spark, sfDir, srcName).createOrReplaceTempView(s"${table}_src_v")
      spark.sql(s"INSERT INTO graft_fix.db.$table SELECT * FROM ${table}_src_v")
      GraftTable.load(spark, loc)
    })
    s"graft_fix.db.$table"
  }

  /** Catalog-SQL blob tables (reference multimodal-table/blob.mdx): a
    * `__BLOB_FIELD` table storing documents' text payloads OUT OF LINE
    * (descriptors inline, bytes in shared .bin files), plus a
    * `__BLOB_VIEW_FIELD` table whose refs — built with the
    * `graft_blob_view` SQL function over the upstream row-tracking ids —
    * resolve to the same payloads at read without copying a byte. Returns
    * the qualified name prefix (`graft_fix.db`). */
  def sqlBlobTables(spark: SparkSession, sfDir: String): String = {
    ensureFixCatalog(spark, sfDir)
    built.getOrElseUpdate((sfDir, "__cat_docs_blob"), {
      val wh = s"${fixRoot(sfDir)}/sql-warehouse"
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Seq("docs_blob", "docs_blob_view", "docs_blob_arr").foreach { t =>
        val p = new org.apache.hadoop.fs.Path(s"$wh/db.db/$t")
        if (fs.exists(p)) fs.delete(p, true)
      }
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fix.db")
      spark.sql("""CREATE TABLE graft_fix.db.docs_blob (
          doc_id BIGINT,
          blob BINARY COMMENT '__BLOB_FIELD; document payload')
          TBLPROPERTIES ('row-tracking.enabled'='true')""")
      src(spark, sfDir, "documents").filter(col("doc_id") < 200)
        .createOrReplaceTempView("docs_blob_src_v")
      spark.sql("""INSERT INTO graft_fix.db.docs_blob
          SELECT doc_id, encode(text, 'UTF-8') FROM docs_blob_src_v""")
      spark.sql("""CREATE TABLE graft_fix.db.docs_blob_view (
          doc_id BIGINT,
          ref BINARY COMMENT '__BLOB_VIEW_FIELD')""")
      spark.sql("""INSERT INTO graft_fix.db.docs_blob_view
          SELECT doc_id, graft_blob_view('db.docs_blob', 'blob', row_id)
          FROM graft_fix.db.`docs_blob$row_tracking`""")
      // collection storage: ARRAY<BLOB> of fixed-width text chunks
      spark.sql("""CREATE TABLE graft_fix.db.docs_blob_arr (
          doc_id BIGINT,
          chunks ARRAY<BINARY> COMMENT '__BLOB_FIELD; 64-byte chunks')""")
      spark.sql("""INSERT INTO graft_fix.db.docs_blob_arr
          SELECT doc_id,
                 transform(sequence(0, greatest(CAST(ceil(octet_length(encode(text, 'UTF-8')) / 64.0) AS INT), 1) - 1),
                           i -> substring(encode(text, 'UTF-8'), i * 64 + 1, 64))
          FROM docs_blob_src_v""")
      GraftTable.load(spark, s"$wh/db.db/docs_blob")
    })
    "graft_fix.db"
  }

  def src(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
      // across testdata generations: with the legacy flag a NANOS column
      // reads as LONG (convert: integer-divide to µs — `/` on longs is
      // DOUBLE division, and at 1.7e18 ns the double ulp is ~256 ns, so
      // truncation then lands on the wrong µs); a MICROS column reads as a
      // timestamp already and passes through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // value-preserving under the fixed UTC session zone; keeps every
          // downstream consumer (unix_millis, record-level expire, stats)
          // on the one timestamp type they were built against
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  private def fixture(spark: SparkSession, sfDir: String, name: String)
                     (build: String => GraftTable): GraftTable =
    built.getOrElseUpdate((sfDir, name), build(s"${fixRoot(sfDir)}/$name"))

  /** Bench-scale blob pair: EVERY document's text payload stored out of
    * line in rolled .bin packs (row-tracking on), plus a blob-view table
    * whose refs point at it. The headline blob query reads the VIEW —
    * a rowId join into the upstream followed by positioned payload reads
    * through the bounded per-JVM stream cache — so the bench times the
    * whole blob read path, not just descriptor parsing. */
  def docsBlobBench(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_blob_bench_view") { loc =>
      import graft.core.RowOps._
      val upLoc = s"${fixRoot(sfDir)}/docs_blob_bench_up"
      val docs = src(spark, sfDir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val up = GraftTable.createOrReplace(spark, upLoc, docs.schema,
        TableConfig(options = Map("blob-field" -> "payload",
          "row-tracking.enabled" -> "true")))
      up.write(docs)
      val refFn = udf { (rowId: Long) =>
        graft.pipeline.Blob.serializeViewRef(graft.pipeline.Blob.BlobViewRef(
          "bench.docs_blob_bench_up", upLoc, "payload", rowId))
      }
      val viewDf = up.systemTable("row_tracking")
        .select(col("doc_id"), refFn(col("row_id")).as("ref"))
      val vt = GraftTable.createOrReplace(spark, loc, viewDf.schema,
        TableConfig(options = Map("blob-view-field" -> "ref")))
      vt.write(viewDf)
      vt
    }

  /** Append orders table with per-file secondary indexes (bloom on
    * o_custkey, bitmap on o_orderpriority, bsi on o_orderkey), written as 4
    * interleaved slices so every file's min/max envelope overlaps — only
    * the file indexes can skip. */
  def ordersFidx(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_fidx") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(options = Map(
          "file-index.bloom-filter.columns" -> "o_custkey",
          "file-index.bitmap.columns" -> "o_orderpriority",
          "file-index.bsi.columns" -> "o_orderkey")))
      (0 until 4).foreach { i =>
        t.write(orders.filter(col("o_orderkey") % 4 === i))
      }
      t
    }

  /** Bucketed append table (`bucket-key` = o_custkey, 8 buckets): equality
    * and IN filters on the key prune to their buckets' files at plan time
    * (paimon append-table/bucketed.mdx data skipping). */
  def ordersBapp(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_bapp") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(numBuckets = 8, options = Map("bucket-key" -> "o_custkey")))
      t.write(orders)
      t
    }

  /** Table created ENTIRELY through the DataFrame writer API (reference
    * docs/spark/dataframe.md): create-on-write with `primary-key` option +
    * `partitionBy`, then a dynamic-partition overwrite of the 1-URGENT
    * partition (totalprice + 1000 — exact at 2 decimals, so the oracle sum
    * can't land on a half-cent rounding boundary the way `* 0.5` did) via
    * `.mode("overwrite")`. Exercises the CreatableRelationProvider create
    * path AND the DSv2 dynamic-overwrite path with zero SQL. */
  def ordersDfw(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_dfw") { loc =>
      // the writer-API create is ErrorIfExists by design — clear any stale
      // build from a previous JVM (other fixtures get this via createOrReplace)
      val p = new org.apache.hadoop.fs.Path(loc)
      val pfs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (pfs.exists(p)) pfs.delete(p, true)
      val orders = src(spark, sfDir, "orders")
      orders.write.format("graft")
        .option("primary-key", "o_orderkey,o_orderpriority")
        .option("bucket", "4")
        .partitionBy("o_orderpriority")
        .save(loc)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try {
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .withColumn("o_totalprice", col("o_totalprice") + 1000)
          .write.format("graft").mode("overwrite").save(loc)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      GraftTable.load(spark, loc)
    }

  /** PK dedup table over orders; snapshots: 1 = orders, 2 = +10%-key updates
    * (price*2, priority X-UPD), 3 = COMPACT. Tag v1 → snapshot 1. */
  def ordersPk(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_pk") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.sm.createTag("v1", 1)
      t.compact()
      t
    }

  /** PK table with pk-clustering-override: files sorted by o_orderstatus
    * (not the PK), uniqueness via DV-mode MOR, compacted so the clustered
    * layout + full value pruning are in force. */
  def ordersClustered(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_clust") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 2,
          options = Map("pk-clustering-override" -> "true",
            "clustering.columns" -> "o_orderstatus",
            "deletion-vectors.enabled" -> "true",
            "write.max-records-per-file" -> "2000")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.compact()
      t
    }

  /** Events PK table with record-level expire: every 3rd event's ts is
    * shifted 50 years into the past, so compaction (retention 10y) drops
    * exactly those rows — deterministic for decades of wall-clock. */
  def eventsExpire(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_rlexp") { loc =>
      val ev = src(spark, sfDir, "events")
        .withColumn("ts", when(col("event_id") % 3 === 0,
          col("ts") - expr("INTERVAL 18250 DAYS")).otherwise(col("ts")))
      val t = GraftTable.createOrReplace(spark, loc, ev.schema,
        TableConfig(primaryKeys = Seq("event_id"), numBuckets = 2,
          options = Map("record-level.expire-time" -> "3650d",
            "record-level.time-field" -> "ts")))
      t.write(ev)
      t.compact()
      t
    }

  /** Partitioned PK table where only ONE partition was compacted (the
    * partial-compaction procedure); reads must merge the untouched
    * partition and serve the compacted one raw. */
  def ordersPartialCompact(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_pcompact") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"),
          partitionKeys = Seq("o_orderstatus"), numBuckets = 2))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      import graft.core.RowOps._
      val r = Procedures.call(spark, t, "compact",
        Map("where" -> "o_orderstatus = 'F'")).head().getString(0)
      require(r.contains("partially compacted"), r)
      t
    }

  /** ordersPk variant with changelog-producer=lookup: each write commits
    * exact +I/-U/+U changelog files alongside the data. */
  def ordersPkCl(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_cl") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          options = Map("changelog-producer" -> "lookup")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t
    }

  /** Row tracking: events in two commits (even/odd event_id), then a sort
    * compaction rewrite — ids and their originating commit must survive. */
  def eventsRt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_rt") { loc =>
      import graft.core.RowOps._
      val e = src(spark, sfDir, "events")
      val t = GraftTable.createOrReplace(spark, loc, e.schema,
        TableConfig(options = Map("row-tracking.enabled" -> "true")))
      t.write(e.filter(col("event_id") % 2 === 0))
      t.write(e.filter(col("event_id") % 2 === 1))
      t.compactSorted("order", Seq("ts"))
      t
    }

  /** Fallback-branch fixture (paimon scan.fallback-branch): orders
    * partitioned by status; branch `hist` holds everything, main keeps only
    * partition O with doubled prices — reads serve O from main, F/P from
    * the branch. */
  def ordersFb(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_fb") { loc =>
      import graft.core.RowOps._
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(partitionKeys = Seq("o_orderstatus"),
          options = Map("scan.fallback-branch" -> "hist")))
      t.write(orders)
      t.createBranch("hist", Some(1L))
      t.delete(col("o_orderstatus") =!= "O") // metadata-only partition drop
      t.update(Map("o_totalprice" -> (col("o_totalprice") * 2)),
        col("o_orderstatus") === "O")
      t
    }

  /** Data-evolution fixture: row-tracking documents, two UPDATE patch
    * generations (the second's predicate reads the first's patched values);
    * base files never rewritten. */
  def docsDe(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_de") { loc =>
      import graft.core.RowOps._
      val d = src(spark, sfDir, "documents")
      val t = GraftTable.createOrReplace(spark, loc, d.schema,
        TableConfig(options = Map("row-tracking.enabled" -> "true")))
      t.write(d.filter(col("doc_id") % 2 === 0))
      t.write(d.filter(col("doc_id") % 2 === 1))
      t.update(Map("n_chars" -> length(col("text")).cast("long")),
        col("lang") === "en")
      t.update(Map("source" -> lit("curated")),
        col("lang") === "en" && col("n_chars") > 400L)
      t
    }

  /** CHAIN TABLE fixture (paimon chain-table.mdx): snapshot branch holds the
    * 'd1' full dump; the delta branch holds only 'd2' changes (every 3rd key
    * repriced). readChain('d2') = anchor d1 ⊕ delta d2 — no full rewrite. */
  def chainOrders(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "chain_orders") { loc =>
      import graft.core.RowOps._
      val o = src(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          lit(1L).as("seq"), lit("d1").as("day"))
      val t = GraftTable.createOrReplace(spark, loc, o.schema,
        TableConfig(primaryKeys = Seq("day", "o_orderkey"),
          partitionKeys = Seq("day"), numBuckets = 2,
          sequenceField = Some("seq"),
          options = Map("chain-table.enabled" -> "true")))
      t.write(o.limit(0)) // snapshot 1: empty anchor for the branches
      t.createBranch("snapshot")
      t.createBranch("delta")
      t.onBranch("snapshot").write(o)
      t.onBranch("delta").write(o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("day", lit("d2"))
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
        .withColumn("seq", lit(2L)))
      t
    }

  /** docs_de shape + MERGE INTO through the data-evolution commit: matched
    * deletes (doc_id%9=0), matched update patches (other doc_id%3=0 rows),
    * and inserts (shifted ids) — one statement, patches + rewrite + append. */
  def docsDeM(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_de_merge") { loc =>
      import graft.core.RowOps._
      val d = src(spark, sfDir, "documents")
      val t = GraftTable.createOrReplace(spark, loc, d.schema,
        TableConfig(options = Map("row-tracking.enabled" -> "true")))
      t.write(d.filter(col("doc_id") % 2 === 0))
      t.write(d.filter(col("doc_id") % 2 === 1))
      val srcDf = d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("sid"), (col("n_chars") + 1000L).as("nc"))
        .unionAll(d.filter(col("doc_id") % 1000 === 0)
          .select((col("doc_id") + 10000000L).as("sid"),
            (col("n_chars") + 1000L).as("nc")))
      t.mergeInto(srcDf, col("t.doc_id") === col("s.sid"))
        .whenMatchedDelete(Some(col("s.sid") % 9 === 0))
        .whenMatchedUpdate(set = Map("n_chars" -> col("s.nc")))
        .whenNotMatchedInsert(values = Map(
          "doc_id" -> col("s.sid"), "text" -> lit("x"), "lang" -> lit("xx"),
          "source" -> lit("merged"), "n_chars" -> col("s.nc")))
        .execute()
      t
    }

  /** POSTPONE bucket mode, LEGACY flow (`postpone.batch-write-fixed-bucket
    * = false`): orders written shuffle-free into staging, compacted into 4
    * real buckets, then an UPDATE batch staged but NOT compacted — reads
    * must serve the compacted state only. (The reference's DEFAULT flow —
    * fixed-bucket, immediately visible — is [[ordersPpFixed]].) */
  def ordersPp(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_pp") { loc =>
      import graft.core.RowOps._
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = -2,
          options = Map("postpone.batch-write-fixed-bucket" -> "false")))
      t.write(orders)
      t.compact()
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)) // staged, invisible
      t
    }

  /** POSTPONE bucket mode, DEFAULT (fixed-bucket) flow: every batch stages
    * to uncommitted -2 files, infers per-partition bucket counts from the
    * staged metadata (`postpone.target-row-num-per-bucket` here, so sf0.01
    * infers a real multi-bucket layout), routes to real buckets and commits
    * — an INSERT followed by an immediate SELECT serves the merged state
    * with NO compact call (reference data-distribution.md:73-105). */
  def ordersPpFixed(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_pp_fixed") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = -2,
          options = Map("postpone.target-row-num-per-bucket" -> "1000")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)) // visible at once
      t
    }

  /** Postpone merge-on-read (`postpone.merge-on-read=true`, reference
    * POSTPONE_MERGE_ON_READ / PostponeMergeOnReadExec): a LEGACY-staged
    * batch left in bucket -2 stays readable, merged with the real buckets —
    * including against a later fixed-bucket batch that overlaps its keys
    * (later sequence wins). */
  def ordersPpMor(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_pp_mor") { loc =>
      import graft.core.RowOps._
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = -2,
          options = Map("postpone.batch-write-fixed-bucket" -> "false",
            "postpone.merge-on-read" -> "true")))
      t.write(orders)
      t.compact() // real buckets
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)) // legacy staged
      // flip to the default fixed-bucket flow for the third batch
      t.setOption("postpone.batch-write-fixed-bucket", "true")
      val t2 = GraftTable.load(spark, loc)
      t2.write(orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)) // fixed, visible
      t2
    }

  /** Persisted minhash signature index over the q_dedup_minhash corpus
    * (documents + planted near-dups): built once, then a no-change refresh
    * must compute ZERO signatures — the O(delta) maintenance gate. Repeat
    * near-dup runs read signatures here instead of rescanning text. */
  def minhashIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "minhash_idx") { loc =>
      val docs = src(spark, sfDir, "documents").select("doc_id", "text")
      val d2 = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text")))
      val idx = graft.pipeline.Dedup.createMinhashIndex(spark, loc, "doc_id",
        shingleN = 3, sigLen = 8)
      val first = graft.pipeline.Dedup.refreshMinhashIndex(idx, d2, "doc_id", "text")
      require(first > 0, "initial refresh must compute signatures")
      val second = graft.pipeline.Dedup.refreshMinhashIndex(idx, d2, "doc_id", "text")
      require(second == 0L,
        s"O(delta) gate: no-change refresh computed $second signatures")
      idx
    }

  /** MAP metadata column with declared shredded hot keys
    * (`fields.attrs.shred-keys`): literal-key access reads only the typed
    * side columns (GraftMapShredRule), never the map bytes. */
  def ordersMap(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_map") { loc =>
      val orders = src(spark, sfDir, "orders")
      val df = orders.select(col("o_orderkey"), col("o_totalprice"),
        map(lit("status"), col("o_orderstatus"),
          lit("prio"), col("o_orderpriority"),
          lit("cust"), col("o_custkey").cast("string")).as("attrs"))
      val t = GraftTable.createOrReplace(spark, loc, df.schema,
        TableConfig(options = Map("fields.attrs.shred-keys" -> "status,prio")))
      t.write(df)
      t
    }

  /** Watermarked commits: snapshot 1 (orders) @ watermark 1000, snapshot 2
    * (%10 updates) @ watermark 2000 — `VERSION AS OF watermark` resolution. */
  def ordersWm(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_wm") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders, watermark = Some(1000L))
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2), watermark = Some(2000L))
      t
    }

  /** Column default value: schema carries `channel` with default 'web';
    * the input never provides it — the write materializes the default. */
  def ordersDefault(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_default") { loc =>
      val orders = src(spark, sfDir, "orders")
      val schema = org.apache.spark.sql.types.StructType(orders.schema.fields :+
        org.apache.spark.sql.types.StructField("channel",
          org.apache.spark.sql.types.StringType))
      val t = GraftTable.createOrReplace(spark, loc, schema,
        TableConfig(options = Map("fields.channel.default-value" -> "web")))
      t.write(orders)
      t
    }

  /** Incremental clustering: half of lineitem sort-compacted by l_shipdate,
    * the other half appended then clustered INCREMENTALLY (only level-0
    * files sorted; prior clustered output untouched). */
  def lineitemIc(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lineitem_ic") { loc =>
      import graft.core.RowOps._
      val li = src(spark, sfDir, "lineitem")
      val t = GraftTable.createOrReplace(spark, loc, li.schema, TableConfig())
      t.write(li.filter(col("l_orderkey") % 2 === 0))
      t.compactSorted("order", Seq("l_shipdate"))
      t.write(li.filter(col("l_orderkey") % 2 === 1))
      require(t.clusterIncremental("order", Seq("l_shipdate")).isDefined)
      t
    }

  /** COPY INTO from a CSV export of region (format conversion path). */
  /** ordersPk twin with `file.format=orc`: ORC data files through the same
    * LSM write/MOR/compaction paths (manifests stay parquet). Same write
    * pattern as ordersPk so the dedup oracle applies verbatim. */
  def ordersOrcFmt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_orcfmt") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          options = Map("file.format" -> "orc")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.compact()
      t
    }

  /** ordersPk twin with `file.format=avro` (row-oriented streaming-ingest
    * format) through the same LSM write/MOR/compaction paths. */
  def ordersAvroFmt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_avrofmt") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          options = Map("file.format" -> "avro")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.compact()
      t
    }

  /** ordersPk twin with `file.format=row` (binary UnsafeRow container —
    * cheapest row-oriented ingest path). */
  def ordersRowFmt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_rowfmt") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          options = Map("file.format" -> "row")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.compact()
      t
    }

  /** Single-column text table: one document per line (newlines flattened —
    * the line-based format's contract). */
  def docsTextFmt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_textfmt") { loc =>
      val docs = src(spark, sfDir, "documents")
        .select(regexp_replace(col("text"), "[\\r\\n]+", " ").as("line"))
      val t = GraftTable.createOrReplace(spark, loc, docs.schema,
        TableConfig(options = Map("file.format" -> "text")))
      t.write(docs)
      t
    }

  /** Append nation table with `file.format=csv` (flat atomic schema). */
  def nationCsvFmt(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "nation_csvfmt") { loc =>
      val n = src(spark, sfDir, "nation")
      val t = GraftTable.createOrReplace(spark, loc, n.schema,
        TableConfig(options = Map("file.format" -> "csv")))
      t.write(n)
      t
    }

  /** Orders as a CATALOG table bucket-keyed by o_custkey: the DSv2 scan
    * reports KeyGroupedPartitioning through the catalog's bucket function,
    * so per-customer windows/aggregations satisfy their clustering FROM
    * STORAGE — zero exchange (the catalog route is required — a path read
    * cannot resolve the bucket transform against a FunctionCatalog). */
  def ordersBucketedSql(spark: SparkSession, sfDir: String): String =
    catalogFixture(spark, sfDir, "orders_bucketed",
      """(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
        TBLPROPERTIES ('bucket-key'='o_custkey', 'bucket'='8')""", "orders")

  /** Events as a CATALOG table bucket-keyed by user_id — per-user windows
    * (sessionization, funnels) and the per-(user, session) rollup above
    * them all satisfy their clustering from storage: zero exchange.
    * ts is TIMESTAMP (LTZ) to match the parquet source's inferred type
    * (session timezone is UTC everywhere, so values are identical). */
  def eventsBucketedSql(spark: SparkSession, sfDir: String): String =
    catalogFixture(spark, sfDir, "events_bucketed",
      """(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        event_type STRING, value DOUBLE, props STRING)
        TBLPROPERTIES ('bucket-key'='user_id', 'bucket'='8')""", "events")

  def regionCopy(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "region_copy") { loc =>
      val r = src(spark, sfDir, "region")
      val csvDir = s"${fixRoot(sfDir)}/region_csv"
      r.write.mode("overwrite").option("header", "true").csv(csvDir)
      val t = GraftTable.createOrReplace(spark, loc, r.schema, TableConfig())
      CopyInto.copyIn(spark, t, csvDir, "csv", Map("header" -> "true"))
      t
    }

  /** changelog-producer=full-compaction: writes produce NO changelog;
    * the COMPACT snapshot carries the exact -U/+U/+I/-D diff since the
    * previous produced point. Snapshots: 1 = orders, 2 = %10 updates,
    * 3 = COMPACT (changelog base 0). */
  def ordersPkFc(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_fc") { loc =>
      import graft.core.RowOps._
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          options = Map("changelog-producer" -> "full-compaction")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.compact()
      t
    }

  /** Dynamic-bucket (bucket = -1) PK table: key→bucket assignments persist
    * in index/bucket-index, buckets grow with data volume. */
  def ordersDyn(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_dyn") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = -1,
          options = Map("dynamic-bucket.target-row-count" -> "500")))
      t.write(orders)
      t.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t
    }

  /** Partial-update engine over customer: v1 = all fields but mktsegment,
    * v2 (custkey%3==0) = +100 acctbal and mktsegment, name null. */
  def custPu(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "cust_pu") { loc =>
      val c = src(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"),
          lit(1L).as("ver"))
      val t = GraftTable.createOrReplace(spark, loc, c.schema,
        TableConfig(primaryKeys = Seq("c_custkey"), numBuckets = 2,
          mergeEngine = "partial-update", sequenceField = Some("ver")))
      t.write(c.withColumn("c_mktsegment", lit(null).cast("string")))
      t.write(c.filter(col("c_custkey") % 3 === 0)
        .withColumn("c_name", lit(null).cast("string"))
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("ver", lit(2L)))
      t
    }

  /** Sequence-group partial update: c_acctbal governed by bal_seq,
    * c_mktsegment by seg_seq. Write 2 carries a STALE bal_seq (must not
    * clobber) but a newer seg_seq (must apply). */
  /** Aggregation-for-partial-update fixture (partial-update.md:152):
    * per-orderkey sums written in two batches — batch 2 has a LOWER group
    * seq, so the plain group field keeps batch 1's value while the summed
    * field still accumulates both batches. */
  def liPuAgg(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "li_pu_agg") { loc =>
      val base = src(spark, sfDir, "lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q1"), sum("l_extendedprice").as("q2"))
      val a = base.select(col("l_orderkey"), lit(2L).as("g"),
        col("q1").as("b"), col("q1").as("s"))
      val t = GraftTable.createOrReplace(spark, loc, a.schema,
        TableConfig(primaryKeys = Seq("l_orderkey"), numBuckets = 2,
          mergeEngine = "partial-update",
          fieldAggregates = Map("s" -> "sum"),
          options = Map("fields.g.sequence-group" -> "b,s")))
      t.write(a)
      t.write(base.select(col("l_orderkey"), lit(1L).as("g"),
        col("q2").as("b"), col("q2").as("s")))
      t
    }

  /** Multi-field sequence (sequence-rowkind.mdx:60): same first field, the
    * second ("flag") decides — batch 1 carries the higher flag. */
  def ordersSeq2(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_seq2") { loc =>
      val o = src(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").as("ut"),
          lit(2L).as("flag"), col("o_totalprice").as("price"))
      val t = GraftTable.createOrReplace(spark, loc, o.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 2,
          sequenceField = Some("ut,flag")))
      t.write(o)
      t.write(o.select(col("o_orderkey"), col("ut"), lit(1L).as("flag"),
        (col("price") + 1000.0).as("price")))
      t
    }

  /** Partial-update retraction fixture: -D records for even custkeys with a
    * winning group seq — the plain group field NULLs, the summed field
    * subtracts to zero, the key itself survives. */
  def custPuRetract(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "cust_pu_retract") { loc =>
      val c = src(spark, sfDir, "customer").select(col("c_custkey"),
        lit(1L).as("g"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"), lit("+I").as("rk"))
      val t = GraftTable.createOrReplace(spark, loc, c.schema,
        TableConfig(primaryKeys = Seq("c_custkey"), numBuckets = 2,
          mergeEngine = "partial-update",
          fieldAggregates = Map("bal" -> "sum"),
          options = Map("fields.g.sequence-group" -> "seg,bal",
            "rowkind.field" -> "rk")))
      t.write(c)
      t.write(c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), lit(2L).as("g"), col("seg"), col("bal"),
          lit("-D").as("rk")))
      t
    }

  /** Aggregation-engine retraction for collect / last_value /
    * last_non_null_value: -D records for orderkeys divisible by 3 remove
    * the collected element and null the last-value fields. */
  def ordersAggRetract2(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_agg_retract2") { loc =>
      val o = src(spark, sfDir, "orders").select(col("o_orderkey"),
        col("o_orderstatus").as("lv"), col("o_orderstatus").as("ln"),
        array(col("o_orderpriority")).as("co"), lit("+I").as("rk"))
      val t = GraftTable.createOrReplace(spark, loc, o.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 2,
          mergeEngine = "aggregation",
          fieldAggregates = Map("lv" -> "last_value",
            "ln" -> "last_non_null_value", "co" -> "collect"),
          options = Map("rowkind.field" -> "rk")))
      t.write(o)
      t.write(o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("rk", lit("-D")))
      t
    }

  def custSg(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "cust_sg") { loc =>
      val c = src(spark, sfDir, "customer")
        .select(col("c_custkey"), lit(2L).as("bal_seq"), col("c_acctbal"),
          lit(1L).as("seg_seq"), lit(null).cast("string").as("c_mktsegment"))
      val t = GraftTable.createOrReplace(spark, loc, c.schema,
        TableConfig(primaryKeys = Seq("c_custkey"), numBuckets = 2,
          mergeEngine = "partial-update",
          options = Map(
            "fields.bal_seq.sequence-group" -> "c_acctbal",
            "fields.seg_seq.sequence-group" -> "c_mktsegment")))
      t.write(c)
      val upd = src(spark, sfDir, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), lit(1L).as("bal_seq"),
          (col("c_acctbal") + 1000.0).as("c_acctbal"),
          lit(2L).as("seg_seq"), col("c_mktsegment"))
      t.write(upd)
      t
    }

  /** Aggregation engine over lineitem: per orderkey sum/max/count/listagg. */
  def aggTbl(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "agg_tbl") { loc =>
      val li = src(spark, sfDir, "lineitem").select(
        col("l_orderkey"),
        col("l_quantity").as("qty_sum"),
        col("l_extendedprice").as("price_max"),
        col("l_partkey").as("item_cnt"),
        col("l_returnflag").as("flags"))
      val t = GraftTable.createOrReplace(spark, loc, li.schema,
        TableConfig(primaryKeys = Seq("l_orderkey"), numBuckets = 4,
          mergeEngine = "aggregation",
          fieldAggregates = Map("qty_sum" -> "sum", "price_max" -> "max",
            "item_cnt" -> "count", "flags" -> "listagg")))
      t.write(li)
      t
    }

  /** Aggregation engine with RETRACTION: base write of all lineitem rows,
    * then a second batch re-sends rows with l_linenumber > 3 as "-D"
    * (rowkind.field) — sum/count subtract them (paimon FieldSumAgg.retract),
    * max ignores retraction. */
  def aggRetract(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "agg_retract") { loc =>
      val li = src(spark, sfDir, "lineitem").select(
        col("l_orderkey"),
        col("l_quantity").as("qty_sum"),
        col("l_extendedprice").as("price_max"),
        col("l_partkey").as("item_cnt"),
        lit("+I").as("rk"),
        col("l_linenumber"))
      val t = GraftTable.createOrReplace(spark, loc, li.drop("l_linenumber").schema,
        TableConfig(primaryKeys = Seq("l_orderkey"), numBuckets = 4,
          mergeEngine = "aggregation",
          fieldAggregates = Map("qty_sum" -> "sum", "price_max" -> "max",
            "item_cnt" -> "count"),
          options = Map("rowkind.field" -> "rk")))
      t.write(li.drop("l_linenumber"))
      t.write(li.filter(col("l_linenumber") > 3)
        .withColumn("rk", lit("-D")).drop("l_linenumber"))
      t
    }

  /** First-row engine over orders: second write must lose. */
  def ordersFr(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_fr") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4,
          mergeEngine = "first-row"))
      t.write(orders)
      t.write(orders.withColumn("o_totalprice", col("o_totalprice") * 3))
      t
    }

  /** Append table over events, partitioned by event_type. */
  /** KEY_DYNAMIC cross-partition update: customer keyed by c_custkey,
    * PARTITIONED by c_mktsegment, dynamic buckets. Second write MOVES
    * %7==0 keys into segment 'MOVED' (+1000 acctbal) — the engine must
    * tombstone the old partition's row. */
  def custXp(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "cust_xp") { loc =>
      val c = src(spark, sfDir, "customer")
      val t = GraftTable.createOrReplace(spark, loc, c.schema,
        TableConfig(primaryKeys = Seq("c_custkey"),
          partitionKeys = Seq("c_mktsegment"), numBuckets = -1,
          options = Map("dynamic-bucket.target-row-count" -> "500")))
      t.write(c)
      t.write(c.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_mktsegment", lit("MOVED"))
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0))
      t
    }

  /** Append lineitem (8 unsorted files) + global equality index on the
    * high-cardinality l_orderkey: a point lookup plans only the few files
    * holding that key. */
  def lineitemGi(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lineitem_gi") { loc =>
      val li = src(spark, sfDir, "lineitem")
      val t = GraftTable.createOrReplace(spark, loc, li.schema, TableConfig())
      t.write(li.repartition(8))
      graft.pipeline.GlobalIndex.build(spark, loc, "l_orderkey")
      t
    }

  /** Append orders (8 unsorted files) + global sorted index on
    * o_totalprice: TopN reads only files past the value boundary. */
  def ordersGi(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_gi") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema, TableConfig())
      t.write(orders.repartition(8))
      graft.pipeline.GlobalIndex.build(spark, loc, "o_totalprice")
      t
    }

  def eventsAp(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_ap") { loc =>
      val e = src(spark, sfDir, "events")
      val t = GraftTable.createOrReplace(spark, loc, e.schema,
        TableConfig(partitionKeys = Seq("event_type")))
      t.write(e)
      t
    }

  /** Incremental-dedup fixture: a fingerprint STATE table seeded from
    * batch 1 (doc_id %3 = 0), then batch 2 (doc_id %2 = 0, plus +1e6-id
    * copies of the %5 = 0 docs) deduped against it. The ADMITTED rows are
    * materialized once (the dedup mutates state — not re-runnable). */
  def incrDedup(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "incr_dedup") { loc =>
      import org.apache.spark.sql.functions._
      val docs = src(spark, sfDir, "documents")
      val state = GraftTable.createOrReplace(spark, s"$loc-state",
        new org.apache.spark.sql.types.StructType()
          .add("fp", "string").add("first_id", "long"),
        TableConfig(primaryKeys = Seq("fp"), numBuckets = 4))
      graft.pipeline.Dedup.incrementalDedup(state,
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
      val batch2 = docs.filter(col("doc_id") % 2 === 0)
        .unionAll(docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val admitted = graft.pipeline.Dedup.incrementalDedup(
        state, batch2, "doc_id", "text")
      val out = GraftTable.createOrReplace(spark, loc,
        admitted.select("doc_id", "lang").schema, TableConfig())
      out.write(admitted.select("doc_id", "lang"))
      out
    }

  /** write.merge-schema evolution fixture: nation written plain, then a
    * second batch arrives with an extra column (evolves in; first batch
    * reads it null) and an INT population column that widening retypes to
    * BIGINT on the third batch. */
  def nationMergeSchema(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "nation_ms") { loc =>
      import org.apache.spark.sql.functions._
      val n = src(spark, sfDir, "nation")
      val b1 = n.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("pop"))
      val t = GraftTable.createOrReplace(spark, loc, b1.schema,
        TableConfig(primaryKeys = Seq("n_nationkey"), numBuckets = 1,
          options = Map("write.merge-schema" -> "true",
            "write.merge-schema.type-widening" -> "true")))
      t.write(b1)
      val b2 = n.filter(col("n_nationkey").between(10, 19))
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("pop"),
          upper(col("n_name")).as("tag"))
      t.write(b2)
      val b3 = n.filter(col("n_nationkey") >= 20)
        .select(col("n_nationkey"), col("n_name"),
          (col("n_regionkey") + 4000000000L).as("pop"),
          upper(col("n_name")).as("tag"))
      t.write(b3)
      t
    }

  /** events_ap + metadata-only DELETE of partition event_type='click'. */
  def eventsDel(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_del") { loc =>
      val e = src(spark, sfDir, "events")
      val t = GraftTable.createOrReplace(spark, loc, e.schema,
        TableConfig(partitionKeys = Seq("event_type")))
      t.write(e)
      t.delete(col("event_type") === "click")
      t
    }

  /** events + dynamic-partition overwrite of 'error' rows with value=0. */
  def eventsOw(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_ow") { loc =>
      val e = src(spark, sfDir, "events")
      val t = GraftTable.createOrReplace(spark, loc, e.schema,
        TableConfig(partitionKeys = Seq("event_type")))
      t.write(e)
      t.overwrite(e.filter(col("event_type") === "error").withColumn("value", lit(0.0)),
        dynamic = true)
      t
    }

  /** PK orders + COW DELETE of status 'F'. */
  def ordersDel(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_del") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      t.delete(col("o_orderstatus") === "F")
      t
    }

  /** PK orders + deletion-vector DELETE of status 'F' (no file rewrite). */
  def ordersDvDel(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_dv") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      t.deleteDv(col("o_orderstatus") === "F")
      t
    }

  /** PK orders + COW UPDATE price*0.9 for status 'O'. */
  def ordersUpd(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_upd") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      t.update(Map("o_totalprice" -> (col("o_totalprice") * 0.9)),
        col("o_orderstatus") === "O")
      t
    }

  /** PK orders + MERGE INTO: matched %5==0 → price+1000; source-only keys
    * (orderkey+10000000 for %7==3) inserted with status NEW. */
  def ordersMi(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_mi") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      val updates = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("sk"), (col("o_totalprice") + 1000.0).as("sprice"))
      val inserts = orders.filter(col("o_orderkey") % 7 === 3)
        .select((col("o_orderkey") + 10000000L).as("sk"), col("o_totalprice").as("sprice"))
      t.mergeInto(updates.unionAll(inserts), col("sk") === col("o_orderkey"))
        .whenMatchedUpdate(set = Map("o_totalprice" -> col("sprice")))
        .whenNotMatchedInsert(values = Map(
          "o_orderkey" -> col("sk"), "o_custkey" -> lit(0L),
          "o_orderstatus" -> lit("NEW"), "o_totalprice" -> col("sprice"),
          "o_orderdate" -> lit("2024-01-01").cast("timestamp_ntz"),
          "o_orderpriority" -> lit("5-LOW")))
        .execute()
      t
    }

  /** Append lineitem, z-order sort-compacted on (l_shipdate, l_extendedprice). */
  def lineitemZ(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lineitem_z") { loc =>
      val li = src(spark, sfDir, "lineitem")
      val t = GraftTable.createOrReplace(spark, loc, li.schema, TableConfig())
      t.write(li)
      t.compactSorted("zorder", Seq("l_shipdate", "l_extendedprice"))
      t
    }

  /** Schema evolution: add `note`, write under the new schema, RENAME
    * note → comment (field-id remap keeps old files' data readable), write
    * again under the renamed schema. */
  def ordersEvo(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_evo") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema, TableConfig())
      t.write(orders)
      t.addColumns(org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType))
      val t2 = GraftTable.load(spark, t.location)
      t2.write(orders.filter(col("o_orderkey") % 10 === 0).withColumn("note", lit("evolved")))
      t2.renameColumn("note", "comment")
      val t3 = GraftTable.load(spark, t.location)
      t3.write(orders.filter(col("o_orderkey") % 7 === 3).withColumn("comment", lit("renamed")))
      t3
    }

  /** Branch fixture: main = orders; branch dev applies the %10 updates;
    * then main fast-forwards to dev. */
  def ordersBranch(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_branch") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      t.write(orders)
      t.createBranch("dev")
      val dev = t.onBranch("dev")
      dev.write(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("o_orderpriority", lit("X-UPD")))
      t.fastForward("dev")
      t
    }

  /** Catalog-SQL fixture: orders loaded into a graft-catalog table via pure
    * SQL (CREATE TABLE + INSERT through the DSv2 write path). */
  def sqlCatalogOrders(spark: SparkSession, sfDir: String): String =
    catalogFixture(spark, sfDir, "orders_sql",
      """(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
        TBLPROPERTIES ('primary-key'='o_orderkey', 'bucket'='4')""", "orders")

  /** Catalog-SQL fixture: events in a PARTITIONED graft-catalog table —
    * the shape partition-grouped aggregate pushdown serves from manifests
    * alone. */
  def sqlCatalogEvents(spark: SparkSession, sfDir: String): String = {
    val cols = src(spark, sfDir, "events").schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    catalogFixture(spark, sfDir, "events_sql",
      s"($cols) PARTITIONED BY (event_type)", "events")
  }

  /** Catalog-SQL fixture: embeddings table whose vector column is declared
    * via the reference's `__VECTOR_FIELD;64` COMMENT directive (vector.mdx
    * "Create Table") — the directive alone registers the column in the
    * `vector-field` option and arms write-time dimension enforcement. */
  def sqlVectorDirective(spark: SparkSession, sfDir: String): String =
    catalogFixture(spark, sfDir, "emb_directive",
      """(vec_id BIGINT,
          embedding ARRAY<FLOAT> COMMENT '__VECTOR_FIELD;64; unit embedding',
          label INT)""", "embeddings")

  /** Plain PK embeddings table for the SQL LATERAL vector-search spelling —
    * unmutated, so the lateral result must equal q_ann_batch's batched-API
    * answer over the raw parquet. */
  def embLateral(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "emb_lateral") { loc =>
      val emb = src(spark, sfDir, "embeddings").select("vec_id", "label", "embedding")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema,
        TableConfig(primaryKeys = Seq("vec_id"), numBuckets = 4))
      t.write(emb)
      t
    }

  /** PK table over embeddings with a FILE-ALIGNED vector index: the index is
    * built at snapshot 1, then the table advances — an upsert reverses every
    * 10th vector and a DV delete drops every 7th — so searches must
    * reconcile both mutations from the changelog without an index rebuild. */
  def embedPk(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "embed_pk") { loc =>
      import graft.core.RowOps._
      val emb = src(spark, sfDir, "embeddings").select("vec_id", "label", "embedding")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema,
        TableConfig(primaryKeys = Seq("vec_id"), numBuckets = 4))
      t.write(emb)
      graft.pipeline.PkSearch.buildVectorIndex(t, "embedding",
        embedPkIdxLoc(sfDir), nClusters = 8)
      t.write(emb.filter(col("vec_id") % 10 === 0)
        .withColumn("embedding", reverse(col("embedding"))))
      t.deleteDv(col("vec_id") % 7 === 0)
      t
    }

  def embedPkIdxLoc(sfDir: String): String = s"${fixRoot(sfDir)}/embed_pk_vidx"

  /** PK table over documents, mutated after load: every 10th doc's text gets
    * a suffix token (changes doc_len → BM25 scores), every 7th doc is
    * DV-deleted — full-text search must reflect the merged current state. */
  /** Degraded-stats fixture (paimon metadata.stats-mode): table-wide `none`
    * (no min/max/nullCount in manifests) with a per-field `truncate(1)`
    * override on `lang` — its 2-char values clip to inexact 1-char BOUNDS,
    * so an equality filter must prune through truncated ranges and still
    * return exactly the right rows. */
  def docsStatsMode(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_statsmode") { loc =>
      val docs = src(spark, sfDir, "documents").select("doc_id", "lang", "source", "text")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema,
        TableConfig(partitionKeys = Seq("source"),
          options = Map("metadata.stats-mode" -> "none",
            "fields.lang.stats-mode" -> "truncate(1)")))
      t.write(docs)
      t
    }

  def docsPk(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "docs_pk") { loc =>
      import graft.core.RowOps._
      val docs = src(spark, sfDir, "documents").select("doc_id", "lang", "source", "text")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema,
        TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 4))
      t.write(docs)
      t.write(docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" graftsearch"))))
      t.deleteDv(col("doc_id") % 7 === 0)
      // register (idCol, textCol) so the graft_full_text_search TVF routes
      // this TABLE path through the merged-state PK search
      graft.pipeline.PkSearch.registerFullText(t, "doc_id", "text")
      t
    }

  /** Append-table documents copy whose BM25 index is managed through the
    * SQL procedure lifecycle: CALL create_global_index on 90% of the corpus,
    * append the rest, CALL refresh_global_index (delta-only postings +
    * df/corpus-stat merge) — one oracle row covers create AND refresh. */
  /** Catalog corpus table + `CALL sys.dedup_corpus` components output: the
    * dedup pipeline's SQL spelling — doubled documents (planted exact
    * duplicates) dedup to a PK components table (doc_id, canonical) written
    * by the procedure; returns that output table. */
  def dedupCorpusCall(spark: SparkSession, sfDir: String): GraftTable = {
    val wh = ensureFixCatalog(spark, sfDir)
    built.getOrElseUpdate((sfDir, "__cat_docs_dedup"), {
      val loc = s"$wh/db.db/docs_dedup"
      val fs = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Seq(loc, s"${loc}_cc").foreach { l =>
        val p = new org.apache.hadoop.fs.Path(l)
        if (fs.exists(p)) fs.delete(p, true)
      }
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fix.db")
      spark.sql("""CREATE TABLE graft_fix.db.docs_dedup (doc_id BIGINT, text STRING)
                   TBLPROPERTIES ('primary-key'='doc_id', 'bucket'='4')""")
      val docs = src(spark, sfDir, "documents").select("doc_id", "text")
      docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .createOrReplaceTempView("docs_dedup_src_v")
      spark.sql("INSERT INTO graft_fix.db.docs_dedup SELECT * FROM docs_dedup_src_v")
      spark.sql(
        s"""CALL sys.dedup_corpus(table => 'graft_fix.db.docs_dedup',
           |  id_col => 'doc_id', text_col => 'text', method => 'exact',
           |  output => '${loc}_cc')""".stripMargin).collect()
      GraftTable.load(spark, s"${loc}_cc")
    })
  }

  def lcDocs(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_docs") { loc =>
      val docs = src(spark, sfDir, "documents").select("doc_id", "text")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema, TableConfig())
      t.write(docs.filter(col("doc_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "text", "index_type" -> "full-text",
          "id_column" -> "doc_id")).collect()
      t.write(docs.filter(col("doc_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "full-text")).collect()
      t
    }

  /** [[lcDocs]] variant that STOPS after the append — NO refresh — with
    * `full-text-index.search-mode=full` (reference full-text.mdx:285):
    * searches must cover the unindexed 10% at query time by tokenizing the
    * delta and scoring under merged corpus statistics, so the TVF's answer
    * equals full-corpus BM25 even though the persisted index holds 90%. */
  def lcDocsModeFull(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_docs_mode_full") { loc =>
      val docs = src(spark, sfDir, "documents").select("doc_id", "text")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema,
        TableConfig(options = Map("full-text-index.search-mode" -> "full")))
      t.write(docs.filter(col("doc_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "text", "index_type" -> "full-text",
          "id_column" -> "doc_id")).collect()
      t.write(docs.filter(col("doc_id") % 10 === 0))
      t
    }

  /** Append-table embeddings copy with a CALL-managed IVF index: create on
    * 90%, append the rest, refresh (delta assigned to existing centroids). */
  def lcEmb(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_emb") { loc =>
      val emb = src(spark, sfDir, "embeddings")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema, TableConfig())
      t.write(emb.filter(col("vec_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf",
          "clusters" -> "8")).collect()
      t.write(emb.filter(col("vec_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf")).collect()
      t
    }

  /** [[lcEmb]] variant that STOPS after the append — NO refresh — with
    * `vector-index.search-mode=full` (reference global-index.mdx:314-359):
    * searches must cover the unindexed 10% with an exact raw-data
    * brute-force merged into the index candidates, so with nprobe=all the
    * TVF's answer equals full-corpus exact search. */
  def lcEmbModeFull(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_emb_mode_full") { loc =>
      val emb = src(spark, sfDir, "embeddings")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema, TableConfig(
        options = Map("vector-index.search-mode" -> "full")))
      t.write(emb.filter(col("vec_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf",
          "clusters" -> "8")).collect()
      t.write(emb.filter(col("vec_id") % 10 === 0))
      t
    }

  /** Append-table embeddings copy with a CALL-managed COMPRESSED (ivf-rq)
    * index — reference `index_type => 'ivf-rq'` with `<index-type>.*`
    * options (vector.mdx:58,190): create on 90%, append the rest, refresh
    * (delta assigned + residual-encoded against the stored model). */
  def lcEmbRq(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_emb_rq") { loc =>
      val emb = src(spark, sfDir, "embeddings")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema, TableConfig())
      t.write(emb.filter(col("vec_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf-rq",
          "ivf-rq.nlist" -> "8", "ivf-rq.rq.bits" -> "4",
          "ivf-rq.distance.metric" -> "cosine")).collect()
      t.write(emb.filter(col("vec_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf-rq")).collect()
      t
    }

  private val objDirs = TrieMap[String, String]()

  /** Deterministic object-store directory for the object-table row: one
    * '\n'-terminated file per language under the PERSISTED fixture root —
    * built once here, not inside the query lambda, so fixture work never
    * blurs the prepare/measure boundary. */
  def objectsDir(spark: SparkSession, sfDir: String): String =
    objDirs.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Paths.get(s"${fixRoot(sfDir)}/objects")
      val done = dir.resolve("_BUILT")
      if (!java.nio.file.Files.exists(done)) {
        java.nio.file.Files.createDirectories(dir)
        src(spark, sfDir, "documents").select("lang", "text").collect()
          .groupBy(_.getString(0)).foreach { case (lang, rows) =>
            val content = rows.map(_.getString(1)).sorted.map(_ + "\n").mkString
            java.nio.file.Files.write(dir.resolve(s"$lang.txt"),
              content.getBytes("UTF-8"))
          }
        java.nio.file.Files.write(done, Array.emptyByteArray)
      }
      dir.toString
    })

  /** Tiny deterministic PK table exercising the compaction-coordination
    * system tables (reference CompactBucketsTable / FileMonitorTable): base
    * write, update wave, full compaction — `file_monitor` sees each commit's
    * adds/removes per (partition, bucket), `compact_buckets` the
    * post-compaction per-bucket file lists. */
  def fileMonitorTbl(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "fm_tbl") { loc =>
      import spark.implicits._
      import graft.core.RowOps._
      val t = GraftTable.createOrReplace(spark, loc,
        Seq((1L, "a")).toDF("k", "v").schema,
        TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
      t.write((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"))
      t.write((1L to 100L).filter(_ % 10 == 0).map(i => (i, s"u$i")).toDF("k", "v"))
      t.compact()
      t
    }

  /** Reference-dialect typed table: schema declared through [[RefTypes]]
    * strings — TIME(3) (IntegerType millis-of-day, SparkTypeUtils.java:241)
    * and MULTISET<STRING> (MapType(String, Int), SparkTypeUtils.java:276) —
    * written and read back through a graft table so both mappings are
    * oracle-gated END-TO-END, not just unit-asserted. Values derive from
    * events: per user, the first event's millis-of-day and the multiset of
    * event types with multiplicities. */
  def refTypesTbl(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "reftypes") { loc =>
      val schema = graft.core.RefTypes.schemaToSpark(Seq(
        "user_id" -> "BIGINT", "first_t" -> "TIME(3)",
        "kinds" -> "MULTISET<STRING>"))
      val ev = src(spark, sfDir, "events")
      // millis-of-day (precision 3 = truncated micros) of the user's first
      // event; date_format SSS truncates the microsecond fraction
      val firstT = ev.groupBy("user_id").agg(min(col("ts")).as("m"))
        .select(col("user_id"),
          (hour(col("m")) * 3600000 + minute(col("m")) * 60000 +
            second(col("m")) * 1000 + date_format(col("m"), "SSS").cast("int"))
            .cast("int").as("first_t"))
      val kinds = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).cast("int").as("c"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("c"))))).as("kinds"))
      val df = firstT.join(kinds, "user_id")
        .select(col("user_id"), col("first_t"), col("kinds"))
      val t = GraftTable.createOrReplace(spark, loc, schema, TableConfig())
      t.write(df)
      t
    }

  /** Table declared DDL-FIRST with the reference's `VECTOR<FLOAT, 64>`
    * dialect type: [[graft.core.RefTypes.impliedOptions]] turns the declared
    * dimension into `fields.emb.dimension`, so the write-time enforcement is
    * armed by the TYPE alone (no hand-set option) — reference
    * VectorType.java:40, vector.mdx:78. */
  def vectorDdlTbl(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "vector_ddl") { loc =>
      val fields = Seq("vec_id" -> "BIGINT", "emb" -> "VECTOR<FLOAT, 64>")
      val t = GraftTable.createOrReplace(spark, loc,
        graft.core.RefTypes.schemaToSpark(fields),
        TableConfig(options = graft.core.RefTypes.impliedOptions(fields)))
      t.write(src(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding").as("emb")))
      t
    }

  /** Embeddings copy with TWO embedding columns — `embedding` plus a derived
    * stand-in `emb2` (image-embedding shape: same table, second vector
    * column, the multimodal norm per-column back-references exist for) —
    * EACH carrying its own CALL-managed IVF index: create both on 90%,
    * append the rest, refresh each independently via index_column. */
  def lcMultiEmb(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_multi_emb") { loc =>
      val emb = src(spark, sfDir, "embeddings")
        .withColumn("emb2", reverse(col("embedding")))
      val t = GraftTable.createOrReplace(spark, loc, emb.schema, TableConfig())
      t.write(emb.filter(col("vec_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf",
          "clusters" -> "8")).collect()
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "emb2", "index_type" -> "ivf",
          "clusters" -> "8")).collect()
      t.write(emb.filter(col("vec_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf", "index_column" -> "embedding")).collect()
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf", "index_column" -> "emb2")).collect()
      t
    }

  /** Events copy PARTITIONED by event_type, with a bitmap index on user_id
    * RESTRICTED to the 'click' partition (the reference's partition-scoped
    * `create_global_index(partitions => …)` build): lookups stay exact
    * because uncovered partitions remain full candidates. */
  def eventsGiPartial(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "events_gi_partial") { loc =>
      val ev = src(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "value")
      val t = GraftTable.createOrReplace(spark, loc, ev.schema,
        TableConfig(partitionKeys = Seq("event_type")))
      t.write(ev)
      Procedures.call(spark, t, "create_global_index",
        Map("column" -> "user_id", "index_type" -> "bitmap",
          "partitions" -> "event_type=click")).collect()
      t
    }

  /** Documents copy whose CALL-managed full-text index uses the NGRAM
    * tokenizer (reference full-text.tokenizer=ngram,
    * global-index/full-text.mdx:59-67): 3-grams of the whole value enable
    * substring-like search; the spec persists with the index so the delta
    * refresh grams identically and the TVF grams the query. */
  def lcDocsNgram(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_docs_ngram") { loc =>
      val docs = src(spark, sfDir, "documents").select("doc_id", "text")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema, TableConfig())
      t.write(docs.filter(col("doc_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "text", "index_type" -> "full-text",
          "id_column" -> "doc_id", "full-text.tokenizer" -> "ngram",
          "full-text.ngram.min-gram" -> "3",
          "full-text.ngram.max-gram" -> "3")).collect()
      t.write(docs.filter(col("doc_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "full-text")).collect()
      t
    }

  /** Documents with TWO text columns ('title' = the first three words,
    * 'body' = the full text), EACH with its own CALL-managed full-text
    * index — the per-column shape multi_match queries search in one go. */
  def lcDocsMulti(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_docs_multi") { loc =>
      val docs = src(spark, sfDir, "documents").select(col("doc_id"),
        array_join(slice(filter(split(col("text"), "\\s+"),
          w => length(w) > 0), 1, 3), " ").as("title"),
        col("text").as("body"))
      val t = GraftTable.createOrReplace(spark, loc, docs.schema, TableConfig())
      t.write(docs)
      Seq("title", "body").foreach { c =>
        Procedures.call(spark, t, "create_global_index",
          Map("index_column" -> c, "index_type" -> "full-text",
            "id_column" -> "doc_id")).collect()
      }
      t
    }

  /** Embeddings copy whose CALL-managed IVF index is built with
    * `distance.metric=l2` (reference `<index-type>.distance.metric`,
    * vector.mdx:184): the recorded metric becomes the TABLE path's query
    * metric, surviving the delta refresh. */
  def lcEmbL2(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_emb_l2") { loc =>
      val emb = src(spark, sfDir, "embeddings")
      val t = GraftTable.createOrReplace(spark, loc, emb.schema, TableConfig())
      t.write(emb.filter(col("vec_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf",
          "clusters" -> "8", "distance.metric" -> "l2")).collect()
      t.write(emb.filter(col("vec_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf")).collect()
      t
    }

  /** Append-table documents copy with a CALL-managed COMPOSITE (es) index:
    * text + bloom-keyword lang/source, create on 90%, append, refresh. */
  def lcEsDocs(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_es_docs") { loc =>
      val docs = src(spark, sfDir, "documents")
      val t = GraftTable.createOrReplace(spark, loc, docs.schema, TableConfig())
      t.write(docs.filter(col("doc_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_type" -> "es", "id_column" -> "doc_id",
          "text_column" -> "text", "keyword_columns" -> "lang;source")).collect()
      t.write(docs.filter(col("doc_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "es")).collect()
      t
    }

  /** documents JOINED to embeddings (doc_id = vec_id) with TWO CALL-managed
    * indexes — ivf on `embedding`, full-text on `text` — created on 90%,
    * appended, refreshed: the multi-route hybrid TVF's fixture. */
  def lcHybrid(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "lc_hybrid") { loc =>
      val joined = src(spark, sfDir, "documents")
        .join(src(spark, sfDir, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("embedding"))
      val t = GraftTable.createOrReplace(spark, loc, joined.schema, TableConfig())
      t.write(joined.filter(col("doc_id") % 10 =!= 0))
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "embedding", "index_type" -> "ivf",
          "clusters" -> "8")).collect()
      Procedures.call(spark, t, "create_global_index",
        Map("index_column" -> "text", "index_type" -> "full-text",
          "id_column" -> "doc_id")).collect()
      t.write(joined.filter(col("doc_id") % 10 === 0))
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "ivf")).collect()
      Procedures.call(spark, t, "refresh_global_index",
        Map("index_type" -> "full-text")).collect()
      t
    }

  /** Persisted full-text postings index over documents (term-range-clustered
    * graft table + corpus-stats sidecar). */
  def ftIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "ft_index") { loc =>
      graft.pipeline.Indexes.buildFullText(spark,
        src(spark, sfDir, "documents"), "doc_id", "text", loc)
    }

  /** Postings index WITH per-term position arrays
    * (full-text.with-position=true) — what match_phrase queries need. */
  def ftIndexPos(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "ft_index_pos") { loc =>
      graft.pipeline.Indexes.buildFullText(spark,
        src(spark, sfDir, "documents"), "doc_id", "text", loc,
        withPositions = true)
    }

  /** Persisted IVF index over embeddings (cluster-partitioned graft table +
    * centroid sidecar). */
  def ivfIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "ivf_index") { loc =>
      graft.pipeline.Indexes.buildIvf(spark,
        src(spark, sfDir, "embeddings"), "embedding", loc, nClusters = 8)
    }

  /** Persisted IVF-RQ index (unit-space clusters + m-byte residual codes),
    * built on 90% of the corpus then incrementally appended with the rest —
    * the append assigns + encodes only the delta against the stored model. */
  def ivfRqIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "ivf_rq_index") { loc =>
      val emb = src(spark, sfDir, "embeddings")
      val t = graft.pipeline.Indexes.buildIvfRq(spark,
        emb.filter(col("vec_id") % 10 =!= 0), "embedding", loc, dim = 64)
      graft.pipeline.Indexes.appendToIvfRq(spark,
        emb.filter(col("vec_id") % 10 === 0), "embedding", loc)
      t
    }

  /** es-index over embeddings: primary vector + companion scalar `label`
    * (filtered ANN = partition pruning + stats skipping + in-scan filter). */
  def esEmbIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "es_emb_index") { loc =>
      graft.pipeline.EsIndex.build(spark, src(spark, sfDir, "embeddings"),
        "vec_id", loc, embedCol = Some("embedding"), nClusters = 8)
    }

  /** es-index over documents: BM25 text + keyword companions lang/source
    * (bloom file-indexed) — filtered full-text search. */
  def esDocsIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "es_docs_index") { loc =>
      graft.pipeline.EsIndex.build(spark, src(spark, sfDir, "documents"),
        "doc_id", loc, textCol = Some("text"),
        keywordCols = Seq("lang", "source"))
    }

  /** es-index over documents JOINED to their embeddings (doc_id = vec_id):
    * vector + BM25 text + keyword `lang` in ONE composite index — the hybrid
    * (vector AND terms AND filter → RRF) route. */
  def esHybridIndex(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "es_hybrid_index") { loc =>
      val joined = src(spark, sfDir, "documents")
        .join(src(spark, sfDir, "embeddings"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("lang"), col("embedding"))
      graft.pipeline.EsIndex.build(spark, joined, "doc_id", loc,
        embedCol = Some("embedding"), textCol = Some("text"),
        keywordCols = Seq("lang"), nClusters = 8)
    }

  /** Catalog table seeded from orders then mutated by SQL row-level
    * statements (DELETE/UPDATE/MERGE INTO through GraftSparkExtensions —
    * requires spark.sql.extensions=graft.dsv2.GraftSparkExtensions). */
  def sqlRowOps(spark: SparkSession, sfDir: String, name: String,
                stmts: Seq[String]): String = {
    val wh = s"${fixRoot(sfDir)}/sql-warehouse"
    val key = (sfDir, s"__sql_$name")
    if (!built.contains(key)) {
      spark.conf.set("spark.sql.catalog.graft_fix", "graft.dsv2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_fix.warehouse", wh)
      val loc = s"$wh/db.db/$name"
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fix.db")
      spark.sql(s"""CREATE TABLE graft_fix.db.$name (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
        TBLPROPERTIES ('primary-key'='o_orderkey', 'bucket'='4')""")
      src(spark, sfDir, "orders").createOrReplaceTempView("orders_src_v")
      spark.sql(s"INSERT INTO graft_fix.db.$name SELECT * FROM orders_src_v")
      stmts.foreach(spark.sql(_))
      built.put(key, GraftTable.load(spark, loc))
    }
    s"graft_fix.db.$name"
  }

  /** Streaming upsert: AvailableNow stream of orders micro-batched through
    * foreachBatch into a PK dedup table (SURVEY §2.9 stateful upsert sink). */
  def ordersStream(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_stream") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      // deterministic input + checkpoint dirs, wiped per build: a stale
      // checkpoint must never outlive its input dir across JVM restarts
      val streamDir = java.nio.file.Paths.get(s"$loc-in")
      val ckptDir = s"$loc-ckpt"
      for (d <- Seq(streamDir.toString, ckptDir)) {
        val f = new java.io.File(d)
        if (f.exists()) { org.apache.hadoop.fs.FileUtil.fullyDelete(f); () }
      }
      java.nio.file.Files.createDirectories(streamDir)
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/orders.parquet"),
        streamDir.resolve("orders.parquet"))
      val stream = spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val q = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: DataFrame, _: Long) => t.write(batch); () }
        .start()
      q.awaitTermination(120000)
      t
    }

  /** REST catalog round trip: an in-process bear-token catalog service over
    * a temp warehouse; nation is written through the REST-registered catalog
    * (metadata ops over HTTP, data path direct) and read back via SQL. */
  def restNation(spark: SparkSession, sfDir: String): String =
    restBuilt.getOrElseUpdate(sfDir, {
      val wh = s"${fixRoot(sfDir)}/rest-warehouse"
      val f = new java.io.File(wh)
      if (f.exists()) { org.apache.hadoop.fs.FileUtil.fullyDelete(f); () }
      val server = new graft.rest.GraftRestServer(wh, "fixture-token")
      val port = server.start()
      spark.conf.set("spark.sql.catalog.rest_fix", "graft.rest.GraftRestCatalog")
      spark.conf.set("spark.sql.catalog.rest_fix.uri", s"http://127.0.0.1:$port")
      spark.conf.set("spark.sql.catalog.rest_fix.token", "fixture-token")
      spark.sql("CREATE DATABASE rest_fix.db")
      spark.sql("""CREATE TABLE rest_fix.db.nation
        (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT) USING graft
        TBLPROPERTIES ('primary-key' = 'n_nationkey', 'bucket' = '2')""")
      src(spark, sfDir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .writeTo("rest_fix.db.nation").append()
      "rest_fix.db.nation"
    })
  private val restBuilt = TrieMap[String, String]()

  /** CDC ingestion: debezium-JSON change events built deterministically from
    * orders and replayed through `Cdc.syncTable`/`ingest` in three batches —
    * inserts (all orders, 4 columns), updates (key%7==0: price×2, priority
    * CDC-UPD, NEW `src` column → schema evolution on write), deletes
    * (key%13==0, before carries only the key). Final state = orders minus
    * deleted keys, with updated rows patched and `src` only on them. */
  def cdcOrders(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_cdc") { loc =>
      import graft.pipeline.Cdc
      val o = src(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      val payload = struct(o.columns.map(col).toIndexedSeq: _*)
      val inserts = o.select(to_json(struct(lit("c").as("op"),
        payload.as("after"))).as("value"))
      val updates = o.filter(col("o_orderkey") % 7 === 0)
        .select(to_json(struct(lit("u").as("op"),
          struct(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("CDC-UPD").as("o_orderpriority"),
            lit("cdc").as("src")).as("after"),
          payload.as("before"))).as("value"))
      val deletes = o.filter(col("o_orderkey") % 13 === 0)
        .select(to_json(struct(lit("d").as("op"),
          struct(col("o_orderkey")).as("before"))).as("value"))
      val f = new java.io.File(loc)
      if (f.exists()) { org.apache.hadoop.fs.FileUtil.fullyDelete(f); () }
      val t = Cdc.syncTable(spark, loc, inserts, "value", Cdc.Debezium,
        primaryKeys = Seq("o_orderkey"))
      Cdc.ingest(t, updates, "value", Cdc.Debezium)
      Cdc.ingest(t, deletes, "value", Cdc.Debezium)
      t
    }

  /** Native streaming sink: the same AvailableNow orders stream written with
    * `writeStream.format("graft")` directly (no foreachBatch) — exercises
    * GraftSink's idempotent per-batch commit path (§2.9 streaming sink). */
  def ordersStreamNative(spark: SparkSession, sfDir: String): GraftTable =
    fixture(spark, sfDir, "orders_stream_native") { loc =>
      val orders = src(spark, sfDir, "orders")
      val t = GraftTable.createOrReplace(spark, loc, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
      val streamDir = java.nio.file.Paths.get(s"$loc-in")
      val ckptDir = s"$loc-ckpt"
      for (d <- Seq(streamDir.toString, ckptDir)) {
        val f = new java.io.File(d)
        if (f.exists()) { org.apache.hadoop.fs.FileUtil.fullyDelete(f); () }
      }
      java.nio.file.Files.createDirectories(streamDir)
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/orders.parquet"),
        streamDir.resolve("orders.parquet"))
      val q = spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
        .writeStream.format("graft")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckptDir)
        .option("path", t.location)
        .start()
      q.awaitTermination(120000)
      GraftTable.load(spark, t.location)
    }
}
