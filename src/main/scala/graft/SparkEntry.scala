package graft

import graft.core._
import graft.core.RowOps._
import graft.functions.GraftAggs
import graft.pipeline.{CorpusOps, Similarity, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql` over the raw
 * parquet tables. Engine-backed queries run against deterministic fixture
 * tables (see [[Fixtures]]) so their results are SQL-expressible.
 */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: merged MOR read
    * of the PK dedup table, aggregated. */
  def entry(spark: SparkSession): DataFrame =
    qPkDedup(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Fixtures.src(spark, sfDir, name)

  private def statusAgg(df: DataFrame): DataFrame =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))

  private def qPkDedup(spark: SparkSession, sf: String): DataFrame =
    statusAgg(Fixtures.ordersPk(spark, sf).read())

  private val dedupOracle =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
      | round(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
      |               ELSE o_totalprice END), 2) AS total
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // language-ID oracle: mirrors TextOps.langId exactly (token-equality
  // marker counts over one whitespace tokenization)
  private def langScoreSql(lang: String): String = {
    val in = TextOps.langMarkers(lang).map(m => s"'$m'").mkString(", ")
    s"CAST(len(list_filter(ws, w -> w IN ($in))) AS BIGINT)"
  }
  private val langIdOracle: String = {
    val langs = Seq("en", "de", "fr", "es")
    val scores = langs.map(l => s"${langScoreSql(l)} AS s_$l").mkString(", ")
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH scored AS (
       |  SELECT $scores FROM (
       |    SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                       w -> length(w) > 0) AS ws FROM documents)
       |), best_t AS (SELECT *, $best AS best FROM scored)
       |SELECT $pred AS lang_pred, CAST(count(*) AS BIGINT) AS cnt
       |FROM best_t GROUP BY 1""".stripMargin
  }

  // quality-score oracle fragments: mirror TextOps.qualityScore
  private val tokCntSql =
    "CASE WHEN length(trim(text))=0 THEN 0 ELSE length(regexp_split_to_array(trim(text),'\\s+')) END"
  private val qualitySql =
    s"""round(
       | least(($tokCntSql)/100.0, 1.0) * 0.5 +
       | (CASE WHEN ($tokCntSql) > 0 AND
       |   (length(text)*1.0/($tokCntSql)) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.3 +
       | (CASE WHEN length(text) > 0 AND
       |   ((length(text)-length(regexp_replace(text,'[.,;:!?]','','g')))*1.0/length(text)) <= 0.1
       |   THEN 1.0 ELSE 0.5 END) * 0.2, 4)""".stripMargin

  // ---------------------------------------------------------------- catalog

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / snapshots / time travel (SURVEY §2.1) ----
    "q_pk_dedup" -> ((s, d) => qPkDedup(s, d)),
    // partial compaction: one partition compacted, others still MOR —
    // the merged answer must be identical either way
    "q_compact_partial" -> ((s, d) =>
      statusAgg(Fixtures.ordersPartialCompact(s, d).read())),
    // record-level expire: compaction dropped the 50-years-old third
    "q_record_expire" -> ((s, d) => Fixtures.eventsExpire(s, d).read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))),
    // clustering-override table: value filter on the clustering column is
    // served by the pruned raw path (file stats carry tight status ranges)
    "q_pk_clustering" -> ((s, d) => Fixtures.ordersClustered(s, d)
      .read(Some(col("o_orderstatus") === "F"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    "q_mor_read" -> ((s, d) => statusAgg(Fixtures.ordersPk(s, d).read(None, Some(2L)))),
    "q_ro_read" -> ((s, d) => statusAgg(Fixtures.ordersPk(s, d).readRaw())),
    "q_filter_pushdown" -> ((s, d) => Fixtures.ordersPk(s, d)
      .read(filter = Some(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz")))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    // reads over metadata.stats-mode-degraded manifests stay exact: the
    // lang filter prunes through truncated (inexact) bounds, the doc_id
    // conjunct can't use stats at all (mode none) and must not mis-prune
    "q_stats_mode" -> ((s, d) => Fixtures.docsStatsMode(s, d)
      .read(filter = Some(col("lang") === "en" && col("doc_id") % 3 === 0))
      .agg(count(lit(1)).as("cnt"), sum(length(col("text"))).as("chars"))),
    "q_time_travel" -> ((s, d) => Fixtures.ordersPk(s, d).read(None, Some(1L))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_tag_read" -> ((s, d) => Fixtures.ordersPk(s, d).readTag("v1")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_incremental" -> ((s, d) => Fixtures.ordersPk(s, d).incremental(1, 2)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderpriority"))),
    // incremental-between as a DSv2 read option in DIFF scan mode: the
    // state diff between snapshots 1 and 2 = the new values of updated keys
    "q_incremental_diff" -> ((s, d) => {
      val loc = Fixtures.ordersPk(s, d).location
      s.read.format("graft")
        .option("incremental-between", "1,2")
        .option("incremental-between-scan-mode", "diff")
        .load(loc)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("o_orderpriority"))
    }),
    // incremental-between-timestamp: boundaries bracket snapshot 2's commit
    // time, so the delta is exactly snapshot 2 (works even when snapshots
    // share a millisecond — the earliest-snapshot fallback keeps start=1)
    "q_incremental_ts" -> ((s, d) => {
      val t = Fixtures.ordersPk(s, d)
      val ts2 = t.sm.readSnapshot(2).timestampMs
      s.read.format("graft")
        .option("incremental-between-timestamp", s"${ts2 - 1},$ts2")
        .load(t.location)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("o_orderpriority"))
    }),
    // incremental-to-auto-tag: diff between a period tag and the previous
    // auto tag (paimon IncrementalDiffStartingScanner.toEndAutoTag)
    "q_incremental_auto_tag" -> ((s, d) => {
      val t = Fixtures.ordersPk(s, d)
      if (!t.sm.listTags().exists(_.name == "2024-01-01")) {
        t.sm.createTag("2024-01-01", 1); t.sm.createTag("2024-01-02", 2)
      }
      s.read.format("graft")
        .option("incremental-to-auto-tag", "2024-01-02")
        .load(t.location)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("o_orderpriority"))
    }),
    "q_changelog" -> ((s, d) => Fixtures.ordersPk(s, d).changelog(1, 2)
      .select(col("o_orderkey"), col("_row_kind"), round(col("o_totalprice"), 2).as("price"))),
    // full-compaction producer: changelog(0, compactSnap) is served from
    // the COMPACT snapshot's stored files (one +I per key, one -U/+U per
    // updated key collapsed into the final state diff) — never the O(table)
    // runtime diff
    "q_changelog_fc" -> ((s, d) => Fixtures.ordersPkFc(s, d).changelog(0, 3)
      .groupBy("_row_kind").agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    "q_audit_log" -> ((s, d) => Fixtures.ordersPk(s, d).auditLog(Some(2L))
      .groupBy("rowkind").agg(count(lit(1)).as("cnt"))),
    // VERSION AS OF watermark: EARLIEST snapshot whose watermark >= 1000 is
    // snapshot 1 (pre-update state) — reference laterOrEqualWatermark
    "q_watermark" -> ((s, d) => Fixtures.ordersWm(s, d).readWatermark(1000L)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    // configured column default materialized for an input lacking the column
    "q_column_default" -> ((s, d) => Fixtures.ordersDefault(s, d).read()
      .groupBy("channel").agg(count(lit(1)).as("cnt"))),
    // incremental clustering: level-0 files sorted without rewriting the
    // previously clustered output; full content preserved
    "q_incr_cluster" -> ((s, d) => Fixtures.lineitemIc(s, d)
      .read(filter = Some(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz")))
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))),
    // DSv2 limit pushdown (file-truncation planning early-out): count over
    // an exact LIMIT subquery is deterministic
    "q_limit_pushdown" -> ((s, d) => {
      val t0 = Fixtures.lineitemZ(s, d)
      s.read.format("graft").load(t0.location).limit(100)
        .agg(count(lit(1)).as("cnt"))
    }),
    // COPY INTO: csv directory ingested through the table's schema
    "q_copy_into" -> ((s, d) => Fixtures.regionCopy(s, d).read()
      .select(col("r_regionkey"), col("r_name"))),
    "q_system_snapshots" -> ((s, d) => Fixtures.ordersPk(s, d)
      .systemTable("snapshots").select("snapshot_id", "commit_kind")),
    // metrics system table (paimon maintenance/metrics.md): do one unfiltered
    // planning pass, then report the deterministic scan gauges it set
    "q_metrics" -> ((s, d) => {
      val t = Fixtures.ordersPk(s, d)
      t.read() // plans eagerly -> records scan metrics for snapshot 3
      t.systemTable("metrics").filter(col("metric").isin(
        "lastScannedSnapshotId", "lastScannedManifests",
        "lastScanResultedTableFiles", "lastScanSkippedTableFiles"))
    }),
    "q_branch_ff" -> ((s, d) => statusAgg(Fixtures.ordersBranch(s, d).read())),
    "q_dynamic_bucket" -> ((s, d) => statusAgg(Fixtures.ordersDyn(s, d).read())),
    // row tracking: per-commit lineage survives the sort-compaction rewrite
    // (ids assigned at ingest, carried through, still unique per row)
    "q_row_tracking" -> ((s, d) => {
      import graft.core.RowOps._
      Fixtures.eventsRt(s, d).systemTable("row_tracking")
        .groupBy("commit_seq")
        .agg(count(lit(1)).as("cnt"), count_distinct(col("row_id")).as("ids"))
    }),
    // fallback branch: partitions missing on main serve from branch `hist`
    // (O comes from main with doubled prices, F/P from the branch)
    "q_fallback_branch" -> ((s, d) => statusAgg(Fixtures.ordersFb(s, d).read())),
    // data evolution: UPDATE on a row-tracking append table writes column
    // patches (row id → new values); reads join them back by row id. Two
    // generations, the second's predicate over the first's patched values.
    "q_data_evolution" -> ((s, d) => Fixtures.docsDe(s, d).read()
      .select("doc_id", "lang", "source", "n_chars")),
    "q_data_evolution_merge" -> ((s, d) => Fixtures.docsDeM(s, d).read()
      .select("doc_id", "lang", "source", "n_chars")),
    // chain table (§2.10): full state of day d2 = snapshot-branch d1 anchor
    // merged with delta-branch d2 changes — incremental compute + storage
    "q_chain_read" -> ((s, d) => Fixtures.chainOrders(s, d).readChain("d2")
      .select(col("o_orderkey"), col("day"),
        round(col("o_totalprice"), 2).as("price"))),
    // chain table STREAMING scan (reference ChainTableStreamScan): phase 1
    // serves the snapshot branch's latest partition (d1 full) + delta
    // partitions after it (d2 changes); phase 2 would stream new delta
    // snapshots (StreamingSinkSpec exercises it — none arrive here)
    "q_chain_stream" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.chainOrders(s, d)
      val outName = s"graft_chain_stream_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-chain-ckpt").toString
      val q = s.readStream.format("graft").load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      s.table(outName).select(col("o_orderkey"), col("day"),
        round(col("o_totalprice"), 2).as("price"))
    }),
    // chain streaming MERGE-SNAPSHOT mode (chain-table.streaming.merge-
    // snapshot=true): phase 1 chain-merges snapshot anchor + later deltas
    // per bucket — one winner per chain key (later partition, then higher
    // seq) surfaced under the latest logical partition (d2)
    "q_chain_stream_merge" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.chainOrders(s, d)
      val outName = s"graft_chain_stream_m_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-chain-m-ckpt").toString
      val q = s.readStream.format("graft")
        .option("chain-table.streaming.merge-snapshot", "true")
        .load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      s.table(outName).select(col("o_orderkey"), col("day"),
        round(col("o_totalprice"), 2).as("price"))
    }),
    // POSTPONE bucket mode, legacy flow: staged (uncompacted) writes are
    // invisible — the read serves exactly the last compacted state
    "q_postpone" -> ((s, d) => Fixtures.ordersPp(s, d).read()
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    // POSTPONE fixed-bucket DEFAULT flow: INSERT then immediate SELECT —
    // both batches visible and merged with NO compact call
    "q_postpone_fixed" -> ((s, d) => Fixtures.ordersPpFixed(s, d).read()
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    // postpone.merge-on-read: a LEGACY-staged leftover batch merges with
    // real buckets (and loses to a later fixed-bucket batch on overlap)
    "q_postpone_mor" -> ((s, d) => Fixtures.ordersPpMor(s, d).read()
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("o_totalprice"), 2).as("total"))),
    // Literal-key MAP pruning: attrs['k'] on declared shred-keys reads only
    // the typed side columns (GraftMapShredBatchScan), never the map bytes
    "q_map_shred" -> ((s, d) => {
      val t = Fixtures.ordersMap(s, d)
      s.read.format("graft").load(t.location)
        .filter(col("attrs")("prio") =!= "1-URGENT")
        .groupBy(col("attrs")("status").as("status"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),
    // Aggregate-over-Filter shape with NO Project of the map: the filter's
    // literal-key access alone triggers the side-column rewrite (beyond the
    // reference rule, which matches only Project shapes)
    "q_map_shred_agg" -> ((s, d) => {
      val t = Fixtures.ordersMap(s, d)
      s.read.format("graft").load(t.location)
        .filter(col("attrs")("prio") === "1-URGENT")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),
    // KEY_DYNAMIC: a PK update that changes the partition column must MOVE
    // the row (tombstone in the old partition) — exactly one row per key
    "q_cross_partition" -> ((s, d) => Fixtures.custXp(s, d).read()
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal"), 2).as("acctbal"))),
    "q_format_table" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))),
    // data-file formats (file.format option): ORC through the full LSM
    // (MOR + compaction), CSV append with explicit null marker
    "q_file_format_orc" -> ((s, d) => statusAgg(Fixtures.ordersOrcFmt(s, d).read())),
    "q_file_format_csv" -> ((s, d) => Fixtures.nationCsvFmt(s, d).read()),
    "q_file_format_avro" -> ((s, d) => statusAgg(Fixtures.ordersAvroFmt(s, d).read())),
    "q_file_format_text" -> ((s, d) => Fixtures.docsTextFmt(s, d).read()
      .agg(count(lit(1)).as("cnt"), sum(length(col("line"))).as("chars"))),
    "q_file_format_row" -> ((s, d) => statusAgg(Fixtures.ordersRowFmt(s, d).read())),

    // ---- merge engines (§2.4a) ----
    "q_partial_update" -> ((s, d) => Fixtures.custPu(s, d).read()
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("c_mktsegment"))),
    "q_pu_agg_group" -> ((s, d) => Fixtures.liPuAgg(s, d).read()
      .select(col("l_orderkey"), col("g"), round(col("b"), 2).as("b"),
        round(col("s"), 2).as("s"))),
    "q_seq_multi" -> ((s, d) => Fixtures.ordersSeq2(s, d).read()
      .select(col("o_orderkey"), col("flag"), round(col("price"), 2).as("price"))),
    "q_pu_retract" -> ((s, d) => Fixtures.custPuRetract(s, d).read()
      .select(col("c_custkey"), col("g"), col("seg"), round(col("bal"), 2).as("bal"))),
    "q_agg_retract_full" -> ((s, d) => Fixtures.ordersAggRetract2(s, d).read()
      .select(col("o_orderkey"), col("lv"), col("ln"),
        array_join(col("co"), ",").as("co"))),
    "q_sequence_group" -> ((s, d) => Fixtures.custSg(s, d).read()
      .select(col("c_custkey"), col("bal_seq"),
        round(col("c_acctbal"), 2).as("acctbal"), col("seg_seq"), col("c_mktsegment"))),
    "q_agg_engine" -> ((s, d) => Fixtures.aggTbl(s, d).read()
      .select(col("l_orderkey"), round(col("qty_sum"), 2).as("qty_sum"),
        round(col("price_max"), 2).as("price_max"), col("item_cnt"), col("flags"))),
    "q_agg_retract" -> ((s, d) => Fixtures.aggRetract(s, d).read()
      .select(col("l_orderkey"), round(col("qty_sum"), 2).as("qty_sum"),
        round(col("price_max"), 2).as("price_max"), col("item_cnt"))),
    "q_first_row" -> ((s, d) => Fixtures.ordersFr(s, d).read()
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_rbm_cardinality" -> ((s, d) => {
      val card = udf((b: Array[Byte]) => GraftAggs.rbm64Cardinality(b))
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(GraftAggs.rbm64(col("o_custkey")).as("rbm"))
        .select(col("o_orderstatus"), card(col("rbm")).as("uniq"))
    }),
    // hash-matchable: the sketch estimate is checked against the exact
    // distinct count as a relative-error bound the oracle can reproduce
    "q_hll_estimate" -> ((s, d) => t(s, d, "orders").groupBy("o_orderstatus")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("approx"),
        count_distinct(col("o_custkey")).as("exact"))
      .select(col("o_orderstatus"),
        (abs(col("approx") - col("exact")) / col("exact") < 0.05).as("within_5pct"))),

    // ---- file indexes (§2.2): bloom / bitmap / bsi skip files min/max can't ----
    "q_fileindex_bloom" -> ((s, d) => Fixtures.ordersFidx(s, d)
      .read(Some(col("o_custkey") === 7L))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_fileindex_bitmap" -> ((s, d) => Fixtures.ordersFidx(s, d)
      .read(Some(col("o_orderpriority") === "1-URGENT"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_fileindex_bsi" -> ((s, d) => Fixtures.ordersFidx(s, d)
      .read(Some(col("o_orderkey") >= 1000L && col("o_orderkey") <= 5000L))
      .agg(count(lit(1)).as("cnt"), round(avg("o_totalprice"), 2).as("avg_price"))),

    // ---- aggregate/limit pushdown, sorts (§2.4b / §2.6) ----
    "q_agg_pushdown" -> ((s, d) => Fixtures.eventsAp(s, d).aggFromManifest(Seq(
      ("cnt", "count", ""), ("min_id", "min", "event_id"), ("max_id", "max", "event_id")))),
    // GROUP BY partition column answered from manifests alone (DSv2
    // complete aggregate pushdown, zero data files read)
    "q_agg_pushdown_grouped" -> ((s, d) => {
      val tbl = Fixtures.sqlCatalogEvents(s, d)
      s.sql(s"""SELECT event_type, count(*) AS cnt, max(event_id) AS max_id
                FROM $tbl GROUP BY event_type""")
    }),
    "q_topn" -> ((s, d) => Fixtures.lineitemZ(s, d).read()
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))),
    // 2-D range filter — the shape z-order interleaving actually serves
    // (a 1-D slice belongs to `order` clustering, not z-order)
    "q_zorder_scan" -> ((s, d) => Fixtures.lineitemZ(s, d)
      .read(filter = Some(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz")
        && col("l_extendedprice") >= 900.0 && col("l_extendedprice") < 1500.0))
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("rev"))),

    // ---- row-level ops (§2.10) ----
    "q_delete_cow" -> ((s, d) => statusAgg(Fixtures.ordersDel(s, d).read())),
    "q_delete_dv" -> ((s, d) => statusAgg(Fixtures.ordersDvDel(s, d).read())),
    // same state read through the DSv2 native columnar scan: deletion
    // vectors apply inside the reader factory (position-skip), no V1 path
    "q_dv_scan" -> ((s, d) =>
      statusAgg(s.read.format("graft").load(Fixtures.ordersDvDel(s, d).location))),
    "q_update_cow" -> ((s, d) => statusAgg(Fixtures.ordersUpd(s, d).read())),
    "q_merge_into" -> ((s, d) => statusAgg(Fixtures.ordersMi(s, d).read())),
    "q_metadata_delete" -> ((s, d) => Fixtures.eventsDel(s, d).read()
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))),
    "q_max_pt" -> ((s, d) => {
      val tbl = Fixtures.eventsAp(s, d)
      val mp = graft.functions.GraftFunctions.maxPt(tbl, "event_type")
      tbl.read(filter = Some(col("event_type") === lit(mp)))
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_partition_prune" -> ((s, d) => Fixtures.eventsAp(s, d)
      .read(filter = Some(col("event_type") === "purchase"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))),
    // metadata columns (§2.2): partition struct must equal the data column,
    // file/row-index/bucket non-null — wrong metadata shifts the group counts
    "q_metadata_cols" -> ((s, d) => Fixtures.eventsAp(s, d).readWithMetadata()
      .filter(col(graft.core.GraftTable.FILE_PATH_COL).isNotNull &&
        col(graft.core.GraftTable.ROW_INDEX_COL) >= 0 &&
        col(graft.core.GraftTable.BUCKET_COL) >= 0)
      .groupBy(col(s"${graft.core.GraftTable.PARTITION_COL}.event_type").as("event_type"))
      .agg(count(lit(1)).as("cnt"))),
    // global secondary indexes (§2.11): equality lookup + sorted TopN over
    // an UNCLUSTERED column, both driven by the persisted index table
    "q_bitmap_eq" -> ((s, d) => {
      val gi = Fixtures.lineitemGi(s, d)
      val k = t(s, d, "lineitem").agg(min("l_orderkey")).head().getLong(0)
      graft.pipeline.GlobalIndex.readEquality(s, gi.location, "l_orderkey", Seq(k))
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
    }),
    // PARTITION-SCOPED index build (reference create_global_index
    // partitions => …): only event_type=click is indexed; the equality
    // lookup is exact anyway because uncovered partitions stay candidates
    "q_bitmap_partial" -> ((s, d) => {
      val gi = Fixtures.eventsGiPartial(s, d)
      graft.pipeline.GlobalIndex.readEquality(s, gi.location, "user_id", Seq(13L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
    }),
    "q_btree_topn" -> ((s, d) => {
      val gi = Fixtures.ordersGi(s, d)
      graft.pipeline.GlobalIndex
        .topNCandidates(s, gi.location, "o_totalprice", 10, desc = true)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),
    // runtime filtering (DPP): the dim filter is only known at run time —
    // SupportsRuntimeFiltering re-prunes the fact scan's planned files
    "q_runtime_filter" -> ((s, d) => {
      val fact = s.read.format("graft").load(Fixtures.eventsAp(s, d).location)
      val dim = t(s, d, "events").select("event_type").distinct()
        .filter(col("event_type").startsWith("c"))
      fact.join(broadcast(dim), "event_type")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
    }),
    "q_overwrite_dynamic" -> ((s, d) => Fixtures.eventsOw(s, d).read()
      .groupBy("event_type").agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))),
    // DataFrame-writer-API table: created via save() with primary-key +
    // partitionBy, 1-URGENT partition dynamically overwritten at price+1000
    "q_df_write" -> ((s, d) => Fixtures.ordersDfw(s, d).read()
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_schema_evolution" -> ((s, d) => Fixtures.ordersEvo(s, d).read()
      .groupBy(coalesce(col("comment"), lit("-")).as("comment"))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    // write.merge-schema: batch 2 brings a new column (batch-1 rows read it
    // null), batch 3 widens pop INT→BIGINT (old files read through the
    // evolution cast)
    "q_merge_schema" -> ((s, d) => Fixtures.nationMergeSchema(s, d).read()
      .select(col("n_nationkey"), col("pop"),
        coalesce(col("tag"), lit("-")).as("tag"))),

    // ---- DSv2 catalog SQL (§3.1 trace through Spark's analyzer/catalog) ----
    "q_fixed_bucket" -> ((s, d) => {
      // the graft_bucket SQL scalar (paimon `fixed_bucket`) must agree with
      // the write path's routing: every row's computed bucket equals the
      // bucket directory its file landed in (metadata __bucket column)
      val bc = graft.core.GraftTable.BUCKET_COL
      Fixtures.ordersBapp(s, d).readWithMetadata()
        .select((expr("graft_bucket(8, o_custkey)") === col(bc)).as("ok"))
        .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("matched"),
          count(lit(1)).as("total"))
    }),
    "q_catalog_udf" -> ((s, d) => {
      // persisted catalog lambda UDF (CALL sys.create_function) applied in
      // a query over a catalog table — integer lambda, no float rounding
      Fixtures.sqlCatalogOrders(s, d) // registers graft_fix + orders_sql
      s.sql("""CALL sys.create_function(name => 'graft_fix.db.okmod',
               lambda => 'k BIGINT -> k % 97')""")
      s.sql("""SELECT o_orderstatus, CAST(sum(graft_fix.db.okmod(o_orderkey)) AS BIGINT) AS m,
               count(*) AS cnt
               FROM graft_fix.db.orders_sql GROUP BY o_orderstatus""")
    }),
    "q_sql_catalog" -> ((s, d) => {
      val tbl = Fixtures.sqlCatalogOrders(s, d)
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
                FROM $tbl GROUP BY o_orderstatus""")
    }),
    "q_sql_time_travel" -> ((s, d) => {
      val tbl = Fixtures.sqlCatalogOrders(s, d)
      s.sql(s"SELECT count(*) AS cnt FROM $tbl VERSION AS OF 1")
    }),
    // TVF surface (§2.11 / paimon_incremental_query counterpart)
    "q_tvf_incremental" -> ((s, d) => {
      val loc = Fixtures.ordersPk(s, d).location
      s.sql(s"""SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderpriority
                FROM graft_incremental_query('$loc', 1, 2)""")
    }),
    // branch-scoped SQL handle (paimon manage-branches "Read / Write
    // branch"): writes via `t$branch_dev` land on the branch; main reads
    // stay untouched and the branch read sees base + branch delta merged
    "q_sql_branch" -> ((s, d) => {
      val tbl = Fixtures.sqlRowOps(s, d, "orders_sqlbr", Seq(
        "ALTER TABLE graft_fix.db.orders_sqlbr CREATE BRANCH dev",
        """INSERT INTO graft_fix.db.`orders_sqlbr$branch_dev`
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
                  o_orderdate, 'X-UPD'
           FROM graft_fix.db.orders_sqlbr WHERE o_orderkey % 10 = 0"""))
      s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
                FROM ${tbl.replace("orders_sqlbr", "`orders_sqlbr$branch_dev`")}
                GROUP BY o_orderpriority""")
    }),
    // SQL row-level commands through the session extensions (§2.10)
    "q_sql_delete" -> ((s, d) => {
      val tbl = Fixtures.sqlRowOps(s, d, "orders_sqldel",
        Seq("DELETE FROM graft_fix.db.orders_sqldel WHERE o_orderstatus = 'F'"))
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
                FROM $tbl GROUP BY o_orderstatus""")
    }),
    "q_sql_update" -> ((s, d) => {
      val tbl = Fixtures.sqlRowOps(s, d, "orders_sqlupd",
        Seq("""UPDATE graft_fix.db.orders_sqlupd
               SET o_totalprice = o_totalprice * 0.9, o_orderpriority = 'SQL-UPD'
               WHERE o_orderstatus = 'O'"""))
      s.sql(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
                FROM $tbl GROUP BY o_orderstatus, o_orderpriority""")
    }),
    "q_sql_merge" -> ((s, d) => {
      val tbl = Fixtures.sqlRowOps(s, d, "orders_sqlmrg", Seq(
        """CREATE OR REPLACE TEMPORARY VIEW mi_sql_src AS
           SELECT o_orderkey AS sk, o_totalprice + 1000.0 AS sprice
           FROM orders_src_v WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice
           FROM orders_src_v WHERE o_orderkey % 7 = 3""",
        """MERGE INTO graft_fix.db.orders_sqlmrg t USING mi_sql_src s
           ON s.sk = t.o_orderkey
           WHEN MATCHED THEN UPDATE SET o_totalprice = s.sprice
           WHEN NOT MATCHED THEN INSERT
             (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
             VALUES (s.sk, 0, 'NEW', s.sprice, TIMESTAMP_NTZ'2024-01-01', '5-LOW')"""))
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
                FROM $tbl GROUP BY o_orderstatus""")
    }),

    // ---- streaming (§2.9) ----
    "q_stream_upsert" -> ((s, d) => Fixtures.ordersStream(s, d).read()
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_stream_sink" -> ((s, d) => Fixtures.ordersStreamNative(s, d).read()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_stream_source" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.ordersPk(s, d)
      val outName = s"graft_stream_src_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-src-ckpt").toString
      val q = s.readStream.format("graft")
        .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
        .load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      // changelog-producer=input: raw upsert records of snapshots 1..2
      s.table(outName)
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),
    "q_binlog_stream" -> ((s, d) => {
      // streaming read of t$binlog (paimon BinlogTable): each commit's
      // changelog packs per key — +I with [value], +U with [before, after];
      // first/last array elements distinguish pre/post-update state
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.ordersPkCl(s, d)
      val outName = s"graft_binlog_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-bl-ckpt").toString
      val q = s.readStream.format("graft")
        .option("read-binlog", "true")
        .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
        .load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      s.table(outName)
        .select(col("rowkind"),
          element_at(col("o_totalprice"), 1).as("before_p"),
          element_at(col("o_totalprice"), -1).as("after_p"))
        .groupBy("rowkind").agg(count(lit(1)).as("cnt"),
          round(sum("before_p"), 2).as("before_total"),
          round(sum("after_p"), 2).as("after_total"))
    }),
    "q_read_limit" -> ((s, d) => {
      // bounded stream (scan.bounded.watermark): never admit a snapshot
      // whose watermark exceeds the bound — AvailableNow terminates at the
      // boundary, so only snapshot 1 (wm 1000 <= 1500) is consumed
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.ordersWm(s, d)
      val outName = s"graft_bounded_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-bw-ckpt").toString
      val q = s.readStream.format("graft")
        .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
        .option("scan.bounded.watermark", "1500")
        .load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      s.table(outName)
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),
    "q_stream_changelog" -> ((s, d) => {
      import org.apache.spark.sql.streaming.Trigger
      val tbl = Fixtures.ordersPkCl(s, d)
      val outName = s"graft_stream_cl_${math.abs(d.hashCode)}"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cl-ckpt").toString
      val q = s.readStream.format("graft")
        .option("read-changelog", "true")
        .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
        .load(tbl.location)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(outName).start()
      q.awaitTermination(120000)
      // write-time changelog: +I for snapshot 1, -U/+U pairs for snapshot 2
      s.table(outName)
        .groupBy("_row_kind")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),

    // ---- delegated relational (§2.3–2.7) ----
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))),
    "q_join_broadcast" -> ((s, d) => t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))),
    "q_window" -> ((s, d) => {
      // window over a BUCKET-KEYED catalog table: the scan's
      // KeyGroupedPartitioning satisfies the window's clustering, so the
      // per-customer top-3 runs with ZERO exchange — partition + sort +
      // window in one stage (the 100-TB shape: the shuffle that dominates
      // window workloads comes from storage for free)
      import org.apache.spark.sql.expressions.Window
      val tbl = Fixtures.ordersBucketedSql(s, d)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.table(tbl).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("o_custkey", "o_orderkey", "rn")
    }),
    "q_setops" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
    }),
    "q_rollup" -> ((s, d) => t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))),
    "q_distinct" -> ((s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),
    "q_semijoin" -> ((s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("cnt"))),
    "q_antijoin" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt"))),

    // ---- LLM-pipeline ops (§2.11 + training-data operators) ----
    "q_dedup_exact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val d2 = docs.select("doc_id", "text")
        .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      d2.groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("cnt"))
    }),
    // dedup CLUSTERING: pair graph → connected components (iterative min-
    // label propagation) → canonical doc per component; the keep/drop step
    // of a dedup pipeline after any candidate generator
    "q_dedup_cluster" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val d2 = docs.select("doc_id", "text")
        .unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val fp = d2.select(col("doc_id"), md5(col("text")).as("fp"))
      val pairs = fp.alias("a").join(fp.alias("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("v1"), col("b.doc_id").as("v2"))
      graft.pipeline.Dedup.canonicalize(d2, "doc_id", pairs)
    }),
    // SQL spelling of the dedup pipeline (CALL sys.dedup_corpus): the
    // procedure runs pairs -> connected components -> canonicalize and
    // WRITES a PK components table; the row reads it — same answer as the
    // library-API q_dedup_cluster
    "q_dedup_corpus_call" -> ((s, d) => Fixtures.dedupCorpusCall(s, d).read()
      .select(col("doc_id"), col("canonical"))),
    "q_text_tokens" -> ((s, d) => t(s, d, "documents")
      .groupBy("lang")
      .agg(sum(TextOps.tokenCount(col("text"))).as("n_tokens"), count(lit(1)).as("docs"))),
    // CCNet-style unigram-LM perplexity proxy: corpus-fit unigram counts,
    // per-doc mean negative log-likelihood (nats/token)
    "q_unigram_nll" -> ((s, d) => graft.pipeline.CorpusOps.unigramNll(
      t(s, d, "documents"), "doc_id", "text")),
    // BPE-ish subword counts + Gopher-style repetition/stopword signals,
    // aggregated as exact integer counts (engine-portable, no float drift)
    "q_text_signals" -> ((s, d) => {
      val txt = col("text")
      val lines = filter(split(txt, "\n"), l => length(trim(l)) > 0)
      val ws = TextOps.words(txt)
      val stops = filter(ws, w => TextOps.stopwords.map(sw => w === sw).reduce(_ || _))
      t(s, d, "documents").groupBy("lang").agg(
        sum(TextOps.tokenCountBpe(txt)).as("bpe_tokens"),
        sum(size(lines).cast("long")).as("n_lines"),
        sum(size(array_distinct(lines)).cast("long")).as("n_uniq_lines"),
        sum(size(stops).cast("long")).as("n_stop"),
        sum(size(ws).cast("long")).as("n_words"))
    }),
    "q_lang_id" -> ((s, d) => t(s, d, "documents")
      // staged: tokenization + marker counts once per row, argmax separate
      .select(TextOps.langScores(col("text")).as("__ls"))
      .groupBy(TextOps.langIdFromScores(col("__ls")).as("lang_pred"))
      .agg(count(lit(1)).as("cnt"))),
    "q_fingerprint" -> ((s, d) => t(s, d, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),
    "q_text_quality" -> ((s, d) => t(s, d, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(TextOps.punctCount(col("text"))).as("punct"),
        round(avg(TextOps.qualityScore(col("text"))), 3).as("avg_q"))),
    "q_simhash" -> ((s, d) => t(s, d, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id"), TextOps.simhash32(col("text")).as("sh"))),
    "q_ann_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      Similarity.bruteForceTopK(emb, "embedding", q, 10, "cosine", "sim")
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    "q_ann_int8" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      val coded = emb.withColumn("__q8", Similarity.quantizeInt8(col("embedding")))
      Similarity.quantizedTopK(coded, "embedding", "__q8", q, 10,
          rerank = 100, scoreCol = "sim")
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    "q_ann_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      val model = Similarity.trainPq(emb, "embedding", dim = 64, m = 8, ks = 16)
      val coded = emb.withColumn("__pq", model.encodeUdf(col("embedding")))
      Similarity.pqTopK(coded, "embedding", "__pq", model, q, 10,
          rerank = 100, scoreCol = "sim")
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    "q_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      val model = Similarity.trainIvf(emb, "embedding", 8)
      val indexed = emb.withColumn("__ivf_cluster", model.assignExpr(col("embedding")))
      Similarity.ivfTopK(indexed, model, "embedding", "__ivf_cluster", q, 10,
        nprobe = 8, metric = "cosine", scoreCol = "sim") // nprobe = all → exact
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // BATCHED ANN ("vector lateral"): every query row gets its own top-k,
    // one corpus pass, per-partition bounded heaps, window merge
    "q_ann_batch" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val qs = emb.filter(col("vec_id").isin(1L, 2L, 3L))
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
      Similarity.batchTopK(emb, "vec_id", "embedding", qs, 5)
        .select(col("qid"), col("vec_id"), round(col("__score"), 4).as("sim"))
    }),
    // SQL LATERAL spelling of the batched per-row ANN: the correlated
    // graft_vector_search collapses into ONE batched corpus pass
    // (GraftLateralSearch) — same expected rows as q_ann_batch
    "q_ann_lateral" -> ((s, d) => {
      val tbl = Fixtures.embLateral(s, d)
      t(s, d, "embeddings").filter(col("vec_id").isin(1L, 2L, 3L))
        .select("vec_id", "embedding").createOrReplaceTempView("ann_lateral_q")
      s.sql(
        s"""SELECT q.vec_id AS qid, r.vec_id, round(r.score, 4) AS sim
           |FROM ann_lateral_q q,
           |LATERAL (SELECT * FROM graft_vector_search('${tbl.location}',
           |         'embedding', q.embedding, 5)) r""".stripMargin)
    }),
    "q_semantic_dedup" -> ((s, d) => {
      // SemDeDup: planted exact duplicates (id+1e6) collapse to their
      // min-id representative; organic pairs stay below the 0.9999 bar
      // (same determinism contract as q_embed_neardup), so survivors are
      // exactly the original ids
      val emb = t(s, d, "embeddings").select("vec_id", "embedding")
      val e2 = emb.unionAll(emb.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding")))
      graft.pipeline.Dedup.semanticDedup(e2, "vec_id", "embedding",
        k = 8, threshold = 0.9999).select("vec_id")
    }),
    "q_embed_neardup" -> ((s, d) => {
      val emb = t(s, d, "embeddings").select("vec_id", "label", "embedding")
      val e2 = emb.unionAll(emb.select((col("vec_id") + 1000000L).as("vec_id"),
        col("label"), col("embedding")))
      Similarity.nearDupPairs(e2, "vec_id", "embedding", 64,
        threshold = 0.9999, blockCols = Seq("label"))
        .select(col("v1"), col("v2"))
    }),
    "q_point_lookup" -> ((s, d) => Lookup(Fixtures.ordersPk(s, d),
      Map("o_orderkey" -> 100L))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))),
    // bucketed append: IN on the bucket-key plans only those buckets' files
    "q_bucket_append" -> ((s, d) => Fixtures.ordersBapp(s, d)
      .read(filter = Some(col("o_custkey").isin(7L, 11L, 23L)))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))),
    "q_system_consumers" -> ((s, d) => {
      val tbl = Fixtures.ordersPk(s, d)
      Consumers.reset(tbl, "sysc", Some(2L))
      tbl.systemTable("consumers").filter(col("consumer_id") === "sysc")
    }),
    "q_lookup_join" -> ((s, d) => {
      // stream-static lookup join: a consumer micro-batch (the stream side)
      // enriched against a broadcast dimension (paimon lookup join §2.3)
      val tbl = Fixtures.ordersPk(s, d)
      Consumers.reset(tbl, "lkj", Some(2L))
      val (_, batch) = Consumers.nextBatch(tbl, "lkj").get
      batch.join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    }),
    "q_consumer_stream" -> ((s, d) => {
      val tbl = Fixtures.ordersPk(s, d)
      Consumers.reset(tbl, "qcons", Some(1L))
      val (end, batch) = Consumers.nextBatch(tbl, "qcons").get
      Consumers.commit(tbl, "qcons", end)
      statusAgg(batch)
    }),
    "q_fulltext_bm25" -> ((s, d) => {
      // PERSISTED index: the query reads only the terms' file ranges
      val idx = Fixtures.ftIndex(s, d)
      // rank/cut on the ROUNDED score so the top-k boundary is stable
      graft.pipeline.Indexes.fullTextSearch(s, idx.location,
        Seq("table", "scan", "fast", "merge"), 1000000)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }),
    "q_ann_ivf_indexed" -> ((s, d) => {
      val idx = Fixtures.ivfIndex(s, d)
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.Indexes.ivfSearch(s, idx.location, "embedding", q, 10,
        nprobe = 8, scoreCol = "sim") // nprobe = all clusters → exact
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // FILTERED plain persisted-index search: the filter pushes into the
    // probed scan and rides the shared escalation ladder
    // (Indexes.escalateNprobe) — nprobe=1 with an unreachable oversample
    // target escalates 1→4→8 (exact), so the row exercises the ladder AND
    // stays deterministic for the oracle; recall at realistic factors is
    // swept by AnnRecallSpec's filtered plain-index grid
    "q_ann_ivf_filtered" -> ((s, d) => {
      val idx = Fixtures.ivfIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.Indexes.ivfSearch(s, idx.location, "embedding", q, 10,
        nprobe = 1, scoreCol = "sim", filter = Some(col("label") === 3),
        escalateFactor = 1000000)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // SQL TVF spellings of the persisted index searches — a plain-SQL user
    // reaches them without the Scala API
    "q_fulltext_tvf" -> ((s, d) => {
      val idx = Fixtures.ftIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${idx.location}',
           |  'table scan fast merge', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // filtered vector search through the TVF: the filterSql masks
    // candidates INSIDE the search (pushed scan filter + recall ladder) —
    // nprobe = all clusters at oracle SF so the row stays deterministic
    "q_vector_tvf_filtered" -> ((s, d) => {
      val idx = Fixtures.ivfIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${idx.location}', 10, 8, $arr,
           |  'label = 3')""".stripMargin)
    }),
    "q_vector_tvf" -> ((s, d) => {
      val idx = Fixtures.ivfIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${idx.location}', 10, 8, $arr)""".stripMargin)
    }),
    // IVF-RQ persisted index (reference ivf-rq family): unit-space cluster
    // partitions + m-byte residual codes; search = partition-pruned probe,
    // ADC over the code bytes, exact re-rank. Index built on 90% + an
    // incremental append of the rest (the oracle row covers both paths).
    "q_ann_ivf_rq" -> ((s, d) => {
      val idx = Fixtures.ivfRqIndex(s, d)
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      // nprobe = all clusters and rerank ≥ corpus size: at oracle SF the
      // exact re-rank covers every row, so the row checks the PIPELINE
      // (assign/encode/ADC/re-rank plumbing) exactly; recall of the
      // restricted-probe path is quantified by AnnRecallSpec's sweep on
      // the 50k clustered corpus (synthetic sf0.01 embeddings are
      // near-uniform — no quantizer ranks those well)
      graft.pipeline.Indexes.rqSearch(s, idx.location, "embedding", q, 10,
        nprobe = 8, rerank = 1000, scoreCol = "sim")
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // Per-query search options through the TVF (reference
    // vector.mdx:284-297): ivf.refine_factor sizes the exact re-rank
    // window (k × factor) on the compressed RQ route, ivf.nprobe sets the
    // probe — here factor 100 re-ranks 1000 ≥ corpus candidates, so the
    // row is exact against the brute-force oracle; the recall UPLIFT of
    // factor 4 vs factor 1 on a clustered corpus is asserted in
    // AnnRecallSpec. Also exercises the reference's argument shape
    // (table, 'column', queryVec, k[, options]) end-to-end.
    "q_ann_refine" -> ((s, d) => {
      val idx = Fixtures.ivfRqIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${idx.location}', 'embedding', $arr, 10,
           |  'ivf.nprobe=8;ivf.refine_factor=100')""".stripMargin)
    }),
    // The reference's TVF argument shape (vector.mdx:306,
    // PaimonTableValuedFunctions.scala:473 — table, column, query_vector,
    // limit[, options]) with the MAP options form: must return the same
    // rows as q_vector_tvf's positional spelling. ivf.nprobe=8 probes all
    // clusters so the row is exact against the brute-force oracle (the
    // options-less AUTOMATIC width is √nClusters — asserted in
    // AnnRecallSpec, where partial-probe recall is quantifiable).
    "q_vector_tvf_ref" -> ((s, d) => {
      val idx = Fixtures.ivfIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${idx.location}', 'embedding', $arr,
           |  10, map('ivf.nprobe', '8'))""".stripMargin)
    }),
    "q_hybrid_search" -> ((s, d) => {
      val ft = graft.pipeline.FullText
      val idx = Fixtures.ftIndex(s, d)
      val textR = ft.ranked(
        graft.pipeline.Indexes.fullTextSearch(s, idx.location,
          Seq("table", "scan", "fast", "merge"), 1000000)
          .select(col("doc_id"), round(col("score"), 4).as("score")),
        "doc_id", "score")
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      val vecR = ft.ranked(
        Similarity.bruteForceTopK(emb, "embedding", q, 1000000, "cosine", "sim")
          .select(col("vec_id").as("doc_id"), round(col("sim"), 4).as("sim")),
        "doc_id", "sim")
      ft.rrfFuse(textR, vecR, "doc_id")
        .orderBy(col("rrf").desc, col("id")).limit(10)
        .select(col("id"), round(col("rrf"), 6).as("rrf"))
    }),
    // ES-INDEX (§2.11): ONE composite index — primary vector + companion
    // keyword/scalar columns + BM25 text — queried under a filter that masks
    // candidates on every modality. Filtered ANN: nprobe partition pruning +
    // stats/bloom file skipping on companions + in-scan residual filter.
    "q_es_filtered_ann" -> ((s, d) => {
      val idx = Fixtures.esEmbIndex(s, d)
      val emb = t(s, d, "embeddings")
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        vector = Some(q), filter = Some(col("label") === 3),
        nprobe = 8) // nprobe = all clusters → exact
        .select(col("vec_id"), round(col("score"), 4).as("sim"))
    }),
    // Filtered BM25: filter masks candidates; corpus stats stay whole-index
    // (ES filter semantics — a filtered query scores like an unfiltered one)
    "q_es_filtered_text" -> ((s, d) => {
      val idx = Fixtures.esDocsIndex(s, d)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        terms = Seq("table", "scan", "fast", "merge"),
        filter = Some(col("lang") === "en"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),
    // the SQL spelling of the same search (graft_es_search TVF): a plain-SQL
    // user reaches the composite index without the Scala API
    "q_es_tvf" -> ((s, d) => {
      val idx = Fixtures.esDocsIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_es_search('${idx.location}', 10,
           |  'table scan fast merge', NULL, 8, "lang = 'en'")""".stripMargin)
    }),
    // Same filtered BM25 PAST the broadcast gate (broadcastDfLimit=1): the
    // candidates↔scores join carries no hint and AQE plans it — the gated
    // route must be value-identical to the broadcast route
    "q_es_gated_text" -> ((s, d) => {
      val idx = Fixtures.esDocsIndex(s, d)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        terms = Seq("table", "scan", "fast", "merge"),
        filter = Some(col("lang") === "en"), broadcastDfLimit = 1L)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),
    // HYBRID through ONE composite index: vector AND terms AND filter fused
    // by RRF inside EsIndex.search (vector route exact at nprobe=all; text
    // route whole-index BM25 masked by the filter; both k-truncated rankings
    // fused as Σ 1/(60+rank))
    "q_es_hybrid" -> ((s, d) => {
      val idx = Fixtures.esHybridIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        vector = Some(q), terms = Seq("table", "scan", "fast", "merge"),
        filter = Some(col("lang") === "en"), nprobe = 8) // nprobe = all → exact
        .select(col("doc_id"), round(col("score"), 6).as("rrf"))
    }),
    // same hybrid query through the MRR ranker: score = Σ 1/rank over the
    // two k-truncated rankings (exact rank arithmetic — engine-independent)
    "q_es_hybrid_mrr" -> ((s, d) => {
      val idx = Fixtures.esHybridIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        vector = Some(q), terms = Seq("table", "scan", "fast", "merge"),
        filter = Some(col("lang") === "en"), nprobe = 8, ranker = "mrr")
        .select(col("doc_id"), round(col("score"), 6).as("mrr"))
    }),
    // the same hybrid-MRR query through the TVF's optional ranker arg —
    // the SQL spelling of a non-default ranker
    "q_es_tvf_hybrid" -> ((s, d) => {
      val idx = Fixtures.esHybridIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT doc_id, round(score, 6) AS mrr
           |FROM graft_es_search('${idx.location}', 10,
           |  'table scan fast merge', $arr, 8, "lang = 'en'", 'mrr')""".stripMargin)
    }),
    // weighted_score ranker: each side's k-truncated scores min-max
    // normalized to [0,1], fused 0.5·s1 + 0.5·s2
    "q_es_hybrid_weighted" -> ((s, d) => {
      val idx = Fixtures.esHybridIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.EsIndex.search(s, idx.location, k = 10,
        vector = Some(q), terms = Seq("table", "scan", "fast", "merge"),
        filter = Some(col("lang") === "en"), nprobe = 8,
        ranker = "weighted_score")
        .select(col("doc_id"), round(col("score"), 4).as("fused"))
    }),
    // FILE-ALIGNED PK SEARCH (§2.11): snapshot-consistent, DV-aware search
    // over primary-key tables. The vector route serves unchanged keys from a
    // snapshot-aligned IVF index and reconciles keys touched since (an
    // upsert wave + a DV delete) from the changelog — no rebuild.
    "q_pk_vector_search" -> ((s, d) => {
      val tbl = Fixtures.embedPk(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      graft.pipeline.PkSearch.vectorSearch(tbl, Fixtures.embedPkIdxLoc(d),
        "embedding", q, 10, nprobe = 8, scoreCol = "sim") // nprobe = all → exact
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),
    // full-text route: BM25 over the MERGED current snapshot (updated docs
    // score with their new text/length; DV-deleted docs never match)
    "q_pk_fulltext" -> ((s, d) => {
      val tbl = Fixtures.docsPk(s, d)
      graft.pipeline.PkSearch.fullTextSearch(tbl, "doc_id", "text",
        Seq("table", "scan", "fast", "merge"), 1000000)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }),
    // SQL/TVF spelling of the FILE-ALIGNED PK searches: the TVF takes the
    // TABLE path (not the index path) and routes through PkSearch via the
    // back-reference sidecars — snapshot-consistent and DV-aware exactly
    // like the Scala API rows above
    "q_pk_search_tvf" -> ((s, d) => {
      val tbl = Fixtures.embedPk(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr)""".stripMargin)
    }),
    "q_pk_fulltext_tvf" -> ((s, d) => {
      val tbl = Fixtures.docsPk(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${tbl.location}',
           |  'table scan fast merge', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // FULL SQL INDEX LIFECYCLE (reference CALL sys.create_global_index with
    // index_type ivf / full-text): the fixture creates the index on 90% of
    // the corpus via CALL, appends the rest, CALL-refreshes (delta-only
    // maintenance), and the search TVF routes the TABLE path — one row
    // oracle-gates create + refresh + route end-to-end
    "q_call_index_fulltext" -> ((s, d) => {
      val tbl = Fixtures.lcDocs(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${tbl.location}',
           |  'table scan fast merge', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // search-mode=full (reference full-text.mdx:285): the index holds 90%
    // of the corpus and the appended 10% is UNREFRESHED — the query
    // tokenizes the delta at query time and scores under merged corpus
    // statistics, so the answer equals full-corpus BM25
    "q_fulltext_mode_full" -> ((s, d) => {
      val tbl = Fixtures.lcDocsModeFull(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${tbl.location}',
           |  'table scan fast merge', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    "q_call_index_es" -> ((s, d) => {
      val tbl = Fixtures.lcEsDocs(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_es_search('${tbl.location}', 10,
           |  'table scan fast merge', NULL, 8, "lang = 'en'")""".stripMargin)
    }),
    "q_call_index_vector" -> ((s, d) => {
      val tbl = Fixtures.lcEmb(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr)""".stripMargin)
    }),
    // vector-index.search-mode=full (reference global-index.mdx:314): the
    // index holds 90% and the appended 10% is UNREFRESHED — the search
    // brute-forces the delta and merges it with the index candidates, so
    // with nprobe=all the answer equals full-corpus exact search
    "q_vector_mode_full" -> ((s, d) => {
      val tbl = Fixtures.lcEmbModeFull(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr)""".stripMargin)
    }),
    // CALL-managed COMPRESSED index (reference index_type => 'ivf-rq',
    // vector.mdx:58): created with <index-type>.* options, delta-refreshed
    // (assign + residual-encode only the appended rows), routed through the
    // TABLE path's back-reference; refine_factor 100 re-ranks ≥ corpus
    // candidates so the row is exact against the brute-force oracle
    "q_call_index_rq" -> ((s, d) => {
      val tbl = Fixtures.lcEmbRq(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 'embedding', $arr, 10,
           |  'ivf.nprobe=8;ivf.refine_factor=100')""".stripMargin)
    }),
    // compaction-coordination system tables (reference CompactBucketsTable /
    // FileMonitorTable): per-commit file changes and per-bucket current file
    // lists over a deterministic two-bucket PK fixture (base, update wave,
    // compact) — counts are layout-deterministic, so the oracle is literal
    "q_file_monitor" -> ((s, d) => {
      val tbl = Fixtures.fileMonitorTbl(s, d)
      tbl.systemTable("file_monitor")
        .select(col("_SNAPSHOT_ID").as("snapshot_id"),
          col("_BUCKET").as("bucket"),
          size(col("_BEFORE_FILES")).as("removed"),
          size(col("_DATA_FILES")).as("added"))
    }),
    "q_compact_buckets" -> ((s, d) => {
      val tbl = Fixtures.fileMonitorTbl(s, d)
      tbl.systemTable("compact_buckets")
        .select(col("_SNAPSHOT_ID").as("snapshot_id"),
          col("_BUCKET").as("bucket"), size(col("_FILES")).as("files"),
          col("_TABLE_NAME").as("table_name"))
    }),
    // reference-dialect TIME(3) + MULTISET round-trip through a graft table
    // (core/reftypes.scala mappings, oracle-gated end-to-end): the multiset
    // explodes to (element, multiplicity) rows so DuckDB can hash-compare
    "q_reftypes" -> ((s, d) => {
      val tbl = Fixtures.refTypesTbl(s, d)
      tbl.read().select(col("user_id"), col("first_t"),
        explode(col("kinds")).as(Seq("kind", "mult")))
    }),
    // VECTOR<FLOAT, 64> declared in the reference dialect: the DDL alone
    // arms the write-time dimension enforcement (impliedOptions →
    // fields.emb.dimension) and the data round-trips through the table —
    // size + boundary elements are exact value checks (no float
    // accumulation)
    "q_vector_ddl" -> ((s, d) => {
      val tbl = Fixtures.vectorDdlTbl(s, d)
      tbl.read().select(col("vec_id"), size(col("emb")).as("dim"),
          round(element_at(col("emb"), 1).cast("double"), 4).as("e_first"),
          round(element_at(col("emb"), 64).cast("double"), 4).as("e_last"))
        .orderBy("vec_id").limit(25)
    }),
    // __VECTOR_FIELD;64 comment directive (vector.mdx "Create Table"): the
    // SQL comment alone declares the vector column — dimension enforced,
    // vector-field option registered, directive stripped from the comment
    "q_vector_directive" -> ((s, d) => {
      val tbl = Fixtures.sqlVectorDirective(s, d)
      s.sql(s"""SELECT vec_id, size(embedding) AS dim,
                round(CAST(element_at(embedding, 1) AS DOUBLE), 4) AS e_first,
                round(CAST(element_at(embedding, 64) AS DOUBLE), 4) AS e_last
                FROM $tbl ORDER BY vec_id LIMIT 25""")
    }),
    // FULL-TEXT QUERY DSL (reference full-text.mdx "Query DSL"): match with
    // operator=And, fuzziness expansion over the term dictionary, boolean
    // must/should/must_not composition, and match_phrase over a
    // with-position index — all served from the persisted postings index
    // through the same TVF (a JSON query routes through the DSL)
    "q_fulltext_and" -> ((s, d) => {
      val ftI = Fixtures.ftIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${ftI.location}',
           |  '{"match":{"query":"table scan","operator":"And"}}', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // the same AND query via PER-QUERY OPTIONS (map form, '' column
    // placeholder): options compile a plain-text query into the DSL match,
    // so this must score byte-identically to q_fulltext_and
    "q_fulltext_opts" -> ((s, d) => {
      val ftI = Fixtures.ftIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${ftI.location}',
           |  'table scan', 1000000, '', map('operator', 'And'))
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    "q_fulltext_bool" -> ((s, d) => {
      val ftI = Fixtures.ftIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${ftI.location}',
           |  '{"boolean":{"must":[{"match":{"query":"table"}}],
           |    "should":[{"match":{"query":"merge"}}],
           |    "must_not":[{"match":{"query":"fast"}}]}}', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    "q_fulltext_fuzzy" -> ((s, d) => {
      val ftI = Fixtures.ftIndex(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${ftI.location}',
           |  '{"match":{"query":"scann","fuzziness":1}}', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    "q_fulltext_multi" -> ((s, d) => {
      val tbl = Fixtures.lcDocsMulti(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${tbl.location}',
           |  '{"multi_match":{"query":"table scan",
           |    "columns":["title","body"],"boosts":[2.0,1.0]}}', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    "q_fulltext_phrase" -> ((s, d) => {
      val ftI = Fixtures.ftIndexPos(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${ftI.location}',
           |  '{"match_phrase":{"query":"table scan"}}', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // NGRAM tokenizer (full-text.tokenizer=ngram): the index grams each
    // document, the TVF grams the query — substring-like search; the spec
    // persisted with the index drives BOTH (delta refresh included)
    "q_fulltext_ngram" -> ((s, d) => {
      val tbl = Fixtures.lcDocsNgram(s, d)
      s.sql(
        s"""SELECT doc_id, round(score, 4) AS score
           |FROM graft_full_text_search('${tbl.location}', 'scanner', 1000000)
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }),
    // build-time distance.metric recorded in the index meta drives the
    // TABLE-path query metric (reference vector.mdx:184,292): an l2 index
    // returns squared distances ranked ASCENDING, nprobe=all → exact
    "q_vector_tvf_l2" -> ((s, d) => {
      val tbl = Fixtures.lcEmbL2(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS dist
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr)""".stripMargin)
    }),
    // TWO CALL-managed vector indexes on ONE table (per-column
    // back-references — the reference tracks many indexes per table,
    // TableIndexesTable.java): each column created and refreshed
    // independently via index_column, and the TVF routes per column via the
    // trailing index-column argument ('' = no filter)
    "q_call_index_multi" -> ((s, d) => {
      val tbl = Fixtures.lcMultiEmb(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT 'embedding' AS route, vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr,
           |  '', 'embedding')
           |UNION ALL
           |SELECT 'emb2' AS route, vec_id, round(score, 4) AS sim
           |FROM graft_vector_search('${tbl.location}', 10, 8, $arr,
           |  '', 'emb2')""".stripMargin)
    }),
    // the reference's MULTI-ROUTE hybrid_search shape: named_struct route
    // configs with per-route limit/weight/options over a TABLE whose
    // indexes are CALL-managed (create 90% -> append -> refresh fixtures);
    // weighted mrr fusion Σ weight/rank
    "q_hybrid_routes" -> ((s, d) => {
      val tbl = Fixtures.lcHybrid(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT doc_id, round(score, 6) AS mrr
           |FROM graft_hybrid_search('${tbl.location}',
           |  array(named_struct('field', 'embedding', 'query_vector', $arr,
           |    'limit', 10, 'weight', CAST(2.0 AS DOUBLE),
           |    'options', map('ivf.nprobe', '8'))),
           |  array(named_struct('column', 'text',
           |    'query', '{"match":{"query":"table scan fast merge"}}',
           |    'limit', 10, 'weight', CAST(1.0 AS DOUBLE))),
           |  10, 'mrr')
           |ORDER BY mrr DESC, doc_id""".stripMargin)
    }),
    // SQL spelling of SEPARATE-INDEX hybrid search (reference hybrid_search
    // TVF): fuse an existing IVF index and an existing BM25 index by RRF —
    // no composite rebuild, no Scala
    "q_hybrid_tvf" -> ((s, d) => {
      val ftI = Fixtures.ftIndex(s, d)
      val ivI = Fixtures.ivfIndex(s, d)
      val q = Fixtures.queryVec(s, d, 1)
      val arr = q.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
      s.sql(
        s"""SELECT vec_id AS id, round(score, 6) AS rrf
           |FROM graft_hybrid_search('${ivI.location}', '${ftI.location}',
           |  'vec_id', 10, $arr, 'table scan fast merge')
           |ORDER BY rrf DESC, id""".stripMargin)
    }),
    "q_dedup_minhash" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val d2 = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text")))
      graft.pipeline.Dedup.minhashLshPairs(d2, "doc_id", "text",
        shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.8)
    }),
    // near-dup pairs from the PERSISTED signature index: no text scan, no
    // signature recompute (index maintained O(delta) — see Fixtures gate);
    // must equal q_dedup_minhash's pairs exactly
    "q_dedup_minhash_idx" -> ((s, d) =>
      graft.pipeline.Dedup.minhashPairsFromIndex(
        Fixtures.minhashIndex(s, d), "doc_id", nBands = 4, threshold = 0.8)),
    "q_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val train = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text"))
      val bench = docs.filter(col("doc_id") % 10 === 0)
      graft.pipeline.Dedup.contaminationScores(train, "doc_id", "text",
        bench, "text", n = 8)
        .filter(col("score") >= 0.5)
    }),
    "q_ngram_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source", "text")
      val d2 = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        col("source"), concat(col("text"), lit(" xq yq zq")).as("text")))
      graft.pipeline.Dedup.ngramJaccardPairs(d2, "doc_id", "text", "source",
        shingleN = 3, threshold = 0.8)
    }),
    "q_variant" -> ((s, d) => {
      // VARIANT column with SHREDDED extractions: the write materializes
      // $.lang / $.text_len as typed physical columns (with stats); the
      // extraction read projects those columns and never decodes the
      // variant binary (capability: paimon VariantType + extraction
      // pushdown, SparkTypeUtils.java:260, VariantPushDownUtils.scala:36)
      val loc = s"/tmp/graft-fixtures/${d.replaceAll("[^a-zA-Z0-9.]", "_")}/variant_tbl2"
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          parse_json(to_json(struct(col("lang"), col("source"),
            length(col("text")).as("text_len")))).as("meta"))
      if (!GraftTable.exists(s, loc)) {
        val tbl = GraftTable.create(s, loc, docs.schema, TableConfig(
          options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
        tbl.write(docs)
      }
      GraftTable.load(s, loc)
        .readVariantExtracted("meta", Seq("lang", "text_len"))
        .select(col("doc_id"), col("lang"), col("text_len"))
    }),
    "q_variant_pk" -> ((s, d) => {
      // variant shredding on a PRIMARY-KEY table: extractions ride the LSM
      // envelope; the merged (deduplicate) view serves the winner's typed
      // columns without decoding the binary. Upserts double text_len for
      // doc_id % 3 = 0 — the oracle mirrors that.
      val loc = s"/tmp/graft-fixtures/${d.replaceAll("[^a-zA-Z0-9.]", "_")}/variant_pk_tbl"
      def payload(src: org.apache.spark.sql.DataFrame) = src
        .select(col("doc_id"),
          parse_json(to_json(struct(col("lang"),
            col("text_len")))).as("meta"))
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .withColumn("text_len", length(col("text")))
      if (!GraftTable.exists(s, loc)) {
        val tbl = GraftTable.create(s, loc, payload(base).schema, TableConfig(
          primaryKeys = Seq("doc_id"), numBuckets = 2,
          options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
        tbl.write(payload(base))
        tbl.write(payload(base.filter(col("doc_id") % 3 === 0)
          .withColumn("text_len", col("text_len") * 2)))
      }
      GraftTable.load(s, loc)
        .readVariantExtracted("meta", Seq("lang", "text_len"))
        .select(col("doc_id"), col("lang"), col("text_len"))
    }),
    // Transparent SQL variant_get pushdown (§2.2): a PLAIN SQL query over
    // the catalog table — no dedicated API — reads the shredded physical
    // columns via Spark 4.1's SupportsPushDownVariantExtractions; the plan
    // carries a GraftVariantScan and zero VariantGet expressions
    // (VariantSqlSpec asserts the plan shape; this row asserts the values)
    "q_variant_sql" -> ((s, d) => {
      val wh = s"/tmp/graft-fixtures/${d.replaceAll("[^a-zA-Z0-9.]", "_")}/vsql-wh"
      val loc = s"$wh/db.db/variant_sql_tbl"
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          parse_json(to_json(struct(col("lang"), col("source"),
            length(col("text")).as("text_len")))).as("meta"))
      if (!GraftTable.exists(s, loc)) {
        val tbl = GraftTable.create(s, loc, docs.schema, TableConfig(
          options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
        tbl.write(docs)
      }
      s.conf.set("spark.sql.catalog.graft_vsql", "graft.dsv2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_vsql.warehouse", wh)
      s.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
      s.sql("""SELECT doc_id, variant_get(meta, '$.lang', 'string') AS lang,
              |  variant_get(meta, '$.text_len', 'int') AS text_len
              |FROM graft_vsql.db.variant_sql_tbl""".stripMargin)
    }),
    // SQL FILTER on shredded paths: the predicate reaches the scan as a
    // struct-field filter AFTER the extraction pushdown, so file skipping
    // is the GraftVariantPrune post-optimization rule's work (shred-column
    // stats); this row gates the pruned plan's ANSWERS end-to-end
    "q_variant_filter" -> ((s, d) => {
      SparkEntry.queries("q_variant_sql")(s, d) // ensure table + catalog conf
      s.sql("""SELECT doc_id, variant_get(meta, '$.text_len', 'int') AS text_len
              |FROM graft_vsql.db.variant_sql_tbl
              |WHERE variant_get(meta, '$.text_len', 'int') > 400
              |  AND variant_get(meta, '$.lang', 'string') = 'en'""".stripMargin)
    }),
    // OR-tree filter on shredded paths: a disjunction of translatable
    // comparisons weakens branch-by-branch (a∧b ⇒ a, so (a∧b)∨c ⇒ a∨c) and
    // still prunes files — the filter shape users write as OR instead of IN
    "q_variant_filter_or" -> ((s, d) => {
      SparkEntry.queries("q_variant_sql")(s, d) // ensure table + catalog conf
      s.sql("""SELECT doc_id, variant_get(meta, '$.text_len', 'int') AS text_len
              |FROM graft_vsql.db.variant_sql_tbl
              |WHERE variant_get(meta, '$.text_len', 'int') > 400
              |   OR (variant_get(meta, '$.lang', 'string') = 'de'
              |       AND variant_get(meta, '$.text_len', 'int') < 100)""".stripMargin)
    }),
    // same transparent pushdown on a PRIMARY-KEY table (merged view serves
    // the upsert winner's shred columns; doc_id % 3 = 0 doubled)
    "q_variant_sql_pk" -> ((s, d) => {
      val wh = s"/tmp/graft-fixtures/${d.replaceAll("[^a-zA-Z0-9.]", "_")}/vsql-wh"
      val loc = s"$wh/db.db/variant_sql_pk_tbl"
      def payload(src: org.apache.spark.sql.DataFrame) = src
        .select(col("doc_id"),
          parse_json(to_json(struct(col("lang"),
            col("text_len")))).as("meta"))
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .withColumn("text_len", length(col("text")))
      if (!GraftTable.exists(s, loc)) {
        val tbl = GraftTable.create(s, loc, payload(base).schema, TableConfig(
          primaryKeys = Seq("doc_id"), numBuckets = 2,
          options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
        tbl.write(payload(base))
        tbl.write(payload(base.filter(col("doc_id") % 3 === 0)
          .withColumn("text_len", col("text_len") * 2)))
      }
      s.conf.set("spark.sql.catalog.graft_vsql", "graft.dsv2.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_vsql.warehouse", wh)
      s.conf.set("spark.sql.variant.pushVariantIntoScan", "true")
      s.sql("""SELECT doc_id, variant_get(meta, '$.lang', 'string') AS lang,
              |  variant_get(meta, '$.text_len', 'int') AS text_len
              |FROM graft_vsql.db.variant_sql_pk_tbl""".stripMargin)
    }),
    "q_object_table" -> ((s, d) => {
      // object table over a deterministic file set: one file per language,
      // content = that language's docs ('\n'-terminated each); the files are
      // a Fixtures prebuild, not query work
      graft.sources.ObjectTable.scan(s, Fixtures.objectsDir(s, d), Some("*.txt"))
        .select(regexp_replace(col("name"), "\\.txt$", "").as("lang"), col("length"))
    }),
    "q_blob_roundtrip" -> ((s, d) => {
      // out-of-line blob storage: payloads → shared blob files, table keeps
      // struct(uri, offset, length); ranged read verifies the round trip
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      val blobDir = java.nio.file.Files.createTempDirectory("graft-blobs").toString
      // materialize descriptors BEFORE ranged reads: blob files must be
      // closed (write job finished) before a reader opens them. Eager
      // localCheckpoint, not cache+count: pins the descriptor rows (a lazy
      // re-execution would write a fresh blob-file set) WITHOUT leaving a
      // session-lifetime CacheManager entry per call (r14 cache hygiene)
      val withDesc = graft.pipeline.Blob.writeBlobs(docs, "blob", blobDir)
        .localCheckpoint(true)
      withDesc.select(col("doc_id"), col("blob.length").as("byte_len"),
        md5(graft.pipeline.Blob.readBlob(s)(col("blob"))).as("content_hash"))
    }),
    // table-integrated blob storage (__BLOB_FIELD directive): payloads out
    // of line in shared .bin files, descriptors inline, reads transparent
    "q_blob_table" -> ((s, d) => {
      val db = Fixtures.sqlBlobTables(s, d)
      s.sql(s"""SELECT doc_id, CAST(length(blob) AS INT) AS byte_len,
                md5(blob) AS content_hash FROM $db.docs_blob""")
    }),
    // blob views (__BLOB_VIEW_FIELD + graft_blob_view): refs into the
    // upstream table's row ids resolve to the payload bytes at read
    "q_blob_view" -> ((s, d) => {
      val db = Fixtures.sqlBlobTables(s, d)
      s.sql(s"""SELECT doc_id, md5(ref) AS content_hash
                FROM $db.docs_blob_view""")
    }),
    // headline blob read: resolve a bench-scale blob VIEW over every
    // document — rowId join into the upstream + positioned payload reads
    // through the bounded stream cache — and digest the payload bytes
    "q_blob_bench" -> ((s, d) => Fixtures.docsBlobBench(s, d).read()
      .agg(count(lit(1)).as("cnt"),
        sum(length(col("ref"))).cast("long").as("bytes"),
        countDistinct(md5(col("ref"))).as("hashes"))),
    // collection blob storage (ARRAY<BLOB>): per-element descriptors in
    // shared packs; read reassembles the chunks to the original payload
    "q_blob_collection" -> ((s, d) => {
      val db = Fixtures.sqlBlobTables(s, d)
      s.sql(s"""SELECT doc_id, size(chunks) AS n_chunks,
                md5(aggregate(chunks, CAST('' AS BINARY),
                              (acc, x) -> concat(acc, x))) AS content_hash
                FROM $db.docs_blob_arr""")
    }),
    "q_multimodal_blob" -> ((s, d) => {
      // BLOB column plumbing: text → opaque binary + typed metadata; the
      // "decode" is a deterministic stand-in (real image/audio codecs are
      // out of scope in this container) — schema & distribution are real.
      t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .select(col("doc_id"), length(col("blob")).as("byte_len"),
          md5(col("blob")).as("content_hash"))
    }),
    "q_frame_sample" -> ((s, d) => {
      // frame-sampling fan-out (video stand-in): one row per fixed-stride
      // slice — pure codegen (sequence/transform/substr), no UDF
      t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          explode(graft.pipeline.Blob.sampleFrames(col("blob"), 256, 64)).as("f"))
        .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
          length(col("f.frame")).cast("int").as("frame_len"))
    }),
    // PII redaction: emails/phones/IPv4 scrubbed with RE2-compatible regexes
    // (synthetic PII is appended deterministically — the raw corpus has
    // none — so the redaction logic is actually exercised and oracle-gated)
    "q_pii_redact" -> ((s, d) => t(s, d, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), piiAugment.as("aug"))
      .select(col("doc_id"), TextOps.piiCounts(col("aug")).as("__p"),
        md5(TextOps.redactPii(col("aug"))).as("red_fp"))
      .select(col("doc_id"), col("__p.n_email").as("n_email"),
        col("__p.n_phone").as("n_phone"), col("__p.n_ipv4").as("n_ipv4"),
        col("red_fp"))),
    // URL/domain filtering: host extraction + registered-domain heuristic +
    // blocklist drop — the standard source-level corpus filter
    "q_url_filter" -> ((s, d) => {
      val host = TextOps.extractDomain(urlSynth)
      t(s, d, "documents")
        .select(TextOps.registeredDomain(host).as("reg_domain"))
        .filter(col("reg_domain") =!= "example.com")
        .groupBy("reg_domain").agg(count(lit(1)).as("cnt"))
    }),
    // deterministic hash-based train/val/test split (leakage-free: assignment
    // is a pure function of the document key, not of partitioning/order)
    "q_hash_split" -> ((s, d) => t(s, d, "documents")
      .groupBy(TextOps.splitAssign(col("doc_id"), 90, 5).as("split"))
      .agg(count(lit(1)).as("cnt"), sum("n_chars").as("chars"))),
    // stratified exact-quota sampling: per-language quotas filled by the
    // smallest portable hashes (deterministic "random"); candidate pre-filter
    // keeps the per-stratum window O(quota)
    "q_stratified_sample" -> ((s, d) => CorpusOps.stratifiedQuota(
        t(s, d, "documents"), "lang", col("doc_id"),
        Map("en" -> 100L, "zh" -> 40L, "de" -> 1000L, "fr" -> 10L), seed = 7)
      .groupBy("lang").agg(count(lit(1)).as("cnt"),
        sum("doc_id").as("id_sum"))),
    // weighted source mixing: repeat docs per-source weight (integer part =
    // full epochs, fraction = hash-sampled extra epoch); the manifest rows
    // interleave epochs via the spanning shuffle key
    "q_corpus_mix" -> ((s, d) => CorpusOps.mixSources(
        t(s, d, "documents"), col("source"), col("doc_id"),
        Map("src0" -> 2.25, "src1" -> 0.5, "src2" -> 3.0), seed = 11)
      .groupBy("source").agg(count(lit(1)).as("n_rows"),
        max("__epoch").cast("long").as("max_epoch"))),
    // token-budget shard packing: cut a shard every 200k chars of the
    // canonical shuffle order — distributed two-phase running sum equals
    // the serial definition exactly
    "q_token_pack" -> ((s, d) => CorpusOps.packShards(
        t(s, d, "documents"), col("doc_id"), col("n_chars"), 20000L, seed = 3)
      .groupBy("__shard").agg(count(lit(1)).as("docs"),
        sum("n_chars").as("chars"))
      .withColumnRenamed("__shard", "shard")),
    // sliding-window chunking: 64-token windows, 16-token overlap; chunk
    // fingerprints make the (doc, chunk) rows order-insensitive
    "q_chunk_docs" -> ((s, d) => CorpusOps.chunkDocs(
        t(s, d, "documents").select("doc_id", "text"), "text", 64, 16)
      .select(col("doc_id"), col("__chunk").as("chunk"),
        col("__n_tok").cast("long").as("n_tok"),
        md5(col("__chunk_text")).as("fp"))),
    // deterministic k-means assignment: hash-drawn centroids broadcast as
    // literals, map-side argmax — the distributed half of Lloyd's
    "q_kmeans_assign" -> ((s, d) => Similarity.kmeansAssign(
        t(s, d, "embeddings").select("vec_id", "embedding"),
        "vec_id", "embedding", k = 8, seed = 5)
      .groupBy(col("__cluster").as("cluster"))
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"),
        sum(floor(col("__sim") * 1000000L).cast("long")).as("sim_micro"))),
    // gap-based sessionization (30 min), exact integer rollups
    // event analytics over the user_id-BUCKETED events table: the per-user
    // windows (and the per-(user, session) rollup above them) satisfy
    // clustering from storage — zero exchange until the final tiny rollup
    "q_sessionize" -> ((s, d) => graft.pipeline.Events.sessionStats(
        s.table(Fixtures.eventsBucketedSql(s, d)), col("user_id"), col("ts"),
        1800000L, col("event_id"), col("value"))),
    // cohort day-offset retention
    "q_retention" -> ((s, d) => graft.pipeline.Events.retention(
        s.table(Fixtures.eventsBucketedSql(s, d)), col("user_id"), col("ts"))),
    // ordered funnel view → click → purchase (min-over-filtered recurrence)
    "q_funnel" -> ((s, d) => graft.pipeline.Events.funnel(
        s.table(Fixtures.eventsBucketedSql(s, d)), col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .groupBy(col("depth")).agg(count(lit(1)).as("users"))),
    // incremental dedup: batch 2 admitted against the persisted fingerprint
    // state of batch 1 (anti-join membership probe, keep-first within batch)
    "q_incr_dedup" -> ((s, d) => Fixtures.incrDedup(s, d).read()
      .select("doc_id", "lang")),
    // REST catalog: nation written through the bear-token REST catalog
    // service (metadata over HTTP, data path direct) and read back via SQL
    "q_rest_catalog" -> ((s, d) => {
      val tbl = Fixtures.restNation(s, d)
      s.sql(s"SELECT n_regionkey, count(*) AS nations, min(n_name) AS first_name " +
        s"FROM $tbl GROUP BY n_regionkey")
    }),
    // CDC ingestion: debezium-JSON insert/update/delete batches replayed via
    // Cdc.syncTable/ingest — updates add a `src` column (schema evolution),
    // deletes tombstone, kinds ride rowkind.field
    "q_cdc_ingest" -> ((s, d) => Fixtures.cdcOrders(s, d).read()
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "src", "_cdc_kind")),
    // Gopher document-quality rules (Rae et al. 2021 A1.1), integer-exact
    "q_gopher_quality" -> ((s, d) => t(s, d, "documents")
      .select(col("lang"), TextOps.gopherSignals(col("text")).as("__g"))
      .groupBy("lang").agg(count(lit(1)).as("docs"),
        sum(when(TextOps.gopherPass(col("__g"), 20, 100000), 1L)
          .otherwise(0L)).as("n_pass"),
        sum(col("__g.alpha_words")).as("alpha_words"),
        sum(col("__g.stop_hits")).as("stop_hits"))),
    // Gopher repetition signals: fraction of chars in the top bigram / in
    // duplicated bigrams (explode + two-level groupBy, no all-pairs)
    "q_ngram_repetition" -> ((s, d) =>
      graft.pipeline.Dedup.ngramRepetition(
        t(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text", 2)),
    // global paragraph-level exact dedup: keep first occurrence corpus-wide
    // (synthetic repeated footers exercise the cross-doc duplicate path)
    "q_para_dedup" -> ((s, d) =>
      graft.pipeline.Dedup.dedupParagraphs(
        t(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit("\nshared footer "),
            pmod(col("doc_id"), lit(5L)).cast("string")).as("text")),
        "doc_id", "text"))
  )

  /** Synthetic PII appended to each document (both engines build the same
    * string, so the redaction regexes are genuinely exercised). */
  private def piiAugment: Column = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@mail-"), col("source"), lit(".com"),
    lit(" call 415-555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
    lit(" from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
    lit("."), pmod(col("doc_id") * 7, lit(256L)).cast("string"))

  // RE2-compatible PII regexes, shared verbatim with the oracle SQL
  private val emailRe = TextOps.emailPattern
  private val phoneRe = TextOps.phonePattern
  private val ipv4Re = TextOps.ipv4Pattern

  private val piiAugmentSql =
    """text || ' contact user' || doc_id || '@mail-' || source || '.com' ||
      | ' call 415-555-' || lpad((doc_id%10000)::VARCHAR, 4, '0') ||
      | ' from 10.0.' || (doc_id%256) || '.' || ((doc_id*7)%256)""".stripMargin

  /** Synthetic per-doc URL with three host shapes (sub.example.com,
    * bare cdn-*.net, www.*.org) so domain extraction has real work. */
  private def urlSynth: Column =
    when(pmod(col("doc_id"), lit(3L)) === 0,
      concat(lit("https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id").cast("string")))
      .when(pmod(col("doc_id"), lit(3L)) === 1,
        concat(lit("http://cdn-"), col("source"), lit(".net/a/"),
          col("doc_id").cast("string")))
      .otherwise(concat(lit("https://www."), col("source"), lit(".org/p?id="),
        col("doc_id").cast("string")))

  private val urlSynthSql =
    """CASE WHEN doc_id%3=0 THEN 'https://'||source||'.example.com/doc/'||doc_id
      | WHEN doc_id%3=1 THEN 'http://cdn-'||source||'.net/a/'||doc_id
      | ELSE 'https://www.'||source||'.org/p?id='||doc_id END""".stripMargin

  // shared shingle CTEs for the dedup oracles (mirror TextOps.words/shingles
  // + the " xq yq zq" near-duplicate construction, word 3-grams)
  private val dedupDocsCte =
    """d2 AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, source, text || ' xq yq zq' FROM documents),
      |words AS (
      |  SELECT doc_id, source,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), w -> length(w)>0) AS ws
      |  FROM d2),
      |sh AS (
      |  SELECT doc_id, source,
      |    [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)] AS shingles
      |  FROM words WHERE len(ws) >= 3)""".stripMargin

  // per-seed affine minhash constants — MUST match TextOps.mhA/mhB
  private val minhashSeedExprs = (0 until 8).map { j =>
    s"list_min(list_transform(hs, h -> (${TextOps.mhA(j)}::UBIGINT * h + ${TextOps.mhB(j)}::UBIGINT) % 4294967296::UBIGINT))"
  }.mkString("[", ",\n       ", "]")

  private val minhashOracle =
    s"""WITH $dedupDocsCte,
       |hv AS (
       |  SELECT doc_id, shingles,
       |    list_transform(shingles, s -> ('0x'||substr(md5(s),1,8))::UBIGINT) AS hs
       |  FROM sh WHERE len(shingles) > 0),
       |sig AS (
       |  SELECT doc_id, shingles, $minhashSeedExprs AS sg
       |  FROM hv),
       |banded AS (
       |  SELECT doc_id, shingles, b,
       |    md5(b::VARCHAR || '_' || array_to_string(sg[b*2+1:b*2+2], ',')) AS bk
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS v1, b.doc_id AS v2
       |  FROM banded a JOIN banded b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT v1, v2,
       |    len(list_intersect(list_distinct(h1.hs), list_distinct(h2.hs))) * 1.0 /
       |    len(list_distinct(h1.hs || h2.hs)) AS jac
       |  FROM cand JOIN hv h1 ON h1.doc_id = v1 JOIN hv h2 ON h2.doc_id = v2)
       |SELECT v1, v2, round(jac, 4) AS jac FROM pairs WHERE jac >= 0.8""".stripMargin

  /** Mirrors Dedup.contaminationScores: train = suffixed copies, benchmark =
    * every 10th original; same 8-gram md5-prefix hashing on both sides. */
  private val decontaminateOracle =
    """WITH train AS (
      |  SELECT doc_id + 1000000 AS doc_id, text || ' xq yq zq' AS text FROM documents),
      |twords AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), w -> length(w)>0) AS ws
      |  FROM train),
      |tg AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [('0x'||substr(md5(array_to_string(ws[i:i+7], ' ')),1,8))::UBIGINT
      |     for i in range(1, len(ws)-6)])) AS g
      |  FROM twords WHERE len(ws) >= 8),
      |bwords AS (
      |  SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), w -> length(w)>0) AS ws
      |  FROM documents WHERE doc_id % 10 = 0),
      |bgrams AS (
      |  SELECT DISTINCT unnest(
      |    [('0x'||substr(md5(array_to_string(ws[i:i+7], ' ')),1,8))::UBIGINT
      |     for i in range(1, len(ws)-6)]) AS g
      |  FROM bwords WHERE len(ws) >= 8),
      |scored AS (
      |  SELECT doc_id, count(*) AS total,
      |    sum(CASE WHEN g IN (SELECT g FROM bgrams) THEN 1 ELSE 0 END) AS hits
      |  FROM tg GROUP BY doc_id)
      |SELECT doc_id, CAST(hits AS BIGINT) AS hits, total,
      |  round(hits * 1.0 / total, 4) AS score
      |FROM scored WHERE round(hits * 1.0 / total, 4) >= 0.5""".stripMargin

  private val ngramJaccardOracle =
    s"""WITH $dedupDocsCte,
       |pairs AS (
       |  SELECT a.doc_id AS v1, b.doc_id AS v2,
       |    len(list_intersect(list_distinct(a.shingles), list_distinct(b.shingles))) * 1.0 /
       |    len(list_distinct(a.shingles || b.shingles)) AS jac
       |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
       |SELECT v1, v2, round(jac, 4) AS jac FROM pairs WHERE jac >= 0.8""".stripMargin

  private val simhashOracle: String = {
    val terms = (0 until 32).map { i =>
      val p = 1L << i
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN $p ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), w -> length(w)>0) AS ws
       |  FROM documents WHERE doc_id < 50),
       |hashes AS (
       |  SELECT doc_id, list_transform(ws, w -> ('0x'||substr(md5(w),1,8))::UBIGINT) AS hs
       |  FROM words)
       |SELECT doc_id, CAST($terms AS BIGINT) AS sh FROM hashes""".stripMargin
  }

  private def bm25Cte(from: String = "documents") =
    s"""words AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)),'\\s+'), w -> length(w)>0) AS ws
      |  FROM $from),
      |postings AS (
      |  SELECT term, doc_id, doc_len, count(*) AS tf
      |  FROM (SELECT doc_id, len(ws) AS doc_len, unnest(ws) AS term FROM words)
      |  GROUP BY term, doc_id, doc_len),
      |stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl
      |          FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
      |hits AS (SELECT * FROM postings WHERE term IN ('table','scan','fast','merge')),
      |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
      |scored AS (
      |  SELECT h.doc_id,
      |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * (1.2 + 1.0) /
      |         (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.doc_len / s.avgdl)) ) AS score
      |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
      |  GROUP BY h.doc_id)""".stripMargin

  private val bm25Oracle =
    s"""WITH ${bm25Cte()}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin

  private val hybridOracle =
    s"""WITH ${bm25Cte()},
       |txt AS (SELECT doc_id AS id,
       |  row_number() OVER (ORDER BY round(score,4) DESC, doc_id) AS r FROM scored),
       |vec AS (SELECT vec_id AS id,
       |  row_number() OVER (ORDER BY round(sim,4) DESC, vec_id) AS r
       |  FROM (SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[],
       |    (SELECT embedding FROM embeddings WHERE vec_id=1)::DOUBLE[]) AS sim
       |    FROM embeddings e)),
       |fused AS (
       |  SELECT COALESCE(t.id, v.id) AS id,
       |    COALESCE(1.0/(60+t.r), 0) + COALESCE(1.0/(60+v.r), 0) AS rrf
       |  FROM txt t FULL OUTER JOIN vec v ON t.id = v.id)
       |SELECT id, round(rrf, 6) AS rrf FROM fused ORDER BY round(rrf,6) DESC, id LIMIT 10""".stripMargin

  // hybrid MRR fusion through the composite es-index — shared by the Scala
  // API row (q_es_hybrid_mrr) and the TVF-with-ranker spelling
  // (q_es_tvf_hybrid): identical semantics, identical oracle
  private lazy val esHybridMrrOracle =
    s"""WITH ${bm25Cte()},
       |vecr AS (
       |  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r FROM (
       |    SELECT e.vec_id AS id, list_cosine_similarity(e.embedding::DOUBLE[],
       |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
       |    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
       |    WHERE d.lang = 'en')
       |  QUALIFY r <= 10),
       |txtr AS (
       |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM (
       |    SELECT s.doc_id AS id, s.score FROM scored s
       |    JOIN documents d ON d.doc_id = s.doc_id WHERE d.lang = 'en')
       |  QUALIFY r <= 10),
       |fused AS (
       |  SELECT COALESCE(v.id, t.id) AS doc_id,
       |    COALESCE(1.0/v.r, 0) + COALESCE(1.0/t.r, 0) AS mrr
       |  FROM vecr v FULL OUTER JOIN txtr t ON v.id = t.id)
       |SELECT doc_id, round(mrr, 6) AS mrr FROM fused
       |ORDER BY round(mrr, 6) DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = baseOracles +
    // per-query options spelling scores identically to its DSL spelling —
    // the oracle IS q_fulltext_and's (same match, operator=And)
    ("q_fulltext_opts" -> baseOracles("q_fulltext_and"))

  private lazy val baseOracles: Map[String, String] = Map(
    "q_pk_dedup" -> dedupOracle,
    "q_compact_partial" -> dedupOracle,
    "q_record_expire" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(value), 2) AS total
        |FROM events WHERE event_id % 3 <> 0 GROUP BY event_type""".stripMargin,
    "q_pk_clustering" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus""".stripMargin,
    "q_mor_read" -> dedupOracle,
    "q_ro_read" -> dedupOracle,
    "q_stats_mode" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(length(text)) AS BIGINT) AS chars
        |FROM documents WHERE lang = 'en' AND doc_id % 3 = 0""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_time_travel" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders",
    "q_tag_read" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders",
    "q_incremental" ->
      """SELECT o_orderkey, round(o_totalprice * 2, 2) AS price, 'X-UPD' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_incremental_diff" ->
      """SELECT o_orderkey, round(o_totalprice * 2, 2) AS price, 'X-UPD' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_incremental_ts" ->
      """SELECT o_orderkey, round(o_totalprice * 2, 2) AS price, 'X-UPD' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_incremental_auto_tag" ->
      """SELECT o_orderkey, round(o_totalprice * 2, 2) AS price, 'X-UPD' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_changelog" ->
      """SELECT o_orderkey, '-U' AS _row_kind, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT o_orderkey, '+U' AS _row_kind, round(o_totalprice * 2, 2) AS price
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_changelog_fc" ->
      """SELECT '+I' AS _row_kind, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders""".stripMargin,
    "q_watermark" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_postpone" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_postpone_fixed" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_postpone_mor" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000
        |               WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_map_shred" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderpriority <> '1-URGENT'
        |GROUP BY o_orderstatus""".stripMargin,
    "q_map_shred_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_fallback_branch" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_chain_read" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'd2' ELSE 'd1' END AS day,
        |  CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice * 2, 2)
        |       ELSE round(o_totalprice, 2) END AS price
        |FROM orders""".stripMargin,
    "q_chain_stream" ->
      """SELECT o_orderkey, 'd1' AS day, round(o_totalprice, 2) AS price
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'd2' AS day, round(o_totalprice * 2, 2) AS price
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,
    "q_chain_stream_merge" ->
      """SELECT o_orderkey, 'd2' AS day,
        |  CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice * 2, 2)
        |       ELSE round(o_totalprice, 2) END AS price
        |FROM orders""".stripMargin,
    "q_data_evolution_merge" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source,
        |    CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |  FROM documents WHERE NOT (doc_id % 9 = 0)
        |  UNION ALL
        |  SELECT doc_id + 10000000, 'xx', 'merged', n_chars + 1000
        |  FROM documents WHERE doc_id % 1000 = 0
        |)""".stripMargin,
    "q_data_evolution" ->
      """SELECT doc_id, lang,
        | CASE WHEN lang = 'en' AND length(text) > 400 THEN 'curated'
        |      ELSE source END AS source,
        | CASE WHEN lang = 'en' THEN CAST(length(text) AS BIGINT)
        |      ELSE n_chars END AS n_chars
        |FROM documents""".stripMargin,
    "q_row_tracking" ->
      """SELECT CAST(1 AS BIGINT) AS commit_seq, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(count(*) AS BIGINT) AS ids FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        | CAST(count(*) AS BIGINT) FROM events WHERE event_id % 2 = 1""".stripMargin,
    "q_column_default" ->
      """SELECT 'web' AS channel, CAST(count(*) AS BIGINT) AS cnt FROM orders""",
    "q_incr_cluster" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        | AND l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin,
    "q_limit_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT * FROM lineitem LIMIT 100)""".stripMargin,
    "q_copy_into" ->
      """SELECT r_regionkey, r_name FROM region""",
    "q_audit_log" ->
      """SELECT '+I' AS rowkind,
        | CAST((SELECT count(*) FROM orders) +
        |      (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0) AS BIGINT) AS cnt""".stripMargin,
    "q_system_snapshots" ->
      """SELECT CAST(1 AS BIGINT) AS snapshot_id, 'APPEND' AS commit_kind
        |UNION ALL SELECT 2, 'APPEND' UNION ALL SELECT 3, 'COMPACT'""".stripMargin,
    "q_metrics" ->
      """SELECT 'lastScanResultedTableFiles' AS metric, 'gauge' AS type, CAST(4 AS DOUBLE) AS value
        |UNION ALL SELECT 'lastScanSkippedTableFiles', 'gauge', CAST(0 AS DOUBLE)
        |UNION ALL SELECT 'lastScannedManifests', 'gauge', CAST(3 AS DOUBLE)
        |UNION ALL SELECT 'lastScannedSnapshotId', 'gauge', CAST(3 AS DOUBLE)""".stripMargin,
    "q_branch_ff" -> dedupOracle,
    "q_dynamic_bucket" -> dedupOracle,
    "q_format_table" ->
      "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag",
    "q_file_format_orc" -> dedupOracle,
    "q_file_format_csv" -> "SELECT * FROM nation",
    "q_file_format_avro" -> dedupOracle,
    "q_file_format_text" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(length(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS BIGINT) AS chars
        |FROM documents""".stripMargin,
    "q_file_format_row" -> dedupOracle,
    "q_partial_update" ->
      """SELECT c_custkey, c_name,
        | round(c_acctbal + CASE WHEN c_custkey % 3 = 0 THEN 100 ELSE 0 END, 2) AS acctbal,
        | CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END AS c_mktsegment
        |FROM customer""".stripMargin,
    "q_pu_agg_group" ->
      """SELECT l_orderkey, CAST(2 AS BIGINT) AS g,
        | round(sum(l_quantity), 2) AS b,
        | round(sum(l_quantity) + sum(l_extendedprice), 2) AS s
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q_seq_multi" ->
      """SELECT o_orderkey, CAST(2 AS BIGINT) AS flag,
        | round(o_totalprice, 2) AS price FROM orders""".stripMargin,
    "q_pu_retract" ->
      """SELECT c_custkey,
        | CAST(CASE WHEN c_custkey % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS g,
        | CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_mktsegment END AS seg,
        | round(CASE WHEN c_custkey % 2 = 0 THEN 0 ELSE c_acctbal END, 2) AS bal
        |FROM customer""".stripMargin,
    "q_agg_retract_full" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS lv,
        | CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS ln,
        | CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE o_orderpriority END AS co
        |FROM orders""".stripMargin,
    "q_sequence_group" ->
      """SELECT c_custkey, CAST(2 AS BIGINT) AS bal_seq,
        | round(c_acctbal, 2) AS acctbal,
        | CAST(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS seg_seq,
        | CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END AS c_mktsegment
        |FROM customer""".stripMargin,
    "q_agg_engine" ->
      """SELECT l_orderkey, round(sum(l_quantity), 2) AS qty_sum,
        | round(max(l_extendedprice), 2) AS price_max,
        | CAST(count(l_partkey) AS BIGINT) AS item_cnt,
        | array_to_string(list_sort(list(l_returnflag)), ',') AS flags
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q_agg_retract" ->
      """SELECT l_orderkey,
        | round(sum(CASE WHEN l_linenumber <= 3 THEN l_quantity ELSE 0 END), 2) AS qty_sum,
        | round(max(l_extendedprice), 2) AS price_max,
        | CAST(count(CASE WHEN l_linenumber <= 3 THEN l_partkey END) AS BIGINT) AS item_cnt
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q_first_row" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders",
    "q_rbm_cardinality" ->
      """SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS uniq
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_hll_estimate" ->
      "SELECT o_orderstatus, true AS within_5pct FROM orders GROUP BY o_orderstatus",
    "q_fileindex_bloom" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_custkey = 7""".stripMargin,
    "q_fileindex_bitmap" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus""".stripMargin,
    "q_fileindex_bsi" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000""".stripMargin,
    "q_agg_pushdown_grouped" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(max(event_id) AS BIGINT) AS max_id
        |FROM events GROUP BY event_type""".stripMargin,
    "q_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, CAST(min(event_id) AS BIGINT) AS min_id,
        | CAST(max(event_id) AS BIGINT) AS max_id FROM events""".stripMargin,
    "q_topn" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q_zorder_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        | AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_extendedprice >= 900.0 AND l_extendedprice < 1500.0""".stripMargin,
    "q_delete_cow" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus""".stripMargin,
    "q_delete_dv" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus""".stripMargin,
    "q_dv_scan" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus""".stripMargin,
    "q_update_cow" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 0.9
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_merge_into" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt, round(sum(price), 2) AS total
        |FROM (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END AS price
        |  FROM orders
        |  UNION ALL
        |  SELECT 'NEW' AS o_orderstatus, o_totalprice AS price
        |  FROM orders WHERE o_orderkey % 7 = 3
        |) GROUP BY o_orderstatus""".stripMargin,
    "q_metadata_delete" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM events WHERE event_type <> 'click' GROUP BY event_type""".stripMargin,
    "q_metadata_cols" ->
      "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY event_type",
    "q_partition_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS total
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_runtime_filter" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS total
        |FROM events e JOIN (SELECT DISTINCT event_type FROM events
        |                    WHERE event_type LIKE 'c%') d
        |  ON e.event_type = d.event_type""".stripMargin,
    "q_bitmap_partial" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(value), 2) AS total
        |FROM events WHERE user_id = 13 GROUP BY event_type""".stripMargin,
    "q_bitmap_eq" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)""".stripMargin,
    "q_cross_partition" ->
      """SELECT c_custkey,
        | CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
        | round(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END, 2) AS acctbal
        |FROM customer""".stripMargin,
    "q_btree_topn" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_max_pt" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt FROM events
        |WHERE event_type = (SELECT max(event_type) FROM events)""".stripMargin,
    "q_overwrite_dynamic" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN event_type = 'error' THEN 0 ELSE value END), 2) AS total
        |FROM events GROUP BY event_type""".stripMargin,
    "q_df_write" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |               THEN o_totalprice + 1000 ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_merge_schema" ->
      """SELECT n_nationkey,
        |  CAST(CASE WHEN n_nationkey >= 20 THEN n_regionkey + 4000000000
        |            ELSE n_regionkey END AS BIGINT) AS pop,
        |  CASE WHEN n_nationkey >= 10 THEN upper(n_name) ELSE '-' END AS tag
        |FROM nation""".stripMargin,
    "q_schema_evolution" ->
      """WITH all_rows AS (
        |  SELECT o_totalprice, '-' AS comment FROM orders
        |  UNION ALL
        |  SELECT o_totalprice, 'evolved' FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_totalprice, 'renamed' FROM orders WHERE o_orderkey % 7 = 3)
        |SELECT comment, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM all_rows GROUP BY comment""".stripMargin,
    "q_stream_upsert" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS total FROM orders",
    "q_stream_sink" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_sql_catalog" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_sql_time_travel" ->
      "SELECT CAST(count(*) AS BIGINT) AS cnt FROM orders",
    "q_tvf_incremental" ->
      """SELECT o_orderkey, round(o_totalprice * 2, 2) AS price, 'X-UPD' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_sql_branch" ->
      """WITH b AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'X-UPD' ELSE o_orderpriority END AS o_orderpriority,
        |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM b GROUP BY o_orderpriority""".stripMargin,
    "q_sql_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus""".stripMargin,
    "q_sql_update" ->
      """SELECT o_orderstatus,
        | CASE WHEN o_orderstatus = 'O' THEN 'SQL-UPD' ELSE o_orderpriority END AS o_orderpriority,
        | CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 0.9
        |               ELSE o_totalprice END), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_sql_merge" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt, round(sum(price), 2) AS total
        |FROM (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END AS price
        |  FROM orders
        |  UNION ALL
        |  SELECT 'NEW' AS o_orderstatus, o_totalprice AS price
        |  FROM orders WHERE o_orderkey % 7 = 3
        |) GROUP BY o_orderstatus""".stripMargin,
    "q_binlog_stream" ->
      """SELECT '+I' AS rowkind, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS before_total,
        | round(sum(o_totalprice), 2) AS after_total FROM orders
        |UNION ALL
        |SELECT '+U', CAST(count(*) AS BIGINT),
        | round(sum(o_totalprice), 2), round(sum(o_totalprice * 2), 2)
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_read_limit" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total FROM orders""".stripMargin,
    "q_fixed_bucket" ->
      """SELECT CAST(count(*) AS BIGINT) AS matched,
        | CAST(count(*) AS BIGINT) AS total FROM orders""".stripMargin,
    "q_catalog_udf" ->
      """SELECT o_orderstatus, CAST(sum(o_orderkey % 97) AS BIGINT) AS m,
        | CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_stream_changelog" ->
      """SELECT '+I' AS _row_kind, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total FROM orders
        |UNION ALL
        |SELECT '-U', CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
        |FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT '+U', CAST(count(*) AS BIGINT), round(sum(o_totalprice * 2), 2)
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q_stream_source" ->
      """SELECT CAST((SELECT count(*) FROM orders) +
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0) AS BIGINT) AS cnt,
        | round((SELECT sum(o_totalprice) FROM orders) +
        |  (SELECT sum(o_totalprice * 2) FROM orders WHERE o_orderkey % 10 = 0), 2) AS total""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 2) AS avg_qty, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_semijoin" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q_antijoin" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q_dedup_exact" ->
      """WITH d2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
        | CAST(count(*) AS BIGINT) AS cnt
        |FROM d2 GROUP BY md5(text)""".stripMargin,
    "q_dedup_cluster" ->
      """WITH d2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT doc_id,
        | CAST(min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS canonical
        |FROM d2""".stripMargin,
    "q_dedup_corpus_call" ->
      """WITH d2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT doc_id,
        | CAST(min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS canonical
        |FROM d2""".stripMargin,
    "q_text_tokens" ->
      s"""SELECT lang, CAST(sum($tokCntSql) AS BIGINT) AS n_tokens,
         | CAST(count(*) AS BIGINT) AS docs
         |FROM documents GROUP BY lang""".stripMargin,
    "q_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(lower(trim(text)), '\s+'),
        |    w -> len(w) > 0)) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM counts)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(ln((SELECT t FROM total)) - avg(ln(cnt)), 3) AS nll
        |FROM toks JOIN counts USING (tok) GROUP BY doc_id""".stripMargin,
    "q_text_signals" ->
      """WITH sig AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS bpe,
        |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS lines,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                w -> len(w) > 0) AS ws
        |  FROM documents)
        |SELECT lang,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(len(lines)) AS BIGINT) AS n_lines,
        |  CAST(sum(len(list_distinct(lines))) AS BIGINT) AS n_uniq_lines,
        |  CAST(sum(len(list_filter(ws, w -> list_contains(
        |    ['the','and','of','to','a','in','is','that','it','for'], w)))) AS BIGINT) AS n_stop,
        |  CAST(sum(len(ws)) AS BIGINT) AS n_words
        |FROM sig GROUP BY lang""".stripMargin,
    "q_lang_id" -> langIdOracle,
    "q_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents WHERE doc_id < 100""".stripMargin,
    "q_text_quality" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS docs,
         | CAST(sum(length(text)-length(regexp_replace(text,'[.,;:!?]','','g'))) AS BIGINT) AS punct,
         | round(avg($qualitySql), 3) AS avg_q
         |FROM documents GROUP BY source""".stripMargin,
    "q_multimodal_blob" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
        | md5(text) AS content_hash
        |FROM documents WHERE doc_id < 100""".stripMargin,
    "q_blob_table" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
        | md5(text) AS content_hash
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_blob_view" ->
      """SELECT doc_id, md5(text) AS content_hash
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_blob_collection" ->
      """SELECT doc_id,
        |  CAST(greatest(ceil(octet_length(encode(text)) / 64.0), 1) AS INT) AS n_chunks,
        |  md5(text) AS content_hash
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_blob_bench" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes,
        | CAST(count(DISTINCT md5(text)) AS BIGINT) AS hashes
        |FROM documents""".stripMargin,
    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text)) AS blen
        |  FROM documents WHERE doc_id < 100),
        |idx AS (
        |  SELECT doc_id, blen,
        |    unnest(range(0, ((blen-1)//256)+1)) AS i FROM f)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(least(64, blen - i*256) AS INT) AS frame_len
        |FROM idx""".stripMargin,
    "q_variant" ->
      """SELECT doc_id, lang, CAST(length(text) AS INT) AS text_len
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_variant_sql" ->
      """SELECT doc_id, lang, CAST(length(text) AS INT) AS text_len
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_variant_filter" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS text_len
        |FROM documents
        |WHERE doc_id < 200 AND length(text) > 400 AND lang = 'en'""".stripMargin,
    "q_variant_filter_or" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS text_len
        |FROM documents
        |WHERE doc_id < 200
        |  AND (length(text) > 400 OR (lang = 'de' AND length(text) < 100))""".stripMargin,
    "q_variant_sql_pk" ->
      """SELECT doc_id, lang,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN length(text) * 2
        |            ELSE length(text) END AS INT) AS text_len
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_variant_pk" ->
      """SELECT doc_id, lang,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN length(text) * 2
        |            ELSE length(text) END AS INT) AS text_len
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_object_table" ->
      """SELECT lang, CAST(sum(octet_length(encode(text)) + 1) AS BIGINT) AS length
        |FROM documents GROUP BY lang""".stripMargin,
    "q_blob_roundtrip" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | md5(text) AS content_hash
        |FROM documents WHERE doc_id < 100""".stripMargin,
    "q_ann_cosine" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_int8" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_pq" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf_indexed" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf_rq" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // refine_factor=100 re-ranks ≥ corpus candidates over the RQ route →
    // exact top-10; the oracle is plain brute force
    "q_ann_refine" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vector_tvf_ref" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vector_tvf_filtered" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e WHERE e.label = 3)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf_filtered" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e WHERE e.label = 3)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_es_filtered_ann" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e WHERE e.label = 3)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_es_filtered_text" ->
      s"""WITH ${bm25Cte()}
         |SELECT doc_id, round(score, 4) AS score
         |FROM scored JOIN documents USING (doc_id)
         |WHERE lang = 'en'
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_es_gated_text" ->
      s"""WITH ${bm25Cte()}
         |SELECT doc_id, round(score, 4) AS score
         |FROM scored JOIN documents USING (doc_id)
         |WHERE lang = 'en'
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_es_tvf" ->
      s"""WITH ${bm25Cte()}
         |SELECT doc_id, round(score, 4) AS score
         |FROM scored JOIN documents USING (doc_id)
         |WHERE lang = 'en'
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_es_hybrid" ->
      s"""WITH ${bm25Cte()},
         |vecr AS (
         |  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r FROM (
         |    SELECT e.vec_id AS id, list_cosine_similarity(e.embedding::DOUBLE[],
         |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
         |    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
         |    WHERE d.lang = 'en')
         |  QUALIFY r <= 10),
         |txtr AS (
         |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM (
         |    SELECT s.doc_id AS id, s.score FROM scored s
         |    JOIN documents d ON d.doc_id = s.doc_id WHERE d.lang = 'en')
         |  QUALIFY r <= 10),
         |fused AS (
         |  SELECT COALESCE(v.id, t.id) AS doc_id,
         |    COALESCE(1.0/(60+v.r), 0) + COALESCE(1.0/(60+t.r), 0) AS rrf
         |  FROM vecr v FULL OUTER JOIN txtr t ON v.id = t.id)
         |SELECT doc_id, round(rrf, 6) AS rrf FROM fused
         |ORDER BY round(rrf, 6) DESC, doc_id LIMIT 10""".stripMargin,
    "q_es_hybrid_mrr" -> esHybridMrrOracle,
    "q_es_tvf_hybrid" -> esHybridMrrOracle,
    "q_es_hybrid_weighted" ->
      s"""WITH ${bm25Cte()},
         |vk AS (
         |  SELECT id, sim FROM (
         |    SELECT e.vec_id AS id, list_cosine_similarity(e.embedding::DOUBLE[],
         |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
         |    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
         |    WHERE d.lang = 'en')
         |  ORDER BY sim DESC, id LIMIT 10),
         |tk AS (
         |  SELECT id, score FROM (
         |    SELECT s.doc_id AS id, s.score FROM scored s
         |    JOIN documents d ON d.doc_id = s.doc_id WHERE d.lang = 'en')
         |  ORDER BY score DESC, id LIMIT 10),
         |vn AS (SELECT id, (sim - min(sim) OVER ()) /
         |  (CASE WHEN max(sim) OVER () > min(sim) OVER ()
         |        THEN max(sim) OVER () - min(sim) OVER () ELSE 1.0 END) AS s1
         |  FROM vk),
         |tn AS (SELECT id, (score - min(score) OVER ()) /
         |  (CASE WHEN max(score) OVER () > min(score) OVER ()
         |        THEN max(score) OVER () - min(score) OVER () ELSE 1.0 END) AS s2
         |  FROM tk),
         |fused AS (
         |  SELECT COALESCE(v.id, t.id) AS doc_id,
         |    COALESCE(v.s1, 0) * 0.5 + COALESCE(t.s2, 0) * 0.5 AS fused
         |  FROM vn v FULL OUTER JOIN tn t ON v.id = t.id)
         |SELECT doc_id, round(fused, 4) AS fused FROM fused
         |ORDER BY round(fused, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_embed_neardup" ->
      """SELECT vec_id AS v1, vec_id + 1000000 AS v2 FROM embeddings""".stripMargin,
    "q_semantic_dedup" -> "SELECT vec_id FROM embeddings",
    "q_ann_batch" ->
      """SELECT qid, vec_id, round(sim, 4) AS sim FROM (
        |  SELECT q.vec_id AS qid, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        |               e.vec_id) AS rn
        |  FROM embeddings e
        |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (1,2,3)) q)
        |WHERE rn <= 5""".stripMargin,
    "q_ann_lateral" ->
      """SELECT qid, vec_id, round(sim, 4) AS sim FROM (
        |  SELECT q.vec_id AS qid, e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
        |               e.vec_id) AS rn
        |  FROM embeddings e
        |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (1,2,3)) q)
        |WHERE rn <= 5""".stripMargin,
    "q_point_lookup" ->
      """SELECT o_orderkey, o_orderstatus,
        | round(o_totalprice * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END, 2) AS price
        |FROM orders WHERE o_orderkey = 100""".stripMargin,
    "q_bucket_append" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_custkey IN (7, 11, 23) GROUP BY o_custkey""".stripMargin,
    "q_consumer_stream" -> dedupOracle,
    "q_lookup_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
        | round(sum(o_totalprice * 2), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 10 = 0 GROUP BY c_mktsegment""".stripMargin,
    "q_system_consumers" ->
      "SELECT 'sysc' AS consumer_id, CAST(2 AS BIGINT) AS next_snapshot_id",
    "q_fulltext_bm25" -> bm25Oracle,
    "q_fulltext_tvf" -> bm25Oracle,
    "q_call_index_fulltext" -> bm25Oracle,
    "q_fulltext_mode_full" -> bm25Oracle,
    "q_call_index_es" ->
      s"""WITH ${bm25Cte()}
         |SELECT doc_id, round(score, 4) AS score
         |FROM scored JOIN documents USING (doc_id)
         |WHERE lang = 'en'
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_call_index_vector" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vector_mode_full" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_call_index_rq" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // deterministic two-bucket fixture: base write (1 file/bucket), update
    // wave (1 file/bucket), full compaction (removes both, adds the merged
    // one); compact_buckets shows the post-compaction snapshot only
    "q_file_monitor" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), CAST(0 AS INT), CAST(1 AS INT)),
        |  (CAST(1 AS BIGINT), CAST(1 AS INT), CAST(0 AS INT), CAST(1 AS INT)),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), CAST(0 AS INT), CAST(1 AS INT)),
        |  (CAST(2 AS BIGINT), CAST(1 AS INT), CAST(0 AS INT), CAST(1 AS INT)),
        |  (CAST(3 AS BIGINT), CAST(0 AS INT), CAST(2 AS INT), CAST(1 AS INT)),
        |  (CAST(3 AS BIGINT), CAST(1 AS INT), CAST(2 AS INT), CAST(1 AS INT)))
        |  AS t(snapshot_id, bucket, removed, added)""".stripMargin,
    "q_compact_buckets" ->
      """SELECT * FROM (VALUES
        |  (CAST(3 AS BIGINT), CAST(0 AS INT), CAST(1 AS INT), 'fm_tbl'),
        |  (CAST(3 AS BIGINT), CAST(1 AS INT), CAST(1 AS INT), 'fm_tbl'))
        |  AS t(snapshot_id, bucket, files, table_name)""".stripMargin,
    "q_reftypes" ->
      """WITH m AS (SELECT user_id, min(ts) AS mt FROM events GROUP BY user_id)
        |SELECT e.user_id,
        |  CAST(date_diff('millisecond', date_trunc('day', m.mt), m.mt) AS INT) AS first_t,
        |  e.event_type AS kind, CAST(count(*) AS INT) AS mult
        |FROM events e JOIN m USING (user_id)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_vector_ddl" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(embedding[1]::DOUBLE, 4) AS e_first,
        |  round(embedding[64]::DOUBLE, 4) AS e_last
        |FROM embeddings ORDER BY vec_id LIMIT 25""".stripMargin,
    "q_vector_directive" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(embedding[1]::DOUBLE, 4) AS e_first,
        |  round(embedding[64]::DOUBLE, 4) AS e_last
        |FROM embeddings ORDER BY vec_id LIMIT 25""".stripMargin,
    "q_fulltext_and" ->
      s"""WITH ${bm25Cte()}
         |SELECT doc_id, round(score, 4) AS score FROM (
         |  SELECT h.doc_id,
         |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
         |         (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) ) AS score,
         |    count(DISTINCT h.term) AS nt
         |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
         |  WHERE h.term IN ('table','scan')
         |  GROUP BY h.doc_id)
         |WHERE nt = 2
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_fulltext_bool" ->
      s"""WITH ${bm25Cte()},
         |m AS (SELECT h.doc_id,
         |    ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
         |      (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) AS score
         |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
         |  WHERE h.term = 'table'),
         |sh AS (SELECT h.doc_id,
         |    ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
         |      (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) AS score
         |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
         |  WHERE h.term = 'merge')
         |SELECT m.doc_id, round(m.score + coalesce(sh.score, 0.0), 4) AS score
         |FROM m LEFT JOIN sh USING (doc_id)
         |WHERE m.doc_id NOT IN (
         |  SELECT DISTINCT doc_id FROM postings WHERE term = 'fast')
         |ORDER BY round(m.score + coalesce(sh.score, 0.0), 4) DESC, m.doc_id
         |LIMIT 10""".stripMargin,
    "q_fulltext_fuzzy" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)),'\s+'), w -> length(w)>0) AS ws
        |  FROM documents),
        |postings AS (
        |  SELECT term, doc_id, doc_len, count(*) AS tf
        |  FROM (SELECT doc_id, len(ws) AS doc_len, unnest(ws) AS term FROM words)
        |  GROUP BY term, doc_id, doc_len),
        |stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
        |qs AS (SELECT DISTINCT term FROM postings
        |       WHERE levenshtein(term, 'scann') <= 1
        |       UNION SELECT 'scann' AS term),
        |hits AS (SELECT p.* FROM postings p JOIN qs USING (term)),
        |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
        |scored AS (
        |  SELECT h.doc_id,
        |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
        |         (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) ) AS score
        |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
        |  GROUP BY h.doc_id)
        |SELECT doc_id, round(score, 4) AS score FROM scored
        |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_fulltext_multi" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(list_filter(
        |      regexp_split_to_array(text,'\s+'), w -> length(w)>0),1,3),' ') AS title,
        |    text AS body
        |  FROM documents),
        |tw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(title)),'\s+'), w -> length(w)>0) AS ws FROM base),
        |tp AS (SELECT term, doc_id, doc_len, count(*) AS tf
        |       FROM (SELECT doc_id, len(ws) AS doc_len, unnest(ws) AS term FROM tw)
        |       GROUP BY 1,2,3),
        |tst AS (SELECT count(*) AS n, avg(doc_len) AS avgdl
        |        FROM (SELECT DISTINCT doc_id, doc_len FROM tp)),
        |th AS (SELECT * FROM tp WHERE term IN ('table','scan')),
        |td AS (SELECT term, count(DISTINCT doc_id) AS df FROM th GROUP BY term),
        |tsc AS (SELECT h.doc_id,
        |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
        |         (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) ) AS score
        |  FROM th h JOIN td d USING (term) CROSS JOIN tst s GROUP BY h.doc_id),
        |bw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(body)),'\s+'), w -> length(w)>0) AS ws FROM base),
        |bp AS (SELECT term, doc_id, doc_len, count(*) AS tf
        |       FROM (SELECT doc_id, len(ws) AS doc_len, unnest(ws) AS term FROM bw)
        |       GROUP BY 1,2,3),
        |bst AS (SELECT count(*) AS n, avg(doc_len) AS avgdl
        |        FROM (SELECT DISTINCT doc_id, doc_len FROM bp)),
        |bh AS (SELECT * FROM bp WHERE term IN ('table','scan')),
        |bd AS (SELECT term, count(DISTINCT doc_id) AS df FROM bh GROUP BY term),
        |bsc AS (SELECT h.doc_id,
        |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * 2.2 /
        |         (h.tf + 1.2 * (0.25 + 0.75 * h.doc_len / s.avgdl)) ) AS score
        |  FROM bh h JOIN bd d USING (term) CROSS JOIN bst s GROUP BY h.doc_id)
        |SELECT doc_id,
        |  round(coalesce(t.score, 0.0) * 2.0 + coalesce(b.score, 0.0), 4) AS score
        |FROM tsc t FULL OUTER JOIN bsc b USING (doc_id)
        |ORDER BY round(coalesce(t.score, 0.0) * 2.0 + coalesce(b.score, 0.0), 4) DESC,
        |  doc_id LIMIT 10""".stripMargin,
    "q_fulltext_phrase" ->
      """WITH words AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)),'\s+'), w -> length(w)>0) AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, len(ws) AS doc_len,
        |        ' ' || array_to_string(ws, '  ') || ' ' AS joined
        |      FROM words WHERE len(ws) > 0),
        |stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM s),
        |m AS (SELECT doc_id, doc_len,
        |        CAST((length(joined) - length(replace(joined, ' table  scan ', '')))
        |          / length(' table  scan ') AS BIGINT) AS tfp
        |      FROM s),
        |mm AS (SELECT * FROM m WHERE tfp > 0),
        |pdf AS (SELECT count(*) AS df FROM mm)
        |SELECT doc_id,
        |  round(ln(1.0 + (st.n - pdf.df + 0.5)/(pdf.df + 0.5)) * tfp * 2.2 /
        |    (tfp + 1.2 * (0.25 + 0.75 * doc_len / st.avgdl)), 4) AS score
        |FROM mm CROSS JOIN pdf CROSS JOIN stats st
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_fulltext_ngram" ->
      """WITH grams AS (
        |  SELECT doc_id, len(t) - 2 AS doc_len, substr(t, gs, 3) AS term
        |  FROM (SELECT doc_id, lower(trim(text)) AS t FROM documents
        |        WHERE len(lower(trim(text))) >= 3) d,
        |       unnest(range(1, len(d.t) - 1)) AS g(gs)),
        |postings AS (
        |  SELECT term, doc_id, doc_len, count(*) AS tf FROM grams GROUP BY 1,2,3),
        |stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, doc_len FROM postings)),
        |hits AS (SELECT * FROM postings
        |         WHERE term IN ('sca','can','ann','nne','ner')),
        |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
        |scored AS (
        |  SELECT h.doc_id,
        |    sum( ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5)) * h.tf * (1.2 + 1.0) /
        |         (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.doc_len / s.avgdl)) ) AS score
        |  FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
        |  GROUP BY h.doc_id)
        |SELECT doc_id, round(score, 4) AS score FROM scored
        |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin,
    "q_vector_tvf_l2" ->
      """SELECT vec_id, round(dist, 4) AS dist FROM (
        |  SELECT e.vec_id,
        |    list_distance(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[])^2 AS dist
        |  FROM embeddings e)
        |ORDER BY dist ASC, vec_id LIMIT 10""".stripMargin,
    "q_call_index_multi" ->
      """WITH qv AS (
        |  SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 1)
        |(SELECT 'embedding' AS route, vec_id, round(sim, 4) AS sim FROM (
        |   SELECT e.vec_id,
        |     list_cosine_similarity(e.embedding::DOUBLE[], (SELECT v FROM qv)) AS sim
        |   FROM embeddings e)
        | ORDER BY sim DESC, vec_id LIMIT 10)
        |UNION ALL
        |(SELECT 'emb2' AS route, vec_id, round(sim, 4) AS sim FROM (
        |   SELECT e.vec_id,
        |     list_cosine_similarity(list_reverse(e.embedding)::DOUBLE[],
        |       (SELECT v FROM qv)) AS sim
        |   FROM embeddings e)
        | ORDER BY sim DESC, vec_id LIMIT 10)""".stripMargin,
    "q_vector_tvf" ->
      """SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM embeddings e)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_pk_vector_search" ->
      """WITH cur AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 10 = 0 THEN list_reverse(embedding)
        |         ELSE embedding END AS emb
        |  FROM embeddings WHERE vec_id % 7 <> 0)
        |SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT c.vec_id,
        |    list_cosine_similarity(c.emb::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM cur c)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_pk_fulltext" -> {
      val docsM =
        """(SELECT doc_id,
          |   CASE WHEN doc_id % 10 = 0 THEN text || ' graftsearch' ELSE text END AS text
          | FROM documents WHERE doc_id % 7 <> 0)""".stripMargin
      s"""WITH ${bm25Cte(docsM)}
         |SELECT doc_id, round(score, 4) AS score FROM scored
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin
    },
    "q_pk_search_tvf" ->
      """WITH cur AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 10 = 0 THEN list_reverse(embedding)
        |         ELSE embedding END AS emb
        |  FROM embeddings WHERE vec_id % 7 <> 0)
        |SELECT vec_id, round(sim, 4) AS sim FROM (
        |  SELECT c.vec_id,
        |    list_cosine_similarity(c.emb::DOUBLE[],
        |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
        |  FROM cur c)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_pk_fulltext_tvf" -> {
      val docsM =
        """(SELECT doc_id,
          |   CASE WHEN doc_id % 10 = 0 THEN text || ' graftsearch' ELSE text END AS text
          | FROM documents WHERE doc_id % 7 <> 0)""".stripMargin
      s"""WITH ${bm25Cte(docsM)}
         |SELECT doc_id, round(score, 4) AS score FROM scored
         |ORDER BY round(score, 4) DESC, doc_id LIMIT 10""".stripMargin
    },
    "q_hybrid_tvf" ->
      s"""WITH ${bm25Cte()},
         |txt AS (SELECT id, r FROM (
         |  SELECT doc_id AS id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM scored)
         |  WHERE r <= 10),
         |vec AS (SELECT id, r FROM (
         |  SELECT vec_id AS id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r
         |  FROM (SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[],
         |    (SELECT embedding FROM embeddings WHERE vec_id=1)::DOUBLE[]) AS sim
         |    FROM embeddings e))
         |  WHERE r <= 10),
         |fused AS (
         |  SELECT COALESCE(t.id, v.id) AS id,
         |    COALESCE(1.0/(60+t.r), 0) + COALESCE(1.0/(60+v.r), 0) AS rrf
         |  FROM txt t FULL OUTER JOIN vec v ON t.id = v.id)
         |SELECT id, round(rrf, 6) AS rrf FROM fused
         |ORDER BY round(rrf, 6) DESC, id LIMIT 10""".stripMargin,
    "q_hybrid_search" -> hybridOracle,
    "q_hybrid_routes" ->
      s"""WITH ${bm25Cte()},
         |vecr AS (
         |  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r FROM (
         |    SELECT e.vec_id AS id, list_cosine_similarity(e.embedding::DOUBLE[],
         |      (SELECT embedding FROM embeddings WHERE vec_id = 1)::DOUBLE[]) AS sim
         |    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
         |  QUALIFY r <= 10),
         |txtr AS (
         |  SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
         |  FROM scored QUALIFY r <= 10),
         |fused AS (
         |  SELECT COALESCE(v.id, t.id) AS doc_id,
         |    COALESCE(2.0/v.r, 0) + COALESCE(1.0/t.r, 0) AS mrr
         |  FROM vecr v FULL OUTER JOIN txtr t ON v.id = t.id)
         |SELECT doc_id, round(mrr, 6) AS mrr FROM fused
         |ORDER BY round(mrr, 6) DESC, doc_id LIMIT 10""".stripMargin,
    "q_dedup_minhash" -> minhashOracle,
    "q_dedup_minhash_idx" -> minhashOracle,
    "q_decontaminate" -> decontaminateOracle,
    "q_ngram_jaccard" -> ngramJaccardOracle,
    "q_simhash" -> simhashOracle,
    "q_pii_redact" ->
      s"""WITH a AS (SELECT doc_id, $piiAugmentSql AS aug
         |  FROM documents WHERE doc_id < 200)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$emailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '$phoneRe')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(aug, '$ipv4Re')) AS BIGINT) AS n_ipv4,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$emailRe', '<EMAIL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g'),
         |    '$ipv4Re', '<IP>', 'g')) AS red_fp
         |FROM a""".stripMargin,
    "q_url_filter" ->
      s"""WITH u AS (SELECT doc_id, $urlSynthSql AS url FROM documents),
         |h AS (SELECT doc_id, regexp_extract(
         |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
         |    '^([^/:?#]+)', 1) AS host FROM u),
         |r AS (SELECT doc_id, CASE WHEN len(string_split(host, '.')) <= 2 THEN host
         |    ELSE array_to_string((string_split(host, '.'))[-2:], '.') END AS reg FROM h)
         |SELECT reg AS reg_domain, CAST(count(*) AS BIGINT) AS cnt
         |FROM r WHERE reg <> 'example.com' GROUP BY reg""".stripMargin,
    "q_hash_split" ->
      """WITH b AS (SELECT n_chars,
        |  ('0x'||substr(md5('0'||doc_id),1,8))::UBIGINT % 100 AS b FROM documents)
        |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |  ELSE 'test' END AS split,
        | CAST(count(*) AS BIGINT) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM b GROUP BY 1""".stripMargin,
    "q_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |  ('0x'||substr(md5('7'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT AS hx,
        |  CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 40 WHEN 'de' THEN 1000
        |            WHEN 'fr' THEN 10 ELSE 0 END AS quota
        | FROM documents),
        |c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |f AS (SELECT h.*, least(4294967296,
        |    CAST(ceil(4294967296 * 3.0 * quota / greatest(cnt, quota, 1)) AS BIGINT)) AS thr
        |  FROM h JOIN c USING (lang)),
        |s AS (SELECT doc_id, lang, quota,
        |    row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rn
        |  FROM f WHERE hx < thr)
        |SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s WHERE rn <= quota GROUP BY lang""".stripMargin,
    "q_corpus_mix" ->
      """WITH m AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 2.25 WHEN 'src1' THEN 0.5
        |              WHEN 'src2' THEN 3.0 ELSE 1.0 END AS w,
        |  ('0x'||substr(md5('12'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT AS hx
        | FROM documents),
        |cps AS (SELECT doc_id, source, CAST(floor(w) +
        |    CASE WHEN hx < CAST(floor((w - floor(w)) * 4294967296) AS BIGINT)
        |         THEN 1 ELSE 0 END AS INT) AS copies
        |  FROM m),
        |e AS (SELECT source, unnest(generate_series(1, copies)) AS epoch
        |  FROM cps WHERE copies > 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(max(epoch) AS BIGINT) AS max_epoch
        |FROM e GROUP BY source""".stripMargin,
    "q_token_pack" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |  ('0x'||substr(md5('3'||CAST(doc_id AS VARCHAR)),1,8))::UBIGINT AS hx
        | FROM documents),
        |r AS (SELECT doc_id, n_chars,
        |  sum(n_chars) OVER (ORDER BY hx, doc_id ROWS UNBOUNDED PRECEDING)
        |    - n_chars AS strt
        | FROM h)
        |SELECT CAST(floor(strt / 20000.0) AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM r GROUP BY 1""".stripMargin,
    "q_chunk_docs" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n,
        |    unnest(list_filter(range(0, greatest(len(toks), 1), 48),
        |      x -> x = 0 OR x + 16 < len(toks))) AS st
        |  FROM w)
        |SELECT doc_id, CAST(st // 48 AS INT) AS chunk,
        |  CAST(least(64, n - st) AS BIGINT) AS n_tok,
        |  md5(array_to_string(list_slice(toks, st + 1, st + 64), ' ')) AS fp
        |FROM s""".stripMargin,
    "q_kmeans_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cemb
        |  FROM embeddings
        |  ORDER BY ('0x'||substr(md5('5'||CAST(vec_id AS VARCHAR)),1,8))::UBIGINT,
        |    vec_id LIMIT 8),
        |sc AS (SELECT e.vec_id, c.cid,
        |    list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) AS sim,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
        |                 c.cemb::DOUBLE[]) DESC, c.cid ASC) AS rn
        |  FROM embeddings e CROSS JOIN c)
        |SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(vec_id) AS BIGINT) AS min_id,
        |  CAST(sum(CAST(floor(sim * 1000000) AS BIGINT)) AS BIGINT) AS sim_micro
        |FROM sc WHERE rn = 1 GROUP BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
        |l AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |    AS prev FROM o),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000
        |    THEN 1 ELSE 0 END AS nw FROM l),
        |s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM f)
        |SELECT user_id, CAST(sess AS INT) AS session,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms,
        |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1)
        |SELECT cohort, CAST(date_diff('day', cohort, d) AS INT) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM e JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_type AS t FROM events),
        |b1 AS (SELECT user_id, min(CASE WHEN t = 'view' THEN ms END) AS m1
        |  FROM e GROUP BY 1),
        |b2 AS (SELECT e.user_id, min(CASE WHEN t = 'click' AND ms >= m1 THEN ms END)
        |    AS m2 FROM e JOIN b1 USING (user_id) GROUP BY 1),
        |b3 AS (SELECT e.user_id, min(CASE WHEN t = 'purchase' AND ms >= m2 THEN ms END)
        |    AS m3 FROM e JOIN b2 USING (user_id) GROUP BY 1),
        |d AS (SELECT b1.user_id,
        |    CASE WHEN m3 IS NOT NULL THEN 3 WHEN m2 IS NOT NULL THEN 2
        |         WHEN m1 IS NOT NULL THEN 1 ELSE 0 END AS depth
        |  FROM b1 JOIN b2 USING (user_id) JOIN b3 USING (user_id))
        |SELECT CAST(depth AS INT) AS depth, CAST(count(*) AS BIGINT) AS users
        |FROM d GROUP BY 1""".stripMargin,
    "q_incr_dedup" ->
      """WITH fpd AS (SELECT doc_id, lang,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |state AS (SELECT DISTINCT fp FROM fpd WHERE doc_id % 3 = 0),
        |batch AS (
        |  SELECT doc_id, lang, fp FROM fpd WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, fp FROM fpd WHERE doc_id % 5 = 0),
        |firsts AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
        |    AS rn FROM batch)
        |SELECT f.doc_id, f.lang FROM firsts f
        |WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM state s WHERE s.fp = f.fp)"""
        .stripMargin,
    "q_rest_catalog" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS nations,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "q_cdc_ingest" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'CDC-UPD'
        |       ELSE o_orderpriority END AS o_orderpriority,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'cdc' ELSE NULL END AS src,
        |  CASE WHEN o_orderkey % 7 = 0 THEN '+U' ELSE '+I' END AS _cdc_kind
        |FROM orders WHERE o_orderkey % 13 <> 0""".stripMargin,
    "q_gopher_quality" ->
      """WITH g AS (SELECT lang, text,
        |  list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |              w -> len(w) > 0) AS ws FROM documents),
        |s AS (SELECT lang,
        |  len(ws) AS n_words,
        |  round(CASE WHEN len(ws) > 0
        |    THEN list_sum(list_transform(ws, w -> len(w)))::DOUBLE / len(ws)
        |    ELSE 0 END, 4) AS mwl,
        |  len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
        |  len(regexp_extract_all(text, '#')) AS n_hash,
        |  len(regexp_extract_all(text, '\.\.\.')) AS n_ellipsis,
        |  len(list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0)) AS n_lines,
        |  len(list_filter(string_split(text, chr(10)),
        |      l -> len(trim(l)) > 0 AND (starts_with(trim(l), '-')
        |        OR starts_with(trim(l), '*')))) AS bullet_lines,
        |  len(list_intersect(ws, ['the','and','of','to','a','in','is','that',
        |    'it','for'])) AS stop_hits
        | FROM g)
        |SELECT lang, CAST(count(*) AS BIGINT) AS docs,
        | CAST(sum(CASE WHEN n_words BETWEEN 20 AND 100000
        |   AND mwl BETWEEN 3.0 AND 10.0
        |   AND (n_hash + n_ellipsis) * 10 <= n_words
        |   AND bullet_lines * 10 < n_lines * 9
        |   AND alpha_words * 5 >= n_words * 4
        |   AND stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        | CAST(sum(alpha_words) AS BIGINT) AS alpha_words,
        | CAST(sum(stop_hits) AS BIGINT) AS stop_hits
        |FROM s GROUP BY lang""".stripMargin,
    "q_ngram_repetition" ->
      """WITH w AS (SELECT doc_id, length(text) AS n_chars,
        |  list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |              x -> len(x) > 0) AS ws
        |  FROM documents WHERE doc_id < 300),
        |g AS (SELECT doc_id, n_chars,
        |  unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |c AS (SELECT doc_id, n_chars, gram, count(*) AS cnt
        |  FROM g GROUP BY doc_id, n_chars, gram)
        |SELECT doc_id,
        | round(max(cnt * len(gram))::DOUBLE / n_chars, 4) AS top_frac,
        | round(sum(CASE WHEN cnt > 1 THEN cnt * len(gram) ELSE 0 END)::DOUBLE
        |   / n_chars, 4) AS dup_frac
        |FROM c GROUP BY doc_id, n_chars""".stripMargin,
    "q_para_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  text || chr(10) || 'shared footer ' || (doc_id % 5) AS text
        |  FROM documents),
        |p0 AS (SELECT doc_id,
        |  unnest([{'pos': i, 'para': parts[i]} for i in range(1, len(parts)+1)]) AS e
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d)),
        |p AS (SELECT doc_id, e.pos AS pos, e.para AS para FROM p0
        |  WHERE len(trim(e.para)) > 0),
        |r AS (SELECT doc_id,
        |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rk
        |  FROM p)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        | CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM r GROUP BY doc_id""".stripMargin
  )
}
