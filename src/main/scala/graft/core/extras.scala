package graft.core

import graft.core.RowOps._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.UUID

/**
 * Maintenance procedures dispatcher — the `CALL sys.*` surface of the
 * reference (paimon-spark/.../procedure/, 47 procedures; parser entry
 * PaimonSqlExtensions.g4:72) re-expressed as a name → action registry over
 * the table API. Returns a one-row status DataFrame like the reference.
 */
object Procedures {

  /** Per-column back-reference resolution shared by the dry-run drops:
    * explicit column wins, a sole index is unambiguous, several error. */
  private def pickRef[R](refs: Map[String, R], column: Option[String],
                         kind: String, loc: String): R = column match {
    case Some(c) => refs.getOrElse(c, throw new IllegalArgumentException(
      s"$loc: no $kind index on column $c " +
        s"(indexed: ${refs.keys.toSeq.sorted.mkString(", ")})"))
    case None if refs.size == 1 => refs.values.head
    case None if refs.isEmpty =>
      throw new IllegalArgumentException(s"$loc: no $kind index")
    case None => throw new IllegalArgumentException(
      s"$loc: multiple $kind indexes " +
        s"(${refs.keys.toSeq.sorted.mkString(", ")}) — pass index_column")
  }

  def call(spark: SparkSession, table: GraftTable, name: String,
           args: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    def ok(msg: String): DataFrame = Seq(msg).toDF("result")
    name match {
      case "compact" =>
        args.get("order_strategy") match {
          case Some(strategy) =>
            val cols = args("order_by").split(",").map(_.trim).toSeq
            if (args.get("incremental").contains("true")) {
              val r = table.clusterIncremental(strategy, cols)
              ok(if (r.isDefined) s"incrementally clustered by $strategy(${cols.mkString(",")})"
                 else "nothing new to cluster")
            } else {
              table.compactSorted(strategy, cols)
              ok(s"sort-compacted by $strategy(${cols.mkString(",")})")
            }
          case None => args.get("where") match {
            case Some(w) =>
              // partition-predicate-scoped compaction (paimon
              // CompactProcedure `where`): only matching buckets rewrite
              val e = StatsPrune.resolve(spark, table.dataSchema,
                org.apache.spark.sql.functions.expr(w))
              val r = table.compactWhere(en =>
                StatsPrune.partitionMatches(e, table.dataSchema, en.partition))
              ok(r.map(s => s"partially compacted to snapshot ${s.id}")
                .getOrElse("no matching buckets to compact"))
            case None =>
              val r = table.compact()
              ok(if (r.isDefined) s"compacted to snapshot ${r.get.id}" else "nothing to compact")
          }
        }
      case "rewrite_file_index" =>
        val n = FileIndexes.rebuildAll(table)
        ok(s"rebuilt file indexes for $n files")
      case "compact_chain_table" =>
        // partition arg accepts the raw value or a col='value' spec
        val raw = args.getOrElse("partition",
          throw new IllegalArgumentException("compact_chain_table needs partition"))
        val pt = raw.split("=").last.replaceAll("^['\"]|['\"]$", "").trim
        val s = table.compactChainTable(pt)
        ok(s"chain-compacted partition $pt into snapshot branch (snapshot ${s.id})")
      case "compact_manifest" =>
        val s = table.sm.compactManifests(table.schema.id)
        ok(s"manifests consolidated at snapshot ${s.id}")
      case "expire_snapshots" =>
        val n = table.expireSnapshots(args.getOrElse("retain_last", "10").toInt)
        ok(s"expired $n snapshots")
      case "remove_orphan_files" =>
        val olderThan = args.get("older_than_ms").map(_.toLong)
          .getOrElse(System.currentTimeMillis() - 3600_000L)
        ok(s"deleted ${table.removeOrphanFiles(olderThan)} orphan files")
      case "create_tag" =>
        val snap = args.get("snapshot").map(_.toLong)
          .orElse(table.sm.latestSnapshotId).get
        table.sm.createTag(args("tag"), snap)
        ok(s"tag ${args("tag")} -> snapshot $snap")
      case "delete_tag" =>
        table.sm.deleteTag(args("tag")); ok(s"tag ${args("tag")} deleted")
      case "rename_tag" =>
        val t0 = table.sm.readTag(args("tag"))
        table.sm.createTag(args("target_tag"), t0.snapshotId)
        table.sm.deleteTag(args("tag"))
        ok(s"tag ${args("tag")} -> ${args("target_tag")}")
      case "rollback" =>
        val s = table.rollback(args("snapshot").toLong)
        ok(s"rolled back to ${args("snapshot")} (new snapshot ${s.id})")
      case "rollback_to_timestamp" =>
        val ts = args("timestamp_ms").toLong
        val ids = table.sm.snapshotIds.filter(id => table.sm.readSnapshot(id).timestampMs <= ts)
        require(ids.nonEmpty, "no snapshot at or before timestamp")
        val s = table.rollback(ids.max)
        ok(s"rolled back to snapshot ${ids.max} (new snapshot ${s.id})")
      case "rollback_to_watermark" =>
        val w = args("watermark").toLong
        val ids = table.sm.snapshotIds.filter(id =>
          table.sm.readSnapshot(id).watermarkLong.exists(_ <= w))
        require(ids.nonEmpty, "no snapshot at or before watermark")
        val s = table.rollback(ids.max)
        ok(s"rolled back to watermark $w (snapshot ${ids.max}, new ${s.id})")
      case "analyze" =>
        table.analyze()
      case "create_branch" =>
        table.createBranch(args("branch"), args.get("snapshot").map(_.toLong))
        ok(s"branch ${args("branch")} created")
      case "delete_branch" =>
        ok(s"branch ${args("branch")} deleted: ${table.deleteBranch(args("branch"))}")
      case "fast_forward" =>
        val s = table.fastForward(args("branch"))
        ok(s"fast-forwarded to branch ${args("branch")} (snapshot ${s.id})")
      case "clear_consumers" =>
        ok(s"cleared ${Consumers.clear(table)} consumers")
      case "reset_consumer" =>
        Consumers.reset(table, args("consumer_id"),
          args.get("next_snapshot").map(_.toLong))
        ok(s"consumer ${args("consumer_id")} reset")
      case "create_tag_from_watermark" =>
        // reference CreateTagFromWatermarkProcedure
        val w = args("watermark").toLong
        val sid = table.sm.laterOrEqualWatermark(w)
        table.sm.createTag(args("tag"), sid)
        ok(s"tag ${args("tag")} -> snapshot $sid (watermark $w)")
      case "rollback_to_tag" =>
        val tg = table.sm.readTag(args("tag"))
        val s = table.rollback(tg.snapshotId)
        ok(s"rolled back to tag ${args("tag")} (snapshot ${tg.snapshotId}, new ${s.id})")
      case "create_tag_from_timestamp" =>
        val ts = args("timestamp_ms").toLong
        val ids = table.sm.snapshotIds.filter(id => table.sm.readSnapshot(id).timestampMs <= ts)
        require(ids.nonEmpty, "no snapshot at or before timestamp")
        table.sm.createTag(args("tag"), ids.max)
        ok(s"tag ${args("tag")} -> snapshot ${ids.max}")
      case "expire_partitions" =>
        // drop whole partitions whose value sorts below the threshold
        // (paimon ExpirePartitionsProcedure, values-comparison strategy)
        val pc = args.getOrElse("partition_column",
          table.config.partitionKeys.headOption.getOrElse(
            throw new IllegalArgumentException("table has no partitions")))
        val threshold = args("older_than")
        val victims = table.planFiles().filter(e =>
          e.partition.get(pc).exists(v => v != null && v < threshold))
        val parts = victims.map(_.partition).distinct.size
        table.sm.commit(victims.map(_.copy(kind = 1)), "OVERWRITE",
          s"expire-partitions-$threshold", table.schema.id)
        ok(s"expired $parts partitions ($threshold)")
      case "remove_unexisting_files" =>
        // repair: drop manifest entries whose data file vanished on disk
        val fs = table.sm.fs
        val missing = table.planFiles().filter(e =>
          !fs.exists(new Path(table.location, e.path)))
        if (missing.nonEmpty)
          table.sm.commit(missing.map(_.copy(kind = 1)), "OVERWRITE",
            "remove-unexisting-files", table.schema.id)
        ok(s"removed ${missing.size} unexisting file entries")
      case "purge_files" =>
        // drop ALL data (schema + table identity survive)
        val live = table.planFiles()
        table.sm.commit(live.map(_.copy(kind = 1)), "OVERWRITE", "purge-files",
          table.schema.id, dvAction = Some(None))
        ok(s"purged ${live.size} files")
      case "rescale" =>
        val n = args("bucket").toInt
        val all = table.read()
        val cur = table.schema
        // a rescale rewrites every file OF THIS BRANCH, so it may upgrade an
        // unstamped legacy table to the current default routing (trimmed
        // pk) — but only when no OTHER branch holds files that would stay
        // under the old layout (schemas are table-wide, branch data is not)
        val opts =
          if (cur.config.primaryKeys.nonEmpty &&
              !cur.config.options.contains("bucket.key-layout") &&
              table.sm.listBranches().isEmpty)
            cur.config.options + ("bucket.key-layout" -> "trimmed-pk")
          else cur.config.options
        table.sm.writeSchema(TableSchema(cur.id + 1, cur.fields,
          cur.config.copy(numBuckets = n, options = opts),
          System.currentTimeMillis()))
        // routing params (bucket count, layout) must not outlive a FAILED
        // rewrite — files would stay under the old routing while new writes
        // route by the new one, splitting a key's versions across buckets.
        // Revert the schema if the overwrite does not commit. (A driver
        // death between the two writes leaves the same window — the read
        // path stays correct regardless: entries carry their writer's
        // schemaId and bucket pruning / chain merges verify per-entry
        // layout before trusting bucket ids.)
        try GraftTable.load(spark, table.location).overwrite(all)
        catch {
          case e: Throwable =>
            table.sm.writeSchema(TableSchema(cur.id + 2, cur.fields,
              cur.config, System.currentTimeMillis()))
            throw e
        }
        ok(s"rescaled to $n buckets")
      case "fast_forward_snapshot" =>
        val s = table.rollback(args("snapshot").toLong)
        ok(s"table set to snapshot ${args("snapshot")} (new ${s.id})")
      case "expire_changelogs" =>
        // decouple changelog lifetime from snapshot lifetime (paimon
        // ExpireChangelogsProcedure): drop stored changelog files of
        // snapshots <= the floor; changelog() falls back to the exact diff
        val floor = args("older_than_snapshot").toLong
        val fs = table.sm.fs
        var n = 0
        table.sm.snapshotIds.filter(_ <= floor).foreach { id =>
          table.sm.readSnapshot(id).changelogFiles.foreach { p =>
            if (fs.delete(new Path(table.location, p), false)) n += 1
          }
        }
        ok(s"deleted $n changelog files up to snapshot $floor")
      case "mark_partition_done" =>
        // partition readiness marker (paimon MarkPartitionDoneProcedure):
        // downstream schedulers poll t$partitions/the marker file
        val part = args("partition")
        table.sm.writeString(
          new Path(table.location, s"partition-mark/$part.done"),
          System.currentTimeMillis().toString)
        ok(s"partition $part marked done")
      case "is_partition_done" =>
        val part = args("partition")
        val done = table.sm.fs.exists(
          new Path(table.location, s"partition-mark/$part.done"))
        ok(s"$done")
      case "create_global_index" =>
        // persisted secondary index over an unclustered column — btree/
        // bitmap (equality + sorted lookups, GlobalIndex), ivf (vector,
        // file-aligned on PK tables), full-text (BM25 postings); the
        // reference's CALL sys.create_global_index(index_column, index_type)
        // surface (docs/multimodal-table/global-index.mdx:119)
        // lazy: the es type can be text-only, with no index_column at all
        lazy val col = args.getOrElse("index_column", args.getOrElse("column",
          throw new IllegalArgumentException("index_column required")))
        args.getOrElse("index_type", "btree") match {
          case "btree" | "bitmap" =>
            // optional partition restriction (the reference's
            // `partitions => …` build argument): specs ';'-separated,
            // key=value pairs within a spec '/'-separated
            val parts = args.get("partitions")
              .map(graft.pipeline.GlobalIndex.parsePartitions).getOrElse(Nil)
            graft.pipeline.GlobalIndex.build(spark, table.location, col, parts)
            ok(s"global index built on $col" +
              (if (parts.isEmpty) "" else s" (${parts.size} partition specs)"))
          case "ivf" | "ivf-flat" | "ivf_flat" | "vector" =>
            // cluster count and metric: CALL argument wins, else the
            // per-field / shared table options resolve inside createVector
            // (ivf-flat is the reference's name for the uncompressed family,
            // vector.mdx:58)
            ok(graft.pipeline.IndexLifecycle.createVector(table, col,
              nClusters = args.get("clusters").orElse(args.get("ivf.nlist"))
                .orElse(args.get("nlist")).map(_.toInt),
              seed = args.getOrElse("seed", "42").toLong,
              metric = args.get("distance.metric")
                .orElse(args.get("ivf.distance.metric"))
                .orElse(args.get("metric"))))
          case "ivf-rq" | "ivf_rq" =>
            // compressed persisted family: cluster partitions + residual
            // codes; ivf-rq.* option spellings resolve inside
            ok(graft.pipeline.IndexLifecycle.createVectorRq(table, col, args))
          case t @ ("ivf-pq" | "ivf-sq" | "diskann" | "ivf-hnsw-flat" |
                    "ivf-hnsw-sq") =>
            // graph ANN and the PQ/SQ spellings are declared non-goals —
            // the engine's compressed persisted family is ivf-rq (same
            // probe/ADC/re-rank contract); reject loudly, never silently
            // build something else
            throw new IllegalArgumentException(
              s"index_type $t is not supported; the compressed persisted " +
                "vector family here is ivf-rq (uncompressed: ivf)")
          case "full-text" | "fulltext" =>
            // tokenizer options arrive as full-text.* keys in the CALL
            // option string (reference spelling) and win over table options
            ok(graft.pipeline.IndexLifecycle.createFullText(table,
              args.getOrElse("id_column",
                table.config.primaryKeys.headOption.getOrElse(
                  throw new IllegalArgumentException(
                    "id_column required for a full-text index on an append table"))),
              col, callOpts = args))
          case "es" =>
            // composite index: index_column = the vector column (optional),
            // text_column, keyword_columns ';'-separated (the CALL option
            // string itself splits on ',')
            ok(graft.pipeline.IndexLifecycle.createEs(table,
              idCol = args.getOrElse("id_column",
                table.config.primaryKeys.headOption.getOrElse(
                  throw new IllegalArgumentException("id_column required"))),
              embedCol = args.get("index_column").filter(_.nonEmpty),
              textCol = args.get("text_column").filter(_.nonEmpty),
              keywordCols = args.get("keyword_columns").toSeq
                .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty),
              nClusters = args.getOrElse("clusters", "16").toInt,
              seed = args.getOrElse("seed", "42").toLong))
          case other =>
            throw new IllegalArgumentException(s"unknown index_type $other " +
              "(btree | bitmap | ivf | full-text | es)")
        }
      case "refresh_global_index" =>
        args.getOrElse("index_type", "btree") match {
          case "btree" | "bitmap" =>
            val col = args.getOrElse("index_column", args("column"))
            graft.pipeline.GlobalIndex.refresh(spark, table.location, col)
            ok(s"global index on $col refreshed incrementally")
          case "ivf" | "ivf-flat" | "ivf_flat" | "ivf-rq" | "ivf_rq" | "vector" =>
            // optional index_column disambiguates when several embedding
            // columns carry indexes (per-column back-references); the
            // refresh dispatches on the PERSISTED kind, so both families
            // share this entry point
            ok(graft.pipeline.IndexLifecycle.refreshVector(table,
              args.get("index_column").orElse(args.get("column"))))
          case "full-text" | "fulltext" =>
            ok(graft.pipeline.IndexLifecycle.refreshFullText(table,
              args.get("index_column").orElse(args.get("column"))))
          case "es" =>
            ok(graft.pipeline.IndexLifecycle.refreshEs(table))
          case other =>
            throw new IllegalArgumentException(s"unknown index_type $other")
        }
      case "drop_global_index" =>
        // dry_run => 'true' (reference drop_global_index dry_run): report
        // the matched index files WITHOUT deleting anything
        val dryRun = args.get("dry_run").exists(_.toBoolean)
        def countFiles(p: Path): Long = {
          val fs = table.sm.fs
          if (!fs.exists(p)) 0L
          else {
            val it = fs.listFiles(p, true)
            var n = 0L
            while (it.hasNext) { it.next(); n += 1 }
            n
          }
        }
        args.getOrElse("index_type", "btree") match {
          case "btree" | "bitmap" =>
            val fs = table.sm.fs
            val c = args.getOrElse("index_column", args("column"))
            val dir = new Path(table.location, s"index/global-$c")
            if (dryRun) ok(s"dry run: would drop ${countFiles(dir)} files of " +
              s"the global index on $c")
            else {
              fs.delete(dir, true)
              fs.delete(new Path(table.location, s"index/global-$c.json"), false)
              ok(s"global index on $c dropped")
            }
          case "ivf" | "ivf-flat" | "ivf_flat" | "ivf-rq" | "ivf_rq" | "vector" =>
            val c = args.get("index_column").orElse(args.get("column"))
            if (dryRun) {
              // same resolution rules as the real drop: explicit column,
              // else the sole index, else an ambiguity error
              val ref = pickRef(graft.pipeline.PkSearch.vectorRefs(table),
                c, "vector", table.location)
              ok(s"dry run: would drop ${countFiles(new Path(ref.idxLoc))} " +
                s"files of the vector index on ${ref.embedCol}")
            } else ok(graft.pipeline.IndexLifecycle.dropVector(table, c))
          case "full-text" | "fulltext" =>
            val c = args.get("index_column").orElse(args.get("column"))
            if (dryRun) {
              val ref = pickRef(graft.pipeline.PkSearch.fullTextRefs(table),
                c, "full-text", table.location)
              val n = ref.idxLoc.map(l => countFiles(new Path(l)) +
                countFiles(new Path(graft.pipeline.Indexes.termStatsLoc(l))))
                .getOrElse(0L)
              ok(s"dry run: would drop $n files of the full-text index on " +
                ref.textCol)
            } else ok(graft.pipeline.IndexLifecycle.dropFullText(table, c))
          case "es" =>
            if (dryRun) {
              val loc = graft.pipeline.IndexLifecycle.esRef(table)
                .getOrElse(throw new IllegalArgumentException(
                  s"${table.location}: no es index"))
              val n = countFiles(new Path(loc)) +
                countFiles(new Path(loc + "__text")) +
                countFiles(new Path(
                  graft.pipeline.Indexes.termStatsLoc(loc + "__text")))
              ok(s"dry run: would drop $n files of the es index")
            } else ok(graft.pipeline.IndexLifecycle.dropEs(table))
          case other =>
            throw new IllegalArgumentException(s"unknown index_type $other")
        }
      case "migrate_table" =>
        // import an external format directory (paimon MigrateTableProcedure)
        val snap = CopyInto.copyIn(spark, table, args("source_path"),
          args.getOrElse("format", "parquet"))
        ok(s"migrated ${args("source_path")} (snapshot ${snap.id})")
      case "expire_tags" =>
        // drop tags older than a timestamp (paimon ExpireTagsProcedure)
        val olderThan = args("older_than_ms").toLong
        val victims = table.sm.listTags().filter(_.timestampMs < olderThan)
        victims.foreach(tg => table.sm.deleteTag(tg.name))
        ok(s"expired ${victims.size} tags")
      case "replace_tag" =>
        // retarget an EXISTING tag (paimon ReplaceTagProcedure)
        table.sm.readTag(args("tag")) // must exist
        val snap = args.get("snapshot").map(_.toLong)
          .orElse(table.sm.latestSnapshotId).get
        table.sm.createTag(args("tag"), snap)
        ok(s"tag ${args("tag")} -> snapshot $snap (replaced)")
      case "rename_branch" =>
        val (from, to) = (args("branch"), args("target_branch"))
        require(table.sm.branchExists(from), s"no branch $from")
        require(!table.sm.branchExists(to), s"branch $to exists")
        val fs = table.sm.fs
        require(fs.rename(new Path(table.sm.branchRootDir, from),
          new Path(table.sm.branchRootDir, to)), "rename failed")
        ok(s"branch $from -> $to")
      case "merge_branch" =>
        // merge a branch's state into main (paimon MergeBranchProcedure);
        // same file-set replay as fast_forward, branch kept
        val s = table.fastForward(args("branch"))
        ok(s"merged branch ${args("branch")} into main (snapshot ${s.id})")
      case "copy" =>
        // paimon sys.copy (CopyProcedure): file-level copy into
        // target_table WITHOUT rewriting rows; `where` is an exact
        // partition predicate selecting which source partitions move. The
        // target is created with the source's layout when absent.
        val dstLoc = args("target_table")
        val tgt =
          if (GraftTable.exists(spark, dstLoc)) {
            val t0 = GraftTable.load(spark, dstLoc)
            require(t0.schema.fields.map(f => (f.name, f.dataType)) ==
              table.schema.fields.map(f => (f.name, f.dataType)),
              "copy requires identical schemas")
            require(t0.config.isPrimaryKeyed == table.config.isPrimaryKeyed,
              "copy requires matching table kinds")
            t0
          } else GraftTable.create(spark, dstLoc, table.dataSchema, table.config)
        val whereEntries = args.get("where") match {
          case Some(w) =>
            val cond = StatsPrune.resolve(spark, table.dataSchema, expr(w))
            val refs = cond.references.map(_.name).toSet
            require(refs.nonEmpty &&
              refs.subsetOf(table.config.partitionKeys.toSet),
              "copy `where` must reference partition columns only")
            table.planFiles().filter(e =>
              StatsPrune.partitionMatches(cond, table.dataSchema, e.partition))
          case None => table.planFiles()
        }
        require(whereEntries.forall(_.schemaId == table.sm.latestSchemaId),
          "copy requires the source fully on its latest schema " +
            "(run a compaction there first)")
        val (sLoc, dLoc) = (table.location, tgt.location)
        val hc = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        val nCopied = spark.sparkContext
          .parallelize(whereEntries.map(_.path), 32)
          .map { rel =>
            val sfs = new Path(sLoc, rel).getFileSystem(hc.value)
            val dfs = new Path(dLoc, rel).getFileSystem(hc.value)
            org.apache.hadoop.fs.FileUtil.copy(
              sfs, new Path(sLoc, rel),
              dfs, new Path(dLoc, rel), false, true, hc.value)
            1L
          }.sum()
        val snap = tgt.sm.commit(
          whereEntries.map(_.copy(schemaId = tgt.schema.id)),
          "APPEND", s"copy-${UUID.randomUUID().toString.take(8)}",
          tgt.schema.id)
        ok(s"copied ${nCopied.toLong} files to $dstLoc (snapshot ${snap.id})")
      case "copy_files" =>
        // copy another graft table's live data files into this one WITHOUT
        // rewriting rows (paimon CopyFilesProcedure): bytes move in a
        // distributed job; the driver commits the carried-over entries
        val src = GraftTable.load(spark, args("source_table"))
        require(src.schema.fields.map(f => (f.name, f.dataType)) ==
          table.schema.fields.map(f => (f.name, f.dataType)),
          "copy_files requires identical schemas")
        require(src.config.isPrimaryKeyed == table.config.isPrimaryKeyed,
          "copy_files requires matching table kinds")
        val entries = src.planFiles()
        require(entries.forall(_.schemaId == src.sm.latestSchemaId),
          "copy_files requires the source fully on its latest schema " +
            "(run a compaction there first)")
        val (srcLoc, dstLoc) = (src.location, table.location)
        val hconf = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        val copied = spark.sparkContext.parallelize(entries.map(_.path), 32)
          .map { rel =>
            val sfs = new Path(srcLoc, rel).getFileSystem(hconf.value)
            val dfs = new Path(dstLoc, rel).getFileSystem(hconf.value)
            org.apache.hadoop.fs.FileUtil.copy(
              sfs, new Path(srcLoc, rel),
              dfs, new Path(dstLoc, rel), false, true, hconf.value)
            1L
          }.sum()
        // entries re-home under the TARGET's current schema id (schemas
        // verified identical above)
        val snap = table.sm.commit(entries.map(_.copy(schemaId = table.schema.id)),
          "APPEND", s"copy-files-${UUID.randomUUID().toString.take(8)}",
          table.schema.id)
        ok(s"copied ${copied.toLong} files from ${args("source_table")} (snapshot ${snap.id})")
      case "iceberg_export" =>
        // manual trigger of the iceberg metadata export (auto-runs on commit
        // when metadata.iceberg.storage is set)
        IcebergExport.export(table) match {
          case Some(v) => ok(s"iceberg metadata v$v written")
          case None => ok("skipped (no snapshot, mixed schemas, or PK table " +
            "not fully merged)")
        }
      case "clone" =>
        // clone this table into another graft table (paimon CloneProcedure /
        // CloneAction): partition-OVERWRITE semantics carried by the data,
        // reentrant — an existing target must contain all source fields and
        // share the partition keys; optional `where` filter and `meta_only`.
        // The copy itself is one distributed read→write, never driver rows.
        val targetLoc = args("target")
        val where = args.get("where").map(expr)
        val tgt =
          if (GraftTable.exists(spark, targetLoc)) {
            val t0 = GraftTable.load(spark, targetLoc)
            val tgtFields = t0.schema.fields.map(f => (f.name, f.dataType)).toSet
            require(table.schema.fields.map(f => (f.name, f.dataType))
              .forall(tgtFields), "clone requires the existing target to " +
              "contain all fields of the source table")
            require(t0.config.partitionKeys == table.config.partitionKeys,
              "clone requires matching partition fields")
            t0
          } else {
            // reference clone targets an append table; keep the source's
            // layout by default, `as_append => true` drops the PK + engine
            val cfg = if (args.get("as_append").contains("true"))
              table.config.copy(primaryKeys = Nil, mergeEngine = "deduplicate",
                sequenceField = None)
            else table.config
            GraftTable.create(spark, targetLoc, table.dataSchema, cfg)
          }
        if (args.get("meta_only").contains("true"))
          ok(s"cloned schema to $targetLoc")
        else {
          val snap = tgt.overwrite(table.read(filter = where),
            dynamic = tgt.config.partitionKeys.nonEmpty)
          ok(s"cloned to $targetLoc (snapshot ${snap.id})")
        }
      case "repair" =>
        // reconcile persisted metadata with the filesystem (paimon
        // RepairProcedure): drop entries whose file vanished, refresh caches
        val fs = table.sm.fs
        val missing = table.planFiles().filter(e =>
          !fs.exists(new Path(table.location, e.path)))
        if (missing.nonEmpty)
          table.sm.commit(missing.map(_.copy(kind = 1)), "OVERWRITE",
            "repair", table.schema.id)
        FileIndexStore.invalidate(table.location)
        ok(s"repaired: ${missing.size} dangling entries removed")
      case "repair_earliest_snapshot" =>
        // paimon RepairEarliestSnapshotProcedure: make `snapshot_id` a sound
        // earliest point after manual snapshot-dir damage. Our earliest is
        // DERIVED by listing (no hint file to drift), so the repair is:
        // drop unreadable snapshot jsons below the target id.
        val target = args("snapshot_id").toLong
        require(table.sm.snapshotExists(target), s"no snapshot $target")
        val prev = table.sm.snapshotIds.headOption.getOrElse(-1L)
        val broken = table.sm.snapshotIds.filter(_ < target).filter { id =>
          try { table.sm.readSnapshot(id); false }
          catch { case _: Exception => true }
        }
        broken.foreach(id => table.sm.fs.delete(
          new Path(table.sm.snapshotDir, s"snapshot-$id.json"), false))
        ok(s"previous_earliest=$prev current_earliest=" +
          s"${table.sm.snapshotIds.headOption.getOrElse(-1L)} " +
          s"(removed ${broken.size} unreadable)")
      case "trigger_tag_automatic_creation" =>
        // materialize the configured automatic tag for the CURRENT snapshot
        // (paimon TriggerTagAutomaticCreationProcedure): watermark mode tags
        // by the snapshot watermark, process-time mode by wall-clock day
        val mode = table.config.option("tag.automatic-creation", "none")
        val latest = table.sm.latestSnapshotId
          .getOrElse(throw new IllegalStateException("no snapshots"))
        val name = mode match {
          case "watermark" =>
            val w = table.sm.readSnapshot(latest).watermarkLong
              .getOrElse(throw new IllegalStateException("snapshot has no watermark"))
            s"watermark-$w"
          case "process-time" =>
            java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
          case other => throw new IllegalArgumentException(
            s"tag.automatic-creation=$other (set watermark|process-time)")
        }
        if (table.sm.listTags().exists(_.name == name)) ok(s"tag $name already exists")
        else { table.sm.createTag(name, latest); ok(s"tag $name -> snapshot $latest") }
      case "dedup_corpus" =>
        // SQL surface of the dedup pipeline (the LLM-training-data
        // operators' CALL spelling, parity with the index lifecycle): runs
        // the chosen candidate generator + connected components +
        // canonicalization over the table's corpus and WRITES a PK
        // components table (id, canonical) at `output` — the keep/drop
        // input of any downstream dedup filter. Methods map to the library
        // operators: exact (content-hash groups), minhash (banded LSH +
        // exact verify), simhash (banded hamming). All stay
        // candidate-bucketed — no all-pairs stage at any scale.
        val idCol = args.getOrElse("id_col", "id")
        val textCol = args.getOrElse("text_col", "text")
        val method = args.getOrElse("method", "exact")
        val out = args.getOrElse("output", s"${table.location}_dedup")
        val docs = table.read()
        val pairs = method match {
          case "exact" =>
            val fp = docs.select(col(idCol), md5(col(textCol)).as("__fp"))
            fp.alias("a").join(fp.alias("b"),
                col("a.__fp") === col("b.__fp") &&
                  col(s"a.$idCol") < col(s"b.$idCol"))
              .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"))
          case "minhash" =>
            graft.pipeline.Dedup.minhashLshPairs(docs, idCol, textCol,
              shingleN = args.getOrElse("shingle_n", "3").toInt,
              sigLen = args.getOrElse("sig_len", "8").toInt,
              nBands = args.getOrElse("n_bands", "4").toInt,
              threshold = args.getOrElse("threshold", "0.8").toDouble)
              .select("v1", "v2")
          case "simhash" =>
            graft.pipeline.Dedup.simhashPairs(docs, idCol, textCol,
              maxHamming = args.getOrElse("max_hamming", "3").toInt)
              .select("v1", "v2")
          case other => throw new IllegalArgumentException(
            s"dedup_corpus method => '$other' (exact|minhash|simhash)")
        }
        val components = graft.pipeline.Dedup.canonicalize(docs, idCol, pairs)
        val outT = GraftTable.createOrReplace(spark, out, components.schema,
          TableConfig(primaryKeys = Seq(idCol),
            numBuckets = args.getOrElse("output_buckets", "4").toInt))
        outT.write(components)
        val total = outT.read().count()
        val kept = outT.read().filter(col(idCol) === col("canonical")).count()
        ok(s"dedup_corpus($method): $total docs -> $kept canonical at $out")
      case other => throw new IllegalArgumentException(s"unknown procedure $other")
    }
  }
}

/**
 * Durable consumer registry + incremental change consumption (paimon
 * consumer-id files, paimon-core/.../consumer/ConsumerManager.java): a
 * consumer records the next snapshot to read; `nextBatch` returns the
 * changes since, and `commit` advances the cursor. Snapshot expiry can
 * honor registered consumers.
 */
object Consumers {
  private def dir(t: GraftTable) = new Path(t.location, "consumer")
  private def file(t: GraftTable, id: String) = new Path(dir(t), s"$id.json")

  case class ConsumerState(consumerId: String, nextSnapshot: Long)

  def get(t: GraftTable, id: String): Option[ConsumerState] = {
    val p = file(t, id)
    if (t.sm.fs.exists(p)) Some(Json.read(t.sm.readString(p), classOf[ConsumerState]))
    else None
  }
  def reset(t: GraftTable, id: String, next: Option[Long]): Unit =
    t.sm.writeString(file(t, id),
      Json.write(ConsumerState(id, next.getOrElse(t.sm.latestSnapshotId.getOrElse(0L) + 1))))
  def clear(t: GraftTable): Int = {
    val d = dir(t)
    if (!t.sm.fs.exists(d)) 0
    else { val n = t.sm.fs.listStatus(d).length; t.sm.fs.delete(d, true); n }
  }
  def list(t: GraftTable): Seq[ConsumerState] = {
    val d = dir(t)
    if (!t.sm.fs.exists(d)) Nil
    else t.sm.fs.listStatus(d).toSeq
      .map(s => Json.read(t.sm.readString(s.getPath), classOf[ConsumerState]))
  }

  /** Drop consumers idle longer than `maxAgeMs` (paimon
    * consumer.expiration-time, ConsumerManager.expire): a crashed reader's
    * cursor must not pin snapshot history forever. Idleness = consumer-file
    * modification time (each processed batch rewrites it). */
  def expireStale(t: GraftTable, maxAgeMs: Long): Int = {
    val d = dir(t)
    if (!t.sm.fs.exists(d)) return 0
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val victims = t.sm.fs.listStatus(d).toSeq
      .filter(s => s.getModificationTime < cutoff)
    victims.foreach(s => t.sm.fs.delete(s.getPath, false))
    victims.size
  }

  /** Pull the next change batch for `id` (rows added since the consumer's
    * cursor, merged per key for PK tables). Returns (endSnapshot, rows);
    * call `commit` after processing for at-least-once consumption. */
  def nextBatch(t: GraftTable, id: String): Option[(Long, DataFrame)] = {
    val latest = t.sm.latestSnapshotId.getOrElse(return None)
    val from = get(t, id).map(_.nextSnapshot - 1).getOrElse(0L)
    if (from >= latest) return None
    Some((latest, t.incremental(from, latest)))
  }
  def commit(t: GraftTable, id: String, endSnapshot: Long): Unit =
    t.sm.writeString(file(t, id), Json.write(ConsumerState(id, endSnapshot + 1)))
}

/**
 * COPY INTO (bulk import/export, paimon PaimonSqlExtensions.g4:77-89 +
 * spark/copyinto/): thin bridges between external format directories and
 * graft tables, with cast-to-schema alignment handled by the writer.
 */
object CopyInto {
  /** Spark datasource for an interchange format name ("avro"/"row" map to
    * the engine's own FileFormats — Spark ships neither). */
  private def provider(format: String): String = format match {
    case "avro" => "graft-avro"
    case "row" => "graft-row"
    case f => f
  }

  /** COPY table FROM path (csv/json/parquet/avro/row). */
  def copyIn(spark: SparkSession, t: GraftTable, path: String, format: String,
             options: Map[String, String] = Map.empty): SnapshotMeta = {
    val reader = spark.read.format(provider(format)).options(options)
    val df = (if (format == "parquet") reader
              else reader.schema(t.schema.sparkSchema)).load(path)
    t.write(df)
  }
  /** COPY table TO path (csv/json/parquet/avro/row). */
  def copyOut(t: GraftTable, path: String, format: String,
              options: Map[String, String] = Map.empty): Unit =
    t.read().write.format(provider(format)).options(options)
      .mode("overwrite").save(path)
}

/** Point lookup: key → current row(s), served by manifest pruning + a
  * filtered scan of only the bucket files that can contain the key (paimon
  * LocalTableQuery.lookup, paimon-core/.../table/query/LocalTableQuery.java:226).
  * Driver-friendly: the scan touches one bucket per key. */
object Lookup {
  def apply(t: GraftTable, keyValues: Map[String, Any]): DataFrame = {
    require(t.config.primaryKeys.nonEmpty, "lookup requires a primary-keyed table")
    val cond = keyValues.map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
    t.read(filter = Some(cond))
  }
}
