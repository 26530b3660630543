package graft

import graft.core._
import graft.pipeline.Blob
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Table-integrated blob storage (reference multimodal-table/blob.mdx):
  * `__BLOB_FIELD` / `__BLOB_DESCRIPTOR_FIELD` / `__BLOB_VIEW_FIELD` comment
  * directives, transparent out-of-line payload storage, the
  * `blob-as-descriptor` read switch, and blob views resolved from an
  * upstream row-tracking table. */
class BlobTableSpec extends SparkTestBase {

  private lazy val wh = Files.createTempDirectory("graft-blob-wh").toString

  override lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-blob-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gb", "graft.dsv2.GraftCatalog")
    .config("spark.sql.catalog.gb.warehouse", wh)
    .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
    .config("spark.hadoop.fs.file.impl", classOf[NoForkLocalFileSystem].getName)
    .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
      classOf[NoForkLocalFs].getName)
    .getOrCreate()

  import spark.implicits._

  private def payload(i: Int): Array[Byte] =
    (s"payload-$i-" + ("x" * 64)).getBytes(UTF_8)

  test("__BLOB_FIELD directive: out-of-line write, transparent read") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.images (
        id INT,
        name STRING,
        image BINARY COMMENT '__BLOB_FIELD; product image')
        TBLPROPERTIES ('row-tracking.enabled'='true')""")
    val t = GraftTable.load(spark, s"$wh/db.db/images")
    assert(t.config.options.get("blob-field").contains("image"))
    assert(t.schema.sparkSchema.fields.find(_.name == "image")
      .get.getComment().contains("product image"))
    (1 to 6).map(i => (i, s"n$i", payload(i))).toDF("id", "name", "image")
      .createOrReplaceTempView("img_src")
    spark.sql("INSERT INTO gb.db.images SELECT * FROM img_src")
    // payloads moved out of line into <loc>/blob
    val blobDir = new org.apache.hadoop.fs.Path(s"$wh/db.db/images/blob")
    val fs = blobDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(blobDir) && fs.listStatus(blobDir).nonEmpty)
    // stored form is a descriptor, not the payload
    val stored = t.readRaw().select("image").as[Array[Byte]].head()
    assert(Blob.tryParseDesc(stored).isDefined)
    // transparent read returns the original bytes (SQL + library paths)
    val viaSql = spark.sql("SELECT id, image FROM gb.db.images ORDER BY id")
      .as[(Int, Array[Byte])].collect()
    assert(viaSql.forall { case (i, b) => b.sameElements(payload(i)) })
    val viaLib = t.read().select("id", "image").as[(Int, Array[Byte])].collect()
    assert(viaLib.forall { case (i, b) => b.sameElements(payload(i)) })
    // projections not touching the blob column stay on the native scan
    val plan = spark.sql("SELECT id, name FROM gb.db.images")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BatchScan"), s"expected native scan, got:\n$plan")
    // blob-as-descriptor=true returns the serialized descriptor; the bridge
    // functions render it
    spark.sql("ALTER TABLE gb.db.images SET TBLPROPERTIES ('blob-as-descriptor'='true')")
    val rendered = spark.sql(
      """SELECT graft_descriptor_to_string(graft_descriptor_from_bytes(image))
         FROM gb.db.images WHERE id = 1""").as[String].head()
    assert(rendered.startsWith("BlobDescriptor{uri="))
    spark.sql("ALTER TABLE gb.db.images SET TBLPROPERTIES ('blob-as-descriptor'='false')")
  }

  test("blob table: compaction and row-level ops keep payloads intact") {
    val loc = Files.createTempDirectory("graft-blob-lib").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1, payload(1))).toDF("id", "image").schema,
      TableConfig(primaryKeys = Seq("id"), numBuckets = 1,
        options = Map("blob-field" -> "image")))
    t.write((1 to 4).map(i => (i, payload(i))).toDF("id", "image"))
    t.write(Seq((2, payload(200))).toDF("id", "image")) // PK upsert
    import graft.core.RowOps._
    t.compact()
    val afterCompact = t.read().select("id", "image")
      .as[(Int, Array[Byte])].collect().toMap
    assert(afterCompact(1).sameElements(payload(1)))
    assert(afterCompact(2).sameElements(payload(200)))
    // stored form after compaction is still a descriptor (no double wrap,
    // no inlined bytes)
    val stored = t.readRaw().select("image").as[Array[Byte]].collect()
    assert(stored.forall(b => Blob.tryParseDesc(b).isDefined))
    // SQL DELETE against the pk table leaves the survivors readable
    t.delete(col("id") === 3)
    assert(t.read().count() == 3)
    assert(t.read().where(col("id") === 4).select("image")
      .as[Array[Byte]].head().sameElements(payload(4)))
  }

  test("blob.target-file-size rolls the per-task payload file") {
    val loc = Files.createTempDirectory("graft-blob-roll").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1, payload(1))).toDF("id", "image").schema,
      TableConfig(options = Map("blob-field" -> "image",
        "blob.target-file-size" -> "200b")))
    // ~76-byte payloads, 200-byte target → several files even in one task
    t.write((1 to 20).map(i => (i, payload(i))).toDF("id", "image").coalesce(1))
    val fs = new org.apache.hadoop.fs.Path(s"$loc/blob")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$loc/blob"))
    assert(files.length > 3, s"expected rolled blob files, got ${files.length}")
    assert(files.forall(_.getLen <= 300), "rolled files stay near the target")
    val got = t.read().select("id", "image").as[(Int, Array[Byte])].collect()
    assert(got.length == 20 && got.forall { case (i, b) => b.sameElements(payload(i)) })
    // bad size strings fail loudly
    intercept[IllegalArgumentException] {
      graft.pipeline.Blob.parseMemorySize("12 parsecs")
    }
    assert(graft.pipeline.Blob.parseMemorySize("1 GB") == (1L << 30))
    assert(graft.pipeline.Blob.parseMemorySize("128mb") == (128L << 20))
    assert(graft.pipeline.Blob.parseMemorySize("4096") == 4096L)
  }

  test("__BLOB_VIEW_FIELD: upstream refs resolve at read; resolve switch; forwarding") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.up (
        id INT,
        image BINARY COMMENT '__BLOB_FIELD')
        TBLPROPERTIES ('row-tracking.enabled'='true')""")
    (1 to 5).map(i => (i, payload(i))).toDF("id", "image")
      .createOrReplaceTempView("up_src")
    spark.sql("INSERT INTO gb.db.up SELECT * FROM up_src")
    spark.sql("""CREATE TABLE gb.db.view1 (
        id INT,
        label STRING,
        image_ref BINARY COMMENT '__BLOB_VIEW_FIELD')
        TBLPROPERTIES ('row-tracking.enabled'='true')""")
    // write refs via the SQL function over the upstream row-tracking table
    spark.sql("""INSERT INTO gb.db.view1
        SELECT id, concat('L', id), graft_blob_view('db.up', 'image', row_id)
        FROM gb.db.`up$row_tracking`""")
    // resolved read returns the upstream payloads without copying them
    val got = spark.sql("SELECT id, image_ref FROM gb.db.view1 ORDER BY id")
      .as[(Int, Array[Byte])].collect()
    assert(got.length == 5)
    assert(got.forall { case (i, b) => b.sameElements(payload(i)) })
    // no .blob files were created for the view table
    val fs = new org.apache.hadoop.fs.Path(s"$wh/db.db/view1")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$wh/db.db/view1/blob")))
    // resolve switch off: the serialized ref comes back verbatim
    val raw = spark.read.format("graft")
      .option("blob-view.resolve.enabled", "false")
      .load(s"$wh/db.db/view1").select("image_ref").as[Array[Byte]].head()
    val ref = Blob.tryParseViewRef(raw)
    assert(ref.isDefined && ref.get.table == "db.up" && ref.get.field == "image")
    // forwarding: importing refs read under resolve=false into another view
    // table keeps them pointing at the ORIGINAL upstream
    spark.sql("""CREATE TABLE gb.db.view2 (
        id INT,
        image_ref BINARY COMMENT '__BLOB_VIEW_FIELD')""")
    spark.read.format("graft").option("blob-view.resolve.enabled", "false")
      .load(s"$wh/db.db/view1").select(col("id"), col("image_ref"))
      .createOrReplaceTempView("fwd_src")
    spark.sql("INSERT INTO gb.db.view2 SELECT * FROM fwd_src")
    val storedV2 = GraftTable.load(spark, s"$wh/db.db/view2")
      .readRaw().select("image_ref").as[Array[Byte]].head()
    assert(Blob.tryParseViewRef(storedV2).exists(_.table == "db.up"))
    val got2 = spark.sql("SELECT id, image_ref FROM gb.db.view2 ORDER BY id")
      .as[(Int, Array[Byte])].collect()
    assert(got2.forall { case (i, b) => b.sameElements(payload(i)) })
    // upstream mutation is visible through the view (row ids survive)
    spark.sql("UPDATE gb.db.up SET image = CAST('fresh-bytes' AS BINARY) WHERE id = 2")
    val after = spark.sql("SELECT image_ref FROM gb.db.view1 WHERE id = 2")
      .as[Array[Byte]].head()
    assert(new String(after, UTF_8) == "fresh-bytes")
  }

  test("collection blob storage: ARRAY<BINARY> and MAP<K, BINARY> blob fields") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.media (
        id INT,
        content BINARY COMMENT '__BLOB_FIELD; media content',
        attachments ARRAY<BINARY> COMMENT '__BLOB_FIELD; related files',
        renditions MAP<STRING, BINARY> COMMENT '__BLOB_FIELD; named renditions')
        TBLPROPERTIES ('primary-key'='id', 'bucket'='1')""")
    spark.sql("""INSERT INTO gb.db.media VALUES
        (1, X'89504E470D0A1A0A', array(X'25504446', CAST(NULL AS BINARY)),
         map('thumbnail', X'89504E47'))""")
    // each non-null element/value externalized, stored form descriptors
    val t = GraftTable.load(spark, s"$wh/db.db/media")
    val raw = t.readRaw().selectExpr("content", "attachments[0]", "renditions['thumbnail']")
      .as[(Array[Byte], Array[Byte], Array[Byte])].head()
    assert(Blob.tryParseDesc(raw._1).isDefined)
    assert(Blob.tryParseDesc(raw._2).isDefined)
    assert(Blob.tryParseDesc(raw._3).isDefined)
    // read resolves scalar, array elements (nulls preserved) and map values
    val got = spark.sql(
      """SELECT hex(content), hex(attachments[0]), attachments[1] IS NULL,
                hex(renditions['thumbnail'])
         FROM gb.db.media""").as[(String, String, Boolean, String)].head()
    assert(got == (("89504E470D0A1A0A", "25504446", true, "89504E47")))
    // PK upsert + compaction keep collection payloads intact
    spark.sql("""INSERT INTO gb.db.media VALUES
        (1, X'FF', array(X'AA'), map('k', X'BB'))""")
    graft.core.Procedures.call(spark, t, "compact", Map.empty).collect()
    val after = spark.sql(
      """SELECT hex(content), hex(attachments[0]), hex(renditions['k'])
         FROM gb.db.media""").as[(String, String, String)].head()
    assert(after == (("FF", "AA", "BB")))
    // descriptor/view directives stay scalar-only
    intercept[Exception] {
      spark.sql("""CREATE TABLE gb.db.media_bad (
          id INT, refs ARRAY<BINARY> COMMENT '__BLOB_VIEW_FIELD')""")
    }
  }

  test("remove_orphan_files cleans blob files only expired snapshots referenced") {
    val loc = Files.createTempDirectory("graft-blob-orph").toString + "/t"
    import graft.core.RowOps._
    val t = GraftTable.create(spark, loc,
      Seq((1, payload(1))).toDF("id", "image").schema,
      TableConfig(options = Map("blob-field" -> "image")))
    t.write((1 to 4).map(i => (i, payload(i))).toDF("id", "image").coalesce(1))
    val blobRoot = new org.apache.hadoop.fs.Path(s"$loc/blob")
    val fs = blobRoot.getFileSystem(spark.sessionState.newHadoopConf())
    def blobFiles = fs.listStatus(blobRoot).map(_.getPath.getName).toSet
    val firstGen = blobFiles
    assert(firstGen.nonEmpty)
    // a full overwrite writes fresh payloads into NEW blob files
    t.overwrite((1 to 4).map(i => (i, payload(i + 100)))
      .toDF("id", "image").coalesce(1))
    assert((blobFiles -- firstGen).nonEmpty)
    // the pre-overwrite snapshot still references the first generation: an
    // aggressive orphan sweep must keep it
    assert(t.removeOrphanFiles(System.currentTimeMillis() + 60000) == 0)
    // expire it; now the first generation is orphaned
    t.expireSnapshots(1)
    val deleted = t.removeOrphanFiles(System.currentTimeMillis() + 60000)
    assert(deleted >= firstGen.size, s"deleted=$deleted of ${firstGen.size}")
    assert(blobFiles.intersect(firstGen).isEmpty)
    // survivors read intact
    val got = t.read().select("id", "image").as[(Int, Array[Byte])].collect()
    assert(got.length == 4)
    assert(got.forall { case (i, b) => b.sameElements(payload(i + 100)) })
  }

  test("row-level ops keep stored blob forms: MERGE never freezes a view ref") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.up2 (
        id INT, image BINARY COMMENT '__BLOB_FIELD')
        TBLPROPERTIES ('row-tracking.enabled'='true')""")
    (1 to 3).map(i => (i, payload(i))).toDF("id", "image")
      .createOrReplaceTempView("up2_src")
    spark.sql("INSERT INTO gb.db.up2 SELECT * FROM up2_src")
    spark.sql("""CREATE TABLE gb.db.pkview (
        id INT, label STRING, image_ref BINARY COMMENT '__BLOB_VIEW_FIELD')
        TBLPROPERTIES ('primary-key'='id', 'bucket'='1')""")
    spark.sql("""INSERT INTO gb.db.pkview
        SELECT id, concat('L', id), graft_blob_view('db.up2', 'image', row_id)
        FROM gb.db.`up2$row_tracking`""")
    // MERGE updates an unrelated column — the stored ref must survive
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pkv_src AS SELECT 2 AS id, 'L2x' AS label")
    spark.sql("""MERGE INTO gb.db.pkview t USING pkv_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET label = s.label""")
    val stored = GraftTable.load(spark, s"$wh/db.db/pkview")
      .readRaw().where(col("id") === 2).select("image_ref").as[Array[Byte]].head()
    assert(Blob.tryParseViewRef(stored).exists(_.table == "db.up2"),
      "MERGE materialized the view reference into frozen bytes")
    // an upstream UPDATE still propagates through the merged row's ref
    spark.sql("UPDATE gb.db.up2 SET image = CAST('v2' AS BINARY) WHERE id = 2")
    val after = spark.sql(
      "SELECT label, image_ref FROM gb.db.pkview WHERE id = 2")
      .as[(String, Array[Byte])].head()
    assert(after._1 == "L2x" && new String(after._2, UTF_8) == "v2")
  }

  test("ALTER ADD COLUMN: comment persists, blob/vector directives register") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("CREATE TABLE gb.db.addc (id INT, b0 BINARY COMMENT '__BLOB_FIELD')")
    spark.sql("ALTER TABLE gb.db.addc ADD COLUMN note STRING COMMENT 'customer note'")
    spark.sql("ALTER TABLE gb.db.addc ADD COLUMN pic BINARY COMMENT '__BLOB_FIELD; the pic'")
    spark.sql("ALTER TABLE gb.db.addc ADD COLUMN emb ARRAY<FLOAT> COMMENT '__VECTOR_FIELD;2'")
    val t = GraftTable.load(spark, s"$wh/db.db/addc")
    val bySchema = t.schema.sparkSchema.fields.map(f => f.name -> f.getComment()).toMap
    assert(bySchema("note").contains("customer note"))
    assert(bySchema("pic").contains("the pic"))
    // list option merged with the CREATE-time member; dimension armed
    assert(t.config.options.get("blob-field").contains("b0,pic"))
    assert(t.config.options.get("fields.emb.dimension").contains("2"))
    spark.sql("INSERT INTO gb.db.addc VALUES (1, X'01', 'n', X'0203', array(1.0f, 0.0f))")
    intercept[Exception] {
      spark.sql("INSERT INTO gb.db.addc VALUES (2, X'01', 'n', X'02', array(1.0f))")
    }
    val got = spark.sql("SELECT hex(pic) FROM gb.db.addc").as[String].head()
    assert(got == "0203")
    assert(Blob.tryParseDesc(t.readRaw().select("pic").as[Array[Byte]].head()).isDefined)
  }

  test("RENAME COLUMN carries blob/vector option registrations along") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.rn (
        id INT, blob BINARY COMMENT '__BLOB_FIELD',
        emb ARRAY<FLOAT> COMMENT '__VECTOR_FIELD;2')""")
    spark.sql("INSERT INTO gb.db.rn VALUES (1, X'AB', array(1.0f, 0.0f))")
    spark.sql("ALTER TABLE gb.db.rn RENAME COLUMN blob TO payload")
    spark.sql("ALTER TABLE gb.db.rn RENAME COLUMN emb TO vec")
    val t = GraftTable.load(spark, s"$wh/db.db/rn")
    assert(t.config.options.get("blob-field").contains("payload"))
    assert(t.config.options.get("fields.vec.dimension").contains("2"))
    assert(!t.config.options.contains("fields.emb.dimension"))
    // resolution keeps working under the new name; enforcement too
    assert(spark.sql("SELECT hex(payload) FROM gb.db.rn").as[String].head() == "AB")
    spark.sql("INSERT INTO gb.db.rn VALUES (2, X'CD', array(0.0f, 1.0f))")
    intercept[Exception] {
      spark.sql("INSERT INTO gb.db.rn VALUES (3, X'EF', array(1.0f))")
    }
    assert(GraftTable.load(spark, s"$wh/db.db/rn").readRaw()
      .select("payload").as[Array[Byte]].collect()
      .forall(b => Blob.tryParseDesc(b).isDefined))
  }

  test("__BLOB_DESCRIPTOR_FIELD: external descriptors stored inline, resolved on read") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    // an external payload file the descriptor points at
    val extDir = Files.createTempDirectory("graft-blob-ext")
    val extFile = extDir.resolve("payload.bin")
    Files.write(extFile, "external-payload-bytes".getBytes(UTF_8))
    spark.sql("""CREATE TABLE gb.db.descs (
        id INT,
        thumb BINARY COMMENT '__BLOB_DESCRIPTOR_FIELD; thumbnail')""")
    val t = GraftTable.load(spark, s"$wh/db.db/descs")
    assert(t.config.options.get("blob-descriptor-field").contains("thumb"))
    val desc = Blob.serializeDesc(s"file:$extFile", 0L,
      Files.size(extFile))
    Seq((1, desc)).toDF("id", "thumb").createOrReplaceTempView("desc_src")
    spark.sql("INSERT INTO gb.db.descs SELECT * FROM desc_src")
    // descriptor bytes stay inline (no blob split for descriptor fields)
    val fs = new org.apache.hadoop.fs.Path(s"$wh/db.db/descs")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$wh/db.db/descs/blob")))
    // default read resolves the external range
    val b = spark.sql("SELECT thumb FROM gb.db.descs").as[Array[Byte]].head()
    assert(new String(b, UTF_8) == "external-payload-bytes")
  }

  test("orphan sweep survives blob column rename (field-id remapped discovery)") {
    val loc = Files.createTempDirectory("graft-blob-ren-orph").toString + "/t"
    import graft.core.RowOps._
    val t = GraftTable.create(spark, loc,
      Seq((1, payload(1))).toDF("id", "image").schema,
      TableConfig(options = Map("blob-field" -> "image")))
    t.write((1 to 4).map(i => (i, payload(i))).toDF("id", "image").coalesce(1))
    // rename the blob column: gen-1 files keep the OLD physical parquet
    // name; orphan discovery must still see their descriptors through the
    // field-id remap (a raw current-name read would treat gen-1 payloads
    // as orphans and delete them — silent data loss)
    t.renameColumn("image", "picture")
    val t2 = GraftTable.load(spark, loc)
    t2.write((5 to 6).map(i => (i, payload(i))).toDF("id", "picture").coalesce(1))
    val blobRoot = new org.apache.hadoop.fs.Path(s"$loc/blob")
    val fs = blobRoot.getFileSystem(spark.sessionState.newHadoopConf())
    def blobFiles = fs.listStatus(blobRoot).map(_.getPath.getName).toSet
    val before = blobFiles
    assert(before.size >= 2)
    // aggressive cutoff, nothing expired: every payload is still referenced
    assert(t2.removeOrphanFiles(System.currentTimeMillis() + 60000) == 0)
    assert(blobFiles == before)
    val got = t2.read().select("id", "picture").as[(Int, Array[Byte])].collect()
    assert(got.length == 6)
    assert(got.forall { case (i, bts) => bts.sameElements(payload(i)) })
  }

  test("blob view resolves through time travel after refs leave the current snapshot") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    spark.sql("""CREATE TABLE gb.db.up_tt (
        id INT, image BINARY COMMENT '__BLOB_FIELD')
        TBLPROPERTIES ('row-tracking.enabled'='true')""")
    (1 to 3).map(i => (i, payload(i))).toDF("id", "image")
      .createOrReplaceTempView("up_tt_src")
    spark.sql("INSERT INTO gb.db.up_tt SELECT * FROM up_tt_src")
    spark.sql("""CREATE TABLE gb.db.view_tt (
        id INT, ref BINARY COMMENT '__BLOB_VIEW_FIELD')""")
    // snapshot 1: refs into up_tt
    spark.sql("""INSERT INTO gb.db.view_tt
        SELECT id, graft_blob_view('db.up_tt', 'image', row_id)
        FROM gb.db.`up_tt$row_tracking`""")
    // snapshot 2: full overwrite with NULL refs — the upstream pair is now
    // absent from the current snapshot's rows
    spark.sql("""INSERT OVERWRITE gb.db.view_tt
        SELECT id, CAST(NULL AS BINARY) FROM gb.db.up_tt""")
    val vt = GraftTable.load(spark, s"$wh/db.db/view_tt")
    assert(vt.read().where(col("ref").isNotNull).count() == 0)
    // the time-travel read must discover the pairs in SNAPSHOT 1, not the
    // current one, and resolve the payload bytes
    val rows = vt.read(None, Some(1L)).select("id", "ref")
      .as[(Int, Array[Byte])].collect()
    assert(rows.length == 3)
    assert(rows.forall { case (i, bts) =>
      bts != null && bts.sameElements(payload(i)) }, "time-travel refs must resolve")
  }

  test("concurrent blob reads across >cap packs stay correct under LRU eviction") {
    val loc = Files.createTempDirectory("graft-blob-conc").toString + "/t"
    // tiny target size → many payload packs; a parallel read then churns
    // the 64-entry stream cache from many tasks at once (the old
    // ConcurrentHashMap computeIfAbsent eviction was UB under this load)
    val n = 300
    val t = GraftTable.create(spark, loc,
      Seq((1, payload(1))).toDF("id", "image").schema,
      TableConfig(options = Map("blob-field" -> "image",
        "blob.target-file-size" -> "150b")))
    t.write((1 to n).map(i => (i, payload(i))).toDF("id", "image").repartition(8))
    val got = t.read().select("id", "image").as[(Int, Array[Byte])].collect()
    assert(got.length == n)
    assert(got.forall { case (i, bts) => bts.sameElements(payload(i)) })
  }

  test("descriptor/view-ref fast-path parse == Jackson on round trips, " +
    "falls back on escapes and foreign spellings") {
    // round trips through the writer (the fast path's template)
    for (uri <- Seq("/a/b/pack-1.bin", "file:/tmp/x y/blob.bin", "");
         off <- Seq(0L, 123456789L); len <- Seq(0L, 17L)) {
      val d = Blob.tryParseDesc(Blob.serializeDesc(uri, off, len)).get
      assert(d == Blob.BlobDesc(uri, off, len), s"desc $uri $off $len -> $d")
    }
    val ref = Blob.BlobViewRef("db.t", "/wh/db.db/t", "payload", 42L)
    assert(Blob.tryParseViewRef(Blob.serializeViewRef(ref)).contains(ref))
    // strings needing JSON escapes round-trip via the Jackson fallback
    val tricky = Blob.BlobViewRef("db.t", "/wh/we\"ird\\path", "pay\"load", -7L)
    assert(Blob.tryParseViewRef(Blob.serializeViewRef(tricky)).contains(tricky))
    // foreign spelling (reordered fields, whitespace) still parses
    val foreign = ("\u0089GBD1\u0000".map(_.toByte).toArray ++
      """{ "length": 5, "offset": 7, "uri": "/p" }""".getBytes("UTF-8"))
    assert(Blob.tryParseDesc(foreign).contains(Blob.BlobDesc("/p", 7L, 5L)))
  }
}
