package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe of Spark's V2 variant-pushdown REJECTION handling: which
  * (acceptance, query-shape) combinations survive and which crash inside
  * PushVariantIntoScan/VariantInRelation.rewriteExpr. Drives the acceptance
  * policy in [[graft.dsv2.GraftScanBuilder.pushVariantExtractions]]. */
object ProbeVariantReject {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.variant.pushVariantIntoScan", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/tmp/graft-probe-vreject"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)

    val docs = spark.range(0, 20)
      .select(col("id").as("doc_id"),
        parse_json(to_json(struct(
          (col("id") % 100).cast("int").as("a"),
          concat(lit("s"), col("id")).as("b"),
          (col("id") * 1.5).as("c")))).as("meta"))

    def mk(name: String, shred: String, pk: Boolean): String = {
      val loc = s"$base/$name"
      val cfg =
        if (pk) TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 2,
          options = Map("fields.meta.shred" -> shred))
        else TableConfig(options = Map("fields.meta.shred" -> shred))
      val t = GraftTable.create(spark, loc, docs.schema, cfg)
      t.write(docs)
      loc
    }

    val aLoc = mk("ap", "$.a:int", pk = false)
    val pLoc = mk("pk", "$.a:int", pk = true)

    def drive(tag: String, loc: String, view: String, proj: String,
              where: String): Unit = {
      spark.read.format("graft").load(loc).createOrReplaceTempView(view)
      val q = s"SELECT $proj FROM $view" +
        (if (where.isEmpty) "" else s" WHERE $where")
      try println(s"[probe] $tag OK rows=${spark.sql(q).collect().length}")
      catch { case e: Throwable =>
        println(s"[probe] $tag CRASH ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.next())
      }
    }

    val ga = "variant_get(meta, '$.a', 'int')"
    val gc = "variant_get(meta, '$.c', 'double')"
    // shapes: accept-all possible (only $.a referenced) vs forced-reject
    // ($.c unservable) crossed with filter-on-variant
    for ((lbl, loc) <- Seq("append" -> aLoc, "pk" -> pLoc)) {
      val v = s"v_$lbl"
      drive(s"$lbl sel(a)           ", loc, v, s"doc_id, $ga AS a", "")
      drive(s"$lbl sel(a) where(a)  ", loc, v, s"doc_id, $ga AS a", s"$ga > 5")
      drive(s"$lbl sel(a,c)         ", loc, v, s"doc_id, $ga AS a, $gc AS c", "")
      drive(s"$lbl sel(a,c) where(a)", loc, v, s"doc_id, $ga AS a, $gc AS c", s"$ga > 5")
      drive(s"$lbl sel(c) where(a)  ", loc, v, s"doc_id, $gc AS c", s"$ga > 5")
      drive(s"$lbl sel(c) where(c)  ", loc, v, s"doc_id, $gc AS c", s"$gc > 5")
      drive(s"$lbl sel(a) where(c)  ", loc, v, s"doc_id, $ga AS a", s"$gc > 5")
    }

    // PK table with a second write (unmerged buckets -> V1 merge path)
    val p2Loc = s"$base/pk2"
    val t2 = GraftTable.create(spark, p2Loc, docs.schema,
      TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 2,
        options = Map("fields.meta.shred" -> "$.a:int")))
    t2.write(docs)
    t2.write(docs.filter(col("doc_id") % 3 === 0))
    drive("pk2 sel(a,c) where(a)", p2Loc, "v_pk2",
      s"doc_id, $ga AS a, $gc AS c", s"$ga > 5")
    drive("pk2 sel(a) where(a)  ", p2Loc, "v_pk2",
      s"doc_id, $ga AS a", s"$ga > 5")

    // catalog-resolved spelling of the same queries
    spark.conf.set("spark.sql.catalog.vrej", "graft.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vrej.warehouse", s"$base/wh")
    val whLoc = s"$base/wh/db.db/tcat"
    val t3 = GraftTable.create(spark, whLoc, docs.schema,
      TableConfig(primaryKeys = Seq("doc_id"), numBuckets = 2,
        options = Map("fields.meta.shred" -> "$.a:int")))
    t3.write(docs)
    t3.write(docs.filter(col("doc_id") % 3 === 0))
    def driveCat(tag: String, proj: String, where: String): Unit = {
      val q = s"SELECT $proj FROM vrej.db.tcat" +
        (if (where.isEmpty) "" else s" WHERE $where")
      try println(s"[probe] $tag OK rows=${spark.sql(q).collect().length}")
      catch { case e: Throwable =>
        println(s"[probe] $tag CRASH ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.next())
      }
    }
    driveCat("cat sel(a,c) where(a)", s"doc_id, $ga AS a, $gc AS c", s"$ga > 5")
    driveCat("cat sel(a) where(a)  ", s"doc_id, $ga AS a", s"$ga > 5")
    driveCat("cat sel(a,c)         ", s"doc_id, $ga AS a, $gc AS c", "")
    spark.stop()
  }
}
