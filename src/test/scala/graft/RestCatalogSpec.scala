package graft

import graft.rest.GraftRestServer
import org.apache.spark.sql.functions._

/** REST catalog: server endpoints (bear-token auth, pagination), client
  * TableCatalog over the REST API, SQL DML/reads through the DSv2 path. */
class RestCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-rest-wh").toString
  private lazy val server = new GraftRestServer(warehouse, "sekrit")
  private lazy val port = server.start()

  private def initCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.rc", "graft.rest.GraftRestCatalog")
    spark.conf.set("spark.sql.catalog.rc.uri", s"http://127.0.0.1:$port")
    spark.conf.set("spark.sql.catalog.rc.token", "sekrit")
  }

  test("bear token: wrong/missing token is rejected with 401") {
    initCatalog()
    val http = java.net.http.HttpClient.newHttpClient()
    def code(auth: Option[String]): Int = {
      val b = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port/v1/config"))
      auth.foreach(a => b.header("Authorization", a))
      http.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    }
    assert(code(None) == 401)
    assert(code(Some("Bearer wrong")) == 401)
    assert(code(Some("Bearer sekrit")) == 200)
  }

  test("DDL + DML + read through the REST catalog") {
    initCatalog()
    spark.sql("CREATE DATABASE rc.db1")
    spark.sql(
      """CREATE TABLE rc.db1.t (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2')""".stripMargin)
    spark.sql("INSERT INTO rc.db1.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO rc.db1.t VALUES (2, 'b2'), (3, 'c')")
    // PK upsert semantics survive the REST path (same engine underneath)
    val out = spark.sql("SELECT k, v FROM rc.db1.t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // system table via REST-resolved base
    assert(spark.sql("SELECT * FROM rc.db1.`t$snapshots`").count() == 2)
    // time travel
    assert(spark.sql("SELECT count(*) FROM rc.db1.t VERSION AS OF 1")
      .head().getLong(0) == 2)
    // listings flow through the paged REST endpoints
    assert(spark.sql("SHOW TABLES IN rc.db1").collect().map(_.getString(1)).toSet == Set("t"))
    assert(spark.sql("SHOW DATABASES IN rc").collect().map(_.getString(0)).contains("db1"))
  }

  test("rename + drop via REST; list pagination") {
    initCatalog()
    spark.sql("CREATE DATABASE IF NOT EXISTS rc.db2")
    (1 to 5).foreach { i =>
      spark.sql(s"CREATE TABLE rc.db2.p$i (x BIGINT) USING graft")
    }
    // pagination: 2 per page walks all 5
    val http = java.net.http.HttpClient.newHttpClient()
    def getJson(path: String): String = {
      val r = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .header("Authorization", "Bearer sekrit").GET().build()
      http.send(r, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
    val page1 = getJson("/v1/main/databases/db2/tables?maxResults=2")
    assert(page1.contains("nextPageToken"))
    spark.sql("ALTER TABLE rc.db2.p1 RENAME TO db2.q1")
    assert(spark.sql("SHOW TABLES IN rc.db2").collect().map(_.getString(1)).toSet ==
      Set("q1", "p2", "p3", "p4", "p5"))
    spark.sql("DROP TABLE rc.db2.q1")
    assert(!spark.catalog.tableExists("rc.db2.q1"))
  }

  test("data path stays direct: MERGE INTO + DELETE work over REST tables") {
    initCatalog()
    spark.sql("CREATE DATABASE IF NOT EXISTS rc.db3")
    spark.sql(
      """CREATE TABLE rc.db3.m (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k')""".stripMargin)
    spark.sql("INSERT INTO rc.db3.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    Seq((2L, "B"), (4L, "D")).toDF("k", "v").createOrReplaceTempView("src_rest")
    spark.sql(
      """MERGE INTO rc.db3.m t USING src_rest s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    spark.sql("DELETE FROM rc.db3.m WHERE k = 1")
    val out = spark.sql("SELECT k, v FROM rc.db3.m ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "B"), (3L, "c"), (4L, "D")))
  }

  override def afterAll(): Unit = { server.stop(); super.afterAll() }
}
