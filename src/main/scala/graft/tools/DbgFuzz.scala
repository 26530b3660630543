package graft.tools
import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.Random
object DbgFuzz {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val seed = 1337L; val ops = 8; val numBuckets = 3
    val rnd = new Random(seed)
    val loc = java.nio.file.Files.createTempDirectory("fz").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, "s", 1.0)).toDF("k", "s", "p").schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = numBuckets))
    var model = Map.empty[Long, (String, Double)]
    def check(i: Int): Unit = {
      val got = t.read().as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val extra = got.keySet -- model.keySet
      val missing = model.keySet -- got.keySet
      if (extra.nonEmpty || missing.nonEmpty || got != model)
        println(s"== op$i DIVERGED extra=$extra missing=$missing")
      else println(s"== op$i ok (${model.size} keys)")
    }
    for (i <- 0 until ops) {
      rnd.nextInt(6) match {
        case 0 | 1 =>
          val rows = (0 until (1 + rnd.nextInt(15))).map { _ =>
            val k = rnd.nextInt(40).toLong
            (k, s"v$i-$k", rnd.nextInt(1000) / 10.0)
          }
          val byKey = rows.groupBy(_._1).map { case (k, vs) => vs.last }
          t.write(rows.toDF("k", "s", "p"))
          byKey.foreach { case (k, s, p) => model += k -> (s, p) }
          println(s"== op$i write ${rows.size} rows keys=${rows.map(_._1).distinct.sorted}")
        case 2 =>
          val lo = rnd.nextInt(40).toLong
          val hi = lo + rnd.nextInt(10)
          t.delete(col("k").between(lo, hi))
          model = model.filterNot { case (k, _) => k >= lo && k <= hi }
          println(s"== op$i delete [$lo,$hi]")
        case 3 if model.nonEmpty =>
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          t.deleteDv(col("k") === k)
          model -= k
          println(s"== op$i dv-delete $k")
        case 4 =>
          val b = rnd.nextInt(numBuckets)
          t.compactWhere(_.bucket == b)
          println(s"== op$i partial-compact bucket $b")
        case _ =>
          t.compact()
          println(s"== op$i full compact")
      }
      check(i)
    }
    spark.stop()
  }
}
