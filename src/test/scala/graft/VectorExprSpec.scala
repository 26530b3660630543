package graft

import graft.functions.GraftAggs
import graft.pipeline.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-13 optimization internals: the native vector expressions and the
  * bounded sorted-set aggregate must be BIT-IDENTICAL to the relational
  * forms they replaced (oracle hashes depend on it). Each test evaluates
  * both forms over the same frame and compares exactly. */
class VectorExprSpec extends SparkTestBase {
  import spark.implicits._

  private def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
  private def oldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val d = oldDot(a, b)
    val nn = sqrt(oldDot(a, a)) * sqrt(oldDot(b, b))
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }
  private def oldL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast(DoubleType) - y.cast(DoubleType)
      diff * diff
    }), lit(0.0), (acc, v) => acc + v)

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(48)(rnd.nextFloat() * 2 - 1),
        Seq.fill(48)(rnd.nextFloat() * 2 - 1))
    } :+ ((201L, Seq.fill(48)(0f), Seq.fill(48)(0f))) // zero-norm case
  }.toDF("id", "a", "b")

  test("VecDot / VecCosine / VecL2Sq are bit-identical to the HOF forms " +
    "(float x float and float x double-literal)") {
    val qlit = array((1 to 48).map(i => lit(i * 0.01 - 0.2)): _*)
    val both = vecs.select(
      Similarity.dot($"a", $"b").as("nd"), oldDot($"a", $"b").as("od"),
      Similarity.cosine($"a", $"b").as("nc"), oldCosine($"a", $"b").as("oc"),
      Similarity.l2sq($"a", $"b").as("nl"), oldL2($"a", $"b").as("ol"),
      Similarity.cosine($"a", qlit).as("nq"), oldCosine($"a", qlit).as("oq"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot differs (bitwise)")
      assert(r.getDouble(2) == r.getDouble(3), "cosine differs (bitwise)")
      assert(r.getDouble(4) == r.getDouble(5), "l2sq differs (bitwise)")
      assert(r.getDouble(6) == r.getDouble(7), "cosine vs literal differs")
    }
    // zero-norm rows take the 0.0 branch
    val z = vecs.filter($"id" === 201L)
      .select(Similarity.cosine($"a", $"b")).head().getDouble(0)
    assert(z == 0.0)
  }

  test("VecDot null semantics match zip_with padding: length mismatch -> null") {
    val df = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b").as("n"),
      oldDot($"a", $"b").as("o")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SortedDistinctLongs == sorted array_distinct; " +
    "SortedIntersectCount == size(array_intersect) on the set forms") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong),
        Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong))
    }.toDF("id", "xs", "ys")
    import org.apache.spark.sql.graft.SparkShims
    def sortedSet(c: org.apache.spark.sql.Column) = SparkShims.column(
      graft.functions.SortedDistinctLongs(SparkShims.expression(c)))
    def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      SparkShims.column(graft.functions.SortedIntersectCount(
        SparkShims.expression(a), SparkShims.expression(b)))
    val rows = df.select(
      sortedSet($"xs").as("sx"), array_sort(array_distinct($"xs")).as("ox"),
      sic(sortedSet($"xs"), sortedSet($"ys")).as("ni"),
      size(array_intersect(array_distinct($"xs"), array_distinct($"ys"))).as("oi"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "sorted distinct differs")
      assert(r.getInt(2) == r.getInt(3), "intersect count differs")
    }
  }

  test("CappedSortedSetAgg == window-rank cap + collect_list (sorted), " +
    "including below-cap, at-cap and over-cap buckets, across a shuffle") {
    val rnd = new scala.util.Random(13)
    // bucket sizes straddle the cap of 8; duplicate members exercise the
    // set semantics
    val rows = (1 to 2000).map { i =>
      val bucket = rnd.nextInt(40)
      val member = f"m${rnd.nextInt(if (bucket % 3 == 0) 30 else 6)}%03d"
      (bucket, member)
    }
    val df = rows.toDF("bk", "fp").repartition(7)
    val viaAgg = df.groupBy("bk")
      .agg(GraftAggs.cappedSortedSet($"fp", 8).as("ids"))
    val viaWindow = df.distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("bk").orderBy("fp")))
      .filter($"rn" <= 8)
      .groupBy("bk").agg(sort_array(collect_list($"fp")).as("ids"))
    assertSameRows(viaAgg, viaWindow)
  }

  test("CappedSortedSetAgg over BINARY == the STRING form hexed (r14: " +
    "16-byte md5 fingerprints rank isomorphically to their lowercase hex)") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 1500).map { i =>
      (rnd.nextInt(30), f"v${rnd.nextInt(if (i % 4 == 0) 40 else 5)}%03d")
    }
    val df = rows.toDF("bk", "s").withColumn("fp", md5($"s"))
      .repartition(7)
    val viaBinary = df.groupBy("bk")
      .agg(GraftAggs.cappedSortedSet(unhex($"fp"), 8).as("ids"))
      .select($"bk", transform($"ids", b => lower(hex(b))).as("ids"))
    val viaString = df.groupBy("bk")
      .agg(GraftAggs.cappedSortedSet($"fp", 8).as("ids"))
    assertSameRows(viaBinary, viaString)
    // non-orderable child types are rejected at analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("bk").agg(GraftAggs.cappedSortedSet($"bk", 8)).collect()
    }
  }

  test("SortedDistinctStrings + SortedIntersectCountStrings == " +
    "sort_array(array_distinct) + size(array_intersect) on random arrays") {
    import org.apache.spark.sql.graft.SparkShims
    def sortedSetStr(c: org.apache.spark.sql.Column) = SparkShims.column(
      graft.functions.SortedDistinctStrings(SparkShims.expression(c)))
    def intersectStr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      SparkShims.column(graft.functions.SortedIntersectCountStrings(
        SparkShims.expression(a), SparkShims.expression(b)))
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map { _ =>
      def arr = Seq.fill(rnd.nextInt(30))(f"w${rnd.nextInt(20)}%02d")
      (arr, arr)
    }
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      sortedSetStr($"a").as("sa"),
      sort_array(array_distinct($"a")).as("ra"),
      intersectStr(sortedSetStr($"a"), sortedSetStr($"b")).as("ni"),
      size(array_intersect(array_distinct($"a"), array_distinct($"b"))).as("ri"),
      (size(array_distinct($"a")) + size(array_distinct($"b"))).as("nsum"),
      size(array_union($"a", $"b")).as("ru"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), "sorted distinct differs")
      assert(r.getInt(2) == r.getInt(3), "intersect count differs")
      // |A∪B| == |A|+|B|-|A∩B| — the identity ngramJaccardPairs relies on
      assert(r.getInt(5) == r.getInt(4) - r.getInt(2), "union identity broken")
    }
  }
}
