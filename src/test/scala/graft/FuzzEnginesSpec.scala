package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.functions._

import scala.util.Random

/**
 * Randomized model fuzz for two surfaces the op-sequence LSM fuzz does not
 * touch: the aggregation merge engine (per-field fold semantics across
 * batches, compactions and merge-on-read) and branch isolation
 * (create/write/fast-forward against independent models).
 */
class FuzzEnginesSpec extends SparkTestBase {
  import spark.implicits._

  test("random aggregation-engine batches agree with a per-field fold model (2 seeds)") {
    Seq(7L, 4242L).foreach(aggScenario)
  }

  test("deep sweep across merge-engine fuzzers (extra seeds)") {
    Seq(101L, 202L).foreach(aggScenario)
    Seq(303L, 404L).foreach(puScenario)
    Seq(505L, 606L).foreach(seq2Scenario)
  }

  private def aggScenario(seed: Long): Unit = {
    val rnd = new Random(seed)
    val loc = tmpLoc(s"fuzz-agg-$seed")
    val schema = Seq((1L, Option(1.0), Option(1), Option(1), Option("s"),
        Option(true), Option("x"), Option(1), Option(Seq("c"))))
      .toDF("k", "su", "mx", "mn", "ln", "bo", "la", "ct", "co").schema
    val t = GraftTable.create(spark, loc, schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        mergeEngine = "aggregation",
        fieldAggregates = Map("su" -> "sum", "mx" -> "max", "mn" -> "min",
          "ln" -> "last_non_null_value", "bo" -> "bool_or",
          "la" -> "listagg", "ct" -> "count", "co" -> "collect")))

    // model state per key, mirroring the engine's null semantics: value
    // aggs ignore nulls; count counts non-null inputs; listagg appends
    // non-null values in commit order
    case class S(su: Option[Double], mx: Option[Int], mn: Option[Int],
                 ln: Option[String], bo: Option[Boolean],
                 la: Vector[String], ct: Long, co: Vector[String])
    var model = Map.empty[Long, S]

    def opt[T](p: Double)(v: => T): Option[T] =
      if (rnd.nextDouble() < p) None else Some(v)

    def check(): Unit = {
      val got = t.read()
        .select("k", "su", "mx", "mn", "ln", "bo", "la", "ct", "co")
        .as[(Long, Option[Double], Option[Int], Option[Int], Option[String],
             Option[Boolean], Option[String], Option[Long], Option[Seq[String]])]
        .collect().map(r => r._1 -> r).toMap
      assert(got.keySet == model.keySet,
        s"seed=$seed keys: missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)}")
      model.foreach { case (k, m) =>
        val g = got(k)
        assert(g._2 == m.su, s"seed=$seed k=$k sum: got ${g._2} want ${m.su}")
        assert(g._3 == m.mx, s"seed=$seed k=$k max: got ${g._3} want ${m.mx}")
        assert(g._4 == m.mn, s"seed=$seed k=$k min: got ${g._4} want ${m.mn}")
        assert(g._5 == m.ln, s"seed=$seed k=$k lnn: got ${g._5} want ${m.ln}")
        assert(g._6 == m.bo, s"seed=$seed k=$k bool_or: got ${g._6} want ${m.bo}")
        // listagg over zero non-null inputs is NULL (reference identity)
        val wantLa = if (m.la.isEmpty) None else Some(m.la.mkString(","))
        assert(g._7 == wantLa, s"seed=$seed k=$k listagg: got ${g._7} want $wantLa")
        assert(g._8 == Some(m.ct), s"seed=$seed k=$k count: got ${g._8} want ${m.ct}")
        // collect concatenates array inputs in commit order; zero non-null
        // inputs fold to NULL
        val wantCo = if (m.co.isEmpty) None else Some(m.co)
        assert(g._9.map(_.toVector) == wantCo,
          s"seed=$seed k=$k collect: got ${g._9} want $wantCo")
      }
    }

    for (i <- 0 until 12) {
      rnd.nextInt(5) match {
        case 4 => t.compact()
        case 3 => t.compactWhere(_.bucket == rnd.nextInt(2))
        case _ =>
          // one row per key per batch: cross-batch order is commit order,
          // so order-sensitive aggs (lnn, listagg) stay deterministic
          val keys = rnd.shuffle((0L until 20L).toList).take(1 + rnd.nextInt(8))
          val rows = keys.map { k =>
            (k, opt(0.15)(rnd.nextInt(10).toDouble), opt(0.15)(rnd.nextInt(100)),
              opt(0.15)(rnd.nextInt(100)), opt(0.3)(s"s$i-$k"),
              opt(0.3)(rnd.nextBoolean()), opt(0.3)(s"w$i"), opt(0.2)(1),
              opt(0.3)(Seq.fill(1 + rnd.nextInt(2))(s"c$i")))
          }
          t.write(rows.toDF("k", "su", "mx", "mn", "ln", "bo", "la", "ct", "co"))
          rows.foreach { case (k, su, mx, mn, ln, bo, la, ct, co) =>
            val m = model.getOrElse(k,
              S(None, None, None, None, None, Vector.empty, 0L, Vector.empty))
            model += k -> S(
              su = (m.su, su) match {
                case (Some(a), Some(b)) => Some(a + b)
                case (a, b) => a.orElse(b)
              },
              mx = (m.mx ++ mx).reduceOption(_ max _),
              mn = (m.mn ++ mn).reduceOption(_ min _),
              ln = ln.orElse(m.ln),
              bo = (m.bo, bo) match {
                case (Some(a), Some(b)) => Some(a || b)
                case (a, b) => a.orElse(b)
              },
              la = m.la ++ la,
              ct = m.ct + ct.size,
              co = m.co ++ co.toVector.flatten)
          }
      }
      if (i % 3 == 2) check()
    }
    t.compact()
    check()
  }

  test("random aggregation retraction sequences agree with a sequential fold model (2 seeds)") {
    Seq(17L, 911L).foreach(aggRetractScenario)
  }

  /** Retraction semantics pinned: sum/count subtract; last_value nulls when
    * the retract row orders last; collect removes one occurrence of each
    * retracted element. Interleaved compactions must not change outcomes
    * (accumulator refolds). */
  private def aggRetractScenario(seed: Long): Unit = {
    val rnd = new Random(seed)
    val loc = tmpLoc(s"fuzz-aggret-$seed")
    val schema = Seq((1L, Option(1.0), Option(1), Option("v"), Option(Seq("c")), "+I"))
      .toDF("k", "su", "ct", "lv", "co", "rk").schema
    val t = GraftTable.create(spark, loc, schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        mergeEngine = "aggregation",
        fieldAggregates = Map("su" -> "sum", "ct" -> "count",
          "lv" -> "last_value", "co" -> "collect"),
        options = Map("rowkind.field" -> "rk")))

    case class S(su: Option[Double], ct: Long, lv: Option[String],
                 coTouched: Boolean, co: Vector[String])
    var model = Map.empty[Long, S]

    def opt[T](p: Double)(v: => T): Option[T] =
      if (rnd.nextDouble() < p) None else Some(v)

    def check(): Unit = {
      val got = t.read().select("k", "su", "ct", "lv", "co")
        .as[(Long, Option[Double], Option[Long], Option[String], Option[Seq[String]])]
        .collect().map(r => r._1 -> r).toMap
      assert(got.keySet == model.keySet, s"seed=$seed keys: " +
        s"missing=${(model.keySet -- got.keySet).take(5)} extra=${(got.keySet -- model.keySet).take(5)}")
      model.foreach { case (k, m) =>
        val g = got(k)
        assert(g._2 == m.su, s"seed=$seed k=$k sum: got ${g._2} want ${m.su}")
        assert(g._3 == Some(m.ct), s"seed=$seed k=$k count: got ${g._3} want ${m.ct}")
        assert(g._4 == m.lv, s"seed=$seed k=$k last_value: got ${g._4} want ${m.lv}")
        // collect: NULL until any non-null input arrived; empty array
        // (not null) once retraction drained a previously-fed accumulator
        val wantCo = if (!m.coTouched) None else Some(m.co)
        assert(g._5.map(_.toVector) == wantCo,
          s"seed=$seed k=$k collect: got ${g._5} want $wantCo")
      }
    }

    for (i <- 0 until 14) {
      rnd.nextInt(5) match {
        case 4 => t.compact()
        case 3 => t.compactWhere(_.bucket == rnd.nextInt(2))
        case _ =>
          val isRetract = rnd.nextDouble() < 0.3
          val pool = if (isRetract && model.nonEmpty)
            rnd.shuffle(model.keySet.toList).take(1 + rnd.nextInt(3))
          else rnd.shuffle((0L until 12L).toList).take(1 + rnd.nextInt(5))
          val rows = pool.map { k =>
            val coVal =
              if (isRetract && model.get(k).exists(_.co.nonEmpty))
                Some(Seq(model(k).co(rnd.nextInt(model(k).co.size))))
              else opt(0.3)(Seq(s"c$i"))
            (k, opt(0.2)(rnd.nextInt(9).toDouble), opt(0.2)(1),
              opt(0.3)(s"v$i"), coVal, if (isRetract) "-D" else "+I")
          }
          t.write(rows.toDF("k", "su", "ct", "lv", "co", "rk"))
          rows.foreach { case (k, su, ct, lv, co, rk) =>
            val m = model.getOrElse(k, S(None, 0L, None, false, Vector.empty))
            if (rk == "+I") {
              model += k -> S(
                su = (m.su, su) match {
                  case (Some(a), Some(b)) => Some(a + b)
                  case (a, b) => a.orElse(b)
                },
                ct = m.ct + ct.size,
                lv = lv, // last_value: every input replaces, null included
                coTouched = m.coTouched || co.isDefined,
                co = m.co ++ co.toVector.flatten)
            } else {
              // retract: sum/count subtract, last_value becomes null (the
              // retract orders last), collect removes one occurrence each
              val coAfter = co.toVector.flatten.foldLeft(m.co) { (acc, e) =>
                val idx = acc.indexOf(e)
                if (idx >= 0) acc.patch(idx, Nil, 1) else acc
              }
              model += k -> S(
                su = (m.su, su) match {
                  case (Some(a), Some(b)) => Some(a - b)
                  case (a, b) => a.orElse(b.map(-_))
                },
                ct = m.ct - ct.size,
                lv = None,
                // a retract on a never-fed accumulator keeps it NULL
                // (reference FieldCollectAgg.retract acc==null => null)
                coTouched = m.coTouched,
                co = coAfter)
            }
          }
      }
      if (i % 3 == 2) check()
    }
    t.compact()
    check()
  }

  test("random partial-update batches with a sequence group agree with a fold model (2 seeds)") {
    Seq(13L, 777L).foreach(puScenario)
  }

  /** Reference semantics pinned here (PartialUpdateMergeFunction):
    * non-group fields update on non-null; sequence-group fields take the
    * winner row's values VERBATIM (nulls overwrite) when its group seq is
    * >= the running max, and lower-seq rows are rejected wholesale. */
  private def puScenario(seed: Long): Unit = {
    val rnd = new Random(seed)
    val loc = tmpLoc(s"fuzz-pu-$seed")
    val schema = Seq((1L, Option("a"), Option(1L), Option("b"), Option(1),
        Option(1.0)))
      .toDF("k", "a", "g", "b", "c", "s").schema
    val t = GraftTable.create(spark, loc, schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        mergeEngine = "partial-update",
        fieldAggregates = Map("s" -> "sum"),
        options = Map("fields.g.sequence-group" -> "b,c,s")))

    case class S(a: Option[String], g: Option[Long],
                 b: Option[String], c: Option[Int], s: Option[Double])
    var model = Map.empty[Long, S]

    def opt[T](p: Double)(v: => T): Option[T] =
      if (rnd.nextDouble() < p) None else Some(v)

    def check(): Unit = {
      val got = t.read().select("k", "a", "g", "b", "c", "s")
        .as[(Long, Option[String], Option[Long], Option[String], Option[Int],
             Option[Double])]
        .collect().map(r => r._1 -> r).toMap
      assert(got.keySet == model.keySet, s"seed=$seed keys diverged")
      model.foreach { case (k, m) =>
        val g = got(k)
        assert(g._2 == m.a && g._3 == m.g && g._4 == m.b && g._5 == m.c,
          s"seed=$seed k=$k: got (${g._2},${g._3},${g._4},${g._5}) " +
            s"want (${m.a},${m.g},${m.b},${m.c})")
        // s has an aggregate-function: every non-null-group row contributes
        assert(g._6 == m.s, s"seed=$seed k=$k sum-in-group: got ${g._6} want ${m.s}")
      }
    }

    for (i <- 0 until 12) {
      rnd.nextInt(5) match {
        case 4 => t.compact()
        case 3 => t.compactWhere(_.bucket == rnd.nextInt(2))
        case _ =>
          val keys = rnd.shuffle((0L until 15L).toList).take(1 + rnd.nextInt(6))
          val rows = keys.map { k =>
            (k, opt(0.4)(s"a$i"), opt(0.25)(rnd.nextInt(10).toLong),
              opt(0.35)(s"b$i"), opt(0.35)(rnd.nextInt(100)),
              opt(0.35)(rnd.nextInt(9).toDouble))
          }
          t.write(rows.toDF("k", "a", "g", "b", "c", "s"))
          rows.foreach { case (k, a, g, b, c, sv) =>
            val m = model.getOrElse(k, S(None, None, None, None, None))
            val groupWins = g.isDefined && m.g.forall(g.get >= _)
            // the agg field sums whenever the row's group seq is non-null,
            // regardless of whether it wins (ordering key, not filter)
            val sNew = if (g.isDefined) (m.s, sv) match {
              case (Some(x), Some(y)) => Some(x + y)
              case (x, y) => x.orElse(y)
            } else m.s
            model += k -> S(
              a = a.orElse(m.a),
              g = if (groupWins) g else m.g,
              b = if (groupWins) b else m.b,
              c = if (groupWins) c else m.c,
              s = sNew)
          }
      }
      if (i % 3 == 2) check()
    }
    t.compact()
    check()
  }

  test("random ops with two sequence fields agree with a (ut,flag,arrival) model (2 seeds)") {
    Seq(31L, 555L).foreach(seq2Scenario)
  }

  private def seq2Scenario(seed: Long): Unit = {
    val rnd = new Random(seed)
    val loc = tmpLoc(s"fuzz-seq2-$seed")
    val schema = Seq((1L, "v", 1L, 1L)).toDF("k", "v", "ut", "flag").schema
    val t = GraftTable.create(spark, loc, schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        sequenceField = Some("ut,flag")))
    // model: per key keep (v, ut, flag, arrival); an upsert wins iff its
    // (ut, flag, arrival) orders >= the stored one
    var model = Map.empty[Long, (String, Long, Long, Int)]
    var arrival = 0

    def check(): Unit = {
      val got = t.read().select("k", "v").as[(Long, String)].collect().toMap
      val want = model.map { case (k, (v, _, _, _)) => k -> v }
      assert(got == want, s"seed=$seed: " +
        s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)} " +
        s"diff=${want.keySet.intersect(got.keySet).filter(k => want(k) != got(k)).take(5)}")
    }

    for (i <- 0 until 14) {
      rnd.nextInt(6) match {
        case 5 => t.compact()
        case 4 if model.nonEmpty => // DV delete one key
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          t.deleteDv(col("k") === k)
          model -= k
        case 3 => // COW delete a range
          val lo = rnd.nextInt(20).toLong
          t.delete(col("k").between(lo, lo + 4))
          model = model.filterNot { case (k, _) => k >= lo && k <= lo + 4 }
        case _ => // upsert batch with random (ut, flag)
          arrival += 1
          val keys = rnd.shuffle((0L until 20L).toList).take(1 + rnd.nextInt(6))
          val rows = keys.map { k =>
            (k, s"v$i-$k", rnd.nextInt(4).toLong, rnd.nextInt(4).toLong)
          }
          t.write(rows.toDF("k", "v", "ut", "flag"))
          rows.foreach { case (k, v, ut, fl) =>
            val wins = model.get(k).forall { case (_, u0, f0, a0) =>
              Ordering[(Long, Long, Int)].gteq((ut, fl, arrival), (u0, f0, a0))
            }
            if (wins) model += k -> (v, ut, fl, arrival)
          }
      }
      if (i % 3 == 2) check()
    }
    t.compact()
    check()
  }

  test("random branch ops: main/branch isolation + fast-forward agree with models") {
    val rnd = new Random(99L)
    val loc = tmpLoc("fuzz-branch")
    val t = GraftTable.create(spark, loc,
      Seq((1L, "s")).toDF("k", "s").schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
    t.write(Seq((0L, "seed")).toDF("k", "s"))

    var mainModel = Map(0L -> "seed")
    var branchModel = Map.empty[Long, String]
    var branchLive = false

    def stateOf(g: GraftTable): Map[Long, String] =
      g.read().as[(Long, String)].collect().toMap

    def check(): Unit = {
      assert(stateOf(t) == mainModel, "main diverged from model")
      if (branchLive)
        assert(stateOf(t.onBranch("b")) == branchModel,
          "branch diverged from model")
    }

    for (i <- 0 until 14) {
      rnd.nextInt(6) match {
        case 0 | 1 => // write to main
          val rows = (0 until 1 + rnd.nextInt(5))
            .map(_ => (rnd.nextInt(30).toLong, s"m$i"))
          val byKey = rows.groupBy(_._1).map(_._2.last)
          t.write(rows.toDF("k", "s"))
          byKey.foreach { case (k, v) => mainModel += k -> v }
        case 2 | 3 if branchLive => // write to branch
          val b = t.onBranch("b")
          val rows = (0 until 1 + rnd.nextInt(5))
            .map(_ => (rnd.nextInt(30).toLong, s"b$i"))
          val byKey = rows.groupBy(_._1).map(_._2.last)
          b.write(rows.toDF("k", "s"))
          byKey.foreach { case (k, v) => branchModel += k -> v }
        case 2 | 3 => // (re)create the branch from main's latest snapshot
          t.createBranch("b")
          branchModel = mainModel
          branchLive = true
        case 4 if branchLive => // fast-forward main to the branch
          t.fastForward("b")
          mainModel = branchModel
          // drop + re-create later: after a fast-forward the branch is
          // typically retired (paimon deletes it after merging)
          t.deleteBranch("b")
          branchLive = false
        case 4 => // delete on main (COW) keeps branch untouched
          val lo = rnd.nextInt(30).toLong
          t.delete(col("k").between(lo, lo + 5))
          mainModel = mainModel.filterNot { case (k, _) => k >= lo && k <= lo + 5 }
        case _ => // dv-delete one existing main key
          if (mainModel.nonEmpty) {
            val k = mainModel.keySet.toSeq(rnd.nextInt(mainModel.size))
            t.deleteDv(col("k") === k)
            mainModel -= k
          }
      }
      if (i % 3 == 2) check()
    }
    check()
  }
}
