package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Event-stream batch analytics: gap-based sessionization, cohort retention,
 * and ordered funnel matching — the aggregate shapes a 100 TB clickstream /
 * telemetry corpus is routinely rolled up with before it feeds a training
 * pipeline (cf. the reference's events-table examples and windowed-agg docs;
 * the operators themselves are classic warehouse patterns re-expressed as
 * single-pass Spark window/agg plans).
 *
 * Scale posture: everything partitions by the entity key (user). No global
 * windows, no driver state; each operator is one shuffle on `user` plus
 * map-side arithmetic, so a 1000-executor run just needs the key shuffle.
 * Timestamps are compared in epoch MILLISECONDS (truncated, positive-range)
 * so any engine computing the same rollup agrees bit-for-bit.
 */
object Events {

  /**
   * Gap-based sessionization: a new session starts when the gap to the
   * previous event of the same user exceeds `gapMs`. Adds `__session`
   * (1-based per-user session ordinal). Deterministic under ties via
   * `tie` (e.g. the event id).
   */
  def sessionize(df: DataFrame, user: Column, ts: Column, gapMs: Long,
                 tie: Column): DataFrame = {
    val ms = unix_millis(ts)
    val w = Window.partitionBy(user).orderBy(ms.asc, tie.asc)
    val prev = lag(ms, 1).over(w)
    val isNew = when(prev.isNull || (ms - prev) > gapMs, 1L).otherwise(0L)
    df.withColumn("__session",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session rollup: event count, duration (ms), and an exact integer
    * micro-unit value sum (floor(value*1e6) — identical truncation on every
    * engine, so sums are order-independent and hash-stable). */
  def sessionStats(df: DataFrame, user: Column, ts: Column, gapMs: Long,
                   tie: Column, value: Column): DataFrame = {
    val ms = unix_millis(ts)
    sessionize(df, user, ts, gapMs, tie)
      .groupBy(user.as("user_id"), col("__session").cast("int").as("session"))
      .agg(count(lit(1)).as("n_events"),
        (max(ms) - min(ms)).as("duration_ms"),
        sum(floor(value * 1000000L).cast(LongType)).as("value_micro"))
  }

  /**
   * Cohort retention: cohort = the UTC date of a user's first event;
   * a user is retained at day-offset `d` if they have any event exactly
   * `d` days after their cohort date. Returns (cohort, day_offset,
   * active_users). Two shuffles: min-date per user, then the rollup.
   */
  def retention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val day = to_date(ts)
    val cohorts = df.groupBy(user.as("__u"))
      .agg(min(day).as("cohort"))
    df.select(user.as("__u"), day.as("__d"))
      .join(cohorts, "__u")
      .groupBy(col("cohort"), datediff(col("__d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("__u")).as("active_users"))
  }

  /**
   * Ordered funnel: for a sequence of event types (step 1 .. step k), the
   * deepest step each user reached, where step i's timestamp is the MIN
   * event time of type i at-or-after step i-1's timestamp (the standard
   * min-over-filtered recurrence). One shuffle: events collect per user,
   * then the k bounds are k map-side filter/min passes over that array —
   * no self-joins, no ordering sensitivity (ties resolve by the min).
   */
  def funnel(df: DataFrame, user: Column, ts: Column, typ: Column,
             steps: Seq[String]): DataFrame = {
    val ms = unix_millis(ts)
    val perUser = df.groupBy(user.as("user_id"))
      .agg(collect_list(struct(ms.as("ms"), typ.as("t"))).as("__ev"))
    // b(1) = min ms of step 1; b(i) = min ms of step i with ms >= b(i-1).
    // A null bound propagates: `ms >= null` is null, the filter drops it,
    // array_min of the empty result is null.
    val bounds = steps.zipWithIndex.scanLeft(lit(null).cast(LongType)) {
      case (prev, (s, i)) =>
        val cond: Column => Column = e =>
          e.getField("t") === s &&
            (if (i == 0) lit(true) else e.getField("ms") >= prev)
        array_min(transform(filter(col("__ev"), cond), _.getField("ms")))
    }.drop(1)
    val depth = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(b.isNotNull, 1).otherwise(0)
    }
    // depth counts consecutive non-null bounds — a null bound nulls every
    // later one, so the plain sum equals the prefix length
    perUser.select(col("user_id"), depth.as("depth"))
  }
}
