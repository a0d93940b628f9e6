package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators beyond the reference's surface: as-of join and
  * sessionization — the two classic ordered-data operators a trading /
  * event pipeline needs that plain relational algebra doesn't name.
  */
object TimeSeriesOps {

  /** Backward as-of join: for every left row, attach the most recent right
    * row with `right.ts <= left.ts` within the same `key` (inclusive —
    * a right row at exactly left.ts matches).
    *
    * Built by composition (preference (a) of the build contract), not a
    * custom join operator: tag both inputs, union, and carry the latest
    * right payload forward with `last_value(ignoreNulls)` over
    * (key, ts, side) ordering — right rows sort BEFORE left rows at equal
    * ts so inclusivity falls out of the sort key. Cost: one shuffle+sort
    * over the union, same as a sort-merge join — no point-lookup loops,
    * no broadcast requirement, skew-safe under AQE. This is the standard
    * distributed as-of and scales to 100 TB exactly like any windowed op
    * partitioned by key.
    *
    * @param right payload columns of `right` (besides key/ts) are attached
    *              with their own names — callers alias beforehand.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    asofJoin(left, right, key, ts, Direction.Backward)

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` (inclusive) per key — pandas
    * `merge_asof(direction='forward')`. Same tag-union-window shape as
    * the backward form, with the order REVERSED (`ts` descending): a
    * running `last(ignoreNulls)` over the trailing frame then yields the
    * earliest right row at-or-after each left row in one O(n) pass —
    * never a [current, unboundedFollowing) frame, which Spark evaluates
    * quadratically (the moving lower bound re-scans the partition tail
    * per row). Inclusivity falls out of the sort key exactly as in the
    * backward form.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    asofJoin(left, right, key, ts, Direction.Forward)

  /** Nearest as-of join: the temporally closest right row on EITHER side
    * (pandas `merge_asof(direction='nearest')`), ties to the backward
    * match. Both candidate matches come from the SAME tagged union (one
    * exchange on the key; the two window orderings each sort their
    * partition), and the winner is a µs-delta comparison — exact integer
    * arithmetic, so the oracle's |Δt| argmin reproduces it bit-for-bit.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    asofJoin(left, right, key, ts, Direction.Nearest)

  private object Direction extends Enumeration {
    val Backward, Forward, Nearest = Value
  }

  private def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, dir: Direction.Value): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != ts).toSeq
    val payload = struct(col(ts).as("__ts") +: payloadCols.map(col): _*)
    val taggedRight = right.select(
      col(key), col(ts), lit(0).as("__side"), payload.as("__p"))
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(taggedRight.schema("__p").dataType).as("__p"),
      struct(leftCols.map(col): _*).as("__l"))
    val unioned = taggedRight
      .withColumn("__l", lit(null).cast(taggedLeft.schema("__l").dataType))
      .unionByName(taggedLeft)
    // backward: right (side 0) sorts BEFORE left at equal ts → inside the
    // trailing frame. forward: the SAME running-frame trick over ts DESC —
    // scanning from the largest ts down, the last right payload seen is
    // the earliest right row with right.ts >= left.ts, and side ASC puts
    // the right row before the left at equal ts (inclusive). Both frames
    // are [unboundedPreceding, currentRow): O(n) single-pass per key
    // partition. A [currentRow, unboundedFollowing] frame would be
    // quadratic — Spark's UnboundedFollowingWindowFunctionFrame re-scans
    // the partition tail for every row because the lower bound moves.
    // Both windows share the key partitioning (one exchange); Nearest
    // pays the two sorts.
    // __p as the final sort key makes duplicate right rows at one
    // (key, ts) resolve DETERMINISTICALLY (the greatest payload struct
    // wins): without it their relative order — and therefore the match
    // every later left row sees — depends on input partition order.
    // Left rows carry __p = null and sort entirely by (ts, side), so
    // the tiebreak never reorders them relative to right rows.
    // Constraint: payload fields must be orderable types (struct
    // ordering); map-typed payload columns are not — alias them to a
    // canonical orderable form before the join.
    val wB = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = dir match {
      case Direction.Backward =>
        unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wB))
      case Direction.Forward =>
        unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wF))
      case Direction.Nearest =>
        unioned
          .withColumn("__mb", last(col("__p"), ignoreNulls = true).over(wB))
          .withColumn("__mf", last(col("__p"), ignoreNulls = true).over(wF))
          .withColumn("__m",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(unix_micros(col(ts)) -
                  unix_micros(col("__mb").getField("__ts")) <=
                unix_micros(col("__mf").getField("__ts")) -
                  unix_micros(col(ts)), col("__mb"))
              .otherwise(col("__mf")))
    }
    val matched = withMatch.filter(col("__side") === 1)
    val leftOut = leftCols.map(c => col("__l").getField(c).as(c))
    val rightOut = col("__m").getField("__ts").as(s"asof_$ts") +:
      payloadCols.map(c => col("__m").getField(c).as(c))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) intervalization of a change
    * log: per key, consecutive events with an UNCHANGED tracked attribute
    * collapse into one version, and each surviving version carries a
    * validity interval [effective_from, effective_to) — effective_to is
    * the next version's start, NULL on the current version. The standard
    * warehouse dimension-history build (and the inverse of an as-of
    * lookup: as-of ts against the result is a plain BETWEEN join).
    *
    * One shuffle on the key: the change-collapse lag and the interval
    * lead share the (user_id, ts) sort — Catalyst plans one Exchange +
    * one Sort with both Window operators pipelined on it (the filter
    * between them preserves ordering).
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"), col("event_id"),
        col("ts").as("effective_from"), col("effective_to"),
        when(col("effective_to").isNull, 1).otherwise(0).as("is_current"))
  }

  /** Sessionization: split each user's event stream into sessions separated
    * by more than `gapMinutes` of inactivity, then aggregate per session.
    * Gaps-and-islands: a session starts where the lag gap exceeds the
    * threshold; the running sum of start-flags numbers the sessions.
    * One shuffle on user, windows + final agg share it.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("__new",
        when(col("__gap_us").isNull ||
          col("__gap_us") > gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("sum_value"))
  }

  /** Sessionization via Spark's NATIVE session-window aggregate
    * (`session_window`) — the same gap semantics as [[sessionize]] but as
    * one `groupBy` with a merging session aggregate instead of
    * lag+running-sum windows, and the form that runs unchanged under
    * Structured Streaming with a watermark (EventStreams.sessionStream).
    *
    * Boundary semantics: Spark's per-event window is `[ts, ts+gap)` and
    * sessions merge when windows overlap OR TOUCH (start <= prev end), so
    * an event exactly `gap` after its predecessor still joins the session
    * — split on `diff > gap`, identical to [[sessionize]]. (Verified by
    * the boundary unit test; the DuckDB oracle mirrors with `>`.)
    *
    * `session_end` is Spark's window end = last event + gap (the
    * "session expires after the idle gap" convention), not the last
    * event's timestamp.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Conversion funnel over ordered FIRST occurrences: a user reaches
    * step i iff their first `steps(i)` event is strictly after their
    * first `steps(i-1)` event (the standard strict-ordering funnel; the
    * windowed / any-order variants differ only in the per-user booleans).
    * Output: (step, step_idx, n_users), one row per step.
    *
    * Scale shape: ONE hash aggregate keyed on user_id computes all step
    * timestamps as conditional MINs (map-side partials — the raw event
    * stream never shuffles whole), then a single-row aggregate counts the
    * monotone prefix flags and a `stack` projection unpivots — cost is
    * O(events) map work + one user-keyed exchange, independent of step
    * count.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"funnel steps must be non-empty and distinct: $steps")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col("event_type") === s, col("ts"))).as(s"t$i")
    }
    val firsts = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy(col("user_id"))
      .agg(mins.head, mins.tail: _*)
    // b0 = reached step 0; b_i = b_{i-1} AND t_i > t_{i-1}; coalesce keeps
    // the chain false (not null) when a step is missing
    val flags = steps.indices.map { i =>
      val expr =
        if (i == 0) col("t0").isNotNull
        else col(s"b${i - 1}") && col(s"t$i") > col(s"t${i - 1}")
      coalesce(expr, lit(false)).as(s"b$i")
    }
    val counts = firsts
      .select(col("user_id") +: flags: _*)
      .agg(
        sum(when(col("b0"), 1L).otherwise(0L)).as("n0"),
        steps.indices.drop(1).map(i =>
          sum(when(col(s"b$i"), 1L).otherwise(0L)).as(s"n$i")): _*)
    val stackArgs = steps.zipWithIndex
      .map { case (s, i) => s"'$s', $i, n$i" }.mkString(", ")
    counts.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step, step_idx, n_users)")
  }

  /** Cohort retention: users grouped by their first-activity day, counted
    * on each later activity day within `maxOffset` days — the standard
    * product-analytics retention triangle. Two keyed aggregates (distinct
    * activity days per user, then min-day cohort) and one user-keyed
    * join; all counts are exact integers. At scale every stage shuffles
    * on user_id, so the exchanges chain without re-partitioning.
    */
  def cohortRetention(events: DataFrame, maxOffset: Int = 7): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }
}
