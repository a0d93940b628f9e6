package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200000L
  private def ts(m: Int) = new Timestamp(base + m * 60000L)

  test("asofJoinBackward: inclusive ties, latest-prior match, null before first") {
    val left = Seq(
      ("a", ts(0), 100L),  // before any right row -> null
      ("a", ts(5), 101L),  // exactly at right row 5 -> inclusive match
      ("a", ts(7), 102L),  // between 5 and 10 -> match 5
      ("a", ts(12), 103L), // after 10 -> match 10
      ("b", ts(7), 104L))  // other key, matches b's row at 6
      .toDF("symbol", "ts", "event_id")
    val right = Seq(
      ("a", ts(5), 1.5), ("a", ts(10), 2.5), ("b", ts(6), 9.0))
      .toDF("symbol", "ts", "px")
    val got = TimeSeriesOps.asofJoinBackward(left, right, "symbol", "ts")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime),
         Option(r.getAs[Any]("px")))).toMap
    assert(got(100L) == (None, None))
    assert(got(101L) == (Some(base + 5 * 60000L), Some(1.5)))
    assert(got(102L) == (Some(base + 5 * 60000L), Some(1.5)))
    assert(got(103L) == (Some(base + 10 * 60000L), Some(2.5)))
    assert(got(104L) == (Some(base + 6 * 60000L), Some(9.0)))
  }

  test("asofJoinForward and Nearest: inclusive ties, direction, " +
    "backward tie-break") {
    val left = Seq(
      ("a", ts(0), 100L),  // fwd -> 5; nearest -> 5
      ("a", ts(5), 101L),  // exactly at right 5 -> both inclusive 5
      ("a", ts(7), 102L),  // fwd -> 10; nearest: |7-5|=2 < |10-7|=3 -> 5
      ("a", ts(12), 103L), // fwd -> null; nearest -> 10
      ("a", ts(15), 104L)) // equidistant 5/10?? no: bwd 10 (d=5), no fwd -> 10
      .toDF("symbol", "ts", "event_id")
    val right = Seq(("a", ts(5), 1.5), ("a", ts(10), 2.5))
      .toDF("symbol", "ts", "px")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)).toMap
    val fwd = toMap(
      TimeSeriesOps.asofJoinForward(left, right, "symbol", "ts"))
    assert(fwd(100L) == Some(base + 5 * 60000L))
    assert(fwd(101L) == Some(base + 5 * 60000L), "forward tie is inclusive")
    assert(fwd(102L) == Some(base + 10 * 60000L))
    assert(fwd(103L).isEmpty, "no following row -> null")
    val near = toMap(
      TimeSeriesOps.asofJoinNearest(left, right, "symbol", "ts"))
    assert(near(100L) == Some(base + 5 * 60000L))
    assert(near(101L) == Some(base + 5 * 60000L))
    assert(near(102L) == Some(base + 5 * 60000L), "2 min back beats 3 fwd")
    assert(near(103L) == Some(base + 10 * 60000L))
    // an exactly equidistant left row ties to the BACKWARD side
    val eq = Seq(("a", ts(6), 200L)).toDF("symbol", "ts", "event_id")
    val nearEq = toMap(
      TimeSeriesOps.asofJoinNearest(eq,
        Seq(("a", ts(4), 1.0), ("a", ts(8), 2.0)).toDF("symbol", "ts", "px"),
        "symbol", "ts"))
    assert(nearEq(200L) == Some(base + 4 * 60000L),
      "equidistant -> backward wins")
  }

  test("asofJoinBackward is invariant to input partitioning") {
    val left = (1 to 200).map(i => ("k" + (i % 3), ts(i), i.toLong))
      .toDF("symbol", "ts", "event_id")
    val right = (1 to 50).map(i => ("k" + (i % 3), ts(i * 4), i * 1.0))
      .toDF("symbol", "ts", "px")
    val expect = TimeSeriesOps.asofJoinBackward(left, right, "symbol", "ts")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = TimeSeriesOps.asofJoinBackward(
      left.repartition(7), right.repartition(3), "symbol", "ts")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == expect)
  }

  test("scd2Intervals collapses unchanged states and chains intervals") {
    // user 1: view, view (collapse), click, view — 3 versions
    // user 2: single event — 1 current version
    val ev = Seq(
      (10L, ts(0), 1L, "view", 1.0),
      (11L, ts(1), 1L, "view", 2.0),
      (12L, ts(2), 1L, "click", 3.0),
      (13L, ts(5), 1L, "view", 4.0),
      (14L, ts(3), 2L, "buy", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeSeriesOps.scd2Intervals(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) ->
        (r.getAs[String]("state"), r.getAs[Long]("event_id"),
         Option(r.getAs[Timestamp]("effective_to")).map(_.getTime),
         r.getAs[Int]("is_current"))).toMap
    assert(got.size == 4)
    assert(got((1L, 1)) ==
      (("view", 10L, Some(base + 2 * 60000L), 0)))
    assert(got((1L, 2)) ==
      (("click", 12L, Some(base + 5 * 60000L), 0)))
    assert(got((1L, 3)) == (("view", 13L, None, 1)))
    assert(got((2L, 1)) == (("buy", 14L, None, 1)))
    // intervals chain: version k's effective_to = version k+1's start
  }

  test("sessionize splits on inactivity gaps and aggregates per session") {
    val events = Seq(
      // user 1: minutes 0,10,20 (one session), 100,105 (second session)
      (1L, ts(0), 10.0, 0L), (1L, ts(10), 10.0, 1L), (1L, ts(20), 10.0, 2L),
      (1L, ts(100), 5.0, 3L), (1L, ts(105), 5.0, 4L),
      // user 2: single event
      (2L, ts(50), 7.0, 5L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = TimeSeriesOps.sessionize(events, 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
         r.getAs[Long]("duration_us"))).toMap
    assert(got.size == 3)
    assert(got((1L, 1L)) == (3L, 30.0, 20L * 60 * 1000000))
    assert(got((1L, 2L)) == (2L, 10.0, 5L * 60 * 1000000))
    assert(got((2L, 1L)) == (1L, 7.0, 0L))
  }

  test("sessionWindowAgg: native session windows, touching windows merge") {
    val events = Seq(
      // user 1: 0,10,20 then an event at EXACTLY gap distance (minute 50):
      // windows [20,50) and [50,80) TOUCH and Spark merges them — split
      // only on diff > gap, same boundary rule as sessionize
      (1L, ts(0), 10.0, 0L), (1L, ts(10), 10.0, 1L), (1L, ts(20), 10.0, 2L),
      (1L, ts(50), 5.0, 3L),
      // user 1: 31-minute gap DOES split (minute 81)
      (1L, ts(81), 2.0, 6L),
      // user 2: 29-minute gap stays in one session
      (2L, ts(0), 7.0, 4L), (2L, ts(29), 7.0, 5L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = TimeSeriesOps.sessionWindowAgg(events, 30)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").getTime) ->
        (r.getAs[Timestamp]("session_end").getTime,
         r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(got.size == 3)
    // session_end = last event + gap
    assert(got((1L, base)) == (base + 80 * 60000L, 4L, 35.0))
    assert(got((1L, base + 81 * 60000L)) == (base + 111 * 60000L, 1L, 2.0))
    assert(got((2L, base)) == (base + 59 * 60000L, 2L, 14.0))
  }

  test("sessionWindowAgg is invariant to input partitioning") {
    val events = (1 to 500).map(i =>
      ((i % 7).toLong, ts(i * 11 % 997), i * 1.0, i.toLong))
      .toDF("user_id", "ts", "value", "event_id")
    val expect = TimeSeriesOps.sessionWindowAgg(events, 30)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = TimeSeriesOps.sessionWindowAgg(events.repartition(13), 30)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(expect.nonEmpty && got == expect)
  }

  test("funnel counts strictly ordered first occurrences per user") {
    // u1: view(0) click(1) purchase(2)  -> reaches all 3
    // u2: view(0) click(1)              -> reaches 2
    // u3: click(0) view(1) click(5)     -> first click BEFORE first view:
    //                                      strict ordering fails at step 1
    // u4: purchase(0) only              -> reaches 0 (no view)
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      (2L, ts(0), "view"), (2L, ts(1), "click"),
      (3L, ts(0), "click"), (3L, ts(1), "view"), (3L, ts(5), "click"),
      (4L, ts(0), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeriesOps.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(1) -> (r.getString(0), r.getLong(2))).toMap
    assert(got(0) == ("view", 3L))     // u1 u2 u3
    assert(got(1) == ("click", 2L))    // u1 u2 (u3's first click precedes)
    assert(got(2) == ("purchase", 1L)) // u1
    // partition invariance
    val shuffled = TimeSeriesOps.funnel(events.repartition(7),
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(shuffled == got.map { case (k, v) => k -> v._2 })
  }
}
