package graft

import org.apache.spark.sql.functions._

/** Measurement harness (dev-only): quantifies the density-robust replay
  * slicing (SCALE.md r15) on a BURSTY events corpus — most rows inside
  * a narrow event-time burst, the rest spread thin over weeks. Pure
  * equal-TIME slicing puts the whole burst in one slice file = one
  * micro-batch, so the per-batch ingest (the state high-water mark the
  * autoSlices heap bound is about) is corpus-sized regardless of the
  * derived slice count; the declared density-aware form must hold every
  * slice file at-or-under the derived row cap except the documented
  * point-mass floor. Prints both layouts' per-slice-file row
  * distributions, then runs the DECLARED stream_followups drain on the
  * bursty directory end-to-end.
  *
  * Usage: BurstProbe [rows=20000000] [burstPct=80]
  */
object BurstProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val burstPct = args.lift(1).map(_.toInt).getOrElse(80)
    val spark = Sessions.get("graft-burst-probe")
    val dir = s"/tmp/graft-bursty-$rows-$burstPct"
    val base = 1700000000000L
    val burstRows = rows * burstPct / 100
    // deterministic, no RNG: the first burstPct% of ids land inside a
    // 2-hour burst; the rest hash-spread over 30 days
    spark.range(rows).select(
        col("id").as("event_id"),
        timestamp_millis(when(col("id") < burstRows,
            lit(base) + (col("id") * 2654435761L) % 7200000L)
          .otherwise(lit(base) +
            (col("id") * 2654435761L) % (30L * 86400000L))).as("ts"),
        (col("id") % 100000L).as("user_id"),
        concat(lit("t"), col("id") % 7).as("event_type"),
        // ~1% signal rows (value > the declared 100.0 threshold): the
        // probe measures replay/state geometry, and a signal-dense burst
        // would make the interval join's OUTPUT combinatorial (each
        // user's signals x followups inside the burst) — a query-output
        // property, not the slicing property under test
        when(col("id") % 100L === 0L, lit(500.0)).otherwise(lit(1.0))
          .as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    def sliceRows(drop: String): Seq[Long] =
      new java.io.File(drop).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => spark.read.parquet(f.getPath).count()).toSeq

    val ev = Tables.table(spark, dir, "events")
    // the declared derivation: n = ceil(rows / cap), cap = worker-heap
    // rule (8 M on this 8 GiB host)
    val capRows = math.max(1000000L,
      (8000000.0 * Sessions.workerHeapBytes(spark) / (1L << 33)).toLong)
    val n = math.max(2, math.ceil(rows.toDouble / capRows).toInt)
    val timeOnly = streaming.EventStreams.writeTimeSlices(
      ev, s"/tmp/graft-burst-timeonly-$rows-$burstPct", n)
    val capped = streaming.EventStreams.writeTimeSlices(
      ev, s"/tmp/graft-burst-capped-$rows-$burstPct", n, capRows)
    val (to, cp) = (sliceRows(timeOnly), sliceRows(capped))
    println(s"[burst] rows=$rows burst=$burstPct% cap=$capRows n=$n")
    println(s"[burst] time-only slices=${to.length} max=${to.max} " +
      s"dist=${to.mkString(",")}")
    println(s"[burst] capped    slices=${cp.length} max=${cp.max} " +
      s"dist=${cp.mkString(",")}")
    println(f"[burst] max-ingest ratio ${to.max.toDouble / cp.max}%.2f x " +
      s"(capped holds the bound: ${cp.max <= capRows})")

    // the declared drain end-to-end on the bursty corpus (uses the
    // capped path automatically via candleReplayFor)
    val t0 = System.nanoTime()
    val out = SparkEntry.queries("stream_followups")(spark, dir).count()
    println(f"[burst] declared stream_followups " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s rows=$out")
    spark.stop()
  }
}
