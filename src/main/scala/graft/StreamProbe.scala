package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement harness (dev-only): attach a StreamingQueryListener and
  * run one declared streaming drain, printing each micro-batch's
  * durationMs breakdown (addBatch / getBatch / latestOffset /
  * queryPlanning / commitOffsets / walCommit) — the floor analysis for
  * the drains' fixed overhead (r10 verdict item 5).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val query = args.lift(1).getOrElse("stream_candles")
    val spark = Sessions.get("graft-stream-probe")
    // Optional state-store backend override (probe-only; the declared
    // queries always run the session default): "rocksdb" measures the
    // off-heap production backend against the default HDFS-backed
    // in-memory store — the constant the autoSlices scaladoc claims the
    // backend moves. Session-conf set BEFORE any stream starts; each
    // drain opens a fresh checkpoint, so the provider binds per run.
    if (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
        // per-operator state-store breakdown (r18, the stream_dedup
        // drain attribution): updates vs removals vs commit is what
        // separates "state-store puts are the cost" from "the
        // micro-batch machinery is the cost"
        p.stateOperators.foreach { so =>
          println(s"[probe] state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"removed=${so.numRowsRemoved} updMs=${so.allUpdatesTimeMs} " +
            s"rmMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs} " +
            s"memMB=${so.memoryUsedBytes / 1048576}")
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    def intArg(i: Int, name: String, default: Int): Int =
      args.lift(i).map { s =>
        try s.toInt catch { case _: NumberFormatException =>
          sys.error(s"usage: StreamProbe [dir] [query] [slices] [runs] — " +
            s"$name must be an integer, got '$s'")
        }
      }.getOrElse(default)
    // Optional 3rd arg: force the replay slice count (bypasses the
    // autoSlices derivation) — the knob that lets the probe re-create
    // the EXACT fixed-2-slice geometry whose per-batch ingest OOM'd the
    // in-memory state store at factor 300, against a different backend.
    // NOTE each distinct forced count builds its own full replay copy of
    // the corpus in scratch (the fixture memo keys on the slice count) —
    // bounded per probe invocation, but don't sweep it casually at sf30.
    val slices = intArg(2, "slices", 0)
    // Optional 4th arg: run count (default 3) — completion-type probes
    // (does geometry X survive backend Y) need one run, not a min-of-3.
    val runs = intArg(3, "runs", 3)
    def run(): org.apache.spark.sql.DataFrame =
      if (slices > 0) query match {
        case "stream_followups" =>
          graft.streaming.EventStreams.streamFollowups(spark, dir, slices)
        case "stream_dedup" =>
          graft.streaming.EventStreams.streamDedup(spark, dir, slices)
        case "stream_candles" =>
          graft.streaming.EventStreams.streamCandles(spark, dir, slices)
        case other => sys.error(s"no slices override for $other")
      } else SparkEntry.queries(query)(spark, dir)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = run().count()
      println(f"[probe] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"rows=$n")
      Sessions.releaseCaches(spark)
    }
    spark.stop()
  }
}
