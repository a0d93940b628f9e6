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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(query)(spark, dir).count()
      println(f"[probe] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"rows=$n")
      Sessions.releaseCaches(spark)
    }
    spark.stop()
  }
}
