package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable smoke entry for the streaming surface: replays the events
  * table as a file stream, builds watermarked streaming candles, and
  * prints emitted-row counts against the batch derivation.
  *
  * Usage: sbt "runMain graft.streaming.StreamDemo [sfDir]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.get("graft-stream-demo")
    val q = EventStreams.candleStream(EventStreams.eventsStream(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("candles_stream")
      .trigger(Trigger.AvailableNow()).start()
    // awaitTermination(timeout) returns false when the drain is STILL
    // RUNNING — counting the memory sink then would silently understate
    // the result this smoke exists to compare; fail loudly instead
    val drained = q.awaitTermination(300000)
    require(drained, "streaming drain did not finish within 300 s — " +
      "memory-sink counts would be partial")
    val streamed = spark.table("candles_stream").count()
    val batch = graft.Tables.candles(spark, dir).count()
    println(s"""{"streamed_candles":$streamed,"batch_candles":$batch}""")
    spark.stop()
  }
}
