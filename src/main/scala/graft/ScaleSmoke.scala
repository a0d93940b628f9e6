package graft

import org.apache.spark.sql.functions._

import graft.operators.{Backtest, TradingOps}

/** Scale smoke: synthesize a many-symbol candle corpus far beyond the
  * driver's testdata (default 20M rows × 2000 symbols — 3 orders of
  * magnitude over sf0.1) and push it through the windowed + stateful
  * pipeline, proving the per-symbol partitioning story holds when the
  * symbol count, not the per-symbol depth, carries the scale (the 100 TB
  * shape: thousands of instruments × long histories).
  *
  * Deterministic data from spark.range — no RNG, no shuffle to generate.
  * Prints one JSON line with rows/sec per stage.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val symbols = if (args.length > 1) args(1).toInt else 2000
    val spark = Sessions.get("graft-scale-smoke")
    val perSym = rows / symbols
    val candles = spark.range(rows).select(
      concat(lit("s"), (col("id") % symbols)).as("symbol"),
      timestamp_micros(lit(1704067200000000L) +
        expr(s"id div $symbols") * 60000000L).as("ts"),
      (lit(100.0) + (col("id") * 2654435761L % 10000L) / 100.0).as("close"))
      .withColumn("open", col("close"))
      .withColumn("high", col("close") + 1.0)
      .withColumn("low", col("close") - 1.0)
      .withColumn("volume", lit(1.0))

    def stage(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (name, (System.nanoTime() - t0) / 1e9, n)
    }

    val results = Seq(
      stage("ma_crossover")(
        TradingOps.crossoverSignals(TradingOps.movingAverages(candles))
          .filter(col("buy_signal")).count()),
      stage("portfolio")(
        TradingOps.portfolioEvenlySpaced(candles, 10000.0, 1000.0, Some(8))
          .count()),
      stage("backtest_fold")(
        Backtest.summary(candles, Backtest.Config(maxTrades = Some(8)))
          .count()))

    val js = results.map { case (n, sec, out) =>
      s""""$n":{"sec":$sec,"rows_per_sec":${(rows / sec).toLong},"out_rows":$out}"""
    }.mkString(",")
    println(s"""{"scale_rows":$rows,"symbols":$symbols,"per_symbol":$perSym,$js}""")
    spark.stop()
  }
}
