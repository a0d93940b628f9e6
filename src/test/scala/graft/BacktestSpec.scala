package graft

import graft.operators.Backtest
import graft.operators.Backtest.{Config, Position}

class BacktestSpec extends SparkSpec {

  /** Direct sequential re-implementation of the reference loop
    * (main.py:392-443) used as a differential oracle for the distributed
    * fold: rolling means computed naively, then the exact state machine.
    */
  private def referenceMachine(
      closes: Seq[Double], cfg: Config): (Double, List[(Int, Int)]) = {
    def ma(n: Int): Seq[Double] = closes.indices.map { i =>
      val lo = math.max(0, i - n + 1)
      closes.slice(lo, i + 1).sum / (i - lo + 1)
    }
    val s = ma(cfg.shortN); val l = ma(cfg.longN)
    var budget = cfg.initialBudget
    var inPos = false; var entryIdx = -1; var entryPrice = 0.0
    var trades = 0
    var positions = List.empty[(Int, Int)] // (entryIdx, exitIdx)
    var i = 1
    var broke = false
    while (i < closes.length && !broke) {
      if (cfg.maxTrades.exists(trades >= _)) { broke = true }
      else {
        if (!inPos && s(i - 1) <= l(i - 1) && s(i) > l(i)) {
          if (budget >= cfg.perTrade) {
            inPos = true; entryIdx = i; entryPrice = closes(i)
            trades += 1; budget -= cfg.perTrade
          }
        } else if (inPos && s(i - 1) >= l(i - 1) && s(i) < l(i)) {
          inPos = false
          budget += cfg.perTrade / entryPrice * closes(i)
          positions :+= (entryIdx, i)
        }
        i += 1
      }
    }
    if (inPos) {
      budget += cfg.perTrade / entryPrice * closes.last
      positions :+= (entryIdx, closes.length - 1)
    }
    (budget, positions)
  }

  private def runFold(closes: Seq[Double], cfg: Config): Seq[Position] =
    Backtest.positions(candleFrame(Map("x" -> closes)), cfg)
      .collect().sortBy(_.entry_ts.getTime).toSeq

  private def minuteIdx(p: Position): (Int, Int) = (
    ((p.entry_ts.getTime - 1704067200000L) / 60000L).toInt,
    ((p.exit_ts.get.getTime - 1704067200000L) / 60000L).toInt)

  /** Deterministic pseudo-random walk (no RNG in tests). */
  private def walk(n: Int, seed: Int): Seq[Double] = {
    var x = seed.toLong
    (1 to n).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L) >>> 11
      50.0 + (x % 2000L) / 100.0
    }
  }

  test("fold matches the sequential reference machine (uncapped)") {
    for (seed <- Seq(1, 7, 42)) {
      val closes = walk(300, seed)
      val cfg = Config(shortN = 3, longN = 8)
      val (_, expected) = referenceMachine(closes, cfg)
      val got = runFold(closes, cfg).map(minuteIdx)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("fold matches the reference machine with maxTrades break") {
    for (k <- Seq(1, 2, 5)) {
      val closes = walk(300, 13)
      val cfg = Config(maxTrades = Some(k), shortN = 3, longN = 8)
      val (_, expected) = referenceMachine(closes, cfg)
      val got = runFold(closes, cfg).map(minuteIdx)
      assert(got == expected, s"k=$k")
      assert(got.size <= k)
    }
  }

  test("budget gate blocks opens when budget < perTrade") {
    val closes = walk(300, 99)
    // budget covers exactly 2 trades and losses can't free up a third slot
    val cfg = Config(initialBudget = 2000.0, perTrade = 1000.0,
      shortN = 3, longN = 8)
    val (_, expected) = referenceMachine(closes, cfg)
    val got = runFold(closes, cfg).map(minuteIdx)
    assert(got == expected)
  }

  test("open position is force-liquidated at the true last row") {
    // golden cross at row 2 (with shortN=1, longN=2), then no death cross
    val closes = Seq(10.0, 10.0, 20.0, 30.0, 40.0)
    val cfg = Config(shortN = 1, longN = 2)
    val got = runFold(closes, cfg)
    assert(got.size == 1)
    val (e, x) = minuteIdx(got.head)
    assert(e == 2 && x == 4)
    assert(got.head.exit_price.contains(40.0))
  }

  test("no crossovers -> no positions; summary yields no row") {
    val closes = Seq(10.0, 10.0, 10.0, 10.0)
    assert(runFold(closes, Config(shortN = 2, longN = 3)).isEmpty)
    assert(Backtest.summary(
      candleFrame(Map("x" -> closes)), Config(shortN = 2, longN = 3))
      .count() == 0)
  }

  test("summary final_value/roi equal the machine's final budget") {
    val closes = walk(400, 5)
    val cfg = Config(shortN = 3, longN = 8)
    val (expectedBudget, _) = referenceMachine(closes, cfg)
    val row = Backtest.summary(candleFrame(Map("x" -> closes)), cfg)
      .collect().head
    assert(math.abs(row.getAs[Double]("final_value") - expectedBudget) < 1e-6)
    assert(math.abs(row.getAs[Double]("roi") -
      (expectedBudget - 10000.0) / 10000.0 * 100.0) < 1e-6)
  }

  test("positions are invariant to input partitioning and parallel by symbol") {
    val frame = candleFrame(Map(
      "a" -> walk(250, 3), "b" -> walk(250, 4), "c" -> walk(250, 6)))
    val cfg = Config(shortN = 3, longN = 8)
    val base = Backtest.positions(frame, cfg).collect()
      .map(p => (p.symbol, minuteIdx(p))).sorted.toSeq
    for (p <- Seq(1, 2, 16)) {
      val got = Backtest.positions(frame.repartition(p), cfg).collect()
        .map(q => (q.symbol, minuteIdx(q))).sorted.toSeq
      assert(got == base, s"partitions=$p")
    }
  }
}
