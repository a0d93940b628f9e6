package graft

import org.apache.spark.sql.functions._

import graft.operators.TradingOps

/** The reference's benchmark protocol (X4, /root/reference/main.py:590-619
  * and BASELINE.md): rerun the parallel-valuation strategy at partition
  * levels p ∈ {1, 2, 4, 8, 16}, reporting execution time, final portfolio
  * value, and ROI per level — the implicit determinism check being that
  * value and ROI must agree across every level (they do by construction
  * here: DECIMAL share sums are partition-order independent).
  *
  * Prints one JSON line:
  * {"sweep":[{"partitions":p,"exec_sec":t,"final_value":v,"roi":r},...]}
  */
object BenchSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.get("graft-bench-sweep")
    val candles = Tables.candles(spark, sfDir)
    candles.count() // warm the input path so levels time the operator
    val rows = Seq(1, 2, 4, 8, 16).map { p =>
      val t0 = System.nanoTime()
      val agg = TradingOps.portfolioEvenlySpaced(
          candles.repartition(p), 10000.0, 1000.0, None)
        // accumulate the cross-symbol totals in DECIMAL too: a plain double
        // sum() adds in nondeterministic across-partition order, which can
        // flap the "same value at every level" invariant in the last ULP
        .agg(
          sum(col("final_value").cast("decimal(28,10)")).cast("double")
            .as("fv"),
          sum(col("roi").cast("decimal(28,10)")).cast("double").as("roi"))
        .collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"partitions":$p,"exec_sec":$sec,"final_value":${agg.getDouble(0)},"roi":${agg.getDouble(1)}}"""
    }
    println(s"""{"sweep":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
