package graft

/** Dev tool: dump formatted physical plans for selected queries so scan
  * pushdown (PushedFilters/ReadSchema), broadcast joins, and
  * whole-stage-codegen spans can be reviewed per round.
  *
  * Usage: sbt "runMain graft.PlanDump [sfDir] [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q5_local_supplier", "p4_json_filter",
        "candles", "ann_topk", "q17_small_qty_revenue",
        "window_range_frame", "vwap_twap_daily", "dedup_minhash_lsh")
    val spark = Sessions.get("graft-plan-dump")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
