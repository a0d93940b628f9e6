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
    // SPARK_GRAFT_PLAN_EXEC=1: run each query through the bench sink
    // first and print the FINAL adaptive plan of that execution (via a
    // QueryExecutionListener on the write) instead of the pre-AQE
    // skeleton — the only way to see which exchanges actually reused
    // (ReusedExchange/ReusedQueryStage appear only at runtime; the
    // static explain shows isFinalPlan=false). Added r18 while chasing
    // a duplicated iteration-edge exchange in pagerank.
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    if (exec) {
      val captured = new java.util.concurrent.atomic.AtomicReference[String]
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            captured.set(qe.executedPlan.toString)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      names.foreach { n =>
        println(s"\n========== $n (executed adaptive plan) ==========")
        Bench.materialize(SparkEntry.queries(n)(spark, dir))
        // listener delivery is same-thread for writes; small wait for
        // safety
        Thread.sleep(500)
        println(Option(captured.get).getOrElse("(no plan captured)"))
      }
    } else names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
