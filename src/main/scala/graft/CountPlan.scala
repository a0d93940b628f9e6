package graft

/** Dev probe (r16): detect queries whose expensive operator would be
  * DELETED under a `count()` action. `df.count()` re-optimizes the plan
  * around the aggregate's needs; column pruning then removes any
  * operator whose output is projection-only — e.g. the as-of join
  * family's window-match column, leaving a bare scan. Bench materializes
  * through the noop sink for exactly this reason; this probe is the
  * audit that finds such queries (count plan loses its Window/Sort
  * while the full plan keeps them).
  *
  * Usage: tools/java_run.sh graft.CountPlan [sfDir] [query ...]
  * (default: every declared query — one line each).
  */
object CountPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq
    // validate BEFORE session startup: a typo'd name used to surface as
    // a bare NoSuchElementException only after Spark spun up (r16 ADVICE)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")}\n" +
        "usage: tools/java_run.sh graft.CountPlan [sfDir] [query ...]\n" +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = Sessions.get("graft-count-plan")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val cnt = df.groupBy().count().queryExecution.executedPlan.toString
      val full = df.queryExecution.executedPlan.toString
      def sig(p: String) = Seq("Window", "SortMergeJoin", "HashJoin")
        .map(k => s"$k=${p.contains(k)}").mkString(" ")
      val pruned = Seq("Window", "SortMergeJoin", "HashJoin")
        .exists(k => full.contains(k) && !cnt.contains(k))
      println(s"${if (pruned) "PRUNED-UNDER-COUNT" else "ok"} $n " +
        s"[full: ${sig(full)}] [count: ${sig(cnt)}]")
    }
    spark.stop()
  }
}
