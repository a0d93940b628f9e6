package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Measurement harness (like PerfProbe/CountPlan — never part of a
  * declared query): generic per-STAGE cost table for any declared query,
  * under the honest bench sink. The r16 sink fix restored operators the
  * old count() instrument had been deleting, so 22 queries got their
  * first honest timings with NO per-stage attribution; this probe gives
  * any of them the SCALE.md r8 ">2 s stage-by-stage" treatment without
  * a bespoke PerfProbe function per query.
  *
  * Protocol: one warm run (JIT/codegen/checkpoint build), then one
  * measured run through [[Bench.materialize]] (the exact bench sink)
  * with a SparkListener capturing each completed stage's wall time,
  * shuffle read/write bytes, spill bytes, and task count. Stages print
  * slowest-first. Driver-side listener delivery is async — the probe
  * waits for the listener bus to drain before printing.
  *
  * Usage: tools/java_run.sh graft.StageProbe <query> [query ...]
  * (SPARK_GRAFT_SF_DIR selects the data directory, default sf0.1).
  */
object StageProbe {
  private case class Row(id: Int, name: String, sec: Double,
    tasks: Int, shufRead: Long, shufWrite: Long, spillMem: Long,
    spillDisk: Long)

  private def mb(b: Long): String = f"${b / 1048576.0}%.1f"

  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (names.isEmpty || unknown.nonEmpty) {
      System.err.println(
        (if (unknown.nonEmpty) s"unknown queries: ${unknown.mkString(", ")}\n"
         else "") +
        "usage: tools/java_run.sh graft.StageProbe <query> [query ...]")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("graft-stage-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    // `seen` counts EVERY stage completion regardless of capture state:
    // listener delivery is async, so the warm run's straggler events can
    // arrive after the measured run begins — draining on `seen` (not
    // `rows`, which the warm run never touches) is what lets the probe
    // wait out the warm run's tail BEFORE arming capture (r17 ADVICE).
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var capture = false
    // Per-stage task durations (r18): a stage that stays slow after a
    // width fix is either SKEWED (max ≫ median task) or
    // constant-dominated (max ≈ median, both small vs stage wall) —
    // stage-level numbers cannot tell the two apart. Guide §2.5's
    // max/median diagnostic, captured per stage.
    val taskSecs = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (capture && e.taskInfo != null) taskSecs
          .computeIfAbsent(e.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[
              java.lang.Double]())
          .add(e.taskInfo.duration / 1000.0)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        seen.incrementAndGet()
        if (capture) {
          val si = e.stageInfo
          val m = si.taskMetrics
          val sec = (for (a <- si.submissionTime; b <- si.completionTime)
            yield (b - a) / 1000.0).getOrElse(0.0)
          // AQE stages all carry the useless "$anonfun$withThreadLocal
          // Captured" name; the first graft frame in the stage's
          // submission stack names the operator line that BUILT the
          // stage's plan — coarse (plan-construction site, not
          // per-operator) but enough to tell an edge build from an
          // iteration from a checkpoint (r18).
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("StageProbe"))
            .orElse(si.details.linesIterator.find(l =>
              l.contains("sql.execution") &&
                !l.contains("SQLExecution") && !l.contains("withThreadLocal") &&
                !l.contains("QueryExecution") && !l.contains("adaptive")))
            .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
            .getOrElse("")
          val name = si.name.takeWhile(_ != '\n')
          val label = if (name.startsWith("$anonfun")) site
            else s"$name $site".trim
          rows.add(Row(si.stageId, label, sec,
            si.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled,
            m.diskBytesSpilled))
        }
      }
    }
    // poll until `count()` is stable for 1 s (bounded at 20 s) — the
    // listener-bus drain used after BOTH the warm run (so its straggler
    // events are never attributed to the measured run) and the measured
    // run (so the table is complete before printing)
    def drainListener(count: () => Int): Unit = {
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 4 && waited < 80) {
        Thread.sleep(250); waited += 1
        if (count() == last) stable += 1 else { stable = 0; last = count() }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      Bench.materialize(fn(spark, sfDir)) // warm (JIT, codegen, layouts)
      Sessions.releaseCaches(spark)
      System.gc()
      drainListener(() => seen.get())
      rows.clear()
      capture = true
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      drainListener(() => rows.size)
      capture = false
      println(f"[stage] == $n: total $total%.2f s, ${rows.size} stages " +
        s"(warm run, noop sink, $sfDir) ==")
      println("[stage] | stage | sec | tasks | task max/med s | " +
        "shuf read MB | shuf write MB | spill mem MB | spill disk MB |")
      val it = rows.iterator()
      var all = List.empty[Row]
      while (it.hasNext) all = it.next() :: all
      all.sortBy(-_.sec).foreach { r =>
        val ts = Option(taskSecs.get(r.id)).map { q =>
          val a = q.toArray(Array.empty[java.lang.Double])
            .map(_.doubleValue).sorted
          if (a.isEmpty) "-"
          else f"${a.last}%.2f/${a(a.length / 2)}%.2f"
        }.getOrElse("-")
        println(s"[stage] | ${r.id} ${r.name} | ${f"${r.sec}%.2f"} | " +
          s"${r.tasks} | $ts | ${mb(r.shufRead)} | ${mb(r.shufWrite)} | " +
          s"${mb(r.spillMem)} | ${mb(r.spillDisk)} |")
      }
      taskSecs.clear()
      Sessions.releaseCaches(spark)
      System.gc()
    }
    spark.stop()
  }
}
