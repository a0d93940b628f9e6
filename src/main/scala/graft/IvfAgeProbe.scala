package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness (dev-only, never a declared query): ages an IVF
  * cell layout through N daily [[Similarity.appendToCellLayout]] ingests
  * and measures what the accumulation of per-append files does to probe
  * latency — the r14 verdict's item 5 ("appendToCellLayout after N
  * daily deltas leaves N files per cell").
  *
  * Design: the aged layout is compared at each checkpoint against a
  * REBUILT (compacted) layout of the IDENTICAL corpus, so the file-count
  * effect is isolated from the corpus simply growing — the delta between
  * the two lines at one checkpoint is pure small-files overhead, the
  * thing a compaction op would reclaim. Deltas are day-offset copies of
  * a 10% corpus slice (vec_id offset per day like every ScaleUp entity
  * key; embeddings sign-flipped per day with the same md5-free
  * hash(d, day) diagonal ±1 rotation ScaleUp uses, so cell assignment
  * stays non-degenerate), deterministic end-to-end.
  *
  * Usage: runMain graft.IvfAgeProbe [sfDir] [nAppends] [checkEvery]
  */
object IvfAgeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(30)
    val checkEvery = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.get("graft-ivf-age")
    val emb = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val vecStep =
      ((emb.agg(max(col("vec_id"))).head().getLong(0) / 100L) + 1L) * 100L
    val root = java.nio.file.Files.createTempDirectory("ivf_age").toString
    val aged = s"$root/aged"
    Similarity.writeCellPartitioned(emb, aged)

    // day-i delta: 10% slice, day-offset ids, day-rotated embeddings
    def delta(day: Int) = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(day * vecStep)).as("vec_id"),
        transform(col("embedding"), (x, d) =>
          (x * when(pmod(hash(d, lit(day)), lit(2)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f))).cast("float")).as("embedding"),
        col("label"))

    def fileStats(path: String): (Int, Double) = {
      val layout = spark.read.parquet(path)
      val files = layout.inputFiles.length
      (files, files.toDouble / layout.select("cell").distinct().count())
    }

    def probeMin(path: String, runs: Int = 3): Double =
      (1 to runs).map { _ =>
        Sessions.releaseCaches(spark)
        val t0 = System.nanoTime()
        Similarity.annTopKFromLayout(spark, path, 8, 5, 6).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    def checkpoint(day: Int, corpus: org.apache.spark.sql.DataFrame)
        : Unit = {
      // rebuilt baseline: the same corpus compacted to one file per cell
      val fresh = s"$root/fresh_$day"
      Similarity.writeCellPartitioned(corpus, fresh)
      val (af, apc) = fileStats(aged)
      val (ff, _) = fileStats(fresh)
      val (ta, tf) = (probeMin(aged), probeMin(fresh))
      println(f"[ivfage] day=$day%3d corpus=${corpus.count()}%7d " +
        f"agedFiles=$af%4d (per-cell $apc%5.1f) freshFiles=$ff%3d " +
        f"agedProbe=$ta%6.3f s freshProbe=$tf%6.3f s " +
        f"overhead=${ta / tf}%5.2f x")
      // the rebuilt baseline is measurement-only — drop it so the probe
      // doesn't litter a full corpus copy per checkpoint under tmp
      rmTree(new java.io.File(fresh))
    }

    var corpus = emb
    checkpoint(0, corpus)
    for (day <- 1 to nAppends) {
      // bind the day's delta once — delta(day) is a plan BUILDER, and
      // two calls would construct (and, on action, run) two identical
      // slice-filter plans. No localCheckpoint here: probeMin calls
      // releaseCaches between runs, which would wipe the blocks and
      // truncate the lineage the corpus union still needs.
      val d = delta(day)
      Similarity.appendToCellLayout(spark, aged, d)
      corpus = corpus.unionByName(d)
      if (day % checkEvery == 0 || day == nAppends) checkpoint(day, corpus)
    }
    spark.stop()
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }
}
