package graft

import org.apache.spark.sql.functions._

/** Structural-invariant companion to the ScaleUp spot check (dev
  * harness, not part of the driver contract): by construction the
  * replication makes every copy a disjoint subgraph whose within-copy
  * structure is exactly the source's, so each checked query's output
  * must be EXACTLY factor× its source value — not "about". A ratio off
  * by even one row means the replication leaked structure across copies
  * (cross-copy fuzzy matches, shingle collisions, centroid mixing) and
  * the timing ratios measured on that data are meaningless. Run AFTER
  * the timing bench (it re-executes the queries, polluting no timings).
  *
  * Usage: runMain graft.ScaleRatios <srcDir> <scaledDir> <factor> [q,...]
  */
object ScaleRatios {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args(2).toLong
    val names = args.lift(3)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("fuzzy_join_parts", "dedup_minhash_lsh",
        "semantic_dedup", "triangle_count", "dedup_clusters_lss"))
    val spark = Sessions.get("graft-scale-ratios")
    var bad = 0
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // rows invariant: every checked query emits one row per
      // within-copy structural unit (pair / node / vector / agg row)
      val a = fn(spark, src).count()
      val b = fn(spark, dst).count()
      Sessions.releaseCaches(spark)
      // value invariant for single-row aggregates (triangle_count):
      // rows are 1 → compare the aggregate value instead
      val (va, vb) =
        if (a == 1L && b == 1L) {
          val x = fn(spark, src).head().getLong(0)
          val y = fn(spark, dst).head().getLong(0)
          Sessions.releaseCaches(spark)
          (x, y)
        } else (a, b)
      val ok = vb == va * factor
      if (!ok) bad += 1
      println(s"[ratio] $name src=$va scaled=$vb " +
        s"expected=${va * factor} ${if (ok) "OK" else "MISMATCH"}")
      // semantic_dedup's row count is one-per-vector BY SCHEMA (trivially
      // factor×) — the structural signal is how many survive the
      // intra-cell cosine prune: cross-copy centroid mixing would move
      // sum(kept) without touching the row count
      if (fn(spark, src).columns.contains("kept")) {
        val ka = fn(spark, src).agg(sum(col("kept"))).head().getLong(0)
        val kb = fn(spark, dst).agg(sum(col("kept"))).head().getLong(0)
        Sessions.releaseCaches(spark)
        val kok = kb == ka * factor
        if (!kok) bad += 1
        println(s"[ratio] $name sum(kept) src=$ka scaled=$kb " +
          s"expected=${ka * factor} ${if (kok) "OK" else "MISMATCH"}")
      }
    }
    println(s"[ratio] ${names.size - bad} ok, $bad mismatched")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
