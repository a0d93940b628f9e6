package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

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
  * Cost discipline (r12 verdict item 7): each query executes ONCE per
  * side — the result table (pairs / survivors / one aggregate row, tiny
  * next to the computation) is `localCheckpoint`ed and every invariant
  * reads the materialized output. The former count/head/sum structure
  * re-ran each query up to 4×, fine at sf0.1 and minutes-per-rerun at
  * factor 100.
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
    var nChecks = 0
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val sa = fn(spark, src).localCheckpoint()
      val sb = fn(spark, dst).localCheckpoint()
      // rows invariant: every checked query emits one row per
      // within-copy structural unit (pair / node / vector / agg row)
      val (a, b) = (sa.count(), sb.count())
      val checks = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)]
      if (a == 1L && b == 1L) {
        // single-row aggregate (triangle_count): EVERY integral column
        // must scale exactly — nodes, edges, AND triangles (r12 ADVICE:
        // the former getLong(0) compared only column 0 = n_nodes,
        // skipping the value cross-copy structure leakage would
        // actually move)
        val (ra, rb) = (sa.head(), sb.head())
        sa.schema.fields.zipWithIndex.foreach { case (f, i) =>
          f.dataType match {
            case LongType | IntegerType =>
              checks += ((f.name, ra.getAs[Number](i).longValue(),
                rb.getAs[Number](i).longValue()))
            case _ => ()
          }
        }
      } else checks += (("rows", a, b))
      // semantic_dedup's row count is one-per-vector BY SCHEMA (trivially
      // factor×) — the structural signal is how many survive the
      // intra-cell cosine prune: cross-copy centroid mixing would move
      // sum(kept) without touching the row count
      if (sa.columns.contains("kept")) {
        checks += (("sum(kept)",
          sa.agg(sum(col("kept"))).head().getLong(0),
          sb.agg(sum(col("kept"))).head().getLong(0)))
      }
      for ((label, va, vb) <- checks) {
        nChecks += 1
        val ok = vb == va * factor
        if (!ok) bad += 1
        println(s"[ratio] $name $label src=$va scaled=$vb " +
          s"expected=${va * factor} ${if (ok) "OK" else "MISMATCH"}")
      }
      Sessions.releaseCaches(spark)
    }
    println(s"[ratio] ${nChecks - bad} ok, $bad mismatched")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
