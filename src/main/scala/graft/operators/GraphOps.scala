package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over the trade graph (customers ↔ suppliers
  * linked by order lines). Complements the dedup module's connected
  * components (min-label propagation + large-star/small-star): PageRank
  * is the canonical "ranks need MANY passes" workload, the shape used in
  * LLM-data curation for graph-based source-authority weighting.
  *
  * Exactness design: ranks are FIXED-POINT BIGINTs (scale 1e12), all
  * updates use integer multiply + floor division (Spark `div` ≡ DuckDB
  * `//` on non-negative operands). Integer sums are exact and
  * order-independent, so the result is bit-identical under any
  * partitioning AND engine — a DuckDB oracle can replay the iterations
  * unrolled. Floating-point PageRank cannot make that promise: double
  * accumulation order varies with the shuffle.
  *
  * Scale story: the edge list is built once (one distinct-shuffle),
  * `localCheckpoint`ed so the per-iteration joins reuse the materialized
  * graph instead of re-shuffling lineitem; each iteration is one
  * node-keyed join + one dst-keyed aggregate (two exchanges), the same
  * per-round cost as the dedup label-propagation loop. Degrees attach to
  * edges ONCE outside the loop. At 100 TB the graph build dominates;
  * iterations touch only (src, dst, deg, rank) longs.
  */
object GraphOps {
  import Tables.table

  /** Fixed-iteration PageRank (damping 17/20 = 0.85) on the symmetrized
    * customer↔supplier graph. Node ids: customer c → 2c, supplier s →
    * 2s+1 (disjoint key spaces, reversible for output). Every node in
    * the symmetric edge set has in- and out-degree ≥ 1, so there are no
    * dangling-mass corrections to model.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    val forward = table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    // bipartite: reversed edges are disjoint from forward ones — the
    // union IS the symmetric closure, no second distinct needed
    val edges = forward
      .union(forward.select(col("dst").as("src"), col("src").as("dst")))
    pageRankEdges(edges, iters, scale).select(
      when(col("node") % 2 === 0, lit("customer"))
        .otherwise(lit("supplier")).as("node_type"),
      expr("node div 2").as("node_key"),
      col("rk").as("rank"))
  }

  /** The iteration core over an arbitrary SYMMETRIC `(src, dst)` edge
    * list (every node must have out-degree ≥ 1 — guaranteed by
    * symmetrization). Returns `(node, rk)` fixed-point ranks.
    */
  def pageRankEdges(edgeList: DataFrame, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    // degree attaches in ONE window pass and the (src, dst, deg) list is
    // MATERIALIZED — the unrolled iteration lineage re-scans it instead
    // of re-aggregating degrees inside every level (the naive
    // edges⋈groupBy form re-planned the degree exchange per iteration)
    val withDeg = edgeList.withColumn("deg",
      count(lit(1)).over(Window.partitionBy(col("src"))))
      .localCheckpoint()
    val nodes = withDeg.select(col("src")).distinct()
    val n = nodes.count() // driver-coordinated like the Lloyd/cluster loops
    val init = scale / n
    val base = (3L * init) / 20L // (1-d) * scale/N in fixed point
    var rank = nodes.select(col("src").as("node"), lit(init).as("rk"))
    for (_ <- 1 to iters) {
      rank = withDeg.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("rk div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(17 * s) div 20")).as("rk"))
    }
    rank
  }
}
