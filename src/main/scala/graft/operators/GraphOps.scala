package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // Degrees via PARTIAL AGGREGATION + join, not a window. The groupBy
    // map-side-combines a node's count inside each input partition (the
    // exchange carries one row per partition per node, not the raw
    // edges), and the degree-attach join is a shuffled join AQE can
    // SKEW-SPLIT (adaptive skewJoin divides an oversized edge partition
    // across tasks and replicates the matching one-row degree side), so
    // no single task ever gathers a celebrity node's full adjacency.
    // The previous window form (count over partitionBy(src)) necessarily
    // did exactly that — one task buffers the hub's entire edge set —
    // which made a degree-10^6 hub the stage straggler while every
    // other task finished instantly (ScaleSmoke pagerank_celebrity).
    // The edge list is materialized first so the degree aggregate and
    // the attach join both read the stored partitions instead of
    // replaying the upstream build; the attached list is materialized
    // because every unrolled iteration re-reads it.
    val edges = edgeList.localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, Seq("src")).localCheckpoint()
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

  /** Triangle count over the co-purchase graph (parts linked by
    * appearing on the same order) — the third classic iterative-graph
    * primitive after components and ranks, and the standard
    * clustering-coefficient ingredient.
    *
    * Algorithm: degree-ordered edge orientation (Schank-Wagner /
    * "compact-forward"). Every undirected edge is oriented from the
    * lower-(degree, id) endpoint to the higher one, so each node's
    * out-degree is O(√m) regardless of raw-degree skew; wedges are then
    * pairs of out-edges sharing a source, and a triangle is a wedge whose
    * far endpoints are themselves an oriented edge — TWO equi-joins on
    * the oriented list, never a join on the raw (possibly
    * celebrity-skewed) adjacency. Each triangle is counted exactly once,
    * at its lowest-rank apex, which makes the TOTAL independent of the
    * orientation key — the DuckDB oracle uses plain id-orientation and
    * must produce the identical count.
    *
    * Scale: the edge list is one distinct-shuffle over (order, part)
    * pairs, MATERIALIZED once (`localCheckpoint`) — the degree build,
    * the two degree-attach joins, and the summary counts all read the
    * materialized list instead of replaying the pair self-join per
    * consumer. Degrees attach via one aggregate + broadcast-sized join
    * per endpoint; the wedge join's fan-out is bounded by the
    * orientation. n_nodes/n_edges come from ONE aggregate over the
    * degree table (Σdeg = 2·|E| exactly), not separate edge re-scans.
    * All counts are exact BIGINTs.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val pp = table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = pp.as("a").join(pp.as("b"), Seq("ok"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    triangleCountEdges(edges)
  }

  /** The counting core over an arbitrary UNDIRECTED edge list given as
    * distinct `(u, v)` rows with u < v. Returns one row:
    * `(n_nodes, n_edges, n_triangles)`.
    */
  def triangleCountEdges(edges0: DataFrame): DataFrame = {
    // materialize the (possibly expensive) edge build ONCE — without
    // this, each of {degree agg, u-attach, v-attach} replays the full
    // upstream lineage (at sf0.1 the lineitem pair self-join + distinct,
    // three times over: the single biggest cost in the round-7 bench)
    val edges = edges0.localCheckpoint()
    // deg is node-sized and consumed three times (two attach joins +
    // the fused summary aggregate) — materialize it too
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient low-rank → high-rank, rank = (deg, id); carry the far
    // endpoint's rank so the wedge join orders endpoints without a
    // third join
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst"),
          col("dv").as("ddst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"),
          col("du").as("ddst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.ddst").as("ddst"))
      .localCheckpoint()
    val wedges = oriented.as("e1").join(oriented.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("w_src"), col("e2.dst").as("w_dst"))
    val triangles = wedges.join(oriented,
      col("w_src") === col("src") && col("w_dst") === col("dst"),
      "left_semi")
    // n_nodes and n_edges fuse into ONE pass over the node-sized degree
    // table: every undirected edge contributes exactly 2 to Σdeg, so
    // Σdeg div 2 is the exact BIGINT edge count — no edge re-scan
    val summary = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"))
    triangles.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(summary)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
