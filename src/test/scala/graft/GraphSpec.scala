package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Fixed-point PageRank invariants. The bit-exact value contract lives in
  * the `pagerank_trade` DuckDB oracle (unrolled 3 iterations); these tests
  * pin the properties the oracle can't see — partition invariance and the
  * closed-form two-node fixed point.
  */
class GraphSpec extends SparkSpec {

  test("pagerank is bit-identical under different shuffle partitionings") {
    val dir = "/root/testdata/sf0.001"
    val a = GraphOps.pageRank(spark, dir).collect().toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = GraphOps.pageRank(spark, dir).collect().toSet
      assert(a == b, "integer fixed-point ranks must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("rank mass stays within the fixed-point budget and above the base floor") {
    val dir = "/root/testdata/sf0.001"
    val rows = GraphOps.pageRank(spark, dir)
      .agg(sum("rank").as("mass"), min("rank").as("lo"), count(lit(1)).as("n"))
      .collect()(0)
    val scale = 1000000000000L
    // floor division only loses mass: total ≤ scale; every node keeps at
    // least the (1-d) teleport base
    assert(rows.getLong(0) <= scale, s"mass ${rows.getLong(0)} exceeds scale")
    val n = rows.getLong(2)
    val base = (3L * (scale / n)) / 20L
    assert(rows.getLong(1) >= base,
      s"min rank ${rows.getLong(1)} below teleport base $base")
  }
}
