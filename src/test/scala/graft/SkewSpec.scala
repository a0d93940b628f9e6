package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Skew handling — the two tools SCALE.md names for hot keys at 100 TB:
  * manual salting (Analytics.saltedJoin) and AQE's skew-join split.
  * Both must be RESULT-identical to the plain join; the AQE test also
  * asserts the optimizer actually split the skewed partition.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key carrying 90% of rows + a long tail
  private def skewedFact(n: Int) =
    (1 to n).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 1000).toLong
      (k, i.toLong, i * 1.5)
    }.toDF("key", "row_id", "v")

  private def dim() =
    (0L until 1000L).map(k => (k, s"dim$k")).toDF("key", "label")

  test("saltedJoin is row-identical to the plain join") {
    val fact = skewedFact(20000)
    val d = dim()
    val plain = fact.join(d, Seq("key"))
      .select(col("row_id"), col("label"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val salted = Analytics.saltedJoin(fact, d, "key", saltFactor = 8)
      .select(col("row_id"), col("label"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(salted == plain && plain.size == 20000)
  }

  test("salting spreads the hot key across partitions") {
    val fact = skewedFact(20000)
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(8)))
    val hotSpread = salted.filter(col("key") === 1L)
      .groupBy(col("__salt")).count().count()
    assert(hotSpread == 8, s"hot key only reached $hotSpread of 8 salts")
  }

  test("AQE splits a skewed sort-merge join partition, same results") {
    // dedicated session config: thresholds low enough that test-sized
    // data counts as skewed, broadcast off so the join stays sort-merge
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    import s2.implicits._
    val fact = (1 to 50000).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 1000).toLong
      (k, i.toLong, i * 1.5)
    }.toDF("key", "row_id", "v")
    val d = (0L until 1000L).map(k => (k, s"dim$k")).toDF("key", "label")
    val joined = fact.join(d, Seq("key")).select(col("row_id"), col("label"))
    // collect() (not count()) so the plan we inspect is the one executed
    assert(joined.collect().length == 50000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected a skew-split join in the final AQE plan:\n$plan")
  }
}
