package graft

import org.apache.spark.sql.functions._

/** Sketch outputs are engine-specific (no DuckDB oracle); bound them
  * against exact computations instead.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact; approx median within 5%") {
    val dir = "/root/testdata/sf0.01"
    val li = Tables.table(spark, dir, "lineitem")
    val approx = SparkEntry.queries("approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("approx_parts"), r.getAs[Double]("approx_median"))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("d"), r.getAs[Double]("m"))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (ad, am)) =>
      val (ed, em) = exact(k)
      assert(math.abs(ad - ed).toDouble / ed < 0.10, s"$k distinct: $ad vs $ed")
      assert(math.abs(am - em) / em < 0.05, s"$k median: $am vs $em")
    }
  }
}
