package graft

import org.apache.spark.sql.functions._

/** Raw sketch estimates are engine-specific, so the DECLARED query emits
  * exact values plus accuracy-contract flags (see SparkEntry); this spec
  * checks the flags hold AND independently re-derives the bounds from
  * the raw sketches so a contract regression is caught even if the
  * declared projection were mis-wired.
  */
class SketchSpec extends SparkSpec {

  test("declared accuracy flags hold; raw sketches within contract") {
    val dir = "/root/testdata/sf0.01"
    val li = Tables.table(spark, dir, "lineitem")
    val declared = SparkEntry.queries("approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_parts"), r.getAs[Long]("hll_ok"),
          r.getAs[Long]("median_ok"))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("d"), r.getAs[Double]("m"))).toMap
    assert(declared.keySet == exact.keySet)
    declared.foreach { case (k, (ed, hllOk, medOk)) =>
      assert(ed == exact(k)._1, s"$k exact_parts: $ed vs ${exact(k)._1}")
      assert(hllOk == 1L, s"$k HLL out of 6% contract")
      assert(medOk == 1L, s"$k approx median outside exact P49..P51")
    }
    // independent re-derivation from the raw sketches
    val raw = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("hll"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("am"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("hll"), r.getAs[Double]("am"))).toMap
    raw.foreach { case (k, (hll, am)) =>
      val (ed, em) = exact(k)
      assert(math.abs(hll - ed).toDouble / ed < 0.06,
        s"$k distinct: $hll vs $ed")
      assert(math.abs(am - em) / em < 0.05, s"$k median: $am vs $em")
    }
  }
}
