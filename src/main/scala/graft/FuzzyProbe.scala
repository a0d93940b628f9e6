package graft

import org.apache.spark.sql.functions._

/** Measurement harness (dev-only, never a declared query): cost profile
  * of `fuzzy_join_parts` at a given SF — the r10 verdict's item 3.
  *
  * Historical floor analysis (sf0.1, this container): the UNCOLLAPSED
  * r10 pipeline ran every record through the deletion-variant buckets,
  * so duplicate-name groups re-emitted their pairs under all ~49 shared
  * variants — 981k variant rows, 6.83M emitted bucket pairs deduping to
  * 252k (27× redundancy), 5.9 s end-to-end with the bucket aggregate +
  * pair explode as the dominant stages. The r11 name-group collapse
  * (Analytics.fuzzyMatchPairs) runs candidates+DP per DISTINCT
  * (brand, name) and expands groups at the end: ~1.3 s for the
  * identical 220,542-row result. This probe prints the collapse stats
  * and the end-to-end time so the ratio stays measurable per round.
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.get("graft-fuzzy-probe")
    val parts = Tables.table(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_name"))

    val st = parts.agg(count(lit(1)).as("n"),
      count_distinct(col("p_brand"), col("p_name")).as("names"),
      avg(length(col("p_name"))).as("len")).head()
    println(f"[fuzzy] parts=${st.getLong(0)} distinctNames=${st.getLong(1)} " +
      f"avgLen=${st.getDouble(2)}%.1f " +
      f"(collapse ratio ${st.getLong(0).toDouble / st.getLong(1)}%.2f×)")

    val ts = (1 to runs).map { _ =>
      Sessions.releaseCaches(spark)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("fuzzy_join_parts")(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[fuzzy] declared query best-of-$runs ${ts.map(_._1).min}%.2f s " +
      s"rows=${ts.head._2}")
    // Optional 3rd arg: comma-separated maxBlockSize caps (0 = the
    // unlimited default) — runs the DECLARED qgram scope (Brand#13)
    // through fuzzyMatchPairsQgram at each cap, printing time + emitted
    // pairs, so the mega-block guard's time/recall trade stays
    // measurable per round at any SF (SCALE.md factor-100 tables).
    args.lift(2).foreach { caps =>
      val recs = Tables.table(spark, dir, "part")
        .filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      caps.split(',').map(_.trim.toInt).foreach { cap =>
        Sessions.releaseCaches(spark)
        val t0 = System.nanoTime()
        val n = operators.Analytics.fuzzyMatchPairsQgram(recs, 2, 3,
          if (cap <= 0) Int.MaxValue else cap).count()
        println(f"[fuzzy] qgram cap=$cap%d " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n%d")
      }
    }
    spark.stop()
  }
}
