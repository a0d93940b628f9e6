package graft

/** Mirrors the driver's t1 smoke: flagship entry must return rows. */
class EntrySpec extends SparkSpec {
  test("entry() yields at least one row per symbol at sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length >= 5, s"expected per-symbol valuations, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Double]("final_value") > 0.0)
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
