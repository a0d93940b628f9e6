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

  test("every declared query runs and returns rows at sf0.001") {
    // the cheap end-to-end guard the driver's Verify relies on: a query
    // that throws or comes back empty at the smallest SF is a contract
    // bug regardless of its oracle
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        if (fn(spark, dir).count() > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
