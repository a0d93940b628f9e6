package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session config so Verify, Bench, and tests run
  * identical settings.
  */
object Sessions {
  /** Cores to use; the driver exports SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // Shuffle width = cores, not the 200 default — at cluster scale this
      // is a capacity-planning knob; AQE coalesces small partitions anyway.
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // InferFiltersFromGenerate clones the full generator expression into
      // a pre-Generate filter; for explode(expensive-higher-order-expr)
      // (the shingle pipeline) that re-evaluates the whole expression tree
      // per row several times over — measured 5× slower at sf0.1. The
      // rule only saves work when generators commonly yield empty arrays,
      // which ours never do.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet — see Tables.table.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(appName: String): SparkSession = {
    val spark = builder().appName(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
