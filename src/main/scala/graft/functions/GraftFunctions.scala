package graft.functions

import org.apache.spark.sql.SparkSession

/** Session registration for the engine's custom Catalyst expressions,
  * exposing them to SQL and (via `call_function`) the Column API.
  * Idempotent — safe to call per query construction.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decimal_dot", exprs => DecimalDotProduct(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_dot", exprs => DoubleDotProduct(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_base60", exprs => Md5Base60(exprs.head), "built-in")
  }
}
