package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session registration for the engine's custom Catalyst expressions,
  * exposing them to SQL and (via `call_function`) the Column API.
  * Idempotent — safe to call per query construction: already-registered
  * sessions are skipped, so repeated calls emit no "replaced a previously
  * registered function" warnings.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("md5_base60"))) {
      registry.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs.head), "built-in")
      registry.createOrReplaceTempFunction(
        "decimal_dot", exprs => DecimalDotProduct(exprs(0), exprs(1)),
        "built-in")
      registry.createOrReplaceTempFunction(
        "double_dot", exprs => DoubleDotProduct(exprs(0), exprs(1)),
        "built-in")
      registry.createOrReplaceTempFunction(
        "md5_base60", exprs => Md5Base60(exprs.head), "built-in")
    }
  }
}
