package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session registration for the engine's custom Catalyst expressions,
  * exposing them to SQL and (via `call_function`) the Column API.
  * Idempotent — safe to call per query construction: already-registered
  * sessions are skipped, so repeated calls emit no "replaced a previously
  * registered function" warnings.
  *
  * SIDE EFFECT, session-wide: beyond the function registry, `register`
  * appends [[graft.plans.BandedLevenshteinRule]] to
  * `spark.experimental.extraOptimizations` (the in-process counterpart
  * of the [[GraftExtensions]] config route). Any session an operator has
  * touched therefore optimizes `levenshtein(a,b) <= k` predicates to the
  * banded form — including in un-related queries run later on that
  * session. The rewrite is semantics-preserving (ExtensionsSpec parity
  * tests), but plan SHAPES change; plan-pinning tests should register
  * first so they pin the production plan. The whole method synchronizes
  * on this object, making the read-modify-write of
  * `extraOptimizations` atomic across threads (no double-append on
  * concurrent first calls).
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
      registry.createOrReplaceTempFunction(
        "cell_survivors",
        exprs => CellSurvivors(exprs(0), exprs(1), exprs(2)), "built-in")
    }
    // In-process route for the optimizer rule (the extensions config only
    // applies at session build): idempotent append via contains-check —
    // against BOTH routes: a session built with GraftExtensions already
    // carries the rule via injectOptimizerRule (visible in the
    // optimizer's extended rules, NOT in extraOptimizations), and
    // appending it again would run the rewrite twice per optimization.
    val extra = spark.experimental.extraOptimizations
    val alreadyInjected = spark.sessionState.optimizer
      .extendedOperatorOptimizationRules
      .contains(graft.plans.BandedLevenshteinRule)
    if (!alreadyInjected && !extra.contains(graft.plans.BandedLevenshteinRule))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.BandedLevenshteinRule
  }
}

/** `SparkSessionExtensions` entry point — the deployment-grade way to get
  * the engine's expressions into EVERY session of a cluster without code
  * changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * Injected functions are registered at session BUILD time (before any
  * query), so plain `spark.sql("SELECT md5_base60(...)")` works in
  * thriftserver/notebook sessions that never touch the Scala API. The
  * library's own code paths still call [[GraftFunctions.register]]
  * defensively — both routes are idempotent.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("decimal_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DecimalDotProduct].getName, "decimal_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DecimalDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("double_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DoubleDotProduct].getName, "double_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DoubleDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("md5_base60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Md5Base60].getName, "md5_base60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Base60(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cell_survivors"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CellSurvivors].getName, "cell_survivors"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CellSurvivors(exprs(0), exprs(1), exprs(2))))
    // thresholded edit-distance predicates → banded Levenshtein
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
  }
}
