package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact-decimal dot product of two double arrays as a codegen'd Catalyst
  * expression — the hot-loop replacement for the equivalent
  * `aggregate(zip_with(...))` lambda pipeline, which Spark evaluates
  * interpreted with per-element Decimal boxing (measured ~4× slower).
  *
  * Arithmetic is BIT-IDENTICAL to the lambda form and — for FINITE
  * products — to the DuckDB oracle's `list_sum(list_transform(...))`
  * over DECIMAL(19,18): each product is the IEEE double a(i)·b(i),
  * converted via `BigDecimal.valueOf` (Spark's own double→decimal cast
  * semantics) and rounded HALF_UP to scale 18, then summed exactly and
  * returned as the nearest double. Null inputs or length mismatch yield
  * null, matching `zip_with`'s null padding poisoning the sum. A
  * NaN/Infinite product also yields null — that matches Spark's
  * non-ANSI double→decimal cast (the lambda form's behavior), but NOT
  * DuckDB, whose CAST raises on NaN: bad-embedding rows are a
  * Spark-side-only concern and must be filtered before any
  * oracle-parity comparison.
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decimal_dot requires two array<double>, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"

  // Can yield null from NON-null inputs (length mismatch / null element),
  // so nullability must not derive from the children: with non-nullable
  // inputs the default would hand codegen a `false` literal for
  // `ev.isNull` and the generated `false = true;` fails to compile
  // (interpreter fallback on every row of the hot path).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = DecimalDotProduct.getClass.getName.stripSuffix("$")
    val boxed = ctx.freshName("dotBoxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = $compute.compute($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDotProduct =
    copy(left = newLeft, right = newRight)
}

object DecimalDotProduct {
  /** Static entry point shared by interpreted eval and generated code.
    * Returns null (boxed) on length mismatch or null elements.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val prod = a.getDouble(i) * b.getDouble(i)
      // a NaN/Infinite product (bad embedding row, or finite inputs
      // overflowing to Infinity) has no decimal value: the lambda form
      // this is bit-identical to casts it to DECIMAL as null (non-ANSI)
      // and the null poisons the sum — return null, never throw
      // NumberFormatException from BigDecimal.valueOf into the executor
      if (java.lang.Double.isNaN(prod) || java.lang.Double.isInfinite(prod))
        return null
      val p = JBigDecimal.valueOf(prod)
        .setScale(18, java.math.RoundingMode.HALF_UP)
      acc = acc.add(p)
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}

/** Plain-IEEE double dot product (sequential fold) — the codegen'd form of
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`. NOT oracle-exact across
  * engines (summation order sensitivity); used only for conservative
  * prefilters ahead of [[DecimalDotProduct]].
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"double_dot requires two array<double>, got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  // See DecimalDotProduct.nullable — null is reachable from non-null input.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DoubleDotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = DoubleDotProduct.getClass.getName.stripSuffix("$")
    val boxed = ctx.freshName("ddotBoxed")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = $compute.compute($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object DoubleDotProduct {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
