package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass centroid-argmax survivor selection — the hot loop of every
  * cell assignment (IVF build/append, k-means, SemDeDup, coarse probe).
  *
  * Replaces the HOF pipeline
  * {{{
  *   simds = transform(cells, c => when(nrm*c_norm > 0, double_dot(v, cvec)/(nrm*c_norm)).otherwise(0.0))
  *   mx    = array_max(simds)
  *   surv  = filter(zip_with(cells, simds, struct(...)), x => x.simd >= mx - 1e-6)
  * }}}
  * whose collapsed-projection form re-evaluates `mx` — itself an
  * `array_max` over the FULL `transform` — inside the filter lambda, per
  * cell element: O(nlist² · dims) per row, interpreted. Invisible at the
  * 10-cell toy codebook; at the nlist ≈ √n geometry a real index uses
  * (1000 cells at 1M vectors) it turned one corpus assignment into
  * ~10¹² interpreted ops. This expression computes the sims, the max,
  * and the survivor filter in a single primitive double loop:
  * O(nlist · dims) per row and no per-element lambda plumbing.
  *
  * Semantics are bit-identical to the lambda form, including its edge
  * cases:
  *   - a cell whose `nrm * c_norm > 0` guard is false OR NULL scores
  *     0.0 (the `otherwise` branch) — including a null cell struct;
  *   - a null/length-mismatched/null-element `cvec` (or vector) under a
  *     true guard scores NULL: it neither feeds the max (`array_max`
  *     skips nulls) nor survives (`null >= x` filters out);
  *   - the max uses Spark's total double ordering (NaN greatest,
  *     -0.0 < 0.0 — `java.lang.Double.compare`), the survivor test the
  *     IEEE `>=` of the lambda, so an all-NaN row yields an empty
  *     survivor array exactly as `filter` does;
  *   - null `cells` input yields NULL (the collapsed pipeline's
  *     null-propagation through `zip_with`).
  *
  * Output: `array<struct<cell fields..., simd double>>` — the survivors
  * (cells within 1e-6 of the double max, input order preserved), ready
  * for the existing decimal-exact rescore that picks the final cell.
  * CodegenFallback is fine here: the per-call work is O(nlist · dims),
  * so the one virtual eval call per row amortizes to nothing.
  */
case class CellSurvivors(vec: Expression, nrm: Expression, cells: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = nrm
  override def third: Expression = cells

  private lazy val cellStruct: StructType =
    cells.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
  private lazy val labelType: DataType = cellStruct.fields(0).dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType, cells.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, ArrayType(st: StructType, _))
          if st.fields.length == 3 &&
            (st.fields(1).dataType match {
              case ArrayType(DoubleType, _) => true; case _ => false
            }) && st.fields(2).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "cell_survivors requires (array<double>, double, " +
          "array<struct<label, array<double>, double>>), got " +
          s"${a.simpleString(20)}, ${b.simpleString(20)}, ${c.simpleString(40)}")
    }

  override def dataType: DataType =
    ArrayType(StructType(cellStruct.fields.map(_.copy(nullable = true)) :+
      StructField("simd", DoubleType, nullable = false)),
      containsNull = false)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val cellsV = cells.eval(input)
    if (cellsV == null) return null
    val arr = cellsV.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nrmV = nrm.eval(input)
    val nrmNull = nrmV == null
    val nrmD = if (nrmNull) 0.0 else nrmV.asInstanceOf[Double]
    val vecV = vec.eval(input)
    // pre-read the query vector once per row (null element poisons every
    // dot, exactly like DoubleDotProduct's first-null return)
    var vecArr: Array[Double] = null
    if (vecV != null) {
      val va = vecV.asInstanceOf[ArrayData]
      val vn = va.numElements()
      val out = new Array[Double](vn)
      var ok = true
      var i = 0
      while (ok && i < vn) {
        if (va.isNullAt(i)) ok = false
        else { out(i) = va.getDouble(i); i += 1 }
      }
      if (ok) vecArr = out
    }
    val sims = new Array[Double](n)
    val simNull = new Array[Boolean](n)
    var mx = 0.0
    var mxSet = false
    var i = 0
    while (i < n) {
      var sim = 0.0
      var isNull = false
      if (!arr.isNullAt(i)) {
        val st = arr.getStruct(i, 3)
        if (nrmNull || st.isNullAt(2)) {
          sim = 0.0 // guard NULL -> otherwise(0.0)
        } else {
          val p = nrmD * st.getDouble(2)
          if (!(p > 0)) sim = 0.0 // guard false (incl. NaN p)
          else if (vecArr == null || st.isNullAt(1)) isNull = true
          else {
            val cv = st.getArray(1)
            val cn = cv.numElements()
            if (cn != vecArr.length) isNull = true
            else {
              var acc = 0.0
              var d = 0
              var ok = true
              while (ok && d < cn) {
                if (cv.isNullAt(d)) ok = false
                else { acc += vecArr(d) * cv.getDouble(d); d += 1 }
              }
              if (!ok) isNull = true else sim = acc / p
            }
          }
        }
      } // null struct: guard NULL -> 0.0
      sims(i) = sim
      simNull(i) = isNull
      if (!isNull && (!mxSet || java.lang.Double.compare(sim, mx) > 0)) {
        mx = sim
        mxSet = true
      }
      i += 1
    }
    if (!mxSet) return new GenericArrayData(Array.empty[Any])
    val th = mx - 1e-6
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      if (!simNull(i) && sims(i) >= th) {
        if (arr.isNullAt(i)) {
          out += new GenericInternalRow(Array[Any](null, null, null, sims(i)))
        } else {
          val st = arr.getStruct(i, 3)
          out += new GenericInternalRow(Array[Any](
            // copyValue: a buffer-backed label (e.g. UTF8String) read off
            // an UnsafeRow aliases a reused buffer — int labels are safe
            // raw, string labels are not (r11 ADVICE)
            if (st.isNullAt(0)) null
            else InternalRow.copyValue(st.get(0, labelType)),
            if (st.isNullAt(1)) null else st.getArray(1).copy(),
            if (st.isNullAt(2)) null else st.getDouble(2),
            sims(i)))
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def prettyName: String = "cell_survivors"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CellSurvivors =
    copy(vec = newFirst, nrm = newSecond, cells = newThird)
}
