package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling (LLM-pipeline QA surface): per-column null and
  * exact distinct counts in one pass — the data-card / schema-drift
  * primitive a curation pipeline runs before and after every transform.
  *
  * Scale shape: ONE aggregate over the scan. Multiple exact
  * `count_distinct`s compile to a single Expand + partial-aggregate plan
  * (rows × |cols| expansion, map-side partials, one exchange of the
  * per-column state) — no per-column rescans. The single wide row then
  * unpivots to (column, n_rows, n_nulls, n_distinct) via `stack`, which
  * is a projection.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs =
      count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`")
      .mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
  }
}
