package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout support: multi-dimensional data
  * clustering so parquet row-group/file min-max stats prune on BOTH
  * dimensions of a 2-D predicate.
  *
  * Why this exists at 100 TB: [[graft.Tables.writeBucketed]] clusters on
  * ONE key. A linear sort on (x, y) prunes x-predicates perfectly and
  * y-predicates not at all — every file spans the full y range. Bit-
  * interleaving range-bucketed x and y onto one space-filling-curve key
  * and range-partitioning on that key gives every output file a small
  * bounding BOX in (x, y) space, so a selective predicate on either (or
  * both) dimension skips most files on footer stats alone. This is the
  * same layout technique Delta/Iceberg expose as `OPTIMIZE ZORDER BY` —
  * rebuilt here from plain built-in Columns (shifts, masks, ORs), so the
  * whole z-value computation stays inside whole-stage codegen: no UDF,
  * no custom Expression needed.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * result bit 2i = bit i of x, bit 2i+1 = bit i of y. Built entirely
    * from built-in bitwise Columns (codegen'd); 16 bits per dimension
    * (the default) distinguishes 65536 range buckets per axis — far
    * finer than any realistic file count.
    */
  def interleaveBits(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Map a numeric column onto [0, 2^bits) rank-space buckets given the
    * column's global [lo, hi] bounds: `width_bucket` (built-in, codegen)
    * with the bucket index clamped to the valid range. Equal-width
    * bucketing is the deterministic, single-pass choice (quantile
    * bucketing would need a sketch pass; for layout purposes equal-width
    * is what Delta's Z-order uses on the ranged domain too).
    */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int = 16): Column = {
    val n = 1L << bits
    // width_bucket returns 0 below lo and n+1 above hi; clamp into [0, n)
    greatest(lit(0L),
      least(lit(n - 1),
        width_bucket(c.cast("double"), lo.cast("double"),
          hi.cast("double"), lit(n.toInt)) - 1L))
  }

  /** Z-order `df` by two numeric columns and write parquet: one pass to
    * get the global bounds (4-value broadcast row), then
    * bucket → interleave → `repartitionByRange(files, z)` →
    * `sortWithinPartitions(z)` → write. Each output file covers a
    * contiguous z range = a small (x, y) bounding box; the z column
    * itself is dropped before writing (it is layout, not data).
    *
    * The range partitioner samples the z column (Spark's RangePartitioner
    * contract) — boundaries adapt to data skew, unlike fixed z-splits.
    */
  def writeZOrdered(df: DataFrame, path: String, colX: String, colY: String,
      files: Int, bits: Int = 16): Unit = {
    // reserved-prefix internal names: a user column named "xlo" (or a
    // prior "__z") must neither collide ambiguously at the join nor be
    // silently replaced-and-dropped from the written data. Checked
    // case-insensitively: Spark resolution is case-insensitive by
    // default, so "__ZORDER_XLO" would collide just the same.
    require(!df.columns.exists(_.toLowerCase.startsWith("__zorder_")),
      "__zorder_ is reserved for layout computation")
    val bounds = df.agg(
      min(col(colX)).cast("double").as("__zorder_xlo"),
      max(col(colX)).cast("double").as("__zorder_xhi"),
      min(col(colY)).cast("double").as("__zorder_ylo"),
      max(col(colY)).cast("double").as("__zorder_yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__zorder_z", interleaveBits(
        rangeBucket(col(colX), col("__zorder_xlo"), col("__zorder_xhi"),
          bits),
        rangeBucket(col(colY), col("__zorder_ylo"), col("__zorder_yhi"),
          bits), bits))
      .drop("__zorder_xlo", "__zorder_xhi", "__zorder_ylo", "__zorder_yhi")
      .repartitionByRange(files, col("__zorder_z"))
      .sortWithinPartitions("__zorder_z")
      .drop("__zorder_z")
      .write.mode("overwrite").parquet(path)
  }
}
