package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order layout (ZOrder.writeZOrdered) must give every output file a
  * small (x, y) bounding box, so a predicate on the SECOND dimension
  * prunes most files on min-max stats — the thing a linear (x, y) sort
  * can never do (every linearly-sorted file spans the full y range).
  * The assertion measures actual per-file min/max footprints, i.e. the
  * exact stats parquet footer pruning uses at scale.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits builds the Morton code") {
    // x=0b101=5, y=0b011=3 → z bits (y2 x2 y1 x1 y0 x0) = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleaveBits(col("x"), col("y"), 3)).collect()
    assert(z.head.getLong(0) == 27L)
  }

  test("z-order prunes y-predicates where a linear sort reads every file") {
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(8)
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft-linear").toString
    ZOrder.writeZOrdered(df, zdir, "x", "y", files = 16, bits = 8)
    df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(ldir)

    // files whose [min(y), max(y)] footprint intersects y ∈ [0, 15] —
    // exactly the footer-stats test a parquet reader applies
    def filesMatching(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      val hit = files.count { f =>
        val mm = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("y")), max(col("y"))).collect().head
        mm.getLong(0) <= 15L && mm.getLong(1) >= 0L
      }
      (hit, files.length)
    }
    val (zHit, zTotal) = filesMatching(zdir)
    val (lHit, lTotal) = filesMatching(ldir)
    assert(zTotal == 16 && lTotal == 16)
    // one 32-row tile band (plus range-sampling boundary slop) out of 16
    assert(zHit <= 6, s"z-order should confine y<=15 to ~4/16 files, hit $zHit")
    assert(lHit >= 14, s"linear sort spans full y per file, hit only $lHit")
    assert(zHit < lHit)
  }

  test("events_zordered (declared) equals the plain 2-D filter on the " +
    "original events table") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("events_zordered")(spark, dir)
      .collect().map(_.toSeq).toSet
    val want = Tables.table(spark, dir, "events")
      .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-13 00:00:00").cast("timestamp") &&
        col("value") >= 100.0)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "fixture window must select rows")
    assert(got == want,
      s"layout rewrite changed results: z-only=${got -- want}, " +
        s"plain-only=${want -- got}")
  }

  test("z-ordered rows are exactly the input rows") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft-zrows").toString
    ZOrder.writeZOrdered(grid.toDF("x", "y"), dir, "x", "y", files = 4, bits = 8)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSeq == Seq("x", "y"))
    assert(back.count() == 1024L)
    assert(back.except(grid.toDF("x", "y")).count() == 0L)
  }
}
