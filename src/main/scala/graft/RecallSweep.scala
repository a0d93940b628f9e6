package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness: IVF recall@k vs `nprobe` at corpus scale —
  * extends SimilarityRecallSpec's sf0.1 (2000-vector) assertion to the
  * ScaleSmoke vector family at 1M vectors, against the exact
  * brute-force [[Similarity.annTopK]] ground truth.
  *
  * Two corpora, the two ends of IVF's operating envelope:
  *  - `uniform`: murmur3-mixed quasi-uniform vectors with uniform
  *    random labels (ScaleSmoke's `vecs` shape) — IVF's documented
  *    WORST case: no cluster structure, so recall should track the
  *    scanned corpus fraction (≈ nprobe/nlist), exactly as measured at
  *    2000 vectors. The claim under test is that the geometry is
  *    scale-free.
  *  - `clustered`: the 8-axis planted-cluster corpus (ScaleSmoke's
  *    SemDeDup/IVF fixture: +2.0 bias on dim seed%8) — the realistic
  *    case, where neighbors share a cell and small nprobe suffices.
  *
  * Prints one JSON line: per-corpus {nprobe → recall@5}.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = 5
    val nQueries = 8
    val nprobes = Seq(1, 2, 4, 6, 8)
    val spark = Sessions.get("graft-recall-sweep")

    val uniform = spark.range(nVecs).select(
      col("id").as("vec_id"),
      pmod(hash(col("id"), lit(99)), lit(10)).cast("int").as("label"),
      transform(sequence(lit(0), lit(63)),
        d => pmod(hash(col("id"), d), lit(1000))
          .cast("double") / 1000.0 - 0.5).as("embedding"))

    val clustered = spark.range(nVecs).select(
      col("id").as("vec_id"),
      pmod(col("id"), lit(8)).cast("int").as("label"),
      transform(sequence(lit(0), lit(63)),
        d => pmod(hash(col("id"), d), lit(1000)).cast("double")
          / 1000.0 - 0.5 +
          when(d === pmod(col("id"), lit(8)).cast("int"), lit(2.0))
            .otherwise(lit(0.0))).as("embedding"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val out = Seq("uniform" -> uniform, "clustered" -> clustered)
      .map { case (name, corpus0) =>
        // one materialization: ground truth + 5 probe depths all read
        // the same blocks instead of replaying the generator 6×
        val corpus = corpus0.localCheckpoint()
        val t0 = System.nanoTime()
        val exact = pairs(Similarity.annTopK(corpus, nQueries, k))
        val bruteSec = (System.nanoTime() - t0) / 1e9
        val sweep = nprobes.map { np =>
          val t1 = System.nanoTime()
          val got = pairs(Similarity.annTopKIvf(corpus, nQueries, k, np))
          val sec = (System.nanoTime() - t1) / 1e9
          val recall = (exact & got).size.toDouble / exact.size
          println(f"[recall] $name nprobe=$np recall@$k=$recall%.3f " +
            f"(${sec}%.1f s vs brute ${bruteSec}%.1f s)")
          s""""$np":${f"$recall%.3f"}"""
        }
        Sessions.releaseCaches(spark)
        s""""$name":{${sweep.mkString(",")},"brute_sec":${f"$bruteSec%.1f"}}"""
      }
    println(s"""{"n_vecs":$nVecs,"k":$k,${out.mkString(",")}}""")
    spark.stop()
  }
}
