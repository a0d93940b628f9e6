package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measurement harness: IVF recall@k vs `nprobe` at SCALE-CORRECT
  * geometry — nlist ≈ √n (the scaling the annTopKIvf scaladoc promises
  * for 100 TB), so the scanned corpus fraction at useful nprobe is a few
  * PERCENT, not the ~60% the r10 sweep's 10-cell codebook probed.
  * Ground truth is the exact brute-force [[Similarity.annTopK]].
  *
  * Two corpora, the two ends of IVF's operating envelope:
  *  - `uniform`: murmur3-mixed quasi-uniform vectors with hash-random
  *    cell labels — IVF's documented WORST case: no cluster structure,
  *    so recall should track the scanned corpus fraction (≈ the probed
  *    cells' population share). The claim under test is that the
  *    geometry is scale-free: recall ≈ scan%, at 1M exactly as at 2000.
  *  - `clustered`: [[clusteredCorpus]] — nlist planted clusters with
  *    dense random centers at `bias`× the noise amplitude. At bias 0.75
  *    the cluster energy is ~36% of vector energy (cos ≈ 0.36 to the
  *    own center): clusters OVERLAP, some vectors sit nearer a foreign
  *    centroid than their own, so recall at small nprobe measures real
  *    assignment spillover — not the tautology of well-separated blobs
  *    (recall 1.0 at nprobe 1) nor of probing most of the corpus.
  *
  * The probe path is the STORED layout ([[Similarity.writeCellPartitioned]]
  * → [[Similarity.annTopKFromLayout]]), so each probe's scanned fraction
  * is WITNESSED by the executed scan's numFiles metric (files live one
  * per cell after the layout write's cell repartition): the directory
  * pruning claim and the recall claim land in the same measurement.
  *
  * Prints one JSON line per corpus: {nprobe → {recall, files_frac, sec}}.
  */
object RecallSweep {

  /** nlist planted clusters over `dims` dims: cluster c's center is a
    * dense hash-random vector with coordinates in ±bias/2, the noise is
    * per-id hash-random in ±1/2 — both fully deterministic (murmur3 of
    * (cluster|id, dim)), so the corpus is reproducible anywhere. `label`
    * IS the planted cluster: the per-label centroid codebook
    * ([[Similarity.centroidVectors]]) is then the trained-to-convergence
    * limit (member noise averages out at 1/√(n/nlist)), which isolates
    * the sweep to the quantity under test — probe geometry — rather than
    * codebook training quality.
    */
  def clusteredCorpus(spark: org.apache.spark.sql.SparkSession,
      nVecs: Long, nlist: Int, dims: Int = 64,
      bias: Double = 0.75): DataFrame = {
    val cluster = pmod(hash(col("id"), lit(42)), lit(nlist)).cast("int")
    spark.range(nVecs).select(
      col("id").as("vec_id"),
      cluster.as("label"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        pmod(hash(col("id"), d), lit(1000)).cast("double") / 1000.0 - 0.5 +
          (pmod(hash(cluster, d, lit(7)), lit(1000)).cast("double") / 1000.0
            - 0.5) * bias).as("embedding"))
  }

  /** No structure at all: quasi-uniform vectors, hash-random labels. */
  def uniformCorpus(spark: org.apache.spark.sql.SparkSession,
      nVecs: Long, nlist: Int, dims: Int = 64): DataFrame =
    spark.range(nVecs).select(
      col("id").as("vec_id"),
      pmod(hash(col("id"), lit(99)), lit(nlist)).cast("int").as("label"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        pmod(hash(col("id"), d), lit(1000)).cast("double") / 1000.0 - 0.5)
        .as("embedding"))

  /** All FileSourceScanExec leaves of an EXECUTED plan, descending
    * through the AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec and
    * ReusedExchangeExec are leaf nodes that hide their subtrees from
    * `collectLeaves`). Shared by the sweep and SimilarityRecallSpec's
    * numFiles witness.
    */
  def fileScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: QueryStageExec => fileScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        fileScans(r.child)
    }.flatten
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nlist = args.lift(1).map(_.toInt)
      .getOrElse(math.sqrt(nVecs.toDouble).round.toInt)
    val k = 5
    val nQueries = 8
    val nprobes = args.lift(2).map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(8, 16, 32, 64))
    val spark = Sessions.get("graft-recall-sweep")

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    /** The corpus-side scan's numFiles after execution — the witness
      * that the probe read ONLY the probed cells' directories. The
      * layout is read by two scans (query lookup + candidate scan); the
      * candidate scan is the one with a runtime (DPP) partition filter.
      */
    def prunedNumFiles(df: DataFrame): Option[Long] =
      fileScans(df.queryExecution.executedPlan)
        .filter(_.partitionFilters.exists(
          _.references.exists(_.name == "cell")))
        .map(_.metrics("numFiles").value).maxOption.filter(_ > 0)

    val out = Seq(
      "uniform" -> uniformCorpus(spark, nVecs, nlist),
      "clustered" -> clusteredCorpus(spark, nVecs, nlist))
      .map { case (name, corpus0) =>
        val corpus = corpus0.localCheckpoint()
        val t0 = System.nanoTime()
        val exact = pairs(Similarity.annTopK(corpus, nQueries, k))
        val bruteSec = (System.nanoTime() - t0) / 1e9
        // one index build per corpus (the expensive part: a 1M × nlist
        // broadcast argmax + partitioned write), probed at every depth —
        // the build-once/probe-many lifecycle the layout exists for
        val dir = java.nio.file.Files
          .createTempDirectory(s"recall_$name").toString
        val tb = System.nanoTime()
        Similarity.writeCellPartitioned(corpus, dir)
        val buildSec = (System.nanoTime() - tb) / 1e9
        val layout = spark.read.parquet(dir)
        val allFiles = layout.inputFiles.length
        val sweep = nprobes.map { np =>
          val t1 = System.nanoTime()
          val probe = Similarity.annTopKFromLayout(spark, dir, nQueries,
            k, np)
          // execute PROBE itself (not a derived select) so its plan's
          // metrics are populated for the numFiles witness
          val got = probe.collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val sec = (System.nanoTime() - t1) / 1e9
          val recall = (exact & got).size.toDouble / exact.size
          val frac = prunedNumFiles(probe)
            .map(_.toDouble / allFiles).getOrElse(-1.0)
          println(f"[recall] $name nlist=$nlist nprobe=$np " +
            f"recall@$k=$recall%.3f files_frac=$frac%.4f " +
            f"(${sec}%.1f s vs brute ${bruteSec}%.1f s)")
          f""""$np":{"recall":$recall%.3f,"files_frac":$frac%.4f,"sec":$sec%.1f}"""
        }
        Sessions.releaseCaches(spark)
        s""""$name":{${sweep.mkString(",")},"brute_sec":${f"$bruteSec%.1f"},"build_sec":${f"$buildSec%.1f"},"files":$allFiles}"""
      }
    println(s"""{"n_vecs":$nVecs,"nlist":$nlist,"k":$k,${out.mkString(",")}}""")
    spark.stop()
  }
}
