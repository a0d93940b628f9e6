package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TradingOps}

/** Scratch perf breakdown for the bench tail — times each stage of the
  * slow queries separately so optimization targets the real cost, not a
  * guess. Not part of the driver contract.
  */
object PerfProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("graft-probe")
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val docs = Tables.table(spark, sfDir, "documents")
    docs.count()

    time("docs.count (warm)") { docs.count() }
    val pairs = time("jaccardPairs(0.5).collect") {
      Dedup.jaccardPairs(docs, 3, 0.5).collect().length
    }
    println(s"[probe] n_pairs = $pairs")

    // --- substages of the shingle pipeline --------------------------------
    import graft.functions.TextAnalysis.tokens
    val tok = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    time("tokens only") { tok.select(sum(size(col("t")))).collect() }
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("t"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))
    val nsh = time("shingleTable.count") { sh.count() }
    println(s"[probe] n_shingle_rows = $nsh")
    time("shingleTable.count #2") { sh.count() }
    val a = sh.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("shingle"))
    val joined = a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
    val nj = time("self-join row count") { joined.count() }
    println(s"[probe] n_joined_rows = $nj")
    time("minhashSignatures.count") {
      Dedup.minhashSignatures(docs, 3, 16).count()
    }
    time("lsh buckets") {
      Dedup.lshBuckets(Dedup.minhashSignatures(docs, 3, 16), 4).count()
    }
    time("lsh full") { Dedup.minhashLshPairs(docs, 3, 16, 4, 0.5).count() }
    time("clusters full") { Dedup.nearDupClusters(docs, 3, 0.5).count() }
    // second run: JIT/codegen warm
    time("clusters full #2") { Dedup.nearDupClusters(docs, 3, 0.5).count() }
    time("lsh full #2") { Dedup.minhashLshPairs(docs, 3, 16, 4, 0.5).count() }
    time("jaccard #2") { Dedup.jaccardPairs(docs, 3, 0.5).count() }

    time("portfolio_parallel") {
      TradingOps.portfolioEvenlySpaced(
        Tables.candles(spark, sfDir).repartition(16), 10000.0, 1000.0, None).count()
    }
    time("portfolio_parallel #2") {
      TradingOps.portfolioEvenlySpaced(
        Tables.candles(spark, sfDir).repartition(16), 10000.0, 1000.0, None).count()
    }
    time("q5_local_supplier") {
      operators.Analytics.localSupplierVolume(spark, sfDir).count()
    }
    time("q5_local_supplier #2") {
      operators.Analytics.localSupplierVolume(spark, sfDir).count()
    }
    time("except_customers #1") {
      operators.Analytics.orderingNonBuildingCustomers(spark, sfDir).count()
    }
    time("except_customers #2") {
      operators.Analytics.orderingNonBuildingCustomers(spark, sfDir).count()
    }
    time("curation_pipeline") {
      SparkEntry.queries("curation_pipeline")(spark, sfDir).count()
    }

    // --- ann_topk substages ----------------------------------------------
    import graft.operators.Similarity
    val emb = Tables.table(spark, sfDir, "embeddings")
    emb.count()
    time("ann_topk #1") { Similarity.annTopK(emb, 8, 5).count() }
    time("ann_topk #2") { Similarity.annTopK(emb, 8, 5).count() }
    val queries2 = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
    val scoredDec = emb.filter(col("vec_id") >= 8).crossJoin(queries2)
      .select(col("q_id"), col("vec_id"),
        Similarity.dotDecimal(col("q_vec"), col("embedding")).as("d"))
    time("decimal dots only") { scoredDec.agg(sum("d")).collect() }
    val scoredDbl = emb.filter(col("vec_id") >= 8).crossJoin(queries2)
      .selectExpr("q_id", "vec_id",
        "double_dot(cast(q_vec as array<double>), cast(embedding as array<double>)) as d")
    time("double dots only") { scoredDbl.agg(sum("d")).collect() }
    spark.stop()
  }
}
