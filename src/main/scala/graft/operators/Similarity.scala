package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table
  * (`embedding: ARRAY<FLOAT>`, LLM-pipeline north star).
  *
  * Float policy: dot products and squared norms accumulate exactly in
  * decimal via the codegen'd [[graft.functions.DecimalDotProduct]] —
  * order-independent, and bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))` over DECIMAL(19,18). The final
  * divide/sqrt are single IEEE ops on identical inputs. So ranking by
  * similarity is deterministic across engines — no tolerance games.
  *
  * Scale: the query set is broadcast; candidate scoring is map-side over
  * the corpus scan. Top-k uses a two-phase (per-input-partition pre-top-k,
  * then global) so the full corpus is never shuffled — the classic
  * brute-force ANN baseline. The LSH/blocked variants bound pair
  * generation for near-dup search.
  */
object Similarity {

  private def vec(c: Column): Column = c.cast("array<double>")

  /** Exact-decimal dot product of two double arrays via the codegen'd
    * [[graft.functions.DecimalDotProduct]] expression: per-element products
    * rounded to scale 18 (HALF_UP — Spark's own double→decimal cast
    * semantics), summed exactly, returned as double. Order-independent
    * and bit-identical to the DuckDB oracle's decimal list_sum.
    */
  def dotDecimal(a: Column, b: Column): Column = {
    call_function("decimal_dot", vec(a), vec(b))
  }

  /** Exact-decimal squared norm (dot of the vector with itself). */
  def normSqDecimal(a: Column): Column =
    call_function("decimal_dot", vec(a), vec(a))

  /** Cosine similarity with exact-decimal accumulation. */
  def cosine(a: Column, b: Column): Column =
    dotDecimal(a, b) / (sqrt(normSqDecimal(a)) * sqrt(normSqDecimal(b)))

  /** Fast approximate dot product (codegen'd plain-double fold); used only
    * as a conservative prefilter, never for final values.
    */
  private def dotDouble(a: Column, b: Column): Column =
    call_function("double_dot", vec(a), vec(b))

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest corpus vectors (vec_id ≥ nQueries).
    *
    * Two-phase top-k: phase 1 keeps k per (query, input partition) —
    * map-side, no data movement beyond k·P rows; phase 2 ranks the tiny
    * survivor set globally. Result is identical to the naive single
    * window but shuffles O(q·k·P) instead of O(q·N).
    */
  def annTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val queries = broadcast(
      embeddings.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          sqrt(normSqDecimal(col("embedding"))).as("q_norm")))
    val corpus = embeddings.filter(col("vec_id") >= nQueries)
      .select(col("vec_id"), col("embedding"),
        sqrt(normSqDecimal(col("embedding"))).as("c_norm"))
    // Phase 1 — CHEAP double scoring of every (query, candidate) pair,
    // then per-input-partition pruning: keep the double top-k plus every
    // row within 1e-6 of the partition's k-th double sim. Double and
    // exact-decimal cosines agree to ~1e-13, so any row in the true
    // decimal top-k either ranks ≤ k by double, or sits ≤ 2e-13 below
    // the k-th double sim — far inside the margin; pruning can never
    // drop a true result. Decimal work then touches only O(q·k·P)
    // survivors instead of the whole corpus.
    val w = Window.partitionBy(col("q_id"), col("pid"))
      .orderBy(col("simd").desc, col("vec_id"))
    val scored = corpus.crossJoin(queries)
      .select(col("q_id"), col("vec_id"), col("q_vec"), col("embedding"),
        col("q_norm"), col("c_norm"),
        (dotDouble(col("q_vec"), col("embedding")) /
          (col("q_norm") * col("c_norm"))).as("simd"))
      .withColumn("pid", spark_partition_id())
      .withColumn("prn", row_number().over(w))
      .withColumn("kth", nth_value(col("simd"), k).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("prn") <= k ||
        col("simd") >= coalesce(col("kth") - lit(1e-6),
          lit(Double.NegativeInfinity)))
    // Phase 2 — exact-decimal rescoring + global ranking of the tiny
    // survivor set; emitted sims are always the decimal-exact values.
    scored
      .select(col("q_id"), col("vec_id"),
        (dotDecimal(col("q_vec"), col("embedding")) /
          (col("q_norm") * col("c_norm"))).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Near-duplicate embedding pairs above a cosine threshold, blocked by
    * `label` (the pair-pruning key: near-dups share a block, so pair
    * generation is O(Σ block²) not O(n²) — the blocking analog of LSH
    * for this labeled corpus).
    */
  def nearDupPairs(embeddings: DataFrame, minSim: Double = 0.3): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    // norms once per vector (n rows), not once per pair (n² rows)
    val withNorm = embeddings.select(col("label"), col("vec_id"),
      col("embedding"), sqrt(normSqDecimal(col("embedding"))).as("nrm"))
    val a = withNorm.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("nrm").as("norm_a"))
    val b = withNorm.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("nrm").as("norm_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      // two-stage scoring: cheap double dot prunes the pair stream with a
      // 1e-5 safety margin (double-vs-decimal divergence is ~1e-13, and
      // the final value is rounded at 1e-6), then the exact decimal
      // cosine decides — the result set is identical to single-stage.
      .filter(dotDouble(col("emb_a"), col("emb_b")) /
        (col("norm_a") * col("norm_b")) >= lit(minSim - 1e-5))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(dotDecimal(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Per-label mean embedding (centroid) in exploded (label, pos) form —
    * the K-means / IVF-training primitive and the embedding-drift monitor.
    * Sums accumulate in DECIMAL(28,18) per component (order-independent,
    * bit-identical to the DuckDB oracle; precision stays ≤ 38 so Spark's
    * decimal addition never drops a scale digit), divided once as double.
    * One shuffle keyed on (label, pos) with map-side partial sums — the
    * exploded key space is |labels|·dim, so the aggregate state is tiny
    * regardless of corpus size.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(vec(col("embedding"))))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("col").cast("decimal(28,18)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("centroid"))

  /** One K-means assignment step: each vector joins the (tiny, broadcast)
    * centroid table and takes its best-cosine centroid — ties broken by
    * smaller label. Composing [[labelCentroids]] → assign → re-aggregate
    * is the standard distributed Lloyd iteration: per step, one broadcast
    * join and one (label, pos) aggregate, no corpus shuffle.
    */
  def kmeansAssign(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val cents = labelCentroids(embeddings)
      .groupBy(col("label").as("c_label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
        .as("pcs"))
      .select(col("c_label"),
        transform(col("pcs"), s => s.getField("centroid")).as("cvec"))
    embeddings
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("c_label"),
        cosine(col("embedding"), col("cvec")).as("sim"))
      // argmax via aggregate, not a window: all |centroids| candidate rows
      // for a vector sit in the same scan partition (broadcast join), so
      // the partial aggregate collapses them map-side — the exchange
      // carries one row per vector, not |centroids|×corpus. max(sim)
      // equals the winner's sim under ties by definition.
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("c_label"),
          struct(col("sim"), (-col("c_label")).as("nl")))
          .as("assigned_label"),
        round(max(col("sim")), 6).as("sim"))
  }

  /** Scale-path ANN: cluster-pruned search (IVF-style) using the sign
    * pattern of the first `signBits` components as a deterministic coarse
    * quantizer. Probes = the query's own cell plus cells at Hamming
    * distance ≤ 1 (recall knob). Returns the same schema as [[annTopK]];
    * recall is approximate by construction.
    */
  def annTopKIvf(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
      signBits: Int = 8): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    def cell(v: Column): Column =
      concat_ws("", transform(slice(vec(v), 1, signBits),
        x => when(x >= 0, lit("1")).otherwise(lit("0"))))
    def flip(cellCol: Column, i: Column): Column = concat(
      cellCol.substr(lit(1), i - 1),
      translate(cellCol.substr(i, lit(1)), "01", "10"),
      cellCol.substr(i + 1, lit(signBits)))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        cell(col("embedding")).as("q_cell"))
    // probe cells: exact cell + all 1-bit flips (Hamming-1 neighborhood)
    val probed = queries.select(col("q_id"), col("q_vec"),
      explode(concat(array(col("q_cell")),
        transform(sequence(lit(1), lit(signBits)),
          i => flip(col("q_cell"), i))))
        .as("cell"))
    val corpus = embeddings.filter(col("vec_id") >= nQueries)
      .withColumn("cell", cell(col("embedding")))
    corpus.join(broadcast(probed), Seq("cell"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_vec"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }
}
