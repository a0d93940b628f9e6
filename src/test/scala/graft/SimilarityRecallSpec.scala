package graft

import graft.operators.Similarity

/** Quantifies the IVF scale path against the exact brute-force baseline:
  * the rows-only `ann_topk_ivf` query is approximate by construction, so
  * its quality claim is a MEASURED recall number, not an oracle hash.
  * The sf0.1 corpus (2000 vectors) is the largest local fixture.
  */
class SimilarityRecallSpec extends SparkSpec {

  test("annTopKIvf recall@5 vs exact annTopK is >= 0.8 at sf0.1") {
    val emb = Tables.table(spark, "/root/testdata/sf0.1", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.annTopK(emb, 8, 5))
    val ivf = pairs(Similarity.annTopKIvf(emb, 8, 5))
    assert(exact.size == 40)
    val hit = (exact & ivf).size
    val recall = hit.toDouble / exact.size
    info(f"IVF recall@5 at sf0.1: $recall%.3f ($hit/${exact.size})")
    assert(recall >= 0.8,
      f"IVF recall@5 degraded to $recall%.3f ($hit/${exact.size})")
  }

  test("kmeansLloyd corrects mislabeled vectors and reaches a fixpoint") {
    import spark.implicits._
    // two tight clusters around orthogonal directions; two vectors start
    // with the WRONG label, so the initial centroids are polluted
    def around(base: Array[Float], eps: Float, i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, j) =>
        v + (if (j == i % base.length) eps else 0f) }
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val rows =
      (0 until 6).map(i => (i.toLong, around(a, 0.05f, i),
        if (i == 0) 1 else 0)) ++
      (6 until 12).map(i => (i.toLong, around(b, 0.05f, i),
        if (i == 6) 0 else 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    def clusters(iters: Int): Map[Long, Int] =
      operators.Similarity.kmeansLloyd(emb, iters).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val twoIter = clusters(2)
    // after 2 Lloyd rounds every vector sits with its true cluster
    assert((0L until 6L).map(twoIter).toSet.size == 1)
    assert((6L until 12L).map(twoIter).toSet.size == 1)
    assert(twoIter(0L) != twoIter(6L))
    // and the assignment is a fixpoint: a third round changes nothing
    assert(clusters(3) == twoIter)
  }
}
