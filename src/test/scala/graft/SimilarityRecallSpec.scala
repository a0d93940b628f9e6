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
}
