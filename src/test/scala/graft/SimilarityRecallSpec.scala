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

  test("scale-correct geometry: recall@5 >= 0.8 scanning 3% of the " +
    "corpus per query (nlist = sqrt(n), stored layout, numFiles witness)") {
    // The sf0.1 fixture's 10-cell codebook probes ~60% of the corpus at
    // nprobe=6 — fine for oracle determinism, useless as a recall claim.
    // This is the claim that matters at 100 TB: at nlist ≈ √n geometry
    // (the annTopKIvf scaladoc's scaling), a single-digit-percent scan
    // still clears 0.8 recall on a realistically-overlapping clustered
    // corpus. Scaled-down replica of the RecallSweep 1M measurement —
    // same generator, same nlist/√n = 1, same nprobe/nlist = 3%.
    val n = 40000L
    val nlist = 200 // = √40000
    val nprobe = 6  // 3% of cells
    val corpus = RecallSweep.clusteredCorpus(spark, n, nlist)
      .localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.annTopK(corpus, 8, 5))
    assert(exact.size == 40)
    val dir = java.nio.file.Files.createTempDirectory("recall_geom")
      .toString
    Similarity.writeCellPartitioned(corpus, dir)
    val layout = spark.read.parquet(dir)
    val allFiles = layout.inputFiles.length
    val probe = Similarity.annTopKFromLayout(spark, dir, 8, 5, nprobe)
    // execute PROBE itself (not a derived select) so its plan's metrics
    // are populated for the witness below
    val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the scanned-fraction WITNESS: the candidate scan (the one with a
    // partition filter) opened only the probed cells' files
    val readFiles = RecallSweep.fileScans(probe.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(
        _.references.exists(_.name == "cell")))
      .map(_.metrics("numFiles").value)
      // the plan tree can hold cloned, never-executed copies of the scan
      // (metrics 0) next to the executed one — the executed instance is
      // the max
      .maxOption.filter(_ > 0)
      .getOrElse(fail("no executed cell-pruned scan in probe"))
    val recall = (exact & got).size.toDouble / exact.size
    info(f"recall@5=$recall%.3f scanning $readFiles/$allFiles files " +
      f"(per-query ${nprobe.toDouble / nlist}%.3f) " +
      f"at nlist=$nlist nprobe=$nprobe")
    // files live one per cell, so numFiles == |union of probed cells|:
    // bounded by nQueries·nprobe (each query's scan is its own nprobe
    // cells = nprobe/nlist = 3% of the corpus; the union is a batching
    // artifact of answering 8 queries in one scan). A regression to
    // full-index scanning would read all `allFiles`.
    assert(readFiles <= 8 * nprobe,
      s"probe read $readFiles/$allFiles files — more than the " +
        s"${8 * nprobe} probed cells: pruning regressed")
    assert(recall >= 0.8,
      f"recall@5 $recall%.3f below 0.8 at scale-correct geometry")
  }

  test("grown (appended) index retains recall@5 >= 0.8 at the declared " +
    "nprobe — appending by the stored codebook does not silently degrade " +
    "retrieval") {
    // the append contract trades assignment quality for delta-sized
    // ingest (the codebook never moves); this pins that at a 10% delta
    // the declared probe depth still clears the same recall bar as the
    // freshly-built index, backing the scaladoc's "recall at partial
    // nprobe depends on assignment quality" claim with a number
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.table(spark, dir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.annTopK(emb, 8, 5))
    val grown = pairs(Similarity.annTopKFromLayout(spark,
      Similarity.appendedCellLayoutFor(spark, dir), 8, 5, nprobe = 6))
    val rebuilt = pairs(Similarity.annTopKFromLayout(spark,
      Similarity.cellLayoutFor(spark, dir), 8, 5, nprobe = 6))
    val rGrown = (exact & grown).size.toDouble / exact.size
    val rRebuilt = (exact & rebuilt).size.toDouble / exact.size
    info(f"recall@5 nprobe=6: grown=$rGrown%.3f rebuilt=$rRebuilt%.3f")
    assert(rGrown >= 0.8,
      f"grown-index recall degraded to $rGrown%.3f (rebuilt: $rRebuilt%.3f)")
  }

  test("srpLshNearDupPairs finds planted near-identical vectors, " +
      "prunes unrelated ones, and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randVec(): Array[Float] = Array.fill(64)(rnd.nextFloat() - 0.5f)
    val base = (0 until 60).map(i => (i.toLong, randVec(), 0))
    // plant: 1000 ≈ copy of 0 (tiny perturbation), 1001 = exact copy of 1
    val planted = Seq(
      (1000L, base(0)._2.map(v => v + 0.001f), 0),
      (1001L, base(1)._2.clone(), 0))
    val emb = (base ++ planted).toDF("vec_id", "embedding", "label")
    val got = Similarity.srpLshNearDupPairs(emb, 32, 8, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // identical signatures in every band -> planted pairs always found
    assert(got.contains((0L, 1000L)) && got((0L, 1000L)) >= 0.999)
    assert(got.contains((1L, 1001L)) && got((1L, 1001L)) == 1.0)
    // precision is exact: nothing below the verify threshold is emitted
    assert(got.values.forall(_ >= 0.9))
    // deterministic hyperplanes -> result invariant under repartitioning
    val re = Similarity.srpLshNearDupPairs(emb.repartition(7), 32, 8, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(re == got)
  }

  test("srpLshNearDupPairs maxBucketSize drops mega-buckets only: " +
      "capped output is the uncapped output minus big-bucket pairs") {
    import spark.implicits._
    // 5 exact copies of u (one 5-member bucket per band) + 3 exact
    // copies of w (3-member buckets), u ⊥ w so cross pairs never verify
    val u = Array.tabulate(64)(d => if (d == 0) 1.0f else 0.0f)
    val w = Array.tabulate(64)(d => if (d == 1) 1.0f else 0.0f)
    val emb = ((0L until 5L).map(i => (i, u.clone(), 0)) ++
      (10L until 13L).map(i => (i, w.clone(), 0)))
      .toDF("vec_id", "embedding", "label")
    def pairs(cap: Int) =
      Similarity.srpLshNearDupPairs(emb, 32, 8, 0.9, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    // identical vectors share every band signature -> all C(5,2)+C(3,2)
    // true pairs are candidates and verify at sim 1.0
    assert(uncapped.size == 13, s"uncapped: $uncapped")
    // cap 4: every u-carrying bucket has >= 5 members and is dropped;
    // pure-w buckets (3 members) survive -> exactly the 3 w pairs
    val capped = pairs(4)
    assert(capped == Set((10L, 11L), (10L, 12L), (11L, 12L)),
      s"capped(4): $capped")
    assert(capped.subsetOf(uncapped))
    // cap 1 drops every pair-capable bucket
    assert(pairs(1).isEmpty)
  }

  test("declared embedding_lsh_neardup_scaled: every emitted pair is a " +
      "planted (-5k-1, 5k) copy and planted recall is high at (64,16)") {
    // The scale-geometry query plants a ~0.998-sim perturbed copy of
    // every 5th vector (the natural corpus has no pairs above 0.7, so
    // without planting a correct 16-bit-band run returns empty). Pin:
    // (a) precision — nothing but planted pairs clears minSim 0.9;
    // (b) recall — per-pair band-collision probability at this geometry
    // is ~0.994 (p_plane ≈ 1 − 0.0625/π, ^16, 4 bands), so ≥ 80% of
    // planted pairs must surface. Deterministic hyperplanes: this is a
    // fixed number per fixture, the bound just leaves slack if the
    // fixture is regenerated.
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("embedding_lsh_neardup_scaled")(
      spark, dir).collect()
    val nPlanted = Tables.table(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 0)
      .count()
    assert(nPlanted >= 10, s"fixture too small: $nPlanted planted")
    rows.foreach { r =>
      val (a, b, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(b % 5 == 0 && a == -b - 1,
        s"non-planted pair surfaced: ($a, $b, $sim)")
      assert(sim >= 0.99, s"planted pair below expected sim: ($a, $b, $sim)")
    }
    val recall = rows.length.toDouble / nPlanted
    info(f"planted recall at (64,16): $recall%.3f (${rows.length}/$nPlanted)")
    assert(recall >= 0.8,
      f"planted recall degraded to $recall%.3f (${rows.length}/$nPlanted)")
  }

  test("declared-SF cap headroom: embedding_lsh_neardup's bucket cap " +
      "(64) never fires at ANY declared SF — capped output equals " +
      "uncapped at sf0.01 and sf0.1") {
    // The declared query bakes maxBucketSize=64 into BOTH the Spark side
    // and its DuckDB oracle, so the bit-exact gate cannot see output
    // changes the cap itself introduces. This pin closes that blind
    // spot at BOTH declared fixtures (sf0.1 is where headroom is
    // thinnest): if a data-generation or geometry change ever pushes a
    // declared-SF bucket past 64, this fails loudly instead of the gate
    // silently green-lighting guard-degraded recall.
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = Tables.table(spark, s"/root/testdata/$sf", "embeddings")
      def pairs(cap: Int) =
        Similarity.srpLshNearDupPairs(emb, 32, 8, 0.3, cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val capped = pairs(64)
      val uncapped = pairs(Int.MaxValue)
      assert(capped == uncapped,
        s"bucket cap 64 fired at $sf: dropped ${uncapped -- capped}")
    }
  }

  test("declared-SF cap headroom: neither q-gram query's block cap " +
      "(256 exact / 1000 scaled) fires at ANY declared SF — both equal " +
      "uncapped at sf0.01 and sf0.1") {
    // Same blind-spot closure as the SRP pin above: both declared
    // queries' oracles mirror their caps, so only this equality against
    // the truly-uncapped operator ties the declared fixtures to the
    // EXACT prefix-filter semantics. (Largest Brand#13 prefix block
    // measured: 10 at sf0.01, 95 at sf0.1 — sf0.1 is the thin-headroom
    // fixture the 256 cap must be re-derived against if it ever grows.)
    import graft.operators.Analytics
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val recs = Tables.table(spark, dir, "part")
        .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#13")
        .select(org.apache.spark.sql.functions.col("p_partkey").as("id"),
          org.apache.spark.sql.functions.col("p_name").as("name"))
      val uncapped = Analytics.fuzzyMatchPairsQgram(recs, 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def declared(name: String) =
        SparkEntry.queries(name)(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(declared("fuzzy_join_parts_qgram") == uncapped,
        s"block cap 256 fired at $sf")
      assert(declared("fuzzy_join_parts_qgram_scaled") == uncapped,
        s"block cap 1000 fired at $sf")
    }
  }

  test("fuzzyMatchPairsQgram maxBlockSize drops mega-block-only pairs, " +
      "keeps rare-gram pairs, and precision stays exact") {
    import spark.implicits._
    import graft.operators.Analytics
    // 8-member family sharing every informative gram (df 8 > cap 4) +
    // a 2-member family whose grams are rare (df 2 <= cap). The only
    // cross-family shared grams ('01#', '1##' style suffixes) form
    // small blocks, so cross pairs stay CANDIDATES under the cap — and
    // the Levenshtein verify rejects them (dist 4 > 2): capping moves
    // recall only, never precision.
    val recs = ((1 to 8).map(i => (i.toLong, s"aaaa0$i")) ++
      Seq((21L, "bbbb01"), (22L, "bbbb02")))
      .toDF("id", "name")
    def pairs(cap: Int) =
      Analytics.fuzzyMatchPairsQgram(recs, 2, 3, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped == ((1 to 8).flatMap(a => (a + 1 to 8).map(b =>
      (a.toLong, b.toLong))).toSet + ((21L, 22L))), s"uncapped: $uncapped")
    val capped = pairs(4)
    assert(capped == Set((21L, 22L)), s"capped(4): $capped")
    assert(capped.subsetOf(uncapped))
    // the guard's valid range is enforced (cap 1 would silently drop
    // every multi-member block — the ADVICE r14 footgun)
    assertThrows[IllegalArgumentException](pairs(1))
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
