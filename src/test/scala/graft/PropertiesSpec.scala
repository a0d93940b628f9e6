package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Backtest, Dedup, TradingOps}

/** Property tests (SURVEY.md §5): partition invariance — the reference's
  * own X4 determinism check — plus stride/backtest invariants, over
  * ScalaCheck-generated inputs sampled with fixed seeds (no bridge
  * artifact in the offline cache, so sampling is driven manually).
  */
class PropertiesSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val closesGen: Gen[List[Double]] =
    Gen.chooseNum(5, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1.0, 500.0).map(d => math.rint(d * 100) / 100)))

  test("stride signal count = ceil(n / step) for every n, k") {
    val cases = samples(Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 30)), 10)
    cases.foreach { case (n, k) =>
      val df = candleFrame(Map("s" -> (1 to n).map(_.toDouble)))
      val flagged = TradingOps.evenlySpacedSignals(df, Some(k))
        .filter(col("buy_signal")).count()
      val step = math.max(n / k, 1)
      val expected = (n + step - 1) / step
      assert(flagged == expected, s"n=$n k=$k step=$step")
    }
  }

  test("backtest positions strictly alternate and never overlap in time") {
    samples(closesGen, 8).filter(_.size >= 5).foreach { closes =>
      val ps = Backtest.positions(
        candleFrame(Map("s" -> closes)),
        Backtest.Config(shortN = 2, longN = 4))
        .collect().sortBy(_.entry_ts.getTime)
      ps.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.exit_ts.get.getTime <= b.entry_ts.getTime)
        case _ =>
      }
      ps.foreach(p =>
        assert(p.entry_ts.getTime <= p.exit_ts.get.getTime))
    }
  }

  test("portfolio valuation is partition-invariant on generated walks") {
    val cases = samples(Gen.zip(closesGen, Gen.chooseNum(1, 9)), 8)
    cases.filter(_._1.size >= 5).foreach { case (closes, p) =>
      val df = candleFrame(Map("s" -> closes))
      val a = TradingOps.portfolioEvenlySpaced(df, 10000.0, 1000.0, Some(5))
        .collect().map(_.toSeq).toSeq
      val b = TradingOps.portfolioEvenlySpaced(
        df.repartition(p), 10000.0, 1000.0, Some(5))
        .collect().map(_.toSeq).toSeq
      assert(a == b, s"p=$p")
    }
  }

  test("round-5 text/embedding operators are partition-invariant") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val textGen = Gen.listOfN(12, Gen.oneOf(words)).map(_.mkString(" "))
    samples(Gen.zip(Gen.listOfN(40, textGen), Gen.chooseNum(2, 9)), 4)
      .foreach { case (texts, p) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t, if (i % 2 == 0) "en" else "zh") }
          .toDF("doc_id", "text", "lang")
        val shuffled = docs.repartition(p)
        def rows(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(_.toSeq).toSet
        assert(rows(TextAnalysis.repetitionStats(docs)) ==
          rows(TextAnalysis.repetitionStats(shuffled)))
        assert(rows(TextAnalysis.packSequences(docs, 16, 2)) ==
          rows(TextAnalysis.packSequences(shuffled, 16, 2)))
        assert(rows(TextAnalysis.bigramCollocations(docs, 2, 10)) ==
          rows(TextAnalysis.bigramCollocations(shuffled, 2, 10)))
        val bench = docs.filter(col("doc_id") % 7 === 0)
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
        assert(rows(Dedup.contaminationPairs(corpus, bench, 3, 1)) ==
          rows(Dedup.contaminationPairs(corpus.repartition(p),
            bench.repartition(p), 3, 1)))
      }
  }

  test("round-7 chunk/DSIR/quantize/semantic-dedup are partition-invariant") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    import graft.operators.Similarity
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val textGen = Gen.listOfN(10, Gen.oneOf(words)).map(_.mkString(" "))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    samples(Gen.zip(Gen.listOfN(30, textGen), Gen.chooseNum(2, 9)), 3)
      .foreach { case (texts, p) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t, if (i % 3 == 0) "en" else "de") }
          .toDF("doc_id", "text", "lang")
        val shuffled = docs.repartition(p)
        assert(rows(TextAnalysis.chunkDocuments(docs, 4, 1)) ==
          rows(TextAnalysis.chunkDocuments(shuffled, 4, 1)), s"chunk p=$p")
        // int64-sum weights: order-independent by the micros contract
        assert(rows(TextAnalysis.dsirWeights(docs, "en", 64)) ==
          rows(TextAnalysis.dsirWeights(shuffled, "en", 64)), s"dsir p=$p")
      }
    samples(Gen.zip(Gen.listOfN(24,
      Gen.listOfN(8, Gen.chooseNum(-100, 100))), Gen.chooseNum(2, 9)), 3)
      .foreach { case (vs, p) =>
        val vecs = vs.zipWithIndex.map { case (v, i) =>
          (i.toLong, v.map(_.toFloat / 100f).toArray, i % 3) }
          .toDF("vec_id", "embedding", "label")
        val shuffled = vecs.repartition(p)
        assert(rows(Similarity.quantizeEmbeddings(vecs)) ==
          rows(Similarity.quantizeEmbeddings(shuffled)), s"quantize p=$p")
        // lowest-id keeper rule makes the kept set partitioning-free
        assert(rows(Similarity.semanticDedup(vecs, 0.9)) ==
          rows(Similarity.semanticDedup(shuffled, 0.9)), s"semdedup p=$p")
      }
  }

  test("indicator folds and windows are partition-invariant on generated walks") {
    val cases = samples(Gen.zip(closesGen, Gen.chooseNum(1, 9)), 6)
    cases.filter(_._1.size >= 3).foreach { case (closes, p) =>
      val df = candleFrame(Map("s" -> closes, "t" -> closes.reverse))
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).toSet
      // typed sorted-group folds: order restored inside each group
      assert(rows(TradingOps.macd(df)) == rows(TradingOps.macd(df.repartition(p))),
        s"macd p=$p")
      // window family: exact DECIMAL frame sums make the result
      // independent of input partitioning, not merely close to it
      assert(rows(TradingOps.bollingerBands(df)) ==
        rows(TradingOps.bollingerBands(df.repartition(p))), s"bollinger p=$p")
      assert(rows(TradingOps.sharpeRatio(df)) ==
        rows(TradingOps.sharpeRatio(df.repartition(p))), s"sharpe p=$p")
    }
  }

  test("sampling family invariants hold on generated skewed corpora") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    // corpora with random sizes, random token counts (incl. empty
    // docs), and a random number of strata with skewed membership
    val corpusGen = for {
      n <- Gen.chooseNum(30, 150)
      nStrata <- Gen.chooseNum(1, 5)
      toks <- Gen.listOfN(n, Gen.chooseNum(0, 12))
      strat <- Gen.listOfN(n, Gen.chooseNum(0, 9))
    } yield (0 until n).map { i =>
      (i.toLong, ("w " * toks(i)).trim, "en",
        // skew: residues ≥ nStrata all fold into stratum 0
        s"s${if (strat(i) < nStrata) strat(i) else 0}")
    }
    samples(corpusGen, 6).foreach { rows =>
      val d = rows.toDF("doc_id", "text", "lang", "source")
      val bySource = rows.groupBy(_._4)
      // quota: per stratum exactly min(cap, |stratum|) rows, pos dense
      val cap = 7
      val quota = TextAnalysis.quotaSample(d, cap).collect()
        .groupBy(_.getString(0))
      for ((src, members) <- bySource)
        assert(quota.getOrElse(src, Array.empty).length ==
          math.min(cap, members.size), s"quota in $src")
      // budget: kept set is the maximal prefix whose cum stays within
      // budget; equivalently every kept cum ≤ budget and the count per
      // stratum equals the driver-computed prefix length
      val budget = 20L
      def h(i: Long) = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val kept = TextAnalysis.tokenBudgetSample(d, budget).collect()
        .groupBy(_.getString(0))
      for ((src, members) <- bySource) {
        var cum = 0L
        val expectN = members.sortBy(m => (h(m._1), m._1)).count { m =>
          cum += m._2.split(" ").count(_.nonEmpty); cum <= budget
        }
        val got = kept.getOrElse(src, Array.empty)
        assert(got.length == expectN, s"budget prefix in $src")
        assert(got.forall(_.getLong(3) <= budget))
      }
      // pps: per stratum the pick MASS (Σ n_picks) is exactly
      // floor(total/step) — multiplicity covers docs wider than the
      // step — and a zero-token doc is never picked
      val step = 5L
      val pps = TextAnalysis.ppsSampleSystematic(d, step).collect()
        .groupBy(_.getString(0))
      for ((src, members) <- bySource) {
        val total = members.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
        assert(pps.getOrElse(src, Array.empty).map(_.getLong(4)).sum ==
          total / step, s"pps pick mass in $src")
      }
      assert(pps.values.flatten.forall(_.getLong(2) > 0))
    }
  }

  test("fuzzyMatchPairsQgram equals brute force on generated corpora " +
    "of short low-diversity strings") {
    import spark.implicits._
    import graft.operators.Analytics
    // 1-8 char strings over {a,b,c,space}: maximal stress on the
    // low-gram fallback (most records sit below the k*q gram threshold)
    // and on gram sharing via the tiny alphabet
    val nameGen = for {
      len <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' '))
    } yield cs.mkString.trim match { case "" => "a"; case t => t }
    val corpusGen = Gen.chooseNum(8, 25)
      .flatMap(n => Gen.listOfN(n, nameGen))
    samples(corpusGen, 8).foreach { names =>
      val recs = names.zipWithIndex
        .map { case (nm, i) => (i.toLong, nm) }.toDF("id", "name")
      for (maxDist <- Seq(1, 2)) {
        val got = Analytics.fuzzyMatchPairsQgram(recs, maxDist, 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        val brute = recs.toDF("id_a", "name_a")
          .crossJoin(recs.toDF("id_b", "name_b"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("name_a"), col("name_b"), maxDist)
              .cast("long").as("d"))
          .filter(col("d") >= 0).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == brute, s"maxDist=$maxDist names=$names " +
          s"qgram-only=${got -- brute} brute-only=${brute -- got}")
      }
    }
  }

  test("exact dedup representative is always the minimum doc_id of its group") {
    import spark.implicits._
    samples(Gen.listOfN(20,
      Gen.oneOf("alpha beta", "gamma delta", "eps zeta")), 6)
      .foreach { texts =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val groups = Dedup.exactDuplicates(docs).collect()
        val byText = texts.zipWithIndex.groupBy(_._1)
        assert(groups.map(_.getAs[Long]("n_copies")).sum == texts.size)
        val reps = groups.map(_.getAs[Long]("rep_doc_id")).toSet
        val expectedReps = byText.values.map(_.map(_._2).min.toLong).toSet
        assert(reps == expectedReps)
      }
  }
}
