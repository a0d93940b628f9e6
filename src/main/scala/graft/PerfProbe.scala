package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TradingOps}

/** Scratch perf breakdown for the bench tail — times each stage of the
  * slow queries separately so optimization targets the real cost, not a
  * guess. Not part of the driver contract.
  */
object PerfProbe {
  /** Per-stage breakdown behind `GraphOps.triangleCount`'s round-8
    * rewrite — times each checkpoint boundary alone, and preserves the
    * RETIRED round-7 forms (distinct+self-join edge build; wedge
    * self-join + closing semi, shuffled and broadcast) head-to-head
    * against the shipped ones (grouped pair-expansion build;
    * compact-forward intersection core) so SCALE.md's cost table stays
    * reproducible evidence, not a claim.
    */
  def triangleStages(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String): Unit = {
    val pp = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges0 = pp.as("a").join(pp.as("b"), Seq("ok"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    val edges = time("edge build + checkpoint") { edges0.localCheckpoint() }
    // alternative build: one groupBy + per-order pair expansion instead
    // of distinct + self-join + distinct
    val edgesV2 = Tables.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("u"), y.as("v")))))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
    time("edge build v2 + checkpoint") { edgesV2.localCheckpoint() }
    time("edge build v2 #2") { edgesV2.localCheckpoint() }
    println(s"[probe] n_edges = ${edges.count()}")
    val deg = time("degree agg + checkpoint") {
      edges.select(col("u").as("node"))
        .union(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
    }
    println(s"[probe] n_nodes = ${deg.count()}")
    val oriented = time("orient (2 attach joins) + ckpt") {
      val withDeg = edges
        .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      withDeg.select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            col("dv").as("ddst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"),
            col("du").as("ddst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.ddst").as("ddst"))
        .localCheckpoint()
    }
    val wedges = oriented.as("e1").join(oriented.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("w_src"), col("e2.dst").as("w_dst"))
    val nW = time("wedge join count") { wedges.count() }
    println(s"[probe] n_wedges = $nW")
    time("wedge join + semi + final agg") {
      wedges.join(oriented,
        col("w_src") === col("src") && col("w_dst") === col("dst"),
        "left_semi")
        .agg(count(lit(1)).as("n_triangles")).collect()
    }
    time("wedge+semi SHUFFLED #2") {
      wedges.join(oriented,
        col("w_src") === col("src") && col("w_dst") === col("dst"),
        "left_semi")
        .agg(count(lit(1)).as("n_triangles")).collect()
    }
    val bright = broadcast(oriented)
    val bwedges = oriented.as("e1").join(bright.as("e2"),
      col("e1.src") === col("e2.src") &&
        (col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("w_src"), col("e2.dst").as("w_dst"))
    time("wedge+semi BROADCAST") {
      bwedges.join(bright,
        col("w_src") === col("src") && col("w_dst") === col("dst"),
        "left_semi")
        .agg(count(lit(1)).as("n_triangles")).collect()
    }
    time("wedge+semi BROADCAST #2") {
      bwedges.join(bright,
        col("w_src") === col("src") && col("w_dst") === col("dst"),
        "left_semi")
        .agg(count(lit(1)).as("n_triangles")).collect()
    }
    // compact-forward intersection: count each triangle at its lowest-
    // rank edge as |N+(u) ∩ N+(v)| — no wedge materialization at all
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs")).localCheckpoint()
    time("intersection core") {
      oriented.join(broadcast(adj.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
        .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nv"))), Seq("dst"))
        .select(size(array_intersect(col("nu"), col("nv"))).as("c"))
        .agg(sum(col("c"))).collect()
    }
    time("intersection core #2") {
      oriented.join(broadcast(adj.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
        .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nv"))), Seq("dst"))
        .select(size(array_intersect(col("nu"), col("nv"))).as("c"))
        .agg(sum(col("c"))).collect()
    }
    time("full triangleCount (operator)") {
      operators.GraphOps.triangleCount(spark, sfDir).collect()
    }
    time("full triangleCount #2") {
      operators.GraphOps.triangleCount(spark, sfDir).collect()
    }
  }

  /** q8_market_share stage breakdown (r14 verdict item 2: a third
    * consecutive isolated window above the 0.79–1.06 band at flat
    * calibration means profile, not adjudicate). Times the join
    * pyramid cumulatively, prints the executed join strategies, and
    * A/Bs the one shuffle join (lineitem ⋈ orders) against a
    * broadcast-projected-orders variant.
    */
  def q8Stages(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    import operators.Analytics
    def run(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        Sessions.releaseCaches(spark)
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-40s min=${ts.min}%6.3f s  runs=${
        ts.map(t => f"$t%.3f").mkString("/")}")
    }
    val l = Tables.table(spark, sfDir, "lineitem")
    val o = Tables.table(spark, sfDir, "orders")
    val c = Tables.table(spark, sfDir, "customer")
    run("scan l (agg rev only)") {
      l.agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(24,8)"))).toDF("x") }
    run("l join o (count by year)") {
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(year(col("l_shipdate"))).count() }
    run("l join o join c (count by year)") {
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(year(col("l_shipdate"))).count() }
    run("l join bcast(o) join c (count)") {
      l.join(broadcast(o.select(col("o_orderkey"), col("o_custkey"))),
          l("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === c("c_custkey"))
        .groupBy(year(col("l_shipdate"))).count() }
    val s = Tables.table(spark, sfDir, "supplier")
    val nCust = broadcast(Tables.table(spark, sfDir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey")))
    val r = broadcast(Tables.table(spark, sfDir, "region")
      .filter(col("r_name") === "ASIA"))
    val nSupp = broadcast(Tables.table(spark, sfDir, "nation")
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")))
    def fullJoin = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(nCust, c("c_nationkey") === col("cn_key"))
      .join(r, col("n_regionkey") === r("r_regionkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(nSupp, s("s_nationkey") === col("sn_key"))
    run("full 7-way join (count by year)") {
      fullJoin.groupBy(year(col("l_shipdate"))).count() }
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(24,8)")
    run("full join + decimal cond agg") {
      fullJoin.groupBy(year(col("l_shipdate")).as("l_year"))
        .agg(sum(when(col("supp_nation") === "NATION_5", rev)
          .otherwise(lit(0).cast("decimal(24,8)"))).cast("double")
          .as("nation_rev"),
          sum(rev).cast("double").as("total_rev")) }
    run("shipped marketShare") { Analytics.marketShare(spark, sfDir) }
    // split plan CONSTRUCTION (Tables.table resolution + catalyst
    // optimization, driver-side) from EXECUTION: re-collecting an
    // already-constructed frame re-runs the physical plan but none of
    // the analysis
    (1 to 3).foreach { i =>
      Sessions.releaseCaches(spark)
      val t0 = System.nanoTime()
      val df = Analytics.marketShare(spark, sfDir)
      df.queryExecution.executedPlan // force analysis+optimization
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      println(f"[probe] construct+optimize=${(t1 - t0) / 1e9}%6.3f s " +
        f"execute=${(t2 - t1) / 1e9}%6.3f s (run $i)")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      Seq("lineitem", "orders", "customer", "supplier", "nation",
        "region", "nation").foreach(Tables.table(spark, sfDir, _))
      println(f"[probe] 7x Tables.table resolution=${
        (System.nanoTime() - t0) / 1e9}%6.3f s (run $i)")
    }
    val shipped = Analytics.marketShare(spark, sfDir)
    shipped.collect()
    println("[probe] shipped executed plan:")
    shipped.queryExecution.executedPlan.toString.linesIterator
      .filter(ln => ln.contains("Join") || ln.contains("Exchange") ||
        ln.contains("Scan") || ln.contains("Aggregate"))
      .foreach(ln => println(s"[probe]   ${ln.trim.take(120)}"))
  }

  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Deep-partition as-of probe (round-10 ADVICE fix evidence): few
    * keys × many rows is the shape where a [currentRow,
    * unboundedFollowing) forward frame is quadratic — Spark's
    * UnboundedFollowingWindowFunctionFrame re-scans the partition tail
    * per row, so 4 keys × 250k rows/side would do ~4·(500k)²/2 frame
    * scans (hours). The shipped running-frame rewrite (last() over ts
    * DESC) is one O(n) pass per sort order; seconds here IS the proof.
    */
  def asofDeep(spark: org.apache.spark.sql.SparkSession): Unit = {
    val n = 1000000L
    val keys = 4
    val left = spark.range(n).select(
      concat(lit("k"), col("id") % keys).as("symbol"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      col("id").as("l_id"))
    val right = spark.range(n).select(
      concat(lit("k"), col("id") % keys).as("symbol"),
      timestamp_micros(col("id") * 1000000L + 500000L).as("ts"),
      (col("id") * 2).as("r_val"))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val f = dir match {
        case "backward" => operators.TimeSeriesOps.asofJoinBackward _
        case "forward" => operators.TimeSeriesOps.asofJoinForward _
        case "nearest" => operators.TimeSeriesOps.asofJoinNearest _
      }
      val got = time(s"asof $dir ${n} rows / $keys keys") {
        f(left, right, "symbol", "ts").filter(col("r_val").isNotNull).count()
      }
      println(s"[probe] asof_$dir matched = $got")
    }
  }

  /** Shipped-path triangle stages ONLY (no retired r7 forms — those are
    * deliberately heavier and would dominate a scaled run): pinpoints
    * which materialization boundary of [[graft.operators.GraphOps
    * .triangleCountEdges]] fails or dominates at the ScaleUp sf10
    * geometry (the r12 OOM triage).
    */
  def triangleShipped(spark: org.apache.spark.sql.SparkSession,
                      sfDir: String): Unit = {
    val edges0 = operators.GraphOps.coPurchaseEdges(spark, sfDir)
    import org.apache.spark.storage.StorageLevel.DISK_ONLY
    // mirror the shipped r13 levels: edge-sized materializations
    // DISK_ONLY (the OOM fix), node-sized deg default
    val edges = time("edge build + ckpt") {
      edges0.localCheckpoint(true, DISK_ONLY)
    }
    println(s"[probe] n_edges = ${time("edges.count") { edges.count() }}")
    val deg = time("degree agg + ckpt") {
      edges.select(col("u").as("node"))
        .union(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
    }
    println(s"[probe] n_nodes = ${deg.count()}")
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = time("orient + ckpt") {
      withDeg.select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .localCheckpoint(true, DISK_ONLY)
    }
    val adj = time("adjacency collect_list + ckpt") {
      oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("nbrs"))
        .localCheckpoint(true, DISK_ONLY)
    }
    println(s"[probe] n_adj = ${adj.count()}")
    val adjU = adj.select(col("src"), col("nbrs").as("nu"))
    val adjV = adj.select(col("src").as("dst"), col("nbrs").as("nv"))
    val tri = time("closing joins (shuffled) + agg") {
      oriented.join(adjU, Seq("src")).join(adjV, Seq("dst"))
        .select(size(array_intersect(col("nu"), col("nv")))
          .cast("long").as("c"))
        .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    }
    println(s"[probe] n_triangles = $tri")
    val wtri = time("closing WEDGE join + agg") {
      oriented.as("e1").join(oriented.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .select(col("e1.dst").as("u"), col("e2.dst").as("v"))
        .join(edges, Seq("u", "v"))
        .agg(count(lit(1))).head().getLong(0)
    }
    println(s"[probe] n_triangles (wedge) = $wtri")
  }

  /** Head-to-head of the two above-cap closing strategies as SHIPPED
    * end-to-end operators (each run pays its own edge build; caches
    * released between runs) — the r13 evidence that fixes the
    * `wedgeClose` default. Run with SPARK_GRAFT_SF_DIR at the factor-100
    * geometry.
    */
  def triangleStrategies(spark: org.apache.spark.sql.SparkSession,
                         sfDir: String): Unit = {
    for (w <- Seq(false, true)) {
      val r = time(s"triangleCountEdges end-to-end wedgeClose=$w") {
        operators.GraphOps.triangleCountEdges(
          operators.GraphOps.coPurchaseEdges(spark, sfDir), 0L, w)
          .collect()(0)
      }
      println(s"[probe] wedge=$w -> ${r.toSeq}")
      Sessions.releaseCaches(spark)
      System.gc()
    }
  }

  /** `dedup_clusters_lss` triage (r11 verdict item 2): the query went
    * 3.19 → 5.60 s across rounds on trivially-changed code. Times the
    * full query best-of-3, then each stage alone — pair build, and per
    * LSS iteration the star-round materialization vs the TWO
    * convergence actions (count + except) — so "checkpoint block
    * pressure" vs "second convergence job" stops being a guess. The
    * star operators are local replicas of [[Dedup.connectedComponents]]'
    * internals (probe-only duplication; the shipped code is the source
    * of truth and PropertiesSpec pins their equivalence transitively
    * through the shared oracle).
    */
  def lssStages(spark: org.apache.spark.sql.SparkSession,
                sfDir: String): Unit = {
    val docs = Tables.table(spark, sfDir, "documents")
    docs.count()
    for (i <- 1 to 3)
      time(s"dedup_clusters_lss full #$i") {
        Dedup.nearDupClustersLSS(docs, 3, 0.5, maxDf = 50).count()
      }
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("hi"),
          least(col("u"), col("v")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      canon(sym.filter(col("v") > col("u")).join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      canon(e.join(m, Seq("hi")).select(col("lo").as("u"), col("m").as("v"))
        .union(m.select(col("hi").as("u"), col("m").as("v"))))
    }
    val pairs0 = Dedup.jaccardPairs(docs, 3, 0.5, 50)
      .select(col("doc_a"), col("doc_b"))
    val pairs = time("jaccardPairs + ckpt") { pairs0.localCheckpoint() }
    var edges = time("canon + ckpt") {
      canon(pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
        .localCheckpoint()
    }
    var (n, s0) = {
      val r = edges.agg(count(lit(1)),
        sum(col("hi").cast("decimal(38,0)") +
          col("lo").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    println(s"[probe] n_edges = $n")
    val defaultPar = spark.sparkContext.defaultParallelism
    val parts = math.max(1, math.min(defaultPar, (n / 100000L).toInt + 1))
    println(s"[probe] star width = $parts")
    edges = time("repartition + ckpt") {
      edges.repartition(parts, col("hi")).localCheckpoint()
    }
    // r13: the shipped loop replaced the count + except anti-join with
    // ONE Φ = (count, Σ hi+lo) aggregate (proof in
    // Dedup.connectedComponents); the probe now times that action, and
    // keeps an except timing alongside for the comparison record
    var s: java.math.BigDecimal = s0
    var converged = false
    var iter = 0
    while (!converged && iter < 15) {
      val next = time(f"iter $iter star rounds + ckpt") {
        smallStar(largeStar(edges)).localCheckpoint()
      }
      val (nn, sn) = time(f"iter $iter metrics agg") {
        val r = next.agg(count(lit(1)),
          sum(col("hi").cast("decimal(38,0)") +
            col("lo").cast("decimal(38,0)"))).head()
        (r.getLong(0), r.getDecimal(1))
      }
      val exceptEmpty = time(f"iter $iter except.isEmpty (comparison)") {
        next.except(edges).isEmpty
      }
      converged = nn == n &&
        (nn == 0L || (sn != null && s != null && sn.compareTo(s) == 0))
      if (converged != (nn == n && exceptEmpty))
        println(s"[probe] WARNING: metric and except disagree at iter $iter")
      edges = next
      n = nn
      s = sn
      iter += 1
    }
    println(s"[probe] converged after $iter iters, n_edges = $n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("graft-probe")
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    if (args.contains("triangle")) { triangleStages(spark, sfDir); spark.stop(); return }
    if (args.contains("tri2")) { triangleShipped(spark, sfDir); spark.stop(); return }
    if (args.contains("tri3")) { triangleStrategies(spark, sfDir); spark.stop(); return }
    if (args.contains("srp")) {
      // scale-geometry SRP-LSH (r13): bandBits grown to ~log2(n) with
      // planes in proportion — the parameterization the scaladoc
      // prescribes for large corpora, vs the declared toy geometry
      // (32, 8) that died on candidate spill at factor 100
      val emb = Tables.table(spark, sfDir, "embeddings")
      println(s"[probe] n_vectors = ${emb.count()}")
      val n = time("srp (64 planes, 16-bit bands) pairs") {
        operators.Similarity.srpLshNearDupPairs(emb, 64, 16, 0.3).count()
      }
      println(s"[probe] n_pairs = $n")
      Sessions.releaseCaches(spark)
      val n2 = time("srp (32, 8, cap 64) pairs") {
        operators.Similarity.srpLshNearDupPairs(emb, 32, 8, 0.3, 64).count()
      }
      println(s"[probe] n_pairs capped-toy = $n2")
      spark.stop(); return
    }
    if (args.contains("audio")) {
      // audio_features cost decomposition (r16 verdict item 5): the
      // query is two mapPartitions legs — WAV ENCODE (syntheticAudio,
      // the fixture producer) then WAV DECODE + sample stats
      // (decodeAudio). Time (a) encode only (force payload bytes),
      // (b) encode+decode (the declared query through the bench sink) —
      // the delta is the decode leg; per-clip µs prints alongside.
      import graft.operators.Multimodal
      val docs = Tables.table(spark, sfDir, "documents").select("doc_id")
      val n = docs.count()
      println(s"[probe] n_clips = $n")
      for (i <- 1 to 2) {
        val enc = time(s"encode only #$i") {
          Multimodal.syntheticAudio(docs).toDF()
            .agg(sum(length(col("payload")))).head().getLong(0)
        }
        println(s"[probe] payload bytes = $enc")
        Sessions.releaseCaches(spark)
        time(s"encode+decode (audio_features) #$i") {
          Bench.materialize(SparkEntry.queries("audio_features")(spark, sfDir))
        }
        Sessions.releaseCaches(spark)
      }
      spark.stop(); return
    }
    if (args.contains("q8")) { q8Stages(spark, sfDir); spark.stop(); return }
    if (args.contains("asof")) { asofDeep(spark); spark.stop(); return }
    if (args.contains("lss")) { lssStages(spark, sfDir); spark.stop(); return }
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
