package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core data model + sources.
  *
  * The reference's single abstraction is a time-indexed single-symbol OHLCV
  * pandas frame loaded from a schema-ful CSV scan
  * (/root/reference/main.py:296-311). We generalize to a multi-symbol,
  * partition-friendly `DataFrame` with an ordinary `ts` column (Spark has no
  * index; ordering is declared per-operator via `Window.orderBy`/`orderBy`),
  * plus a `symbol` column so every operator parallelizes across symbols at
  * 100 TB scale (1 symbol = reference semantics, N symbols = scale path).
  */
object Tables {

  /** Raw OHLCV CSV contract of the reference (main.py:299-307):
    * header row, epoch-ms int64 `time`, float64 OHLCV. Schema is explicit —
    * never inferred — matching the reference's dtype dict.
    */
  val ohlcvCsvSchema: StructType = StructType(Seq(
    StructField("time", LongType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)
  ))

  /** Canonical candle schema: symbol, event-time ts, OHLCV doubles. */
  val candleSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ts", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)
  ))

  /** Driver parquet table reader (TESTDATA.md): `region nation customer
    * supplier part orders lineitem events documents embeddings`.
    * Parquet scan ⇒ Catalyst column pruning + predicate pushdown for free —
    * the reference needed manual `usecols` (main.py:307) for the same effect.
    *
    * `events.ts` normalization — the driver's parquet has shipped two
    * physical forms across testdata generations, both normalized here to a
    * session-TZ `TIMESTAMP` so every downstream operator sees ONE type:
    *  - TIMESTAMP(NANOS): readable only via
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    [[graft.Sessions]]); the long is divided back to µs with `div`
    *    (not `/` — double division loses precision above 2^53). All ns
    *    values were µs-aligned, so truncation is lossless.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (current): Spark reads it
    *    as TIMESTAMP_NTZ; the cast to TIMESTAMP reinterprets the same
    *    micros in the session time zone — the session is pinned to UTC
    *    ([[graft.Sessions]]), so the cast is value-identity and matches
    *    DuckDB's naive read of the same file.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = perSessionMap(tableCache, spark)
    val key = s"$sfDir#$name"
    val ref = perSession.get(key)
    val cached = if (ref == null) null else ref.get()
    if (cached != null) cached
    else {
      val df = resolveTable(spark, sfDir, name)
      perSession.put(key, new java.lang.ref.SoftReference(df))
      df
    }
  }

  /** Get-or-create the per-session inner map of a session-keyed memo —
    * the one synchronized WeakHashMap dance both memos below share, so
    * a fix to the locking or reference discipline lands once.
    */
  private def perSessionMap[V](
      cache: java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, V]],
      spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, V] =
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        cache.put(spark, m)
      }
      m
    }

  /** Resolved-relation memo behind [[table]]. Every `spark.read.parquet`
    * call re-runs datasource resolution — file listing plus a footer
    * schema read — which the r15 q8 profile measured at ~55–70 ms per
    * table on this host: ~0.4 s of a 7-table query's ~0.5 s plan
    * construction, paid PER CONSTRUCTION, per run (the whole reason
    * q8_market_share sat above its isolated band for three windows
    * while its execution stayed flat at ~0.6 s). A catalog-managed
    * table gets exactly this caching from the SessionCatalog's
    * resolved-relation cache; path-read tables deserve the same, so
    * the memo emulates it: the analyzed frame (an immutable lazy plan)
    * is shared per (session, dir, table). Sound because the driver
    * testdata dirs are immutable for a session's lifetime — nothing in
    * the engine writes into an sfDir — and weakly keyed on the SESSION
    * OBJECT with SOFT-referenced values: a DataFrame strongly references
    * its session, so a strong value would pin its own WeakHashMap key
    * forever (the documented WeakHashMap value→key trap); behind a
    * SoftReference a stopped session plus its frames become collectable
    * under memory pressure, and a cleared entry just re-resolves. A new
    * session (even at a reused address) always re-resolves.
    */
  private val tableCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String,
      java.lang.ref.SoftReference[DataFrame]]]()

  /** Memoized `count()` over a driver table, same key discipline and
    * soundness argument as [[table]]'s memo (sfDirs are immutable for a
    * session's lifetime; weakly keyed on the session object). The count
    * is a footer-cheap metadata job, but callers that peek it during
    * PLAN CONSTRUCTION — the graph width rules' |lineitem| peek, the
    * streaming drains' |events| peek — pay it per construction, per
    * run; a size that cannot change within a session deserves to be a
    * lookup after the first read.
    */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    val perSession = perSessionMap(countCache, spark)
    perSession.computeIfAbsent(s"$sfDir#$name",
      _ => java.lang.Long.valueOf(table(spark, sfDir, name).count())).longValue()
  }

  private val countCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]]()

  /** Scale-adaptive widen for CPU-dense per-row pipelines (tokenize +
    * shingle + digest, codec decodes, embedding parses) that sit DIRECTLY
    * on a parquet scan. Scan parallelism is split-bound — ceil(bytes /
    * `spark.sql.files.maxPartitionBytes`) tasks at most, and row-group
    * granularity can make it even lower (the driver fixtures are one
    * row group per table, so every scan-rooted pipeline runs its whole
    * expression chain on ONE task regardless of cores — StageProbe r18:
    * dedup_keep_best's two hottest stages ran 1 and 2 tasks on a 32-slot
    * box). The guide's fix for unsplittable/small inputs is to
    * repartition right after the read (guide §2.5 "input skew"); this
    * helper inserts that round-robin exchange ONLY when the source is
    * provably too small for the scan to reach the session's slots by
    * itself: estimated plan bytes < maxPartitionBytes × slots. At
    * production scale the predicate is false (any TB-range table makes
    * more splits than cores) and the plan is UNTOUCHED — no payload
    * byte is ever shuffled for parallelism the scan already has. The
    * width is the session's defaultParallelism, never a constant, so
    * the same rule sizes correctly at any core count (the driver's
    * low-core bench run included). Round-robin repartition is
    * deterministic under task retry (sort-before-repartition is on by
    * default — SPARK-23207) and every consumer of a widened frame is
    * order-independent (aggregates / joins / per-row maps), so results
    * are bit-identical — the oracle gate re-proves it per round.
    */
  def widenCpu(df: DataFrame, keys: Column*): DataFrame = {
    // Streaming frames pass through untouched: their micro-batch size is
    // unknowable at plan-construction time (optimizedPlan cannot even be
    // built before writeStream.start()), and the drains already derive
    // their parallelism from the replay slice geometry
    // (EventStreams.autoStatePartitions).
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val slots = math.max(1, spark.sparkContext.defaultParallelism)
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(maxSplit) * slots) {
      // Keyed form for aggregate/window pipelines: HASH-repartition on
      // `keys` instead of round-robin. Two wins over the keyless form:
      // (a) no sort-before-repartition pass on the (single) map task —
      // hash placement is already retry-deterministic; (b) when `keys`
      // is a subset of the downstream groupBy/Window clustering, the
      // widen exchange SATISFIES that distribution (HashPartitioning ⊆
      // ClusteredDistribution, SPARK-35703) and replaces the aggregate's
      // own exchange — one shuffle buys both placement and parallelism.
      // Callers must pick a key with ≫ slots distinct values (guide
      // §2.5: 20–100× more keys than partitions) — lineitem callers use
      // l_orderkey/l_partkey (150k/20k distinct at sf0.1).
      if (keys.isEmpty) df.repartition(slots)
      else df.repartition(slots, keys: _*)
    } else df
  }

  private def resolveTable(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }

  /** Schema-ful OHLCV CSV scan (reference S3-S5, main.py:296-311):
    * explicit schema (no inference pass), epoch-ms → timestamp, canonical
    * column order. A `symbol` column is derived from the file name
    * (the reference keys a whole app run on one file; we keep provenance so
    * a glob over thousands of per-symbol CSVs is a single scan).
    * No eager sort: ordering is an operator concern (`Window.orderBy($"ts")`),
    * and at scale the physical analog of the reference's sorted index is
    * date-partitioned storage + parquet min/max pruning.
    */
  def ohlcvCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(ohlcvCsvSchema)
      .csv(path)
      .select(
        regexp_replace(element_at(split(input_file_name(), "/"), -1), "\\.csv$", "")
          .as("symbol"),
        timestamp_millis(col("time")).as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Multi-symbol candle series derived from the driver's `events` table —
    * the OHLCV stand-in (FIXTURES.md §B): `event_type` is the symbol, `value`
    * is the price, candles are 1-hour event-time tumbling windows (the
    * resampling the reference's minute-resolution input implies,
    * README.md:17-29). open/close are first/last price in the bucket by
    * arrival order (`event_id` — unique, so deterministic under any
    * partitioning); volume = trade count.
    *
    * Scale: one hash-shuffle on (symbol, hour); Catalyst plans
    * partial_min_by/max_by map-side, so the exchange carries one row per
    * (symbol, hour) per input partition, not the raw events.
    */
  def candles(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      // a candle is defined over PRICED, TIMED events only — and the
      // filter is also what keeps the two engines aligned on NULLs:
      // Spark's min_by returns the (NULL) value at the extremal
      // event_id while DuckDB's arg_min SKIPS null values, so a
      // NULL-value row at the bucket's min event_id would silently
      // diverge open/close; a NULL-ts group would survive batch but
      // never pass a streaming watermark (stream ≡ batch would break)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(
        col("event_type").as("symbol"),
        date_trunc("hour", col("ts")).as("ts"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).cast(DoubleType).as("volume"))

  /** Multi-resolution OHLCV resample — the parameterized form of
    * [[candles]] (reference intent: minute-resolution input re-aggregated
    * to coarser bars, README.md:17-29). Bucket = `minutes`-wide tumbling
    * event-time window via integral floor-division on epoch-microseconds
    * (identical arithmetic in the DuckDB oracle, [[candlesAtSql]] — unlike
    * date_trunc, whose DuckDB 'day' form returns DATE, not TIMESTAMP).
    * Same one-shuffle partial-aggregate shape as [[candles]]; resolution
    * only changes the group count, never the plan.
    */
  def candlesAt(spark: SparkSession, sfDir: String, minutes: Int): DataFrame = {
    val bucketUs = minutes * 60000000L
    table(spark, sfDir, "events")
      // same NULL discipline as [[candles]]
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(
        col("event_type").as("symbol"),
        expr(s"timestamp_micros((unix_micros(ts) div $bucketUs) * $bucketUs)")
          .as("ts"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).cast(DoubleType).as("volume"))
  }

  /** S1/S2 — recursive CSV catalog listing with case-insensitive filename
    * substring filter (reference: `os.walk` + `query in basename`,
    * main.py:202-221). Catalog-level, not data-level: returns paths for a
    * subsequent [[ohlcvCsv]] scan. Uses the Hadoop FS API so the same code
    * lists HDFS/S3 at scale.
    */
  def listCsvFiles(spark: SparkSession, root: String,
      nameQuery: String = ""): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(path, /* recursive = */ true)
    val q = nameQuery.toLowerCase
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.toLowerCase.endsWith(".csv") &&
          (q.isEmpty || name.toLowerCase.contains(q)))
        out += f.getPath.toString
    }
    out.result().sorted
  }

  /** S7 — CSV sink (reference: `export_df.to_csv`, main.py:515-534). One
    * header-ful CSV per partition; `coalesce(1)` only for small exports —
    * at scale you keep the parallel files (the reference's single-file
    * export does not survive 100 TB).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Bucketed + sorted storage for symbol-keyed series — the physical
    * analog of the reference's sorted index (`set_index(sorted=True)`,
    * main.py:310) at cluster scale. Writing a table `bucketBy(n, symbol)
    * .sortBy(symbol, ts)` lets every downstream symbol-clustered operator
    * (windows, groupBy, self-joins on symbol) read WITHOUT a shuffle:
    * the scan's hash-partitioning satisfies the operator's required
    * distribution, so Catalyst elides the Exchange. For multi-year
    * minute data this removes the per-stage sort+shuffle of the symbol's
    * whole history (SCALE.md "known costs").
    *
    * The pre-write `repartition(n, bucketCol)` uses the SAME hash
    * Spark's bucketing uses, so each bucket lands in exactly one task →
    * exactly one file per bucket (the layout that also lets the scan
    * expose its sort order under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      buckets: Int = 8, bucketCol: String = "symbol",
      sortCol: String = "ts"): Unit =
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol, sortCol)
      .saveAsTable(tableName)

  /** Build-once/read-many fixture: the [[candles]] series for a corpus
    * directory, materialized through [[writeBucketed]] on FIRST use per
    * JVM and memoized — the lifecycle a real deployment runs (one layout
    * write amortized over every later symbol-clustered read). Returns
    * the catalog table name; `spark.table(name)` scans it WITHOUT an
    * Exchange for symbol-clustered operators. Keyed by the DIRECTORY
    * string (content-bound — unlike a canonicalized-plan key, two
    * distinct corpora can never share an entry), same contract as
    * [[graft.operators.Similarity.cellLayoutFor]].
    */
  /** Injective catalog/filesystem-safe key for a corpus directory:
    * sanitized path ([A-Za-z0-9_] — legal in both table identifiers and
    * file names) plus a 6-byte MD5 of the raw path, so two dirs that
    * sanitize identically still never share a key. One shared derivation
    * for every build-once layout fixture ([[bucketedCandlesFor]],
    * [[zorderedEventsFor]], [[graft.operators.Similarity.cellLayoutFor]]).
    */
  def dirKey(d: String): String =
    d.replaceAll("[^A-Za-z0-9_]", "_") + "_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).take(6)
        .map("%02x".format(_)).mkString

  private val bucketedCandlesCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def bucketedCandlesFor(spark: SparkSession, sfDir: String): String = {
    val tbl = bucketedCandlesCache.computeIfAbsent(sfDir, d => {
      val name = s"candles_bkt_${dirKey(d)}"
      val path = new java.io.File("spark-warehouse", name).getAbsolutePath
      writeBucketed(candles(spark, d), name, path)
      name
    })
    // the memoized NAME is bound to the in-memory catalog of the session
    // that built it — after a session stop/rebuild in the same JVM the
    // new catalog is empty, so re-register (rebuild) rather than hand
    // back a dangling identifier
    if (!spark.catalog.tableExists(tbl)) {
      val path = new java.io.File("spark-warehouse", tbl).getAbsolutePath
      writeBucketed(candles(spark, sfDir), tbl, path)
    }
    tbl
  }

  /** Build-once/read-many fixture for the Z-ORDER layout (the 2-D
    * analog of [[bucketedCandlesFor]]): the events table rewritten
    * through [[graft.functions.ZOrder.writeZOrdered]] on (ts, value) on
    * FIRST use per JVM and memoized by DIRECTORY (content-bound key).
    * Returns the parquet path; a scan with predicates on EITHER
    * dimension prunes most files on footer min-max stats — what a
    * linear single-key sort can only do for its leading column. One
    * layout write amortized over every later 2-D-selective read, the
    * same lifecycle as the bucketed table and the IVF cell layout.
    */
  private val zorderedEventsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def zorderedEventsFor(spark: SparkSession, sfDir: String): String =
    zorderedEventsCache.computeIfAbsent(sfDir, d => {
      val path = new java.io.File(
        "spark-warehouse", s"events_z_${dirKey(d)}").getAbsolutePath
      graft.functions.ZOrder.writeZOrdered(
        table(spark, d, "events"), path, "ts", "value", files = 16)
      path
    })

  /** S8 — JSON template source (main.py:536-555): flat scalar config
    * `{"initial_budget": N, "investment_per_trade": N, "max_trades": N|""}`
    * parsed to the typed backtest config (control-plane, driver-side).
    */
  def parseTemplate(json: String): graft.operators.Backtest.Config = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    def num(k: String, default: Double): Double =
      Option(root.get(k)).filter(_.isNumber).map(_.asDouble).getOrElse(default)
    val maxTrades = Option(root.get("max_trades"))
      .filter(_.isNumber).map(_.asInt)
    graft.operators.Backtest.Config(
      initialBudget = num("initial_budget", 10000.0),
      perTrade = num("investment_per_trade", 1000.0),
      maxTrades = maxTrades)
  }

  /** DuckDB-equivalent SQL for [[candles]], inlined as a CTE by queries that
    * build on the candle series (tumbling 1-hour buckets ≡
    * `date_trunc('hour', ts)`; the streaming path uses the equivalent
    * `window($"ts", "1 hour")`).
    */
  val candlesSql: String =
    """SELECT event_type AS symbol, date_trunc('hour', ts) AS ts,
      |  arg_min("value", event_id) AS open, max("value") AS high,
      |  min("value") AS low, arg_max("value", event_id) AS close,
      |  CAST(count(*) AS DOUBLE) AS volume
      |FROM events
      |WHERE "value" IS NOT NULL AND ts IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** DuckDB oracle for [[candlesAt]] — same floor-division bucketing on
    * epoch-microseconds (CAST first: the view's TIMESTAMP_NS needs an
    * explicit TIMESTAMP cast before epoch_us on some DuckDB versions).
    */
  def candlesAtSql(minutes: Int): String = {
    val bucketUs = minutes * 60000000L
    s"""SELECT event_type AS symbol,
       |  make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // $bucketUs)
       |    * $bucketUs) AS ts,
       |  arg_min("value", event_id) AS open, max("value") AS high,
       |  min("value") AS low, arg_max("value", event_id) AS close,
       |  CAST(count(*) AS DOUBLE) AS volume
       |FROM events
       |WHERE "value" IS NOT NULL AND ts IS NOT NULL
       |GROUP BY 1, 2""".stripMargin
  }
}
