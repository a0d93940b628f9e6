package graft

/** DuckDB oracle SQL for the LLM-pipeline operators (dedup, similarity,
  * text analysis). Each string mirrors its Spark query EXACTLY — same
  * normalization, same hash construction (md5-derived, engine-neutral),
  * same arithmetic shape (integer counts, DECIMAL accumulation, single
  * final double ops) — so results hash-match bit-for-bit.
  */
object OracleSql {

  /** Normalized text: lowercase, trim, collapse whitespace ('g' = all).
    * The class is explicit, mirroring TextAnalysis.normText: Java's
    * `\s` includes U+000B, RE2's does not — both engines now share the
    * identical five-char class so fingerprints can never diverge on it.
    */
  val norm = "regexp_replace(lower(trim(text)), '[ \\t\\n\\f\\r]+', ' ', 'g')"

  /** Whitespace tokens of the normalized text ("" → [], not [""]). */
  val toks =
    s"CASE WHEN length($norm) = 0 THEN [] ELSE string_split($norm, ' ') END"

  /** Distinct word 3-gram shingles (whole text if < 3 words). */
  val shingles3 =
    s"""CASE WHEN len(t) >= 3
       |  THEN list_distinct(list_transform(range(0, len(t)-2),
       |         i -> array_to_string(t[i+1:i+3], ' ')))
       |  ELSE [array_to_string(t, ' ')] END""".stripMargin

  /** (doc_id, n_sh, shash) exploded distinct-shingle table. Distinctness
    * is over shingle STRINGS, then each shingle is carried as the same
    * 60-bit md5-derived int64 the Spark side uses (Dedup.shingleTable) —
    * both engines join/count over the identical hashed domain.
    */
  val shingleTable =
    s"""SELECT doc_id, len(shl) AS n_sh,
       |  CAST('0x' || substr(md5(unnest(shl)), 1, 15) AS BIGINT) AS shash
       |FROM (
       |  SELECT doc_id, $shingles3 AS shl
       |  FROM (SELECT doc_id, $toks AS t FROM documents))""".stripMargin

  /** Exact-Jaccard pair query over [[shingleTable]]. A finite `maxDf`
    * mirrors the prune fused into Dedup.jaccardPairs (via
    * graft.functions.CappedDocList): shingle ROWS with document frequency
    * > maxDf are dropped before pairing, while n_sh keeps the UNPRUNED
    * set size — identical to the Spark side, so jaccard values agree
    * bit-for-bit under pruning too.
    */
  def jaccardPairs(minJ: Double, maxDf: Long = Long.MaxValue): String = {
    val prune =
      if (maxDf == Long.MaxValue) ""
      else
        s""",
           |hot AS (SELECT shash FROM sh GROUP BY shash HAVING count(*) > $maxDf),
           |shp AS (SELECT sh.* FROM sh ANTI JOIN hot USING (shash))""".stripMargin
    val src = if (maxDf == Long.MaxValue) "sh" else "shp"
    s"""WITH sh AS ($shingleTable)$prune
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    round(CAST(count(*) AS DOUBLE) /
       |          CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) AS jaccard
       |  FROM $src a JOIN $src b ON a.shash = b.shash AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh)
       |WHERE jaccard >= $minJ""".stripMargin
  }

  /** Relational MinHash signature table (doc_id, seed, minhash), using the
    * identical Mersenne-31 family as Dedup.minhashSignatures: one
    * md5-60-bit base hash per shingle, then (a_i·h32 + b_i) mod 2^31−1
    * with the (a, b) parameters inlined from the shared generator.
    */
  def minhashSignatures(k: Int): String = {
    val p = graft.operators.Dedup.MersennePrime
    val seedRows = graft.operators.Dedup.minhashSeeds(k)
      .map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")
    s"""SELECT doc_id, seed, min((a * h32 + b) % $p) AS minhash
       |FROM (
       |  SELECT doc_id, shash % $p AS h32
       |  FROM ($shingleTable) sh)
       |CROSS JOIN (VALUES $seedRows) seeds(seed, a, b)
       |GROUP BY doc_id, seed""".stripMargin
  }

  /** Per-doc hashed shingle LIST — the un-exploded sibling of
    * [[shingleTable]] (mirrors Dedup.shingleArrays).
    */
  val shingleArrays =
    s"""SELECT doc_id, list_transform(shl,
       |    s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS sha
       |FROM (
       |  SELECT doc_id, $shingles3 AS shl
       |  FROM (SELECT doc_id, $toks AS t FROM documents))""".stripMargin

  /** MinHash LSH candidate pairs verified by true Jaccard over the hashed
    * shingle lists (list_intersect dedups — same as Spark array_intersect).
    */
  def minhashLshPairs(k: Int, rowsPerBand: Int, minJ: Double): String =
    s"""WITH sigs AS (${minhashSignatures(k)}),
       |buckets AS (
       |  SELECT doc_id, seed // $rowsPerBand AS band,
       |    md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS bucket
       |  FROM sigs GROUP BY doc_id, seed // $rowsPerBand),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |arr AS ($shingleArrays)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT c.doc_a, c.doc_b,
       |    round(CAST(len(list_intersect(a.sha, b.sha)) AS DOUBLE) /
       |          CAST(len(a.sha) + len(b.sha)
       |               - len(list_intersect(a.sha, b.sha)) AS DOUBLE), 6)
       |      AS jaccard
       |  FROM cand c
       |  JOIN arr a ON a.doc_id = c.doc_a
       |  JOIN arr b ON b.doc_id = c.doc_b)
       |WHERE jaccard >= $minJ""".stripMargin

  /** Incremental corpus merge (mirrors Dedup.mergeCorpusDay over the
    * doc_id % `mod` split: remainder 0 = the new day's delta, everything
    * else = the existing corpus). Per-doc state (fingerprint, minhash
    * band buckets, hashed shingle list) is independent of other docs, so
    * the oracle computes it over ALL documents with the shared builders
    * and applies the split at probe time — identical to the Spark side's
    * two-table form. Status priority exact > near, match = smallest
    * qualifying existing doc, 'new' rows carry NULL match_id.
    */
  def mergeCorpusDay(mod: Int, k: Int, rowsPerBand: Int,
      minJ: Double): String =
    s"""WITH sigs AS (${minhashSignatures(k)}),
       |buckets AS (
       |  SELECT doc_id, seed // $rowsPerBand AS band,
       |    md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS bucket
       |  FROM sigs GROUP BY doc_id, seed // $rowsPerBand),
       |arr AS ($shingleArrays),
       |fp AS (SELECT doc_id, md5($norm) AS fingerprint FROM documents),
       |exact AS (
       |  SELECT d.doc_id AS d_id, min(e.doc_id) AS exact_match
       |  FROM fp d JOIN fp e ON d.fingerprint = e.fingerprint
       |  WHERE d.doc_id % $mod = 0 AND e.doc_id % $mod <> 0
       |  GROUP BY 1),
       |cand AS (
       |  SELECT DISTINCT d.doc_id AS d_id, e.doc_id AS ex_id
       |  FROM buckets d JOIN buckets e
       |    ON d.band = e.band AND d.bucket = e.bucket
       |  WHERE d.doc_id % $mod = 0 AND e.doc_id % $mod <> 0),
       |near AS (
       |  SELECT d_id, min(ex_id) AS near_match FROM (
       |    SELECT c.d_id, c.ex_id,
       |      round(CAST(len(list_intersect(a.sha, b.sha)) AS DOUBLE) /
       |            CAST(len(a.sha) + len(b.sha)
       |                 - len(list_intersect(a.sha, b.sha)) AS DOUBLE), 6)
       |        AS j
       |    FROM cand c
       |    JOIN arr a ON a.doc_id = c.ex_id
       |    JOIN arr b ON b.doc_id = c.d_id)
       |  WHERE j >= $minJ GROUP BY 1)
       |SELECT f.doc_id,
       |  CASE WHEN x.exact_match IS NOT NULL THEN 'exact_dup'
       |       WHEN n.near_match IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS status,
       |  coalesce(x.exact_match, n.near_match) AS match_id
       |FROM fp f
       |LEFT JOIN exact x ON f.doc_id = x.d_id
       |LEFT JOIN near n ON f.doc_id = n.d_id
       |WHERE f.doc_id % $mod = 0""".stripMargin

  /** Relational recomputation of the SimHash64 Catalyst expression:
    * per-token md5-60-bit hash, ±1 votes per bit, bit set iff votes > 0.
    */
  val simhashFingerprints: String =
    s"""SELECT doc_id,
       |  CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END)
       |       AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM (SELECT doc_id,
       |          CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h FROM (
       |          SELECT doc_id, unnest($toks) AS token FROM documents))
       |  CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bits
       |  GROUP BY doc_id, b)
       |GROUP BY doc_id""".stripMargin

  /** SimHash band-LSH near-dup pairs (exact recall for maxHamming<bands). */
  def simhashNearDupPairs(maxHamming: Int, bands: Int, bandBits: Int): String = {
    val mask = (1L << bandBits) - 1
    s"""WITH fp AS ($simhashFingerprints),
       |banded AS (
       |  SELECT doc_id, simhash, band,
       |    (simhash >> (band * $bandBits)) & $mask AS key
       |  FROM fp CROSS JOIN (SELECT unnest(range(0, $bands)) AS band) t),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.simhash, b.simhash)) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming""".stripMargin
  }

  /** Exact-decimal list arithmetic for cosine similarity (mirrors
    * Similarity.dotDecimal: DECIMAL(19,18) terms, exact sum).
    */
  private def dot(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b),
       |  p -> CAST(p[1] * p[2] AS DECIMAL(19,18)))) AS DOUBLE)""".stripMargin
  private def normSq(a: String): String =
    s"""CAST(list_sum(list_transform($a,
       |  x -> CAST(x * x AS DECIMAL(19,18)))) AS DOUBLE)""".stripMargin
  private def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${normSq(a)}) * sqrt(${normSq(b)}))"

  /** [[cosine]] under the engine-wide zero-norm convention (a degenerate
    * all-zero vector has no direction, so its cosine is DEFINED as 0 —
    * mirrors Similarity.assignTo's guard; without it DuckDB's 0/0 takes
    * a different path than Spark's guarded branch on degenerate input).
    */
  private def cosineOrZero(a: String, b: String): String =
    s"""CASE WHEN ${normSq(a)} > 0 AND ${normSq(b)} > 0
       |  THEN ${cosine(a, b)} ELSE 0.0 END""".stripMargin

  /** Augmented corpus for the scale-geometry SRP query: every 5th
    * vector gains a deterministically perturbed copy (even dims
    * ×1.0625, odd ×0.9375 — exact binary fractions, so the double math
    * is bit-identical cross-engine) under the collision-free id
    * -vec_id-1. The synthetic corpus has no natural pairs above 0.7
    * cosine, so a correct 16-bit-band LSH finds nothing in it; the
    * planted ~0.998-sim copies give the scale geometry a real recall
    * surface for the oracle to check (mirrors the Spark side in
    * SparkEntry's embedding_lsh_neardup_scaled).
    */
  val srpPlantedCorpusSql: String =
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |UNION ALL
      |SELECT -vec_id - 1,
      |  list_transform(range(0, len(embedding)), d ->
      |    CAST(embedding[d+1] AS DOUBLE) *
      |    (CASE WHEN d % 2 = 0 THEN CAST(1.0625 AS DOUBLE)
      |          ELSE CAST(0.9375 AS DOUBLE) END))
      |FROM embeddings WHERE vec_id % 5 = 0""".stripMargin

  /** SRP-LSH near-dup pairs (mirrors Similarity.srpLshNearDupPairs):
    * identical md5-parity ±1 hyperplanes, DECIMAL(19,18) projection sums,
    * band-signature equi-join, exact-decimal cosine verification — the
    * oracle mirrors CANDIDATE GENERATION, not just the final threshold.
    * `maxBucketSize` mirrors the Spark side's mega-bucket guard: when
    * set, only buckets with 2..maxBucketSize members generate candidate
    * pairs (the unlimited default emits the identical plan as before —
    * singletons pair with nothing either way). `corpusSql` overrides the
    * corpus CTE body (must yield vec_id, v DOUBLE[]) so augmented-corpus
    * variants (the planted-near-dup scale-geometry query) share one
    * mirror.
    */
  def srpLshNearDupPairs(planes: Int, bandBits: Int, minSim: Double,
      maxBucketSize: Int = Int.MaxValue,
      corpusSql: String =
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")
      : String = {
    val qualCte = if (maxBucketSize == Int.MaxValue) ""
    else s"""qual AS (
       |  SELECT band, key FROM bands GROUP BY 1, 2
       |  HAVING count(*) > 1 AND count(*) <= $maxBucketSize),
       |""".stripMargin
    val qualJoin = if (maxBucketSize == Int.MaxValue) ""
    else "\n  JOIN qual q ON a.band = q.band AND a.key = q.key"
    s"""WITH e AS ($corpusSql),
       |sig AS (
       |  SELECT vec_id, j,
       |    CASE WHEN CAST(list_sum(list_transform(range(0, len(v)),
       |      d -> CAST(v[d+1] * (CASE WHEN
       |             CAST('0x' || substr(md5(j || ':' || d), 1, 15) AS BIGINT)
       |             % 2 = 0 THEN 1.0 ELSE -1.0 END)
       |        AS DECIMAL(19,18)))) AS DOUBLE) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $planes)) AS j) js),
       |bands AS (
       |  SELECT vec_id, j // $bandBits AS band,
       |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY j) AS key
       |  FROM sig GROUP BY 1, 2),
       |${qualCte}cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id$qualJoin)
       |SELECT vec_a, vec_b, sim FROM (
       |  SELECT c.vec_a, c.vec_b, round(${cosine("ea.v", "eb.v")}, 6) AS sim
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.vec_a
       |  JOIN e eb ON eb.vec_id = c.vec_b)
       |WHERE sim >= $minSim""".stripMargin
  }

  /** Q-gram prefix-filter fuzzy pairs over one brand's catalog (mirrors
    * Analytics.fuzzyMatchPairsQgram at q=3, maxDist=2 on the declared
    * Brand#13 scope): identical '#'-padding, distinct grams, rarity-
    * ordered prefix with the (df, gram) tiebreak, rn ≤ k·q+1 = 7,
    * length-banded candidate self-join, low-gram (≤ 6 distinct grams)
    * length fallback, final Levenshtein ≤ 2. `maxBlockSize` mirrors the
    * Spark side's mega-block guard: when set, only prefix blocks with
    * 2..maxBlockSize members generate prefix candidates (singleton
    * blocks pair with nothing either way, and the low-gram fallback is
    * length-keyed, so it is untouched by the cap — identical to the
    * Spark placement).
    */
  def fuzzyQgramParts(maxBlockSize: Int = Int.MaxValue): String = {
    val blkCte = if (maxBlockSize == Int.MaxValue) ""
    else s"""blk AS (
       |  SELECT gram FROM pfx GROUP BY gram
       |  HAVING count(*) > 1 AND count(*) <= $maxBlockSize),
       |""".stripMargin
    val blkJoin = if (maxBlockSize == Int.MaxValue) ""
    else "\n      JOIN blk k ON a.gram = k.gram"
    s"""WITH r AS (
       |  SELECT p_partkey AS id, p_name AS name,
       |    '##' || p_name || '##' AS p FROM part
       |  WHERE p_brand = 'Brand#13'),
       |g AS (
       |  SELECT DISTINCT id, name, t.gram FROM r,
       |    unnest(list_transform(range(1, CAST(len(p) AS BIGINT) - 1),
       |      i -> substr(p, CAST(i AS BIGINT), 3))) AS t(gram)),
       |df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
       |pfx AS (
       |  SELECT gram, id, name FROM (
       |    SELECT g.gram, g.id, g.name,
       |      row_number() OVER (PARTITION BY g.id
       |        ORDER BY df.df, g.gram) AS rn
       |    FROM g JOIN df USING (gram))
       |  WHERE rn <= 7),
       |${blkCte}lows AS (
       |  SELECT id, name FROM g GROUP BY id, name
       |  HAVING count(*) <= 6),
       |cand AS (
       |  SELECT DISTINCT a.id AS part_a, b.id AS part_b,
       |    a.name AS name_a, b.name AS name_b
       |  FROM pfx a JOIN pfx b
       |    ON a.gram = b.gram AND a.id < b.id
       |      AND abs(len(a.name) - len(b.name)) <= 2$blkJoin
       |  UNION
       |  SELECT DISTINCT least(l.id, r.id), greatest(l.id, r.id),
       |    CASE WHEN l.id < r.id THEN l.name ELSE r.name END,
       |    CASE WHEN l.id < r.id THEN r.name ELSE l.name END
       |  FROM lows l JOIN r
       |    ON l.id <> r.id AND abs(len(l.name) - len(r.name)) <= 2)
       |SELECT part_a, part_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= 2""".stripMargin
  }

  /** Per-label centroid components (mirrors Similarity.labelCentroids):
    * zipped unnest for 0-based positions, DECIMAL(28,18) component sums.
    */
  val labelCentroids: String =
    """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |x AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
      |      FROM e)
      |SELECT label, pos, count(*) AS n_vecs,
      |  round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS centroid
      |FROM x GROUP BY 1, 2""".stripMargin

  /** One K-means assignment step (mirrors Similarity.kmeansAssign):
    * centroids as ordered lists, exact-decimal cosine, argmax by
    * (sim DESC, label ASC) — arg_max lacks tuple keys in DuckDB, so the
    * oracle ranks with a window (the Spark side's map-side max_by picks
    * the identical winner).
    */
  val kmeansAssign: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |x AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |      FROM e),
       |cent AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x GROUP BY 1, 2),
       |cvecs AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent GROUP BY 1),
       |scored AS (SELECT vec_id, c_label, ${cosineOrZero("v", "cvec")} AS sim
       |           FROM e CROSS JOIN cvecs)
       |SELECT vec_id, assigned_label, round(sim, 6) AS sim FROM (
       |  SELECT vec_id, c_label AS assigned_label, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, c_label) AS rn
       |  FROM scored)
       |WHERE rn = 1""".stripMargin

  /** Two unrolled Lloyd iterations (mirrors Similarity.kmeansLloyd(2)):
    * label-centroid init, assign (exact-decimal cosine argmax), re-centroid
    * from the new assignment, assign again. Each stage reuses the
    * [[kmeansAssign]] building blocks verbatim.
    */
  val kmeansLloyd2: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |x0 AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |       FROM e),
       |cent0 AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x0 GROUP BY 1, 2),
       |cvec0 AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent0 GROUP BY 1),
       |s0 AS (SELECT vec_id, c_label, ${cosineOrZero("v", "cvec")} AS sim
       |       FROM e CROSS JOIN cvec0),
       |a1 AS (SELECT vec_id, c_label AS label FROM (
       |    SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, c_label) AS rn FROM s0)
       |  WHERE rn = 1),
       |e1 AS (SELECT e.vec_id, a1.label, e.v FROM e JOIN a1 USING (vec_id)),
       |x1 AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |       FROM e1),
       |cent1 AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x1 GROUP BY 1, 2),
       |cvec1 AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent1 GROUP BY 1),
       |s1 AS (SELECT vec_id, c_label, ${cosineOrZero("v", "cvec")} AS sim
       |       FROM e1 CROSS JOIN cvec1)
       |SELECT vec_id, cluster, round(sim, 6) AS sim FROM (
       |  SELECT vec_id, c_label AS cluster, sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, c_label) AS rn
       |  FROM s1)
       |WHERE rn = 1""".stripMargin

  /** IVF ANN top-k (mirrors Similarity.annTopKIvf AND annTopKFromLayout
    * — the two declared queries share this oracle): label-centroid
    * codebook, decimal-argmax cell assignment (the exact kmeansAssign
    * rule), per-query decimal top-`nprobe` cell ranking (ties to the
    * smaller cell), exact-decimal top-k over the probed cells' vectors.
    * IVF's approximation is WHICH cells are probed — a deterministic
    * function of the data — so the oracle replays the entire pipeline
    * bit-exactly; nothing here is a tolerance check.
    */
  def annTopKIvf(nQ: Int, k: Int, nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |x AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |      FROM e),
       |cent AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x GROUP BY 1, 2),
       |cvecs AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent GROUP BY 1),
       |corp AS (SELECT vec_id, v FROM e WHERE vec_id >= $nQ),
       |assigned AS (SELECT vec_id, cell FROM (
       |    SELECT c.vec_id, cv.c_label AS cell,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cosineOrZero("c.v", "cv.cvec")} DESC,
       |          cv.c_label) AS rn
       |    FROM corp c CROSS JOIN cvecs cv)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQ),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT q.q_id, cv.c_label AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cosineOrZero("q.qv", "cv.cvec")} DESC,
       |          cv.c_label) AS crn
       |    FROM q CROSS JOIN cvecs cv)
       |  WHERE crn <= $nprobe),
       |scored AS (
       |  SELECT q.q_id, c.vec_id, ${cosineOrZero("q.qv", "c.v")} AS sim
       |  FROM corp c
       |  JOIN assigned a ON a.vec_id = c.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN q ON q.q_id = p.q_id)
       |SELECT q_id, vec_id, rank, round(sim, 6) AS sim FROM (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
       |      AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** IVF ANN top-k over the GROWN index (mirrors Similarity
    * .appendedCellLayoutFor + annTopKFromLayout): identical to
    * [[annTopKIvf]] except the centroid codebook is trained on the BASE
    * slice only (corpus ids ≢ `rem` mod `mod`) — the append contract is
    * that delta vectors are assigned by the STORED codebook and the
    * codebook never moves, so assignment of EVERY corpus vector (base
    * at build, delta at append) is the one decimal argmax against that
    * base-trained codebook, and the whole pipeline stays a
    * deterministic function of the data.
    */
  def annTopKIvfAppend(nQ: Int, k: Int, nprobe: Int,
      mod: Int, rem: Int): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |eb AS (SELECT * FROM e
       |       WHERE vec_id < $nQ OR vec_id % $mod <> $rem),
       |x AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |      FROM eb),
       |cent AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x GROUP BY 1, 2),
       |cvecs AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent GROUP BY 1),
       |corp AS (SELECT vec_id, v FROM e WHERE vec_id >= $nQ),
       |assigned AS (SELECT vec_id, cell FROM (
       |    SELECT c.vec_id, cv.c_label AS cell,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cosineOrZero("c.v", "cv.cvec")} DESC,
       |          cv.c_label) AS rn
       |    FROM corp c CROSS JOIN cvecs cv)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQ),
       |probes AS (SELECT q_id, cell FROM (
       |    SELECT q.q_id, cv.c_label AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cosineOrZero("q.qv", "cv.cvec")} DESC,
       |          cv.c_label) AS crn
       |    FROM q CROSS JOIN cvecs cv)
       |  WHERE crn <= $nprobe),
       |scored AS (
       |  SELECT q.q_id, c.vec_id, ${cosineOrZero("q.qv", "c.v")} AS sim
       |  FROM corp c
       |  JOIN assigned a ON a.vec_id = c.vec_id
       |  JOIN probes p ON p.cell = a.cell
       |  JOIN q ON q.q_id = p.q_id)
       |SELECT q_id, vec_id, rank, round(sim, 6) AS sim FROM (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
       |      AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** Brute-force cosine top-k: queries vec_id < nQ vs the rest. */
  def annTopK(nQ: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $nQ),
       |c AS (SELECT vec_id, v FROM e WHERE vec_id >= $nQ),
       |scored AS (
       |  SELECT q_id, vec_id, ${cosineOrZero("qv", "v")} AS sim
       |  FROM c CROSS JOIN q)
       |SELECT q_id, vec_id, rank, round(sim, 6) AS sim FROM (
       |  SELECT q_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin

  /** Label-blocked embedding near-dup pairs above a cosine threshold. */
  def embeddingNearDup(minSim: Double): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings)
       |SELECT label, vec_a, vec_b, sim FROM (
       |  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(${cosine("a.v", "b.v")}, 6) AS sim
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
       |WHERE sim >= $minSim""".stripMargin

  /** Text-analysis mirrors. */
  val tokenStats: String =
    s"""SELECT doc_id, length(text) AS n_chars,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens
       |FROM (SELECT doc_id, text, $toks AS t FROM documents)""".stripMargin

  val enStops = "(the|and|of|to|in|is|that|it|for|with)"

  val qualityScore: String =
    s"""SELECT doc_id, round(
       |  0.3 * least(CAST(1.0 AS DOUBLE), toks / 50.0) +
       |  0.2 * (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE),
       |    punct / greatest(CAST(nlen AS DOUBLE), CAST(1.0 AS DOUBLE)) * 5.0)) +
       |  0.2 * least(CAST(1.0 AS DOUBLE),
       |    stops * 10.0 / greatest(toks, CAST(1.0 AS DOUBLE))) +
       |  0.3 * (dst / greatest(toks, CAST(1.0 AS DOUBLE))), 6) AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(t) AS DOUBLE) AS toks,
       |    CAST(len(regexp_extract_all(n, '([^a-z0-9 ])', 1)) AS DOUBLE) AS punct,
       |    CAST(len(regexp_extract_all(n, '\\b$enStops\\b', 1)) AS DOUBLE) AS stops,
       |    CAST(len(list_distinct(t)) AS DOUBLE) AS dst,
       |    length(n) AS nlen
       |  FROM (SELECT doc_id, $norm AS n, $toks AS t FROM documents))""".stripMargin

  /** Per-source corpus report (mirrors TextAnalysis.corpusStatsBySource):
    * same quality expression as [[qualityScore]], DECIMAL quality mean,
    * interpolated token percentiles (quantile_cont ≡ Spark percentile,
    * rounded at 6 like median_prices).
    */
  val corpusStatsBySource: String =
    s"""WITH q AS (SELECT source, round(
       |  0.3 * least(CAST(1.0 AS DOUBLE), toks / 50.0) +
       |  0.2 * (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE),
       |    punct / greatest(CAST(nlen AS DOUBLE), CAST(1.0 AS DOUBLE)) * 5.0)) +
       |  0.2 * least(CAST(1.0 AS DOUBLE),
       |    stops * 10.0 / greatest(toks, CAST(1.0 AS DOUBLE))) +
       |  0.3 * (dst / greatest(toks, CAST(1.0 AS DOUBLE))), 6) AS q,
       |  n_tok
       |FROM (
       |  SELECT source,
       |    CAST(len(t) AS DOUBLE) AS toks,
       |    CAST(len(regexp_extract_all(n, '([^a-z0-9 ])', 1)) AS DOUBLE) AS punct,
       |    CAST(len(regexp_extract_all(n, '\\b$enStops\\b', 1)) AS DOUBLE) AS stops,
       |    CAST(len(list_distinct(t)) AS DOUBLE) AS dst,
       |    length(n) AS nlen,
       |    CAST(len(t) AS BIGINT) AS n_tok
       |  FROM (SELECT source, $norm AS n, $toks AS t FROM documents)))
       |SELECT source, count(*) AS n_docs,
       |  round(CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS avg_quality,
       |  round(quantile_cont(n_tok, 0.5), 6) AS p50_tokens,
       |  round(quantile_cont(n_tok, 0.9), 6) AS p90_tokens,
       |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
       |FROM q GROUP BY 1""".stripMargin

  /** Uniform-target mixture rates (mirrors TextAnalysis.domainMixture):
    * integer token counts, two single double divisions, least before
    * round on both sides.
    */
  def domainMixture(budgetTokens: Long): String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(CAST(len(t) AS BIGINT)) AS BIGINT) AS n_tokens
       |  FROM (SELECT source, $toks AS t FROM documents) GROUP BY source),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
       |        count(*) AS n_sources FROM per)
       |SELECT source, n_docs, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(corpus_tokens AS DOUBLE), 6)
       |    AS corpus_share,
       |  round(least(CAST(1.0 AS DOUBLE), CAST($budgetTokens AS DOUBLE) /
       |    CAST(n_sources * n_tokens AS DOUBLE)), 6) AS sample_rate
       |FROM per CROSS JOIN tot""".stripMargin

  /** Hash-bucketed negative sampling (mirrors TextAnalysis.negativeSamples):
    * identical md5-60bit bucket draws, min-doc_id representatives,
    * self-pairs dropped.
    */
  def negativeSamples(k: Int, nBuckets: Int): String =
    s"""WITH reps AS (
       |  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
       |      AS BIGINT) % $nBuckets AS bucket,
       |    min(doc_id) AS neg_doc_id
       |  FROM documents GROUP BY 1),
       |draws AS (
       |  SELECT doc_id, j,
       |    CAST('0x' || substr(md5(doc_id || ':' || j), 1, 15) AS BIGINT)
       |      % $nBuckets AS bucket
       |  FROM documents CROSS JOIN (SELECT unnest(range(0, $k)) AS j) js)
       |SELECT d.doc_id, d.j, r.neg_doc_id
       |FROM draws d JOIN reps r USING (bucket)
       |WHERE r.neg_doc_id <> d.doc_id""".stripMargin

  val langMarkersSql: Seq[(String, String)] = Seq(
    "en" -> enStops,
    "de" -> "(der|die|das|und|ist|nicht|mit|ein|zu|den)",
    "es" -> "(el|la|que|y|en|un|es|se|no|los)",
    "fr" -> "(le|les|et|des|une|est|dans|pour|qui|sur)")

  val languageId: String = {
    val counts = langMarkersSql.map { case (l, p) =>
      s"len(regexp_extract_all(n, '\\b$p\\b', 1)) AS c_$l"
    }.mkString(",\n    ")
    s"""SELECT doc_id, lang AS lang_declared,
       |  CASE
       |    WHEN n IS NULL THEN NULL
       |    WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
       |    WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
       |    WHEN c_es >= c_fr THEN 'es'
       |    ELSE 'fr' END AS lang_pred
       |FROM (SELECT doc_id, lang, n,
       |    $counts
       |  FROM (SELECT doc_id, lang, $norm AS n FROM documents))""".stripMargin
  }

  /** BPE-ish subword pre-tokenization count (mirrors
    * TextAnalysis.bpeTokenEstimate: letter runs, digit runs, single
    * marks over the normalized text).
    */
  val bpeTokens: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(n, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1))
       |       AS BIGINT) AS n_subwords,
       |  CAST(len(t) AS BIGINT) AS n_words
       |FROM (SELECT doc_id, $norm AS n, $toks AS t FROM documents)""".stripMargin

  /** Winnowing fingerprints (mirrors TextAnalysis.winnowFingerprints):
    * positional k-gram md5-60bit hashes, min per sliding w-window,
    * distinct mins. DuckDB lambda index is 1-based where Spark posexplode
    * is 0-based — the window filter bound shifts by one accordingly.
    */
  def winnowFingerprints(k: Int, w: Int): String =
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) >= $k
       |      THEN list_transform(range(0, len(t)-${k - 1}),
       |             i -> array_to_string(t[i+1:i+$k], ' '))
       |      ELSE [array_to_string(t, ' ')] END AS gl
       |  FROM tk),
       |hashed AS (
       |  SELECT doc_id, u.p['pos'] AS pos,
       |    CAST('0x' || substr(md5(u.p['gram']), 1, 15) AS BIGINT) AS h,
       |    len(gl) AS n_grams
       |  FROM grams,
       |    unnest(list_transform(gl, (g, i) -> {'pos': i, 'gram': g})) AS u(p)),
       |winnowed AS (
       |  SELECT doc_id, pos, n_grams,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS minh
       |  FROM hashed)
       |SELECT DISTINCT doc_id, minh AS fingerprint
       |FROM winnowed WHERE pos <= greatest(n_grams - $w + 1, 1)""".stripMargin

  /** Linear-idf TF-IDF top terms (mirrors TextAnalysis.tfidfTopTerms:
    * raw = tf · (N / (1 + df)), identical double op order, row_number
    * tie-break on term).
    */
  def tfidfTopTerms(topK: Int): String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       |    CAST(tf.tf AS DOUBLE) *
       |      (CAST(n.n_docs AS DOUBLE) / (1.0 + CAST(dfreq.df AS DOUBLE)))
       |      AS raw
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
       |SELECT doc_id, term, tf, df, rank, round(raw, 6) AS score FROM (
       |  SELECT doc_id, term, tf, df, raw,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY raw DESC, term)
       |      AS rank
       |  FROM scored)
       |WHERE rank <= $topK""".stripMargin

  /** Inverted index (mirrors TextAnalysis.invertedIndex): distinct
    * (doc_id, token) postings, exact df per token, sorted posting list
    * joined to a comma string — emitted only when df ≤ maxDf (stop
    * words keep their df with an empty posting string, exactly as the
    * Spark side's fused CappedDocList cap).
    */
  def invertedIndex(maxDf: Int): String =
    s"""WITH tt AS (
       |  SELECT DISTINCT doc_id, unnest($toks) AS term FROM documents)
       |SELECT term, count(*) AS df,
       |  CASE WHEN count(*) <= $maxDf
       |    THEN array_to_string(list_sort(list(doc_id)), ',')
       |    ELSE '' END AS postings
       |FROM tt GROUP BY term""".stripMargin

  /** Deterministic per-language stratified sample (mirrors
    * TextAnalysis.stratifiedSample: salted md5 bucket < per-lang rate).
    * The lang equality predicates are mutually exclusive, so WHEN order
    * cannot change the result; the descending render merely matches the
    * Spark side's foldLeft (outermost-first `when` nesting) so both
    * engines print structurally identical plans.
    */
  def stratifiedSample(rates: Seq[(String, Int)], defaultPct: Int): String = {
    val whens = rates.sortBy(_._1).reverse
      .map { case (l, p) => s"WHEN lang = '$l' THEN $p" }.mkString(" ")
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE CAST('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)
       |        AS BIGINT) % 100
       |  < CASE $whens ELSE $defaultPct END""".stripMargin
  }

  /** PII scrubbing (mirrors TextAnalysis.scrubPii: same three patterns in
    * the same order; '(?i)' and the char classes behave identically under
    * Java regex and RE2; 'g' ≡ Spark's replace-all default).
    */
  val piiScrub: String =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
      |    '\+?[0-9][0-9() -]{6,}[0-9]', '<phone>', 'g'),
      |    '[0-9]{4,}', '<id>', 'g') AS scrubbed
      |FROM documents""".stripMargin

  val fingerprint: String =
    s"""SELECT doc_id, md5($norm) AS fingerprint,
       |  substr(md5($norm), 1, 8) AS bucket8
       |FROM documents""".stripMargin

  val exactDuplicates: String =
    s"""SELECT md5($norm) AS fingerprint, min(doc_id) AS rep_doc_id,
       |  count(*) AS n_copies
       |FROM documents GROUP BY 1""".stripMargin

  /** Benchmark decontamination (mirrors Dedup.contaminationPairs with the
    * doc_id % `benchMod` == 0 benchmark split): distinct-3-gram overlap
    * counts over the same 60-bit hashed shingle domain, thresholded at
    * `minOverlap`. The Spark side filters docs BEFORE shingling and this
    * filters rows after — identical results, since shingling is per-doc.
    */
  def contamination(benchMod: Long, minOverlap: Long): String =
    s"""WITH sh AS ($shingleTable),
       |b AS (SELECT doc_id AS bench_doc_id, shash FROM sh
       |      WHERE doc_id % $benchMod = 0),
       |d AS (SELECT doc_id, shash FROM sh WHERE doc_id % $benchMod != 0)
       |SELECT doc_id, bench_doc_id, count(*) AS n_overlap
       |FROM d JOIN b USING (shash)
       |GROUP BY 1, 2 HAVING count(*) >= $minOverlap""".stripMargin

  /** Repetition signals (mirrors TextAnalysis.repetitionStats): positional
    * 2-/3-gram duplicate fractions. DuckDB list lambdas index 1-based
    * (t[i+1:i+2] over range(0, len-1) ≡ Spark's slice(w, i+1, 2) over
    * sequence(0, size-2)).
    */
  val repetitionStats: String =
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (SELECT doc_id,
       |  CASE WHEN len(t) >= 2
       |    THEN list_transform(range(0, len(t)-1),
       |           i -> array_to_string(t[i+1:i+2], ' '))
       |    ELSE [] END AS g2,
       |  CASE WHEN len(t) >= 3
       |    THEN list_transform(range(0, len(t)-2),
       |           i -> array_to_string(t[i+1:i+3], ' '))
       |    ELSE [] END AS g3
       |FROM t)
       |SELECT doc_id,
       |  CAST(len(g2) AS BIGINT) AS n_2grams,
       |  CASE WHEN len(g2) = 0 THEN 0.0
       |    ELSE round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
       |      / CAST(len(g2) AS DOUBLE), 6) END AS dup2_frac,
       |  CAST(len(g3) AS BIGINT) AS n_3grams,
       |  CASE WHEN len(g3) = 0 THEN 0.0
       |    ELSE round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
       |      / CAST(len(g3) AS DOUBLE), 6) END AS dup3_frac
       |FROM g""".stripMargin

  /** Reference-LM bigram coverage (mirrors TextAnalysis.lmCoverage):
    * positional bigrams hashed to the 60-bit md5 domain, reference table
    * floored at `minCount`, per-doc occurrence coverage with one final
    * double division. LEFT JOIN UNNEST keeps zero-bigram docs (Spark's
    * explode_outer) with coverage 0.
    */
  def lmCoverage(minCount: Long): String =
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |g AS (SELECT doc_id,
       |  CASE WHEN len(t) >= 2
       |    THEN list_transform(range(0, len(t)-1),
       |           i -> array_to_string(t[i+1:i+2], ' '))
       |    ELSE [] END AS gl
       |FROM t),
       |bg AS (SELECT doc_id,
       |  CAST('0x' || substr(md5(u.b), 1, 15) AS BIGINT) AS bkey
       |FROM g LEFT JOIN unnest(g.gl) AS u(b) ON true),
       |lm AS (SELECT bkey FROM bg WHERE bkey IS NOT NULL
       |       GROUP BY bkey HAVING count(*) >= $minCount)
       |SELECT doc_id,
       |  count(bg.bkey) AS n_bigrams,
       |  CAST(sum(CASE WHEN lm.bkey IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS known_bigrams,
       |  CASE WHEN count(bg.bkey) = 0 THEN 0.0
       |    ELSE round(CAST(sum(CASE WHEN lm.bkey IS NOT NULL THEN 1 ELSE 0
       |      END) AS DOUBLE) / CAST(count(bg.bkey) AS DOUBLE), 6)
       |  END AS lm_coverage
       |FROM bg LEFT JOIN lm ON bg.bkey = lm.bkey
       |GROUP BY doc_id""".stripMargin

  /** Bigram collocations by lift (mirrors TextAnalysis.bigramCollocations):
    * positional bigrams, unigram/bigram/N counts, lift as the identical
    * double expression, deterministic (lift DESC, term_a, term_b) top-k.
    */
  def bigramCollocations(minCount: Long, topK: Int): String =
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |bg AS (SELECT unnest(CASE WHEN len(t) >= 2
       |    THEN list_transform(range(0, len(t)-1),
       |           i -> array_to_string(t[i+1:i+2], ' '))
       |    ELSE [] END) AS bigram FROM t),
       |uni AS (SELECT unnest(t) AS term FROM t),
       |cu AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
       |cb AS (SELECT string_split(bigram, ' ')[1] AS term_a,
       |    string_split(bigram, ' ')[2] AS term_b, count(*) AS c_ab
       |  FROM bg GROUP BY bigram HAVING count(*) >= $minCount),
       |n AS (SELECT count(*) AS n_bigrams FROM bg)
       |SELECT term_a, term_b, c_ab,
       |  round(CAST(n_bigrams AS DOUBLE) * CAST(c_ab AS DOUBLE)
       |    / (CAST(ca.c AS DOUBLE) * CAST(cbb.c AS DOUBLE)), 6) AS lift
       |FROM cb CROSS JOIN n
       |JOIN cu ca ON ca.term = cb.term_a
       |JOIN cu cbb ON cbb.term = cb.term_b
       |ORDER BY lift DESC, term_a, term_b LIMIT $topK""".stripMargin

  /** Sequence packing (mirrors TextAnalysis.packSequences): salted-md5
    * shard, per-(lang, shard) running token sum in doc_id order, chunk id
    * by integer division. DuckDB window sums of BIGINT yield HUGEINT —
    * cast back before the division and the final sum.
    */
  def packSequences(budgetTokens: Long, nShards: Int): String =
    s"""WITH t AS (SELECT doc_id, lang,
       |  CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)
       |    AS BIGINT) % $nShards AS shard,
       |  CAST(len($toks) AS BIGINT) AS n_tokens
       |FROM documents),
       |c AS (SELECT *, CAST(sum(n_tokens) OVER (
       |    PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |FROM t)
       |SELECT lang, shard, (cum - n_tokens) // $budgetTokens AS seq_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM c GROUP BY 1, 2, 3""".stripMargin

  /** Strict-ordering conversion funnel (mirrors TimeSeriesOps.funnel).
    * The Spark side chains b_i = coalesce(b_{i-1} AND t_i > t_{i-1},
    * false); the SQL expands the chain to one conjunction per step —
    * identical under 3-valued logic (FALSE dominates AND, COALESCE maps
    * the all-null tail to FALSE).
    */
  def funnel(steps: Seq[String]): String = {
    val mins = steps.zipWithIndex.map { case (s, i) =>
      s"min(CASE WHEN event_type = '$s' THEN ts END) AS t$i"
    }.mkString(",\n    ")
    val inList = steps.map(s => s"'$s'").mkString(", ")
    def conj(i: Int): String =
      (Seq("t0 IS NOT NULL") ++
        (1 to i).map(j => s"t$j > t${j - 1}")).mkString(" AND ")
    val flags = steps.indices.map(i =>
      s"COALESCE(${conj(i)}, FALSE) AS b$i").mkString(",\n    ")
    val counts = steps.indices.map(i =>
      s"CAST(sum(CASE WHEN b$i THEN 1 ELSE 0 END) AS BIGINT) AS n$i")
      .mkString(",\n    ")
    val rows = steps.zipWithIndex.map { case (s, i) =>
      s"SELECT '$s' AS step, $i AS step_idx, n$i AS n_users FROM c"
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (SELECT user_id,
       |    $mins
       |  FROM events WHERE event_type IN ($inList) GROUP BY 1),
       |b AS (SELECT
       |    $flags
       |  FROM f),
       |c AS (SELECT
       |    $counts
       |  FROM b)
       |$rows""".stripMargin
  }

  /** Exact duplicated-substring spans (mirrors Dedup.duplicateSpans):
    * positions whose k-token shingle repeats ≥ minDf corpus-wide,
    * merged into maximal spans by gaps-and-islands (lag flag + running
    * sum, split across CTEs — window calls cannot nest).
    */
  def duplicateSpans(k: Int, minDf: Long): String =
    s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_transform(range(0, len(t) - $k + 1),
       |    i -> {'pos': i, 'shash': CAST('0x' ||
       |      substr(md5(array_to_string(t[i+1:i+$k], ' ')), 1, 15)
       |      AS BIGINT)}), recursive := true)
       |  FROM tok WHERE len(t) >= $k),
       |hot AS (SELECT shash FROM sh GROUP BY shash
       |        HAVING count(*) >= $minDf),
       |dup AS (SELECT s.doc_id, s.pos FROM sh s SEMI JOIN hot USING (shash)),
       |flg AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |      <= $k THEN 0 ELSE 1 END AS new_island
       |  FROM dup),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM flg)
       |SELECT doc_id, min(pos) AS start_tok, max(pos) + $k - 1 AS end_tok,
       |  max(pos) + $k - min(pos) AS span_tokens
       |FROM isl GROUP BY doc_id, island""".stripMargin

  /** Deterministic epoch shuffle (mirrors TextAnalysis.epochShuffle):
    * md5(epoch ':' doc_id) sort keys, 60-bit-prefix shard assignment,
    * row_number within (epoch, shard).
    */
  def epochShuffle(epochs: Int, nShards: Int): String =
    s"""WITH e AS (SELECT doc_id, unnest(range(0, $epochs)) AS epoch
       |           FROM documents),
       |keyed AS (
       |  SELECT epoch, doc_id,
       |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
       |      AS skey
       |  FROM e),
       |sharded AS (
       |  SELECT epoch, doc_id, skey,
       |    CAST('0x' || substr(skey, 1, 15) AS BIGINT) % $nShards AS shard
       |  FROM keyed)
       |SELECT epoch, shard,
       |  row_number() OVER (PARTITION BY epoch, shard
       |    ORDER BY skey, doc_id) AS pos,
       |  doc_id
       |FROM sharded""".stripMargin

  /** Vocabulary build + id encoding (mirrors TextAnalysis.vocabEncode):
    * dense ids by (count DESC, token) over tokens with count ≥ minCount,
    * docs re-encoded as position-ordered id strings, OOV → 0.
    */
  def vocabEncode(minCount: Long): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_transform(range(0, len(t)),
       |    i -> {'pos': i, 'tok': t[i+1]}), recursive := true)
       |  FROM (SELECT doc_id, $toks AS t FROM documents)),
       |vocab AS (
       |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS tok_id
       |  FROM (SELECT tok, count(*) AS cnt FROM toks
       |        GROUP BY tok HAVING count(*) >= $minCount)),
       |enc AS (
       |  SELECT t.doc_id, t.pos, coalesce(v.tok_id, 0) AS tid
       |  FROM toks t LEFT JOIN vocab v USING (tok))
       |SELECT d.doc_id, count(e.tid) AS n_tokens,
       |  CAST(coalesce(sum(CASE WHEN e.tid = 0 THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_unk,
       |  coalesce(string_agg(CAST(e.tid AS VARCHAR), ' ' ORDER BY e.pos),
       |    '') AS ids
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |  LEFT JOIN enc e USING (doc_id)
       |GROUP BY d.doc_id""".stripMargin

  /** TRY_CAST, not CAST: Spark's non-ANSI string→long cast yields NULL
    * on a non-integral payload ("12.5", "abc") while DuckDB's strict
    * CAST would abort the whole oracle query — TRY_CAST mirrors the
    * Spark semantics exactly.
    */
  val eventsPropsJson: String =
    """SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k,
      |  count(k) AS n_with_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** BM25 top-k (mirrors TextAnalysis.bm25TopK): identical log-free
    * rational-idf formula in BIGINT floor division (`//` ≡ Spark `div`),
    * per-doc scores summed as exact INT64s — bit-identical on both
    * engines by construction, no float tolerance anywhere.
    */
  def bm25TopK(queries: Seq[(String, Seq[String])], topK: Int): String = {
    val values = queries
      .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }
      .mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $values),
       |ex AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS len,
       |         unnest(t) AS term
       |       FROM (SELECT doc_id, $toks AS t FROM documents)),
       |corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CAST(len(t) AS BIGINT)) AS BIGINT) AS total_len
       |  FROM (SELECT $toks AS t FROM documents)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       |    max(len) AS len
       |  FROM ex WHERE term IN (SELECT term FROM q)
       |  GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |       FROM tf GROUP BY term),
       |scored AS (SELECT q.query_id, tf.doc_id,
       |    ((2*n_docs - 2*df + 1) * 22 * tf * (total_len // n_docs)
       |      * 1000000)
       |    // ((2*df + 1) * (10*tf*(total_len // n_docs)
       |      + 3*(total_len // n_docs) + 9*len)) AS s
       |  FROM tf JOIN df USING (term) JOIN q USING (term)
       |  CROSS JOIN corpus),
       |agg AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT)
       |    AS score_micros
       |  FROM scored GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_micros DESC, doc_id) AS INT) AS rank,
       |  score_micros
       |FROM agg
       |QUALIFY rank <= $topK""".stripMargin
  }

  /** Hybrid retrieval (mirrors Similarity.hybridRetrieval): the BM25 and
    * ANN oracles verbatim as CTEs, fused by fixed-point reciprocal rank
    * — BIGINT floor terms `1000000 // (rrfK + rank)`, ties to the
    * smaller doc id.
    */
  def hybridRetrieval(terms: Seq[String], kEach: Int, k: Int,
      rrfK: Int): String =
    s"""WITH lexall AS (${bm25TopK(Seq("q0" -> terms), kEach)}),
       |semall AS (${annTopK(1, kEach)}),
       |fused AS (
       |  SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
       |    l.rank AS lex_rank, s.rank AS sem_rank,
       |    coalesce(CAST(1000000 AS BIGINT) // ($rrfK + l.rank),
       |      CAST(0 AS BIGINT)) +
       |    coalesce(CAST(1000000 AS BIGINT) // ($rrfK + s.rank),
       |      CAST(0 AS BIGINT)) AS rrf_micros
       |  FROM lexall l FULL OUTER JOIN semall s ON s.vec_id = l.doc_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf_micros,
       |  CAST(row_number() OVER (ORDER BY rrf_micros DESC, doc_id)
       |    AS INT) AS rank
       |FROM fused QUALIFY rank <= $k""".stripMargin

  /** Triangle count (mirrors GraphOps.triangleCount): same co-purchase
    * edge set; plain id-orientation instead of the Spark side's
    * degree-orientation — the triangle TOTAL is orientation-invariant
    * (each triangle is counted exactly once at its minimal vertex), so
    * the counts must agree exactly.
    */
  val triangleCount: String =
    """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
      |            FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.p < b.p),
      |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
      |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      |  CAST(count(*) AS BIGINT) AS n_triangles
      |FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin

  /** SemDeDup semantic dedup (mirrors Similarity.semanticDedup): the
    * [[kmeansAssign]] cell-assignment CTEs verbatim, then intra-cell
    * pair generation (one-sided), exact-decimal cosine at the rounded
    * threshold, and a keep flag = "no lower-id near-dup in my cell"
    * encoded as BIGINT 0/1.
    */
  def semanticDedup(minSim: Double): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |x AS (SELECT label, unnest(range(0, len(v))) AS pos, unnest(v) AS val
       |      FROM e),
       |cent AS (SELECT label AS c_label, pos,
       |    round(CAST(sum(CAST(val AS DECIMAL(28,18))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS centroid
       |  FROM x GROUP BY 1, 2),
       |cvecs AS (SELECT c_label, list(centroid ORDER BY pos) AS cvec
       |          FROM cent GROUP BY 1),
       |scored AS (SELECT vec_id, c_label, ${cosineOrZero("v", "cvec")} AS sim
       |           FROM e CROSS JOIN cvecs),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, c_label AS cell,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY sim DESC, c_label) AS rn
       |    FROM scored)
       |  WHERE rn = 1),
       |cv AS (SELECT e.vec_id, asg.cell, e.v FROM e JOIN asg USING (vec_id)),
       |dropped AS (SELECT DISTINCT b.vec_id
       |  FROM cv a JOIN cv b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${normSq("a.v")} > 0 AND ${normSq("b.v")} > 0
       |    AND round(${cosine("a.v", "b.v")}, 6) >= $minSim)
       |SELECT cv.vec_id, cv.cell,
       |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM cv LEFT JOIN dropped d ON cv.vec_id = d.vec_id""".stripMargin

  /** Sliding-window chunking (mirrors TextAnalysis.chunkDocuments):
    * start positions every `size − overlap` tokens via range(0, n,
    * stride), chunk = 1-based clamped list slice joined with spaces; a
    * trailing start within the previous chunk's overlap region is
    * dropped (its chunk would be fully contained in the previous one).
    */
  def chunkDocuments(size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH t AS (SELECT doc_id, $toks AS t FROM documents),
       |s AS (SELECT doc_id, t, unnest(range(0, len(t), $stride)) AS start
       |      FROM t WHERE len(t) > 0)
       |SELECT doc_id,
       |  CAST(start // $stride AS BIGINT) AS chunk_idx,
       |  CAST(start AS BIGINT) AS start_token,
       |  CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(ct, ' ') AS chunk_text
       |FROM (SELECT doc_id, start, t[start+1:start+$size] AS ct FROM s
       |      WHERE start = 0 OR len(t) - start > $overlap)""".stripMargin
  }

  /** DSIR-lite importance weights (mirrors TextAnalysis.dsirWeights):
    * positional bigrams hashed to `nBuckets` md5-60bit buckets, add-one
    * smoothed target/source bucket counts, per-occurrence ratio in
    * fixed-point micros via `//` (≡ Spark `div`), per-doc int64 mean.
    * LEFT JOIN UNNEST keeps zero-bigram docs at weight 0 (the
    * lmCoverage convention).
    */
  def dsirWeights(targetLang: String, nBuckets: Int): String =
    s"""WITH t AS (SELECT doc_id, lang, $toks AS t FROM documents),
       |g AS (SELECT doc_id, lang,
       |  CASE WHEN len(t) >= 2
       |    THEN list_transform(range(0, len(t)-1),
       |           i -> array_to_string(t[i+1:i+2], ' '))
       |    ELSE [] END AS gl
       |FROM t),
       |bg AS (SELECT doc_id, lang,
       |  CAST('0x' || substr(md5(u.b), 1, 15) AS BIGINT) % $nBuckets AS bucket
       |FROM g LEFT JOIN unnest(g.gl) AS u(b) ON true),
       |src AS (SELECT bucket, count(*) AS sc FROM bg
       |        WHERE bucket IS NOT NULL GROUP BY 1),
       |tgt AS (SELECT bucket, count(*) AS tc FROM bg
       |        WHERE bucket IS NOT NULL AND lang = '$targetLang' GROUP BY 1),
       |rates AS (SELECT src.bucket,
       |    ((coalesce(tc, 0) + 1) * 1000000) // (sc + 1) AS r_micros
       |  FROM src LEFT JOIN tgt ON src.bucket = tgt.bucket)
       |SELECT doc_id,
       |  count(bg.bucket) AS n_bigrams,
       |  CAST(CASE WHEN count(bg.bucket) = 0 THEN 0
       |    ELSE sum(r_micros) // count(bg.bucket) END AS BIGINT)
       |    AS weight_micros
       |FROM bg LEFT JOIN rates ON bg.bucket = rates.bucket
       |GROUP BY doc_id""".stripMargin

  /** Int8 min-max quantization (mirrors Similarity.quantizeEmbeddings):
    * the same three IEEE double ops per component in the same order, so
    * codes and scales are bit-identical; codes as a space-joined string.
    */
  val embeddingQuantize: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |m AS (SELECT vec_id, v,
      |        list_min(v) AS vmin, list_max(v) AS vmax FROM e)
      |SELECT vec_id, vmin AS zero_point, (vmax - vmin) / 255 AS scale,
      |  array_to_string(list_transform(v, x ->
      |    CAST(CAST(CASE WHEN vmax = vmin THEN 0
      |      ELSE least(255, greatest(0,
      |        CAST(floor((x - vmin) * 255 / (vmax - vmin)) AS BIGINT)))
      |      END AS BIGINT) AS VARCHAR)), ' ') AS codes
      |FROM m""".stripMargin
}
