package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design: every variant is one bounded shuffle. Exact dedup shuffles
  * on the business key (the window partition key); MinHash-LSH shuffles on
  * (band, signature) buckets so candidate generation never goes quadratic in
  * the corpus — only within a bucket; SimHash pairs are bounded to
  * (lang, source) buckets. No driver-side collection anywhere.
  *
  * Hashes are md5 (identical lowercase hex in Spark and DuckDB), and
  * "minimum" is the lexicographic min over hex strings — statistically
  * equivalent to min over ints, and portable across engines.
  */
object Dedup {

  /** X-DED1 — exact dedup with a deterministic survivor: newest event per
    * (user_id, event_type), ties broken by event_id. The
    * row_number-over-window form (not dropDuplicates) pins WHICH duplicate
    * survives — dropDuplicates keeps an arbitrary first-seen row, which is
    * nondeterministic under shuffle.
    */
  private val ded1 = Probe(
    "x_ded1_exact_dedup",
    """SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "event_type")
  }

  /** X-DED1b — exact content dedup on documents: hash-groupBy on the text
    * fingerprint, deterministic survivor = smallest doc_id; per-survivor
    * duplicate count. One shuffle on the content hash.
    */
  private val ded1b = Probe(
    "x_ded1b_exact_docs",
    """SELECT md5(text) AS content_fp, MIN(doc_id) AS survivor_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY md5(text)
      |ORDER BY survivor_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy(md5(col("text")).as("content_fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .orderBy("survivor_id")
  }

  /** X-DED2 — MinHash + LSH near-dup candidates over 3-word shingles.
    *
    * 8 hash functions = min(md5(seed|shingle)); 2 bands of 4 → candidate
    * pair iff a full band matches (Jaccard^4 collision prob per band). The
    * expensive join is on (band, signature) — the classic LSH bucket join
    * that scales linearly in corpus size for a fixed near-dup density.
    */
  /** Shared MinHash-LSH band generation: (doc_id, band, sig) with 8 md5
    * min-hashes over 3-word shingles in 2 bands of 4. Both the checked
    * x_ded2 probe and api.Corpus.dedupNearMinHash consume this.
    */
  def minhashBands(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val words = docs
      .select(col("doc_id"), graft.clean.CleanFns.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
    // NO shingle-level distinct: min() is idempotent over duplicates, so
    // deduplicating first would only add a full shuffle of every shingle
    // string — the most voluminous shuffle this pipeline could have. The
    // min-aggregate's map-side partial combine reduces each partition to
    // (doc, 8 mins) before anything moves.
    val shingles = words
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))""".stripMargin))
        .as("s"))
    // 8 min-hash aggregates as sibling columns over one row per shingle —
    // no x8 explode, ONE aggregation instead of a (doc,h)-keyed shuffle.
    val mins = (0 to 7).map(h =>
      min(md5(concat(lit(s"$h|"), col("s")))).as(s"mh$h"))
    val sig = shingles.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    // band signature compressed to md5 of the concatenated min-hashes (the
    // oracle compresses identically): the LSH bucket join shuffles 32-char
    // keys instead of ~140-char concats
    sig.select(col("doc_id"),
      explode(array(
        struct(lit(0L).as("band"),
          md5(concat_ws("|", (0 to 3).map(h => concat(lit(s"$h:"), col(s"mh$h"))): _*)).as("sig")),
        struct(lit(1L).as("band"),
          md5(concat_ws("|", (4 to 7).map(h => concat(lit(s"$h:"), col(s"mh$h"))): _*)).as("sig"))))
        .as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Native-expression variant of [[minhashBands]]: identical signatures
    * (MinHashNativeSpec pins them equal), generated per row with ZERO
    * exchanges. The production `api.Corpus` chain consumes this form; the
    * declarative form above remains the oracle-checked reference shape.
    */
  def minhashBandsNative(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        posexplode(graft.functions.MinHashBands.minhash_bands(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("sig"))
  }

  /** Shared DuckDB band-generation CTE (w → sh → hx → bd): the oracle-side
    * mirror of [[minhashBands]], tokenized through `CleanFns.tokensDuck` —
    * one definition for the four probes (x_ded2/2b/7/9) that consume it.
    */
  private def bandCteSql(recursive: Boolean): String = bandCteSql(recursive, "text")

  private def bandCteSql(recursive: Boolean, textExpr: String): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    val toks = graft.clean.CleanFns.tokensDuck(textExpr)
    s"""$kw w AS (
       |  SELECT doc_id, $toks AS ws FROM documents
       |  WHERE len($toks) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
       |hx AS (
       |  SELECT doc_id, h, MIN(md5(h || '|' || s)) AS mh
       |  FROM sh, UNNEST([0,1,2,3,4,5,6,7]) AS u(h)
       |  GROUP BY doc_id, h),
       |bd AS (
       |  SELECT doc_id, h // 4 AS band,
       |         md5(string_agg(h || ':' || mh, '|' ORDER BY h)) AS sig
       |  FROM hx GROUP BY doc_id, h // 4)""".stripMargin
  }

  /** The x_ded2 pair query over the shared band CTE — x_ded2b runs the
    * identical oracle (the native expression must reproduce it exactly).
    */
  private def lshPairsOracleSql: String =
    s"""${bandCteSql(recursive = false)}
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_bands
       |FROM bd a JOIN bd b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |ORDER BY a_id, b_id""".stripMargin

  private val ded2 = Probe(
    "x_ded2_minhash_lsh",
    lshPairsOracleSql) { (s, dir) =>
    // lazy on purpose (round 7): the minhash aggregation sits below the
    // band self-join's two IDENTICAL exchanges, which collapse to one
    // ReusedExchange — it executes once with no block-manager round-trip
    // and nothing can leak. At 100 TB this is where a checkpoint to
    // parquet would slot in between pipeline stages.
    val bands = minhashBands(Tables(s, dir, "documents"))
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, a("band") === b("band_b") && a("sig") === b("sig_b") && a("a_id") < b("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
      .orderBy("a_id", "b_id")
  }

  /** X-DED2b — MinHash LSH via the NATIVE `minhash_bands` expression
    * (`functions/MinHashBands.scala`, doGenCode): both band signatures
    * are emitted per row inside the scan's codegen loop, replacing the
    * shingle explode + 8-sibling-min aggregation (a corpus-keyed shuffle)
    * with ZERO exchanges before the band-bucket join. Same exact oracle
    * as x_ded2; MinHashNativeSpec pins expression ≡ minhashBands.
    */
  private val ded2b = Probe(
    "x_ded2b_minhash_native",
    lshPairsOracleSql) { (s, dir) =>
    graft.GraftExtensions.register(s)
    // narrow signature generation: no persist needed — each join side
    // recomputes a scan-local projection, no shuffle either way
    def bands = Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.MinHashBands.minhash_bands(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("sig"))
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, a("band") === b("band_b") && a("sig") === b("sig_b") && a("a_id") < b("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
      .orderBy("a_id", "b_id")
  }

  /** X-DED3 — 32-bit SimHash over each document's distinct-word set.
    *
    * Bit j of the fingerprint is the sign of the vote sum over words: +1 if
    * hex digit j of md5(word) has its high bit set, else −1. Near-dup count
    * per doc = same-(lang,source)-bucket neighbors within Hamming ≤ 2 —
    * the bucket bound keeps the pair space linear-ish at scale (at 100 TB
    * the bucketing key becomes an LSH band over simhash prefixes).
    */
  /** Shared 32-bit SimHash signature: (doc_id, lang, source, simhash).
    *
    * Bit j of the fingerprint is the sign of the vote sum over the doc's
    * distinct words: +1 if hex digit j of md5(word) has its high bit set,
    * else −1 (ties → 0 → bit clear). Computed integer-only: the 32 hex
    * digits become four 32-bit conv() chunks, and each vote sum is
    * sum((chunk >> k) & 1) — no per-digit substr/string-compare in the
    * aggregate loop (measured ~1.9× faster than the substr form at sf0.1).
    * v_j = 2*s_j − n, so bit j is set iff 2*s_j > n.
    */
  def simhashSig(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dw = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(graft.clean.CleanFns.tokens(col("text"))).as("w"))
      .distinct()
      .withColumn("m", md5(col("w")))
    val chunks = (0 to 3).map(c =>
      expr(s"cast(conv(substr(m, ${c * 8 + 1}, 8), 16, 10) as bigint)").as(s"c$c"))
    val dw2 = dw.select(Seq(col("doc_id"), col("lang"), col("source")) ++ chunks: _*)
    val aggs = count(lit(1)).as("n") +: (1 to 32).map { j =>
      val c = (j - 1) / 8              // chunk holding hex digit j
      val pos = (j - 1) % 8            // digit offset inside the chunk
      val shift = 4 * (7 - pos) + 3    // high bit of that hex digit
      sum(expr(s"shiftright(c$c, $shift) & 1")).as(s"s$j")
    }
    dw2.groupBy("doc_id", "lang", "source")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("simhash",
        (1 to 32).map(j => when(col(s"s$j") * 2 > col("n"), lit(1L << (j - 1))).otherwise(0L))
          .reduce(_ + _))
      .select(col("doc_id"), col("lang"), col("source"), col("simhash"))
  }

  /** DuckDB oracle shared by x_ded3 (exact pair join) and x_ded3b (banded
    * candidate generation) — both must produce the identical exact answer.
    */
  private val simhashOracleSql =
    s"""WITH dw AS (
      |  SELECT DISTINCT doc_id, lang, source, w
      |  FROM (SELECT doc_id, lang, source, unnest(${graft.clean.CleanFns.tokensDuck("text")}) AS w FROM documents)),
      |bits AS (
      |  SELECT doc_id, lang, source, j,
      |    SUM(CASE WHEN substr(md5(w), j, 1) IN ('8','9','a','b','c','d','e','f')
      |             THEN 1 ELSE -1 END) AS vote
      |  FROM dw, UNNEST(generate_series(1, 32)) AS t(j)
      |  GROUP BY doc_id, lang, source, j),
      |sig AS (
      |  SELECT doc_id, lang, source,
      |    CAST(SUM(CASE WHEN vote > 0 THEN power(2, j - 1) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc_id, lang, source)
      |SELECT a.doc_id, a.simhash,
      |  CAST(COUNT(b.doc_id) AS BIGINT) AS n_near
      |FROM sig a LEFT JOIN sig b
      |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
      | AND bit_count(xor(a.simhash, b.simhash)) <= 2
      |GROUP BY a.doc_id, a.simhash
      |ORDER BY a.doc_id""".stripMargin

  private val ded3 = Probe(
    "x_ded3_simhash",
    simhashOracleSql) { (s, dir) =>
    // One row per distinct (doc, word), md5 computed once, integer-only
    // vote sums (simhashSig; the DuckDB oracle keeps the exploded substr
    // formulation — results are identical).
    // computed once anyway: both self-join sides end in identical
    // exchanges -> ReusedExchange (round 7; no cache, no leak)
    val sig = simhashSig(Tables(s, dir, "documents"))
    val a = sig.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
      col("source").as("a_src"), col("simhash").as("a_sh"))
    val b = sig.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("source").as("b_src"), col("simhash").as("b_sh"))
    a.join(b,
        a("a_lang") === b("b_lang") && a("a_src") === b("b_src") &&
        a("a_id") =!= b("b_id") &&
        expr("bit_count(a_sh ^ b_sh) <= 2"), "left")
      .groupBy(col("a_id").as("doc_id"), col("a_sh").as("simhash"))
      .agg(count(col("b_id")).as("n_near"))
      .orderBy("doc_id")
  }

  /** X-DED3b — SimHash near-dup via BANDED candidate generation: the
    * 100 TB-shape variant of x_ded3, verified against the same exact
    * oracle.
    *
    * The 32-bit fingerprint splits into 3 bands (11 + 11 + 10 bits). By
    * pigeonhole, any pair within Hamming distance 2 differs in at most 2
    * bands, so it MUST agree on at least one full band — banding is
    * recall-lossless for the ≤2 threshold. Candidate pairs come from an
    * equi-join on (lang, source, band_idx, band_value) — linear in corpus
    * size for fixed near-dup density — then the exact bit_count filter and
    * a pair-level distinct (a pair can collide in several bands). x_ded3's
    * quadratic within-bucket pair join never happens.
    */
  /** 3-band pigeonhole split (11+11+10 bits) of a (doc_id, sh) simhash
    * frame → (doc_id, sh, bi, bv). By pigeonhole any pair within Hamming
    * distance 2 agrees on at least one full band, so an equi-join on
    * (bi, bv) is recall-lossless for the ≤2 threshold. Shared by
    * `Corpus.dedupNearSimHash` (both self-join sides) and
    * `DocStreams.nearDupSimHashIds` (stream side + static index side) so
    * the band layout cannot drift between batch and streaming.
    */
  def simhash3Bands(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sig.select(col("doc_id"), col("sh"),
        explode(array(
          struct(lit(0).as("bi"), expr("sh & 2047").as("bv")),
          struct(lit(1).as("bi"), expr("shiftright(sh, 11) & 2047").as("bv")),
          struct(lit(2).as("bi"), expr("shiftright(sh, 22) & 1023").as("bv")))).as("b"))
      .select(col("doc_id"), col("sh"), col("b.bi").as("bi"), col("b.bv").as("bv"))

  /** Banded near-neighbor counting over a (doc_id, lang, source, simhash)
    * signature frame; exact for Hamming ≤ 2 (see x_ded3b doc). Callers
    * should persist `sig` — it feeds both join sides plus the final
    * zero-fill join.
    */
  def simhashBandedCounts(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bands = sig.select(col("doc_id"), col("lang"), col("source"), col("simhash"),
        explode(array(
          struct(lit(0).as("bi"), expr("simhash & 2047").as("bv")),
          struct(lit(1).as("bi"), expr("shiftright(simhash, 11) & 2047").as("bv")),
          struct(lit(2).as("bi"), expr("shiftright(simhash, 22)").as("bv")))).as("b"))
      .select(col("doc_id"), col("lang"), col("source"), col("simhash"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = bands.select(col("doc_id").as("a_id"), col("lang"), col("source"),
      col("simhash").as("a_sh"), col("bi"), col("bv"))
    val b = bands.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
      col("source").as("source_b"), col("simhash").as("b_sh"),
      col("bi").as("bi_b"), col("bv").as("bv_b"))
    val pairs = a.join(b,
        a("lang") === b("lang_b") && a("source") === b("source_b") &&
        a("bi") === b("bi_b") && a("bv") === b("bv_b") &&
        a("a_id") =!= b("b_id") &&
        expr("bit_count(a_sh ^ b_sh) <= 2"))
      .select("a_id", "b_id").distinct()
    val cnt = pairs.groupBy("a_id").agg(count(lit(1)).as("nn"))
    sig.join(cnt, sig("doc_id") === cnt("a_id"), "left")
      .select(col("doc_id"), col("simhash"), coalesce(col("nn"), lit(0L)).as("n_near"))
      .orderBy("doc_id")
  }

  private val ded3b = Probe(
    "x_ded3b_simhash_banded",
    simhashOracleSql) { (s, dir) =>
    // lazy on purpose (round 7, the x_ded13 lesson): the band self-join's
    // identical subtrees collapse to one ReusedExchange, and the one
    // extra narrow signature recompute on the count-join side is cheaper
    // than a block-manager round-trip — and nothing can leak
    simhashBandedCounts(simhashSig(Tables(s, dir, "documents")))
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation (the Pregel/GraphX pattern: each round every
    * vertex takes the min of its own label and its neighbors'; monotone
    * decreasing, fixpoint = the component's min id). Rounds needed = the
    * largest component DIAMETER — near-dup clusters are shallow (dup
    * groups, not social graphs), so this is 2–4 rounds in practice; each
    * round is one keyed join + aggregate, nothing quadratic. The
    * driver-side loop is control flow only (a convergence count per
    * round), never data.
    *
    * Input: (a, b) distinct pairs. Output: (doc_id, comp_id, n_reach) for
    * every vertex appearing in a pair, where comp_id = min doc_id of the
    * component and n_reach = component size.
    */
  /** @param checkpointEvery truncate lineage every N rounds (0 = never).
    *   Each round chains a join+agg onto the previous round's plan; persist
    *   keeps the DATA hot but the LINEAGE still grows, so on a long-running
    *   cluster one executor loss late in the loop recomputes the whole
    *   chain. With checkpointing, recovery is bounded to N rounds. Uses the
    *   reliable `Dataset.checkpoint()` when `sparkContext.setCheckpointDir`
    *   has been called (survives executor loss — the 100 TB setting),
    *   otherwise `localCheckpoint()` (truncates lineage only). Checkpointed
    *   rounds replace the cache, so converged runs leave no persisted RDD
    *   behind except in the reliable case the edge table (unpersisted on
    *   exit) — `getPersistentRDDs` drains back to empty.
    */
  /** Re-root a MATERIALIZED (persisted + computed) frame's logical plan to
    * its own RDD: the data still reads from cache and the RDD keeps full
    * lineage (executor-loss recompute works), but the SQL plan becomes a
    * leaf. Without this, every propagation round's plan EMBEDS the entire
    * upstream pipeline (for `dedupNearVerified`: band self-join → window →
    * bigram verification) plus all previous rounds, and the analyzer
    * re-walks that tower once per round — measured MINUTES of driver-side
    * planning (zero tasks running) on a 200-doc adversarial fixture before
    * this cut, while the actual data movement was milliseconds.
    */
  private def planReset(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Two-level distributed connected components over an undirected pair
    * list `(a, b)`:
    *
    *  1. CONTRACT — seed every vertex with `min(id, min(neighbor))` (one
    *     groupBy over the symmetric edge list), then collapse the graph to
    *     edges BETWEEN DISTINCT LABELS. Dense near-dup clusters (the
    *     common case) collapse to single contracted vertices here, and
    *     the contracted edge set is typically orders of magnitude smaller
    *     than the input (sf0.1 embedding graph: 1722 vertices / ~100k
    *     symmetric edges → 854 labels / 4.2k contracted edges).
    *  2. ITERATE — min-label propagation WITH pointer halving on the
    *     contracted graph only ([[iterate]]); every round is cheap
    *     because the data is small, and rounds are few because halving
    *     makes convergence logarithmic in the contracted diameter.
    *  3. EXPAND — map each vertex through its seed label to the
    *     contracted component (one broadcast-sized join).
    *
    * The fixpoint is unchanged by contraction: every seed label is the id
    * of an in-component vertex, the global min vertex m of a component is
    * its own seed (`l1(m) = m`, nothing adjacent is smaller), so the
    * contracted component min IS the component min.
    */
  def connectedComponents(
      pairs: org.apache.spark.sql.DataFrame,
      checkpointEvery: Int = 0,
      localFinishMaxEdges: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val reliable = checkpointEvery > 0 &&
      pairs.sparkSession.sparkContext.getCheckpointDir.isDefined
    val edgesCached = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nE = edgesCached.count() // materialize, then cut the upstream plan out of every round
    val edges = planReset(edgesCached)
    if (nE <= localFinishMaxEdges) {
      // EARLY endgame (round 7): the raw symmetric edge set already fits
      // the local bound, so the contraction pipeline would pay three more
      // distributed materialization barriers only to shrink a graph the
      // driver can close directly (1M edges = 16 MB of longs — the same
      // bounded collect the contracted gate already performs). Same
      // union-find, same min-root labels; PropertySpec pins this route ≡
      // the distributed loop on both sides of the gate.
      val labels = broadcast(localClosure(edges))
      edgesCached.unpersist()
      val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("n_reach"))
      return labels.join(sizes, "comp")
        .select(col("id").as("doc_id"), col("comp").as("comp_id"), col("n_reach"))
    }
    // reliable-checkpoint regime: every intermediate materialization is
    // file-backed so a converged call leaves NOTHING in the block manager
    // (DedupSpec pins this); otherwise persist + drop when consumed.
    def materialize(df: org.apache.spark.sql.DataFrame): (org.apache.spark.sql.DataFrame, () => Unit) =
      if (reliable) (df.checkpoint(), () => ())
      else {
        val c = df.persist(StorageLevel.MEMORY_AND_DISK)
        c.count()
        (planReset(c), () => { c.unpersist(); () })
      }
    // l1 feeds the RETURNED lazy plan: under checkpointing it is a file-
    // backed leaf (nothing cached — the leak-free property DedupSpec
    // pins); otherwise its cache stays to pay for the caller's execution,
    // the same contract as the loop's final round.
    val (l1, _) = materialize(edges.groupBy(col("a"))
      .agg(min(col("b")).as("__nb"))
      .select(col("a").as("id"), least(col("a"), col("__nb")).as("comp")))
    // the contracted graph: one edge per adjacent label pair
    val (ce, dropCe) = materialize(edges
      .join(l1.select(col("id").as("__ca"), col("comp").as("__la")), col("a") === col("__ca"))
      .join(l1.select(col("id").as("__cb"), col("comp").as("__lb")), col("b") === col("__cb"))
      .filter(col("__la") =!= col("__lb"))
      .select(col("__la").as("a"), col("__lb").as("b"))
      .distinct())
    val nCe = ce.count()
    edgesCached.unpersist() // the loop only ever sees the contracted graph
    val labels =
      if (nCe == 0) l1 // every cluster collapsed at the seed — done
      else {
        // Size-gated endgame: the contracted graph is typically orders of
        // magnitude smaller than the input (sf0.1 embedding graph: ~100k
        // symmetric edges → 4.2k contracted). Iterating THAT as ~6 full
        // distributed rounds pays plan+schedule+codegen cycles to shuffle
        // kilobytes; when it fits the explicit bound, collect once and
        // union-find on the driver — the standard two-level CC endgame.
        // Fixpoint provably identical (localClosure keeps min-roots), and
        // DedupSpec pins both sides of the gate to the same labels.
        val l2 =
          if (nCe <= localFinishMaxEdges) {
            val r = localClosure(ce)
            dropCe()
            broadcast(r) // label map is bounded by the gate — map-side join
          } else {
            val r = iterate(ce, checkpointEvery, reliable)
            dropCe() // l2 is materialized; the contracted graph is dead
            r
          }
        l1.join(l2.select(col("id").as("__lid"), col("comp").as("__lcomp")),
            col("comp") === col("__lid"), "left")
          .select(col("id"), coalesce(col("__lcomp"), col("comp")).as("comp"))
      }
    val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("n_reach"))
    val out = labels.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("comp_id"), col("n_reach"))
    if (nCe == 0) dropCe()
    out
  }

  /** Min-label propagation with pointer halving until fixpoint; `edges`
    * must be symmetric. Returns (id, comp). ONE propagation step per
    * action; the convergence count doubles as the round's cache
    * materialization. Actions (plan+codegen+job cycles) dominate wall
    * time at contracted-graph sizes, so the tempting "fuse 2 steps per
    * action" variant was tried and REVERTED: the fused plan re-executes
    * its uncached intermediate and thrashes the cache — measured 4-10×
    * slower than this simple loop.
    */
  private def iterate(
      edges: org.apache.spark.sql.DataFrame,
      checkpointEvery: Int,
      reliable: Boolean): org.apache.spark.sql.DataFrame = {
    var cached = edges.groupBy(col("a"))
      .agg(min(col("b")).as("__nb"))
      .select(col("a").as("id"), least(col("a"), col("__nb")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val prop = labels.join(
          edges.join(labels, edges("b") === labels("id"))
            .groupBy(edges("a").as("nid")).agg(min(col("comp")).as("ncomp")),
          labels("id") === col("nid"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp1"))
        // referenced by BOTH sides of the halving join below — cache or
        // the neighbor-min join+agg executes twice per round
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Pointer halving: additionally follow the new label's OWN label.
      // Every label is an in-component vertex id, so the lookup is a
      // self-join on the same round's frame; the min fixpoint (=
      // component min) is untouched, but label chains shorten
      // super-linearly per round — convergence logarithmic in diameter
      // instead of linear (the sf0.1 embedding graph's near-threshold
      // pairs chain into long paths: ~25 rounds neighbor-min only, 10
      // with halving, and a handful once contraction shrinks the graph).
      val step = prop.alias("x").join(
          prop.select(col("id").as("pid"), col("comp1").as("pcomp")).alias("p"),
          col("x.comp1") === col("pid"), "left")
        .select(col("x.id").as("id"), col("x.comp"),
          least(col("x.comp1"), coalesce(col("pcomp"), col("x.comp1"))).as("comp2"))
      val updated =
        if (checkpointEvery > 0 && round % checkpointEvery == 0)
          // eager: materializes AND truncates lineage; reliable checkpoints
          // are file-backed (no cache entry), local ones persist internally
          if (reliable) step.checkpoint() else step.localCheckpoint()
        else step.persist(StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      converged = updated.filter(col("comp2") < col("comp")).count() == 0
      if (sys.env.contains("GRAFT_CC_LOG"))
        System.err.println(f"[cc] round $round ${(System.nanoTime() - t0) / 1e9}%.2f s converged=$converged")
      prop.unpersist() // updated is materialized; drop the round's halves
      cached.unpersist() // updated is materialized; drop the parent round
      cached = updated
      // materialized by the convergence count -> safe to cut the plan; a
      // checkpointed round is already a leaf
      val flat =
        if (checkpointEvery > 0 && round % checkpointEvery == 0) updated
        else planReset(updated)
      labels = flat.select(col("id"), col("comp2").as("comp"))
    }
    labels
  }

  /** Driver union-find over a bounded contracted edge list — the endgame of
    * [[connectedComponents]] once contraction has shrunk the graph under
    * the explicit gate. Roots stay set-minima by construction (every union
    * points the larger root at the smaller, under the same ordering Spark's
    * min/least uses for these key types: numeric, or lexicographic for
    * strings), so the returned (id, comp) fixpoint is exactly what
    * [[iterate]] converges to. Returns one row per contracted vertex.
    */
  private def localClosure(ce: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = ce.sparkSession
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    ce.collect().foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { k => out += org.apache.spark.sql.Row(k, find(k)) }
    val dt = ce.schema("a").dataType
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", dt),
        org.apache.spark.sql.types.StructField("comp", dt))))
  }

  /** X-DED7 — near-dup CLUSTERING: connected components over the MinHash-
    * LSH candidate pairs (x_ded2's generator), surfacing each clustered
    * doc with its canonical component id (= min doc_id — the survivor
    * choice) and component size. This is the step between "candidate
    * pairs" and "drop the losers" in every production dedup pipeline —
    * pairs alone under-merge when A~B and B~C but A≁C. Oracle: DuckDB
    * WITH RECURSIVE reachability closure over the same pairs.
    */
  /** Shared LSH candidate-pair generator: the native band projection
    * self-joined on (band, sig) with a pair-level distinct — one
    * (band,sig)-keyed exchange serves both sides (ReusedExchange; the
    * narrow native signature needs no cache). Consumed by the x_ded7 and
    * x_ded17 probes and the Corpus dedupNearClustered /
    * dedupNearQualitySurvivor routes.
    */
  def minhashPairs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bands = minhashBandsNative(docs)
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, a("band") === b("band_b") && a("sig") === b("sig_b") && a("a_id") < b("b_id"))
      .select(col("a_id").as("a"), col("b_id").as("b")).distinct()
  }

  private val ded7 = Probe(
    "x_ded7_components",
    s"""${bandCteSql(recursive = true)},
      |pr AS (
      |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      |  FROM bd a JOIN bd b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |ed AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
      |reach(a, b) AS (
      |  SELECT DISTINCT a, a FROM ed
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN ed e ON r.b = e.a)
      |SELECT a AS doc_id, MIN(b) AS comp_id, CAST(COUNT(*) AS BIGINT) AS n_reach
      |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin) { (s, dir) =>
    connectedComponents(minhashPairs(Tables(s, dir, "documents"))).orderBy("doc_id")
  }

  /** X-DED4 — word-bigram Jaccard near-dup pairs within (lang, source)
    * buckets. Jaccard surfaced as exact ppm via truncating integer division.
    */
  private val ded4 = Probe(
    "x_ded4_ngram_jaccard",
    s"""WITH bg AS (
      |  SELECT DISTINCT doc_id, lang, source, ws[i] || ' ' || ws[i+1] AS g
      |  FROM (SELECT doc_id, lang, source, ${graft.clean.CleanFns.tokensDuck("text")} AS ws FROM documents
      |        WHERE len(${graft.clean.CleanFns.tokensDuck("text")}) >= 2),
      |       UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM bg a JOIN bg b ON a.lang = b.lang AND a.source = b.source
      |    AND a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT a_id, b_id, c AS n_shared,
      |  (c * 1000000) // (sa.n + sb.n - c) AS jaccard_ppm
      |FROM shared JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
      |WHERE (c * 1000000) // (sa.n + sb.n - c) >= 300000
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val bg = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        graft.clean.CleanFns.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"), col("source"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"))
        .as("g"))
      .distinct()
      // bg feeds THREE branches (a, b, sz), but all three sit above the
      // distinct's own exchange -> one ReusedExchange serves them all
      // (round 7; no cache, no leak)
    val sz = bg.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = bg.select(col("doc_id").as("a_id"), col("lang"), col("source"), col("g"))
    val b = bg.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
      col("source").as("source_b"), col("g").as("g_b"))
    val shared = a.join(b,
        a("lang") === b("lang_b") && a("source") === b("source_b") &&
        a("g") === b("g_b") && a("a_id") < b("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    shared
      .join(sz.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sz.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .select(col("a_id"), col("b_id"), col("c").as("n_shared"),
        expr("(c * 1000000) DIV (na + nb - c)").as("jaccard_ppm"))
      .filter(col("jaccard_ppm") >= 300000)
      .orderBy("a_id", "b_id")
  }

  /** X-DED5 — embedding-cosine near-dup pairs: same-label vectors whose
    * cosine similarity is ≥ 0.35 (the corpus max is ~0.47 — synthetic embeddings are near-orthogonal, so the threshold is set where near-dups exist). Same exact-integer quantization as the
    * similarity operators (bit-identical scores across engines); the label
    * equi-key bounds the pair space, standing in for the LSH/IVF bucket at
    * scale.
    */
  private val ded5 = Probe(
    "x_ded5_embed_cosine",
    """WITH iv AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM iv)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |       round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) /
      |             sqrt(a.n2 * b.n2), 6) AS cos
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) /
      |      sqrt(a.n2 * b.n2) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    graft.GraftExtensions.register(s)
    val n = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr(Similarity.intVec).as("v"))
      .withColumn("n2", expr("dot_d(v, v)"))
      // persisted: unlike the banded chains, the two all-pairs join sides
      // are NOT identical subtrees once the a/b blocks diverge, so
      // ReusedExchange cannot serve them (measured 2x lazily, round 7)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = n.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("av"), col("n2").as("an2"))
    val b = n.select(col("vec_id").as("b_id"), col("label").as("label_b"),
      col("v").as("bv"), col("n2").as("bn2"))
    a.join(b, a("label") === b("label_b") && a("a_id") < b("b_id"))
      .withColumn("cos", expr("dot_d(av, bv)") / sqrt(col("an2") * col("bn2")))
      .filter(col("cos") >= 0.35)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy("a_id", "b_id")
  }

  /** X-DED9 — INCREMENTAL near-dedup: dedupe a newly-crawled shard (here
    * doc_id % 3 == 0) against the already-released corpus (the rest) using
    * the shared MinHash band generator. This is the regime production
    * pipelines actually run in — the existing corpus is NOT re-deduped
    * every crawl; only new×old candidates matter, never new×new or
    * old×old.
    *
    * Scale shape: at 100 TB the old side's bands are a persisted index
    * (written once, partitioned by band signature — exactly like
    * `IvfIndex`), so each incremental run shuffles ONLY the new shard's
    * bands and joins against the co-located index partitions; the old
    * corpus text is never re-read, let alone re-shuffled. Here both sides
    * derive from one generator call to keep the probe self-contained; the
    * split is the semantics being checked.
    */
  private val ded9 = Probe(
    "x_ded9_incremental",
    s"""${bandCteSql(recursive = false)}
      |SELECT n.doc_id AS new_id, CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_old_dups
      |FROM bd n JOIN bd o ON n.band = o.band AND n.sig = o.sig
      |WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0
      |GROUP BY n.doc_id
      |ORDER BY new_id""".stripMargin) { (s, dir) =>
    // native band generation, as in the production Corpus chain.
    // Persisted: new/old are DIFFERENT filters of the frame — no shared
    // exchange below them, so laziness recomputes the scan twice
    val bands = minhashBandsNative(Tables(s, dir, "documents"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newSide = bands.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("new_id"), col("band"), col("sig"))
    val oldSide = bands.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id").as("old_id"), col("band").as("band_o"), col("sig").as("sig_o"))
    newSide
      .join(oldSide, newSide("band") === oldSide("band_o") && newSide("sig") === oldSide("sig_o"))
      .groupBy("new_id")
      .agg(count_distinct(col("old_id")).as("n_old_dups"))
      .orderBy("new_id")
  }

  /** X-DED12 — incremental near-dedup THROUGH THE PERSISTED BAND INDEX
    * (`BandIndex`): same new-vs-old semantics as x_ded9, but the old
    * corpus's bands are written once as prefix-partitioned parquet and the
    * probe joins the new shard against the index READ, never recomputing
    * (or re-reading) the old corpus text. The oracle is the pure x_ded9
    * band algebra — hash-match proves the persisted layout is lossless and
    * the index read path drops exactly the docs the recompute path drops.
    * (BandIndexSpec additionally pins partition pruning on the index scan.)
    */
  private val ded12 = Probe(
    "x_ded12_band_index",
    s"""${bandCteSql(recursive = false)}
      |SELECT DISTINCT n.doc_id AS new_id
      |FROM bd n JOIN bd o ON n.band = o.band AND n.sig = o.sig
      |WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0
      |ORDER BY new_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // prefix width follows corpus size: 1 hex char (16 partitions) at
    // bench SF — 256 directories over ~50k band rows is pure small-file
    // overhead (measured: 6.7 s vs 3 s); the 2-char default is the
    // 100 TB layout where each of 256 partitions is still large files.
    // Index build is train-once per corpus dir (the released corpus is
    // indexed ONCE in production); steady-state times the probe join.
    val idxDir = graft.util.TrainOnce(s"band_index:$dir") {
      val p = graft.util.TempDirs.scratch("graft_ded12_idx")
      BandIndex.build(docs.filter(col("doc_id") % 3 =!= 0), p, prefixChars = 1)
      p
    }
    BandIndex.collidingNewIds(
        docs.filter(col("doc_id") % 3 === 0), BandIndex.load(s, idxDir),
        prefixChars = 1)
      .select(col("doc_id").as("new_id"))
      .orderBy("new_id")
  }

  /** X-DED3c — SimHash via the NATIVE `simhash32` expression
    * (`functions/SimHash32.scala`, doGenCode): the whole signature is one
    * narrow per-row call inside the scan's codegen loop, replacing
    * simhashSig's explode → corpus-wide DISTINCT → re-aggregate (two wide
    * stages) with ZERO exchanges. Same exact oracle as x_ded3/x_ded3b —
    * the expression must reproduce the declarative fingerprints bit for
    * bit, and SimHashNativeSpec additionally pins expression ≡ simhashSig
    * and interpreted ≡ codegen.
    */
  private val ded3c = Probe(
    "x_ded3c_simhash_native",
    simhashOracleSql) { (s, dir) =>
    graft.GraftExtensions.register(s)
    def sig = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.SimHash32.simhash32(col("text")).as("simhash"))
    val a = sig.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
      col("source").as("a_src"), col("simhash").as("a_sh"))
    val b = sig.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("source").as("b_src"), col("simhash").as("b_sh"))
    a.join(b,
        a("a_lang") === b("b_lang") && a("a_src") === b("b_src") &&
        a("a_id") =!= b("b_id") &&
        expr("bit_count(a_sh ^ b_sh) <= 2"), "left")
      .groupBy(col("a_id").as("doc_id"), col("a_sh").as("simhash"))
      .agg(count(col("b_id")).as("n_near"))
      .orderBy("doc_id")
  }

  /** X-DED17 — QUALITY-AWARE survivor selection (round 7): production
    * dedup keeps the highest-quality member of each near-dup cluster, not
    * the min id — dropping a clean original in favor of a boilerplate-
    * ridden copy is a real corpus-quality bug the min-id policy commits
    * silently. Composition: MinHash-LSH pairs → connected components →
    * the native one-pass quality signals → one row_number window per
    * component ordered (keep DESC, n_words DESC, doc_id ASC) — the
    * survivor is deterministic even between quality ties. Scale shape:
    * the only cost beyond x_ded7 is a narrow quality projection and one
    * comp_id-keyed window bounded by cluster sizes (shallow for dup
    * groups). Oracle: the recursive closure + a relational replication of
    * the full quality-rule algebra + the same argmax window.
    */
  /** Shared by the x_ded17 probe and `Corpus.dedupNearQualitySurvivor`:
    * label every clustered doc with its component and whether it is the
    * cluster's QUALITY survivor — argmax over (keep DESC, n_words DESC,
    * doc_id ASC), deterministic even between quality ties.
    */
  def qualitySurvivorLabels(docs: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame,
      checkpointEvery: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = connectedComponents(pairs, checkpointEvery)
    val q = graft.ext.PipelineOps3.addQualityRuleSignals(docs)
      .select(col("doc_id"), col("n_words"), col("keep"))
    val wS = Window.partitionBy(col("comp_id"))
      .orderBy(col("keep").desc, col("n_words").desc, col("doc_id").asc)
    comps.join(q, "doc_id")
      .withColumn("is_survivor", (row_number().over(wS) === 1).cast("long"))
      .select(col("doc_id"), col("comp_id"), col("n_reach"),
        col("keep"), col("n_words"), col("is_survivor"))
  }

  private val ded17 = Probe(
    "x_ded17_quality_survivor",
    s"""${bandCteSql(recursive = true)},
      |pr AS (
      |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      |  FROM bd a JOIN bd b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |ed AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
      |reach(a, b) AS (
      |  SELECT DISTINCT a, a FROM ed
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN ed e ON r.b = e.a),
      |comp AS (
      |  SELECT a AS doc_id, MIN(b) AS comp_id, CAST(COUNT(*) AS BIGINT) AS n_reach
      |  FROM reach GROUP BY a),
      |tq AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS wq
      |  FROM documents),
      |mq AS (
      |  SELECT doc_id,
      |    CAST(len(wq) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(wq, x -> length(x))) * 100 // nullif(len(wq), 0) AS BIGINT) AS mean_len_c,
      |    CAST(len(list_filter(wq, x -> regexp_matches(x, '[a-z]'))) * 1000000 // nullif(len(wq), 0) AS BIGINT) AS alpha_ppm,
      |    CAST(len(list_filter(wq, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS stop_hits
      |  FROM tq),
      |q AS (
      |  SELECT doc_id, n_words,
      |    CAST(CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
      |              AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |  FROM mq)
      |SELECT c.doc_id, c.comp_id, c.n_reach, q.keep, q.n_words,
      |  CAST(CASE WHEN row_number() OVER (
      |         PARTITION BY c.comp_id
      |         ORDER BY q.keep DESC, q.n_words DESC, c.doc_id ASC) = 1
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_survivor
      |FROM comp c JOIN q USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.spread(s, dir, "documents")
    qualitySurvivorLabels(docs, minhashPairs(docs)).orderBy("doc_id")
  }

  /** [[minhashBands]] over NFKC+casefold-normalized text — the
    * cross-lingual/cross-script matching form: fullwidth forms,
    * ligatures, compatibility variants and case differences collapse
    * BEFORE shingling, so a fullwidth copy of a document is an LSH
    * candidate of its ASCII original. Normalization changes only WHAT is
    * shingled, never the band/verdict algebra (DedupSpec pins: identical
    * output to [[minhashBands]] on an already-normalized corpus).
    */
  def minhashBandsNormalized(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    minhashBands(docs.withColumn("text", expr("nfkc_casefold(text)")))
  }

  /** X-DED23 — cross-lingual near-dup LSH: the x_ded2 chain over
    * NFKC+casefold-normalized shingles. The oracle runs the identical
    * band algebra over `lower(text)` — on the ASCII testdata NFKC is the
    * identity and Locale.ROOT lowercasing == SQL lower(), so the
    * normalization seam is the ONLY difference from x_ded2, and the
    * non-ASCII contract (fullwidth, ligatures) is pinned by data in
    * NfkcCasefoldSpec / DedupSpec planted fixtures.
    */
  private val ded23 = Probe(
    "x_ded23_crosslingual_lsh",
    s"""${bandCteSql(recursive = false, textExpr = "lower(text)")}
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_bands
       |FROM bd a JOIN bd b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val bands = minhashBandsNormalized(Tables.spread(s, dir, "documents"))
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, a("band") === b("band_b") && a("sig") === b("sig_b") && a("a_id") < b("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Probe] = Seq(ded1, ded1b, ded2, ded2b, ded3, ded3b, ded3c, ded4, ded5, ded7, ded9, ded12, ded17, ded23)
}
