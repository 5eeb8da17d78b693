package graft.ext

import graft.{Probe, Tables}
import graft.clean.CleanFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 additions (ninth wave): mixture PLANNING (solve the source
  * weights that hit a target composition — the step before
  * `mixBySourceWeights` applies them) and sequential context-window
  * packing (the concat-then-split layout actual pretraining uses).
  */
object PipelineOps14 {

  /** Per-source mixture plan: given a (source, target_ppm) table
    * (Σ target = 1e6), the replication weight that makes each source's
    * token share hit its target, plus the honestly-rounded ACHIEVED
    * share:
    *
    *   weight_ppm   = target_ppm · T DIV n_tokens_s      (T = Σ tokens)
    *   achieved_ppm = n_tokens_s · weight_ppm · 1e6 DIV Σ_j (n_tokens_j · weight_ppm_j)
    *
    * All exact integer algebra (truncating DIV on both engines), so the
    * plan AND its rounding error are oracle-checkable; the output
    * `weight_ppm` column is exactly the map [[graft.api.Corpus.mixBySourceWeights]]
    * consumes. Shape: one source-keyed aggregation over the corpus; the
    * plan table is sources-sized (broadcast everywhere downstream).
    *
    * Intermediates (`target_ppm·T`, `n_tokens·weight_ppm·1e6`) are
    * computed in DECIMAL(38,0) — the DuckDB oracle already computes them
    * in 128-bit, and at the ~10^13-tokens-per-source corpus this
    * docstring targets, Long arithmetic wraps silently in non-ANSI
    * Spark (round-9 verdict #3). A degenerate source whose weight
    * itself exceeds BIGINT (a handful of tokens asked to carry a large
    * share of a 10^13-token corpus) raises loudly instead of wrapping.
    */
  def mixturePlan(docs: DataFrame, targets: DataFrame): DataFrame =
    mixturePlanFromCounts(
      docs
        .select(col("source"), size(CleanFns.tokens(col("text"))).cast("long").as("n"))
        .groupBy("source").agg(sum(col("n")).as("n_tokens")),
      targets)

  /** [[mixturePlan]] from a prebuilt (source, n_tokens) count table —
    * the entry point when token counts are already aggregated (or
    * BPE-denominated via `n_tok_bpe`). All arithmetic DECIMAL(38,0).
    */
  def mixturePlanFromCounts(tokS: DataFrame, targets: DataFrame): DataFrame = {
    val tot = tokS.agg(sum(col("n_tokens")).cast("decimal(38,0)").as("t"))
    val w = tokS
      .join(broadcast(targets), Seq("source"))
      .join(broadcast(tot))
      .withColumn("share_ppm",
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV t AS BIGINT)"))
      // floor == truncating DIV here (all operands non-negative)
      .withColumn("__w_dec", expr(
        "CAST(floor(CAST(target_ppm AS DECIMAL(38,0)) * t / nullif(CAST(n_tokens AS DECIMAL(38,0)), 0)) AS DECIMAL(38,0))"))
      .withColumn("weight_ppm", expr(
        """CASE WHEN __w_dec > CAST(9223372036854775807 AS DECIMAL(38,0))
          |THEN CAST(raise_error(concat('mixturePlan: weight_ppm overflows BIGINT for source ',
          |     source, ' — rescale targets to per-mille or exclude degenerate sources')) AS BIGINT)
          |ELSE CAST(__w_dec AS BIGINT) END""".stripMargin))
    val denom = w.agg(
      sum(expr("CAST(n_tokens AS DECIMAL(38,0)) * weight_ppm")).cast("decimal(38,0)").as("d"))
    w.join(broadcast(denom))
      .select(col("source"), col("n_tokens"), col("share_ppm"),
        col("target_ppm").cast("long").as("target_ppm"), col("weight_ppm"),
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * weight_ppm * 1000000 DIV nullif(d, 0) AS BIGINT)")
          .as("achieved_ppm"))
  }

  /** X-MIX5 — the mixture plan over the documents table with a
    * deterministic skewed target (source index mod 4 → 20/40/60/80k ppm,
    * summing to exactly 1e6 over the 20 sources). The oracle recomputes
    * the whole plan algebra; `achieved_ppm` beside `target_ppm` makes
    * the integer-rounding error part of the checked output.
    */
  private val mix5 = Probe(
    "x_mix5_weight_plan",
    s"""WITH tk AS (
       |  SELECT source, SUM(len(${CleanFns.tokensDuck("text")})) AS n_tokens
       |  FROM documents GROUP BY source),
       |tg AS (
       |  SELECT source, (1 + CAST(substr(source, 4) AS INT) % 4) * 20000 AS target_ppm
       |  FROM tk),
       |tt AS (SELECT SUM(n_tokens) AS t FROM tk),
       |w AS (
       |  SELECT tk.source, tk.n_tokens,
       |         tk.n_tokens * 1000000 // tt.t AS share_ppm,
       |         tg.target_ppm,
       |         tg.target_ppm * tt.t // nullif(tk.n_tokens, 0) AS weight_ppm
       |  FROM tk JOIN tg USING (source), tt),
       |d AS (SELECT SUM(n_tokens * weight_ppm) AS d FROM w)
       |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(share_ppm AS BIGINT) AS share_ppm,
       |  CAST(target_ppm AS BIGINT) AS target_ppm,
       |  CAST(weight_ppm AS BIGINT) AS weight_ppm,
       |  CAST(n_tokens * weight_ppm * 1000000 // nullif(d.d, 0) AS BIGINT) AS achieved_ppm
       |FROM w, d ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val targets = docs.select(col("source")).distinct()
      .withColumn("target_ppm",
        (lit(1) + expr("CAST(substring(source, 4, 10) AS INT)") % 4) * 20000)
    mixturePlan(docs, targets).orderBy("source")
  }

  // ------------------------------------------ sequential context packing

  /** Per-document placement under sequential context-window packing —
    * the concat-then-split layout pretraining loaders actually use:
    * within each of `shards` deterministic shards, documents concatenate
    * in doc_id order and split into `ctx`-token windows. Emits each
    * document's shard, token offset, start/end bin, and whether the bin
    * boundary SPLITS it (the packing-quality number: split docs lose
    * attention locality; the fraction is what you tune ctx/shard counts
    * against).
    *
    * Shape: ONE window per shard (partitionBy shard — a worker packs its
    * shard independently, exactly the distributed layout; no global
    * funnel). Empty docs are excluded (they occupy no window space).
    */
  def packPlacements(docs: DataFrame, ctx: Int = 256, shards: Int = 16): DataFrame = {
    require(ctx >= 1 && shards >= 1, s"ctx/shards must be >= 1; got $ctx/$shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), size(CleanFns.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        (col("cum") - col("n_tok")).as("start_off"),
        expr(s"(cum - n_tok) DIV $ctx").as("start_bin"),
        expr(s"(cum - 1) DIV $ctx").as("end_bin"))
      .withColumn("is_split", (col("end_bin") > col("start_bin")).cast("int"))
  }

  /** X-PACK6 — sequential packing placements (ctx = 256, 16 shards),
    * every document's offset/bin assignment plus the split flag,
    * oracle-checked by the identical per-shard running sum.
    */
  private val pack6 = Probe(
    "x_pack6_seq_packing",
    s"""WITH d AS (
       |  SELECT doc_id, len(${CleanFns.tokensDuck("text")}) AS n_tok
       |  FROM documents
       |  WHERE len(${CleanFns.tokensDuck("text")}) > 0),
       |c AS (
       |  SELECT doc_id, doc_id % 16 AS shard, n_tok,
       |         SUM(n_tok) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard, CAST(n_tok AS BIGINT) AS n_tok,
       |  CAST(cum - n_tok AS BIGINT) AS start_off,
       |  CAST((cum - n_tok) // 256 AS BIGINT) AS start_bin,
       |  CAST((cum - 1) // 256 AS BIGINT) AS end_bin,
       |  CAST(CASE WHEN (cum - 1) // 256 > (cum - n_tok) // 256 THEN 1 ELSE 0 END AS INT) AS is_split
       |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    packPlacements(Tables(s, dir, "documents")).orderBy("doc_id")
  }

  /** Context-length ADVISOR: for each candidate window size, the packing
    * quality a sequential loader would see on this corpus — docs split
    * across bin boundaries (attention-locality loss), bins used, and
    * tail waste — plus the documented decision: the SMALLEST ctx whose
    * split fraction meets `splitBudgetPpm` (attention is quadratic in
    * ctx, so you take the shortest window the split budget allows; if
    * none qualifies, the largest candidate). The x_skt6 adviseJoin
    * pattern: the advice itself is a checked output, not a comment.
    *
    * Shape: the per-shard running offsets are computed ONCE (they don't
    * depend on ctx); each candidate then costs only narrow arithmetic
    * over (start_off, n_tok) and a 4-row rollup — one window pass + one
    * aggregation regardless of how many candidates are screened.
    */
  def ctxAdvisor(docs: DataFrame, ctxs: Seq[Int] = Seq(256, 512, 1024, 2048),
      shards: Int = 16, splitBudgetPpm: Long = 250000L): DataFrame = {
    require(ctxs.nonEmpty && ctxs.forall(_ >= 1), s"bad ctx candidates: $ctxs")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val placed = docs
      .select(col("doc_id"), size(CleanFns.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("cum", sum(col("n_tok")).over(w))
    val perCtx = placed
      .select(col("n_tok"), (col("cum") - col("n_tok")).as("start_off"),
        explode(array(ctxs.map(c => lit(c.toLong)): _*)).as("ctx"))
      .groupBy("ctx")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN (start_off + n_tok - 1) DIV ctx > start_off DIV ctx THEN 1 ELSE 0 END")).as("n_split"))
    val bins = placed
      .groupBy("shard").agg(max(col("cum")).as("tot"))
      .select(col("tot"), explode(array(ctxs.map(c => lit(c.toLong)): _*)).as("ctx"))
      .groupBy("ctx")
      .agg(sum(expr("(tot - 1) DIV ctx + 1")).as("n_bins"), sum(col("tot")).as("total_tok"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ppm intermediates in DECIMAL(38,0): at the 10^13-token corpora the
    // docstring targets, n_split·1e6 and n_bins·ctx·1e6 exceed Long and
    // non-ANSI Spark would wrap silently while the oracle stays exact —
    // the mixturePlan discipline (round-9 verdict #3) applied here
    val wide = "CAST(%s AS DECIMAL(38,0))"
    perCtx.join(bins, "ctx")
      .withColumn("split_ppm", expr(
        s"CAST(${wide.format("n_split")} * 1000000 DIV ${wide.format("n_docs")} AS BIGINT)"))
      .withColumn("waste_ppm", expr(
        s"CAST((${wide.format("n_bins")} * ctx - total_tok) * 1000000" +
          s" DIV (${wide.format("n_bins")} * ctx) AS BIGINT)"))
      .withColumn("__ok_min",
        min(when(col("split_ppm") <= splitBudgetPpm, col("ctx"))).over(wAll))
      .withColumn("__max", max(col("ctx")).over(wAll))
      .withColumn("chosen",
        when(col("__ok_min").isNotNull, (col("ctx") === col("__ok_min")).cast("long"))
          .otherwise((col("ctx") === col("__max")).cast("long")))
      .select(col("ctx"), col("n_docs"), col("n_split"), col("split_ppm"),
        col("n_bins"), col("total_tok"), col("waste_ppm"), col("chosen"))
  }

  /** X-PACK7 — the advisor over the standard candidates, every number
    * and the choice itself oracle-checked (the oracle re-derives
    * offsets, per-ctx splits, bins, waste, and the smallest-qualifying
    * rule relationally).
    */
  private val pack7 = Probe(
    "x_pack7_ctx_advisor",
    s"""WITH d AS (
       |  SELECT doc_id, len(${CleanFns.tokensDuck("text")}) AS n_tok
       |  FROM documents
       |  WHERE len(${CleanFns.tokensDuck("text")}) > 0),
       |c AS (
       |  SELECT doc_id, doc_id % 16 AS shard, n_tok,
       |         SUM(n_tok) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d),
       |pc AS (
       |  SELECT ctx, COUNT(*) AS n_docs,
       |         SUM(CASE WHEN (cum - 1) // ctx > (cum - n_tok) // ctx THEN 1 ELSE 0 END) AS n_split
       |  FROM c, UNNEST([256, 512, 1024, 2048]) AS t(ctx) GROUP BY ctx),
       |st AS (SELECT shard, MAX(cum) AS tot FROM c GROUP BY shard),
       |bn AS (
       |  SELECT ctx, SUM((tot - 1) // ctx + 1) AS n_bins, SUM(tot) AS total_tok
       |  FROM st, UNNEST([256, 512, 1024, 2048]) AS t(ctx) GROUP BY ctx),
       |j AS (
       |  SELECT pc.ctx, n_docs, n_split,
       |         n_split * 1000000 // n_docs AS split_ppm,
       |         n_bins, total_tok,
       |         (n_bins * pc.ctx - total_tok) * 1000000 // (n_bins * pc.ctx) AS waste_ppm
       |  FROM pc JOIN bn ON bn.ctx = pc.ctx),
       |ch AS (
       |  SELECT *,
       |    MIN(CASE WHEN split_ppm <= 250000 THEN ctx END) OVER () AS ok_min,
       |    MAX(ctx) OVER () AS mx
       |  FROM j)
       |SELECT CAST(ctx AS BIGINT) AS ctx, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_split AS BIGINT) AS n_split, CAST(split_ppm AS BIGINT) AS split_ppm,
       |  CAST(n_bins AS BIGINT) AS n_bins, CAST(total_tok AS BIGINT) AS total_tok,
       |  CAST(waste_ppm AS BIGINT) AS waste_ppm,
       |  CAST(CASE WHEN ok_min IS NOT NULL THEN (ctx = ok_min)::INT
       |            ELSE (ctx = mx)::INT END AS BIGINT) AS chosen
       |FROM ch ORDER BY ctx""".stripMargin) { (s, dir) =>
    ctxAdvisor(Tables(s, dir, "documents")).orderBy("ctx")
  }

  /** X-PIPE6 — CRAWL → TRAINING BATCHES, end to end: synthetic crawl
    * pages → [[graft.api.Corpus.fromHtml]] extraction → Gopher
    * repetition gate (x_txt23) → CCNet perplexity selection over the
    * GATED corpus (terciles of its own LM — the gate changes the
    * statistics the selector cuts on, exactly like x_pipe5's
    * gate-then-DSIR interaction), dropping the tail bucket → sequential
    * context packing of the survivors (x_pack6) → per-(lang, bucket)
    * release rollup with the packing-quality number (docs split across
    * bin boundaries). The whole pipeline a crawl actually runs, one
    * nested oracle pinning every stage interaction.
    */
  private val pipe6 = Probe(
    "x_pipe6_crawl_to_batches",
    s"""WITH h AS (
       |  SELECT doc_id, lang, ${PipelineOps12.crawlHtmlDuck} AS html FROM documents),
       |x AS (SELECT doc_id, lang,
       |             ${graft.clean.HtmlFns.htmlToTextDuck("html")} AS text FROM h),
       |t AS (SELECT doc_id, lang, text, ${CleanFns.tokensDuck("text")} AS ws FROM x),
       |seg0 AS (
       |  SELECT doc_id, ${PipelineOps8.segsAutoDuck} AS segs FROM t),
       |segc AS (
       |  SELECT doc_id, seg, COUNT(*) AS c
       |  FROM seg0, UNNEST(segs) AS u(seg) GROUP BY doc_id, seg),
       |segs AS (
       |  SELECT doc_id, SUM(c - 1) * 1000000 // SUM(c) AS dup_seg_ppm
       |  FROM segc GROUP BY doc_id),
       |g AS (
       |  SELECT doc_id, n, array_to_string(ws[i:i+n-1], ' ') AS g
       |  FROM t, UNNEST([2, 3, 4, 5]) AS tn(n),
       |       UNNEST(generate_series(1, len(ws) - n + 1)) AS ti(i)
       |  WHERE len(ws) >= n),
       |gc AS (
       |  SELECT doc_id, n, substr(md5(g), 1, 16) AS hg, COUNT(*) AS c,
       |         MIN(length(g)) AS len
       |  FROM g GROUP BY doc_id, n, substr(md5(g), 1, 16)),
       |tots AS (SELECT doc_id, n, SUM(c * len) AS mass FROM gc GROUP BY doc_id, n),
       |top AS (
       |  SELECT gc.doc_id, gc.n, gc.c * gc.len * 1000000 // tots.mass AS ppm
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
       |                                     ORDER BY c DESC, hg DESC) AS rk FROM gc) gc
       |  JOIN tots ON tots.doc_id = gc.doc_id AND tots.n = gc.n
       |  WHERE gc.rk = 1 AND gc.n <= 4),
       |topp AS (
       |  SELECT doc_id,
       |    COALESCE(MAX(CASE WHEN n = 2 THEN ppm END), 0) AS top2_ppm,
       |    COALESCE(MAX(CASE WHEN n = 3 THEN ppm END), 0) AS top3_ppm,
       |    COALESCE(MAX(CASE WHEN n = 4 THEN ppm END), 0) AS top4_ppm
       |  FROM top GROUP BY doc_id),
       |d5 AS (
       |  SELECT doc_id,
       |    SUM(CASE WHEN c >= 2 THEN (c - 1) * len ELSE 0 END) * 1000000 // SUM(c * len) AS dup5_ppm
       |  FROM gc WHERE n = 5 GROUP BY doc_id),
       |keepers AS (
       |  SELECT t.doc_id FROM t
       |  LEFT JOIN segs ON segs.doc_id = t.doc_id
       |  LEFT JOIN topp ON topp.doc_id = t.doc_id
       |  LEFT JOIN d5 ON d5.doc_id = t.doc_id
       |  WHERE COALESCE(segs.dup_seg_ppm, 0) <= 300000
       |    AND COALESCE(topp.top2_ppm, 0) <= 200000
       |    AND COALESCE(topp.top3_ppm, 0) <= 180000
       |    AND COALESCE(topp.top4_ppm, 0) <= 160000
       |    AND COALESCE(d5.dup5_ppm, 0) <= 150000),
       |tk AS (SELECT t.* FROM t JOIN keepers USING (doc_id)),
       |u AS (
       |  SELECT w, COUNT(*) AS c1 FROM (SELECT UNNEST(ws) AS w FROM tk) GROUP BY w),
       |v AS (SELECT COUNT(*) AS v FROM u),
       |bg AS (
       |  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS b
       |  FROM (SELECT doc_id, ws FROM tk WHERE len(ws) >= 2),
       |       UNNEST(generate_series(1, len(ws) - 1)) AS gg(i)),
       |bc AS (SELECT substr(md5(b), 1, 16) AS hb, COUNT(*) AS c2 FROM bg GROUP BY hb),
       |sc AS (
       |  SELECT bg.doc_id,
       |    round(-SUM(ln((bc.c2 + 1) / (u.c1 + v.v))) / COUNT(*), 6) AS nll_avg
       |  FROM bg
       |  JOIN bc ON bc.hb = substr(md5(bg.b), 1, 16)
       |  JOIN u ON u.w = bg.w1, v
       |  GROUP BY bg.doc_id),
       |lg AS (
       |  SELECT sc.doc_id, tk.lang, sc.nll_avg, len(tk.ws) AS n_tok
       |  FROM sc JOIN tk ON tk.doc_id = sc.doc_id),
       |cuts AS (
       |  SELECT lang,
       |    round(percentile_cont(0.33) WITHIN GROUP (ORDER BY nll_avg), 6) AS p33,
       |    round(percentile_cont(0.67) WITHIN GROUP (ORDER BY nll_avg), 6) AS p67
       |  FROM lg GROUP BY lang),
       |sel AS (
       |  SELECT lg.doc_id, lg.lang, lg.n_tok,
       |    CASE WHEN lg.nll_avg <= cuts.p33 THEN 'head'
       |         WHEN lg.nll_avg <= cuts.p67 THEN 'middle'
       |         ELSE 'tail' END AS bucket
       |  FROM lg JOIN cuts ON cuts.lang = lg.lang),
       |kept AS (SELECT * FROM sel WHERE bucket <> 'tail' AND n_tok > 0),
       |p AS (
       |  SELECT doc_id, lang, bucket, n_tok,
       |         SUM(n_tok) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM kept)
       |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN (cum - 1) // 256 > (cum - n_tok) // 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_split
       |FROM p GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin) { (s, dir) =>
    // stage boundaries between phases (the x_pipe5 lesson): extraction
    // is a 17-step regex chain and each downstream phase consumes its
    // output from MULTIPLE subtrees — unmaterialized, Catalyst
    // re-extracts the whole crawl once per consumer (measured: 8.4 s
    // composed vs ~5 s staged at sf0.1)
    val stage = graft.util.TempDirs.scratch("graft_pipe6")
    def materialize(d: DataFrame, name: String): DataFrame = {
      d.write.mode("overwrite").parquet(s"$stage/$name")
      s.read.parquet(s"$stage/$name")
    }
    val pages = PipelineOps12.crawlPages(Tables.spread(s, dir, "documents"))
    val extracted = materialize(graft.api.Corpus.fromHtml(pages).df
      .select(col("doc_id"), col("lang"), col("text")), "extracted")
    val gated = materialize(extracted.join(
      PipelineOps13.repetitionSignalsNative(extracted)  // x_txt23b-pinned
        .filter(col("keep") === 1).select("doc_id"),
      Seq("doc_id"), "left_semi"), "gated")
    val sel = materialize(gated.join(
      PipelineOps13.ppxBuckets(gated)
        .filter(col("bucket") =!= "tail").select(col("doc_id"), col("bucket")),
      "doc_id"), "sel")
    val placed = packPlacements(sel)
    sel.select(col("doc_id"), col("lang"), col("bucket"))
      .join(placed.select(col("doc_id"), col("n_tok"), col("is_split")), "doc_id")
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("is_split")).cast("long").as("n_split"))
      .orderBy("lang", "bucket")
  }

  val all: Seq[Probe] = Seq(mix5, pack6, pack7, pipe6)
}
