package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Probe, Tables}

/** Round-6 pipeline operators: leakage-safe dataset splits and
  * token-budget-aware mixing — the two assembly steps that turn a curated
  * corpus into actual train/val/test shards.
  */
object PipelineOps6 {

  /** Deterministic GROUP-keyed split assignment: every document whose
    * `group` hashes into the same bucket lands in the same split, so
    * near-duplicates that share a group (pages of one domain, shards of
    * one source crawl) can never straddle train and test — the
    * train/test-leakage failure mode of row-wise random splits.
    * Content-independent (md5 of the group key, not the text): re-running
    * on a re-crawled corpus keeps every group in its old split.
    *
    * Scale shape: a narrow per-row hash against literal thresholds — no
    * shuffle, no coordination, embarrassingly parallel at any corpus size.
    * `cuts` are cumulative percentage cut-points, e.g. Seq(80, 90) =
    * 80/10/10 train/val/test.
    */
  def splitByGroup(df: DataFrame, group: Column, names: Seq[String],
      cuts: Seq[Int]): DataFrame = {
    require(names.size == cuts.size + 1, "need one more name than cut-point")
    // the foldRight when-chain below is only correct for ascending in-range
    // cut-points; a recipe like Seq(90, 80) must fail loudly, not mislabel
    require(cuts == cuts.sorted && cuts.forall(c => c > 0 && c < 100),
      s"cuts must be strictly ascending percentages in (0, 100); got $cuts")
    require(cuts.distinct == cuts, s"cuts must be distinct; got $cuts")
    val bucket =
      conv(substring(md5(group.cast("string")), 1, 4), 16, 10).cast("long") % 100
    val split = cuts.zip(names).foldRight(lit(names.last): Column) {
      case ((cut, name), rest) => when(bucket < cut, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** X-SMP6 — leakage-safe 80/10/10 split of the documents table keyed on
    * `source`: all pages of a source share a split. The oracle recomputes
    * the identical md5-bucket arithmetic, proving the assignment is pure
    * deterministic algebra, not RNG state.
    */
  private val smp6 = Probe(
    "x_smp6_group_split",
    """WITH b AS (
      |  SELECT doc_id, source,
      |         ('0x' || substr(md5(source), 1, 4))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, source,
      |       CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    splitByGroup(
        Tables(s, dir, "documents").select(col("doc_id"), col("source")),
        group = col("source"),
        names = Seq("train", "val", "test"), cuts = Seq(80, 90))
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy("doc_id")
  }

  /** Greedy token-budget fill per group: order documents inside each group
    * by a deterministic md5 permutation, accumulate token counts, and keep
    * documents while the running total stays within `budget` — "take ~N
    * tokens of each language/source", the mixing primitive that data
    * recipes express in tokens, not documents.
    *
    * Scale shape: one shuffle (the per-group window). The running sum is a
    * per-group ordered prefix sum, so a mega-group funnels through one
    * task — same caveat as any ordered window. This form is the
    * oracle-parity twin; the production route for real recipes ("take 5T
    * tokens of English" IS a mega-group) is [[takeTokenBudgetSharded]],
    * which computes the identical result as a two-level prefix sum.
    */
  def takeTokenBudget(df: DataFrame, group: Column, tokens: Column,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokens)
      .withColumn("cum_tok", sum(col("__tok")).over(w))
      .filter(col("cum_tok") <= budget)
      .drop("__tok")
  }

  /** [[takeTokenBudget]] without the mega-group funnel: the identical
    * greedy fill as a TWO-LEVEL prefix sum (the x_pack2 shape, adapted to
    * a hashed permutation order). The key identity: the per-group order IS
    * `(md5(doc_id), doc_id)`, so sharding on the first `shardChars` hex
    * characters of that same md5 yields shards that are CONTIGUOUS ranges
    * of the global order — which makes
    *
    *   cum_tok(doc) = cumsum_within(group, shard) + exclusive_cumsum(shard totals)
    *
    * exact, not approximate. Three consequences for 100 TB:
    *
    *   - no within-window partition holds more than ~1/16^shardChars of a
    *     group (md5 prefixes are uniform), so "take N tokens of English"
    *     never serializes English onto one task;
    *   - the shard-totals table is |groups| * 16^shardChars rows — tiny;
    *     its own window is per-group over ≤ 16^shardChars rows, and the
    *     offsets join is AQE-broadcast while small;
    *   - shards whose EXCLUSIVE offset already exceeds the budget are
    *     pruned before the expensive window runs (every row in them has
    *     cum_tok ≥ offset > budget, tokens being non-negative), so the
    *     window's work scales with the budget boundary, not the corpus.
    *
    * Requires `tokens` non-negative (token counts are). Same output
    * contract as [[takeTokenBudget]]: input columns + `cum_tok`;
    * TokenBudgetShardedSpec and the x_mix3b oracle pin sharded ≡ single
    * window.
    */
  def takeTokenBudgetSharded(df: DataFrame, group: Column, tokens: Column,
      budget: Long, shardChars: Int = 2): DataFrame = {
    require(shardChars >= 1 && shardChars <= 8,
      s"shardChars must be in [1, 8]; got $shardChars")
    val outCols = df.columns
    val base = df
      .withColumn("__g", group)
      .withColumn("__tok", tokens)
      .withColumn("__h", md5(col("doc_id").cast("string")))
      .withColumn("__shard", substring(col("__h"), 1, shardChars))
    // level 2 first: per-(group, shard) totals -> exclusive prefix offsets
    val wS = Window.partitionBy("__g_o").orderBy("__shard_o")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__g").as("__g_o"), col("__shard").as("__shard_o"))
      .agg(sum(col("__tok")).as("__s_tok"))
      .withColumn("__off", coalesce(sum(col("__s_tok")).over(wS), lit(0L)))
      .drop("__s_tok")
    // budget-boundary pruning + level 1 inside each bounded shard
    val wIn = Window.partitionBy(col("__g"), col("__shard"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(offsets,
        base("__g") <=> offsets("__g_o") && base("__shard") === offsets("__shard_o"))
      .filter(col("__off") <= budget)
      .withColumn("cum_tok", col("__off") + sum(col("__tok")).over(wIn))
      .filter(col("cum_tok") <= budget)
      .select(outCols.map(col) :+ col("cum_tok"): _*)
  }

  /** X-MIX3 — ~2000 tokens of every language: the greedy budget fill over
    * the documents table. The oracle runs the identical window algebra in
    * DuckDB (same md5 permutation, same running sum, same cutoff).
    */
  private val mix3 = Probe(
    "x_mix3_token_budget",
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |         len(${graft.clean.CleanFns.tokensDuck("text")}) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tok,
      |         sum(n_tok) OVER (PARTITION BY lang
      |                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |                          ROWS UNBOUNDED PRECEDING) AS cum_tok
      |  FROM d)
      |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
      |       CAST(cum_tok AS BIGINT) AS cum_tok
      |FROM c WHERE cum_tok <= 2000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    takeTokenBudget(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(graft.clean.CleanFns.tokens(col("text"))).cast("long").as("n_tok")),
        group = col("lang"), tokens = col("n_tok"), budget = 2000L)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
      .orderBy("doc_id")
  }

  /** X-MIX3B — the SAME greedy budget fill as x_mix3, computed by the
    * scalable two-level sharded prefix sum, checked against the naive
    * single-window oracle — pinning that the shard decomposition is exact.
    * TokenBudgetShardedSpec additionally pins the plan (every window
    * partitions by (group, shard); no single-task funnel for a planted
    * mega-group).
    */
  private val mix3b = Probe(
    "x_mix3b_token_budget_sharded",
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |         len(${graft.clean.CleanFns.tokensDuck("text")}) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tok,
      |         sum(n_tok) OVER (PARTITION BY lang
      |                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |                          ROWS UNBOUNDED PRECEDING) AS cum_tok
      |  FROM d)
      |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
      |       CAST(cum_tok AS BIGINT) AS cum_tok
      |FROM c WHERE cum_tok <= 2000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    takeTokenBudgetSharded(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(graft.clean.CleanFns.tokens(col("text"))).cast("long").as("n_tok")),
        group = col("lang"), tokens = col("n_tok"), budget = 2000L)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
      .orderBy("doc_id")
  }

  val all: Seq[Probe] = Seq(smp6, mix3, mix3b)
}
