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
    * task — same caveat as any ordered window; when a single group
    * outgrows a task, pre-aggregate per (group, salt) shard to running
    * shard subtotals first (the x_pack2 two-level prefix-sum shape).
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

  val all: Seq[Probe] = Seq(smp6, mix3)
}
