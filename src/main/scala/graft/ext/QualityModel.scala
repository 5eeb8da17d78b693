package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned quality filter: closed-form ridge regression distilling the
  * hand-written quality gate (x_txt11's `keep`) into a smooth linear
  * score — the fasttext-classifier-shaped stage of a training-data
  * pipeline (label a seed set, fit a cheap model, score everything)
  * with the fit itself running inside the engine.
  *
  * Scale shape: training is ONE map-side-combined aggregation over the
  * feature frame (nine integer sums — exact at any corpus size), the
  * 3×3 normal-equation solve is a few dozen scalar ops on that one row
  * (computed IN-PLAN, no driver round-trip), and scoring is a 1-row
  * broadcast plus narrow arithmetic: at 100 TB, one pass to train,
  * zero exchanges to score.
  *
  * Determinism discipline: features are INTEGERS (the x_txt11 signal
  * algebra), so the sums are exact on both engines; the solve is a
  * fixed sequence of IEEE double ops generated from ONE shared SQL
  * text ([[coefStages]]) evaluated by Spark and DuckDB alike —
  * identical inputs, identical op order, identical doubles. λ = 1 on
  * the full diagonal (intercept included) keeps the system symmetric
  * and the matrix invertible on any input, including n = 0.
  *
  * Model: features x1 = mean_len_c (avg word length ×100), x2 =
  * alpha per-mille; label y = the rule gate. β = (XᵀX + I)⁻¹ Xᵀy via
  * the explicit symmetric-cofactor inverse; score = β₀ + β₁x1 + β₂x2;
  * pred = score ≥ 0.5.
  */
object QualityModel {

  /** (doc_id, x1, x2, y) from a documents frame — the x_txt11 signal
    * columns as integer features; docs with no words carry no row.
    */
  def features(docs: DataFrame): DataFrame =
    PipelineOps3.addQualityRuleSignals(docs)
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("mean_len_c").as("x1"),
        expr("alpha_ppm DIV 1000").as("x2"), col("keep").as("y"))

  /** Exact product of two integer feature columns, in DECIMAL(38,0) so
    * neither the multiply nor the corpus-wide sum can wrap: a single
    * pathological crawl doc (one multi-megabyte token → mean_len_c ~1e8)
    * squares past Long, and non-ANSI Spark would wrap SILENTLY while
    * DuckDB's HUGEINT stays exact — a model divergence, not just a probe
    * mismatch. The mixturePlan discipline applied to the trainer; the
    * solve reads these through CAST(… AS DOUBLE), identical on both
    * engines at any magnitude.
    */
  private def xprod(a: String, b: String) =
    coalesce(sum(col(a).cast("decimal(19,0)") * col(b).cast("decimal(19,0)")),
      lit(0L)).cast("decimal(38,0)")

  /** The nine exact integer sums of the normal equations. */
  private def sums(feat: DataFrame): DataFrame =
    feat.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("x1").cast("decimal(38,0)")), lit(0L)).as("s1"),
      coalesce(sum(col("x2").cast("decimal(38,0)")), lit(0L)).as("s2"),
      xprod("x1", "x1").as("s11"),
      xprod("x1", "x2").as("s12"),
      xprod("x2", "x2").as("s22"),
      coalesce(sum(col("y")), lit(0L)).as("sy"),
      xprod("x1", "y").as("s1y"),
      xprod("x2", "y").as("s2y"))

  /** The solve, as STAGES of select expressions shared verbatim with
    * the DuckDB oracle — the cross-engine determinism guarantee is that
    * both engines evaluate THIS text. Stage 1 casts the ridge-shifted
    * system to doubles; stage 2 is the symmetric cofactor matrix;
    * stage 3 the determinant; stage 4 the coefficients.
    */
  private[ext] val coefStages: Seq[Seq[String]] = Seq(
    Seq(
      "CAST(n + 1 AS DOUBLE) AS a", "CAST(s1 AS DOUBLE) AS b",
      "CAST(s2 AS DOUBLE) AS c", "CAST(s11 + 1 AS DOUBLE) AS d",
      "CAST(s12 AS DOUBLE) AS e", "CAST(s22 + 1 AS DOUBLE) AS f",
      "CAST(sy AS DOUBLE) AS sy", "CAST(s1y AS DOUBLE) AS s1y",
      "CAST(s2y AS DOUBLE) AS s2y"),
    Seq(
      "d * f - e * e AS c11", "c * e - b * f AS c12", "b * e - c * d AS c13",
      "a * f - c * c AS c22", "c * b - a * e AS c23", "a * d - b * b AS c33",
      "a", "b", "c", "sy", "s1y", "s2y"),
    Seq(
      "a * c11 + b * c12 + c * c13 AS det",
      "c11", "c12", "c13", "c22", "c23", "c33", "sy", "s1y", "s2y"),
    Seq(
      "(c11 * sy + c12 * s1y + c13 * s2y) / det AS b0",
      "(c12 * sy + c22 * s1y + c23 * s2y) / det AS b1",
      "(c13 * sy + c23 * s1y + c33 * s2y) / det AS b2"))

  /** Train on a labeled (doc_id, x1, x2, y) frame: the 1-row (b0, b1,
    * b2) coefficient frame, fully in-plan.
    */
  def trainRidge(feat: DataFrame): DataFrame =
    coefStages.foldLeft(sums(feat))((d, stage) => d.selectExpr(stage: _*))

  /** Score docs against a trained 1-row coefficient frame: per doc
    * (doc_id, x1, x2, keep, score, pred) — the rule label rides along
    * so distillation fidelity is inspectable downstream.
    */
  def scoreWith(docs: DataFrame, coef: DataFrame): DataFrame =
    features(docs)
      .crossJoin(broadcast(coef))
      .select(col("doc_id"), col("x1"), col("x2"), col("y").as("keep"),
        expr("round(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE), 6)").as("score"),
        expr("CAST(CASE WHEN b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE) >= 0.5 THEN 1 ELSE 0 END AS BIGINT)").as("pred"))

  /** Train-on-self then score — the distillation entry point. */
  def distill(docs: DataFrame): DataFrame =
    scoreWith(docs, trainRidge(features(docs)))

  // -------------------------------------------------------------- probe

  private def coefCtes: String = {
    val names = Seq("k1", "k2", "k3", "k4")
    coefStages.zipWithIndex.map { case (stage, i) =>
      val from = if (i == 0) "sm" else names(i - 1)
      s"${names(i)} AS (SELECT ${stage.mkString(", ")} FROM $from)"
    }.mkString(",\n")
  }

  // ------------------------------------------- generalized (3-feature)

  /** (doc_id, x1, x2, x3, y): the 2-feature frame plus stop_hits — the
    * strongest single rule input (`stop_hits >= 2` is a hard clause),
    * and monotone, so the linear model can actually use it.
    */
  def features3(docs: DataFrame): DataFrame =
    PipelineOps3.addQualityRuleSignals(docs)
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("mean_len_c").as("x1"),
        expr("alpha_ppm DIV 1000").as("x2"), col("stop_hits").as("x3"),
        col("keep").as("y"))

  /** The exact integer sums for an n-feature system, named per
    * [[RidgeSolver]]'s convention.
    */
  private def sumsN(feat: DataFrame, nFeat: Int): DataFrame = {
    val cols =
      (1 to nFeat).map(i => coalesce(sum(col(s"x$i").cast("decimal(38,0)")), lit(0L)).as(s"s$i")) ++
      (for (i <- 1 to nFeat; j <- i to nFeat)
        yield xprod(s"x$i", s"x$j").as(s"s$i$j")) ++
      Seq(coalesce(sum(col("y")), lit(0L)).as("sy")) ++
      (1 to nFeat).map(i => xprod(s"x$i", "y").as(s"s${i}y"))
    feat.agg(count(lit(1)).as("n"), cols: _*)
  }

  /** Train an n-feature ridge on a (doc_id, x1..xn, y) frame via the
    * generated [[RidgeSolver]] stages: the 1-row (b0..bn) frame,
    * in-plan.
    */
  def trainRidgeN(feat: DataFrame, nFeat: Int): DataFrame =
    RidgeSolver.stages(nFeat)
      .foldLeft(sumsN(feat, nFeat))((d, stage) => d.selectExpr(stage: _*))

  private def score3Expr: String =
    "b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE) + b3 * CAST(x3 AS DOUBLE)"

  /** Score against a trained 3-feature coefficient row. */
  def scoreWith3(docs: DataFrame, coef: DataFrame): DataFrame =
    features3(docs)
      .crossJoin(broadcast(coef))
      .select(col("doc_id"), col("x1"), col("x2"), col("x3"), col("y").as("keep"),
        expr(s"round($score3Expr, 6)").as("score"),
        expr(s"CAST(CASE WHEN $score3Expr >= 0.5 THEN 1 ELSE 0 END AS BIGINT)").as("pred"))

  /** 3-feature train-on-self + score. */
  def distill3(docs: DataFrame): DataFrame =
    scoreWith3(docs, trainRidgeN(features3(docs), 3))

  /** The distillation model card: one row of confusion counts + the
    * agreement rate (ppm, truncating) between the learned predictor and
    * the rule gate — the number that decides whether the cheap linear
    * score can stand in for the rule chain on the next crawl.
    */
  def confusion(docs: DataFrame): DataFrame =
    distill(docs).agg(
      count(lit(1)).as("n"),
      sum(when(col("pred") === 1 && col("keep") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") === 1 && col("keep") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(col("pred") === 0 && col("keep") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(col("pred") === 0 && col("keep") === 0, 1L).otherwise(0L)).as("tn"))
    .withColumn("agree_ppm", expr("(tp + tn) * 1000000 DIV n"))

  /** Shared oracle CTE chain: features → sums → staged solve → the
    * per-doc scored frame (`scored`). qc1 surfaces the rows, qc2 the
    * confusion rollup — one training algebra, hash-pinned twice.
    */
  private def scoredCtes: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS w FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(w, x -> length(x))) * 100 // nullif(len(w), 0) AS BIGINT) AS mean_len_c,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1000000 // nullif(len(w), 0) AS BIGINT) AS alpha_ppm,
       |    CAST(len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS stop_hits
       |  FROM t),
       |feat AS (
       |  SELECT doc_id, mean_len_c AS x1, alpha_ppm // 1000 AS x2,
       |    CAST(CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
       |              AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM m WHERE n_words > 0),
       |sm AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    COALESCE(SUM(CAST(x1 AS HUGEINT)), 0) AS s1, COALESCE(SUM(CAST(x2 AS HUGEINT)), 0) AS s2,
       |    COALESCE(SUM(CAST(x1 AS HUGEINT) * x1), 0) AS s11, COALESCE(SUM(CAST(x1 AS HUGEINT) * x2), 0) AS s12,
       |    COALESCE(SUM(CAST(x2 AS HUGEINT) * x2), 0) AS s22,
       |    CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
       |    COALESCE(SUM(CAST(x1 AS HUGEINT) * y), 0) AS s1y, COALESCE(SUM(CAST(x2 AS HUGEINT) * y), 0) AS s2y
       |  FROM feat),
       |$coefCtes,
       |scored AS (
       |  SELECT feat.doc_id, feat.x1, feat.x2, feat.y AS keep,
       |    round(b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE), 6) AS score,
       |    CAST(CASE WHEN b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE) >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |  FROM feat, k4)""".stripMargin

  /** X-QC1 — learned quality filter: ridge-distill the x_txt11 rule gate
    * into (β₀, β₁, β₂) and score every document. The oracle rebuilds the
    * ENTIRE training — integer feature sums, the staged cofactor solve
    * (evaluating the same SQL text the Spark plan runs), the scoring
    * arithmetic — so the hash match pins exact sums, the IEEE solve
    * sequence, and the 0.5 decision boundary cross-engine.
    */
  private val qc1 = Probe(
    "x_qc1_learned_quality",
    s"""$scoredCtes
       |SELECT * FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
    distill(Tables(s, dir, "documents")).orderBy("doc_id")
  }

  /** X-QC2 — the distillation model card: confusion counts + agreement
    * ppm between learned predictor and rule gate, over the identical
    * shared training algebra (one aggregation over x_qc1's scored rows).
    */
  private val qc2 = Probe(
    "x_qc2_quality_confusion",
    s"""$scoredCtes
       |SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN pred = 1 AND keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN pred = 1 AND keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN pred = 0 AND keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN pred = 0 AND keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST((SUM(CASE WHEN pred = keep THEN 1 ELSE 0 END)) * 1000000 // COUNT(*) AS BIGINT) AS agree_ppm
       |FROM scored ORDER BY n""".stripMargin) { (s, dir) =>
    confusion(Tables(s, dir, "documents"))
  }

  private def ctesFor(stages: Seq[Seq[String]]): String =
    stages.zipWithIndex.map { case (stage, i) =>
      val from = if (i == 0) "sm" else s"k$i"
      s"k${i + 1} AS (SELECT ${stage.mkString(", ")} FROM $from)"
    }.mkString(",\n")

  private def sumsSqlN(nFeat: Int): String = {
    val cols =
      (1 to nFeat).map(i => s"COALESCE(SUM(CAST(x$i AS HUGEINT)), 0) AS s$i") ++
      (for (i <- 1 to nFeat; j <- i to nFeat)
        yield s"COALESCE(SUM(CAST(x$i AS HUGEINT) * x$j), 0) AS s$i$j") ++
      Seq("CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy") ++
      (1 to nFeat).map(i => s"COALESCE(SUM(CAST(x$i AS HUGEINT) * y), 0) AS s${i}y")
    ("CAST(COUNT(*) AS BIGINT) AS n" +: cols).mkString(", ")
  }

  /** X-QC3 — the 3-feature distillation through the GENERATED solver
    * ([[RidgeSolver]], 4×4 symmetric cofactors): adds stop_hits, the
    * strongest rule input. The oracle's solve stages are the same
    * generated text the Spark plan folds over — the determinism argument
    * is literally shared source. QualityModelSpec pins the fidelity gain
    * over the 2-feature model and the A·β = s residual.
    */
  private val qc3 = Probe(
    "x_qc3_learned_quality3",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS w FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(w, x -> length(x))) * 100 // nullif(len(w), 0) AS BIGINT) AS mean_len_c,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1000000 // nullif(len(w), 0) AS BIGINT) AS alpha_ppm,
       |    CAST(len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS stop_hits
       |  FROM t),
       |feat AS (
       |  SELECT doc_id, mean_len_c AS x1, alpha_ppm // 1000 AS x2, stop_hits AS x3,
       |    CAST(CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
       |              AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM m WHERE n_words > 0),
       |sm AS (SELECT ${sumsSqlN(3)} FROM feat),
       |${ctesFor(RidgeSolver.stages(3))}
       |SELECT feat.doc_id, feat.x1, feat.x2, feat.x3, feat.y AS keep,
       |  round($score3Expr, 6) AS score,
       |  CAST(CASE WHEN $score3Expr >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM feat, k4 ORDER BY feat.doc_id""".stripMargin) { (s, dir) =>
    distill3(Tables(s, dir, "documents")).orderBy("doc_id")
  }

  // ------------------------------------- calibrated logistic (IRLS)

  /** Fixed-iteration IRLS logistic regression on the 3-feature system —
    * the CALIBRATED upgrade of the ridge distillation: the score is a
    * probability in (0, 1), not an unbounded linear value (round-10
    * verdict stretch #8). Deterministic cross-engine BY CONSTRUCTION,
    * extending the RidgeSolver discipline to an iterative fit:
    *
    *   - The sigmoid uses NO libm exp (exp/ln are not IEEE-specified to
    *     the last ulp across engines): exp(-u) ≈ (1 - u/32)^32 by five
    *     squarings — only +, *, / — with u clamped to [-16, 16], where
    *     the approximation is monotone and within a few percent. p(0) =
    *     exactly 0.5, so the decision boundary is exact.
    *   - Per-row IRLS weights w = p(1-p) (floored at 1e-6) and working
    *     response z = u + (y-p)/w (clamped to ±100 — gradient clipping)
    *     QUANTIZE to integers (w·1e9, z·1e6): the corpus-wide sums are
    *     then exact integer sums — order-independent under any
    *     partitioning, the property double sums cannot give. The
    *     quantized inputs are bit-identical on both engines (every op
    *     producing them is exact), so the floor buckets agree.
    *   - Each iteration's weighted normal equations scale back to
    *     doubles and solve through the SAME generated cofactor stages
    *     as ridge ([[RidgeSolver.stages]], stage 1 swapped for the
    *     scale-correcting [[irlsStage1]]); λ = 1 stays on the full
    *     diagonal, so the system is always invertible.
    *
    * Shape at scale: `iters` aggregation passes over the feature frame
    * (each map-side-combined, one 1-row result), one broadcast scoring
    * pass — at 100 TB, three passes to train instead of ridge's one,
    * still zero exchanges to score. Magnitude bounds: wq ≤ 2.5e8,
    * |zq| ≤ 1e8, features ≤ ~1e8 pathological ⇒ every summed product
    * ≤ ~2.5e24/row, ≤ ~1e37 over 1e12 rows — inside DECIMAL(38,0) /
    * HUGEINT exactly.
    */
  private[ext] val irlsRowStages: Seq[Seq[String]] = {
    val keep = Seq("doc_id", "x1", "x2", "x3", "y")
    val eta = "b0 + b1 * CAST(x1 AS DOUBLE) + b2 * CAST(x2 AS DOUBLE) + b3 * CAST(x3 AS DOUBLE)"
    Seq(
      keep :+ s"greatest(least($eta, CAST(16 AS DOUBLE)), CAST(-16 AS DOUBLE)) AS u",
      keep ++ Seq("u", "1 - u / 32 AS g"),
      keep ++ Seq("u", "g * g AS g2"),
      keep ++ Seq("u", "g2 * g2 AS g4"),
      keep ++ Seq("u", "g4 * g4 AS g8"),
      keep ++ Seq("u", "g8 * g8 AS g16"),
      keep ++ Seq("u", "g16 * g16 AS g32"),
      keep ++ Seq("u", "1 / (1 + g32) AS p"),
      keep ++ Seq("u", "p", "greatest(p * (1 - p), CAST(0.000001 AS DOUBLE)) AS w"),
      keep ++ Seq(
        "CAST(floor(w * 1000000000) AS BIGINT) AS wq",
        "CAST(floor(greatest(least(u + (y - p) / w, CAST(100 AS DOUBLE)), " +
          "CAST(-100 AS DOUBLE)) * 1000000) AS BIGINT) AS zq"))
  }

  /** The weighted sums of one IRLS iteration. `big` wraps the leading
    * factor in the engine's exact wide integer type (DECIMAL(38,0) on
    * Spark, HUGEINT on DuckDB — the [[sums]]/HUGEINT split this module
    * already uses); everything downstream of the sums is shared text.
    */
  private def irlsSums(big: String => String): Seq[String] =
    Seq(s"COALESCE(SUM(${big("wq")}), 0) AS s0q") ++
      (1 to 3).map(i => s"COALESCE(SUM(${big("wq")} * x$i), 0) AS s${i}q") ++
      (for (i <- 1 to 3; j <- i to 3)
        yield s"COALESCE(SUM(${big("wq")} * x$i * x$j), 0) AS s$i${j}q") ++
      Seq(s"COALESCE(SUM(${big("wq")} * zq), 0) AS r0q") ++
      (1 to 3).map(i => s"COALESCE(SUM(${big("wq")} * zq * x$i), 0) AS r${i}q")

  /** Stage 1 of the IRLS solve: scale the quantized sums back to
    * doubles (1e9 for the weight scale, 1e15 = weight × response
    * scales) and add the λ = 1 ridge diagonal — emitting the p/q names
    * [[RidgeSolver.stages]]' cofactor stages expect, which then run
    * UNCHANGED.
    */
  private[ext] def irlsStage1: Seq[String] = {
    val sc9 = "CAST(1000000000 AS DOUBLE)"
    val sc15 = "CAST(1000000000000000 AS DOUBLE)"
    Seq(s"CAST(s0q AS DOUBLE) / $sc9 + 1 AS p00") ++
      (1 to 3).map(j => s"CAST(s${j}q AS DOUBLE) / $sc9 AS p0$j") ++
      (for (i <- 1 to 3; j <- i to 3) yield
        if (i == j) s"CAST(s$i${j}q AS DOUBLE) / $sc9 + 1 AS p$i$j"
        else s"CAST(s$i${j}q AS DOUBLE) / $sc9 AS p$i$j") ++
      Seq(s"CAST(r0q AS DOUBLE) / $sc15 AS q0") ++
      (1 to 3).map(i => s"CAST(r${i}q AS DOUBLE) / $sc15 AS q$i")
  }

  private def irlsSolveStages: Seq[Seq[String]] =
    irlsStage1 +: RidgeSolver.stages(3).tail

  /** Train the IRLS logistic on a (doc_id, x1..x3, y) frame: the 1-row
    * (b0..b3) frame after `iters` fixed iterations from β = 0, fully
    * in-plan.
    */
  def trainIrls3(feat: DataFrame, iters: Int = 3): DataFrame = {
    val s = feat.sparkSession
    var beta = s.range(1).selectExpr(
      (0 to 3).map(i => s"CAST(0 AS DOUBLE) AS b$i"): _*)
    for (_ <- 0 until iters) {
      val quant = irlsRowStages
        .foldLeft(feat.crossJoin(broadcast(beta)))((d, st) => d.selectExpr(st: _*))
      val sums = quant.selectExpr(
        irlsSums(x => s"CAST($x AS DECIMAL(38,0))"): _*)
      beta = irlsSolveStages.foldLeft(sums)((d, st) => d.selectExpr(st: _*))
    }
    beta
  }

  /** Probability-score docs against a trained IRLS row: (doc_id, x1..x3,
    * keep, prob, pred) — prob ∈ (0, 1), pred = prob ≥ 0.5 (≡ η ≥ 0).
    */
  def scoreIrls3(feat: DataFrame, beta: DataFrame): DataFrame =
    irlsRowStages.take(8)
      .foldLeft(feat.crossJoin(broadcast(beta)))((d, st) => d.selectExpr(st: _*))
      .selectExpr("doc_id", "x1", "x2", "x3", "y AS keep",
        "round(p, 6) AS prob",
        "CAST(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred")

  /** IRLS train-on-self + probability scoring. */
  def distillIrls3(docs: DataFrame): DataFrame = {
    val feat = features3(docs)
    scoreIrls3(feat, trainIrls3(feat))
  }

  /** The full IRLS oracle chain after a `feat` CTE: per iteration the
    * ten row stages, the HUGEINT sums, and the shared solve stages;
    * emits `it3` (the final β row) and `scored`.
    */
  private def irlsCtes(iters: Int = 3): String = {
    def rowCtes(tag: String, betaSrc: String, n: Int): String =
      irlsRowStages.take(n).zipWithIndex.map { case (st, k) =>
        val from = if (k == 0) s"feat, $betaSrc" else s"${tag}r$k"
        s"${tag}r${k + 1} AS (SELECT ${st.mkString(", ")} FROM $from)"
      }.mkString(",\n")
    val it0 = s"it0 AS (SELECT ${(0 to 3).map(i => s"CAST(0 AS DOUBLE) AS b$i").mkString(", ")})"
    val iterCtes = (1 to iters).map { k =>
      val solve = irlsSolveStages.zipWithIndex.map { case (st, i) =>
        val from = if (i == 0) s"i${k}sm" else s"i${k}k$i"
        s"i${k}k${i + 1} AS (SELECT ${st.mkString(", ")} FROM $from)"
      }.mkString(",\n")
      s"""${rowCtes(s"i$k", s"it${k - 1}", irlsRowStages.size)},
         |i${k}sm AS (SELECT ${irlsSums(x => s"CAST($x AS HUGEINT)").mkString(", ")} FROM i${k}r${irlsRowStages.size}),
         |$solve,
         |it$k AS (SELECT * FROM i${k}k${irlsSolveStages.size})""".stripMargin
    }.mkString(",\n")
    s"""$it0,
       |$iterCtes,
       |${rowCtes("fs", s"it$iters", 8)},
       |scored AS (
       |  SELECT doc_id, x1, x2, x3, y AS keep, round(p, 6) AS prob,
       |    CAST(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |  FROM fsr8)""".stripMargin
  }

  /** X-QC4 — calibrated learned quality: the 3-feature rule gate
    * distilled into a LOGISTIC model by three in-plan IRLS iterations;
    * the output score is a probability. The oracle re-runs the entire
    * fit — the rational-sigmoid row stages, the quantized exact sums,
    * and the generated cofactor solve are the SAME text on both engines
    * — so the hash pins every iteration's β, the probability
    * arithmetic, and the 0.5 boundary. QualityModelSpec pins agreement
    * ≥ the ridge distillation's.
    */
  private val qc4 = Probe(
    "x_qc4_learned_quality_irls",
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS w FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(w, x -> length(x))) * 100 // nullif(len(w), 0) AS BIGINT) AS mean_len_c,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1000000 // nullif(len(w), 0) AS BIGINT) AS alpha_ppm,
       |    CAST(len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) AS BIGINT) AS stop_hits
       |  FROM t),
       |feat AS (
       |  SELECT doc_id, mean_len_c AS x1, alpha_ppm // 1000 AS x2, stop_hits AS x3,
       |    CAST(CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
       |              AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM m WHERE n_words > 0),
       |${irlsCtes()}
       |SELECT * FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
    distillIrls3(Tables(s, dir, "documents")).orderBy("doc_id")
  }

  val all: Seq[Probe] = Seq(qc1, qc2, qc3, qc4)
}
