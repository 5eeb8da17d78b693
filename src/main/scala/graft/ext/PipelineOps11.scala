package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 additions (sixth wave): corpus-health monitoring between
  * releases. The fourth/fifth waves scored documents against learned
  * statistics; this wave watches the STATISTICS THEMSELVES move between
  * corpus snapshots — the release-gate checks a data team runs before
  * shipping crawl N+1 to training.
  */
object PipelineOps11 {

  /** Population-stability-index drift between two corpus snapshots, per
    * feature bucket. For each named feature (a bucketing expression over
    * the document columns), compares the bucket-share distribution of
    * `oldDocs` vs `newDocs` and emits the per-bucket PSI contribution
    * `(p_new - p_old) * ln(p_new / p_old)` under Laplace smoothing
    * `p = (n + 1) / (tot + k)` (k = buckets observed for that feature
    * across BOTH snapshots — smoothing keeps one-sided buckets finite
    * and makes the sum a proper PSI). The standard release monitor:
    * total PSI < 0.1 noise, 0.1–0.25 investigate, > 0.25 block the
    * release; per-bucket contributions name the slice that moved.
    *
    * Scale shape: each snapshot contributes one narrow scan projecting
    * (feature, bucket) pairs — no text, no join between the snapshots —
    * then ONE exchange on (feature, bucket) for the count aggregation.
    * The window pass runs over the aggregated frame (rows = distinct
    * buckets, thousands at most, never corpus-sized). Deterministic
    * double math: counts are exact integers, shares are single IEEE
    * divisions, and the one transcendental (ln) is rounded at 6 dp on
    * both engines. Split as [[bucketCounts]] (per snapshot) →
    * [[psiAgainst]] (the finisher) so the incremental and streaming
    * regimes reuse the released side's PERSISTED counts instead of
    * rescanning the released corpus.
    */
  def psiDrift(oldDocs: DataFrame, newDocs: DataFrame,
      features: Seq[(String, Column)]): DataFrame =
    psiAgainst(bucketCounts(oldDocs, features), bucketCounts(newDocs, features))

  /** (feature, bucket, n): one narrow scan projecting every document's
    * feature buckets, one exchange for the count. The release-time
    * artifact of the incremental drift regime: persist these counts at
    * ship time and `psiAgainst` every candidate (or every streaming
    * micro-batch) without ever rescanning the released corpus.
    */
  def bucketCounts(docs: DataFrame, features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "bucketCounts needs at least one feature")
    val feats = array(features.map { case (name, c) =>
      struct(lit(name).as("feature"), c.cast("string").as("bucket"))
    }: _*)
    docs.select(explode(feats).as("f"))
      .select(col("f.feature").as("feature"), col("f.bucket").as("bucket"))
      .groupBy("feature", "bucket").agg(count(lit(1)).as("n"))
  }

  /** The PSI finisher over two pre-aggregated count frames (shape =
    * [[bucketCounts]]): full-outer join on (feature, bucket) — absent
    * buckets count 0 on the missing side — then the smoothed-share
    * algebra. Runs over bucket frames (thousands of rows), never the
    * corpora; batch and streaming regimes share this exact code.
    */
  def psiAgainst(baseCounts: DataFrame, newCounts: DataFrame): DataFrame = {
    val counts = baseCounts.withColumnRenamed("n", "__no")
      .join(newCounts.withColumnRenamed("n", "__nn"),
        Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        coalesce(col("__no"), lit(0L)).as("n_old"),
        coalesce(col("__nn"), lit(0L)).as("n_new"))
    val w = Window.partitionBy("feature")
    val pOld = (col("n_old") + lit(1)).cast("double") /
      (col("tot_old") + col("k")).cast("double")
    val pNew = (col("n_new") + lit(1)).cast("double") /
      (col("tot_new") + col("k")).cast("double")
    counts
      .withColumn("tot_old", sum("n_old").over(w))
      .withColumn("tot_new", sum("n_new").over(w))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("psi6", round((pNew - pOld) * log(pNew / pOld), 6))
      .select(col("feature"), col("bucket"),
        col("n_old").cast("long").as("n_old"),
        col("n_new").cast("long").as("n_new"), col("psi6"))
      .orderBy("feature", "bucket")
  }

  /** X-REP5 — PSI drift over the x_cur3 snapshot convention (old =
    * doc_id % 3 ≠ 0, new = doc_id % 5 ≠ 0) across two monitored
    * features: the language mix and the length profile (64-char bins
    * of n_chars). The oracle recomputes the identical smoothed-share
    * algebra; ln is the only transcendental and both engines round it
    * at 6 dp.
    */
  private val rep5 = Probe(
    "x_rep5_psi_drift",
    """WITH o AS (SELECT lang, n_chars FROM documents WHERE doc_id % 3 <> 0),
      |n AS (SELECT lang, n_chars FROM documents WHERE doc_id % 5 <> 0),
      |t AS (
      |  SELECT 'lang' AS feature, lang AS bucket, 1 AS is_old, 0 AS is_new FROM o
      |  UNION ALL SELECT 'len_bin', CAST(n_chars // 64 AS VARCHAR), 1, 0 FROM o
      |  UNION ALL SELECT 'lang', lang, 0, 1 FROM n
      |  UNION ALL SELECT 'len_bin', CAST(n_chars // 64 AS VARCHAR), 0, 1 FROM n),
      |c AS (SELECT feature, bucket, SUM(is_old) AS n_old, SUM(is_new) AS n_new
      |      FROM t GROUP BY feature, bucket),
      |s AS (SELECT feature, bucket, n_old, n_new,
      |        SUM(n_old) OVER (PARTITION BY feature) AS tot_old,
      |        SUM(n_new) OVER (PARTITION BY feature) AS tot_new,
      |        COUNT(*) OVER (PARTITION BY feature) AS k
      |      FROM c)
      |SELECT feature, bucket,
      |  CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
      |  round((CAST(n_new + 1 AS DOUBLE) / CAST(tot_new + k AS DOUBLE)
      |       - CAST(n_old + 1 AS DOUBLE) / CAST(tot_old + k AS DOUBLE))
      |      * ln((CAST(n_new + 1 AS DOUBLE) / CAST(tot_new + k AS DOUBLE))
      |          / (CAST(n_old + 1 AS DOUBLE) / CAST(tot_old + k AS DOUBLE))), 6)
      |    AS psi6
      |FROM s ORDER BY feature, bucket""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    psiDrift(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      Seq("lang" -> col("lang"), "len_bin" -> expr("n_chars DIV 64")))
  }

  val all: Seq[Probe] = Seq(rep5)
}
