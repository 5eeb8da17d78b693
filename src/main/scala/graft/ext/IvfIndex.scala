package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: the train-once / query-many ANN pattern.
  *
  * At 100 TB you cannot re-train the coarse quantizer per query — the
  * index IS data: centroids and cell assignments are parquet tables built
  * in one pass and reused by every subsequent query job. Queries probe
  * `nProbes` nearest cells, so each query scores |corpus| * nProbes / nCells
  * candidates instead of the full corpus, and the candidate join is a
  * broadcast (queries) against a cell-pruned corpus scan.
  *
  * Same exact-integer arithmetic as x_sim3/x_sim4 (Similarity.intVec
  * quantization, dot_d fused products, floor-mean Lloyd step,
  * (d2, c_id) tiebreaks) — IvfIndexSpec pins query(trained index) equal to
  * the oracle-checked x_sim4_ivf_trained rows.
  */
object IvfIndex {

  /** centroids: (c_id, cv); assignments: (vec_id, cell, v, n2). */
  final case class Handle(centroids: DataFrame, assignments: DataFrame)

  private def withD2(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", expr("dot_d(v, v) - 2 * dot_d(v, cv) + dot_d(cv, cv)"))

  private val byD2 = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c_id"))

  /** One pass over `embeddings` (vec_id, embedding): deterministic seed
    * centroids (vec_id < nCentroids), `lloydSteps` exact floor-mean
    * refinements, final cell assignment + cached norms.
    */
  def train(spark: SparkSession, embeddings: DataFrame,
      nCentroids: Int = 8, lloydSteps: Int = 1): Handle = {
    graft.GraftExtensions.register(spark)
    val iv = embeddings.select(col("vec_id"), expr(Similarity.intVec).as("v"))

    // deterministic seeds = the nCentroids smallest vec_ids PRESENT (a
    // plain `vec_id < n` filter degenerates to an empty index on tables
    // whose ids don't start densely at 0)
    var cent = iv.orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    var step = 0
    while (step < lloydSteps) {
      val assign = withD2(iv, cent)
        .withColumn("rn", row_number().over(byD2)).filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id").as("cell"))
      cent = assign.join(iv, "vec_id")
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(expr("CAST(CAST(SUM(col) AS BIGINT) DIV COUNT(*) AS DOUBLE)").as("m"))
        .groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cv"))
        .select(col("cell").as("c_id"), col("cv"))
      step += 1
    }
    val assignments = withD2(iv, cent)
      .withColumn("rn", row_number().over(byD2)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("v"),
        expr("dot_d(v, v)").as("n2"))
    Handle(cent, assignments)
  }

  /** Persist both tables; assignments partitioned BY CELL so a query that
    * probes 2 of N cells reads 2/N of the corpus (partition pruning at the
    * scan — the on-disk layout is the index).
    */
  def save(h: Handle, dir: String): Unit = {
    h.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    h.assignments.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assignments")
  }

  def load(spark: SparkSession, dir: String): Handle = {
    graft.GraftExtensions.register(spark)
    Handle(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
  }

  /** Top-k cosine neighbors for `queries` (vec_id, embedding), probing the
    * `nProbes` nearest cells per query. Self-matches (same vec_id) are
    * excluded.
    */
  def query(h: Handle, queries: DataFrame, k: Int, nProbes: Int = 2): DataFrame = {
    val q0 = queries.select(col("vec_id"), expr(Similarity.intVec).as("v"))
    val probes = withD2(q0, h.centroids)
      .withColumn("rn", row_number().over(byD2)).filter(col("rn") <= nProbes)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        expr("dot_d(v, v)").as("qn2"), col("c_id").as("cell"))
    val wR = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand_id"))
    h.assignments
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumnRenamed("vec_id", "cand_id")
      .withColumn("cos", expr("dot_d(qv, v)") / sqrt(col("qn2") * col("n2")))
      .withColumn("rnk", row_number().over(wR).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("cand_id").as("c_id"),
        round(col("cos"), 6).as("score"))
  }
}
