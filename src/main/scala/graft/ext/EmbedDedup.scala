package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Probe, Tables}

/** Embedding near-duplicate detection at scale: banded sign-random-
  * projection LSH for candidate generation, exact integer-quantized cosine
  * for verification.
  *
  * x_ded5 (the declared exact baseline) joins all same-label pairs —
  * quadratic in corpus size. This operator is its scale path, the
  * vector-space sibling of the MinHash chain (x_ded2 → dedupNearVerified):
  *
  *  1. 16 hyperplane sign bits per vector. The hyperplane matrix is
  *     data-independent and derived from md5(plane, dim) — deterministic,
  *     engine-portable, and tiny (16×64 ±1 entries), so it rides into the
  *     signature expression as a broadcast literal and the signature is a
  *     NARROW per-row fold: zero exchanges, no 1024× row explosion (the
  *     x_sim2 probe form), stream-compatible.
  *  2. 4 bands × 4 bits: vectors sharing any band value become candidates
  *     (one band-keyed shuffle — the only exchange in candidate
  *     generation, same shape as the MinHash band join).
  *  3. Exact verification: cosine over the shared floor(x*1e6) integer
  *     quantization (Similarity.intVec), pairs kept at >= tau.
  *
  * Recall is the standard banded-LSH curve (P[candidate] =
  * 1-(1-p^4)^4 with p = 1 - theta/pi); raise bands or lower band width for
  * higher recall — the oracle replicates whatever the parameters are.
  */
object EmbedDedup {

  val planes = 16
  val dims = 64
  val bandsN = 4
  val bandBits = 4

  /** The ±1 hyperplane matrix, row-major (plane-major): entry for plane bb
    * (1-based) and dim i (1-based) sits at index (bb-1)*dims + (i-1).
    * Sign rule shared with x_sim2's oracle: +1 iff hex digit
    * 1 + ((i*7 + bb*13) mod 32) of md5("bb_i") is >= '8'. Computed once
    * driver-side (java MD5 == Spark md5 == DuckDB md5 on the same ASCII
    * input) and shipped as a literal array.
    */
  lazy val signs: Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (bb <- 1 to planes; i <- 1 to dims) yield {
      val hex = md.digest(s"${bb}_$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      md.reset()
      if (hex.charAt((i * 7 + bb * 13) % 32) >= '8') 1.0 else -1.0
    }
  }

  /** Plane bb's sign row as a SQL array literal — 64 ±1.0 doubles, the
    * broadcast-literal form the native dot product consumes.
    */
  private def planeLit(bb: Int): String =
    signs.slice((bb - 1) * dims, bb * dims)
      .map(s => if (s > 0) "1.0D" else "-1.0D")
      .mkString("array(", ", ", ")")

  /** One native-codegen dot product of the quantized vector against plane
    * bb's literal sign row. This is the load-bearing formulation: the
    * earlier HOF version (aggregate over sequence(1, 64) indexing a
    * 1024-double literal) was correct but catastrophically slow — each
    * downstream reference to `bits` re-inlined the whole interpreted fold
    * under CollapseProject, and the band derivation referenced it 16x,
    * compounding to a multi-million-node expression tree (x_ded13: 527 s
    * at sf0.1). Sixteen dot_d calls against 64-element literals keep the
    * tree small and every cycle inside whole-stage codegen: same algebra,
    * same oracle, 200x faster.
    */
  private def planeDot(bb: Int): Column = expr(s"dot_d(v, ${planeLit(bb)})")

  /** (vec_id, v, n2, bits): quantized vector, self-dot, and the 16 sign
    * bits as an int array — one narrow projection, zero exchanges.
    */
  def signatures(embeddings: DataFrame): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    embeddings
      .withColumn("v", expr(Similarity.intVec))
      .withColumn("n2", expr("dot_d(v, v)"))
      .withColumn("bits", array((1 to planes).map(bb =>
        when(planeDot(bb) > 0, 1).otherwise(0)): _*))
  }

  /** Near-duplicate pairs (a_id, b_id, cos): banded LSH candidates,
    * exact-cosine verified at `tau`.
    */
  def nearDupPairs(embeddings: DataFrame, tau: Double): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    // band values straight from the plane dots (bit j of band k is plane
    // (k-1)*bandBits + j), skipping the bits array so no expression is
    // ever re-inlined 16x; 4 ints per row, all codegen.
    val bandCols = (1 to bandsN).map { k =>
      (1 to bandBits).map { j =>
        when(planeDot((k - 1) * bandBits + j) > 0, lit(1 << (j - 1))).otherwise(lit(0))
      }.reduce(_ + _)
    }
    // sig fans out THREE ways (both self-join sides + the verification
    // vector lookups): persist or recompute the signature projection per
    // branch — at 100 TB this is the checkpointed signature table.
    val sig = embeddings
      .withColumn("v", expr(Similarity.intVec))
      .withColumn("n2", expr("dot_d(v, v)"))
      .select(col("vec_id"), col("v"), col("n2"), array(bandCols: _*).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(col("vec_id"), posexplode(col("bands")).as(Seq("band", "bval")))
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct() // a pair may collide in several bands; verify it once
    val va = sig.select(col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2"))
    val vb = sig.select(col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2"))
    cand.join(va, "a_id").join(vb, "b_id")
      .withColumn("cos", expr("dot_d(av, bv)") / sqrt(col("an2") * col("bn2")))
      .filter(col("cos") >= tau)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  /** X-DED13 — the banded chain over the embeddings table at tau = 0.35
    * (x_ded5's threshold: every surviving pair is also an x_ded5 pair; the
    * delta is the declared LSH recall, which the oracle replicates
    * band-for-band).
    */
  private val ded13 = Probe(
    "x_ded13_embed_lsh",
    """WITH iv AS (
      |  SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM iv),
      |d AS (
      |  SELECT vec_id, bb,
      |    SUM(CASE WHEN substr(md5(bb || '_' || i), 1 + ((i * 7 + bb * 13) % 32), 1)
      |             IN ('8','9','a','b','c','d','e','f') THEN v[i] ELSE -v[i] END) AS dot
      |  FROM iv, UNNEST(generate_series(1, 16)) AS t1(bb), UNNEST(generate_series(1, 64)) AS t2(i)
      |  GROUP BY vec_id, bb),
      |bands AS (
      |  SELECT vec_id, (bb - 1) // 4 AS band,
      |         SUM(CASE WHEN dot > 0 THEN CAST(power(2, (bb - 1) % 4) AS BIGINT) ELSE 0 END) AS bval
      |  FROM d GROUP BY vec_id, (bb - 1) // 4),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id)
      |SELECT c.a_id, c.b_id,
      |       round(list_sum(list_transform(list_zip(na.v, nb.v), z -> z[1] * z[2])) /
      |             sqrt(na.n2 * nb.n2), 6) AS cos
      |FROM cand c JOIN n na ON na.vec_id = c.a_id JOIN n nb ON nb.vec_id = c.b_id
      |WHERE list_sum(list_transform(list_zip(na.v, nb.v), z -> z[1] * z[2])) /
      |      sqrt(na.n2 * nb.n2) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    nearDupPairs(Tables(s, dir, "embeddings"), tau = 0.35)
      .orderBy("a_id", "b_id")
  }

  /** Near-dup RESOLUTION for vectors: LSH-verified pairs clustered into
    * connected components (transitive closure — A≈B, B≈C groups all
    * three), each vector labeled with its component (min vec_id) and
    * cluster size; the survivor policy is then "keep comp_id". Reuses the
    * text chain's iterative `Dedup.connectedComponents` — same
    * action-bound cost model, rounds = cluster diameter.
    */
  def dedupClusters(embeddings: DataFrame, tau: Double): DataFrame =
    graft.ext.Dedup.connectedComponents(
        nearDupPairs(embeddings, tau)
          .select(col("a_id").as("a"), col("b_id").as("b")))
      .select(col("doc_id").as("vec_id"), col("comp_id"), col("n_reach"))

  /** X-DED14 — embedding dedup resolved end to end: x_ded13's verified
    * pair set → components → (vec_id, comp_id, n_reach), hash-matched
    * against the DuckDB WITH RECURSIVE closure over the identical banded
    * pair SQL. The vector-space completion of the x_ded7 text form.
    */
  private val ded14 = Probe(
    "x_ded14_embed_clusters",
    """WITH RECURSIVE iv AS (
      |  SELECT vec_id, list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x * x)) AS n2 FROM iv),
      |d AS (
      |  SELECT vec_id, bb,
      |    SUM(CASE WHEN substr(md5(bb || '_' || i), 1 + ((i * 7 + bb * 13) % 32), 1)
      |             IN ('8','9','a','b','c','d','e','f') THEN v[i] ELSE -v[i] END) AS dot
      |  FROM iv, UNNEST(generate_series(1, 16)) AS t1(bb), UNNEST(generate_series(1, 64)) AS t2(i)
      |  GROUP BY vec_id, bb),
      |bands AS (
      |  SELECT vec_id, (bb - 1) // 4 AS band,
      |         SUM(CASE WHEN dot > 0 THEN CAST(power(2, (bb - 1) % 4) AS BIGINT) ELSE 0 END) AS bval
      |  FROM d GROUP BY vec_id, (bb - 1) // 4),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id),
      |pr AS (
      |  SELECT c.a_id AS a, c.b_id AS b
      |  FROM cand c JOIN n na ON na.vec_id = c.a_id JOIN n nb ON nb.vec_id = c.b_id
      |  WHERE list_sum(list_transform(list_zip(na.v, nb.v), z -> z[1] * z[2])) /
      |        sqrt(na.n2 * nb.n2) >= 0.35),
      |ed AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
      |reach(a, b) AS (
      |  SELECT DISTINCT a, a FROM ed
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN ed e ON r.b = e.a)
      |SELECT a AS vec_id, MIN(b) AS comp_id, CAST(COUNT(*) AS BIGINT) AS n_reach
      |FROM reach GROUP BY a ORDER BY vec_id""".stripMargin) { (s, dir) =>
    dedupClusters(Tables(s, dir, "embeddings"), tau = 0.35).orderBy("vec_id")
  }

  val all: Seq[Probe] = Seq(ded13, ded14)
}
