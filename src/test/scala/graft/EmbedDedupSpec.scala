package graft

import org.apache.spark.sql.functions._
import graft.ext.{EmbedDedup, Similarity}

/** Banded sign-LSH embedding dedup: precision is absolute (every returned
  * pair is exact-cosine verified), recall is the declared LSH subset of the
  * brute-force pair set, and the literal sign matrix must agree with the
  * engines' md5.
  */
class EmbedDedupSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables(spark, dir, "embeddings")

  test("driver-side sign matrix matches Spark's md5 derivation") {
    // The matrix is computed with java MessageDigest; the oracle recomputes
    // it with DuckDB md5 and x_sim2 established Spark md5 == DuckDB md5.
    // Pin driver == Spark so all three derivations are the same function.
    val viaSpark = spark.sql(
      s"""SELECT bb, i,
         |  CASE WHEN substr(md5(concat(cast(bb AS STRING), '_', cast(i AS STRING))),
         |                   cast(1 + (i * 7 + bb * 13) % 32 AS INT), 1)
         |            IN ('8','9','a','b','c','d','e','f')
         |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
         |FROM (SELECT explode(sequence(1, ${EmbedDedup.planes})) AS bb)
         |LATERAL VIEW explode(sequence(1, ${EmbedDedup.dims})) AS i""".stripMargin)
      .collect().map(r => ((r.getInt(0) - 1) * EmbedDedup.dims + r.getInt(1) - 1, r.getDouble(2)))
      .sortBy(_._1).map(_._2).toSeq
    assert(viaSpark == EmbedDedup.signs)
  }

  test("every returned pair is exact-verified at tau") {
    val tau = 0.35
    val pairs = EmbedDedup.nearDupPairs(emb, tau).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getDouble(2) >= tau))
  }

  test("pairs are a subset of the brute-force pair set; recall is substantial") {
    graft.GraftExtensions.register(spark)
    val tau = 0.35
    val n = emb.select(col("vec_id"), expr(Similarity.intVec).as("v"))
      .withColumn("n2", expr("dot_d(v, v)"))
    val a = n.select(col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2"))
    val b = n.select(col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", expr("dot_d(av, bv)") / sqrt(col("an2") * col("bn2")))
      .filter(col("cos") >= tau)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = EmbedDedup.nearDupPairs(emb, tau).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), s"LSH produced non-pairs: ${lsh -- brute}")
    // 16-bit/4-band recall at tau=0.35 is ~0.4+ in theory; these synthetic
    // clusters sit well above tau so observed recall is far higher. The
    // floor just guards against a silent band-algebra break (recall ~0).
    assert(lsh.size >= brute.size / 4, s"recall collapsed: ${lsh.size}/${brute.size}")
  }

  test("dedupClusters: component labels are transitive and minimal") {
    val clusters = EmbedDedup.dedupClusters(emb, tau = 0.35).collect()
    assert(clusters.nonEmpty)
    val byComp = clusters.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      // the label IS the minimum member id, and every member agrees on size
      assert(members.map(_.getLong(0)).min == comp)
      assert(members.forall(_.getLong(2) == members.length.toLong))
    }
    // resolution is consistent with the pair set: every paired vector is
    // labeled, and both ends of every pair share a component
    val pairs = EmbedDedup.nearDupPairs(emb, 0.35).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val label = clusters.map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
  }

  test("signature stage is narrow: zero exchanges") {
    val plan = EmbedDedup.signatures(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
