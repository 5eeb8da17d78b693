package graft

import org.apache.spark.sql.functions._

/** PQ/ADC: code-range and determinism invariants plus a recall sanity
  * check that the quantized ranking tracks the exact one.
  */
class Similarity2Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("PQ top-5: ADC distance is deterministic and never negative; ranks are 1..5") {
    val out = SparkEntry.queries("x_sim7_pq_adc")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) >= 0L))
    assert(out.forall(_.getLong(4) >= 0L))
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach(rows => assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L)))
    // run twice: identical (no nondeterministic tie-breaks)
    val again = SparkEntry.queries("x_sim7_pq_adc")(spark, dir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("PQ ADC top-5 substantially overlaps the exact-L2 top-5") {
    graft.GraftExtensions.register(spark)
    val iv = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(graft.ext.Similarity.intVec).as("v"))
    val q = iv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = iv.select(col("vec_id").as("c_id"), col("v").as("cv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("c_id"))
    val exactTop = broadcast(q).join(c, col("c_id") =!= col("q_id"))
      .withColumn("d2", expr("dot_d(qv, qv) - 2 * dot_d(qv, cv) + dot_d(cv, cv)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("q_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcTop = SparkEntry.queries("x_sim7_pq_adc")(spark, dir)
      .select(col("q_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (exactTop intersect adcTop).size.toDouble / exactTop.size
    // 64x compression cannot be lossless, and near-uniform synthetic
    // embeddings are PQ's worst case (no cluster structure for codebooks
    // to exploit). Chance is ~5/499 ~ 1% per query; observed ~24% — pin
    // well above chance, below the optimistic real-encoder regime.
    assert(overlap >= 0.12, s"ADC recall vs exact top-5 too low: $overlap")
  }

  test("IVFPQ results are the PQ ranking restricted to probed-cell candidates") {
    // every x_sim8 hit must carry the same ADC distance x_sim7 computes for
    // that (query, candidate) pair — IVF changes WHICH candidates are
    // scored, never HOW they are scored (x_sim7 only surfaces its top-5,
    // so the cross-check applies where the pair appears in both)
    val fullMap = SparkEntry.queries("x_sim7_pq_adc")(spark, dir)
      .select(col("q_id"), col("c_id"), col("adc_d2"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ivfpq = SparkEntry.queries("x_sim8_ivfpq")(spark, dir).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      fullMap.get(key).foreach(d => assert(d == r.getLong(3), s"ADC drift at $key"))
    }
    // and the candidate restriction is real: IVFPQ scores a strict subset
    val nIvf = SparkEntry.queries("x_sim8_ivfpq")(spark, dir).count()
    assert(nIvf == 25)
  }
}
