package graft

import org.apache.spark.sql.functions._
import graft.ext.PipelineOps11

/** Sixth-wave round-7 operators: corpus-health monitoring between
  * releases — planted-fixture behavior pins on top of the probes'
  * oracle checks.
  */
class PipelineOps11Spec extends SparkSuite {
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "lang", "n_chars")

  test("psiDrift: identical snapshots have zero PSI in every bucket") {
    val docs = mk((1L to 40L).map(i => (i, if (i % 2 == 0) "en" else "de", 100L + i)))
    val out = PipelineOps11.psiDrift(docs, docs, Seq("lang" -> col("lang")))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(4) == 0.0))
  }

  test("psiDrift: a bucket present only in one snapshot stays finite and signed") {
    // old: 30 en + 10 zh; new: 30 en only — zh vanished, en share grew
    val old = mk((1L to 30L).map(i => (i, "en", 100L)) ++
      (31L to 40L).map(i => (i, "zh", 100L)))
    val neu = mk((1L to 30L).map(i => (i, "en", 100L)))
    val out = PipelineOps11.psiDrift(old, neu, Seq("lang" -> col("lang")))
      .collect().map(r => r.getString(1) -> r).toMap
    val zh = out("zh"); val en = out("en")
    assert(zh.getLong(3) == 0L && !zh.getDouble(4).isInfinite && !zh.getDouble(4).isNaN)
    assert(zh.getDouble(4) > 0.0, "a vanished bucket contributes positive PSI")
    assert(en.getDouble(4) > 0.0, "a grown bucket contributes positive PSI")
    // the vanished slice dominates the drift signal
    assert(zh.getDouble(4) > en.getDouble(4))
  }

  test("psiDrift: total PSI ranks a reshuffled corpus above a stable one") {
    val old = mk((1L to 50L).map(i => (i, if (i <= 25) "en" else "de", 100L)))
    val stable = mk((1L to 50L).map(i => (i, if (i <= 24) "en" else "de", 100L)))
    val moved = mk((1L to 50L).map(i => (i, if (i <= 45) "en" else "de", 100L)))
    def total(n: org.apache.spark.sql.DataFrame): Double =
      PipelineOps11.psiDrift(old, n, Seq("lang" -> col("lang")))
        .agg(sum("psi6")).collect()(0).getDouble(0)
    assert(total(stable) < 0.01, "one-doc wobble is noise")
    assert(total(moved) > 0.25, "a 40-point share shift must trip the release gate")
  }

  test("psiDrift is invariant to input partitioning") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val feats = Seq("lang" -> col("lang"), "len_bin" -> expr("n_chars DIV 64"))
    val a = PipelineOps11.psiDrift(
      docs.filter(col("doc_id") % 3 =!= 0), docs.filter(col("doc_id") % 5 =!= 0),
      feats).collect().toSeq
    val b = PipelineOps11.psiDrift(
      docs.filter(col("doc_id") % 3 =!= 0).repartition(8),
      docs.filter(col("doc_id") % 5 =!= 0).repartition(8),
      feats).collect().toSeq
    assert(a == b)
  }
}
