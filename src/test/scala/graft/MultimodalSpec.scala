package graft

import graft.ext.Multimodal

/** Multimodal plumbing: media bundle schema, batched feature extraction,
  * and the resize stub contract.
  */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("media bundle carries BINARY content + typed metadata") {
    val m = Multimodal.mediaTable(spark, dir)
    val row = m.head()
    assert(row.meta.mime == "text/plain")
    assert(row.content.length.toLong == row.meta.n_bytes)
    assert(row.meta.sha_prefix.length == 8)
  }

  test("extractFeatures is deterministic and length-consistent") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 4))
  }

  test("resizeStub preserves ids and carries requested dimensions") {
    val out = Multimodal.resizeStub(Multimodal.mediaTable(spark, dir), 224, 224)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(f => f.feature(0) == 224.0 && f.feature(1) == 224.0))
    assert(out.map(_.doc_id).distinct.length == out.length)
  }
}
