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

  test("pngTable emits genuine PNG bytes; decode round-trips the generator exactly") {
    val media = Multimodal.pngTable(spark, dir)
    val sample = media.head(5)
    assert(sample.nonEmpty)
    // real PNG magic, real mime, honest byte accounting
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sample.foreach { r =>
      assert(r.content.take(8).sameElements(magic), s"doc ${r.doc_id}: not a PNG")
      assert(r.meta.mime == "image/png" && r.meta.n_bytes == r.content.length.toLong)
    }
    // decoded pixel stats == the closed-form generator, computed here
    // independently of both the codec and the DuckDB oracle
    val got = Multimodal.decodePngStats(media)
      .collect().map(p => p.doc_id -> p).toMap
    got.values.foreach { p =>
      val id = p.doc_id
      val w = 8 + id % 9
      val h = 8 + id % 7
      val vs = for (x <- 0L until w; y <- 0L until h) yield (id * 31 + x * 7 + y * 13) % 256
      assert(p.width == w && p.height == h && p.n_pixels == w * h, s"doc $id dims")
      assert(p.sum_gray == vs.sum, s"doc $id sum")
      assert(p.n_bright == vs.count(_ >= 128), s"doc $id bright")
    }
    assert(got.nonEmpty)
  }

  test("resizeStub preserves ids and carries requested dimensions") {
    val out = Multimodal.resizeStub(Multimodal.mediaTable(spark, dir), 224, 224)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(f => f.feature(0) == 224.0 && f.feature(1) == 224.0))
    assert(out.map(_.doc_id).distinct.length == out.length)
  }
}
