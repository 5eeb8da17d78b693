package graft

import graft.ext.BloomIndex
import org.apache.spark.sql.functions._

/** Persisted doc-digest Bloom filter: no false negatives ever, the
  * prefilter-then-confirm result equals exact membership, and the
  * confirm join really does run on the Bloom-positive fraction only.
  */
class BloomIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every indexed doc is bloom-positive") {
    val s = spark
    import s.implicits._
    val docs = Tables(spark, dir, "documents")
    val idx = graft.util.TempDirs.scratch("bloom_spec_fn")
    BloomIndex.build(docs, idx)
    val neg = BloomIndex.mightContain(docs, BloomIndex.load(spark, idx))
      .filter(col("bloom_pos") =!= 1L).count()
    assert(neg == 0L)
  }

  test("markDuplicates == exact membership on a planted base/shard split") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumped over the lazy dog"),
      (3L, "shared page body text")).toDF("doc_id", "text")
    val shard = Seq(
      (10L, "shared page body text"),     // exact dup of 3
      (11L, "a genuinely new document"),
      (12L, "the quick brown fox"),       // exact dup of 1
      (13L, "another unseen page")).toDF("doc_id", "text")
    val idx = graft.util.TempDirs.scratch("bloom_spec_dup")
    BloomIndex.build(base, idx)
    val out = BloomIndex.markDuplicates(shard, BloomIndex.load(spark, idx),
        base.select(md5(col("text")).as("h")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    assert(out == List((10L, 1L), (11L, 0L), (12L, 1L), (13L, 0L)))
  }

  test("the confirm join sees only bloom positives, never the full shard") {
    val s = spark
    import s.implicits._
    val docs = Tables(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val shard = docs.filter(col("doc_id") % 3 === 0)
    val idx = graft.util.TempDirs.scratch("bloom_spec_prune")
    BloomIndex.build(base, idx)
    val bloom = BloomIndex.load(spark, idx)
    val nShard = shard.count()
    val nPositive = BloomIndex.mightContain(shard, bloom)
      .filter(col("bloom_pos") === 1L).count()
    val nDup = BloomIndex.markDuplicates(shard, bloom,
      base.select(md5(col("text")).as("h")))
      .filter(col("is_dup") === 1L).count()
    // the synthetic corpus carries some exact duplicates but is mostly
    // unique text, so the prefilter must strictly prune — and every
    // confirmed dup must have been bloom-positive (no false negatives)
    assert(nPositive < nShard, s"prefilter pruned nothing: $nPositive/$nShard")
    assert(nDup <= nPositive)
  }

  test("Corpus.dedupExactIncremental survivors == plain exact anti-join") {
    val docs = Tables(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val shard = docs.filter(col("doc_id") % 3 === 0)
    val idx = graft.util.TempDirs.scratch("bloom_spec_door")
    BloomIndex.build(base, idx)
    val viaBloom = graft.api.Corpus(shard)
      .dedupExactIncremental(idx, base.select(md5(col("text")).as("h")))
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = shard.join(
        base.select(md5(col("text")).as("h2")).distinct(),
        md5(col("text")) === col("h2"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact && viaBloom.nonEmpty)
  }

  test("merged shard filter == filter built on the union, bit for bit") {
    val docs = Tables(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 3 === 1)
    val shard = docs.filter(col("doc_id") % 3 === 2)
    val p = graft.util.TempDirs.scratch("bloom_spec_merge")
    BloomIndex.build(base, s"$p/base")
    BloomIndex.mergeBloom(spark, s"$p/base", shard, s"$p/merged")
    BloomIndex.build(base.unionAll(shard), s"$p/full")
    def bits(path: String) = BloomIndex.load(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bits(s"$p/merged") == bits(s"$p/full") && bits(s"$p/merged").nonEmpty)
  }

  test("dense zero-state form == sparse join form on the real corpus") {
    val docs = Tables(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val idx = graft.util.TempDirs.scratch("bloom_spec_dense")
    BloomIndex.build(base, idx)
    val bloom = BloomIndex.load(spark, idx)
    val sparse = BloomIndex.mightContain(docs, bloom)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dense = BloomIndex.mightContainDense(docs, BloomIndex.denseRow(bloom))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(dense == sparse && dense.nonEmpty)
  }

  test("geometry: word indexes bounded by m/32, bits nonzero, m/k plumbed") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val m = 1024; val k = 3
    val idx = graft.util.TempDirs.scratch("bloom_spec_geo")
    BloomIndex.build(base, idx, m, k)
    val rows = BloomIndex.load(spark, idx).collect()
    assert(rows.nonEmpty && rows.forall { r =>
      r.getLong(0) >= 0 && r.getLong(0) < m / 32 && r.getLong(1) != 0L
    })
    // total set bits <= n_docs * k (dedup across collisions allowed)
    val setBits = rows.map(r => java.lang.Long.bitCount(r.getLong(1))).sum
    assert(setBits <= 2 * k && setBits > 0)
    val pos = BloomIndex.mightContain(base, BloomIndex.load(spark, idx), m, k)
      .filter(col("bloom_pos") === 1L).count()
    assert(pos == 2L)
  }
}
