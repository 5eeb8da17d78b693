package graft

import graft.api.Corpus
import graft.ext.BandIndex
import org.apache.spark.sql.functions._

/** Persisted MinHash band index: the index-read path must drop exactly the
  * docs the recompute path drops (x_ded9 semantics), and the prefix-
  * partitioned layout must prune at the parquet scan.
  */
class BandIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rmr(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmr))
    f.delete()
  }

  test("dedupIncremental(indexDir) == dedupIncremental(oldCorpus) survivors") {
    val docs = Tables(spark, dir, "documents")
    val newShard = docs.filter(col("doc_id") % 3 === 0)
    val oldCorpus = docs.filter(col("doc_id") % 3 =!= 0)
    val idxDir = java.nio.file.Files.createTempDirectory("graft_band_idx").toString
    try {
      BandIndex.build(oldCorpus, idxDir)
      val viaIndex = Corpus(newShard).dedupIncremental(idxDir).df
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaRecompute = Corpus(newShard).dedupIncremental(oldCorpus).df
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaIndex == viaRecompute)
      // non-vacuous: the x_ded9-style split drops SOME new docs here
      val allNew = newShard.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaIndex.nonEmpty && viaIndex != allNew,
        "index path dropped nothing — the parity check would be vacuous")
    } finally rmr(new java.io.File(idxDir))
  }

  test("index rows == recomputed band rows; scan is prefix-pruned") {
    val docs = Tables(spark, dir, "documents")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_band_idx2").toString
    try {
      BandIndex.build(docs, idxDir)
      val idx = BandIndex.load(spark, idxDir)
      // lossless: the persisted (doc_id, band, sig) set is exactly the
      // generator's output, and sig_p really is the sig prefix
      val got = idx.select(col("doc_id"), col("band"), col("sig")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = graft.ext.Dedup.minhashBandsNative(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want && got.nonEmpty)
      assert(idx.filter(substring(col("sig"), 1, BandIndex.defaultPrefixChars)
        =!= col("sig_p")).count() == 0)
      // the on-disk layout IS the index: a prefix filter prunes at the scan
      val pruned = idx.filter(col("sig_p") === "00")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(sig_p"), plan)
    } finally rmr(new java.io.File(idxDir))
  }

  test("collidingNewIds: DYNAMIC partition pruning fires on the index scan") {
    val docs = Tables(spark, dir, "documents")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_band_idx3").toString
    try {
      BandIndex.build(docs.filter(col("doc_id") % 3 =!= 0), idxDir)
      val idx = BandIndex.load(spark, idxDir)
      // a 1-doc new shard names at most 2 sig_p prefixes — the index scan
      // must be restricted to those partitions at RUNTIME via the
      // broadcast build side (the claim in collidingNewIds' contract:
      // footprint follows collision density, not released-corpus size)
      val out = BandIndex.collidingNewIds(docs.filter(col("doc_id") === 0L), idx)
      out.write.format("noop").mode("overwrite").save()
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning on the index scan:\n$plan")
    } finally rmr(new java.io.File(idxDir))
  }
}
