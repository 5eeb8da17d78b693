package graft

import org.apache.spark.sql.functions._

/** Non-vacuous dedup semantics: the sf0.01 gate data has no duplicate
  * document texts (every hash group is a singleton there), so survivor
  * selection and copy counting are pinned here on planted duplicates.
  */
class DedupSpec extends SparkSuite {

  test("x_ded1b survivor is the smallest id and copies are counted") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // plant: every doc duplicated once with a higher id; doc 0 tripled
    val planted = docs
      .unionAll(docs.withColumn("doc_id", col("doc_id") + 10000L))
      .unionAll(docs.filter(col("doc_id") === 0).withColumn("doc_id", lit(20000L)))
    planted.createOrReplaceTempView("dedup_planted")

    val out = planted
      .groupBy(md5(col("text")).as("content_fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))

    val n = docs.count()
    assert(out.count() == n) // one group per distinct text
    // every survivor is an ORIGINAL id (never a planted higher id)
    assert(out.filter(col("survivor_id") >= 10000L).count() == 0)
    val copies = out.select("n_copies").groupBy("n_copies").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copies(3L) == 1L)     // doc 0: original + shifted + tripled
    assert(copies(2L) == n - 1)  // everyone else: original + shifted
  }

  test("x_ded3b banded counts match brute force on planted near-dups") {
    import spark.implicits._
    import graft.ext.Dedup
    // Two identical texts (Hamming 0 — must count each other), one
    // unrelated text, one identical text in a DIFFERENT source bucket
    // (must NOT count), so both the band join and the bucket key are live.
    val docs = Seq(
      (1L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (3L, "en", "web", "completely unrelated text about database engines"),
      (4L, "en", "books", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "lang", "source", "text")
    val sig = Dedup.simhashSig(docs).persist()
    val out = Dedup.simhashBandedCounts(sig)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
    // brute-force parity over the same signatures
    val a = sig.select(col("doc_id").as("a_id"), col("lang"), col("source"), col("simhash").as("a_sh"))
    val b = sig.select(col("doc_id").as("b_id"), col("lang").as("lb"), col("source").as("sb"), col("simhash").as("b_sh"))
    val brute = a.join(b, a("lang") === b("lb") && a("source") === b("sb") &&
        a("a_id") =!= b("b_id") && expr("bit_count(a_sh ^ b_sh) <= 2"), "left")
      .groupBy("a_id").agg(count(col("b_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == brute)
    sig.unpersist()
  }

  test("x_ded7 connected components: chains merge, comp id is the min, sizes exact") {
    import spark.implicits._
    import graft.ext.Dedup
    // chain 1-2-3-4-5 (diameter 4: forces multiple propagation rounds),
    // pair {10,11}, singleton-pair {20,21}, and an isolated vertex 99
    // appears in NO pair so it must NOT appear in the output
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L)).toDF("a", "b")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("connectedComponents with checkpointing: identical output, no cached-RDD leak") {
    import spark.implicits._
    import graft.ext.Dedup
    val ckDir = graft.util.TempDirs.scratch("graft-ck") // deleted at JVM exit
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.catalog.clearCache() // isolate the leak assertion from prior tests
    // same 3-component graph as the plain test: a diameter-4 chain (so the
    // loop runs past one checkpoint), two pair components
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L)).toDF("a", "b")
    val out = Dedup.connectedComponents(pairs, checkpointEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
    // reliable checkpoints are file-backed and every round's persist was
    // handed off to one: converged call leaves nothing in the block manager
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toList.toString)
  }

  test("connectedComponents gate parity: local union-find endgame == distributed loop") {
    import spark.implicits._
    import graft.ext.Dedup
    // deep chain + clique + pairs: contraction leaves a nonempty contracted
    // graph, so the gate genuinely chooses between endgames
    val pairs = ((0L until 30L).sliding(2).map(s => (s(1), s(0))).toSeq ++
      Seq((40L, 41L), (41L, 42L), (40L, 42L), (50L, 51L))).toDF("a", "b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = Dedup.connectedComponents(pairs, localFinishMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(local == dist)
    assert(local.filter(_._1 < 30L).forall(t => t._2 == 0L && t._3 == 30L))
  }

  test("x_ded1 survivor is the newest event, ties broken by event_id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, "click", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (2L, "click", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      (3L, "click", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")), // tie: higher id wins
      (4L, "view", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02")))
      .toDF("event_id", "event_type", "user_id", "ts")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val survivors = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(3L, 4L))
  }
}
