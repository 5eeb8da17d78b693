package graft

import org.apache.spark.sql.functions._

/** Round-4 batch 3: substring-duplicate detection, quality rules, and the
  * oracle-checked scale demonstrators (salted join, bucketed join).
  */
class PipelineOps3Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("x_ded10: planted shared 8-gram span is detected, unique docs are clean") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h unique tail one"),   // shares a-h with doc 2
      (2L, "a b c d e f g h different suffix"),
      (3L, "totally distinct words with no overlap at all here"),
      (4L, "short doc")                            // < 8 tokens: no grams
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ded10_fixture")

    // same logic as the probe, against the fixture
    val grams = docs
      .select(col("doc_id"), graft.clean.CleanFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> substr(md5(concat_ws(' ', slice(toks, i, 8))), 1, 16))"))
        .as("h")).distinct()
    val shared = grams.groupBy("h").count().filter(col("count") >= 2).select("h")
    val dup = grams.join(shared, "h").groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(dup.getOrElse(1L, 0L) == 1L, s"doc 1 should carry exactly the planted gram: $dup")
    assert(dup.getOrElse(2L, 0L) == 1L)
    assert(!dup.contains(3L), "unique doc flagged as duplicated")
    assert(!dup.contains(4L), "sub-8-token doc must produce no grams")
  }

  test("x_ded10 probe: every doc row, dup_ppm bounded, short docs excluded") {
    val out = SparkEntry.queries("x_ded10_substring_dup")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000000))
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)), "n_dup must be <= n_grams")
    assert(out.exists(r => r.getLong(2) > 0), "testdata plants dups; none found")
  }

  test("x_txt11: rule arithmetic on a hand-computed doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // 12 words, all alphabetic, 2 stopwords ('the','of'), lengths sum=50
      (1L, "the cat of doom sat over yonder hill watching quiet birds fly"),
      (2L, "x1 9 #!")  // 3 words, no stopwords -> dropped
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_txt11") // not used by probe; local calc

    val w = docs.select(col("doc_id"), graft.clean.CleanFns.tokens(lower(col("text"))).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        expr("aggregate(w, 0L, (acc, x) -> acc + length(x)) * 100 DIV size(w)").as("mean_len_c"),
        expr("size(filter(w, x -> x rlike '[a-z]')) * 1000000L DIV size(w)").as("alpha_ppm"),
        expr("size(filter(w, x -> array_contains(array('the','and','of','to','a','in','is','that'), x)))")
          .cast("long").as("stop_hits"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(w(1L) == ((12L, 416L, 1000000L, 2L)), s"got ${w(1L)}") // 50*100/12=416
    assert(w(2L)._4 == 0L && w(2L)._3 < 1000000L)
  }

  test("x_txt11 probe: keep flag consistent with its own surfaced signals") {
    val rows = SparkEntry.queries("x_txt11_quality_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ml, ap, sh, keep) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expect = if (n >= 10 && n <= 100000 && ml >= 200 && ml <= 1000 &&
        ap >= 600000 && sh >= 2) 1L else 0L
      assert(keep == expect, s"doc ${r.getLong(0)}: keep=$keep but signals=($n,$ml,$ap,$sh)")
    }
    // the rule set must be discriminating, not all-pass / all-drop
    val kept = rows.count(_.getLong(5) == 1L)
    assert(kept > 0 && kept < rows.length, s"kept $kept of ${rows.length}")
  }

  test("x_skew1: salted join aggregate equals the plain join aggregate") {
    val salted = SparkEntry.queries("x_skew1_salted_join")(spark, dir).collect()
    val plain = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("revenue"))
      .orderBy("s_nationkey").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("x_smp3: weighted mix is deterministic and matches its epoch semantics") {
    val run1 = SparkEntry.queries("x_smp3_weighted_mix")(spark, dir).collect()
    val run2 = SparkEntry.queries("x_smp3_weighted_mix")(spark, dir).collect()
    assert(run1.toSeq == run2.toSeq, "weighted mix must be reproducible")
    assert(run1.map(r => (r.getLong(0), r.getLong(1))).distinct.length == run1.length,
      "(doc_id, epoch) must be unique")
    val bySid = run1.groupBy(r => r.getString(2).drop(3).toInt)
    // sid < 5: 2 full epochs always present + ~50% third epoch
    bySid.filter(_._1 < 5).foreach { case (_, rows) =>
      val perDoc = rows.groupBy(_.getLong(0)).values.map(_.length)
      assert(perDoc.forall(n => n == 2 || n == 3))
    }
    // 5 <= sid < 10: exactly one copy, epoch 0
    bySid.filter(kv => kv._1 >= 5 && kv._1 < 10).foreach { case (_, rows) =>
      assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 1))
      assert(rows.forall(_.getLong(1) == 0L))
    }
    // sid >= 10: downsampled to ~25% — strictly fewer rows than docs
    val down = bySid.filter(_._1 >= 10).values.map(_.length).sum
    val downDocs = Tables(spark, dir, "documents")
      .filter(expr("CAST(substr(source, 4) AS INT) >= 10")).count()
    assert(down > 0 && down < downDocs, s"downsample kept $down of $downDocs")
  }

  test("x_smp4: (shard, pos) is a total permutation, invariant to partitioning") {
    val out = SparkEntry.queries("x_smp4_shuffle")(spark, dir).collect()
    val docs = Tables(spark, dir, "documents")
    assert(out.length == docs.count().toInt)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "each doc exactly once")
    // pos is dense 1..n within every shard
    out.groupBy(_.getString(1)).foreach { case (sh, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq == (1L to rows.length.toLong), s"shard $sh positions not dense")
    }
    // content-independent determinism: same permutation from a 1-partition input
    val one = docs.coalesce(1)
    one.createOrReplaceTempView("smp4_one")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("ord", "doc_id")
    val again = one
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"),
        substring(md5(col("doc_id").cast("string")), 3, 16).as("ord"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos").orderBy("shard", "pos").collect()
    assert(again.toSeq == out.toSeq, "permutation must not depend on input partitioning")
  }

  test("x_bkt1: bucketed join plans with zero exchanges when broadcast is off") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ext.PipelineOps3.joinBucketed(s, dir)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed fact-to-fact join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // both scans read bucketed layouts (the Sorts above them are
      // partition-LOCAL — no data movement; Spark's sorted-bucket read
      // path is legacy-flagged off since 3.0, so the sorts stay)
      assert("Bucketed: true".r.findAllIn(plan).length == 2, plan)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
