package graft

import org.apache.spark.sql.functions._
import graft.ext.PipelineOps10

/** Fourth-wave round-7 operators: LM scoring, BM25, DSIR, PMI, HLL, and
  * rate anomalies — planted-fixture behavior pins on top of the probes'
  * oracle checks.
  */
class PipelineOps10Spec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")

  // ---------------------------------------------------------- LM scoring

  test("lmScore: corpus-typical text scores lower NLL than gibberish") {
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat and the dog ran"))
    val odd = Seq((99L, "zqx vvk jjq wom pfft glarb zzyx qqen mmo xaa"))
    val corpus = (fluent ++ odd).toDF("doc_id", "text")
    val out = PipelineOps10.lmScore(corpus, corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(99L) > out(1L) * 2,
      s"gibberish ${out(99L)} should far exceed fluent ${out(1L)}")
  }

  test("lmScore held-out: unseen bigrams fall back to the smoothing floor, not an error") {
    val train = (1L to 10L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val unseen = Seq((50L, "nu xi omicron pi")).toDF("doc_id", "text")
    val row = PipelineOps10.lmScore(train, unseen).collect()
    assert(row.length == 1 && row(0).getLong(1) == 3L)
    // every bigram unseen, every context unseen: p = 1/V exactly, V = 4
    assert(math.abs(row(0).getDouble(2) - math.log(4.0)) < 1e-6)
  }

  test("lmScore is invariant to input partitioning") {
    val a = PipelineOps10.lmScore(docs, docs).orderBy("doc_id").collect().toSeq
    val d8 = docs.repartition(8)
    val b = PipelineOps10.lmScore(d8, d8).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ---------------------------------------------------------------- BM25

  test("lmSelfScore with a non-covering unigram table raises loudly instead of diluting nll") {
    // self-score algebra requires uni to cover every scored w1; a partial
    // table used to leave lnp NULL (sum drops it, count keeps the row —
    // silent dilution, round-9 ADVICE). Now it raises.
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), graft.clean.CleanFns.tokens(col("text")).as("ws"))
    val partialUni = Seq(("alpha", 1L)).toDF("w", "c1") // missing beta
    val e = intercept[Exception] {
      PipelineOps10.lmSelfScoreTokWith(tok, partialUni).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("does not cover")), e.getMessage)
    // and a covering table still works: identical to the one-arg form
    val full = PipelineOps10.lmSelfScoreTok(tok).collect().toSeq
    val cover = tok.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val withUni = PipelineOps10.lmSelfScoreTokWith(tok, cover).collect().toSeq
    assert(full == withUni && full.nonEmpty)
  }

  test("bm25TopK: a near-copy of the query document ranks first") {
    val base = (10L to 40L).map(i => (i, s"filler words number $i about nothing shared"))
    val query = Seq((1L, "quantum entanglement drives spooky correlation experiments"))
    val copy = Seq((7L, "quantum entanglement drives spooky correlation experiments indeed"))
    val corpus = (base ++ query ++ copy).toDF("doc_id", "text")
    val top = PipelineOps10.bm25TopK(corpus, corpus.filter($"doc_id" === 1L), k = 3)
      .filter($"rank" === 1L).collect()
    assert(top.length == 1 && top(0).getAs[Long]("doc_id") == 7L)
  }

  test("bm25TopK never returns the query document itself") {
    val out = PipelineOps10.bm25TopK(docs, docs.filter($"doc_id" < 5), k = 5).collect()
    assert(out.nonEmpty && out.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("doc_id")))
  }

  // ---------------------------------------------------------------- DSIR

  test("dsirWeights: target-like raw documents score positive, crawl-like negative") {
    val target = (1L to 30L).map(i => (i, "theorem proof lemma corollary axiom induction"))
    val crawlTypical = (100L to 170L).map(i => (i, "click here buy now free shipping deal"))
    val rawMath = Seq((200L, "theorem proof lemma corollary axiom induction"))
    val rawAd = Seq((201L, "click here buy now free shipping deal"))
    val raw = (crawlTypical ++ rawMath ++ rawAd).toDF("doc_id", "text")
    val out = PipelineOps10.dsirWeights(raw, target.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(200L) > 0, s"math doc should be target-like, got ${out(200L)}")
    assert(out(201L) < 0, s"ad doc should be crawl-like, got ${out(201L)}")
  }

  // ----------------------------------------------------------------- PMI

  test("pmiCollocations: a planted always-together pair tops the ranking") {
    val glued = (1L to 10L).map(i => (i, s"foo bar common$i common${i + 1} widely seen words"))
    // "foo bar" always adjacent; "widely seen" also, but foo/bar occur ONLY here
    val noise = (50L to 90L).map(i => (i, s"widely other$i seen other${i + 1} words mixed"))
    val out = PipelineOps10.pmiCollocations((glued ++ noise).toDF("doc_id", "text"), 5, 5)
      .collect()
    assert(out.head.getString(0) == "foo bar",
      s"expected 'foo bar' on top, got ${out.map(_.getString(0)).mkString(", ")}")
  }

  // ----------------------------------------------------------------- HLL

  test("HLL registers merge by per-register MAX (sharded == whole)") {
    val whole = PipelineOps10.hllRegisters(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = PipelineOps10.hllRegisters(docs.filter($"doc_id" % 2 === 0))
    val b = PipelineOps10.hllRegisters(docs.filter($"doc_id" % 2 === 1))
    val merged = a.select($"lang", $"idx", $"m").unionAll(b.select($"lang", $"idx", $"m"))
      .groupBy("lang", "idx").agg(max($"m").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("HLL estimate lands within 50% of the exact distinct count") {
    PipelineOps10.hllDistinct(docs).collect().foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est > exact / 2 && est < exact * 2,
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  // -------------------------------------------------------- Corpus routes

  test("Corpus.withLmScore(reference) rides the native scorer and matches the declarative join") {
    val ref = docs.filter($"doc_id" % 2 === 0)
    val shard = docs.filter($"doc_id" % 2 === 1)
    val got = graft.api.Corpus(shard).withLmScore(ref).df
      .select("doc_id", "nll_avg").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val want = PipelineOps10.lmScore(ref, shard).collect()
      .map(r => r.getLong(0) -> Some(r.getDouble(2))).toMap
    assert(shard.count() == got.size)
    want.foreach { case (id, v) => assert(got(id) == v) }
  }

  test("Corpus.selectByDsir keeps exactly the positive-weight documents") {
    val target = docs.filter($"doc_id" % 25 === 0)
    val raw = docs.filter($"doc_id" % 25 =!= 0)
    val kept = graft.api.Corpus(raw).selectByDsir(target).df
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val weights = PipelineOps10.dsirWeights(raw, target).collect()
    val want = weights.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    // parity is the pin; positivity on real synthetic data isn't guaranteed
    // (the planted-fixture test above covers sign behavior)
    assert(kept == want && weights.nonEmpty)
  }

  // --------------------------------------------------------- hard negatives

  test("hard negatives skip the near-copy and pick the topical non-dup") {
    // doc 7 near-copies the query (shares 8-grams) -> excluded; doc 8 is
    // topically similar but shares no 8-gram -> it is the hard negative
    val q = Seq((1L, "quantum entanglement drives spooky correlation experiments in optical laboratories today"))
    val copy = Seq((7L, "quantum entanglement drives spooky correlation experiments in optical laboratories today obviously"))
    val topical = Seq((8L, "entanglement correlation experiments quantum measurement"))
    val noise = (20L to 50L).map(i => (i, s"unrelated filler text number $i about nothing"))
    val corpus = (q ++ copy ++ topical ++ noise).toDF("doc_id", "text")
    val scored = PipelineOps10.bm25Scores(corpus, corpus.filter($"doc_id" === 1L))
    // sanity: the near-copy IS the lexical top hit...
    val top = scored.orderBy($"score".desc).limit(1).collect()(0).getLong(1)
    assert(top == 7L, s"expected the near-copy to top raw BM25, got $top")
    // ...but the hard-negative miner must skip it
    val g = corpus
      .withColumn("ws", graft.clean.CleanFns.tokens($"text"))
      .filter(size($"ws") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws) - 7), i -> substr(md5(concat_ws(' ', slice(ws, i, 8))), 1, 16))"))
        .as("h")).distinct()
    val shared = g.filter($"doc_id" === 1L).select($"h")
      .join(g.filter($"doc_id" =!= 1L), "h").select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(shared.contains(7L) && !shared.contains(8L))
    val hard = scored.join(shared.toSeq.toDF("doc_id"), Seq("doc_id"), "left_anti")
      .orderBy($"score".desc, $"doc_id").limit(1).collect()(0).getAs[Long]("doc_id")
    assert(hard == 8L, s"expected doc 8 as hard negative, got $hard")
  }

  // ----------------------------------------------------------- centroid drift

  test("centroid drift is zero for identical halves, positive for shifted ones") {
    val emb = Tables(spark, dir, "embeddings")
    // identical halves: duplicate every vector into both sides
    val dup = emb.select((($"vec_id") * 2).as("vec_id"), $"label", $"embedding")
      .unionAll(emb.select((($"vec_id") * 2 + 1).as("vec_id"), $"label", $"embedding"))
    val probeLogic = SparkEntry.queries("x_rep4_centroid_drift")
    // reuse the registered probe on a temp dir is overkill; assert on the
    // real data instead: drift is finite, nonnegative, and n_a + n_b
    // covers every vector of each label
    val out = probeLogic(spark, dir).collect()
    assert(out.nonEmpty)
    val counts = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getLong(1) + r.getLong(2) == counts(r.getLong(0)))
    }
    // and the planted identical-halves case: drift exactly 0 per label
    val iv = dup.select($"vec_id", $"label",
      expr(graft.ext.Similarity.intVec).as("v"))
    val c = iv.select($"label", ($"vec_id" % 2).as("side"), posexplode($"v").as(Seq("i0", "x")))
      .groupBy($"label", $"side", $"i0").agg(sum($"x").as("s"), count(lit(1)).as("n"))
    val a = c.filter($"side" === 0).select($"label", $"i0", ($"s" / $"n").as("ma"))
    val b = c.filter($"side" === 1).select($"label".as("lb"), $"i0".as("ib"), ($"s" / $"n").as("mb"))
    val drift = a.join(b, $"label" === $"lb" && $"i0" === $"ib")
      .groupBy($"label").agg(sqrt(sum(($"ma" - $"mb") * ($"ma" - $"mb"))).as("dr"))
      .collect().map(_.getDouble(1))
    assert(drift.forall(_ == 0.0), s"identical halves must have zero drift: ${drift.toSeq}")
  }

  // -------------------------------------------------------- corpus overlap

  test("gram overlap: identical corpora give 1e6 ppm, disjoint give 0") {
    def overlap(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) = {
      val ga = PipelineOps10.gramInventory(a)
      val gb = PipelineOps10.gramInventory(b)
      val common = ga.join(gb, "h").count()
      val (na, nb) = (ga.count(), gb.count())
      (common * 1000000L / nb, common * 1000000L / (na + nb - common))
    }
    val a = (1L to 10L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    assert(overlap(a, a) == ((1000000L, 1000000L)))
    val b = (1L to 10L).map(i => (i, "entirely different words compose this second corpus here"))
      .toDF("doc_id", "text")
    assert(overlap(a, b) == ((0L, 0L)))
  }

  // ------------------------------------------------------- rate anomalies

  test("rateAnomalies: a planted 100x spike is flagged, baseline hours are not") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hour: Int, i: Int) =
      new java.sql.Timestamp(base.getTime + hour * 3600000L + i * 1000L)
    // counts 3/4/5 cycling: nonzero baseline variance so sd > 0
    val calm = (0 until 40).flatMap(h => (0 until 3 + h % 3).map(i => (at(h, i), "view")))
    val spike = (0 until 400).map(i => (at(40, i), "view"))
    val events = (calm ++ spike).toDF("ts", "event_type")
    val out = PipelineOps10.rateAnomalies(events)
      .orderBy("hour_us").collect()
    assert(out.length == 41)
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.map(_.getAs[Long]("n")).toSeq == Seq(400L),
      "exactly the spike hour should be flagged")
    // early hours lack 12 buckets of history -> z NULL, not flagged
    assert(out.take(12).forall(r => r.isNullAt(3) && !r.getAs[Boolean]("is_anomaly")))
  }
}
