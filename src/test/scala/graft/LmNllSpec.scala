package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.PipelineOps10
import graft.functions.LmNll

/** Native per-row LM scorer: ≡ the declarative explode-join-aggregate
  * form on the real corpus; interpreted ≡ codegen; smoothing-floor and
  * short-document semantics pinned.
  */
class LmNllSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

  test("native scorer == declarative lmScore on the real corpus") {
    val idx = PipelineOps10.lmIndex(docs)
    assert(rows(PipelineOps10.lmScoreNative(docs, idx)) ==
      rows(PipelineOps10.lmScore(docs, docs)))
  }

  test("held-out regime: native == declarative including unseen fallbacks") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val heldOut = docs.filter(col("doc_id") % 10 === 0)
    assert(rows(PipelineOps10.lmScoreNative(heldOut, PipelineOps10.lmIndex(train))) ==
      rows(PipelineOps10.lmScore(train, heldOut)))
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    val train = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon zeta"))
      .toDF("doc_id", "text")
    val idx = PipelineOps10.lmIndex(train)
    val texts = Seq("alpha beta gamma", "unseen words entirely", "single", "")
    val viaDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = PipelineOps10.lmScoreNative(viaDf, idx)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val e = LmNll(
      org.apache.spark.sql.catalyst.expressions.Literal.create("x", org.apache.spark.sql.types.StringType),
      idx.hbs.map(UTF8String.fromString).toArray, idx.c2s.toArray,
      idx.ws.map(UTF8String.fromString).toArray, idx.c1s.toArray, idx.v)
    texts.zipWithIndex.foreach { case (t, i) =>
      val interp = e.compute(UTF8String.fromString(t))
      if (interp == null) assert(!native.contains(i.toLong), s"'$t' should be filtered")
      else assert(native(i.toLong) == ((interp.getLong(0), interp.getDouble(1))),
        s"'$t': interpreted ${interp} != codegen ${native(i.toLong)}")
    }
    // the two short rows really were dropped (scorer emits no row for < 2 tokens)
    assert(native.size == 2)
  }

  test("persisted LM store round-trips to the identical native index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lm_rt").toString
    try {
      graft.ext.LmStore.buildLm(docs, tmp)
      val loaded = graft.ext.LmStore.loadLmIndex(spark, tmp)
      val direct = PipelineOps10.lmIndex(docs)
      assert(loaded == direct)
      // and the join-regime scorer over the stored tables == direct lmScore
      val (uni, bgc) = graft.ext.LmStore.loadLmTables(spark, tmp)
      assert(rows(PipelineOps10.lmScoreWith(docs, uni, bgc)) ==
        rows(PipelineOps10.lmScore(docs, docs)))
    } finally {
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmr))
        f.delete()
      }
      rmr(new java.io.File(tmp))
    }
  }

  test("index build refuses tables beyond the broadcast-regime ceiling, loudly") {
    val e = intercept[IllegalArgumentException] {
      PipelineOps10.lmIndex(docs, maxEntries = 10L)
    }
    assert(e.getMessage.contains("join form"),
      s"gate must name the scale route: ${e.getMessage}")
    assert(PipelineOps10.lmIndex(docs).v > 0) // real corpus is under the default gate
  }

  test("fully-unseen text hits the exact smoothing floor ln(V)") {
    val train = (1L to 5L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val idx = PipelineOps10.lmIndex(train)
    assert(idx.v == 4L)
    val out = PipelineOps10.lmScoreNative(
      Seq((9L, "nu xi omicron")).toDF("doc_id", "text"), idx).collect()
    assert(out.length == 1)
    assert(math.abs(out(0).getDouble(2) - math.log(4.0)) < 1e-6)
  }
}
