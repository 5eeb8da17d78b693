package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.PipelineOps13
import graft.functions.RepetitionSignals

/** Native one-pass repetition gate: ≡ the declarative algebra on the
  * real corpus, interpreted ≡ codegen, the digest tie-break pinned on a
  * planted tie with UNEQUAL lengths, and stream ≡ batch.
  */
class RepetitionSignalsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("native == declarative on the real corpus, column for column") {
    val docs = Tables(spark, dir, "documents")
    assert(rows(PipelineOps13.repetitionSignalsNative(docs)) ==
      rows(PipelineOps13.repetitionSignals(docs)))
  }

  test("digest tie-break: tied top grams with UNEQUAL lengths agree cross-form") {
    // 2-gram tie at c=2 between "aa bb" (len 5) and "cc ddd" (len 6):
    // the chosen gram changes the ppm, so this pins the tie-break rule
    val d = Seq((1L, "aa bb aa bb cc ddd cc ddd"),
      (2L, "x y x y x y"), (3L, ""), (4L, "one")).toDF("doc_id", "text")
    val native = rows(PipelineOps13.repetitionSignalsNative(d))
    assert(native == rows(PipelineOps13.repetitionSignals(d)))
    // and the tied value is one of the two legal masses (10 or 12 of 38:
    // positions 2·"aa bb"(5) + "bb aa" + "bb cc" + 2·"cc ddd"(6) + "ddd cc")
    val top2 = native.head(3).asInstanceOf[Long]
    assert(top2 == 10L * 1000000 / 38 || top2 == 12L * 1000000 / 38, s"top2=$top2")
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    val texts = Seq("aa bb aa bb cc ddd cc ddd", "x y x y x y", "", "solo",
      (1 to 40).map(i => s"w${i % 6}").mkString(" "))
    val viaDf = PipelineOps13.repetitionSignalsNative(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val interp = RepetitionSignals.compute(UTF8String.fromString(t))
      val got = Seq(interp.getLong(0), interp.getLong(1), interp.getLong(2),
        interp.getLong(3), interp.getLong(4), interp.getLong(5), interp.getInt(6))
      assert(viaDf(i.toLong) == got, s"'$t'")
    }
  }

  test("streaming repetition gate == batch on the same documents") {
    val streaming = graft.streaming.DocStreams.repetitionScored(
      graft.streaming.DocStreams.readStream(spark, dir))
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("rep_out").start()
    try {
      q.processAllAvailable()
      val got = rows(spark.table("rep_out"))
      val want = rows(PipelineOps13.repetitionSignals(Tables(spark, dir, "documents")))
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }
}
