package graft

import graft.ext.QualityModel
import org.apache.spark.sql.functions._

/** Closed-form ridge distillation: the in-plan 3×3 solve matches a
  * hand-computed solve bit-for-bit, a separable planted corpus is
  * classified exactly, the real-corpus distillation has useful
  * fidelity, and degenerate inputs stay finite.
  */
class QualityModelSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("in-plan solve == hand-computed normal equations (same IEEE sequence)") {
    val s = spark
    import s.implicits._
    val feat = Seq(
      (1L, 300L, 900L, 1L), (2L, 250L, 950L, 1L), (3L, 800L, 200L, 0L),
      (4L, 900L, 100L, 0L), (5L, 400L, 800L, 1L)).toDF("doc_id", "x1", "x2", "y")
    val got = QualityModel.trainRidge(feat).collect()(0)
    // same sums, same cofactor sequence, in Scala doubles
    val rows = Seq((300L, 900L, 1L), (250L, 950L, 1L), (800L, 200L, 0L),
      (900L, 100L, 0L), (400L, 800L, 1L))
    val n = rows.size.toLong
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val s11 = rows.map(r => r._1 * r._1).sum
    val s12 = rows.map(r => r._1 * r._2).sum
    val s22 = rows.map(r => r._2 * r._2).sum
    val sy = rows.map(_._3).sum
    val s1y = rows.map(r => r._1 * r._3).sum
    val s2y = rows.map(r => r._2 * r._3).sum
    val a = (n + 1).toDouble; val b = s1.toDouble; val c = s2.toDouble
    val d = (s11 + 1).toDouble; val e = s12.toDouble; val f = (s22 + 1).toDouble
    val c11 = d * f - e * e; val c12 = c * e - b * f; val c13 = b * e - c * d
    val c22 = a * f - c * c; val c23 = c * b - a * e; val c33 = a * d - b * b
    val det = a * c11 + b * c12 + c * c13
    val b0 = (c11 * sy + c12 * s1y + c13 * s2y) / det
    val b1 = (c12 * sy + c22 * s1y + c23 * s2y) / det
    val b2 = (c13 * sy + c23 * s1y + c33 * s2y) / det
    assert(got.getDouble(0) == b0 && got.getDouble(1) == b1 && got.getDouble(2) == b2)
  }

  test("separable planted corpus is classified exactly") {
    val s = spark
    import s.implicits._
    // good docs: normal English; junk docs: long runs of non-alpha tokens.
    // In (mean word length, alpha per-mille) space these are far apart,
    // so even a ridge LINE separates them.
    val good = (1L to 8L).map(i =>
      (i, "the cat sat on the mat and then the dog sat on the rug too " * 3))
    val junk = (11L to 18L).map(i =>
      (i, "!!!! ???? 0000 9999 #### $$$$ %%%% @@@@ " * 5))
    val docs = (good ++ junk).toDF("doc_id", "text")
    val out = QualityModel.distill(docs).collect()
    assert(out.length == 16)
    assert(out.forall(r => r.getLong(5) == r.getLong(3)),
      out.map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).mkString(", "))
  }

  test("real-corpus distillation fidelity: agreement well above chance") {
    val out = QualityModel.distill(Tables(spark, dir, "documents"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("keep"), 1L).otherwise(0L)).as("agree"))
      .collect()(0)
    val (n, agree) = (out.getLong(0), out.getLong(1))
    assert(n > 0 && agree.toDouble / n > 0.65, s"agreement $agree/$n")
  }

  test("Corpus.withLearnedQuality appends score/pred matching distill") {
    val docs = Tables(spark, dir, "documents")
    val viaDoor = graft.api.Corpus(docs).withLearnedQuality().df
      .select("doc_id", "quality_score", "quality_pred")
      .filter(col("quality_score").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
    val direct = QualityModel.distill(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(4), r.getLong(5))).sorted.toSeq
    assert(viaDoor == direct && viaDoor.nonEmpty)
  }

  test("generated solver (n=2) agrees with the hand-written 3x3 stages") {
    val s = spark
    import s.implicits._
    val feat = Seq(
      (1L, 300L, 900L, 1L), (2L, 250L, 950L, 1L), (3L, 800L, 200L, 0L),
      (4L, 900L, 100L, 0L), (5L, 400L, 800L, 1L)).toDF("doc_id", "x1", "x2", "y")
    val hand = QualityModel.trainRidge(feat).collect()(0)
    val gen = QualityModel.trainRidgeN(feat, 2).collect()(0)
    // different cofactor term ORDER -> tiny fp divergence allowed, not more
    (0 to 2).foreach { i =>
      assert(math.abs(hand.getDouble(i) - gen.getDouble(i)) <=
        1e-9 * math.max(1.0, math.abs(hand.getDouble(i))))
    }
  }

  test("generated 4x4 solve satisfies its own normal equations (A·beta = s)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 300L, 900L, 5L, 1L), (2L, 250L, 950L, 7L, 1L), (3L, 800L, 200L, 0L, 0L),
      (4L, 900L, 100L, 1L, 0L), (5L, 400L, 800L, 4L, 1L), (6L, 600L, 500L, 2L, 0L))
    val feat = rows.toDF("doc_id", "x1", "x2", "x3", "y")
    val b = QualityModel.trainRidgeN(feat, 3).collect()(0)
    val beta = (0 to 3).map(b.getDouble).toArray
    // rebuild A (ridge-shifted) and s from the raw rows, check residual
    val x = rows.map(r => Array(1.0, r._2.toDouble, r._3.toDouble, r._4.toDouble))
    val y = rows.map(_._5.toDouble)
    val a = Array.tabulate(4, 4)((i, j) =>
      x.map(v => v(i) * v(j)).sum + (if (i == j) 1.0 else 0.0))
    val rhs = Array.tabulate(4)(i => x.zip(y).map { case (v, yy) => v(i) * yy }.sum)
    (0 to 3).foreach { i =>
      val lhs = (0 to 3).map(j => a(i)(j) * beta(j)).sum
      assert(math.abs(lhs - rhs(i)) <= 1e-6 * math.max(1.0, math.abs(rhs(i))),
        s"row $i: $lhs vs ${rhs(i)}")
    }
  }

  test("3-feature distillation beats the 2-feature model on the real corpus") {
    val docs = Tables(spark, dir, "documents")
    def agreement(out: org.apache.spark.sql.DataFrame) = {
      val r = out.agg(count(lit(1)), sum(when(col("pred") === col("keep"), 1L).otherwise(0L)))
        .collect()(0)
      r.getLong(1).toDouble / r.getLong(0)
    }
    val a2 = agreement(QualityModel.distill(docs))
    val a3 = agreement(QualityModel.distill3(docs))
    assert(a3 >= a2, s"3-feature $a3 < 2-feature $a2")
    assert(a3 > 0.7, s"3-feature agreement $a3")
  }

  test("IRLS logistic: calibrated probabilities, agreement >= the ridge models") {
    val docs = Tables(spark, dir, "documents")
    def agreement(out: org.apache.spark.sql.DataFrame) = {
      val r = out.agg(count(lit(1)), sum(when(col("pred") === col("keep"), 1L).otherwise(0L)))
        .collect()(0)
      r.getLong(1).toDouble / r.getLong(0)
    }
    val irls = QualityModel.distillIrls3(docs)
    val rows = irls.collect()
    // every score is a probability
    assert(rows.forall { r =>
      val p = r.getDouble(5); p >= 0.0 && p <= 1.0 && !p.isNaN
    })
    val aI = agreement(irls)
    val aR = agreement(QualityModel.distill3(docs))
    assert(aI >= aR, s"IRLS $aI < ridge $aR")
  }

  test("IRLS degenerate inputs: empty corpus trains finite, single-class solves") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("doc_id", "x1", "x2", "x3", "y")
    val b = QualityModel.trainIrls3(empty).collect()(0)
    assert((0 to 3).forall(i => !b.getDouble(i).isNaN && !b.getDouble(i).isInfinite))
    val one = Seq((1L, 300L, 900L, 5L, 1L), (2L, 400L, 800L, 3L, 1L))
      .toDF("doc_id", "x1", "x2", "x3", "y")
    val b1 = QualityModel.trainIrls3(one).collect()(0)
    assert((0 to 3).forall(i => !b1.getDouble(i).isNaN && !b1.getDouble(i).isInfinite))
  }

  test("degenerate inputs: empty corpus trains to finite zeros, no NaN") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, Long, Long)].toDF("doc_id", "x1", "x2", "y")
    val c = QualityModel.trainRidge(empty).collect()(0)
    assert(c.getDouble(0) == 0.0 && c.getDouble(1) == 0.0 && c.getDouble(2) == 0.0)
    // single-class corpus (all y = 1) still solves (ridge keeps det > 0)
    val one = Seq((1L, 300L, 900L, 1L), (2L, 400L, 800L, 1L)).toDF("doc_id", "x1", "x2", "y")
    val c1 = QualityModel.trainRidge(one).collect()(0)
    assert(!c1.getDouble(0).isNaN && !c1.getDouble(1).isNaN && !c1.getDouble(2).isNaN)
  }
}
