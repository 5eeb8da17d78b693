package graft

import graft.ext.LangId
import org.apache.spark.sql.functions._

/** Learned language-ID edges the x_txt24/25 hashes can't see: profile
  * shape, tie determinism, the guard on texts shorter than the gram
  * width, and the motivating property — unsegmented CJK classifies,
  * where the stopword heuristic is structurally blind.
  */
class LangIdSpec extends SparkSuite {
  import spark.implicits._

  private val labeled = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and the rain in the plain"),
    ("en", "she walks to the school near the river every morning with the friends"),
    ("zh", "敏捷的狐狸跳过懒狗每天早上孩子们走路去学校大家都很开心"),
    ("zh", "今天的天气很好我们一起去公园散步看看河边的风景然后回家")
  ).toDF("lang", "text")

  test("profiles: at most K contiguous ranks per language") {
    val prof = LangId.trainProfiles(labeled).collect()
    val byLang = prof.groupBy(_.getString(0))
    assert(byLang.keySet == Set("en", "zh"))
    byLang.foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(2)).sorted.toList
      assert(ranks.size <= LangId.K && ranks == (1 to ranks.size).toList)
    }
  }

  test("unsegmented CJK classifies (the stopword heuristic cannot)") {
    val prof = LangId.trainProfiles(labeled)
    val docs = Seq(
      (1L, "孩子们每天都去河边的学校散步非常开心"),
      (2L, "the dog walks near the river every day with the fox")
    ).toDF("doc_id", "text")
    val got = LangId.classify(docs, prof).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(got == List((1L, "zh"), (2L, "en")), got.toString)
  }

  test("texts shorter than the gram width do not crash; empty text drops") {
    val prof = LangId.trainProfiles(labeled)
    val docs = Seq((1L, "a"), (2L, ""), (3L, "之")).toDF("doc_id", "text")
    val got = LangId.classify(docs, prof).orderBy("doc_id").collect()
    // single-char texts still yield a 1-gram and classify; a ZERO-gram
    // doc (empty text) has no rows to rank and is ABSENT from the
    // output — the documented contract (callers left-join and coalesce
    // to 'und'), pinned here so it can't silently change
    assert(got.map(_.getLong(0)).toList == List(1L, 3L), got.toSeq.toString)
    // a doc whose grams hit NO profile scores K per gram for every
    // language equally — the tie must break lang ascending
    val tiedDocs = Seq((9L, "q")).toDF("doc_id", "text") // 'q' in neither profile
    val tied = LangId.classify(tiedDocs, prof).collect()
    assert(tied.length == 1 && tied(0).getString(1) == "en", tied.toSeq.toString)
  }

  test("merged shard counts == retraining on the union, profile for profile") {
    val a = labeled.filter(col("text").contains("fox") || col("text").contains("狐狸"))
    val b = labeled.except(a)
    val merged = LangId.profilesFromCounts(
      LangId.mergeCounts(LangId.trainCounts(a), LangId.trainCounts(b)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sorted.toList
    val retrained = LangId.trainProfiles(labeled)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sorted.toList
    assert(merged == retrained && merged.nonEmpty)
  }

  test("classification is invariant to input partitioning") {
    val prof = LangId.trainProfiles(labeled)
    val docs = (1 to 30).map(i =>
      (i.toLong, if (i % 2 == 0) "the rain falls on the quiet green hills near the river"
      else "每天早上孩子们和朋友一起走路去学校")).toDF("doc_id", "text")
    val a = LangId.classify(docs.repartition(1), prof)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toList
    val b = LangId.classify(docs.repartition(7), prof)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toList
    assert(a == b && a.size == 30)
  }
}
