package graft

import graft.ext.UnigramTok
import org.apache.spark.sql.functions._

/** Vocabulary induction and token accounting edges: frequency
  * weighting, the deterministic V boundary, the distinct-word DP
  * join-back, and words absent from the vocab (pure UNK).
  */
class UnigramTokSpec extends SparkSuite {
  import spark.implicits._

  test("induceVocab: frequency weighting and (n desc, piece asc) boundary") {
    // "ab ab ab xy" → pieces: 'ab' appears in 3 word occurrences,
    // 'xy' in 1; V=1 must keep exactly 'ab'
    val docs = Seq((1L, "ab ab ab xy")).toDF("doc_id", "text")
    val v1 = UnigramTok.induceVocab(docs, v = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(v1 == List(("ab", 3L)), v1.toString)
    // tie at the boundary: 'aa' and 'ab' both once → piece ASC wins
    val docs2 = Seq((1L, "aa ab")).toDF("doc_id", "text")
    val v2 = UnigramTok.induceVocab(docs2, v = 1).collect()
      .map(r => r.getString(0)).toList
    assert(v2 == List("aa"), v2.toString)
  }

  test("induceVocab: substrings up to MaxLen only, weighted by word count") {
    val docs = Seq((1L, "abcdefghij abcdefghij")).toDF("doc_id", "text")
    val v = UnigramTok.induceVocab(docs, v = 1000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!v.contains("abcdefghi"), "9-char piece must not be induced")
    assert(v("abcdefgh") == 2L) // 8-char cap, both occurrences counted
    assert(v("ab") == 2L)
  }

  test("minTokenCounts: per-doc rollup with UNK words and piece reuse") {
    val docs = Seq(
      (1L, "abab zz abab"), // abab = 2 pieces (ab+ab), zz = UNK 2 chars
      (2L, "ab")
    ).toDF("doc_id", "text")
    val vocab = Seq(("ab", 5L)).toDF("piece", "n")
    val got = UnigramTok.minTokenCounts(docs, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc 1: words 3; pieces: abab=2, zz=2, abab=2 → 6
    // doc 2: words 1; pieces: ab=1
    assert(got == List((1L, 3L, 6L), (2L, 1L, 1L)), got.toString)
  }
}
