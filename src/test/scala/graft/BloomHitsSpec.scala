package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.PipelineOps7

/** Native bloom_hits ≡ the declarative HOF probe form; interpreted ≡
  * codegen; the bitmap build is bit-exact with first-principles slot
  * arithmetic; Bloom novelty never OVERSTATES novelty vs the exact set.
  */
class BloomHitsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  /** The declarative twin of the native probe: same slot arithmetic as an
    * interpreted lambda per digest.
    */
  private def hofHits(hexChars: Int, k: Int): org.apache.spark.sql.Column = {
    val s = 1L << (4 * hexChars)
    val conds = (0 until k).map { i =>
      val q = s"($i * ${s}L + conv(substr(g, ${1 + hexChars * i}, $hexChars), 16, 10))"
      s"(element_at(__bloom, CAST($q DIV 64 AS INT) + 1) & shiftleft(1L, CAST($q % 64 AS INT))) <> 0L"
    }.mkString(" AND ")
    expr(s"CAST(size(filter(__g, g -> $conds)) AS BIGINT)")
  }

  test("native == declarative HOF form on the real corpus (two geometries)") {
    GraftExtensions.register(spark)
    val docs = Tables(spark, dir, "documents")
    for ((hexChars, k) <- Seq((4, 3), (3, 2))) {
      val bloom = PipelineOps7.gramBloom(docs.filter(col("doc_id") % 2 === 0), hexChars, k)
      val both = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("__g", expr("ngram_md5(text, 4)"))
        .filter(size(col("__g")) > 0)
        .crossJoin(broadcast(bloom))
        .select(col("doc_id"),
          expr(s"bloom_hits(__g, __bloom, $hexChars, $k)").as("nat"),
          hofHits(hexChars, k).as("dec"))
      assert(both.filter(col("nat") =!= col("dec")).count() == 0L,
        s"geometry ($hexChars, $k): native diverged from declarative")
      assert(both.count() > 0)
    }
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val bloomArr = PipelineOps7.gramBloom(docs.filter(col("doc_id") % 2 === 0))
      .collect().head.getSeq[Long](0).toArray
    val rows = docs.filter(col("doc_id") % 2 === 1).limit(20)
      .withColumn("__g", expr("ngram_md5(text, 4)"))
      .filter(size(col("__g")) > 0)
      .crossJoin(broadcast(PipelineOps7.gramBloom(docs.filter(col("doc_id") % 2 === 0))))
      .select(col("doc_id"), col("__g"), expr("bloom_hits(__g, __bloom, 4, 3)").as("n"))
      .collect()
    assert(rows.nonEmpty)
    val bloomData = new GenericArrayData(bloomArr.map(x => x: Any))
    rows.foreach { r =>
      val grams = new GenericArrayData(
        r.getSeq[String](1).map(g => UTF8String.fromString(g): Any).toArray)
      val interp = graft.functions.BloomHits.compute(grams, bloomData, 4, 3)
      assert(interp == r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("bloom membership has no false NEGATIVES: n_seen_bloom >= exact n_seen") {
    val docs = Tables(spark, dir, "documents")
    val released = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val exact = PipelineOps7.scoreNoveltyAgainst(newDocs, PipelineOps7.gramSet(released))
      .select(col("doc_id"), col("n_seen"))
    val bloom = PipelineOps7.scoreNoveltyBloom(newDocs, PipelineOps7.gramBloom(released))
      .select(col("doc_id").as("doc_id_b"), col("n_seen_bloom"))
    val joined = exact.join(bloom, col("doc_id") === col("doc_id_b"))
    assert(joined.count() > 0)
    assert(joined.filter(col("n_seen_bloom") < col("n_seen")).count() == 0L,
      "Bloom produced a false negative — impossible for a correct bitmap build")
  }

  test("bitmap is bounded and deterministic") {
    val docs = Tables(spark, dir, "documents")
    val a = PipelineOps7.gramBloom(docs).collect().head.getSeq[Long](0)
    val b = PipelineOps7.gramBloom(docs).collect().head.getSeq[Long](0)
    assert(a.length == 3 * 65536 / 64) // 3072 longs = 24 KiB, corpus-size-independent
    assert(a == b)
  }
}
