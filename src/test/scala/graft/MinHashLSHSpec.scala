package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** The spark.ml MinHashLSH scale path for near-dup detection
  * (X-DED2's engine-portable formulation is oracle-checked; this pins the
  * ML-native variant: HashingTF binary term vectors → MinHashLSH →
  * approxSimilarityJoin).
  */
class MinHashLSHSpec extends SparkSuite {

  test("approxSimilarityJoin finds planted exact duplicates at distance 0") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
      .select(col("doc_id"), graft.clean.CleanFns.tokens(col("text")).as("ws"))

    val tf = new HashingTF().setInputCol("ws").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
    val fea = tf.transform(docs).select("doc_id", "features")

    val copies = fea.withColumn("doc_id", col("doc_id") + 100000L)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
      .fit(fea)

    val joined = model.approxSimilarityJoin(fea, copies, 0.05, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        col("jaccard_dist"))
      .filter(col("a") + 100000L === col("b"))

    // every planted duplicate must be found, at exactly distance 0
    assert(joined.count() == 50)
    assert(joined.agg(max("jaccard_dist")).collect()(0).getDouble(0) == 0.0)
  }
}
