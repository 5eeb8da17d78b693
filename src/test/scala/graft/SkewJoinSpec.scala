package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot key on the probe side must be split into
  * multiple tasks at runtime (OptimizeSkewedJoin), the engine-native
  * complement to util.Scale.saltedJoin.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a skewed sort-merge join") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // thresholds low enough that a local skew is recognized
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

    try {
      // key 7 carries ~300k rows; the rest are tiny
      val big = (1 to 300000).map(i => (7L, s"payload_$i")).toDF("k", "payload")
        .unionAll((1 to 1000).map(i => ((i % 50) + 100L, s"p_$i")).toDF("k", "payload"))
      val small = (0L to 200L).map(k => (k, s"dim_$k")).toDF("k", "name")

      val joined = big.join(small, Seq("k"))
      // execute THIS plan (count() would build a different one), then read
      // back the AQE-final version of it
      val qe = joined.queryExecution
      val n = qe.toRdd.count()
      assert(n == 300000L + 1000L)

      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to fire; final plan:\n$finalPlan")
    } finally {
      Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes").foreach(s.conf.unset)
    }
  }
}
