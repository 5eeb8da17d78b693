package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: when both sides are bucketed and
  * sorted on the join key with equal bucket counts, the sort-merge join
  * needs NO shuffle exchange — the 100 TB pattern for repeated fact⋈fact
  * joins on a stable key.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed saveAsTable join plans without a shuffle") {
    val s = spark // default warehouse (spark-warehouse/, gitignored)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path

    val dir = "/root/testdata/sf0.001"
    Tables(s, dir, "orders")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables(s, dir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_customer")

    try {
      val joined = s.table("b_orders").join(s.table("b_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it is still correct
      val expect = Tables(s, dir, "orders").join(
        Tables(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey")).count()
      assert(joined.count() == expect)
    } finally {
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
