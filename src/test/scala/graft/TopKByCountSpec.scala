package graft

import graft.functions.TopKByCount
import org.apache.spark.sql.functions._

/** Typed Aggregator (bounded top-k-by-count): exact agreement with the
  * groupBy/count formulation, stability under repartitioning (merge
  * associativity), and bounded-buffer behavior.
  */
class TopKByCountSpec extends SparkSuite {
  import spark.implicits._

  test("matches groupBy-count top-3 exactly on part types") {
    val vals = Tables(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_type")).as[String]
    val agg = new TopKByCount(3).toColumn
    val got = vals.select(agg).collect()(0)

    val want = Tables(spark, "/root/testdata/sf0.001", "part")
      .groupBy("p_type").count()
      .orderBy(col("count").desc, col("p_type"))
      .limit(3).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").toSeq
    assert(got == want)
  }

  test("partition-order independent (merge associativity)") {
    val vals = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderpriority")).as[String]
    val agg = new TopKByCount(5).toColumn
    val once = vals.select(agg).collect()(0)
    val reparted = vals.repartition(13).select(agg).collect()(0)
    assert(once == reparted)
  }

  test("bounded-buffer regime: heavy hitter survives eviction") {
    import spark.implicits._
    // 40 distinct keys, buffer capped at 4 (trim fires above 8): the
    // space-saving guarantee is that a hitter with a large margin ("hot",
    // 500 of 890 rows) is never evicted
    val rows = Seq.fill(500)("hot") ++
      (1 to 39).flatMap(i => Seq.fill(10)(s"cold_$i"))
    val ds = spark.sparkContext.parallelize(rows, 8).toDF("v").as[String]
    val top = ds.select(new TopKByCount(1, maxBuffer = 4).toColumn).collect()(0)
    assert(top.length == 1)
    assert(top.head.startsWith("hot:"), s"heavy hitter evicted: $top")
  }

  test("per-group usage via groupByKey.mapValues") {
    val ds = Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .as[(Long, String)]
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new TopKByCount(1).toColumn)
      .collect().toMap

    val want = Tables(spark, "/root/testdata/sf0.001", "customer")
      .groupBy("c_nationkey", "c_mktsegment").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_nationkey")
          .orderBy(col("count").desc, col("c_mktsegment"))))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getInt(0).toLong -> Seq(s"${r.getString(1)}:${r.getLong(2)}"))
      .toMap
    assert(got == want)
  }
}
