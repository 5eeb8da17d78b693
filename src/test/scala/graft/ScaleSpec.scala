package graft

import graft.util.Scale
import org.apache.spark.sql.functions._

/** Scale-pattern tests: salted join semantics, partitioned-sink pruning,
  * and broadcast/pushdown plan shape assertions.
  */
class ScaleSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin == plain inner join (orders x customer)") {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect().toSeq
    val salted = Scale.saltedJoin(o, c, "o_custkey", 8)
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect().toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("part_sink").toString
    Tables(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("event_type") === "error")
    val expl = pruned.queryExecution.executedPlan.toString
    assert(expl.contains("PartitionFilters") &&
      expl.contains("event_type"), s"no partition pruning in:\n$expl")
    val nError = Tables(spark, dir, "events")
      .filter(col("event_type") === "error").count()
    assert(pruned.count() == nError)
  }

  test("broadcast hint produces a BroadcastHashJoin") {
    val li = Tables(spark, dir, "lineitem")
    val p = broadcast(Tables(spark, dir, "part"))
    val plan = li.join(p, col("l_partkey") === col("p_partkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("filter + projection reach the parquet scan") {
    val q = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("sizedWriter bounds rows per output file without extra jobs") {
    val out = java.nio.file.Files.createTempDirectory("sized").toString
    Scale.sizedWriter(Tables(spark, "/root/testdata/sf0.01", "lineitem"), 10000L)
      .mode("overwrite").parquet(s"$out/li")
    val files = new java.io.File(s"$out/li").listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // 60k rows at <=10k rows/file -> at least 6 files
    assert(files.length >= 6, s"expected >=6 files, got ${files.length}")
    val back = spark.read.parquet(s"$out/li")
    assert(back.count() == 60000L)
  }

  test("saltedJoin correct on a heavily skewed, duplicate-heavy key") {
    import spark.implicits._
    val big = (1 to 50000).map(_ => (7L, "dup_payload")).toDF("k", "p")
      .unionAll((1 to 100).map(i => (i.toLong % 20 + 100L, s"p$i")).toDF("k", "p"))
    val small = (0L to 200L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(big, small, "k", 16).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted(7L) == 50000L)
  }

  test("bucketOf is stable and within range") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("k")
      .select(col("k"), Scale.bucketOf(col("k"), 32).as("b"))
    val range = df.agg(min("b"), max("b")).collect()(0)
    assert(range.getInt(0) >= 0 && range.getInt(1) < 32)
    // deterministic across evaluations
    val a = df.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = df.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("observe(): pipeline health metrics ride the job, no second scan") {
    // at 100 TB you cannot afford a separate count() pass for data-quality
    // counters; observe() accumulates them inside the main job
    import org.apache.spark.sql.Observation
    val obs = Observation("etl_metrics")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val out = li.observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("high_qty"))
      .filter(col("l_quantity") > 45)
    val kept = out.count()
    val m = obs.get
    assert(m("rows_seen") == li.count())
    assert(m("high_qty") == kept)
  }
}
