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

  test("adviseJoin: small dim side -> broadcast, and the plan agrees") {
    import spark.implicits._
    val big = (1L to 50000L).map(k => (k, "p")).toDF("k", "p")
    val dim = (1L to 100L).map(k => (k, s"d$k")).toDF("k", "name")
    val adv = Scale.adviseJoin(big, "k", dim, "k")
    assert(adv.strategy == "broadcast_b", adv.toString)
    assert(adv.nA == 50000L && adv.nB == 100L)
    // est is one-sided and tight here (distinct keys, 100 matches)
    assert(adv.estJoin >= 100L && adv.estJoin <= 300L, adv.toString)
    // following the advice produces the advised operator
    val plan = big.join(org.apache.spark.sql.functions.broadcast(dim), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("adviseJoin: two large uniform sides -> shuffle, and the plan agrees") {
    import spark.implicits._
    val a = (1L to 20000L).map(k => (k, "a")).toDF("k", "p")
    val b = (1L to 20000L).map(k => (k, "b")).toDF("k", "q")
    val adv = Scale.adviseJoin(a, "k", b, "k", broadcastMaxRows = 1000L)
    assert(adv.strategy == "shuffle", adv.toString)
    // uniform distinct keys: heaviest-key upper bound stays far below a
    // reducer's fair share (collision noise only)
    assert(adv.maxKeyA * 32 < 8 * adv.nA, adv.toString)
    // with broadcast off the table, the actual plan shuffles both sides
    val plan = spark.sessionState.executePlan(
      a.hint("shuffle_merge").join(b, Seq("k")).queryExecution.logical)
      .executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("Exchange"), plan)
  }

  test("adviseJoin: hot key -> salt, and saltedJoin keeps results identical") {
    import spark.implicits._
    val big = (1 to 50000).map(_ => (7L, "dup")).toDF("k", "p")
      .unionAll((1L to 5000L).map(k => (k + 100L, "u")).toDF("k", "p"))
    val other = (1L to 6000L).map(k => (k, s"d$k")).toDF("k", "name")
    val adv = Scale.adviseJoin(big, "k", other, "k", broadcastMaxRows = 1000L)
    assert(adv.strategy == "salt", adv.toString)
    assert(adv.maxKeyA >= 50000L, "hot key must dominate the sketch bound")
    // following the advice: salted result == plain join result
    val plain = big.join(other, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(big, other, "k", 16).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain && salted(7L) == 50000L)
  }

  test("adviseJoin estimate is one-sided: est >= exact join size") {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val adv = Scale.adviseJoin(li, "l_orderkey", o, "o_orderkey")
    val exact = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(adv.estJoin >= exact, s"est ${adv.estJoin} < exact $exact")
    assert(adv.nA == li.count() && adv.nB == o.count())
  }
}
