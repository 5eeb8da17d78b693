package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (§2.8 gap list): sketch results must land within
  * their documented error bounds of the exact answers. Not oracle-checked
  * (HLL/quantile sketch layouts are engine-specific by design) — bounds are
  * the correct contract.
  */
class ApproxSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact (HLL++ default rsd 0.05)") {
    val li = Tables(spark, dir, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val ev = Tables(spark, dir, "events")
    val exact = ev.select(expr("percentile(value, 0.5)")).collect()(0).getDouble(0)
    val approx = ev.select(expr("approx_percentile(value, 0.5, 1000)")).collect()(0).getDouble(0)
    // with accuracy=1000 on 10k rows the rank error is ~10 rows; values are
    // spread over ~[0, 200], so the value gap stays small
    assert(math.abs(approx - exact) / (math.abs(exact) + 1e-9) < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("mergeable sketches: unioned-partition HLL == whole-table HLL") {
    val li = Tables(spark, dir, "lineitem")
    val whole = li.select(approx_count_distinct(col("l_partkey"), 0.02)).collect()(0).getLong(0)
    // same aggregate over a repartitioned input must merge to the same
    // estimate (sketch merge is associative/commutative)
    val reparted = li.repartition(17)
      .select(approx_count_distinct(col("l_partkey"), 0.02)).collect()(0).getLong(0)
    assert(whole == reparted)
  }

  test("materialized sketch columns: per-group hll_sketch_agg persisted, unioned later") {
    // The cross-query sketch-reuse pattern from SURVEY §7.5: at 100 TB you
    // pre-aggregate a BINARY sketch column per partition/day once, persist
    // it, and answer later distinct-count queries by unioning sketches —
    // never rescanning the facts. Spark 4 ships this natively
    // (hll_sketch_agg / hll_union_agg / hll_sketch_estimate — Datasketches
    // HLL), so no custom TypedImperativeAggregate is warranted.
    val li = Tables(spark, dir, "lineitem")
    val perFlag = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val dirOut = java.nio.file.Files.createTempDirectory("hll_sk").toString
    perFlag.write.mode("overwrite").parquet(dirOut) // BINARY sketch column persists
    val merged = spark.read.parquet(dirOut)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    val direct = li.select(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))"))
      .collect()(0).getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    // union-of-sub-sketches and single-pass sketch take different internal
    // paths (observed: 1991 vs 2023 on exact 2000), so bit-equality is NOT
    // the contract — both landing within HLL error of exact is; and
    // re-unioning the same persisted sketches must be deterministic.
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"merged=$merged exact=$exact")
    assert(math.abs(direct - exact).toDouble / exact < 0.05, s"direct=$direct exact=$exact")
    val merged2 = spark.read.parquet(dirOut)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    assert(merged2 == merged)
  }
}
