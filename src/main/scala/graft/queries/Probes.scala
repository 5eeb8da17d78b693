package graft.queries

import graft.{Probe, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational probe surface (SURVEY.md §2.9 P-*) over the TPC-H-ish
  * testdata. Each probe is a Spark plan built to be the plan you'd want at
  * 100 TB (broadcast the dims, partial aggregation, TakeOrderedAndProject
  * for top-k) plus a DuckDB oracle.
  *
  * Numeric portability: money math is exact DECIMAL(18,2) (order-independent
  * sums — immune to shuffle nondeterminism); averages are surfaced as ppm
  * integers via truncating division (identical in both engines); doubles are
  * only ever passed through or produced by single IEEE ops (deterministic
  * bit-for-bit); derived integers are BIGINT on both sides.
  *
  * SURFACED decimals are cast to DOUBLE as the very last step (round 2): the
  * driver's hash gate reads Spark parquet via pandas (DECIMAL -> fixed-scale
  * Decimal objects, str '212576.00') and the oracle via duckdb fetchdf
  * (DECIMAL -> float64, repr '212576.0') — representation-sensitive hashing
  * mismatches on any trailing-zero cent. Casting the SAME exact decimal to
  * DOUBLE on both sides is deterministic (round-to-nearest of an identical
  * value) and hashes identically. All arithmetic stays in exact decimal;
  * only the output column type changes.
  */
object Probes {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column =
    sum(dec2(c)).cast("decimal(18,2)").cast("double")

  /** Exact-decimal money product sum: factors are cast to decimal BEFORE
    * multiplying (double products land exactly on .xx5 boundaries for
    * 2-decimal money × 2-decimal rates, where Spark's HALF_UP cast and
    * DuckDB's exact-binary cast disagree), then the exact sum is rounded
    * HALF_UP — identical in both engines.
    */
  private def rate(c: Column): Column = c.cast("decimal(4,2)")
  private def dsumRounded(product: Column): Column =
    round(sum(product), 2).cast("decimal(18,2)").cast("double")

  /** P-FIL — filter + project; predicate and projection must reach the scan
    * (PushedFilters/ReadSchema in explain).
    */
  private val pFil = Probe(
    "p_fil_filter_project",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1995-06-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_shipdate") < lit("1995-06-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P-AGG1 — TPC-H Q1 shape: multi-aggregate hash agg with partial+final
    * (map-side combine) and exact decimal money math.
    */
  private val pAgg1 = Probe(
    "p_agg1_hash_agg",
    """WITH a AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty_d,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_d,
      |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS sum_disc_price_d,
      |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS sum_charge_d,
      |    CAST(COUNT(*) AS BIGINT) AS count_order
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' GROUP BY l_returnflag, l_linestatus)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum_qty_d AS DOUBLE) AS sum_qty,
      |  CAST(sum_base_d AS DOUBLE) AS sum_base,
      |  CAST(sum_disc_price_d AS DOUBLE) AS sum_disc_price,
      |  CAST(sum_charge_d AS DOUBLE) AS sum_charge,
      |  count_order,
      |  CAST(sum_qty_d * 1000000 AS BIGINT) // count_order AS avg_qty_ppm,
      |  CAST(sum_base_d * 1000000 AS BIGINT) // count_order AS avg_price_ppm
      |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // ppm averages derive from the EXACT decimal sums (decimal*int is
        // exact; double-derived ints would hit truncate-vs-round cast skew)
        sum(dec2(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty_d"),
        sum(dec2(col("l_extendedprice"))).cast("decimal(18,2)").as("sum_base_d"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))), 2)
          .cast("decimal(18,2)").as("sum_disc_price_d"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))) * (lit(1) + rate(col("l_tax")))), 2)
          .cast("decimal(18,2)").as("sum_charge_d"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_d").cast("double").as("sum_qty"),
        col("sum_base_d").cast("double").as("sum_base"),
        col("sum_disc_price_d").cast("double").as("sum_disc_price"),
        col("sum_charge_d").cast("double").as("sum_charge"),
        col("count_order"),
        expr("CAST(sum_qty_d * 1000000 AS BIGINT) DIV count_order").as("avg_qty_ppm"),
        expr("CAST(sum_base_d * 1000000 AS BIGINT) DIV count_order").as("avg_price_ppm"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P-AGG2 — COUNT(DISTINCT) per group across a two-hop dim join; both dims
    * are broadcast (nation/region are tiny at any SF).
    */
  private val pAgg2 = Probe(
    "p_agg2_count_distinct",
    """SELECT r_name, CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      |       CAST(COUNT(*) AS BIGINT) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n_cust"))
      .orderBy("r_name")
  }

  /** P-AGG3 — ROLLUP over (nation, order-year). Grouping keys are never null
    * in the data, so COALESCE sentinels are unambiguous.
    */
  private val pAgg3 = Probe(
    "p_agg3_rollup",
    """SELECT COALESCE(n_name, 'ALL') AS nation,
      |       COALESCE(CAST(yr AS VARCHAR), 'ALL') AS yr,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM (SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr, o_totalprice
      |      FROM orders JOIN customer ON o_custkey = c_custkey
      |      JOIN nation ON c_nationkey = n_nationkey) t
      |GROUP BY ROLLUP (n_name, yr)
      |ORDER BY nation, yr""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nk"), year(col("o_orderdate")).cast("long").as("yk"),
        col("o_totalprice"))
      .createOrReplaceTempView("p_agg3_pre")
    // rollup via SQL: the DataFrame rollup + coalesce-over-grouping-cols
    // combination trips Spark's ambiguous-self-join heuristic.
    s.sql("""SELECT COALESCE(nk, 'ALL') AS nation,
            |       COALESCE(CAST(yk AS STRING), 'ALL') AS yr,
            |       COUNT(*) AS n_orders,
            |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
            |FROM p_agg3_pre GROUP BY ROLLUP (nk, yk)
            |ORDER BY nation, yr""".stripMargin)
  }

  /** P-JN1 — inner equi-join fact⋈dim + aggregate. */
  private val pJn1 = Probe(
    "p_jn1_inner_join",
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** P-JN2 — left outer join with null accounting on the probe side. */
  private val pJn2 = Probe(
    "p_jn2_left_outer",
    """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
      |       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_cust,
      |       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_cust"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long").as("n_no_orders"))
      .orderBy("c_nationkey")
  }

  /** P-JN3a — left semi join (EXISTS). */
  private val pJn3s = Probe(
    "p_jn3_semi_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
    Tables(s, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** P-JN3b — left anti join (NOT EXISTS). Anti-joined against the
    * 'P'-status subset so the result is non-empty at every SF (every
    * customer has SOME order in this data — an unfiltered anti join would
    * pass vacuously).
    */
  private val pJn3a = Probe(
    "p_jn3_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val p = Tables(s, dir, "orders").filter(col("o_orderstatus") === "P")
    Tables(s, dir, "customer")
      .join(p, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** P-JN4 — fact⋈small-dim with an explicit broadcast hint: no shuffle of
    * the fact side at any scale.
    */
  private val pJn4 = Probe(
    "p_jn4_broadcast_join",
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** P-JN5 — range join: same-user events within a 5-minute follow window of
    * an error event. Equi key (user_id) bounds the blow-up; the range
    * predicate rides on the equi-join.
    */
  private val pJn5 = Probe(
    "p_jn5_range_join",
    """SELECT a.event_id AS a_id, b.event_id AS b_id,
      |       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us, b.event_type AS b_type
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
      |WHERE a.event_type = 'error'
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val a = Tables(s, dir, "events").filter(col("event_type") === "error").alias("a")
    val b = Tables(s, dir, "events").alias("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
        col("b.ts") > col("a.ts") &&
        col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a.event_id").as("a_id"), col("b.event_id").as("b_id"),
        (unix_micros(col("b.ts")) - unix_micros(col("a.ts"))).as("dt_us"),
        col("b.event_type").as("b_type"))
      .orderBy("a_id", "b_id")
  }

  /** P-WIN1 — ranking window functions with a deterministic tiebreak. */
  private val pWin1 = Probe(
    "p_win1_ranking",
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .orderBy("c_custkey")
  }

  /** P-WIN2 — analytic window functions: lag/lead + bounded moving sum. */
  private val pWin2 = Probe(
    "p_win2_analytic",
    """SELECT o_orderkey, o_custkey,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS mv_sum
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(dec2(col("o_totalprice"))).over(w.rowsBetween(-2, 0))
          .cast("decimal(18,2)").cast("double").as("mv_sum"))
      .orderBy("o_orderkey")
  }

  /** P-SRT — global top-k by aggregated revenue; Spark plans
    * TakeOrderedAndProject (no full sort materialization).
    */
  private val pSrt = Probe(
    "p_srt_topk_revenue",
    """SELECT l_orderkey,
      |       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(dsumRounded(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  /** P-SET — UNION / UNION ALL / INTERSECT / EXCEPT, tagged and stacked. */
  private val pSet = Probe(
    "p_set_ops",
    """SELECT * FROM (
      |  SELECT 'union' AS op, x FROM (SELECT s_nationkey AS x FROM supplier UNION SELECT c_nationkey FROM customer)
      |  UNION ALL
      |  SELECT 'union_all' AS op, x FROM (SELECT s_nationkey AS x FROM supplier UNION ALL SELECT c_nationkey FROM customer)
      |  UNION ALL
      |  SELECT 'intersect' AS op, x FROM (SELECT s_nationkey AS x FROM supplier INTERSECT SELECT c_nationkey FROM customer)
      |  UNION ALL
      |  SELECT 'except' AS op, x FROM (SELECT c_nationkey AS x FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |) ORDER BY op, x""".stripMargin) { (s, dir) =>
    val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("x"))
    val cus = Tables(s, dir, "customer").select(col("c_nationkey").as("x"))
    val u  = sup.union(cus).distinct().select(lit("union").as("op"), col("x"))
    val ua = sup.unionAll(cus).select(lit("union_all").as("op"), col("x"))
    val i  = sup.intersect(cus).select(lit("intersect").as("op"), col("x"))
    val e  = cus.except(sup).select(lit("except").as("op"), col("x"))
    u.unionAll(ua).unionAll(i).unionAll(e).orderBy("op", "x")
  }

  /** P-STR — string function battery on part names. */
  private val pStr = Probe(
    "p_str_functions",
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_brand) AS lo,
      |  substr(p_name, 1, 5) AS pfx,
      |  trim('  ' || p_name || ' ') AS trimmed,
      |  concat_ws('-', p_brand, p_type) AS bt,
      |  regexp_extract(p_name, '[a-z]+') AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
      |  p_name LIKE '%re%' AS has_re
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
      substring(col("p_name"), 1, 5).as("pfx"),
      trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
      concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
      regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
      col("p_name").like("%re%").as("has_re"))
      .orderBy("p_partkey")
  }

  /** P-DT — date/time function battery on order dates. */
  private val pDt = Probe(
    "p_dt_functions",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mon,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mon"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
      datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")
  }

  /** P-MTH — math battery. round() is HALF_UP on DECIMAL in both engines
    * (cast-rounding is not: Spark HALF_UP vs DuckDB HALF_EVEN — never rely
    * on cast to round).
    */
  private val pMth = Probe(
    "p_mth_functions",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  abs(l_extendedprice - 1000.0) AS dist,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      |  l_orderkey % 7 AS m7,
      |  CAST(power(l_orderkey % 5, 2) AS BIGINT) AS pw,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS rnd1,
      |  sqrt(CAST(l_orderkey AS DOUBLE)) AS sq
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      abs(col("l_extendedprice") - 1000.0).as("dist"),
      floor(col("l_extendedprice")).as("fl"),
      ceil(col("l_extendedprice")).as("ce"),
      (col("l_orderkey") % 7).as("m7"),
      pow(col("l_orderkey") % 5, 2).cast("long").as("pw"),
      // round on DECIMAL (HALF_UP both engines), then DOUBLE for the
      // surfaced type — §8.4: never leave DECIMAL in an output schema
      round(dec2(col("l_extendedprice")), 1).cast("double").as("rnd1"),
      sqrt(col("l_orderkey").cast("double")).as("sq"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P-ARR — array functions over per-group collected sets. */
  private val pArr = Probe(
    "p_arr_collect",
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
      |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segs,
      |  bool_or(c_mktsegment = 'BUILDING') AS has_building
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segs"),
        size(collect_set(col("c_mktsegment"))).cast("long").as("n_segs"),
        array_contains(collect_set(col("c_mktsegment")), "BUILDING").as("has_building"))
      .orderBy("c_nationkey")
  }

  /** P-ARR2 — explode/unnest: token frequencies across part names. */
  private val pArr2 = Probe(
    "p_arr2_explode",
    """SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
      |GROUP BY tok ORDER BY tok""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy("tok")
  }

  /** P-EVT — tumbling 5-minute windows via epoch bucketing (batch form of
    * the streaming window; the Structured Streaming variant is in
    * graft.streaming and tested in ScalaTest).
    */
  private val pEvt = Probe(
    "p_evt_tumbling_window",
    """SELECT (epoch_us(ts) // 1000000 // 300) * 300 AS win_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(expr("(unix_micros(ts) DIV 1000000 DIV 300) * 300").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("win_start", "event_type")
  }

  /** P-WIN3 — time-RANGE frame + navigation/distribution window functions:
    * 5-minute trailing sums (RANGE on epoch micros), first/last/nth over
    * the full partition, ntile quartiles, percent_rank.
    */
  private val pWin3 = Probe(
    "p_win3_range_frame",
    """SELECT event_id, user_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |       (PARTITION BY user_id ORDER BY epoch_us(ts)
      |        RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS trail_5min,
      |  first_value(event_id) OVER wfull AS first_id,
      |  last_value(event_id) OVER wfull AS last_id,
      |  nth_value(event_id, 2) OVER wfull AS second_id,
      |  CAST(ntile(4) OVER wseq AS BIGINT) AS quartile,
      |  round(percent_rank() OVER wseq, 6) AS pct_rank
      |FROM events
      |WINDOW wseq AS (PARTITION BY user_id ORDER BY ts, event_id),
      |       wfull AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val wRange = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-300000000L, 0)
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = wSeq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "events").select(
      col("event_id"), col("user_id"),
      sum(dec2(col("value"))).over(wRange).cast("decimal(18,2)").cast("double").as("trail_5min"),
      first(col("event_id")).over(wFull).as("first_id"),
      last(col("event_id")).over(wFull).as("last_id"),
      nth_value(col("event_id"), 2).over(wFull).as("second_id"),
      ntile(4).over(wSeq).cast("long").as("quartile"),
      round(percent_rank().over(wSeq), 6).as("pct_rank"))
      .orderBy("event_id")
  }

  /** P-EVT2 — sessionization in batch form: a session breaks after a
    * 30-minute gap per user. The lag/cumsum-over-window formulation is the
    * scalable batch shape (one shuffle on user_id); the streaming stateful
    * variant lives in graft.streaming.
    */
  private val pEvt2 = Probe(
    "p_evt2_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM e)
      |SELECT user_id, CAST(sess AS BIGINT) AS sess,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
      |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, sess""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "sess")
  }

  /** P-EVT4 — strict-ordered conversion funnel (round 7): per user, the
    * first `view`, the first `click` strictly after it, the first
    * `purchase` strictly after that — the canonical product-analytics
    * query. Three filtered min-aggregations chained by user-keyed joins:
    * everything shuffles on ONE key (user_id), so AQE coalesces the
    * stages and the plan holds at any user count; no window over the raw
    * event stream, no per-user sort.
    */
  private val pEvt4 = Probe(
    "p_evt4_funnel",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
      |SELECT v.user_id,
      |  CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stage,
      |  CAST(epoch_us(v.v_ts) AS BIGINT) AS v_us,
      |  CAST(epoch_us(c.c_ts) AS BIGINT) AS c_us,
      |  CAST(epoch_us(p.p_ts) AS BIGINT) AS p_us
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = e.filter(col("event_type") === "click").as("e")
      .join(v.as("v"), "user_id")
      .filter(col("e.ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("e.ts")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase").as("e")
      .join(c.as("c"), "user_id")
      .filter(col("e.ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("e.ts")).as("p_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + col("c_ts").isNotNull.cast("long")
          + col("p_ts").isNotNull.cast("long")).as("stage"),
        unix_micros(col("v_ts")).as("v_us"),
        unix_micros(col("c_ts")).as("c_us"),
        unix_micros(col("p_ts")).as("p_us"))
      .orderBy("user_id")
  }

  /** P-EVT5 — cohort retention (round 7): users grouped by first-activity
    * week; for each (cohort, week-offset) the distinct users active that
    * week — the standard retention matrix. Two aggregations (first-seen
    * per user; distinct user-weeks) joined on user_id, then a
    * count-distinct rollup; week offsets computed as integer epoch
    * arithmetic on the truncated weeks so both engines agree exactly
    * (p_dt3 already pins the truncation semantics).
    */
  private val pEvt5 = Probe(
    "p_evt5_retention_cohorts",
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
      |SELECT CAST(epoch_us(f.cohort) AS BIGINT) AS cohort_us,
      |  CAST((epoch_us(a.w) - epoch_us(f.cohort)) // 604800000000 AS BIGINT) AS week_offset,
      |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort_us, week_offset""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir, "events")
    val f = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val a = e.select(col("user_id"), date_trunc("week", col("ts")).as("w")).distinct()
    a.join(f, "user_id")
      .select(unix_micros(col("cohort")).as("cohort_us"),
        ((unix_micros(col("w")) - unix_micros(col("cohort"))) / 604800000000L)
          .cast("long").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_us", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_us", "week_offset")
  }

  /** P-EVT6 — idempotent event ingestion (round 7): collapse retries /
    * at-least-once redeliveries to one event per (user, type, hour
    * bucket), keeping the earliest (tie: min event_id) and surfacing how
    * many the bucket absorbed — the dedup every event pipeline runs at
    * the door. One keyed shuffle (the window partitions on the full
    * bucket key); the streaming twin is
    * `EventStreams.dedupHourly` (watermark + dropDuplicates), parity-
    * pinned in StreamingSpec.
    */
  private val pEvt6 = Probe(
    "p_evt6_idempotent_ingest",
    """WITH d AS (
      |  SELECT user_id, event_type, date_trunc('hour', ts) AS h, event_id,
      |         row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
      |                            ORDER BY ts, event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)) AS n_in_bucket
      |  FROM events)
      |SELECT user_id, event_type, CAST(epoch_us(h) AS BIGINT) AS hour_us,
      |       event_id AS kept_event_id, CAST(n_in_bucket AS BIGINT) AS n_in_bucket
      |FROM d WHERE rn = 1
      |ORDER BY user_id, event_type, hour_us""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, dir, "events")
      .withColumn("h", date_trunc("hour", col("ts")))
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("h"))
    e.withColumn("rn", row_number().over(w.orderBy(col("ts"), col("event_id"))))
      .withColumn("n_in_bucket", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("h")).as("hour_us"),
        col("event_id").as("kept_event_id"), col("n_in_bucket"))
      .orderBy("user_id", "event_type", "hour_us")
  }

  /** P-STAT — statistical aggregates. These are floating-point co-moment
    * computations whose low bits vary with partition merge order, so
    * outputs are rounded to 6 significant decimals (noise is ~1e-12
    * relative at this scale).
    */
  private val pStat = Probe(
    "p_stat_aggregates",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  round(var_samp(l_quantity), 6) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
      |  round(avg(l_discount), 6) AS avg_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
        round(avg(col("l_discount")), 6).as("avg_disc"))
      .orderBy("l_returnflag")
  }

  /** P-JSON — semi-structured column access: events.props is a JSON string.
    * Parse ONCE with from_json into a typed struct and project fields —
    * the N-path get_json_object form re-parses the document per path
    * (4 parses/row here; measured 1.18 s → 0.91 s at sf0.1). Declared
    * fields absent from the document surface as NULL, matching
    * json_extract's missing-path semantics.
    */
  private val pJson = Probe(
    "p_json_extract",
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
      |  (json_extract(props, '$.k') IS NOT NULL) AS has_k,
      |  (json_extract(props, '$.missing') IS NOT NULL) AS has_missing
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, missing STRING")).as("p"))
      .select(
        col("event_id"),
        col("p.k").cast("string").as("k_str"),
        col("p.k").as("k_num"),
        col("p.k").isNotNull.as("has_k"),
        col("p.missing").isNotNull.as("has_missing"))
      .orderBy("event_id")
  }

  val all: Seq[Probe] = Seq(
    pFil, pAgg1, pAgg2, pAgg3, pJn1, pJn2, pJn3s, pJn3a, pJn4, pJn5,
    pWin1, pWin2, pWin3, pSrt, pSet, pStr, pDt, pMth, pArr, pArr2, pEvt, pEvt2,
    pEvt4, pEvt5, pEvt6, pJson, pStat)
}
