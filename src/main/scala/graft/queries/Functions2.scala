package graft.queries

import graft.{Probe, Tables}
import org.apache.spark.sql.functions._

/** Second wave of scalar-function coverage: extended string functions,
  * conditional expressions, and array higher-order functions — each shape
  * cross-checked against its DuckDB equivalent.
  */
object Functions2 {

  /** P-STR2 — pad/translate/case/slice string battery. */
  private val pStr2 = Probe(
    "p_str2_functions",
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '.') AS lp,
      |  rpad(p_brand, 12, '.') AS rp,
      |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
      |  reverse(p_brand) AS rev,
      |  repeat(p_brand, 2) AS rep,
      |  left(p_name, 4) AS l4,
      |  right(p_name, 4) AS r4,
      |  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
      |  replace(p_type, ' ', '_') AS rt
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, ".").as("lp"),
      rpad(col("p_brand"), 12, ".").as("rp"),
      translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
      reverse(col("p_brand")).as("rev"),
      repeat(col("p_brand"), 2).as("rep"),
      substring(col("p_name"), 1, 4).as("l4"),
      expr("right(p_name, 4)").as("r4"),
      instr(col("p_name"), "a").cast("long").as("pos_a"),
      expr("replace(p_type, ' ', '_')").as("rt"))
      .orderBy("p_partkey")
  }

  /** P-COND — conditional expression battery: CASE/IF/NULLIF/COALESCE/
    * LEAST/GREATEST over nullable results.
    */
  private val pCond = Probe(
    "p_cond_expressions",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
      |  NULLIF(o_orderstatus, 'O') AS not_open,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
      |  LEAST(o_orderkey % 7, o_orderkey % 5) AS lo,
      |  GREATEST(o_orderkey % 7, o_orderkey % 5) AS hi,
      |  (o_orderkey % 2 = 0) AS is_even
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000, "big")
        .when(col("o_totalprice") > 100000, "mid").otherwise("small").as("bucket"),
      nullif(col("o_orderstatus"), lit("O")).as("not_open"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
      least(col("o_orderkey") % 7, col("o_orderkey") % 5).as("lo"),
      greatest(col("o_orderkey") % 7, col("o_orderkey") % 5).as("hi"),
      (col("o_orderkey") % 2 === 0).as("is_even"))
      .orderBy("o_orderkey")
  }

  /** P-HOF — array higher-order functions: filter / transform / exists /
    * forall / aggregate vs DuckDB list lambdas.
    */
  private val pHof = Probe(
    "p_hof_array_lambdas",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |  CAST(len(list_filter(ws, w -> length(w) > 4)) AS BIGINT) AS n_long,
      |  array_to_string(list_transform(ws[1:3], w -> upper(w)), ',') AS first3_upper,
      |  list_contains(ws, 'spark') AS has_spark,
      |  (len(list_filter(ws, w -> length(w) >= 1)) = len(ws)) AS all_nonempty,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |       list_transform(ws, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS BIGINT) AS total_chars
      |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(
        col("doc_id"),
        expr("CAST(size(filter(ws, w -> length(w) > 4)) AS BIGINT)").as("n_long"),
        expr("array_join(transform(slice(ws, 1, 3), w -> upper(w)), ',')").as("first3_upper"),
        array_contains(col("ws"), "spark").as("has_spark"),
        expr("forall(ws, w -> length(w) >= 1)").as("all_nonempty"),
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))").as("total_chars"))
      .orderBy("doc_id")
  }

  /** P-DT2 — datetime extraction battery. Cross-engine convention note:
    * Spark dayofweek is 1=Sunday..7=Saturday while DuckDB isodow is
    * 1=Monday..7=Sunday; the probe surfaces ISO day-of-week from both.
    */
  private val pDt2 = Probe(
    "p_dt2_extract",
    """SELECT event_id,
      |  CAST(isodow(ts) AS BIGINT) AS iso_dow,
      |  CAST(dayofyear(ts) AS BIGINT) AS doy,
      |  CAST(weekofyear(ts) AS BIGINT) AS woy,
      |  CAST(quarter(ts) AS BIGINT) AS qtr,
      |  CAST(hour(ts) AS BIGINT) AS hh,
      |  CAST(minute(ts) AS BIGINT) AS mi,
      |  CAST(second(ts) AS BIGINT) AS ss,
      |  strftime(make_date(2024, CAST(month(ts) AS INT), 1), '%Y-%m-%d') AS month_anchor
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events").select(
      col("event_id"),
      expr("CAST((dayofweek(ts) + 5) % 7 + 1 AS BIGINT)").as("iso_dow"),
      dayofyear(col("ts")).cast("long").as("doy"),
      weekofyear(col("ts")).cast("long").as("woy"),
      quarter(col("ts")).cast("long").as("qtr"),
      hour(col("ts")).cast("long").as("hh"),
      minute(col("ts")).cast("long").as("mi"),
      second(col("ts")).cast("long").as("ss"),
      date_format(expr("make_date(2024, month(ts), 1)"), "yyyy-MM-dd").as("month_anchor"))
      .orderBy("event_id")
  }

  /** P-SAMPLE — deterministic, engine-portable sampling: hash-bucket the
    * key with md5 and keep a fixed prefix range (~1/8 of rows). Unlike
    * TABLESAMPLE / rand(seed), this is reproducible across engines,
    * partitionings, and versions — the sampling idiom a 100 TB pipeline
    * should standardize on.
    */
  private val pSample = Probe(
    "p_sample_deterministic",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
      |FROM lineitem
      |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))), 1, 1).isin("0", "1"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P-AGG4 — CUBE with GROUPING() disambiguation flags (rollup's sibling;
    * grouping flags distinguish data-null from subtotal-null without
    * sentinel values).
    */
  private val pAgg4 = Probe(
    "p_agg4_cube",
    """SELECT COALESCE(o_orderpriority, '-') AS prio,
      |       COALESCE(o_orderstatus, '-') AS status,
      |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY g_prio, g_status, prio, status""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").createOrReplaceTempView("p_agg4_orders")
    s.sql(
      """SELECT COALESCE(o_orderpriority, '-') AS prio,
        |       COALESCE(o_orderstatus, '-') AS status,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |       COUNT(*) AS n
        |FROM p_agg4_orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY g_prio, g_status, prio, status""".stripMargin)
  }

  /** P-BIT — bitwise operator battery. */
  private val pBit = Probe(
    "p_bit_ops",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  l_orderkey & 255 AS b_and,
      |  l_orderkey | 15 AS b_or,
      |  xor(l_orderkey, 60) AS b_xor,
      |  l_orderkey << 2 AS b_shl,
      |  l_orderkey >> 3 AS b_shr,
      |  CAST(bit_count(l_orderkey) AS BIGINT) AS b_pop
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      expr("l_orderkey & 255").as("b_and"),
      expr("l_orderkey | 15").as("b_or"),
      expr("l_orderkey ^ 60").as("b_xor"),
      expr("shiftleft(l_orderkey, 2)").as("b_shl"),
      expr("shiftright(l_orderkey, 3)").as("b_shr"),
      expr("CAST(bit_count(l_orderkey) AS BIGINT)").as("b_pop"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P-STR3 — edit distance (fuzzy matching primitive for entity
    * resolution / near-dup keys).
    */
  private val pStr3 = Probe(
    "p_str3_levenshtein",
    """SELECT p_partkey,
      |  CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS d_brand,
      |  CAST(levenshtein(left(p_name, 10), left(p_type, 10)) AS BIGINT) AS d_nt
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").select(
      col("p_partkey"),
      levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("d_brand"),
      levenshtein(substring(col("p_name"), 1, 10), substring(col("p_type"), 1, 10))
        .cast("long").as("d_nt"))
      .orderBy("p_partkey")
  }

  /** P-TRY — dirty-data-safe conversion: try_cast returns NULL instead of
    * failing on malformed input; division guarded against zero. The
    * lenient-mode primitive for cleaning pipelines.
    */
  private val pTry = Probe(
    "p_try_safe_casts",
    """SELECT doc_id,
      |  TRY_CAST(lang AS BIGINT) AS lang_as_num,
      |  TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n_roundtrip,
      |  TRY_CAST(substr(text, 1, 3) AS DOUBLE) AS text_as_num,
      |  n_chars / NULLIF(n_chars - n_chars, 0) AS div_by_zero,
      |  TRY_CAST('2024-13-45' AS DATE) IS NULL AS bad_date_is_null
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents").select(
      col("doc_id"),
      expr("try_cast(lang AS BIGINT)").as("lang_as_num"),
      expr("try_cast(CAST(n_chars AS STRING) AS BIGINT)").as("n_roundtrip"),
      expr("try_cast(substr(text, 1, 3) AS DOUBLE)").as("text_as_num"),
      expr("try_divide(n_chars, n_chars - n_chars)").as("div_by_zero"),
      expr("try_cast('2024-13-45' AS DATE) IS NULL").as("bad_date_is_null"))
      .orderBy("doc_id")
  }

  /** P-MAP — map-type construction and access (map_from_arrays /
    * element_at vs DuckDB map / bracket access).
    */
  private val pMap = Probe(
    "p_map_functions",
    """WITH t AS (SELECT p_partkey, map(['brand', 'type'], [p_brand, p_type]) AS m FROM part)
      |SELECT p_partkey,
      |  m['brand'][1] AS brand_v,
      |  m['type'][1] AS type_v,
      |  m['missing'][1] AS missing_v,
      |  array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
      |  CAST(cardinality(m) AS BIGINT) AS n_entries
      |FROM t ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .withColumn("m", map_from_arrays(
        array(lit("brand"), lit("type")), array(col("p_brand"), col("p_type"))))
      .select(col("p_partkey"),
        element_at(col("m"), "brand").as("brand_v"),
        element_at(col("m"), "type").as("type_v"),
        element_at(col("m"), "missing").as("missing_v"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
        size(col("m")).cast("long").as("n_entries"))
      .orderBy("p_partkey")
  }

  val all: Seq[Probe] = Seq(pStr2, pCond, pHof, pDt2, pSample, pAgg4, pBit, pStr3, pTry, pMap)
}
