package graft.queries

import graft.{Probe, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 breadth probes: window navigation/distribution functions,
  * arg-min/max aggregation, explicit GROUPING SETS, conditional (FILTER)
  * aggregation, unpivot, IN/NOT IN subqueries, positional lateral explode,
  * null-safe comparison, and stopword-filtered term frequency.
  *
  * Same portability discipline as Probes: exact integer/decimal derivations
  * (cents via DECIMAL, never double casts), total ORDER BY on a unique key,
  * doubles only from identical single IEEE ops on both engines, decimals
  * never surfaced (BIGINT or DOUBLE outputs only — see Probes header).
  */
object Breadth {

  /** Exact cents from 2-decimal money stored as double: decimal cast is
    * unambiguous (the double is within half an ulp of the 2-decimal value),
    * then *100 and the BIGINT cast are exact decimal ops.
    */
  private def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * 100).cast("bigint")

  /** P-WIN4 — navigation + distribution windows: lag with offset/default,
    * lead with default, cume_dist, and IGNORE NULLS first_value.
    */
  private val pWin4 = Probe(
    "p_win4_navigation",
    """SELECT event_id, user_id,
      |  lag(value, 2, -1.0) OVER w AS lag2_value,
      |  lead(event_id, 1, -1) OVER w AS next_id,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  first_value(NULLIF(event_type, 'click') IGNORE NULLS)
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nonclick
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "events").select(
      col("event_id"), col("user_id"),
      lag(col("value"), 2, -1.0).over(w).as("lag2_value"),
      lead(col("event_id"), 1, -1L).over(w).as("next_id"),
      round(cume_dist().over(w), 6).as("cd"),
      first(when(col("event_type") =!= "click", col("event_type")), ignoreNulls = true)
        .over(wFull).as("first_nonclick"))
      .orderBy("event_id")
  }

  /** P-AGG5 — min_by/max_by (arg-min/arg-max): survivor selection without a
    * self-join. The "by" value embeds the unique key so ties are impossible
    * (engines may otherwise pick different arg rows).
    */
  private val pAgg5 = Probe(
    "p_agg5_minmax_by",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey AS uniq
      |  FROM orders)
      |SELECT o_custkey,
      |  arg_max(o_orderkey, uniq) AS biggest_order,
      |  arg_min(o_orderkey, uniq) AS smallest_order,
      |  CAST(max(uniq) // 1000000000 AS BIGINT) AS max_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      // 1e9 multiplier: orderkey reaches 6M×sf, so 1e6 would collide beyond
      // ~sf0.17; cents ≤ ~6e7 at sf1 keeps cents*1e9 + key inside BIGINT
      .select(col("o_custkey"), col("o_orderkey"),
        (cents(col("o_totalprice")) * 1000000000L + col("o_orderkey")).as("uniq"))
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"), col("uniq")).as("biggest_order"),
        min_by(col("o_orderkey"), col("uniq")).as("smallest_order"),
        expr("max(uniq) DIV 1000000000").as("max_cents"),
        count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  /** P-AGG6 — conditional aggregation (the FILTER clause pattern): per-status
    * counts and exact cent sums in one pass over the fact table — the
    * map-side-combinable alternative to N filtered scans.
    */
  private val pAgg6 = Probe(
    "p_agg6_filtered",
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_done,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
      |       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS open_cents,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
      |       THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS done_cents
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_done"),
        sum(when(col("o_orderstatus") === "O", cents(col("o_totalprice"))).otherwise(0L))
          .cast("bigint").as("open_cents"),
        sum(when(col("o_orderstatus") === "F", cents(col("o_totalprice"))).otherwise(0L))
          .cast("bigint").as("done_cents"))
      .orderBy("o_orderpriority")
  }

  /** P-GRPSETS — explicit GROUPING SETS (beyond ROLLUP/CUBE: an arbitrary
    * set list) with GROUPING flags. Grouping keys are never null in the
    * data, so the COALESCE sentinels are unambiguous.
    */
  private val pGrpSets = Probe(
    "p_grpsets",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority, g_status, g_priority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").createOrReplaceTempView("br_orders")
    // GROUPING SETS has no DataFrame-API form (only rollup/cube) — the SQL
    // surface IS the capability here.
    s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
            |       COALESCE(o_orderpriority, 'ALL') AS priority,
            |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
            |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
            |       COUNT(*) AS n
            |FROM br_orders
            |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ())
            |ORDER BY status, priority, g_status, g_priority""".stripMargin)
  }

  /** P-UNPIVOT — wide→long reshape (melt): id column + (attr, val) pairs.
    * All melted values are BIGINT so the stacked column has one type.
    */
  private val pUnpivot = Probe(
    "p_unpivot",
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey AS custkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(year(o_orderdate) AS BIGINT) AS yr
      |  FROM orders WHERE o_orderkey < 500)
      |SELECT o_orderkey, attr, val FROM (
      |  SELECT o_orderkey, 'custkey' AS attr, custkey AS val FROM o
      |  UNION ALL SELECT o_orderkey, 'cents', cents FROM o
      |  UNION ALL SELECT o_orderkey, 'yr', yr FROM o)
      |ORDER BY o_orderkey, attr""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        cents(col("o_totalprice")).as("cents"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("custkey"), col("cents"), col("yr")), "attr", "val")
      .orderBy("o_orderkey", "attr")
  }

  /** P-SUBQ2 — IN / NOT IN subqueries (Catalyst rewrites to semi/anti
    * joins; the declarative form is what users write). Keys are non-null in
    * the data, so NOT IN's null trap does not bite — and bites identically
    * in both engines if it ever did.
    */
  private val pInSubq = Probe(
    "p_in_subquery",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 0)
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer").createOrReplaceTempView("br_customer")
    Tables(s, dir, "supplier").createOrReplaceTempView("br_supplier")
    Tables(s, dir, "orders").createOrReplaceTempView("br_orders2")
    s.sql("""SELECT c_custkey, c_name FROM br_customer
            |WHERE c_nationkey IN (SELECT s_nationkey FROM br_supplier WHERE s_acctbal > 0)
            |  AND c_custkey NOT IN (SELECT o_custkey FROM br_orders2 WHERE o_orderstatus = 'P')
            |ORDER BY c_custkey""".stripMargin)
  }

  /** P-LAT — positional lateral explode: token + 0-based position per
    * document (the order-preserving flatten that backs way_nodes in the OSM
    * pipeline, here as a declared relational capability).
    */
  private val pLateral = Probe(
    "p_lateral_posexplode",
    """SELECT doc_id, CAST(unnest(range(len(l))) AS BIGINT) AS pos, unnest(l) AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents WHERE doc_id < 200)
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
      .orderBy("doc_id", "pos")
  }

  /** P-NSC — null-safe comparison: IS [NOT] DISTINCT FROM (Spark `<=>`),
    * NULLIF/COALESCE interplay, over derived nullable columns.
    */
  private val pNullSafe = Probe(
    "p_null_safe_cmp",
    """SELECT o_orderkey,
      |  (NULLIF(o_orderstatus, 'O') IS DISTINCT FROM NULLIF(o_orderstatus, 'F')) AS ab_distinct,
      |  (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'F')) AS ab_same,
      |  (NULLIF(o_orderstatus, 'O') IS NULL) AS a_null,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), '-') AS a_val
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val a = when(col("o_orderstatus") =!= "O", col("o_orderstatus"))
    val b = when(col("o_orderstatus") =!= "F", col("o_orderstatus"))
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      (!(a <=> b)).as("ab_distinct"),
      (a <=> b).as("ab_same"),
      a.isNull.as("a_null"),
      coalesce(a, lit("-")).as("a_val"))
      .orderBy("o_orderkey")
  }

  /** X-TXT6 — stopword-filtered top-3 terms per document (TF with a
    * deterministic (count DESC, term ASC) tiebreak): the per-doc keyword
    * extraction stage of a corpus pipeline. One shuffle on (doc_id, tok),
    * WindowGroupLimit prunes the rank filter below the sort at scale.
    * The Spark side IS the Corpus.topTerms fluent API — one definition,
    * one stopword list.
    */
  private val xTxt6 = Probe(
    "x_txt6_top_terms",
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), tkn -> tkn <> '')) AS tok FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      |  WHERE len(tok) > 0 AND tok NOT IN (${graft.api.Corpus.defaultStopwords.map("'" + _ + "'").mkString(",")})
      |  GROUP BY doc_id, tok),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rk FROM tf)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, n
      |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    graft.api.Corpus(s, dir).topTerms(3).orderBy("doc_id", "rk")
  }

  /** P-EVT3 — native session windows (session_window, gap = 30 min) in
    * batch form: the same operator Structured Streaming uses for stateful
    * sessionization, so the batch and streaming session definitions are
    * one declaration. window.end = last event + gap by definition; the
    * oracle reproduces that from the lag/cumsum formulation.
    */
  private val pEvt3 = Probe(
    "p_evt3_session_window",
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  -- (ts, event_id): the cumsum must use the SAME total order as the
      |  -- lag window, or tied timestamps make session ids nondeterministic
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM e)
      |SELECT user_id,
      |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
      |  CAST(MAX(epoch_us(ts)) + 1800000000 AS BIGINT) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM s GROUP BY user_id, sess
      |ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).cast("bigint").as("sum_cents"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("sum_cents"))
      .orderBy("user_id", "start_us")
  }

  /** P-REGEX2 — second regex battery: match counting, first-match
    * extraction, case-insensitive LIKE, boolean regex test. Spark's
    * regexp_substr yields NULL on no-match where DuckDB's regexp_extract
    * yields '' — COALESCE pins the same surface.
    */
  private val pRegex2 = Probe(
    "p_regex2_functions",
    """SELECT p_partkey,
      |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
      |  regexp_extract(p_name, '[a-z]{3,}') AS first_long,
      |  p_name ILIKE '%RE%' AS has_re_ci,
      |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").select(
      col("p_partkey"),
      expr("regexp_count(p_name, '[aeiou]')").cast("long").as("n_vowels"),
      coalesce(expr("regexp_substr(p_name, '[a-z]{3,}')"), lit("")).as("first_long"),
      col("p_name").ilike("%RE%").as("has_re_ci"),
      col("p_name").rlike("^[a-z]+ ").as("starts_word"))
      .orderBy("p_partkey")
  }

  /** P-STR4 — third string battery: field splitting, fixed-width slicing,
    * position search, codepoint conversion, printf formatting.
    */
  private val pStr4 = Probe(
    "p_str4_functions",
    """SELECT p_partkey,
      |  split_part(p_name, ' ', 2) AS word2,
      |  left(p_name, 3) AS l3, right(p_name, 3) AS r3,
      |  CAST(position('a' IN p_name) AS BIGINT) AS pos_a,
      |  CAST(ascii(p_name) AS BIGINT) AS first_cp,
      |  chr((65 + (p_partkey % 26))::INT) AS letter,
      |  printf('%s-%04d', p_brand, (p_partkey % 1000)::INT) AS tag
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").select(
      col("p_partkey"),
      expr("split_part(p_name, ' ', 2)").as("word2"),
      expr("left(p_name, 3)").as("l3"), expr("right(p_name, 3)").as("r3"),
      expr("instr(p_name, 'a')").cast("long").as("pos_a"),
      ascii(col("p_name")).cast("long").as("first_cp"),
      expr("chr(65 + pmod(p_partkey, 26))").as("letter"),
      format_string("%s-%04d", col("p_brand"),
        expr("CAST(pmod(p_partkey, 1000) AS INT)")).as("tag"))
      .orderBy("p_partkey")
  }

  /** P-DT3 — epoch round-trips, week/quarter truncation, clamped month
    * arithmetic, date construction. All surfaced as formatted strings or
    * BIGINT epoch seconds (never raw TIMESTAMP — engines' parquet tz
    * handling differs). The oracle round-trips through epoch_ms (naive
    * timestamp), NOT to_timestamp (TIMESTAMPTZ — renders in the DuckDB
    * session timezone, while Spark is pinned to UTC).
    */
  private val pDt3 = Probe(
    "p_dt3_epoch_trunc",
    """SELECT o_orderkey,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(epoch_ms(CAST(epoch(o_orderdate) AS BIGINT) * 1000), '%Y-%m-%d %H:%M:%S') AS rt,
      |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
      |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qt,
      |  strftime(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS plus_m,
      |  strftime(make_date(2024, ((o_orderkey % 12) + 1)::INT, 15), '%Y-%m-%d') AS md
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      from_unixtime(unix_timestamp(col("o_orderdate"))).as("rt"),
      date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("wk"),
      date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qt"),
      date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("plus_m"),
      date_format(make_date(lit(2024), pmod(col("o_orderkey"), lit(12)) + 1, lit(15)),
        "yyyy-MM-dd").as("md"))
      .orderBy("o_orderkey")
  }

  /** X-DED6 — canonical-form dedup: normalize (lowercase, strip
    * punctuation, collapse whitespace) → md5 key → smallest-id survivor
    * with duplicate counts. The cheap text-canonicalization family of the
    * dedup suite (catches case/punctuation-only near-dups exactly).
    */
  private val xDed6 = Probe(
    "x_ded6_canonical",
    """SELECT md5(lower(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS ckey,
      |  CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY survivor_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy(md5(lower(regexp_replace(
        regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""), " +", " "))).as("ckey"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_docs"))
      .orderBy("survivor_id")
  }

  /** P-AGG7 — several COUNT(DISTINCT ...) over DIFFERENT columns in one
    * aggregation: Catalyst plans this with an Expand (one row replica per
    * distinct column) + two-phase aggregation — one pass over the fact
    * table instead of N self-joined single-distinct queries.
    */
  private val pAgg7 = Probe(
    "p_agg7_multi_distinct",
    """SELECT l_linestatus,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_part,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS d_supp,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d_ord,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        countDistinct(col("l_partkey")).as("d_part"),
        countDistinct(col("l_suppkey")).as("d_supp"),
        countDistinct(col("l_orderkey")).as("d_ord"),
        count(lit(1)).as("n"))
      .orderBy("l_linestatus")
  }

  private val vocab = Seq("widget", "small", "cold", "large", "shiny", "red")

  /** P-ARR4 — array set algebra (intersect / except / union) against a
    * literal vocabulary; results sorted+distinct on both engines so set
    * semantics, not element order, are what is compared.
    */
  private val pArr4 = Probe(
    "p_arr4_set_ops",
    s"""SELECT p_partkey,
      |  COALESCE(array_to_string(list_sort(list_distinct(list_filter(string_split(p_name, ' '),
      |    x -> list_contains(${vocab.map("'" + _ + "'").mkString("[", ",", "]")}, x)))), ','), '') AS inter,
      |  COALESCE(array_to_string(list_sort(list_distinct(list_filter(string_split(p_name, ' '),
      |    x -> NOT list_contains(${vocab.map("'" + _ + "'").mkString("[", ",", "]")}, x)))), ','), '') AS exc,
      |  COALESCE(array_to_string(list_sort(list_distinct(list_concat(string_split(p_name, ' '),
      |    ${vocab.map("'" + _ + "'").mkString("[", ",", "]")}))), ','), '') AS uni
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val voc = array(vocab.map(lit): _*)
    Tables(s, dir, "part").select(
      col("p_partkey"),
      array_join(array_sort(array_intersect(split(col("p_name"), " "), voc)), ",").as("inter"),
      array_join(array_sort(array_except(split(col("p_name"), " "), voc)), ",").as("exc"),
      array_join(array_sort(array_union(split(col("p_name"), " "), voc)), ",").as("uni"))
      .orderBy("p_partkey")
  }

  val all: Seq[Probe] = Seq(
    pWin4, pAgg5, pAgg6, pGrpSets, pUnpivot, pInSubq, pLateral, pNullSafe,
    pEvt3, xTxt6, pRegex2, pStr4, pDt3, xDed6, pAgg7, pArr4)
}
