package graft.queries

import graft.{Probe, Tables}

/** Round-3 modern-SQL surface: the Spark 4.x features a reference user
  * migrating real pipelines will reach for next — recursive CTEs
  * (hierarchy walks; plans as Catalyst's UnionLoop), correlated LATERAL
  * subqueries (DecorrelateInnerQuery turns them into join+agg, no
  * per-row re-execution), and the VARIANT type for schema-on-read JSON
  * (extraction without a declared struct schema).
  *
  * All three oracle-checked against DuckDB equivalents; VARIANT itself is
  * never surfaced (only extracted BIGINT/STRING/BOOLEAN values — §8.4).
  */
object Modern {

  /** P-REC — recursive CTE: digit-ancestor walk over part keys (parent =
    * key DIV 10), yielding each key's depth (digit count) and its
    * single-digit ancestor. Exercises the iterative UnionLoop execution
    * the same way a BOM/org-chart traversal would, on real table input
    * with a deterministic closed form.
    */
  private val pRec = Probe(
    "p_rec_cte_hierarchy",
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS pk, p_partkey AS cur, 0 AS d FROM part
      |  UNION ALL
      |  SELECT pk, cur // 10, d + 1 FROM anc WHERE cur > 0)
      |SELECT pk, CAST(MAX(d) AS BIGINT) AS depth,
      |  CAST(MAX(CASE WHEN cur > 0 AND cur < 10 THEN cur END) AS BIGINT) AS top_digit
      |FROM anc GROUP BY pk ORDER BY pk""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part").createOrReplaceTempView("part_rec")
    s.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS pk, p_partkey AS cur, 0 AS d FROM part_rec
        |  UNION ALL
        |  SELECT pk, cur DIV 10, d + 1 FROM anc WHERE cur > 0)
        |SELECT pk, CAST(MAX(d) AS BIGINT) AS depth,
        |  CAST(MAX(CASE WHEN cur > 0 AND cur < 10 THEN cur END) AS BIGINT) AS top_digit
        |FROM anc GROUP BY pk ORDER BY pk""".stripMargin)
  }

  /** P-LAT2 — correlated LATERAL subquery: per-region aggregate computed
    * in a lateral derived table. Catalyst decorrelates this into a
    * broadcast join + aggregation (asserted well-planned via the gate's
    * no-cartesian audit) — the SQL-standard spelling of "for each row,
    * run this parameterized subquery" without per-row execution.
    */
  private val pLat2 = Probe(
    "p_lat2_lateral_subquery",
    """SELECT r.r_regionkey, t.n_nations, t.first_nation
      |FROM region r, LATERAL (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations, MIN(n.n_name) AS first_nation
      |  FROM nation n WHERE n.n_regionkey = r.r_regionkey) t
      |ORDER BY r.r_regionkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "region").createOrReplaceTempView("region_lat")
    Tables(s, dir, "nation").createOrReplaceTempView("nation_lat")
    s.sql(
      """SELECT r.r_regionkey, t.n_nations, t.first_nation
        |FROM region_lat r, LATERAL (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations, MIN(n.n_name) AS first_nation
        |  FROM nation_lat n WHERE n.n_regionkey = r.r_regionkey) t
        |ORDER BY r.r_regionkey""".stripMargin)
  }

  /** P-VAR — VARIANT ingestion: parse_json → variant_get extraction with
    * declared result types, no struct schema up front (the schema-on-read
    * path for heterogeneous event payloads). The VARIANT value itself
    * stays internal; only typed extractions surface.
    */
  private val pVar = Probe(
    "p_var_variant_json",
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
      |  json_extract_string(props, '$.k') AS k_str,
      |  (json_extract(props, '$.nope') IS NULL) AS missing_null
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events").createOrReplaceTempView("events_var")
    s.sql(
      """SELECT event_id,
        |  variant_get(parse_json(props), '$.k', 'bigint') AS k_num,
        |  CAST(variant_get(parse_json(props), '$.k', 'bigint') AS STRING) AS k_str,
        |  (variant_get(parse_json(props), '$.nope', 'string') IS NULL) AS missing_null
        |FROM events_var ORDER BY event_id""".stripMargin)
  }

  /** P-GRPALL — `GROUP BY ALL` (Spark 4 / modern-SQL sugar: every
    * non-aggregate select item becomes a grouping key). The oracle spells
    * the keys out — pinning that the sugar resolves to exactly that.
    */
  private val pGrpAll = Probe(
    "p_grpall_group_by_all",
    """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
      |       MIN(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "nation").createOrReplaceTempView("nation_ga")
    s.sql(
      """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(n_name) AS first_name
        |FROM nation_ga GROUP BY ALL
        |ORDER BY n_regionkey""".stripMargin)
  }

  /** P-STR5 — ordered string aggregation: Spark 4's `listagg(...) WITHIN
    * GROUP (ORDER BY ...)` vs DuckDB's `string_agg(... ORDER BY ...)`.
    * Deterministic only BECAUSE of the explicit within-group order — the
    * point of the probe: unordered listagg would be partition-order-
    * dependent and could never pass a cross-engine hash.
    */
  private val pStr5 = Probe(
    "p_str5_listagg",
    """SELECT n_regionkey,
      |       string_agg(n_name, ',' ORDER BY n_name) AS names
      |FROM nation GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "nation").createOrReplaceTempView("nation_la")
    s.sql(
      """SELECT n_regionkey,
        |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation_la GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin)
  }

  val all: Seq[Probe] = Seq(pRec, pLat2, pVar, pGrpAll, pStr5)
}
