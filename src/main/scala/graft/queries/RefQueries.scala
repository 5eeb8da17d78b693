package graft.queries

import graft.{Probe, Tables}
import graft.clean.CleanFns
import org.apache.spark.sql.functions._

/** The reference's query surface (SURVEY.md §2.7) re-expressed over the
  * driver testdata so the DuckDB oracle can check it, plus the cleaning
  * functions F1–F5 (§2.4) golden-checked over the dirty-value corpus of
  * FIXTURES.md §3 as literal fixtures.
  *
  * The true OSM-shaped pipeline (XML → 5 tables → notebook queries against
  * golden outputs) lives in graft.osm + its ScalaTest goldens; these probes
  * pin the same operator semantics where the oracle can see them.
  */
object RefQueries {

  /** R-Q1 (intended semantics — SURVEY §2.7 quirk note): UNION ALL of two
    * grouped counts, ordered by count desc. Shape of DAND.html:12095-12099.
    */
  private val rq1 = Probe(
    "r_q1_union_all_counts",
    """SELECT * FROM (
      |  SELECT 'documents' AS src, lang AS type, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
      |  UNION ALL
      |  SELECT 'events' AS src, event_type AS type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY event_type
      |) ORDER BY cnt DESC, src, type""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents").groupBy(col("lang").as("type"))
      .agg(count(lit(1)).as("cnt")).select(lit("documents").as("src"), col("type"), col("cnt"))
    val evts = Tables(s, dir, "events").groupBy(col("event_type").as("type"))
      .agg(count(lit(1)).as("cnt")).select(lit("events").as("src"), col("type"), col("cnt"))
    docs.unionAll(evts).orderBy(col("cnt").desc, col("src"), col("type"))
  }

  /** R-Q2: single grouped count ordered desc (DAND.html:12229-12232). */
  private val rq2 = Probe(
    "r_q2_group_count",
    """SELECT event_type AS type, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM events GROUP BY event_type ORDER BY cnt DESC, type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("event_type").as("type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("type"))
  }

  /** R-Q3: inner equi-join + equality filter + projection
    * (fire-hydrant query shape, DAND.html:12357-12360).
    */
  private val rq3 = Probe(
    "r_q3_join_filter",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderpriority
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE o.o_orderstatus = 'F'
      |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .filter(o("o_orderstatus") === "F")
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** R-Q4: UNION (distinct) of grouped counts + ORDER BY DESC + LIMIT top-k
    * (top-contributors shape, DAND.html:12447-12452).
    */
  private val rq4 = Probe(
    "r_q4_union_topk",
    """SELECT * FROM (
      |  SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderpriority
      |  UNION
      |  SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag
      |) ORDER BY cnt DESC, grp LIMIT 10""".stripMargin) { (s, dir) =>
    val a = Tables(s, dir, "orders").groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("cnt"))
    val b = Tables(s, dir, "lineitem").groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("cnt"))
    a.union(b).distinct().orderBy(col("cnt").desc, col("grp")).limit(10)
  }

  /** R-Q5: oldest/newest timestamp — ORDER BY + LIMIT 1 ⇒ min/max
    * (DAND.html:12552-12555). Epoch micros keeps the comparison exact.
    */
  private val rq5 = Probe(
    "r_q5_minmax_ts",
    """SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS ts_min,
      |       CAST(epoch_us(MAX(ts)) AS BIGINT) AS ts_max
      |FROM events""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events").agg(
      unix_micros(min(col("ts"))).as("ts_min"),
      unix_micros(max(col("ts"))).as("ts_max"))
  }

  // ---- R-C1..R-C5: cleaning functions over the dirty corpus (FIXTURES.md §3).

  private def fixtureDf(s: org.apache.spark.sql.SparkSession, rows: Seq[String]) = {
    import s.implicits._
    rows.toDF("raw")
  }

  private def valuesSql(rows: Seq[String]): String =
    rows.map(r => s"('${r.replace("'", "''")}')").mkString("VALUES ", ", ", "")

  private val streetRows = Seq(
    "Main St", "Main St.", "N Ave", "Oak Blvd", "Elm Rd.", "Elm Rd",
    "lower street", "Pecan Trl", "Fox Ln", "Sky Dr", "Quiet Cv", "Kings Ct",
    "Deer Cc", "eagle pass", "Park Terrance", "Basket Flower Bend",
    "Main Street", "FM 973")

  private val streetCaseSql = CleanFns.streetMapping
    .map { case (k, v) => s"WHEN '${k.replace("'", "''")}' THEN '$v'" }
    .mkString("CASE tok ", " ", " END")

  private val expectedInSql =
    CleanFns.expectedStreetTypes.map(e => s"'$e'").mkString("(", ", ", ")")

  private val rc1 = Probe(
    "r_c1_clean_street",
    s"""WITH t(raw) AS (${valuesSql(streetRows)}),
       |x AS (SELECT raw, regexp_extract(raw, '\\b\\S+\\.?$$') AS tok FROM t)
       |SELECT raw, CASE WHEN tok IN $expectedInSql THEN raw
       |  ELSE regexp_replace(raw, '\\b\\S+\\.?$$', $streetCaseSql) END AS cleaned
       |FROM x ORDER BY raw""".stripMargin) { (s, _) =>
    fixtureDf(s, streetRows)
      .select(col("raw"), CleanFns.street(col("raw")).as("cleaned"))
      .orderBy("raw")
  }

  private val phoneRows = Seq(
    "+1 (512) 281-5440", "512.281.5440", "(512) 2815440", "15122815440",
    "512-281-5440", "5122815440123", "281-5440")

  private val rc2 = Probe(
    "r_c2_clean_phone",
    s"""WITH t(raw) AS (${valuesSql(phoneRows)}),
       |d AS (SELECT raw, regexp_replace(raw, '[^0-9]+', '', 'g') AS ds FROM t),
       |e AS (SELECT raw, CASE WHEN substr(ds,1,1)='1' THEN substr(ds,2) ELSE ds END AS ds FROM d)
       |SELECT raw, substr(ds,1,3) || '-' || substr(ds,4,3) || '-' || substr(ds,7) AS cleaned
       |FROM e ORDER BY raw""".stripMargin) { (s, _) =>
    fixtureDf(s, phoneRows)
      .select(col("raw"), CleanFns.phone(col("raw")).as("cleaned"))
      .orderBy("raw")
  }

  private val cityRows = Seq(
    "Elgin, TX", "Pflugerville, TX", "Round Rock", "Austin", "Round",
    "Cedar-Park, TX", " odd leading space")

  private val rc3 = Probe(
    "r_c3_clean_city",
    s"""WITH t(raw) AS (${valuesSql(cityRows)}),
       |x AS (SELECT raw, regexp_extract(raw, '^([\\w\\-]+)', 1) AS first FROM t)
       |SELECT raw, CASE WHEN first = '' THEN raw
       |  WHEN first = 'Round' THEN 'Round Rock' ELSE first END AS cleaned
       |FROM x ORDER BY raw""".stripMargin) { (s, _) =>
    fixtureDf(s, cityRows)
      .select(col("raw"), CleanFns.city(col("raw")).as("cleaned"))
      .orderBy("raw")
  }

  private val postcodeRows = Seq(
    "78621-1242", "TX 78621", "78621", "787 xx 12345678", "TX78621-0001")

  private val rc4 = Probe(
    "r_c4_clean_postcode",
    s"""WITH t(raw) AS (${valuesSql(postcodeRows)})
       |SELECT raw, regexp_extract(raw, '\\d{5}') AS cleaned FROM t ORDER BY raw""".stripMargin) {
    (s, _) =>
      fixtureDf(s, postcodeRows)
        .select(col("raw"), CleanFns.postcode(col("raw")).as("cleaned"))
        .orderBy("raw")
  }

  private val stateRows = Seq("TX", "Texas", "tx", "CA", "TX ")

  private val rc5 = Probe(
    "r_c5_clean_state",
    s"""WITH t(raw) AS (${valuesSql(stateRows)})
       |SELECT raw, CASE WHEN raw = 'TX' THEN 'Texas' ELSE raw END AS cleaned
       |FROM t ORDER BY raw""".stripMargin) { (s, _) =>
    fixtureDf(s, stateRows)
      .select(col("raw"), CleanFns.state(col("raw")).as("cleaned"))
      .orderBy("raw")
  }

  /** R-A1 shape: audit aggregation — group by extracted token, collect the
    * distinct raw values (SURVEY §2.5). Sorted + joined to a string so the
    * set compares portably.
    */
  private val ra1 = Probe(
    "r_a1_audit_group_collect",
    """SELECT regexp_extract(text, '\S+$') AS tok,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       string_agg(DISTINCT source, ',' ORDER BY source) AS sources
      |FROM documents GROUP BY 1 ORDER BY tok""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .groupBy(regexp_extract(col("text"), "\\S+$", 0).as("tok"))
      .agg(count(lit(1)).as("cnt"),
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"))
      .orderBy("tok")
  }

  val all: Seq[Probe] = Seq(rq1, rq2, rq3, rq4, rq5, rc1, rc2, rc3, rc4, rc5, ra1)
}
