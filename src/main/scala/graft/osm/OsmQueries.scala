package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The notebook's five queries (SURVEY.md §2.7, DAND.html:12095-12610) in
  * intended-semantics form, plus the literal-SQLite variants for the
  * compound-SELECT quirk, plus the Step-1 audit aggregations (§2.5).
  *
  * All run through spark.sql over the registered views — the whole leg is
  * stock Catalyst (broadcast-hash for Q3's dim side, partial+final aggs,
  * TakeOrderedAndProject for Q4/Q5's ORDER BY + LIMIT).
  *
  * Determinism note: the notebook queries have no tiebreak on equal counts;
  * a `, type` / `, user` tiebreak is added so results are stable — a
  * documented divergence, values are unchanged.
  */
object OsmQueries {

  /** Q1 — type counts across ways_tags ∪ node_tags (intended semantics:
    * GROUP BY in both branches; see SURVEY §2.7 for the SQLite quirk).
    */
  def q1(spark: SparkSession): DataFrame = spark.sql(
    """SELECT type, Count FROM (
      |  SELECT type, COUNT(*) AS Count FROM ways_tags GROUP BY type
      |  UNION ALL
      |  SELECT type, COUNT(*) AS Count FROM node_tags GROUP BY type)
      |ORDER BY Count DESC, type""".stripMargin)

  /** Q1 literal variant — replicates what SQLite actually executed: the
    * GROUP BY binds only to the second SELECT; the first is a one-row
    * whole-table aggregate (its `type` value is arbitrary in SQLite; the
    * deterministic emulation surfaces MIN(type)).
    */
  def q1Literal(spark: SparkSession): DataFrame = spark.sql(
    """SELECT type, Count FROM (
      |  SELECT MIN(type) AS type, COUNT(*) AS Count FROM ways_tags
      |  UNION ALL
      |  SELECT type, COUNT(*) AS Count FROM node_tags GROUP BY type)
      |ORDER BY Count DESC, type""".stripMargin)

  /** Q2 — node_tags type counts (DAND.html:12229-12232). */
  def q2(spark: SparkSession): DataFrame = spark.sql(
    """SELECT type, COUNT(*) AS Count FROM node_tags
      |GROUP BY type ORDER BY Count DESC, type""".stripMargin)

  /** Q3 — fire hydrants: inner equi-join + filter + projection
    * (DAND.html:12357-12360; the notebook's `node.tags.id` typo resolved to
    * the intended equi-join).
    */
  def q3(spark: SparkSession): DataFrame = spark.sql(
    """SELECT node.id, node.lat, node.lon, node_tags.type
      |FROM node JOIN node_tags ON node.id = node_tags.id
      |WHERE node_tags.type = 'fire_hydrant'
      |ORDER BY node.id""".stripMargin)

  /** Q4 — top-10 contributors, UNION distinct of grouped counts
    * (intended semantics; DAND.html:12447-12452).
    */
  def q4(spark: SparkSession): DataFrame = spark.sql(
    """SELECT user, Count FROM (
      |  SELECT user, COUNT(*) AS Count FROM ways GROUP BY user
      |  UNION
      |  SELECT user, COUNT(*) AS Count FROM node GROUP BY user)
      |ORDER BY Count DESC, user LIMIT 10""".stripMargin)

  /** Q4 literal variant — SQLite bound the GROUP BY to the second SELECT
    * only: first branch is one whole-table row.
    */
  def q4Literal(spark: SparkSession): DataFrame = spark.sql(
    """SELECT user, Count FROM (
      |  SELECT MIN(user) AS user, COUNT(*) AS Count FROM ways
      |  UNION
      |  SELECT user, COUNT(*) AS Count FROM node GROUP BY user)
      |ORDER BY Count DESC, user LIMIT 10""".stripMargin)

  /** Q5 — oldest and newest node edit. ISO-8601 strings sort
    * chronologically, exactly as the reference relies on
    * (DAND.html:12552-12555, :12608-12610).
    */
  def q5Oldest(spark: SparkSession): DataFrame =
    spark.sql("SELECT timestamp FROM node ORDER BY timestamp LIMIT 1")

  def q5Newest(spark: SparkSession): DataFrame =
    spark.sql("SELECT timestamp FROM node ORDER BY timestamp DESC LIMIT 1")

  // ---- Step-1 audit aggregations (A1-A6, Step_1_Audit_Values.py:43-138) ----
  // Run over RAW (pre-clean, pre-split) tags: (k, v) for both nodes & ways.

  import graft.clean.CleanFns

  /** Raw audit input: every <tag> of every node|way, undropped, unsplit. */
  def rawTags(nodesRaw: DataFrame, waysRaw: DataFrame): DataFrame = {
    def tags(df: DataFrame) = df
      .select(explode(col("tag")).as("t"))
      .select(col("t._k").as("k"), col("t._v").as("v"))
    tags(nodesRaw).unionAll(tags(waysRaw))
  }

  /** A1 — street values whose last token is not in the expected list,
    * grouped by that token (defaultdict(set) semantics; sets sorted for
    * determinism).
    */
  def auditStreets(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "addr:street")
    .withColumn("street_type", regexp_extract(col("v"), CleanFns.lastTokenRe, 0))
    .filter(col("street_type") =!= "") // reference skips non-matching values
    .filter(!col("street_type").isInCollection(CleanFns.expectedStreetTypes))
    .groupBy("street_type")
    .agg(array_sort(collect_set(col("v"))).as("values"))
    .orderBy("street_type")

  /** A2 — states grouped by first letter run. */
  def auditStates(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "addr:state")
    .filter(regexp_extract(col("v"), "[A-Za-z+]+", 0) =!= "")
    .groupBy(regexp_extract(col("v"), "[A-Za-z+]+", 0).as("state_type"))
    .agg(array_sort(collect_set(col("v"))).as("values"))
    .orderBy("state_type")

  /** A3 — cities grouped by first word (golden shape DAND.html:11861-11866). */
  def auditCities(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "addr:city")
    .filter(regexp_extract(col("v"), CleanFns.cityRe, 1) =!= "")
    .groupBy(regexp_extract(col("v"), CleanFns.cityRe, 1).as("city_type"))
    .agg(array_sort(collect_set(col("v"))).as("values"))
    .orderBy("city_type")

  /** A4 — housenumbers grouped by first digit run. */
  def auditHousenumbers(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "addr:housenumber")
    .filter(regexp_extract(col("v"), "\\d+", 0) =!= "")
    .groupBy(regexp_extract(col("v"), "\\d+", 0).as("housenumber_type"))
    .agg(array_sort(collect_set(col("v"))).as("values"))
    .orderBy("housenumber_type")

  /** A5 — every raw phone value (list semantics). */
  def auditPhones(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "phone").select(col("v").as("phone")).orderBy("phone")

  /** A6 — distinct postcodes (set-view semantics, Step_1:135-136). */
  def auditPostcodes(raw: DataFrame): DataFrame = raw
    .filter(col("k") === "addr:postcode").select(col("v").as("postcode"))
    .distinct().orderBy("postcode")
}
