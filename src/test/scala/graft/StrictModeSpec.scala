package graft

import graft.osm.{OsmPipeline, OsmQueries}
import org.apache.spark.sql.functions._

/** Error-semantics parity (SURVEY.md §7.4): the reference CRASHES on
  * unseen-dirty data (F1 KeyError Step_2:246, F4 AttributeError :271-272);
  * lenient mode passes through / empties instead. Both modes pinned on a
  * dirty fixture, plus the remaining audit aggregations A2–A6.
  */
class StrictModeSpec extends SparkSuite {

  private val dirty = "/root/repo/src/test/resources/elgin_dirty.osm"

  test("lenient mode: unmappable street passes through, digitless postcode empties") {
    val t = OsmPipeline.process(spark, dirty)
    val m = t.nodeTags.collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m("street") == "Weird Xyz") // token in neither expected nor mapping
    assert(m("postcode") == "")        // no 5-digit run anywhere
    assert(m("state") == "Texas")      // already clean
    assert(m("phone") == "512-555-0100")
  }

  test("strict mode: unmappable street crashes like the reference KeyError") {
    val t = OsmPipeline.process(spark, dirty, strict = true)
    val ex = intercept[Exception] { t.nodeTags.collect() }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("KeyError") || msg.contains("AttributeError"), msg)
  }

  test("audits A2-A6 over both fixtures") {
    val nodes = OsmPipeline.readNodesRaw(spark,
      "/root/repo/src/test/resources/elgin_mini.osm")
    val ways = OsmPipeline.readWaysRaw(spark,
      "/root/repo/src/test/resources/elgin_mini.osm")
    val raw = OsmQueries.rawTags(nodes, ways)

    // A2 states: token groups
    val states = OsmQueries.auditStates(raw).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(states == Map("TX" -> Seq("TX")))

    // A3 cities: 'Elgin, TX' and 'Round Rock' group under first word
    val cities = OsmQueries.auditCities(raw).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(cities == Map("Elgin" -> Seq("Elgin, TX"), "Round" -> Seq("Round Rock")))

    // A4 housenumbers by first digit run
    val hn = OsmQueries.auditHousenumbers(raw).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(hn == Map("101" -> Seq("101")))

    // A5 phones: raw list
    val phones = OsmQueries.auditPhones(raw).collect().map(_.getString(0)).toSeq
    assert(phones == Seq("+1 (512) 281-5440"))

    // A6 postcodes: distinct raw values
    val zips = OsmQueries.auditPostcodes(raw).collect().map(_.getString(0)).toSeq
    assert(zips == Seq("78621-1242"))
  }

  test("V1 validation raises on a null required field") {
    import spark.implicits._
    val bad = Seq((1L, null.asInstanceOf[String], "v", "regular"))
      .toDF("id", "key", "value", "type")
    val t = OsmPipeline.OsmTables(bad, bad, bad, bad, bad) // nodeTags checked
    val ex = intercept[Exception] {
      OsmPipeline.validated(t).nodeTags.collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("validation failed"), msg)
  }
}
