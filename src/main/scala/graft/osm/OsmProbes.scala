package graft.osm

import graft.Probe
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry entries for the OSM-shaped pipeline, run on the repo fixture
  * (FIXTURES.md §1). These are rows-only checks for the driver (no DuckDB
  * oracle: the input is XML, not the sf parquet tables); the exact golden
  * values are pinned by ScalaTest (OsmSpec).
  */
object OsmProbes {

  val fixturePath: String = {
    val abs = "/root/repo/src/test/resources/elgin_mini.osm"
    if (new java.io.File(abs).exists) abs
    else "src/test/resources/elgin_mini.osm" // relative fallback (cwd = repo root)
  }

  private def withTables(f: (SparkSession, OsmPipeline.OsmTables) => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    val t = OsmPipeline.process(s, fixturePath)
    f(s, t)
  }

  private val all0 = Seq[(String, (SparkSession, OsmPipeline.OsmTables) => DataFrame)](
    "osm_s1_node_tags" -> ((_, t) => t.nodeTags.orderBy("id", "key")),
    "osm_s1_way_nodes" -> ((_, t) => t.wayNodes.orderBy("id", "position")),
    "osm_q1_type_counts" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q1(s) }),
    "osm_q1b_literal_quirk" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q1Literal(s) }),
    "osm_q4b_literal_quirk" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q4Literal(s) }),
    "osm_q2_node_tag_types" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q2(s) }),
    "osm_q3_fire_hydrants" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q3(s) }),
    "osm_q4_top_contributors" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q4(s) }),
    "osm_q5_oldest_edit" -> ((s, t) => { OsmPipeline.registerViews(t); OsmQueries.q5Oldest(s) }),
    "osm_a1_audit_streets" -> ((s, t) => {
      val raw = OsmQueries.rawTags(
        OsmPipeline.readNodesRaw(s, fixturePath), OsmPipeline.readWaysRaw(s, fixturePath))
      // surface the audit set as a sorted joined string: the driver's
      // rows-only gate sorts/hashes cells, which crashes on array cells
      // (numpy arrays are unhashable). The array form stays golden-tested
      // in OsmSpec.
      OsmQueries.auditStreets(raw)
        .withColumn("values", org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.col("values"), "|"))
    }))

  val all: Seq[Probe] = all0.map { case (name, f) =>
    Probe.unchecked(name)((s, dir) => withTables(f)(s, dir))
  }
}
