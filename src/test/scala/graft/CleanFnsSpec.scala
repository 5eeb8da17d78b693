package graft

import graft.clean.CleanFns
import org.apache.spark.sql.functions._

/** Unit tests for the cleaning functions F1-F5 (SURVEY.md §2.4) and the
  * tag-key split R2/R3, pinning the reference's exact semantics including
  * the strict (crash-on-dirty) modes.
  */
class CleanFnsSpec extends SparkSuite {
  import spark.implicits._

  private def clean1(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column)(in: String): String =
    Seq(in).toDF("raw").select(fn(col("raw")).as("out")).collect()(0).getString(0)

  test("F1 street: mapping rewrites the last token") {
    assert(clean1(CleanFns.street(_))("Main St") == "Main Street")
    assert(clean1(CleanFns.street(_))("Main St.") == "Main Street")
    assert(clean1(CleanFns.street(_))("Quiet Cv") == "Quiet Cove")
    assert(clean1(CleanFns.street(_))("Deer Cc") == "Deer Cove")
    assert(clean1(CleanFns.street(_))("eagle pass") == "eagle Pass")
    assert(clean1(CleanFns.street(_))("Park Terrance") == "Park Terrace")
    assert(clean1(CleanFns.street(_))("lower street") == "lower Street")
  }

  test("F1 street: expected suffixes pass through") {
    assert(clean1(CleanFns.street(_))("Basket Flower Bend") == "Basket Flower Bend")
    assert(clean1(CleanFns.street(_))("Main Street") == "Main Street")
    assert(clean1(CleanFns.street(_))("FM 973") == "FM 973")
  }

  test("F1 street strict: unknown suffix raises (reference KeyError, Step_2:246)") {
    val ex = intercept[Exception] {
      Seq("Weird Xyz").toDF("raw")
        .select(CleanFns.street(col("raw"), strict = true)).collect()
    }
    assert(ex.getMessage.contains("KeyError") || ex.getCause != null)
  }

  test("F2 phone: strip, drop country code, blind slice") {
    assert(clean1(CleanFns.phone)("+1 (512) 281-5440") == "512-281-5440")
    assert(clean1(CleanFns.phone)("512.281.5440") == "512-281-5440")
    assert(clean1(CleanFns.phone)("15122815440") == "512-281-5440")
    // no length check, like the reference: short input → malformed output
    assert(clean1(CleanFns.phone)("12") == "2--")
    assert(clean1(CleanFns.phone)("5122815440123") == "512-281-5440123")
  }

  test("F3 city: first token, Round → Round Rock") {
    assert(clean1(CleanFns.city)("Elgin, TX") == "Elgin")
    assert(clean1(CleanFns.city)("Round Rock") == "Round Rock")
    assert(clean1(CleanFns.city)("Round") == "Round Rock")
    assert(clean1(CleanFns.city)("Cedar-Park, TX") == "Cedar-Park")
  }

  test("F4 postcode: first 5-digit run; strict raises when absent") {
    assert(clean1(CleanFns.postcode(_))("78621-1242") == "78621")
    assert(clean1(CleanFns.postcode(_))("TX 78621") == "78621")
    assert(clean1(CleanFns.postcode(_))("no digits") == "")
    intercept[Exception] {
      Seq("no digits").toDF("raw")
        .select(CleanFns.postcode(col("raw"), strict = true)).collect()
    }
  }

  test("F5 state: only exact TX rewrites") {
    assert(clean1(CleanFns.state)("TX") == "Texas")
    assert(clean1(CleanFns.state)("Texas") == "Texas")
    assert(clean1(CleanFns.state)("CA") == "CA")
    assert(clean1(CleanFns.state)("tx") == "tx")
  }

  test("R2/R3 tag-key split: reference re_after_colon quirks replicated") {
    val df = Seq("addr:street", "addr:street:name", "tiger:name_base_1",
      "fire_hydrant:type", "exit_to", "Highway:x", "a1:b", "a:b:c:d")
      .toDF("k")
      .select(col("k"), CleanFns.tagKey(col("k")).as("key"), CleanFns.tagType(col("k")).as("type"))
    val m = df.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m("addr:street") == ("street", "addr"))
    // 2-colon key: both segments kept
    assert(m("addr:street:name") == ("street:name", "addr"))
    // reference truncates at the first char outside [a-z_]: digit dropped
    // (verified against Step_2:204-208's exact regex)
    assert(m("tiger:name_base_1") == ("name_base_", "tiger"))
    // and caps the key at two colon-segments
    assert(m("a:b:c:d") == ("b:c", "a"))
    assert(m("fire_hydrant:type") == ("type", "fire_hydrant"))
    // no colon → regular passthrough
    assert(m("exit_to") == ("exit_to", "regular"))
    // uppercase / digits before the colon fail the [a-z_] gate → regular
    assert(m("Highway:x") == ("Highway:x", "regular"))
    assert(m("a1:b") == ("a1:b", "regular"))
  }

  test("P3 problem chars: dotted/spaced/quoted keys are flagged") {
    val bad = Seq("bad=key", "has space", "dot.key", "a,b", "q?x")
    val good = Seq("addr:street", "name", "name_1", "a-b")
    val df = (bad ++ good).toDF("k")
      .select(col("k"), CleanFns.hasProblemChars(col("k")).as("p"))
    val m = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    bad.foreach(k => assert(m(k), s"$k should be flagged"))
    good.foreach(k => assert(!m(k), s"$k should pass"))
  }
}
