package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** The custom AsOfJoin operator (logical plan → strategy → sort-merge
  * physical exec): semantics vs the composed union+window formulation and
  * hand-built cases, plan shape, and edge behavior.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hand-built cases: backward match, exact-time tie, no-match nulls") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // key with no right rows at all
      (3L, ts("2024-01-01 08:00:00"), "p4")  // right rows exist but all later
    ).toDF("k", "t", "l_tag")
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal ts: inclusive (<=)
      (1L, ts("2024-01-01 10:00:00"), 102L), // tie on ts: max tiebreak wins
      (1L, ts("2024-01-01 11:30:00"), 103L),
      (3L, ts("2024-01-01 09:30:00"), 300L)
    ).toDF("rk", "rt", "rv")
    val out = AsOf.joinBackward(l, r, "k", "rk", "t", "rt", Seq("rv"))
      .select("l_tag", "rv").collect().map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out == Map("p1" -> 102L, "p2" -> 103L, "p3" -> -1L, "p4" -> -1L))
  }

  test("agrees with the union+window composed form on real data") {
    val native = Registry.all.find(_.name == "x_asof2_native").get.run(spark, dir)
      .collect().map(_.toSeq).toSeq
    val composed = Registry.all.find(_.name == "x_asof_join").get.run(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: AsOfJoinExec with one exchange per side, no window, no union") {
    val ev = Tables(spark, dir, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user_id"), col("event_id").as("click_id"),
        col("ts").as("r_ts"))
    val df = AsOf.joinBackward(l, r, "user_id", "r_user_id", "ts", "r_ts", Seq("click_id"))
    df.write.format("noop").mode("overwrite").save() // execute (resolves AQE)
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix: the operator prints as "AsOfJoin"
    assert(plan.contains("AsOfJoin "), plan)
    assert(!plan.contains("Window"), "composed-form operators leaked into the native plan")
    assert(!plan.contains("Union"), "composed-form operators leaked into the native plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected one shuffle per side, got $exchanges\n$plan")
  }

  test("NULL keys never match (SQL equality semantics, matches ASOF oracle)") {
    val l = Seq(
      (Option(1L), ts("2024-01-01 10:00:00"), "k1"),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), "knull")
    ).toDF("k", "t", "l_tag")
    val r = Seq(
      (Option(1L), ts("2024-01-01 09:00:00"), 100L),
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 999L)
    ).toDF("rk", "rt", "rv")
    val out = AsOf.joinBackward(l, r, "k", "rk", "t", "rt", Seq("rv"))
      .select("l_tag", "rv").collect()
      .map(x => (x.getString(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // k=1 matches its right row; the null-key left row matches NOTHING
    // (null == null is NOT a join match), exactly like l.k = r.rk in SQL
    assert(out == Map("k1" -> 100L, "knull" -> -1L))
  }

  test("empty right side: all left rows survive with nulls") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "p1")).toDF("k", "t", "l_tag")
    val r = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("rk", "rt", "rv")
    val out = AsOf.joinBackward(l, r, "k", "rk", "t", "rt").collect()
    assert(out.length == 1 && out(0).isNullAt(4))
  }

  test("null time column fails fast instead of silently no-matching") {
    val l = Seq(
      (1L, Option(ts("2024-01-01 10:00:00")), "p1"),
      (1L, Option.empty[java.sql.Timestamp], "pnull")
    ).toDF("k", "t", "l_tag")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 100L)).toDF("rk", "rt", "rv")
    val e = intercept[org.apache.spark.SparkException] {
      AsOf.joinBackward(l, r, "k", "rk", "t", "rt").collect()
    }
    assert(e.getMessage.contains("non-null times")
      || Option(e.getCause).exists(_.getMessage.contains("non-null times")))
  }

  test("disjoint-name guard rejects ambiguous inputs") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("k", "rt")
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r, "k", "k", "t", "rt")
    }
  }
}
