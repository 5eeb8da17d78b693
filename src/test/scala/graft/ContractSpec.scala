package graft

/** The driver contract itself: entry() smoke, name uniqueness, and
  * queries/oracleSql alignment.
  */
class ContractSpec extends SparkSuite {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("probe names are unique and oracle keys align with query keys") {
    val names = SparkEntry.probes.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate probe names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
    // every oracle-checked query ends in a total ORDER BY (rule §2.9)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY") || sql.toUpperCase.startsWith("SELECT CAST(EPOCH_US(MIN"),
        s"$name oracle lacks ORDER BY")
    }
  }
}
