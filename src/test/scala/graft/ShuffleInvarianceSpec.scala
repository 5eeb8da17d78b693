package graft

/** Partition-count invariance, as a RECURRING gate (round 2 verified it
  * once, ad hoc): every extension operator must return identical rows at
  * spark.sql.shuffle.partitions = 3 and = 8. This is the property that
  * makes a 1000-executor re-deploy a config change instead of a
  * correctness event — no result may depend on how the shuffle splits.
  */
class ShuffleInvarianceSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every x_* probe is shuffle-partition invariant (3 vs 8)") {
    val probes = SparkEntry.probes.filter(_.name.startsWith("x_"))
    assert(probes.nonEmpty)
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(n: Int): Map[String, Seq[Seq[Any]]] = {
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      probes.map { p =>
        val rows = p.run(spark, dir).collect().map(_.toSeq.map {
          case a: Array[_] => a.toSeq // byte[] etc. compare by value
          case v => v
        }.toSeq).toSeq
        spark.catalog.clearCache() // dedup probes persist subtrees
        p.name -> rows
      }.toMap
    }
    try {
      val at3 = runAll(3)
      val at8 = runAll(8)
      val diff = probes.map(_.name).filter(n => at3(n) != at8(n))
      assert(diff.isEmpty, s"partition-dependent results in: $diff")
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
  }
}
