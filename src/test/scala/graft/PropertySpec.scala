package graft

import graft.clean.CleanFns
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5): invariants of the cleaning
  * functions and query-shape equivalences, driven through the real Column
  * expressions on a local session. Generators are ScalaCheck Gens sampled
  * from a fixed seed (deterministic, no scalatestplus bridge needed).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def runPhone(inputs: Seq[String]): Seq[String] =
    inputs.toDF("raw").select(CleanFns.phone(col("raw"))).collect().map(_.getString(0)).toSeq

  private val phoneGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.numChar, Gen.oneOf('(', ')', '-', '.', ' ', '+')))
      .map(_.mkString.take(20))

  test("F2 phone: output digits = input digits minus leading country-code 1") {
    val raws = samples(phoneGen, 200)
    val outs = runPhone(raws)
    raws.zip(outs).foreach { case (raw, out) =>
      val digits = raw.filter(_.isDigit)
      val expected = if (digits.startsWith("1")) digits.drop(1) else digits
      assert(out.filter(_.isDigit) == expected, s"raw=$raw out=$out")
      assert(out.count(_ == '-') >= 2, s"blind slice always inserts dashes: $raw -> $out")
    }
  }

  test("F2 phone: idempotent on already-clean 10-digit numbers") {
    val tenDigit = Gen.listOfN(10, Gen.numChar).map(_.mkString)
      .retryUntil(d => !d.startsWith("1"))
    val ds = samples(tenDigit, 100)
    val once = runPhone(ds)
    assert(runPhone(once) == once)
  }

  test("F4 postcode: result is empty or a 5-digit substring of the input") {
    val gen = Gen.listOfN(15, Gen.oneOf(Gen.numChar, Gen.alphaChar, Gen.const(' ')))
      .map(_.mkString)
    val raws = samples(gen, 200)
    val outs = raws.toDF("raw").select(CleanFns.postcode(col("raw")))
      .collect().map(_.getString(0)).toSeq
    raws.zip(outs).foreach { case (raw, out) =>
      assert(out.isEmpty || (out.length == 5 && out.forall(_.isDigit) && raw.contains(out)))
    }
  }

  test("R2 split: type + ':' + key reconstructs gated keys") {
    val ident = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('_'))).map(_.mkString)
    val gated = for { a <- ident; b <- ident; c <- Gen.option(ident) }
      yield a + ":" + b + c.map(":" + _).getOrElse("")
    val keys = samples(gated, 200)
    val rows = keys.toDF("k")
      .select(col("k"), CleanFns.tagKey(col("k")).as("key"), CleanFns.tagType(col("k")).as("type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows.foreach { case (k, key, typ) =>
      assert(typ + ":" + key == k, s"reconstruction failed for $k")
    }
  }

  test("R3: non-gated keys pass through with type=regular") {
    val nonGated = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString), // no colon
      Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString + ":x"), // bad prefix
      Gen.nonEmptyListOf(Gen.numChar).map(_.mkString + ":x"))
    val keys = samples(nonGated, 150)
    val rows = keys.toDF("k")
      .select(col("k"), CleanFns.tagKey(col("k")).as("key"), CleanFns.tagType(col("k")).as("type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows.foreach { case (k, key, typ) =>
      assert(key == k && typ == "regular", s"$k should be regular")
    }
  }

  test("F1 street: cleaning is idempotent (mapped suffixes land in expected)") {
    val suffix = Gen.oneOf(CleanFns.streetMapping.keys.toSeq ++ CleanFns.expectedStreetTypes)
    val streetGen = for {
      base <- Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))
      sfx <- suffix
    } yield s"$base $sfx"
    val raws = samples(streetGen, 150)
    def clean(xs: Seq[String]) =
      xs.toDF("raw").select(CleanFns.street(col("raw"))).collect().map(_.getString(0)).toSeq
    val once = clean(raws)
    assert(clean(once) == once)
  }

  test("F1 street strict: raises exactly when suffix is in neither table") {
    val unknown = Gen.nonEmptyListOf(Gen.alphaUpperChar).map("Zz" + _.mkString.take(6))
    val raws = samples(unknown, 30)
      .filterNot(t => CleanFns.expectedStreetTypes.contains(t) || CleanFns.streetMapping.contains(t))
      .map(t => s"Some $t")
    assert(raws.nonEmpty)
    intercept[Exception] {
      raws.toDF("raw").select(CleanFns.street(col("raw"), strict = true)).collect()
    }
    // and the same inputs pass through untouched in lenient mode
    val lenient = raws.toDF("raw").select(CleanFns.street(col("raw")))
      .collect().map(_.getString(0)).toSeq
    assert(lenient == raws)
  }

  test("orderBy.limit(1) == min (Q5 equivalence)") {
    val xsGen = Gen.nonEmptyListOf(Gen.choose(-1000000L, 1000000L))
    samples(xsGen, 20).foreach { xs =>
      val df = xs.toDF("x")
      val viaSort = df.orderBy(col("x")).limit(1).collect()(0).getLong(0)
      val viaMin = df.agg(min(col("x"))).collect()(0).getLong(0)
      assert(viaSort == viaMin)
    }
  }

  test("AsOfJoin == in-memory reference model on random data (incl. ties/dups)") {
    // keys from a tiny range and times from a tiny range force heavy
    // collisions: same-key same-time duplicates, exact left==right time
    // ties, keys missing from either side
    val rowGen = for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 19L)
      v <- Gen.choose(0L, 999L)
    } yield (k, t, v)
    val dataGen = for {
      l <- Gen.listOfN(60, rowGen)
      r <- Gen.listOfN(60, rowGen)
    } yield (l, r)

    samples(dataGen, 12).zipWithIndex.foreach { case ((lRows, rRows), trial) =>
      val l = lRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
        .toDF("k", "t", "l_id")
      // r value column doubles as the tiebreak
      val r = rRows.map { case (k, t, v) => (k, t, v) }.toDF("rk", "rt", "rv")
      val got = graft.plans.AsOf
        .joinBackward(l, r, "k", "rk", "t", "rt", Seq("rv"))
        .select("l_id", "rv").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toMap

      // reference model: latest right at-or-before; ties on time -> max rv
      val byKey = rRows.groupBy(_._1)
      lRows.zipWithIndex.foreach { case ((k, t, _), i) =>
        val want = byKey.getOrElse(k, Nil).filter(_._2 <= t) match {
          case Nil => None
          case cands =>
            val tMax = cands.map(_._2).max
            Some(cands.filter(_._2 == tMax).map(_._3).max)
        }
        assert(got(i.toLong) == want,
          s"trial=$trial left=$i k=$k t=$t: got ${got(i.toLong)}, want $want")
      }
    }
  }

  test("sorted_count_in == reference count over random arrays and sets") {
    GraftExtensions.register(spark)
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))
    val rows: Seq[(Seq[String], Seq[String])] = samples(
      for {
        arr <- Gen.listOf(token)
        set <- Gen.listOf(token)
      } yield (arr, set.distinct.sorted), 60)
    val withEdges = rows ++ Seq(
      (Seq.empty[String], Seq("a")),
      (Seq("a", "a", "a"), Seq.empty[String]),
      (Seq("a", "a", "a"), Seq("a")))
    val got = withEdges.toDF("arr", "st")
      .select(expr("sorted_count_in(arr, st)"))
      .collect().map(_.getLong(0)).toSeq
    val want = withEdges.map { case (arr, set) =>
      arr.count(set.toSet.contains).toLong
    }
    assert(got == want)
  }

  test("connectedComponents == in-memory union-find on random graphs") {
    // random graphs drawn to stress the two-level algorithm's regimes:
    // long chains (deep contracted diameter), dense cliques (collapse at
    // the seed), isolated pairs, and mixtures
    val edgeGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(2, 60)            // vertex universe
      m <- Gen.choose(1, 120)           // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    // plus deterministic adversarial shapes: a pure 40-chain and a
    // 20-clique + 20-chain mixture (ids descending so min-labels travel
    // the full length)
    val chain = (0L until 40L).sliding(2).map(s => (s(1), s(0))).toSeq
    val cliqueChain =
      (for (i <- 40L until 60L; j <- (i + 1) until 60L) yield (i, j)) ++ chain
    val cases = samples(edgeGen, 12).filter(_.nonEmpty) ++ Seq(chain, cliqueChain)
    cases.foreach { edges =>
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.map { v =>
        val root = find(v)
        // canonical label = min vertex of the component
        (v, verts.filter(u => find(u) == root).min)
      }.groupBy(_._2).flatMap { case (comp, members) =>
        members.map { case (v, _) => (v, comp, members.size.toLong) }
      }.toSet
      // both sides of the size gate: bounded local union-find endgame
      // (default) and the fully distributed halving loop (gate = 0)
      val got = graft.ext.Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"edges=$edges")
      val gotDist = graft.ext.Dedup
        .connectedComponents(edges.toDF("a", "b"), localFinishMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotDist == want, s"distributed gate side, edges=$edges")
    }
  }
}
