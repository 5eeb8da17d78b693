package graft

import graft.functions.MinSeg
import org.apache.spark.sql.functions._

/** min_seg_count edges the x_tok3 hash can't see: the DP against an
  * independent recursive reference, codegen ≡ interpreted, the UNK
  * fallback, over-length piece inertness, and unicode positions.
  */
class MinSegSpec extends SparkSuite {
  import spark.implicits._

  GraftExtensions.register(spark)

  /** Independent reference: plain recursive min-cost with memo. */
  private def ref(word: String, pieces: Set[String]): Long = {
    val memo = scala.collection.mutable.Map[Int, Long]()
    def go(i: Int): Long = {
      if (i == word.length) 0L
      else memo.getOrElseUpdate(i, {
        var best = go(i + 1) + 1 // single char
        var L = 2
        while (L <= math.min(MinSeg.MaxLen, word.length - i)) {
          if (pieces(word.substring(i, i + L))) best = math.min(best, go(i + L) + 1)
          L += 1
        }
        best
      })
    }
    go(0)
  }

  private def run(word: String, pieces: Seq[String]): Long =
    Seq(word).toDF("w")
      .select(expr(s"min_seg_count(w, array(${pieces.sorted.map(p => s"'$p'").mkString(",")}))"))
      .collect()(0).getLong(0)

  test("hand cases: greedy-trap, UNK fallback, exact cover") {
    val pieces = Seq("ab", "abc", "cd", "bcd")
    // "abcd": greedy longest-first takes abc + d = 2; optimal is also
    // ab+cd = 2; "aabcd" → a + ab? a,ab,cd = 3 vs a,abcd? not a piece →
    // a + bcd? a,a,bcd = 3 — DP must find 3
    assert(run("abcd", pieces) == 2L)
    assert(run("aabcd", pieces) == 3L)
    // pure UNK: no piece applies
    assert(run("zzz", pieces) == 3L)
    // empty word
    assert(run("", pieces) == 0L)
    // full word is one piece
    assert(run("abc", pieces) == 1L)
  }

  test("greedy is strictly suboptimal where DP is not") {
    // "abcde" with pieces {abcd, ab, cde}: greedy longest-prefix takes
    // abcd + e = 2... construct a real trap: pieces {abc, de, abcd}:
    // greedy abcd + e = 2, optimal abc + de = 2 — tie. Trap needs
    // greedy 3 > dp 2: pieces {ab, cde}: greedy ab + cde = 2. Use
    // {abcd, cde}: greedy abcd+e=2, dp ab? no... "abcde" pieces
    // {abcd, bcde}: greedy abcd + e = 2, dp a + bcde = 2. The classic:
    // "aaab" pieces {aa, aab}: greedy aa + ab→a,b = 3; dp a + aab = 2.
    assert(run("aaab", Seq("aa", "aab")) == 2L)
  }

  test("DP == independent reference on exhaustive small alphabet") {
    val pieces = Set("ab", "ba", "aab", "bba", "abab")
    val words = for {
      n <- 1 to 7
      k <- 0 until (1 << n)
    } yield (0 until n).map(b => if (((k >> b) & 1) == 0) 'a' else 'b').mkString
    val sortedArr = pieces.toSeq.sorted
    val got = words.toDF("w")
      .select(col("w"),
        expr(s"min_seg_count(w, array(${sortedArr.map(p => s"'$p'").mkString(",")}))").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == ref(w, pieces), s"word=$w got=${got(w)} want=${ref(w, pieces)}")
    }
  }

  test("codegen ≡ interpreted") {
    val words = Seq("abcd", "aaab", "zzz", "", "abcabcabc").toDF("w")
    def vals() = words
      .select(expr("min_seg_count(w, array('ab','abc','bc','ca'))"))
      .collect().map(_.getLong(0)).toSeq
    val cg = vals()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(vals() == cg)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  /** Weighted reference for min_seg_cost: recursive min-cost with memo. */
  private def refCost(word: String, costed: Map[String, Long], unk: Long): Long = {
    val memo = scala.collection.mutable.Map[Int, Long]()
    def go(i: Int): Long = {
      if (i == word.length) 0L
      else memo.getOrElseUpdate(i, {
        var best = go(i + 1) + unk
        var L = 2
        while (L <= math.min(MinSeg.MaxLen, word.length - i)) {
          costed.get(word.substring(i, i + L))
            .foreach(c => best = math.min(best, go(i + L) + c))
          L += 1
        }
        best
      })
    }
    go(0)
  }

  private def runCost(word: String, costed: Seq[(String, Long)], unk: Long): Long = {
    val sorted = costed.sortBy(_._1)
    val ps = sorted.map(p => s"'${p._1}'").mkString(",")
    val cs = sorted.map(p => s"CAST(${p._2} AS BIGINT)").mkString(",")
    Seq(word).toDF("w")
      .select(expr(s"min_seg_cost(w, array($ps), array($cs), CAST($unk AS BIGINT))"))
      .collect()(0).getLong(0)
  }

  test("min_seg_cost: frequency weights overturn the fewest-pieces optimum") {
    // the x_tok4 greedy trap: "abcd" covered by ONE rare piece (cost 9)
    // or TWO frequent pieces (cost 3+3=6) — unit-cost DP says 1 piece,
    // the weighted DP must pay the bits and SPLIT
    val costed = Seq("abcd" -> 9L, "ab" -> 3L, "cd" -> 3L)
    assert(runCost("abcd", costed, unk = 12L) == 6L)
    assert(run("abcd", costed.map(_._1)) == 1L) // unit-cost counterpart keeps 1
    // UNK pricing: no piece applies → n·unk
    assert(runCost("zzz", costed, unk = 12L) == 36L)
    // mixed: "xabcd" → unk + (ab,cd) = 12+6 = 18, beats unk + abcd = 21
    assert(runCost("xabcd", costed, unk = 12L) == 18L)
    // empty word costs nothing
    assert(runCost("", costed, unk = 12L) == 0L)
  }

  test("min_seg_cost == independent weighted reference on exhaustive small alphabet") {
    val costed = Map("ab" -> 2L, "ba" -> 3L, "aab" -> 4L, "bba" -> 2L, "abab" -> 3L)
    val unk = 5L
    val words = for {
      n <- 1 to 7
      k <- 0 until (1 << n)
    } yield (0 until n).map(b => if (((k >> b) & 1) == 0) 'a' else 'b').mkString
    words.foreach { w =>
      val got = runCost(w, costed.toSeq, unk)
      val want = refCost(w, costed, unk)
      assert(got == want, s"word=$w got=$got want=$want")
    }
  }

  test("min_seg_cost codegen ≡ interpreted") {
    val costed = Seq("ab" -> 2L, "abc" -> 3L, "bc" -> 2L, "ca" -> 4L)
    val words = Seq("abcd", "aaab", "zzz", "", "abcabcabc")
    def vals() = words.map(runCost(_, costed, 7L))
    val cg = vals()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(vals() == cg)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("pieces longer than MaxLen are inert; unicode positions are code points") {
    // a 9-char piece can never be used (the induction caps at 8, the DP
    // must stay consistent if a caller hands a longer one anyway)
    assert(run("abcdefghi", Seq("abcdefghi")) == 9L)
    // 2-char piece of non-ASCII code points: one DP step, not a byte walk
    assert(run("éé", Seq("éé")) == 1L)
    assert(run("ééé", Seq("éé")) == 2L)
  }

  // ---------------------------------------------------- min_seg_pieces

  private def pieces(word: String, vocab: Seq[(String, Long)], unk: Long): Seq[String] = {
    val ps = vocab.sortBy(_._1)
    val arr = "array(" + ps.map(p => s"'${p._1}'").mkString(",") + ")"
    val cs = "array(" + ps.map(p => s"CAST(${p._2} AS BIGINT)").mkString(",") + ")"
    Seq(word).toDF("w")
      .select(expr(s"min_seg_pieces(w, $arr, $cs, CAST($unk AS BIGINT))"))
      .collect()(0).getSeq[String](0)
  }

  test("min_seg_pieces: path covers the word, sums to min_seg_cost, UNK as chars") {
    val vocab = Seq(("ab", 2L), ("abc", 4L), ("cd", 2L))
    assert(pieces("abcd", vocab, 9L) == Seq("ab", "cd"))
    // UNK fallback: unmatched chars come back one by one
    assert(pieces("abxy", vocab, 9L) == Seq("ab", "x", "y"))
    assert(pieces("", vocab, 9L) == Seq())
    // cost-sum == min_seg_cost on a batch of words
    val words = Seq("abcd", "abxy", "abcabc", "xabcdx", "cdcdab")
    val costOf = vocab.toMap
    words.foreach { w =>
      val ps = pieces(w, vocab, 9L)
      assert(ps.mkString("") == w, s"$w -> $ps does not cover")
      val total = ps.map(p => costOf.getOrElse(p, 9L)).sum
      val arr = "array(" + vocab.map(_._1).sorted.map(p => s"'$p'").mkString(",") + ")"
      val cs = "array(" + vocab.sortBy(_._1).map(p => s"CAST(${p._2} AS BIGINT)").mkString(",") + ")"
      val want = Seq(w).toDF("w")
        .select(expr(s"min_seg_cost(w, $arr, $cs, CAST(9 AS BIGINT))"))
        .collect()(0).getLong(0)
      assert(total == want, s"$w: path cost $total != DP $want")
    }
  }

  test("min_seg_pieces tie-break: equal totals take the LONGEST step") {
    // "abc": ab(3)+c(unk 3) = 6 and abc(6) = 6 tie -> abc (len desc)
    val vocab = Seq(("ab", 3L), ("abc", 6L))
    assert(pieces("abc", vocab, 3L) == Seq("abc"))
  }

  test("min_seg_pieces codegen == interpreted") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Seq(("ab", 2L), ("abc", 4L), ("cd", 2L)).sortBy(_._1)
    val ps = new GenericArrayData(vocab.map(p => UTF8String.fromString(p._1)).toArray[Any])
    val cs = new GenericArrayData(vocab.map(_._2).toArray[Any])
    for (w <- Seq("abcd", "abxy", "abcabc", "zzz", "a")) {
      val interp = graft.functions.MinSegPieces
        .compute(UTF8String.fromString(w), ps, cs, 9L)
      val viaCol = pieces(w, vocab, 9L)
      assert((0 until interp.numElements()).map(interp.getUTF8String(_).toString) == viaCol,
        s"$w: interpreted != codegen column path")
    }
  }

  test("EM round flips a planted word's segmentation (iteration 0 vs 1)") {
    import graft.ext.UnigramTok
    // vocab prices at iteration 0 (tot=28, bits=5): abc=2, de=2, ab=3,
    // cde=3, unk=9 -> "abcde" segments abc|de (4 < ab|cde 6).
    // corpus: "cdex" x20 uses cde, "aby" x20 uses ab, "abcde" x1 uses
    // abc|de -> EM counts ab=20, cde=20, abc=1, de=1 (tot=42, bits=6)
    // -> new prices ab=2, cde=2, abc=6, de=6 -> "abcde" FLIPS to ab|cde.
    val vocab = Seq(("abc", 8L), ("de", 8L), ("ab", 6L), ("cde", 6L)).toDF("piece", "n")
    val docs = (Seq((0L, "abcde")) ++ (1L to 20L).map(i => (i, "cdex aby")))
      .toDF("doc_id", "text")
    val v1 = UnigramTok.emVocab(docs, vocab).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(v1 == Map("ab" -> 20L, "cde" -> 20L, "abc" -> 1L, "de" -> 1L), v1.toString)
    // the flip is pinned on the PIECES (both iterations' min costs can
    // coincide): re-price each vocab and read the argmin paths
    val s = spark
    def pathsUnder(v: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] = {
      import org.apache.spark.sql.functions.{broadcast => b}
      GraftExtensions.register(s)
      val tot = v.agg(coalesce(sum(col("n")), lit(1L)).as("__tot"))
      val priced = v.crossJoin(b(tot))
        .select(col("piece"),
          (lit(1L) + length(conv(col("__tot").cast("string"), 10, 2)).cast("long")
            - length(conv(col("n").cast("string"), 10, 2)).cast("long")).as("cost"),
          (lit(4L) + length(conv(col("__tot").cast("string"), 10, 2)).cast("long")).as("__unk"))
      val vrow = priced.agg(
          sort_array(collect_list(struct(col("piece"), col("cost")))).as("__pc"),
          coalesce(max(col("__unk")), lit(5L)).as("__unk"))
        .select(expr("transform(__pc, x -> x.piece)").as("__pieces"),
          expr("transform(__pc, x -> x.cost)").as("__costs"), col("__unk"))
      Seq("abcde").toDF("word").crossJoin(b(vrow))
        .select(col("word"),
          expr("min_seg_pieces(word, __pieces, __costs, __unk)").as("ps"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    }
    assert(pathsUnder(vocab)("abcde") == Seq("abc", "de"))
    assert(pathsUnder(UnigramTok.emVocab(docs, vocab))("abcde") == Seq("ab", "cde"))
  }
}
