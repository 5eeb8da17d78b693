package graft.ext

/** Symbolic (n+1)×(n+1) ridge normal-equation solver, emitted as SQL
  * select-stages — the generalization of [[QualityModel.coefStages]]'s
  * hand-written 3×3 to any small feature count (intercept + n features,
  * n ≤ 4 keeps the cofactor expansion sane).
  *
  * Cross-engine determinism is BY CONSTRUCTION: both Spark and DuckDB
  * evaluate the ONE generated text, so given exact integer sums every
  * IEEE op runs in the same order on both engines. The cofactor
  * determinants expand recursively along the first row with a fixed
  * sign/term order; the system matrix is symmetric (so is its cofactor
  * matrix — only the upper triangle is emitted).
  *
  * Input columns expected by stage 1 (all integer): `n`, `s{i}` (Σxᵢ),
  * `s{i}{j}` for i ≤ j (Σxᵢxⱼ), `sy` (Σy), `s{i}y` (Σxᵢy), features
  * 1-indexed. Output of the last stage: `b0` (intercept), `b1..bn`.
  * λ = 1 on the FULL diagonal (intercept included) — symmetric,
  * invertible on any input including n = 0.
  */
object RidgeSolver {

  /** First-row Laplace expansion with fixed term order: the textual
    * determinant of a symbolic matrix.
    */
  private def det(m: Vector[Vector[String]]): String =
    if (m.size == 1) m(0)(0)
    else (0 until m.size).map { j =>
      val minor = m.tail.map(r => r.patch(j, Nil, 1))
      val term = s"${m(0)(j)} * (${det(minor)})"
      if (j == 0) term else if (j % 2 == 1) s"- $term" else s"+ $term"
    }.mkString(" ")

  /** Entry name of the ridge-shifted system matrix (0-indexed,
    * symmetric: p{min}{max}).
    */
  private def p(i: Int, j: Int): String = s"p${i min j}${i max j}"

  /** The staged solve for `nFeat` features. */
  def stages(nFeat: Int): Seq[Seq[String]] = {
    require(nFeat >= 1 && nFeat <= 4, s"nFeat must be in [1, 4]; got $nFeat")
    val sz = nFeat + 1
    val mat = Vector.tabulate(sz, sz)((i, j) => p(i, j))

    val stage1 = {
      val diag0 = "CAST(n + 1 AS DOUBLE) AS p00"
      val row0 = (1 to nFeat).map(j => s"CAST(s$j AS DOUBLE) AS p0$j")
      val upper = for (i <- 1 to nFeat; j <- i to nFeat) yield
        if (i == j) s"CAST(s$i$j + 1 AS DOUBLE) AS p$i$j"
        else s"CAST(s$i$j AS DOUBLE) AS p$i$j"
      val rhs = "CAST(sy AS DOUBLE) AS q0" +:
        (1 to nFeat).map(i => s"CAST(s${i}y AS DOUBLE) AS q$i")
      (diag0 +: row0) ++ upper ++ rhs
    }

    def minor(i: Int, j: Int): Vector[Vector[String]] =
      mat.patch(i, Nil, 1).map(_.patch(j, Nil, 1))

    val cofNames = for (i <- 0 until sz; j <- i until sz) yield (i, j)
    val stage2 = cofNames.map { case (i, j) =>
      val d = s"(${det(minor(i, j))})"
      val signed = if ((i + j) % 2 == 0) d else s"-$d"
      s"$signed AS c$i$j"
    } ++ (0 until sz).map(i => s"q$i") ++
      (0 until sz).map(j => s"p0$j")

    val stage3 = Seq(
      (0 until sz).map(j => s"p0$j * c0$j").mkString(" + ") + " AS det") ++
      cofNames.map { case (i, j) => s"c$i$j" } ++
      (0 until sz).map(i => s"q$i")

    val stage4 = (0 until sz).map { i =>
      val num = (0 until sz)
        .map(j => s"c${i min j}${i max j} * q$j").mkString(" + ")
      s"($num) / det AS b$i"
    }

    Seq(stage1, stage2, stage3, stage4)
  }
}
