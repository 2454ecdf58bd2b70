package graft.queries

/** Machine-generated DuckDB replay of
  * [[graft.operators.IterativeImputer.imputationIterativeDeterministic]].
  *
  * Parity strategy (see the engine method's banner): the md5-lowest
  * complete-row sample is quantized to per-column integer grids, the
  * Gram/linear sums are accumulated as exact integers (SUM cast back to
  * BIGINT — a single int64→double conversion on both engines), and the
  * ridge normal equations are eliminated by an UNROLLED Gauss sequence
  * whose operation order matches `solveGaussSeq` literally — so every
  * double on the SQL side is bit-identical to the engine's, and the
  * round-robin apply sweeps replay as chained CTE column updates.
  *
  * `maskedExprs(i)` is the SQL expression producing column i (with the
  * query's planted NULLs); `scales(i)` the integer quantization scale.
  * Output: key columns + round(filled_i, 4) AS <outNames(i)>.
  */
object IterImputeSql {

  def sql(
      table: String,
      keyCols: Seq[String],
      maskedExprs: Seq[String],
      scales: Seq[Long],
      outNames: Seq[String],
      sampleSize: Int = 1000,
      ridgeLambda: Double = 1e-2,
      rounds: Int = 3): String = {
    val p = maskedExprs.size
    require(scales.size == p && outNames.size == p)
    val d = p // per-target dims: p-1 predictors + intercept
    val keys = keyCols.mkString(", ")
    val keyHash = keyCols.map(c => s"$c::VARCHAR").mkString(" || '|' || ")
    val keyOrder = keyCols.mkString(", ")

    val maskedCols = maskedExprs.zipWithIndex
      .map { case (e, i) => s"$e AS c$i" }.mkString(",\n          ")
    val notNull = (0 until p).map(i => s"c$i IS NOT NULL").mkString(" AND ")
    val anyNull = (0 until p).map(i => s"c$i IS NULL").mkString(" OR ")
    val zCols = (0 until p)
      .map(i => s"CAST(round(c$i * ${scales(i)}) AS BIGINT) AS z$i").mkString(", ")

    // exact integer sums; SUM(BIGINT) is HUGEINT in DuckDB → cast back to
    // BIGINT so the int64→double conversion matches Long.toDouble
    val sumCols = ((0 until p).map(i => s"CAST(SUM(z$i) AS BIGINT) AS s$i") ++
      (for (a <- 0 until p; b <- a until p)
        yield s"CAST(SUM(z$a * z$b) AS BIGINT) AS s${a}_$b")).mkString(",\n          ")
    def sAB(a: Int, b: Int) = if (a <= b) s"s${a}_$b" else s"s${b}_$a"
    val gCols = ((0 until p).map(i =>
      s"(s$i::DOUBLE) / ${scales(i)}.0 AS t$i") ++
      (0 until p).map(i =>
        s"((s$i::DOUBLE) / n) / ${scales(i)}.0 AS mean$i") ++
      (for (a <- 0 until p; b <- a until p)
        yield s"(${sAB(a, b)}::DOUBLE) / ${(scales(a) * scales(b)).toDouble} AS g${a}_$b")
      ).mkString(",\n          ")
    def gAB(a: Int, b: Int) = if (a <= b) s"g${a}_$b" else s"g${b}_$a"

    // per-target augmented matrix rows (uniform m_r_c columns, RHS c = d)
    val gjRows = (0 until p).map { j =>
      val preds = (0 until p).filterNot(_ == j)
      val cells = (for (r <- 0 until d; c <- 0 to d) yield {
        val e =
          if (r < d - 1 && c < d - 1) {
            val base = gAB(preds(r), preds(c))
            if (r == c) s"($base + $ridgeLambda)" else base
          } else if (r < d - 1 && c == d - 1) s"t${preds(r)}"
          else if (r == d - 1 && c < d - 1) s"t${preds(c)}"
          else if (r == d - 1 && c == d - 1) "CAST(n AS DOUBLE)"
          else if (r < d - 1) gAB(preds(r), j) // RHS, predictor row
          else s"t$j"                           // RHS, intercept row
        s"$e AS m_${r}_$c"
      }).mkString(", ")
      s"SELECT $j AS j, $cells FROM g"
    }.mkString("\n      UNION ALL\n      ")

    // forward elimination: one CTE per (k, r), f from the pre-step row
    val elimSteps = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = "gj"
    for (k <- 0 until d; r <- k + 1 until d) {
      val name = s"e${k}_$r"
      val cells = (for (rr <- 0 until d; cc <- 0 to d) yield {
        if (rr == r && cc >= k)
          s"m_${rr}_$cc - (m_${r}_$k / m_${k}_$k) * m_${k}_$cc AS m_${rr}_$cc"
        else s"m_${rr}_$cc"
      }).mkString(", ")
      elimSteps += s"$name AS (SELECT j, $cells FROM $prev)"
      prev = name
    }
    // back substitution: one CTE per w_k, sequential subtraction ascending
    for (k <- d - 1 to 0 by -1) {
      val name = s"b$k"
      val sub = (k + 1 until d).map(c => s" - m_${k}_$c * w_$c").mkString
      elimSteps += s"$name AS (SELECT *, (m_${k}_$d$sub) / m_${k}_$k AS w_$k FROM $prev)"
      prev = name
    }
    val elim = elimSteps.mkString(",\n      ")
    val wSel = (0 until d).map(c => s"w_$c").mkString(", ")

    // apply: mean init then `rounds` ascending round-robin sweeps.
    // Coefficients become explicit columns (ic_j, cw_j_k) in a0 so each
    // sweep CTE can carry them; self-weight 0.0 emitted literally (the
    // engine's pred loop adds coefs(j)(j)=0.0 * x_j).
    val coefCols = (for (j <- 0 until p) yield {
      val preds = (0 until p).filterNot(_ == j)
      s"w$j.w_${d - 1} AS ic_$j, " +
        preds.zipWithIndex.map { case (k, a) => s"w$j.w_$a AS cw_${j}_$k" }.mkString(", ")
    }).mkString(",\n                  ")
    val applyInit = (0 until p)
      .map(i => s"COALESCE(n.v$i, g.mean$i) AS x$i").mkString(", ")
    val carryCols = (keyCols ++ (0 until p).map(i => s"v$i") ++
      (0 until p).map(j => s"ic_$j") ++
      (for (j <- 0 until p; k <- 0 until p if k != j) yield s"cw_${j}_$k")).mkString(", ")
    val sweepCtes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prevA = "a0"
    for (s <- 1 to rounds; j <- 0 until p) {
      val name = s"a${s}_$j"
      val pred = s"(ic_$j" +
        (0 until p).map(k =>
          s" + ${if (k == j) "0.0" else s"cw_${j}_$k"} * x$k").mkString + ")"
      val cells = (0 until p).map { i =>
        if (i == j) s"CASE WHEN v$j IS NULL THEN $pred ELSE x$j END AS x$j"
        else s"x$i"
      }.mkString(", ")
      sweepCtes += s"$name AS (SELECT $carryCols, $cells FROM $prevA)"
      prevA = name
    }
    val sweeps = sweepCtes.mkString(",\n      ")

    val vSel = (0 until p).map(i => s"c$i AS v$i").mkString(", ")
    val outSel = (0 until p)
      .map(i => s"round(COALESCE(b.c$i, f.x$i), 4) AS ${outNames(i)}")
      .mkString(",\n             ")
    val joinKeys = keyCols.map(c => s"b.$c = f.$c").mkString(" AND ")
    val keysB = keyCols.map(c => s"b.$c").mkString(", ")

    s"""
      WITH base AS (
        SELECT $keys,
          $maskedCols
        FROM $table),
      comp AS (SELECT * FROM base WHERE $notNull),
      sampk AS (
        SELECT *, row_number() OVER (ORDER BY hh, $keyOrder) AS rk
        FROM (SELECT *, ('0x' || substr(md5($keyHash), 1, 15))::BIGINT AS hh
              FROM comp)),
      q AS (SELECT $zCols FROM sampk WHERE rk <= $sampleSize),
      sums AS (
        SELECT count(*) AS n,
          $sumCols
        FROM q),
      g AS (
        SELECT n,
          $gCols
        FROM sums),
      gj AS (
      $gjRows),
      $elim,
      wj AS (SELECT j, $wSel FROM $prev),
      nulls AS (SELECT $keys, $vSel FROM base WHERE $anyNull),
      a0 AS (SELECT ${keyCols.map(c => s"n.$c").mkString(", ")},
                  ${(0 until p).map(i => s"n.v$i").mkString(", ")},
                  $coefCols,
                  $applyInit
             FROM nulls n, g,
                  ${(0 until p).map(j => s"(SELECT * FROM wj WHERE j = $j) w$j").mkString(", ")}),
      $sweeps
      SELECT $keysB,
             $outSel
      FROM base b
      LEFT JOIN $prevA f ON $joinKeys"""
  }
}
