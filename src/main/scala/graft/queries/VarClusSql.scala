package graft.queries

/** Machine-generated DuckDB replay of
  * [[graft.operators.VarClus.variableClusteringPortable]] — the full
  * VarClusHi pipeline (ref association_eval_varclus.py:83-266) as ONE SQL
  * statement: quantized correlation matrix → iterative splitting on the
  * largest second eigenvalue → quartimax rotation → NCS assignment →
  * hill-climb reassignment → RS_Own/RS_NC/RS_Ratio table.
  *
  * Where the PCA oracle (MLQueries.pcaJacobiSql) unrolls one eigensolver
  * into 72 rotation CTEs, VarClus needs eigendecompositions of
  * DATA-DEPENDENT submatrices (whichever cluster splits next), so the
  * replay moves from unrolled CTEs to DuckDB lambda expressions: a full
  * quantized cyclic-Jacobi eigensolver is a `list_reduce` over a
  * dynamically-generated rotation schedule, cluster state is a
  * `LIST<LIST<BIGINT>>` folded through a fixed p−1 split rounds (extra
  * rounds are no-ops once every second eigenvalue drops under the
  * threshold, exactly like the engine's stopping rule), and the
  * hill-climb is an inner fold over `passes` fixed sweeps of the move
  * schedule (the engine iterates to convergence; convergence beyond
  * `passes` sweeps would surface as a loud hash mismatch, and extra SQL
  * sweeps after convergence accept no move, so the two agree whenever
  * the engine converges within the bound — ParitySpec pins that).
  *
  * Every arithmetic step mirrors the engine bit for bit: matrix entries
  * re-rounded to the `dp` grid after each rotation, defined left-to-right
  * summation order (list_reduce with an explicit 0.0 seed), quantized
  * NCS ratios/sigmas/loadings, and `-(λ + 0.0)` sort keys so −0.0 cannot
  * reorder grid-equal eigenvalues.
  */
object VarClusSql {

  /** Sequential let-bindings via single-element list_transform: later
    * binds and the body may reference earlier binds.
    */
  private def lets(binds: (String, String)*)(body: String): String =
    binds.foldRight(body) { case ((n, e), acc) =>
      s"list_transform([$e], $n -> $acc)[1]"
    }

  def sql(
      cols: Seq[String],
      table: String = "lineitem",
      sweeps: Int = 6,
      dp: Int = 9,
      passes: Int = 4,
      maxEigval2: String = "1.0::DOUBLE"): String = {
    val p = cols.size
    var ctr = 0
    def u(): String = { ctr += 1; s"_$ctr" }

    /** submatrix of the quantized corr matrix `cm` over member list. */
    def subOf(memN: String): String = {
      val (ga, gb) = (s"ga${u()}", s"gb${u()}")
      s"list_transform($memN, $ga -> list_transform($memN, $gb -> cm[$ga + 1][$gb + 1]))"
    }

    /** Quantized cyclic-Jacobi on a bound submatrix name; yields
      * struct(a, v, p, q) after `sweeps` full sweeps.
      */
    def jacobi(subN: String): String = {
      val (s, r, t, w) = (s"sj${u()}", s"rj${u()}", s"tj${u()}", s"wj${u()}")
      val (ii, jj, ei, ej, vi, vj) =
        (s"ii${u()}", s"jj${u()}", s"ei${u()}", s"ej${u()}", s"vi${u()}", s"vj${u()}")
      val (sw, pv, qv) = (s"sw${u()}", s"pv${u()}", s"qv${u()}")
      val ident =
        s"""list_transform(range(1, len($subN) + 1), $ii ->
           | list_transform(range(1, len($subN) + 1), $jj ->
           |   CASE WHEN $ii = $jj THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END))""".stripMargin
      val sched =
        s"""flatten(list_transform(range($sweeps), $sw ->
           | flatten(list_transform(range(1, len($subN)), $pv ->
           |  list_transform(range($pv + 1, len($subN) + 1), $qv ->
           |   struct_pack(a := [[0.0::DOUBLE]], v := [[0.0::DOUBLE]], p := $pv, q := $qv))))))""".stripMargin
      val rot = lets(
        t -> s"struct_pack(apq := $s.a[$r.p][$r.q], app := $s.a[$r.p][$r.p], aqq := $s.a[$r.q][$r.q])",
        w -> (s"struct_pack(co := cos(0.5 * atan2(2.0 * $t.apq, $t.app - $t.aqq)), " +
          s"si := sin(0.5 * atan2(2.0 * $t.apq, $t.app - $t.aqq)))"))(
        s"""struct_pack(
           | a := list_transform(range(1, len($s.a) + 1), $ei ->
           |  list_transform(range(1, len($s.a) + 1), $ej ->
           |   CASE WHEN $ei = $r.p AND $ej = $r.p THEN round($w.co * $w.co * $t.app + 2.0 * $w.si * $w.co * $t.apq + $w.si * $w.si * $t.aqq, $dp)
           |        WHEN $ei = $r.q AND $ej = $r.q THEN round($w.si * $w.si * $t.app - 2.0 * $w.si * $w.co * $t.apq + $w.co * $w.co * $t.aqq, $dp)
           |        WHEN ($ei = $r.p AND $ej = $r.q) OR ($ei = $r.q AND $ej = $r.p) THEN 0.0::DOUBLE
           |        WHEN $ej = $r.p THEN round($w.co * $s.a[$ei][$r.p] + $w.si * $s.a[$ei][$r.q], $dp)
           |        WHEN $ej = $r.q THEN round(-$w.si * $s.a[$ei][$r.p] + $w.co * $s.a[$ei][$r.q], $dp)
           |        WHEN $ei = $r.p THEN round($w.co * $s.a[$r.p][$ej] + $w.si * $s.a[$r.q][$ej], $dp)
           |        WHEN $ei = $r.q THEN round(-$w.si * $s.a[$r.p][$ej] + $w.co * $s.a[$r.q][$ej], $dp)
           |        ELSE $s.a[$ei][$ej] END)),
           | v := list_transform(range(1, len($s.v) + 1), $vi ->
           |  list_transform(range(1, len($s.v) + 1), $vj ->
           |   CASE WHEN $vj = $r.p THEN round($w.co * $s.v[$vi][$r.p] + $w.si * $s.v[$vi][$r.q], $dp)
           |        WHEN $vj = $r.q THEN round(-$w.si * $s.v[$vi][$r.p] + $w.co * $s.v[$vi][$r.q], $dp)
           |        ELSE $s.v[$vi][$vj] END)),
           | p := 0::BIGINT, q := 0::BIGINT)""".stripMargin)
      s"""list_reduce(
         | [struct_pack(a := $subN, v := $ident, p := 0::BIGINT, q := 0::BIGINT)] || $sched,
         | ($s, $r) -> CASE WHEN $s.a[$r.p][$r.q] = 0.0 THEN $s ELSE $rot END)""".stripMargin
    }

    /** Left-to-right Σ with an explicit 0.0 seed (engine `+=` order). */
    def sum0(termsListE: String): String = {
      val (xa, xb) = (s"xa${u()}", s"xb${u()}")
      s"list_reduce([0.0::DOUBLE] || $termsListE, ($xa, $xb) -> $xa + $xb)"
    }

    /** First eigenvalue of a member list (1.0 / 0.0 for singletons). */
    def eig1(memN: String): String = {
      val (sb, jr, dg) = (s"sb${u()}", s"jr${u()}", s"dg${u()}")
      s"CASE WHEN len($memN) <= 1 THEN CAST(len($memN) AS DOUBLE) ELSE " +
        lets(sb -> subOf(memN), jr -> jacobi(sb))(
          s"list_aggregate(list_transform(range(1, len($memN) + 1), $dg -> $jr.a[$dg][$dg]), 'max')") +
        " END"
    }

    /** Second-largest eigenvalue (0.0 for singletons). */
    def eig2(memN: String): String = {
      val (sb, jr, dg) = (s"sb${u()}", s"jr${u()}", s"dg${u()}")
      s"CASE WHEN len($memN) <= 1 THEN 0.0::DOUBLE ELSE " +
        lets(sb -> subOf(memN), jr -> jacobi(sb))(
          s"list_sort(list_transform(range(1, len($memN) + 1), $dg -> $jr.a[$dg][$dg]), 'DESC')[2]") +
        " END"
    }

    // ---- split-round body: st (LIST<LIST<BIGINT>>) -> st' ----
    val st = "stR"
    val (e2s, mx, si) = ("e2sR", "mxR", "siR")
    val (mem, sb, jr, ord, la, lb) = ("memR", "sbR", "jrR", "ordR", "laR", "lbR")
    val (cd, wq, r0, r1, sg) = ("cdR", "wqR", "r0R", "r1R", "sgR")
    val (c1, c2, c1b, c2b, c1c, c2c) = ("c1R", "c2R", "c1bR", "c2bR", "c1cR", "c2cR")
    val (fe, hc) = ("feR", "hcR")

    def sigmaOf(rN: String): String = {
      val (jv, iv) = (s"jv${u()}", s"iv${u()}")
      s"round(sqrt(${sum0(s"list_transform(range(1, len($mem) + 1), $jv -> ${
        sum0(s"list_transform(range(1, len($mem) + 1), $iv -> $rN[$iv] * $sb[$iv][$jv])")
      } * $rN[$jv])")}), $dp)"
    }
    def ratioOf(rN: String, sigE: String, liN: String): String = {
      val jv = s"jv${u()}"
      s"round(abs(${sum0(s"list_transform(range(1, len($mem) + 1), $jv -> $rN[$jv] * $sb[$jv][$liN])")} / $sigE), $dp)"
    }

    val moveBody: String = {
      val (hA, hX, fv, n1, n2, vv) = ("hA", "hX", "fvH", "n1H", "n2H", "vvH")
      val (z1, z2) = (s"z1${u()}", s"z2${u()}")
      lets(
        fv -> s"$hX.c1[1]",
        n1 -> (s"CASE WHEN list_contains($hA.c1, $fv) THEN list_filter($hA.c1, $z1 -> $z1 <> $fv) " +
          s"ELSE list_append($hA.c1, $fv) END"),
        n2 -> (s"CASE WHEN list_contains($hA.c1, $fv) THEN list_append($hA.c2, $fv) " +
          s"ELSE list_filter($hA.c2, $z2 -> $z2 <> $fv) END"))(
        s"CASE WHEN len($n1) = 0 OR len($n2) = 0 THEN $hA ELSE " +
          lets(vv -> s"${eig1(n1)} + ${eig1(n2)}")(
            s"CASE WHEN $vv > $hA.cv THEN struct_pack(c1 := $n1, c2 := $n2, cv := $vv) ELSE $hA END") +
          " END")
    }

    val splitBody: String = {
      val (mR, dR, kR, liA, liB, mvF, mvP, cv0) =
        (s"mR${u()}", s"dR${u()}", s"kR${u()}", s"liA${u()}", s"liB${u()}",
          s"mvF${u()}", s"mvP${u()}", "cv0R")
      lets(
        mem -> s"$st[$si]",
        sb -> subOf(mem),
        jr -> jacobi(sb),
        ord -> (s"list_sort(list_transform(range(1, len($mem) + 1), $dR -> " +
          s"struct_pack(k := -($jr.a[$dR][$dR] + 0.0), i := $dR)))"),
        la -> s"list_transform(range(1, len($mem) + 1), $mR -> $jr.v[$mR][$ord[1].i])",
        lb -> s"list_transform(range(1, len($mem) + 1), $mR -> $jr.v[$mR][$ord[2].i])",
        cd -> {
          val iq = s"iq${u()}"
          s"struct_pack(cs := ${sum0(s"list_transform(range(1, len($mem) + 1), $iq -> " +
            s"($la[$iq] * $la[$iq] - $lb[$iq] * $lb[$iq]) * ($la[$iq] * $la[$iq] - $lb[$iq] * $lb[$iq]) " +
            s"- (2.0 * $la[$iq] * $lb[$iq]) * (2.0 * $la[$iq] * $lb[$iq]))")}, " +
            s"ds := ${sum0(s"list_transform(range(1, len($mem) + 1), ${iq}d -> " +
              s"2.0 * ($la[${iq}d] * $la[${iq}d] - $lb[${iq}d] * $lb[${iq}d]) * (2.0 * $la[${iq}d] * $lb[${iq}d]))")})"
        },
        wq -> (s"struct_pack(co := cos(atan2($cd.ds, $cd.cs) / 4.0), " +
          s"si := sin(atan2($cd.ds, $cd.cs) / 4.0))"),
        r0 -> {
          val iq = s"ir${u()}"
          s"list_transform(range(1, len($mem) + 1), $iq -> round($wq.co * $la[$iq] + $wq.si * $lb[$iq], $dp))"
        },
        r1 -> {
          val iq = s"is${u()}"
          s"list_transform(range(1, len($mem) + 1), $iq -> round(-$wq.si * $la[$iq] + $wq.co * $lb[$iq], $dp))"
        },
        sg -> s"struct_pack(s0 := ${sigmaOf(r0)}, s1 := ${sigmaOf(r1)})",
        c1 -> (s"list_transform(list_filter(range(1, len($mem) + 1), $liA -> " +
          s"${ratioOf(r0, s"$sg.s0", liA)} > ${ratioOf(r1, s"$sg.s1", liA)}), ${liA}m -> $mem[${liA}m])"),
        c2 -> (s"list_transform(list_filter(range(1, len($mem) + 1), $liB -> " +
          s"NOT (${ratioOf(r0, s"$sg.s0", liB)} > ${ratioOf(r1, s"$sg.s1", liB)})), ${liB}m -> $mem[${liB}m])"),
        c1b -> s"CASE WHEN len($c1) = 0 THEN [$c2[1]] ELSE $c1 END",
        c2b -> s"CASE WHEN len($c1) = 0 THEN $c2[2:] ELSE $c2 END",
        c1c -> s"CASE WHEN len($c2b) = 0 THEN $c1b[2:] ELSE $c1b END",
        c2c -> s"CASE WHEN len($c2b) = 0 THEN [$c1b[1]] ELSE $c2b END",
        fe -> s"$c1c || $c2c",
        cv0 -> s"${eig1(c1c)} + ${eig1(c2c)}",
        hc -> (s"list_reduce([struct_pack(c1 := $c1c, c2 := $c2c, cv := $cv0)] || " +
          s"list_transform(flatten(list_transform(range($passes), $mvP -> $fe)), $mvF -> " +
          s"struct_pack(c1 := [$mvF], c2 := [0::BIGINT], cv := 0.0::DOUBLE)), " +
          s"(hA, hX) -> $moveBody)"))(
        s"list_transform(range(1, len($st) + 1), $kR -> " +
          s"CASE WHEN $kR = $si THEN $hc.c1 ELSE $st[$kR] END) || [$hc.c2]")
    }

    val roundBody: String = {
      val mR = s"mc${u()}"
      lets(
        e2s -> s"list_transform($st, $mR -> ${eig2(mR)})",
        mx -> s"list_aggregate($e2s, 'max')",
        si -> s"list_position($e2s, $mx)")(
        s"CASE WHEN $mx <= $maxEigval2 THEN $st ELSE $splitBody END")
    }

    // ---- CTEs ----
    val pairs = for (i <- 0 until p; j <- (i + 1) until p) yield (i, j)
    val corrCols = pairs.map { case (i, j) =>
      s"coalesce(round(corr(CAST(${cols(i)} AS DOUBLE), CAST(${cols(j)} AS DOUBLE)), $dp), 0.0) AS r_${i}_$j"
    }.mkString(", ")
    val cmRows = (0 until p).map { i =>
      (0 until p).map { j =>
        if (i == j) "1.0::DOUBLE" else if (i < j) s"r_${i}_$j" else s"r_${j}_$i"
      }.mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")
    val init = s"[list_transform(range($p), z0 -> z0)]"
    val dums = s"list_transform(range(${p - 1}), zz -> [[0::BIGINT]])"
    val nameList = cols.map(c => s"'$c'").mkString("[", ", ", "]")

    // final-stage vec1/sigma over the FULL corr matrix
    val (fsb, fjr, ford) = ("fsbF", "fjrF", "fordF")
    val vec1Expr = {
      val (dR, mR) = (s"dF${u()}", s"mF${u()}")
      s"CASE WHEN len(mem) <= 1 THEN [1.0::DOUBLE] ELSE " +
        lets(
          fsb -> subOf("mem"),
          fjr -> jacobi(fsb),
          ford -> (s"list_sort(list_transform(range(1, len(mem) + 1), $dR -> " +
            s"struct_pack(k := -($fjr.a[$dR][$dR] + 0.0), i := $dR)))"))(
          s"list_transform(range(1, len(mem) + 1), $mR -> $fjr.v[$mR][$ford[1].i])") +
        " END"
    }
    val sigmaExpr = {
      val (jv, iv) = (s"jF${u()}", s"iF${u()}")
      s"CASE WHEN len(mem) <= 1 THEN 1.0::DOUBLE ELSE round(sqrt(${
        sum0(s"list_transform(range(1, len(mem) + 1), $jv -> ${
          sum0(s"list_transform(range(1, len(mem) + 1), $iv -> " +
            s"vec1[$iv] * cm[mem[$iv] + 1][mem[$jv] + 1])")
        } * vec1[$jv])")
      }), $dp) END"
    }
    val covExpr = {
      val jv = s"jO${u()}"
      sum0(s"list_transform(range(1, len(p2.mem) + 1), $jv -> " +
        s"p2.vec1[$jv] * p2.cm[p2.mem[$jv] + 1][f.g + 1])")
    }

    s"""
      WITH cq AS (SELECT $corrCols FROM $table),
      cmt AS (SELECT $cmRows AS cm FROM cq),
      fin AS (SELECT cm, list_reduce($init || $dums, ($st, duR) -> $roundBody) AS clusters FROM cmt),
      cl AS (SELECT unnest(range(len(clusters))) AS cid, clusters, cm FROM fin),
      pcm AS (SELECT cid, clusters[cid + 1] AS mem, cm FROM cl),
      pc AS (SELECT cid, mem, cm, $vec1Expr AS vec1 FROM pcm),
      pcs AS (SELECT cid, mem, cm, vec1, $sigmaExpr AS sigma FROM pc),
      ft AS (SELECT cid AS own_cid, unnest(mem) AS g FROM pcs),
      rsr AS (SELECT f.own_cid, f.g, p2.cid, $covExpr / p2.sigma AS rr
              FROM ft f CROSS JOIN pcs p2),
      rs2 AS (SELECT own_cid, g, cid, rr * rr AS rs FROM rsr),
      own AS (SELECT own_cid, g, rs FROM rs2 WHERE cid = own_cid),
      nc AS (SELECT own_cid, g, max(rs) AS rs_nc FROM rs2 WHERE cid <> own_cid
             GROUP BY own_cid, g)
      SELECT CAST(o.own_cid AS INT) AS Cluster,
             $nameList[o.g + 1] AS Attribute,
             round(o.rs, 4) + 0.0 AS RS_Own,
             round(coalesce(n.rs_nc, 0.0::DOUBLE), 4) + 0.0 AS RS_NC,
             round((1.0::DOUBLE - o.rs) / (1.0::DOUBLE - coalesce(n.rs_nc, 0.0::DOUBLE)), 4) + 0.0 AS RS_Ratio
      FROM own o LEFT JOIN nc n ON o.own_cid = n.own_cid AND o.g = n.g"""
  }
}
