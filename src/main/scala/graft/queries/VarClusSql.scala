package graft.queries

/** Machine-generated DuckDB replay of
  * [[graft.operators.VarClus.variableClusteringPortable]] — the full
  * VarClusHi pipeline (ref association_eval_varclus.py:83-266): quantized
  * correlation matrix → iterative splitting on the largest second
  * eigenvalue → quartimax rotation → NCS assignment → hill-climb
  * reassignment → RS_Own/RS_NC/RS_Ratio table.
  *
  * Two failed shapes inform this design. Round 10's single mega-expression
  * never bound (DuckDB's binder choked even at p=2). A lambda-fold rewrite
  * bound instantly but hit a DuckDB 1.0 miscompile: inside a `list_reduce`
  * whose accumulator is a STRUCT with two LIST fields rebuilt by sibling
  * nested lambdas, the second field stops updating after the first
  * iteration (the eigenvalue matrix converged, the eigenvector matrix
  * silently froze). So the replay uses NO multi-level lambda folds at all:
  *
  *  - every iterative process is a RECURSIVE CTE whose state is plain
  *    columns (step counter + LIST-typed matrices), with per-step scalars
  *    (rotation p/q, cos/sin) computed as real columns in nested derived
  *    tables — nothing is captured through more than one lambda level
  *    except simple ordered sums, which are verified-safe;
  *  - the engine's canonical-order contract (cluster member lists always
  *    sorted ascending) makes a member SET determine its submatrix, so
  *    the replay runs ONE Jacobi per subset bitmask — all 2^p − 1 of them
  *    advancing in lockstep through one recursive CTE (`jac`), joined to
  *    a per-mask rotation schedule; masks with shorter schedules simply
  *    stop recursing earlier and `max_by(_, step)` picks their final state;
  *  - quartimax + NCS + empty-side fixups are a chain of small CTEs
  *    (each former let-binding is a real column);
  *  - the hill-climb is a second recursive CTE over a per-mask move
  *    schedule, with candidate-cluster eigenvalues fetched by JOINing the
  *    subset table on the toggled bitmask (the engine's `eig1(n1)+eig1(n2)`
  *    as two equi-joins);
  *  - the split loop is a third recursive CTE over a LIST of cluster
  *    bitmasks, each round replacing the max-e2 cluster by its precomputed
  *    hill-climbed split pair (p − 1 rounds; no-op rounds once every
  *    second eigenvalue is under the threshold — the engine's stopping
  *    rule).
  *
  * Every arithmetic step mirrors the engine bit for bit: matrix entries
  * re-rounded to the `dp` grid after each rotation, defined left-to-right
  * summation order (list_reduce with an explicit 0.0 seed), quantized
  * NCS ratios/sigmas/loadings, and `-(λ + 0.0)` sort keys so −0.0 cannot
  * reorder grid-equal eigenvalues.
  *
  * Contract: p ≤ 12 or so (the subset table has 2^p − 1 rows); all
  * `cols` non-constant (corr defined); engine keeps member lists sorted.
  */
object VarClusSql {

  /** Left-to-right Σ with an explicit 0.0 seed (engine `+=` order). */
  private def sum0(termsListE: String, tag: String): String =
    s"list_reduce([0.0::DOUBLE] || $termsListE, (xa$tag, xb$tag) -> xa$tag + xb$tag)"

  def sql(
      cols: Seq[String],
      table: String = "lineitem",
      sweeps: Int = 6,
      dp: Int = 9,
      passes: Int = 4,
      maxEigval2: String = "1.0::DOUBLE"): String = {
    val p = cols.size
    require(p >= 2 && p <= 12, s"portable VarClus oracle supports 2..12 columns, got $p")

    val pairs = for (i <- 0 until p; j <- (i + 1) until p) yield (i, j)
    val corrCols = pairs.map { case (i, j) =>
      s"coalesce(round(corr(CAST(${cols(i)} AS DOUBLE), CAST(${cols(j)} AS DOUBLE)), $dp), 0.0) AS r_${i}_$j"
    }.mkString(", ")
    val cmRows = (0 until p).map { i =>
      (0 until p).map { j =>
        if (i == j) "1.0::DOUBLE" else if (i < j) s"r_${i}_$j" else s"r_${j}_$i"
      }.mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")
    val nameList = cols.map(c => s"'$c'").mkString("[", ", ", "]")
    val fullMask = (1L << p) - 1L

    // ordered dot of rotated loading rK with submatrix column li, /sigma
    def ratioList(rN: String, sigN: String): String =
      s"list_transform(range(1, len(mem) + 1), li$rN -> " +
        s"round(abs(${sum0(s"list_transform(range(1, len(mem) + 1), jv$rN -> $rN[jv$rN] * sb[jv$rN][li$rN])", rN)} / $sigN), $dp))"
    // sigma_k = round(sqrt(rKᵀ Σ rK), dp), defined j-outer/i-inner order
    def sigmaOf(rN: String): String =
      s"round(sqrt(${sum0(s"list_transform(range(1, len(mem) + 1), sj$rN -> ${
        sum0(s"list_transform(range(1, len(mem) + 1), si$rN -> $rN[si$rN] * sb[si$rN][sj$rN])", "i" + rN)
      } * $rN[sj$rN])", "o" + rN)}), $dp)"

    val ordA = "list_sort(list_transform(range(1, len(s.mem) + 1), dA -> " +
      "struct_pack(k := -(f.a[dA][dA] + 0.0), i := dA)))"
    val ordB = "list_sort(list_transform(range(1, len(s.mem) + 1), dB -> " +
      "struct_pack(k := -(f.a[dB][dB] + 0.0), i := dB)))"

    s"""
      WITH RECURSIVE
      cq AS (SELECT $corrCols FROM $table),
      cmt AS MATERIALIZED (SELECT $cmRows AS cm FROM cq),
      mk AS (SELECT unnest(range(1, ${1L << p})) AS mask),
      sub0 AS (SELECT mask, list_filter(range($p), gZ -> ((mask >> gZ) & 1) = 1) AS mem, cm
               FROM mk, cmt),
      subS AS MATERIALIZED (SELECT mask, mem, cm,
                      list_transform(mem, gaS -> list_transform(mem, gbS -> cm[gaS + 1][gbS + 1])) AS sb
               FROM sub0),
      -- per-mask cyclic rotation schedule: $sweeps sweeps of upper-triangle (p,q)
      rs0 AS (SELECT mask,
                     flatten(list_transform(range($sweeps), swR ->
                       flatten(list_transform(range(1, len(mem)), pvR ->
                         list_transform(range(pvR + 1, len(mem) + 1), qvR ->
                           struct_pack(p := pvR, q := qvR)))))) AS sl
              FROM subS WHERE len(mem) >= 2),
      rs1 AS (SELECT mask, unnest(range(1, len(sl) + 1)) AS step, sl FROM rs0),
      rsc AS MATERIALIZED (SELECT mask, step, sl[step].p AS rp, sl[step].q AS rq FROM rs1),
      -- all subsets' quantized Jacobi folds advancing in lockstep
      jac AS (
        SELECT mask, 0::BIGINT AS step, sb AS a,
               list_transform(range(1, len(mem) + 1), iiJ ->
                 list_transform(range(1, len(mem) + 1), jjJ ->
                   CASE WHEN iiJ = jjJ THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)) AS v
        FROM subS WHERE len(mem) >= 2
        UNION ALL
        SELECT mask, step,
          CASE WHEN apq = 0.0 THEN a ELSE
            list_transform(range(1, len(a) + 1), eiJ ->
              list_transform(range(1, len(a) + 1), ejJ ->
                CASE WHEN eiJ = rp AND ejJ = rp THEN round(co * co * app + 2.0 * si * co * apq + si * si * aqq, $dp)
                     WHEN eiJ = rq AND ejJ = rq THEN round(si * si * app - 2.0 * si * co * apq + co * co * aqq, $dp)
                     WHEN (eiJ = rp AND ejJ = rq) OR (eiJ = rq AND ejJ = rp) THEN 0.0::DOUBLE
                     WHEN ejJ = rp THEN round(co * a[eiJ][rp] + si * a[eiJ][rq], $dp)
                     WHEN ejJ = rq THEN round(-si * a[eiJ][rp] + co * a[eiJ][rq], $dp)
                     WHEN eiJ = rp THEN round(co * a[rp][ejJ] + si * a[rq][ejJ], $dp)
                     WHEN eiJ = rq THEN round(-si * a[rp][ejJ] + co * a[rq][ejJ], $dp)
                     ELSE a[eiJ][ejJ] END)) END AS a,
          CASE WHEN apq = 0.0 THEN v ELSE
            list_transform(range(1, len(v) + 1), viJ ->
              list_transform(range(1, len(v) + 1), vjJ ->
                CASE WHEN vjJ = rp THEN round(co * v[viJ][rp] + si * v[viJ][rq], $dp)
                     WHEN vjJ = rq THEN round(-si * v[viJ][rp] + co * v[viJ][rq], $dp)
                     ELSE v[viJ][vjJ] END)) END AS v
        FROM (SELECT i2.*, cos(0.5 * atan2(2.0 * apq, app - aqq)) AS co,
                     sin(0.5 * atan2(2.0 * apq, app - aqq)) AS si
              FROM (SELECT j.mask, j.step + 1 AS step, j.a, j.v, sc.rp, sc.rq,
                           j.a[sc.rp][sc.rq] AS apq, j.a[sc.rp][sc.rp] AS app,
                           j.a[sc.rq][sc.rq] AS aqq
                    FROM jac j JOIN rsc sc ON sc.mask = j.mask AND sc.step = j.step + 1) i2)
      ),
      jfin AS MATERIALIZED (SELECT mask, max_by(a, step) AS a, max_by(v, step) AS v FROM jac GROUP BY mask),
      -- per-mask eigendata: e1/e2 + top-2 loading columns (engine sort key)
      subL AS MATERIALIZED (
        SELECT s.mask, s.mem, s.sb,
          CASE WHEN len(s.mem) <= 1 THEN CAST(len(s.mem) AS DOUBLE)
               ELSE list_aggregate(list_transform(range(1, len(s.mem) + 1), d1 -> f.a[d1][d1]), 'max') END AS e1,
          CASE WHEN len(s.mem) <= 1 THEN 0.0::DOUBLE
               ELSE list_sort(list_transform(range(1, len(s.mem) + 1), d2 -> f.a[d2][d2]), 'DESC')[2] END AS e2,
          CASE WHEN len(s.mem) <= 1 THEN [1.0::DOUBLE]
               ELSE list_transform(range(1, len(s.mem) + 1), rA -> f.v[rA][($ordA)[1].i]) END AS la,
          CASE WHEN len(s.mem) <= 1 THEN [0.0::DOUBLE]
               ELSE list_transform(range(1, len(s.mem) + 1), rB -> f.v[rB][($ordB)[2].i]) END AS lb
        FROM subS s LEFT JOIN jfin f ON f.mask = s.mask),
      -- quartimax of the top-2 loadings (one Kaiser angle), NCS partition
      qx1 AS (SELECT mask, mem, sb, e1, e2, la,
                ${sum0("list_transform(range(1, len(mem) + 1), iC -> " +
                  "(la[iC] * la[iC] - lb[iC] * lb[iC]) * (la[iC] * la[iC] - lb[iC] * lb[iC]) " +
                  "- (2.0 * la[iC] * lb[iC]) * (2.0 * la[iC] * lb[iC]))", "C")} AS cs,
                ${sum0("list_transform(range(1, len(mem) + 1), iD -> " +
                  "2.0 * (la[iD] * la[iD] - lb[iD] * lb[iD]) * (2.0 * la[iD] * lb[iD]))", "D")} AS ds,
                lb
              FROM subL WHERE len(mem) >= 2),
      qx2 AS (SELECT *, cos(atan2(ds, cs) / 4.0) AS qco, sin(atan2(ds, cs) / 4.0) AS qsi FROM qx1),
      qx3 AS (SELECT *, list_transform(range(1, len(mem) + 1), iE -> round(qco * la[iE] + qsi * lb[iE], $dp)) AS r0,
                        list_transform(range(1, len(mem) + 1), iF -> round(-qsi * la[iF] + qco * lb[iF], $dp)) AS r1
              FROM qx2),
      qx4 AS (SELECT *, ${sigmaOf("r0")} AS sg0, ${sigmaOf("r1")} AS sg1 FROM qx3),
      qx5 AS (SELECT *, ${ratioList("r0", "sg0")} AS rat0, ${ratioList("r1", "sg1")} AS rat1 FROM qx4),
      qx6 AS (SELECT *, list_transform(list_filter(range(1, len(mem) + 1), lG -> rat0[lG] > rat1[lG]), xG -> mem[xG]) AS c1,
                        list_transform(list_filter(range(1, len(mem) + 1), lH -> NOT (rat0[lH] > rat1[lH])), xH -> mem[xH]) AS c2
              FROM qx5),
      qx7 AS (SELECT *, CASE WHEN len(c1) = 0 THEN [c2[1]] ELSE c1 END AS c1b,
                        CASE WHEN len(c1) = 0 THEN c2[2:] ELSE c2 END AS c2b
              FROM qx6),
      qx8 AS (SELECT *, CASE WHEN len(c2b) = 0 THEN c1b[2:] ELSE c1b END AS c1c,
                        CASE WHEN len(c2b) = 0 THEN [c1b[1]] ELSE c2b END AS c2c
              FROM qx7),
      qx9 AS MATERIALIZED (SELECT mask, mem, e1, e2, la,
                     CAST(list_aggregate(list_transform(c1c, gI -> (1::BIGINT << gI)), 'sum') AS BIGINT) AS m1,
                     CAST(list_aggregate(list_transform(c2c, gJ -> (1::BIGINT << gJ)), 'sum') AS BIGINT) AS m2
              FROM qx8),
      subN AS MATERIALIZED (SELECT mask, mem, e1, e2, la, mask AS m1, 0::BIGINT AS m2 FROM subL WHERE len(mem) <= 1
               UNION ALL
               SELECT mask, mem, e1, e2, la, m1, m2 FROM qx9),
      e1t AS MATERIALIZED (SELECT mask, e1 FROM subN),
      -- hill-climb: `passes` fixed sweeps of the ascending move schedule
      ms0 AS (SELECT mask, flatten(list_transform(range($passes), zM -> mem)) AS ml
              FROM subN WHERE len(mem) >= 2),
      ms1 AS (SELECT mask, unnest(range(1, len(ml) + 1)) AS step, ml FROM ms0),
      msched AS MATERIALIZED (SELECT mask, step, ml[step] AS feat FROM ms1),
      hc0 AS MATERIALIZED (SELECT n.mask, n.m1, n.m2, a1.e1 + a2.e1 AS cv
              FROM subN n JOIN e1t a1 ON a1.mask = n.m1 JOIN e1t a2 ON a2.mask = n.m2
              WHERE len(n.mem) >= 2),
      hc AS (
        SELECT mask, 0::BIGINT AS step, m1 AS c1, m2 AS c2, cv FROM hc0
        UNION ALL
        SELECT t.mask, t.step,
          CASE WHEN t.n1 <> 0 AND t.n2 <> 0 AND (v1.e1 + v2.e1) > t.cv THEN t.n1 ELSE t.c1 END,
          CASE WHEN t.n1 <> 0 AND t.n2 <> 0 AND (v1.e1 + v2.e1) > t.cv THEN t.n2 ELSE t.c2 END,
          CASE WHEN t.n1 <> 0 AND t.n2 <> 0 AND (v1.e1 + v2.e1) > t.cv THEN (v1.e1 + v2.e1) ELSE t.cv END
        FROM (SELECT h.mask, h.step + 1 AS step, h.c1, h.c2, h.cv,
                     CASE WHEN ((h.c1 >> ms.feat) & 1) = 1 THEN h.c1 - (1::BIGINT << ms.feat)
                          ELSE h.c1 + (1::BIGINT << ms.feat) END AS n1,
                     CASE WHEN ((h.c1 >> ms.feat) & 1) = 1 THEN h.c2 + (1::BIGINT << ms.feat)
                          ELSE h.c2 - (1::BIGINT << ms.feat) END AS n2
              FROM hc h JOIN msched ms ON ms.mask = h.mask AND ms.step = h.step + 1) t
        LEFT JOIN e1t v1 ON v1.mask = t.n1
        LEFT JOIN e1t v2 ON v2.mask = t.n2
      ),
      hfin AS MATERIALIZED (SELECT mask, max_by(c1, step) AS h1, max_by(c2, step) AS h2 FROM hc GROUP BY mask),
      splits AS MATERIALIZED (SELECT n.mask, n.e2, n.la,
                        CASE WHEN len(n.mem) <= 1 THEN n.mask ELSE f.h1 END AS s1,
                        CASE WHEN len(n.mem) <= 1 THEN 0::BIGINT ELSE f.h2 END AS s2
                 FROM subN n LEFT JOIN hfin f ON f.mask = n.mask),
      arrs AS MATERIALIZED (SELECT list(e2 ORDER BY mask) AS e2a,
                      list(s1 ORDER BY mask) AS s1a,
                      list(s2 ORDER BY mask) AS s2a,
                      list(la ORDER BY mask) AS laa
               FROM splits),
      -- split loop: p−1 rounds over a LIST of cluster bitmasks
      rounds AS (
        SELECT 0::BIGINT AS rstep, [${fullMask}::BIGINT] AS st
        UNION ALL
        SELECT t.rstep,
          CASE WHEN t.mx <= $maxEigval2 THEN t.st
               ELSE list_transform(range(1, len(t.st) + 1), kR ->
                      CASE WHEN kR = t.si THEN t.s1a[t.st[t.si]] ELSE t.st[kR] END) || [t.s2a[t.st[t.si]]] END
        FROM (SELECT u.rstep, u.st, u.s1a, u.s2a,
                     list_aggregate(u.e2s, 'max') AS mx,
                     list_position(u.e2s, list_aggregate(u.e2s, 'max')) AS si
              FROM (SELECT r.rstep + 1 AS rstep, r.st, a.s1a, a.s2a,
                           list_transform(r.st, mkR -> a.e2a[mkR]) AS e2s
                    FROM rounds r, arrs a WHERE r.rstep < ${p - 1}) u) t
      ),
      rfin AS MATERIALIZED (SELECT max_by(st, rstep) AS cl FROM rounds),
      -- RS table over the FULL corr matrix, defined-order sums
      cl1 AS (SELECT unnest(range(len(cl))) AS cid, cl FROM rfin),
      pcm AS (SELECT cid, cl[cid + 1] AS cmask FROM cl1),
      pc AS (SELECT cid, cmask,
                    list_filter(range($p), gK -> ((cmask >> gK) & 1) = 1) AS mem,
                    l.laa[cmask] AS vec1, c.cm
             FROM pcm, (SELECT laa FROM arrs) l, cmt c),
      pcs AS MATERIALIZED (SELECT cid, mem, vec1, cm,
                     CASE WHEN len(mem) <= 1 THEN 1.0::DOUBLE
                          ELSE round(sqrt(${sum0("list_transform(range(1, len(mem) + 1), jP -> " +
                            sum0("list_transform(range(1, len(mem) + 1), iP -> " +
                              "vec1[iP] * cm[mem[iP] + 1][mem[jP] + 1])", "iQ") + " * vec1[jP])", "oQ")}), $dp) END AS sigma
              FROM pc),
      ft AS (SELECT cid AS own_cid, unnest(mem) AS g FROM pcs),
      rsr AS (SELECT f.own_cid, f.g, p2.cid,
                     ${sum0("list_transform(range(1, len(p2.mem) + 1), jV -> " +
                       "p2.vec1[jV] * p2.cm[p2.mem[jV] + 1][f.g + 1])", "V")} / p2.sigma AS rr
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
