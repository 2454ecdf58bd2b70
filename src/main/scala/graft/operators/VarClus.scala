package graft.operators

import breeze.linalg.{eigSym, DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical variable clustering — a Scala port of the reference's
  * VarClusHi semantics (ref: association_eval_varclus.py:11-450, wrapper
  * association_evaluator.py:142-250):
  *
  *  1. ONE distributed pass computes the Pearson correlation matrix
  *     (ml.stat.Correlation over an assembled vector); everything after
  *     is driver-side Breeze on O(p²) state.
  *  2. Splitting loop: take the cluster with the largest 2nd eigenvalue
  *     (> maxEigval2), split on its top-2 quartimax-rotated principal
  *     components, assign each variable to the rotated component with the
  *     higher squared correlation (NCS), then hill-climb single-variable
  *     moves while total explained variance (sum of per-cluster first
  *     eigenvalues) improves (search phase).
  *  3. Output [Cluster, Attribute, RS_Own, RS_NC, RS_Ratio] with
  *     RS_Ratio = (1 − RS_Own) / (1 − RS_NC), rounded 4.
  */
object VarClus {

  /** Pearson correlation matrix as a Breeze matrix (distributed compute,
    * driver-held O(p²) result). For narrow inputs all p(p−1)/2 pairs go
    * into ONE codegen'd aggregation (single scan, no vector assembly);
    * wide inputs fall back to ml.stat.Correlation's gramian path.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): BDM[Double] = {
    val p = cols.size
    if (p <= 40) {
      val pairs = for (i <- 0 until p; j <- (i + 1) until p) yield (i, j)
      val exprs = pairs.map { case (i, j) =>
        corr(col(cols(i)).cast("double"), col(cols(j)).cast("double")).as(s"c__${i}__$j")
      }
      val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
      val m = BDM.eye[Double](p)
      pairs.foreach { case (i, j) =>
        val v = row.getAs[Double](s"c__${i}__$j")
        val r = if (v.isNaN) 0.0 else v
        m(i, j) = r; m(j, i) = r
      }
      m
    } else {
      val assembled = new VectorAssembler()
        .setInputCols(cols.toArray).setOutputCol("__v").setHandleInvalid("skip")
        .transform(df.select(cols.map(c => col(c).cast("double")): _*))
      val m = Correlation.corr(assembled, "__v").head
        .getAs[org.apache.spark.ml.linalg.Matrix](0)
      new BDM(m.numRows, m.numCols, m.toArray)
    }
  }

  private final case class Eig(vals: BDV[Double], vecs: BDM[Double])

  /** Eigen-decomposition sorted by descending eigenvalue. */
  private def eigDesc(m: BDM[Double]): Eig = {
    val es = eigSym(m)
    val order = (0 until es.eigenvalues.length).sortBy(i => -es.eigenvalues(i))
    val vals = BDV(order.map(es.eigenvalues(_)).toArray)
    val vecs = BDM.zeros[Double](m.rows, m.cols)
    order.zipWithIndex.foreach { case (src, dst) =>
      (0 until m.rows).foreach(r => vecs(r, dst) = es.eigenvectors(r, src))
    }
    Eig(vals, vecs)
  }

  private def submatrix(corr: BDM[Double], idx: Seq[Int]): BDM[Double] = {
    val m = BDM.zeros[Double](idx.size, idx.size)
    for (i <- idx.indices; j <- idx.indices) m(i, j) = corr(idx(i), idx(j))
    m
  }

  /** First (and second) eigenvalue of a cluster's correlation submatrix;
    * singleton clusters contribute eigval1 = 1 (ref correig, :128-133).
    */
  private def clusterEig(corr: BDM[Double], idx: Seq[Int]): (Double, Double, BDV[Double]) =
    if (idx.size <= 1) (idx.size.toDouble, 0.0, BDV.ones[Double](idx.size))
    else {
      val e = eigDesc(submatrix(corr, idx))
      (e.vals(0), e.vals(1), e.vecs(::, 0))
    }

  /** Raw quartimax rotation of a p×2 loading matrix: one Kaiser pairwise
    * angle maximizing Σ loadings⁴  (tan 4θ = D / C with u = a²−b²,
    * v = 2ab, C = Σ(u²−v²), D = Σ2uv).
    */
  def quartimax2(loadings: BDM[Double]): BDM[Double] = {
    require(loadings.cols == 2, "quartimax2 rotates exactly two factors")
    val a = loadings(::, 0); val b = loadings(::, 1)
    var cSum = 0.0; var dSum = 0.0
    (0 until loadings.rows).foreach { i =>
      val u = a(i) * a(i) - b(i) * b(i)
      val v = 2 * a(i) * b(i)
      cSum += u * u - v * v
      dSum += 2 * u * v
    }
    val theta = math.atan2(dSum, cSum) / 4
    val (c, s) = (math.cos(theta), math.sin(theta))
    val out = BDM.zeros[Double](loadings.rows, 2)
    (0 until loadings.rows).foreach { i =>
      out(i, 0) = c * a(i) + s * b(i)
      out(i, 1) = -s * a(i) + c * b(i)
    }
    out
  }

  private def totVar(corr: BDM[Double], clusters: Seq[Seq[Int]]): Double =
    clusters.filter(_.nonEmpty).map(c => clusterEig(corr, c)._1).sum

  /** Search-phase hill climb (ref _reassign, :176-232): move single
    * variables between the two clusters while total variance improves.
    */
  private def reassign(corr: BDM[Double], clus1: Seq[Int], clus2: Seq[Int]): (Seq[Int], Seq[Int]) = {
    var fin1 = clus1.toVector; var fin2 = clus2.toVector
    var checkVar = totVar(corr, Seq(fin1, fin2))
    var maxVar = checkVar
    var improved = true
    while (improved) {
      for (feat <- (clus1 ++ clus2)) {
        val (n1, n2) =
          if (fin1.contains(feat)) (fin1.filterNot(_ == feat), fin2 :+ feat)
          else if (fin2.contains(feat)) (fin1 :+ feat, fin2.filterNot(_ == feat))
          else (fin1, fin2)
        if ((n1 ne fin1) || (n2 ne fin2)) {
          if (n1.nonEmpty && n2.nonEmpty) {
            val v = totVar(corr, Seq(n1, n2))
            if (v > checkVar) { checkVar = v; fin1 = n1; fin2 = n2 }
          }
        }
      }
      if (maxVar == checkVar) improved = false else maxVar = checkVar
    }
    (fin1, fin2)
  }

  final case class ClusterAssignment(cluster: Int, attribute: String,
      rsOwn: Double, rsNc: Double, rsRatio: Double)

  /** Full clustering on a precomputed correlation matrix. */
  def cluster(
      corr: BDM[Double],
      cols: Seq[String],
      maxEigval2: Double = 1.0,
      maxClus: Option[Int] = None): Seq[Seq[Int]] = {
    var clusters: Vector[Seq[Int]] = Vector(cols.indices.toSeq)
    var go = true
    while (go && maxClus.forall(clusters.size < _)) {
      val eig2s = clusters.map(c => clusterEig(corr, c)._2)
      val splitIdx = eig2s.indices.maxBy(eig2s)
      if (eig2s(splitIdx) <= maxEigval2) go = false
      else {
        val clus = clusters(splitIdx)
        val sub = submatrix(corr, clus)
        val e = eigDesc(sub)
        val loadings = BDM.horzcat(
          e.vecs(::, 0).toDenseMatrix.t, e.vecs(::, 1).toDenseMatrix.t)
        val rot = quartimax2(loadings)
        // component sigmas: sqrt(diag(Rᵀ Σ R)) (ref :333-341)
        val sigma = (0 until 2).map { k =>
          math.sqrt(((rot(::, k).t * sub) * rot(::, k)))
        }
        val (c1, c2) = clus.zipWithIndex.partition { case (_, local) =>
          val cov1 = (0 until clus.size).map(j => rot(j, 0) * sub(j, local)).sum
          val cov2 = (0 until clus.size).map(j => rot(j, 1) * sub(j, local)).sum
          math.abs(cov1 / sigma(0)) > math.abs(cov2 / sigma(1))
        }
        var clus1: Seq[Int] = c1.map(_._1); var clus2: Seq[Int] = c2.map(_._1)
        if (clus1.isEmpty) { clus1 = Seq(clus2.head); clus2 = clus2.tail }
        if (clus2.isEmpty) { clus2 = Seq(clus1.head); clus1 = clus1.tail }
        val (f1, f2) = reassign(corr, clus1, clus2)
        clusters = clusters.updated(splitIdx, f1) :+ f2
      }
    }
    clusters
  }

  /** ref wrapper output (association_evaluator.py:142-250):
    * [Cluster, Attribute, RS_Own, RS_NC, RS_Ratio].
    */
  def variableClustering(
      df: DataFrame,
      cols: Seq[String],
      maxEigval2: Double = 1.0,
      maxClus: Option[Int] = None): DataFrame = {
    import df.sparkSession.implicits._
    val corr = correlationMatrix(df, cols)
    val clusters = cluster(corr, cols, maxEigval2, maxClus)
    // per-cluster first PC and sigma over the FULL corr matrix (ref _rsquarespark)
    val pcs = clusters.map { c =>
      val (_, _, vec1) = clusterEig(corr, c)
      val sub = submatrix(corr, c)
      val sigma =
        if (c.size <= 1) 1.0
        else math.sqrt((vec1.t * sub) * vec1)
      (c, vec1, sigma)
    }
    def rsWith(feat: Int, c: Seq[Int], vec1: BDV[Double], sigma: Double): Double = {
      val cov = c.indices.map(j => vec1(j) * corr(c(j), feat)).sum
      val r = cov / sigma
      r * r
    }
    val rows = pcs.zipWithIndex.flatMap { case ((c, vec1, sigma), i) =>
      c.map { feat =>
        val rsOwn = if (c.size == 1) 1.0 else rsWith(feat, c, vec1, sigma)
        val others = pcs.zipWithIndex.collect {
          case ((oc, ovec, osig), j) if j != i => rsWith(feat, oc, ovec, osig)
        }
        val rsNc = if (others.nonEmpty) others.max else 0.0
        val ratio = (1 - rsOwn) / (1 - rsNc)
        ClusterAssignment(i, cols(feat),
          math.rint(rsOwn * 10000) / 10000,
          math.rint(rsNc * 10000) / 10000,
          math.rint(ratio * 10000) / 10000)
      }
    }
    rows.toDF("Cluster", "Attribute", "RS_Own", "RS_NC", "RS_Ratio")
  }

  // ------------------------------------------------------------------
  // Engine-portable variant: identical VarClusHi semantics, but every
  // eigendecomposition is the deterministic quantized cyclic Jacobi
  // (LatentFeatures.jacobiEigSymQuantized) on a correlation matrix whose
  // entries are rounded to `dp` decimals, every derived comparison
  // quantity (NCS ratios, component sigmas, rotated loadings) is
  // re-rounded to the same grid, and every summation runs in a defined
  // left-to-right index order — so an external SQL engine replaying the
  // same arithmetic lands on the same clusters AND the same RS numbers
  // bit for bit (the q_pca_latent trick extended from one eigensolver to
  // the full split → quartimax → NCS → hill-climb pipeline).
  // ------------------------------------------------------------------

  private def rq(dp: Int)(x: Double): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Quantized eigendecomposition of a cluster submatrix, sorted by
    * (eigenvalue desc, column index asc). Singleton → ([1], [[1]]).
    */
  private def portableEig(corr: Array[Array[Double]], idx: Seq[Int],
      sweeps: Int, dp: Int): (Array[Double], Array[Array[Double]]) = {
    val m = idx.size
    if (m <= 1) (Array(1.0), Array(Array(1.0)))
    else {
      val sub = Array.tabulate(m, m)((i, j) => corr(idx(i))(idx(j)))
      val (ev, v) = graft.operators.LatentFeatures.jacobiEigSymQuantized(sub, sweeps, dp)
      // `+ 0.0` collapses −0.0 before the sort key so the Scala total
      // ordering (−0.0 < 0.0) can't order two grid-equal eigenvalues
      // differently from the SQL replay
      val order = (0 until m).sortBy(i => (-(ev(i) + 0.0), i))
      (order.map(ev).toArray,
        Array.tabulate(m, m)((r, c) => v(r)(order(c))))
    }
  }

  /** First eigenvalue of a cluster (1.0 for singletons) — the quantized
    * totVar building block shared with the SQL replay.
    */
  private def portableEig1(corr: Array[Array[Double]], idx: Seq[Int],
      sweeps: Int, dp: Int): Double =
    if (idx.size <= 1) idx.size.toDouble
    else portableEig(corr, idx, sweeps, dp)._1(0)

  /** VarClusHi with fully portable arithmetic (see object banner).
    * Output matches [[variableClustering]]'s schema; VarClusSpec asserts
    * the two produce the same clusters on the benchmark fixture and the
    * DuckDB replay of [[graft.queries.VarClusSql]] reproduces this
    * function bit for bit (q_variable_clustering oracle row).
    *
    * Canonical-order contract shared with the SQL replay: cluster member
    * lists are kept sorted ascending at every step (initial cluster, NCS
    * partition, hill-climb moves), so a member SET fully determines its
    * submatrix and therefore its quantized eigendata — which is what lets
    * the replay precompute one Jacobi per subset bitmask instead of
    * re-deriving eigensolvers inside the split/hill-climb folds. The
    * hill-climb runs `passes` FIXED sweeps over the ascending move
    * schedule (early exit when a sweep accepts no move is a pure
    * optimization: the state is a fixed point, so the remaining sweeps
    * are no-ops on both engines).
    */
  def variableClusteringPortable(
      df: DataFrame,
      cols: Seq[String],
      maxEigval2: Double = 1.0,
      sweeps: Int = 6,
      dp: Int = 9,
      passes: Int = 4,
      trace: Boolean = false): DataFrame = {
    import df.sparkSession.implicits._
    val q = rq(dp) _
    val p = cols.size
    val raw = correlationMatrix(df, cols)
    val corr = Array.tabulate(p, p)((i, j) => if (i == j) 1.0 else q(raw(i, j)))

    def eig(idx: Seq[Int]) = portableEig(corr, idx, sweeps, dp)
    def eig1(idx: Seq[Int]) = portableEig1(corr, idx, sweeps, dp)
    def eig2(idx: Seq[Int]): Double =
      if (idx.size <= 1) 0.0 else eig(idx)._1(1)

    def hillClimb(clus1: Seq[Int], clus2: Seq[Int]): (Seq[Int], Seq[Int], Int) = {
      val feats = (clus1 ++ clus2).sorted
      var fin1 = clus1.toVector; var fin2 = clus2.toVector
      var checkVar = eig1(fin1) + eig1(fin2)
      var maxVar = checkVar
      var improved = true
      var sweep = 0
      while (improved && sweep < passes) {
        sweep += 1
        for (feat <- feats) {
          val (n1, n2) =
            if (fin1.contains(feat)) (fin1.filterNot(_ == feat), (fin2 :+ feat).sorted)
            else ((fin1 :+ feat).sorted, fin2.filterNot(_ == feat))
          if (n1.nonEmpty && n2.nonEmpty) {
            val v = eig1(n1) + eig1(n2)
            if (v > checkVar) { checkVar = v; fin1 = n1.toVector; fin2 = n2.toVector }
          }
        }
        if (maxVar == checkVar) improved = false else maxVar = checkVar
      }
      (fin1, fin2, sweep)
    }

    var clusters: Vector[Seq[Int]] = Vector(cols.indices.toSeq)
    var go = true
    var rounds = 0
    while (go) {
      val e2s = clusters.map(eig2)
      val splitIdx = e2s.indices.maxBy(e2s)
      if (e2s(splitIdx) <= maxEigval2) go = false
      else {
        rounds += 1
        val clus = clusters(splitIdx)
        val m = clus.size
        val sub = Array.tabulate(m, m)((i, j) => corr(clus(i))(clus(j)))
        val (_, vecs) = eig(clus)
        // quartimax of the top-2 loadings, rotated loadings re-quantized
        val a = Array.tabulate(m)(i => vecs(i)(0))
        val b = Array.tabulate(m)(i => vecs(i)(1))
        var cSum = 0.0; var dSum = 0.0
        var i = 0
        while (i < m) {
          val u = a(i) * a(i) - b(i) * b(i)
          val v = 2.0 * a(i) * b(i)
          cSum += u * u - v * v
          dSum += 2.0 * u * v
          i += 1
        }
        val theta = math.atan2(dSum, cSum) / 4
        val (co, si) = (math.cos(theta), math.sin(theta))
        val r0 = Array.tabulate(m)(i => q(co * a(i) + si * b(i)))
        val r1 = Array.tabulate(m)(i => q(-si * a(i) + co * b(i)))
        // sigma_k = sqrt(rot_kᵀ Σ rot_k), defined order: j outer, i inner
        def sigmaOf(r: Array[Double]): Double = {
          var s = 0.0; var j = 0
          while (j < m) {
            var y = 0.0; var i2 = 0
            while (i2 < m) { y += r(i2) * sub(i2)(j); i2 += 1 }
            s += y * r(j); j += 1
          }
          q(math.sqrt(s))
        }
        val sig0 = sigmaOf(r0); val sig1 = sigmaOf(r1)
        // NCS: assign each variable to the rotated component with the
        // larger quantized |corr(x, comp)|
        def ratio(r: Array[Double], sig: Double, li: Int): Double = {
          var cov = 0.0; var j = 0
          while (j < m) { cov += r(j) * sub(j)(li); j += 1 }
          q(math.abs(cov / sig))
        }
        val (c1m, c2m) = clus.zipWithIndex.partition { case (_, li) =>
          ratio(r0, sig0, li) > ratio(r1, sig1, li)
        }
        var clus1: Seq[Int] = c1m.map(_._1); var clus2: Seq[Int] = c2m.map(_._1)
        if (clus1.isEmpty) { clus1 = Seq(clus2.head); clus2 = clus2.tail }
        if (clus2.isEmpty) { clus2 = Seq(clus1.head); clus1 = clus1.tail }
        val (f1, f2, passes) = hillClimb(clus1, clus2)
        if (trace) System.err.println(
          s"[varclus] round $rounds: split #$splitIdx ${clus.map(cols).mkString("[", ",", "]")}" +
            s" e2=${e2s(splitIdx)} ncs=(${clus1.map(cols).mkString(",")})/(${clus2.map(cols).mkString(",")})" +
            s" final=(${f1.map(cols).mkString(",")})/(${f2.map(cols).mkString(",")}) passes=$passes")
        clusters = clusters.updated(splitIdx, f1) :+ f2
      }
    }
    if (trace) System.err.println(
      s"[varclus] final: ${clusters.map(_.map(cols).mkString("[", ",", "]")).mkString(" ")}")

    // RS table over the FULL corr matrix, defined-order sums
    val pcs = clusters.map { c =>
      val vec1 =
        if (c.size <= 1) Array(1.0)
        else { val (_, v) = eig(c); Array.tabulate(c.size)(i => v(i)(0)) }
      val sigma =
        if (c.size <= 1) 1.0
        else {
          var s = 0.0; var j = 0
          while (j < c.size) {
            var y = 0.0; var i2 = 0
            while (i2 < c.size) { y += vec1(i2) * corr(c(i2))(c(j)); i2 += 1 }
            s += y * vec1(j); j += 1
          }
          q(math.sqrt(s))
        }
      (c, vec1, sigma)
    }
    def rsWith(feat: Int, c: Seq[Int], vec1: Array[Double], sigma: Double): Double = {
      var cov = 0.0; var j = 0
      while (j < c.size) { cov += vec1(j) * corr(c(j))(feat); j += 1 }
      val r = cov / sigma
      r * r
    }
    val q4 = rq(4) _
    val rows = pcs.zipWithIndex.flatMap { case ((c, vec1, sigma), ci) =>
      c.map { feat =>
        val rsOwn = if (c.size == 1) 1.0 else rsWith(feat, c, vec1, sigma)
        val others = pcs.zipWithIndex.collect {
          case ((oc, ovec, osig), j) if j != ci => rsWith(feat, oc, ovec, osig)
        }
        val rsNc = if (others.nonEmpty) others.max else 0.0
        val ratio = (1 - rsOwn) / (1 - rsNc)
        // `+ 0.0` collapses -0.0 like the other portable oracles
        ClusterAssignment(ci, cols(feat),
          q4(rsOwn) + 0.0, q4(rsNc) + 0.0, q4(ratio) + 0.0)
      }
    }
    rows.toDF("Cluster", "Attribute", "RS_Own", "RS_NC", "RS_Ratio")
  }
}
