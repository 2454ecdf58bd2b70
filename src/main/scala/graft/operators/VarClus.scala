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
}
