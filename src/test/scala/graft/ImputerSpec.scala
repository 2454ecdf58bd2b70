package graft

import graft.operators.{IterativeImputer, KnnImputer, LatentFeatures, QualityChecker}
import org.apache.spark.sql.functions._

/** Iterative (regression) imputation + the full nullColumns treatment
  * dispatcher (ref quality_checker.py:286-547, transformers.py:1677-2019).
  */
class ImputerSpec extends SparkSpec {
  import spark.implicits._

  // y = 3x + 5 with some x,z noise; mask y on a seeded subset
  private def linearFrame(n: Int = 400) = {
    val rnd = new scala.util.Random(7)
    (1 to n).map { i =>
      val x = rnd.nextDouble() * 10
      val z = rnd.nextGaussian() + 5 // non-zero mean: the RMSE/mean metric
      (i.toLong, x, 3 * x + 5 + rnd.nextGaussian() * 0.1, z)
    }.toDF("id", "x", "y", "z")
  }

  test("iterative imputer recovers a linear relationship far better than mean fill") {
    val d = linearFrame()
      .withColumn("y_true", col("y"))
      .withColumn("y", when(col("id") % 5 === 0, lit(null)).otherwise(col("y")))
    val filled = IterativeImputer.imputationIterative(d, Seq("x", "y", "z"))
    assert(filled.filter(col("y").isNull).count() == 0)
    val masked = filled.filter(col("id") % 5 === 0)
    val iterErr = masked.agg(avg(abs(col("y") - col("y_true")))).first().getDouble(0)
    val meanFillErr = masked
      .agg(avg(abs(lit(20.0) - col("y_true")))).first().getDouble(0) // E[y]=3*5+5=20
    assert(iterErr < 1.0, s"iterative imputation error too high: $iterErr")
    assert(iterErr < meanFillErr / 5)
  }

  test("deterministic iterative imputer: partition-invariant, observed cells intact, good fills") {
    val d = linearFrame()
      .withColumn("y_true", col("y"))
      .withColumn("y", when(col("id") % 5 === 0, lit(null)).otherwise(col("y")))
    def run(parts: Int) = IterativeImputer.imputationIterativeDeterministic(
      d.repartition(parts), Seq("x", "y", "z"), sampleKeyCols = Seq("id"),
      scales = Seq(100000L, 10000L, 100000L), sampleSize = 200)
      .select(col("id"), round(col("y"), 6).as("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run(2); val b = run(7)
    assert(a == b, "deterministic imputation must not depend on partitioning")
    val filled = IterativeImputer.imputationIterativeDeterministic(
      d, Seq("x", "y", "z"), sampleKeyCols = Seq("id"),
      scales = Seq(100000L, 10000L, 100000L), sampleSize = 200)
    assert(filled.filter(col("y").isNull).count() == 0)
    // observed cells unchanged
    val obs = filled.filter(col("id") % 5 =!= 0)
      .agg(max(abs(col("y") - col("y_true")))).first().getDouble(0)
    assert(obs == 0.0, s"observed cells changed by $obs")
    val err = filled.filter(col("id") % 5 === 0)
      .agg(avg(abs(col("y") - col("y_true")))).first().getDouble(0)
    assert(err < 1.0, s"deterministic iterative fill error too high: $err")
  }

  test("iterative imputer leaves observed cells unchanged and handles all-null rows") {
    val d = Seq(
      (Some(1.0), Some(2.0)),
      (None: Option[Double], Some(4.0)),
      (None: Option[Double], None: Option[Double])
    ).toDF("a", "b")
    val out = IterativeImputer.imputationIterative(d, Seq("a", "b")).collect()
    assert(out(0).getDouble(0) == 1.0 && out(0).getDouble(1) == 2.0)
    assert(!out(1).isNullAt(0) && !out(2).isNullAt(0) && !out(2).isNullAt(1))
  }

  test("nullColumns dispatcher: regression, MF, auto branches impute every null") {
    val d = linearFrame(120)
      .withColumn("y", when(col("id") % 4 === 0, lit(null)).otherwise(col("y")))
    val reg = QualityChecker.nullColumnsDetection(d, Seq("x", "y", "z"), "regression")
    assert(reg.filter(col("y").isNull).count() == 0)
    val mf = QualityChecker.nullColumnsDetection(
      d, Seq("x", "y", "z"), "MF", idCol = Some("id"))
    assert(mf.filter(col("y").isNull).count() == 0)
    assert(mf.count() == 120)
    val auto = QualityChecker.nullColumnsDetection(
      d, Seq("x", "y", "z"), "auto", idCol = Some("id"))
    assert(auto.filter(col("y").isNull).count() == 0)
    intercept[IllegalArgumentException] {
      QualityChecker.nullColumnsDetection(d, Seq("x", "y"), "MF") // no idCol
    }
  }

  test("auto-imputation with >1 column evaluates the reference's candidate set") {
    val d = linearFrame(300)
    val (best, errs) = LatentFeatures.autoImputation(
      d, Seq("x", "y", "z"), nullPct = 0.15, idCol = Some("id"))
    assert(errs.keySet == Set("mean", "median", "KNN", "regression", "MF"))
    assert(errs.values.forall(v => v >= 0 && !v.isInfinite), s"lost masked rows: $errs")
    // the linear structure makes a model-based candidate win, and
    // regression must far outperform the unconditional mean fill
    assert(Set("regression", "KNN", "MF").contains(best), s"got $best ($errs)")
    assert(errs("regression") < errs("mean") / 2, s"$errs")
  }

  test("quantized Jacobi eigensolver matches Breeze eigSym on a correlated matrix") {
    import breeze.linalg.{eigSym, DenseMatrix => BDM}
    val m = Array(
      Array(1.0, 0.6, -0.3, 0.1),
      Array(0.6, 1.0, 0.2, -0.4),
      Array(-0.3, 0.2, 1.0, 0.5),
      Array(0.1, -0.4, 0.5, 1.0))
    val (ev, vec) = LatentFeatures.jacobiEigSymQuantized(m, sweeps = 8, dp = 9)
    val bm = BDM.tabulate(4, 4)((i, j) => m(i)(j))
    val bev = eigSym(bm).eigenvalues.toArray.sorted.reverse
    val jev = ev.sorted.reverse
    jev.zip(bev).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
    // V diagonalizes: Vᵀ M V ≈ diag(ev)
    for (c <- 0 until 4) {
      val v = Array.tabulate(4)(i => vec(i)(c))
      val mv = Array.tabulate(4)(i => (0 until 4).map(j => m(i)(j) * v(j)).sum)
      val lam = (0 until 4).map(i => v(i) * mv(i)).sum /
        (0 until 4).map(i => v(i) * v(i)).sum
      (0 until 4).foreach(i => assert(math.abs(mv(i) - lam * v(i)) < 1e-5))
    }
  }

  test("portable PCA agrees with the Breeze path on every latent") {
    val d = linearFrame(400).select(col("id"), col("x"), col("y"), col("z"))
    val a = LatentFeatures.pcaLatentFeatures(
      d, Seq("x", "y", "z"), explainedVarianceCutoff = 1.0, keepOriginal = false)
    val b = LatentFeatures.pcaLatentFeaturesPortable(
      d, Seq("x", "y", "z"), explainedVarianceCutoff = 1.0)
    assert(a.columns.count(_.startsWith("latent_")) ==
      b.columns.count(_.startsWith("latent_")))
    val joined = a.as("a").join(b.as("b"), Seq("id"))
    (0 until a.columns.count(_.startsWith("latent_"))).foreach { i =>
      // same sign convention on both paths → direct comparison, no abs
      val maxDiff = joined
        .agg(max(abs(col(s"a.latent_$i") - col(s"b.latent_$i"))))
        .first().getDouble(0)
      assert(maxDiff < 1e-3, s"latent_$i differs by $maxDiff")
    }
  }

  test("deterministic ALS: partition-invariant, keeps observed, predicts factors") {
    import spark.implicits._
    // planted rank-1 structure: rating(u, i) = au(u) * bi(i); mask item 0
    // for every 3rd user and expect predictions near the planted value
    val items = Seq("i0", "i1", "i2")
    val au = (u: Long) => 1.0 + (u % 7) * 0.5
    val bi = Array(2.0, 3.0, 1.5)
    val cells = for {
      u <- 0L until 60L; i <- 0 until 3
      if !(u % 3 == 0 && i == 0)
    } yield (u, i, au(u) * bi(i), 1L)
    val obs = cells.toDF("u", "it", "rsum", "n")
    val out = graft.operators.LatentFeatures
      .alsDeterministic(obs, 3, items, sampleSize = 60, sweeps = 3)
    val byCell = out.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(byCell.size == 60 * 3)
    // observed cells replay their (quantized) value exactly
    assert(math.abs(byCell((1L, "i1")) - au(1) * bi(1)) < 1e-4)
    // masked cells are predicted close to the planted rank-1 value
    val errs = (0L until 60L by 3).map(u => math.abs(byCell((u, "i0")) - au(u) * bi(0)))
    assert(errs.max < 0.15, s"worst masked-cell error ${errs.max}")
    // partition invariance: the fit must not depend on input layout
    val out2 = graft.operators.LatentFeatures
      .alsDeterministic(obs.repartition(7), 3, items, sampleSize = 60, sweeps = 3)
    val byCell2 = out2.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(byCell == byCell2)
  }

  test("deterministic ALS: item with zero observed cells carries its init factor") {
    import spark.implicits._
    // item i2 never observed: it must NOT vanish from the factor map
    // (pre-fix this threw NoSuchElementException in the output loop);
    // its predictions come from the carried-forward init factor
    val items = Seq("i0", "i1", "i2")
    val cells = for {
      u <- 0L until 20L; i <- 0 until 2
    } yield (u, i, 2.0 + i + (u % 5) * 0.25, 1L)
    val obs = cells.toDF("u", "it", "rsum", "n")
    val out = graft.operators.LatentFeatures
      .alsDeterministic(obs, 3, items, sampleSize = 20, sweeps = 3)
    val rows = out.collect()
    assert(rows.length == 20 * 3, "every sampled user x item must emit a row")
    val i2 = rows.filter(_.getString(1) == "i2")
    assert(i2.length == 20)
    assert(i2.forall(r => !r.getDouble(2).isNaN))
  }

  test("deterministic auto-imputation: selection tracks the data's structure") {
    import spark.implicits._
    // strongly linear pair -> regression must win; partition-invariant
    val lin = (1L to 400L).map(i => (i, i.toDouble % 97 + 1,
      3.0 * (i.toDouble % 97 + 1) + (i % 7).toDouble * 0.1)).toDF("id", "x", "y")
    val out = graft.operators.LatentFeatures
      .autoImputationDeterministic(lin, Seq("x", "y"), Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.size == 3 && out.count(_._2._2) == 1)
    assert(out("regression")._2, s"regression must win on a linear pair: $out")
    assert(out("regression")._1 < out("mean")._1)
    val out2 = graft.operators.LatentFeatures
      .autoImputationDeterministic(lin.repartition(7), Seq("x", "y"), Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out == out2, "selection harness must be partition-invariant")
  }
}
