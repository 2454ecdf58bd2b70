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
}
