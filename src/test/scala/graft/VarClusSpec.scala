package graft

import breeze.linalg.{DenseMatrix => BDM}
import graft.functions.FeatureRecommender
import graft.operators.{KnnImputer, VarClus}
import org.apache.spark.sql.functions._

class VarClusSpec extends SparkSpec {
  import spark.implicits._

  private def blockData = {
    val rnd = new scala.util.Random(5)
    (1 to 400).map { _ =>
      val f1 = rnd.nextGaussian(); val f2 = rnd.nextGaussian()
      (f1 + 0.05 * rnd.nextGaussian(), f1 * 2 + 0.05 * rnd.nextGaussian(),
        -f1 + 0.05 * rnd.nextGaussian(),
        f2 + 0.05 * rnd.nextGaussian(), f2 * 3 + 0.05 * rnd.nextGaussian())
    }.toDF("a1", "a2", "a3", "b1", "b2")
  }

  test("variable clustering separates correlated blocks") {
    val out = VarClus.variableClustering(blockData, Seq("a1", "a2", "a3", "b1", "b2"))
    val assign = out.collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    assert(assign("a1") == assign("a2") && assign("a2") == assign("a3"))
    assert(assign("b1") == assign("b2"))
    assert(assign("a1") != assign("b1"))
    val rsRatios = out.collect().map(_.getDouble(4))
    assert(rsRatios.forall(r => r >= 0 && r < 0.2)) // tight clusters → low ratio
  }

  test("portable variable clustering agrees with the Breeze path on block data") {
    val cols = Seq("a1", "a2", "a3", "b1", "b2")
    val d = blockData
    val breeze = VarClus.variableClustering(d, cols).collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    val port = VarClus.variableClusteringPortable(d, cols).collect()
      .map(r => r.getString(1) -> r.getInt(0)).toMap
    // same partition of the variables (cluster ids may be permuted only
    // if split order differed; on this fixture they should be identical)
    cols.combinations(2).foreach { case Seq(x, y) =>
      assert((breeze(x) == breeze(y)) == (port(x) == port(y)),
        s"portable/Breeze disagree on whether $x and $y share a cluster")
    }
    // portable RS values land on the 4dp grid and ratios stay tight
    val rs = VarClus.variableClusteringPortable(d, cols).collect()
    rs.foreach { r =>
      val ratio = r.getDouble(4)
      assert(ratio >= 0 && ratio < 0.2, s"portable RS_Ratio out of band: $ratio")
      assert(ratio == math.rint(ratio * 10000) / 10000, "RS_Ratio not on the 4dp grid")
    }
  }

  test("quartimax rotation preserves orthogonality and concentrates loadings") {
    val loadings = BDM((0.7, 0.7), (0.7, -0.7), (0.6, 0.65))
    val rot = VarClus.quartimax2(loadings)
    // column norms preserved under rotation
    val pre = (0 until 3).map(i => loadings(i, 0) * loadings(i, 0) + loadings(i, 1) * loadings(i, 1))
    val post = (0 until 3).map(i => rot(i, 0) * rot(i, 0) + rot(i, 1) * rot(i, 1))
    pre.zip(post).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // quartimax criterion did not decrease
    def q(m: BDM[Double]) = (0 until m.rows).map(i =>
      math.pow(m(i, 0), 4) + math.pow(m(i, 1), 4)).sum
    assert(q(rot) >= q(loadings) - 1e-9)
  }

  test("KNN imputation fills nulls from close neighbours") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map { _ =>
      val x = rnd.nextDouble() * 10
      (x, 2 * x + rnd.nextGaussian() * 0.1, 3 * x + rnd.nextGaussian() * 0.1)
    }
    val d = rows.toDF("x", "y", "z")
      .withColumn("y", when(rand(1) < 0.1, lit(null)).otherwise(col("y")))
    val filled = KnnImputer.imputationKnn(d, Seq("x", "y", "z"), k = 5)
    assert(filled.filter(col("y").isNull).count() == 0)
    val err = filled.agg(avg(abs(col("y") - col("x") * 2))).first().getDouble(0)
    assert(err < 0.5, s"KNN fill error too high: $err")
  }

  test("golden parity: reference IV values on the income fixture") {
    // ref: src/test/anovos/data_analyzer/test_association_evaluator.py:25-68
    // — IV of the categorical attributes (binning-free path) on the
    // reference's own income test dataset: relationship 1.6208,
    // marital-status 1.3929 (round 4).
    val fixture = "/root/reference/data/test_dataset/" +
      "part-00000-3eb0f7bb-05c2-46ec-8913-23ba231d2734-c000.snappy.parquet"
    assume(new java.io.File(fixture).exists())
    val df = spark.read.parquet(fixture)
    val iv = graft.operators.Association
      .ivCalculation(df, Seq("relationship", "marital-status"),
        org.apache.spark.sql.functions.col("income") === ">50K")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(iv("relationship") == 1.6208)
    assert(iv("marital-status") == 1.3929)
    // IG goldens from the same reference test (test_IG_calculation):
    // relationship 0.1702, marital-status 0.1608
    val ig = graft.operators.Association
      .igCalculation(df, Seq("relationship", "marital-status"),
        org.apache.spark.sql.functions.col("income") === ">50K")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ig("relationship") == 0.1702)
    assert(ig("marital-status") == 0.1608)
  }

  test("feature recommender ranks by TF-IDF cosine") {
    val corpus = Seq(
      (1L, "customer_age", "age of the customer in years demographic"),
      (2L, "txn_amount", "transaction amount in dollars payment value"),
      (3L, "days_since_login", "days elapsed since the last customer login session")
    ).toDF("id", "name", "description")
    val top = FeatureRecommender.search(corpus, "id", "name", "description",
      "transaction payment dollars", topK = 2).collect()
    assert(top.head.getString(1) == "txn_amount")
    assert(top.head.getDouble(2) > 0.3)
  }

  test("facet explorer: listing, fuzzy resolution, capped feature lists") {
    val corpus = Seq(
      ("f1", "telecom", "customer churn prediction"),
      ("f2", "telecom", "revenue forecasting"),
      ("f3", "banking", "customer churn prediction"),
      ("f4", "banking", "fraud detection")
    ).toDF("name", "industry", "usecase")
    // facet listings: distinct values / pairs in deterministic order
    val inds = FeatureRecommender.listFacets(corpus, Seq("industry"))
      .collect().map(_.getString(0)).toSeq
    assert(inds == Seq("banking", "telecom"))
    assert(FeatureRecommender.listFacets(corpus, Seq("industry", "usecase")).count() == 4)
    // exact (normalized) input resolves to itself, punctuation included
    assert(FeatureRecommender.processFacet(corpus, "industry", "  TELECOM ") == "telecom")
    assert(FeatureRecommender.processFacet(corpus, "industry", "telecom!") == "telecom")
    assert(FeatureRecommender.processFacet(corpus, "usecase", "fraud--detection",
      semantic = false) == "fraud detection")
    // a misspelling resolves to the nearest existing facet value
    assert(FeatureRecommender.processFacet(corpus, "industry", "bankin") == "banking")
    // non-semantic mode passes the normalized input through untouched
    assert(FeatureRecommender.processFacet(corpus, "industry", "bankin", semantic = false) == "bankin")
    val feats = FeatureRecommender.listFeaturesByFacet(
      corpus, "industry", "name", "telecoms", numFeat = 1)
      .collect().map(_.getString(0)).toSeq
    assert(feats == Seq("f1"), s"fuzzy facet + cap must yield f1, got $feats")
  }
}
