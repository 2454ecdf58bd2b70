package graft

import graft.operators.Transformers
import org.apache.spark.sql.functions._

class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("equal-range binning partitions the domain") {
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val binned = Transformers.attributeBinning(d, Seq("x"), "equal_range", 4)
    val counts = binned.groupBy("x_binned").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4))
    assert(counts.values.sum == 100)
    // nulls stay null
    val withNull = Seq(Some(1.0), None).toDF("x")
    val nb = Transformers.attributeBinning(withNull, Seq("x"), "equal_range", 2)
    assert(nb.filter(col("x").isNull && col("x_binned").isNull).count() == 1)
  }

  test("equal-frequency binning balances counts") {
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val binned = Transformers.attributeBinning(d, Seq("x"), "equal_frequency", 4)
    val counts = binned.groupBy("x_binned").count().collect().map(_.getLong(1))
    assert(counts.forall(c => c >= 24 && c <= 26))
  }

  test("z-standardization and min-max normalization") {
    val d = Seq(0.0, 5.0, 10.0).toDF("x")
    val z = Transformers.zStandardization(d, Seq("x")).collect().map(_.getDouble(0)).sorted
    assert(z(1) == 0.0 && z(0) == -z(2))
    val n = Transformers.normalization(d, Seq("x")).collect().map(_.getDouble(0)).sorted
    assert(n.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("constant column is skipped by scalers") {
    val d = Seq(3.0, 3.0).toDF("x")
    assert(Transformers.zStandardization(d, Seq("x")).collect().map(_.getDouble(0)).toSeq == Seq(3.0, 3.0))
    assert(Transformers.normalization(d, Seq("x")).collect().map(_.getDouble(0)).toSeq == Seq(3.0, 3.0))
  }

  test("label encoding orders by frequency then value") {
    val d = Seq("b", "b", "a", "c", "c").toDF("cat")
    val enc = Transformers.labelEncoding(d, Seq("cat")).select("cat", "cat_index")
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc == Map("b" -> 0, "c" -> 1, "a" -> 2))
  }

  test("target encoding emits event rates") {
    val d = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 1)).toDF("cat", "y")
    val enc = Transformers.targetEncoding(d, Seq("cat"), col("y") === 1)
      .select("cat", "cat_encoded").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(enc == Map("a" -> 0.5, "b" -> 1.0))
  }

  test("cat_to_num dispatcher routes to the right encoder") {
    val d = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 1)).toDF("cat", "y")
    // label column present → supervised target encoding
    val sup = Transformers.catToNumTransformer(d, Seq("cat"), labelCol = Some("y"))
      .select("cat", "cat_encoded").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sup == Map("a" -> 0.5, "b" -> 1.0))
    // a DOUBLE label must still match the Int eventLabel (native compare,
    // not string casts where "1.0" != "1")
    val dd = Seq(("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 1.0)).toDF("cat", "y")
    val supD = Transformers.catToNumTransformer(dd, Seq("cat"), labelCol = Some("y"))
      .select("cat", "cat_encoded").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(supD == Map("a" -> 0.5, "b" -> 1.0), s"double label mis-encoded: $supD")
    // no label → unsupervised per the encoding switch
    val lab = Transformers.catToNumTransformer(d, Seq("cat"))
    assert(lab.columns.contains("cat_index"))
    val oh = Transformers.catToNumTransformer(d, Seq("cat"), encoding = "onehot_encoding")
    assert(oh.columns.contains("cat_a") && oh.columns.contains("cat_b"))
    intercept[IllegalArgumentException] {
      Transformers.catToNumTransformer(d, Seq("cat"), encoding = "nope")
    }
  }

  test("one-hot encoding emits 0/1 columns per category") {
    val d = Seq("a", "b", "a").toDF("cat")
    val oh = Transformers.oneHotEncoding(d, Seq("cat"))
    assert(oh.columns.toSet == Set("cat", "cat_a", "cat_b"))
    assert(oh.agg(sum(col("cat_a")), sum(col("cat_b"))).first().toSeq == Seq(2, 1))
  }

  test("outlier categories keeps top-k, relabels the rest") {
    val d = Seq("x", "x", "x", "y", "y", "z", "w").toDF("cat")
    val out = Transformers.outlierCategories(d, Seq("cat"), maxCategories = 3)
      .groupBy("cat").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 3L, "y" -> 2L, "outlier_categories" -> 2L))
  }

  test("outlier categories coverage threshold trims the keep list") {
    val d = (Seq.fill(70)("x") ++ Seq.fill(20)("y") ++ Seq.fill(10)("z")).toDF("cat")
    // x alone covers 0.70 >= 0.5 → only x kept despite maxCategories room
    val out = Transformers.outlierCategories(d, Seq("cat"), maxCategories = 5, coverage = 0.5)
      .groupBy("cat").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 70L, "outlier_categories" -> 30L))
  }

  test("golden parity: reference label-encoding index ranges on the income fixture") {
    // ref: test_transformers.py test_cat_to_num_unsupervised_with_label_encoding
    // — frequencyDesc indices span 0..k-1: workclass 0..8,
    // marital-status 0..6, relationship 0..7.
    val fixture = "/root/reference/data/test_dataset/" +
      "part-00001-3eb0f7bb-05c2-46ec-8913-23ba231d2734-c000.snappy.parquet"
    assume(new java.io.File(fixture).exists())
    val d = spark.read.parquet(fixture)
    val enc = Transformers.labelEncoding(d, Seq("workclass", "relationship", "marital-status"))
    val r = enc.agg(
      min(col("workclass_index")), max(col("workclass_index")),
      min(col("marital-status_index")), max(col("marital-status_index")),
      min(col("relationship_index")), max(col("relationship_index"))).first()
    assert(r.getInt(0) == 0 && r.getInt(1) == 8)
    assert(r.getInt(2) == 0 && r.getInt(3) == 6)
    assert(r.getInt(4) == 0 && r.getInt(5) == 7)
    // null categories keep null indices
    assert(enc.filter(col("workclass").isNull && col("workclass_index").isNotNull).count() == 0)
  }

  test("imputation MMM fills numeric median and categorical mode; leaves non-nulls") {
    val d = Seq(
      (Some(1.0), Some("a")),
      (Some(3.0), Some("a")),
      (None: Option[Double], None: Option[String])
    ).toDF("num", "cat")
    val out = Transformers.imputationMMM(d, Seq("num"), Seq("cat")).collect()
    assert(out.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    assert(out.map(_.getDouble(0)).sum == 6.0) // filled with median 2.0
    assert(out.count(_.getString(1) == "a") == 3)
  }

  test("boxcox picks the skew-minimizing lambda") {
    val d = (1 to 200).map(i => math.exp(i / 40.0)).toDF("x")
    val (_, lambdas) = Transformers.boxcoxTransformation(d, Seq("x"))
    assert(lambdas("x") == 0.0) // log-normal-ish → ln
  }

  test("boxcox fit is a reusable model: memo across projections, precomputed skips fit") {
    graft.operators.ModelStore.boxcoxFitMemo.clear()
    val base = (1 to 300).map(i => (i.toLong, math.exp(i / 60.0), i * 2.0))
      .toDF("id", "x", "y")
    val (_, l1) = Transformers.boxcoxTransformation(base.select("x"), Seq("x"))
    assert(graft.operators.ModelStore.boxcoxFitMemo.size == 1)
    // same source, wider projection: column pruning canonicalizes the fit
    // aggregate to the same plan → memo hit, no second sweep entry
    val (_, l2) = Transformers.boxcoxTransformation(base.select("id", "x"), Seq("x"))
    assert(l2 == l1)
    assert(graft.operators.ModelStore.boxcoxFitMemo.size == 1,
      "differently-projected fit over the same source must reuse the memoized fit")
    // explicit model path: precomputed λ skips the fit entirely
    val (out, l3) = Transformers.boxcoxTransformation(
      base.select("x"), Seq("x"), precomputed = Some(Map("x" -> 2.0)))
    assert(l3 == Map("x" -> 2.0))
    val first = out.orderBy("x").first().getDouble(0)
    assert(math.abs(first - math.pow(math.exp(1 / 60.0), 2.0)) < 1e-12)
    graft.operators.ModelStore.boxcoxFitMemo.clear()
  }

  test("expressionParser evaluates SQL features") {
    val d = Seq((2, 3)).toDF("a", "b")
    val r = Transformers.expressionParser(d, Seq("a + b", "a * b")).collect()(0)
    assert(r.getInt(r.fieldIndex("f0")) == 5 && r.getInt(r.fieldIndex("f1")) == 6)
  }

  test("feature transformations match math") {
    val d = Seq(4.0).toDF("x")
    def t(m: String) = d.select(Transformers.featureTransformation(col("x"), m)).first().getDouble(0)
    assert(t("sqrt") == 2.0 && t("sq") == 16.0 && t("ln") == math.log(4.0))
  }

  test("labelEncoding survives ID-like cardinality with no single-partition exchange") {
    val d = (0 until 5000).map(i => f"id_$i%05d").toDF("k")
    val enc = Transformers.labelEncoding(d, Seq("k"), order = "alphabetAsc",
      maxBroadcastCategories = 100) // force the shuffle-join path
    // alphabetical order over zero-padded ids == numeric order → index i
    val rows = enc.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("id_00000") == 0 && rows("id_00123") == 123 && rows("id_04999") == 4999)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition exchange in:\n$plan")
  }

  test("all-null columns pass through scaling/binning fits untouched") {
    val d = Seq((1.0, None: Option[Double]), (2.0, None), (3.0, None)).toDF("x", "y")
    assert(Transformers.zStandardization(d, Seq("x", "y"))
      .filter(col("y").isNull).count() == 3)
    assert(Transformers.normalization(d, Seq("x", "y"))
      .filter(col("y").isNull).count() == 3)
    assert(Transformers.iqrStandardization(d, Seq("x", "y"))
      .filter(col("y").isNull).count() == 3)
    val binned = Transformers.attributeBinning(d, Seq("x", "y"), "equal_range", 2)
    assert(binned.columns.contains("x_binned") && !binned.columns.contains("y_binned"))
  }

  test("quantile transform: ECDF bounds, monotonicity, null passthrough") {
    val d = ((1 to 200).map(i => Some(i.toDouble)) ++ Seq(None))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val out = Transformers.quantileTransform(d, Seq("x"), nQuantiles = 11)
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(200L).isEmpty)                    // null passes through
    assert(out(0L).contains(0.0))                // min maps to 0
    assert(out(199L).contains(1.0))              // max maps to 1
    // uniform data → ECDF ≈ identity on [0,1]; and strictly monotone
    val vals = (0 until 200).map(i => out(i.toLong).get)
    assert(vals.sliding(2).forall(p => p(0) <= p(1)))
    val mid = out(99L).get                       // value 100 of 1..200
    assert(math.abs(mid - 99.0 / 199.0) < 0.02, s"mid $mid")
  }
}
