package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("drift of a distribution against itself is zero") {
    val d = (1 to 500).map(_.toDouble).toDF("x")
    val r = Drift.driftStatistics(d, d, Seq("x")).collect()(0)
    assert(r.getDouble(r.fieldIndex("PSI")) == 0.0)
    assert(r.getDouble(r.fieldIndex("HD")) == 0.0)
    assert(r.getDouble(r.fieldIndex("JSD")) == 0.0)
    assert(r.getDouble(r.fieldIndex("KS")) == 0.0)
    assert(r.getInt(r.fieldIndex("flagged")) == 0)
  }

  test("shifted distribution is flagged") {
    val src = (1 to 500).map(_.toDouble).toDF("x")
    val tgt = (1 to 500).map(i => i.toDouble + 400).toDF("x")
    val r = Drift.driftStatistics(src, tgt, Seq("x")).collect()(0)
    assert(r.getDouble(r.fieldIndex("PSI")) > 0.1)
    assert(r.getInt(r.fieldIndex("flagged")) == 1)
    assert(r.getDouble(r.fieldIndex("KS")) > 0.5)
  }

  test("drift against a persisted source histogram matches the direct path") {
    import graft.operators.ModelStore
    val src = (1 to 500).map(_.toDouble).toDF("x")
    val tgt = (1 to 500).map(i => i.toDouble + 100).toDF("x")
    val direct = Drift.driftStatistics(src, tgt, Seq("x")).collect()(0)
    val dir = java.nio.file.Files.createTempDirectory("drift_model").toString
    ModelStore.saveDriftSource(spark, src, Seq("x"), binCount = 10, dir)
    val saved = ModelStore.driftAgainstSavedSource(spark, tgt, dir).collect()(0)
    Seq("PSI", "HD", "JSD", "KS").foreach { m =>
      assert(saved.getDouble(saved.fieldIndex(m)) == direct.getDouble(direct.fieldIndex(m)), m)
    }
  }

  test("binning / bounds / encoding model save-load round-trips") {
    import graft.operators.{ModelStore, QualityChecker, Transformers}
    val dir = java.nio.file.Files.createTempDirectory("models").toString
    val cuts = Map("a" -> Seq(1.0, 2.0, 3.0), "b" -> Seq(10.0))
    ModelStore.saveBinning(spark, cuts, s"$dir/bins")
    assert(ModelStore.loadBinning(spark, s"$dir/bins") == cuts)

    val bounds = Seq(QualityChecker.OutlierBounds("x", -1.5, 99.5))
    ModelStore.saveOutlierBounds(spark, bounds, s"$dir/bounds")
    assert(ModelStore.loadOutlierBounds(spark, s"$dir/bounds") == bounds)

    val enc = Seq(("a", 0), ("b", 1)).toDF("cat", "cat_index")
    ModelStore.saveModelTable(enc, s"$dir/enc")
    val applied = ModelStore.applyEncodingModel(
      Seq("a", "b", "a").toDF("cat"),
      ModelStore.loadModelTable(spark, s"$dir/enc"), "cat")
    assert(applied.agg(org.apache.spark.sql.functions.sum("cat_index"))
      .first().getLong(0) == 1L)
  }

  test("identical periods give maximum stability index") {
    val p = (1 to 300).map(i => math.sin(i.toDouble) * 10 + 50).toDF("v")
    val r = Drift.stabilityIndex(Seq(p, p, p), Seq("v")).collect()(0)
    assert(r.getDouble(r.fieldIndex("stability_index")) == 4.0)
  }

  test("wildly different periods score low") {
    val p1 = (1 to 300).map(_.toDouble).toDF("v")
    val p2 = (1 to 300).map(i => i * 100.0).toDF("v")
    val p3 = (1 to 300).map(i => -i * 50.0).toDF("v")
    val r = Drift.stabilityIndex(Seq(p1, p2, p3), Seq("v")).collect()(0)
    assert(r.getDouble(r.fieldIndex("stability_index")) < 2.0)
  }
}
