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
