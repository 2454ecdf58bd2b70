package graft

import graft.operators.StatsGenerator
import org.apache.spark.sql.Row

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1.0), Some("x")),
    (Some(2.0), Some("y")),
    (None: Option[Double], Some("x")),
    (Some(0.0), None: Option[String])
  ).toDF("num", "cat")

  private def byAttr(rows: Array[Row]): Map[String, Row] =
    rows.map(r => r.getString(r.fieldIndex("attribute")) -> r).toMap

  test("missingCount counts nulls per column") {
    val m = byAttr(StatsGenerator.missingCount(df, Seq("num", "cat")).collect())
    assert(m("num").getLong(1) == 1 && m("num").getDouble(2) == 0.25)
    assert(m("cat").getLong(1) == 1)
  }

  test("nonzeroCount excludes zeros and nulls") {
    val m = byAttr(StatsGenerator.nonzeroCount(df, Seq("num")).collect())
    assert(m("num").getLong(1) == 2)
  }

  test("mode picks most frequent with deterministic tie-break") {
    val m = byAttr(StatsGenerator.modeComputation(df, Seq("cat")).collect())
    assert(m("cat").getString(1) == "x")
    assert(m("cat").getLong(2) == 2)
    // tie-break: smaller value wins
    val tied = Seq("b", "a", "a", "b").toDF("c")
    val t = StatsGenerator.modeComputation(tied, Seq("c")).collect()(0)
    assert(t.getString(1) == "a")
  }

  test("uniqueCount exact and cardinality IDness") {
    val m = byAttr(StatsGenerator.uniqueCount(df, Seq("num", "cat")).collect())
    assert(m("num").getLong(1) == 3)
    assert(m("cat").getLong(1) == 2)
    val card = byAttr(StatsGenerator.measuresOfCardinality(df, Seq("cat")).collect())
    assert(card("cat").getDouble(2) == 0.6667) // 2 uniques / 3 non-null, round 4
  }

  test("centralTendency mean + exact median") {
    val m = byAttr(StatsGenerator.centralTendency(df, Seq("num")).collect())
    assert(m("num").getDouble(1) == 1.0) // (1+2+0)/3
    assert(m("num").getDouble(2) == 1.0) // median of {0,1,2}
  }

  test("percentiles are exact order statistics") {
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val r = StatsGenerator.measuresOfPercentiles(d, Seq("x")).collect()(0)
    assert(r.getDouble(r.fieldIndex("min")) == 1.0)
    assert(r.getDouble(r.fieldIndex("pct_50")) == 50.5)
    assert(r.getDouble(r.fieldIndex("max")) == 100.0)
  }

  test("globalSummary reports row and role counts") {
    val g = StatsGenerator.globalSummary(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(g("rows_count") == "4" && g("numcols_count") == "1" && g("catcols_count") == "1")
  }
}
