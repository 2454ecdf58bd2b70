package graft.operators

import graft.core.{ColumnRole, NumExpr, Reshape}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Descriptive statistics (ref: data_analyzer/stats_generator.py).
  *
  * Design: the reference loops per column launching one Spark job each
  * (e.g. measures_of_centralTendency stats_generator.py:485-494 — an
  * anti-pattern per SURVEY.md §4). Here every measure is ONE distributed
  * `agg` over all requested columns (a single scan + partial/final
  * aggregation, no shuffle beyond the scalar agg), reshaped in-plan to the
  * canonical long `[attribute, …]` metrics table via `stack`. Driver state
  * is O(#columns).
  */
object StatsGenerator {

  /** Reshape a 1-row aggregate frame with columns `<metric>__<col>` into
    * long form (attribute, metric1, metric2, …) — stays in the plan, no
    * collect.
    */
  private def longForm(agg1: DataFrame, cols: Seq[String], metrics: Seq[String]): DataFrame = {
    val stackArgs = cols
      .map(c => s"'$c', " + metrics.map(m => s"`${m}__$c`").mkString(", "))
      .mkString(", ")
    val outCols = (Seq("attribute") ++ metrics).map(m => s"`$m`").mkString(", ")
    agg1.select(expr(s"stack(${cols.size}, $stackArgs) as ($outCols)"))
  }

  private def agg1(df: DataFrame, exprs: Seq[Column]): DataFrame =
    df.agg(exprs.head, exprs.tail: _*)

  /** Wide-table guard: hundreds of columns × several aggregates per
    * column can exceed codegen limits (whole-stage codegen falls back or
    * the generated method blows the JVM's 64KB limit). Above
    * `chunkCols` columns, compute chunk-wise and union the long-form
    * results — each chunk stays a single codegen-friendly scan.
    */
  def chunked(cols: Seq[String], chunkCols: Int = 60)(run: Seq[String] => DataFrame): DataFrame =
    if (cols.size <= chunkCols) run(cols)
    else cols.grouped(chunkCols).map(run).reduce(_ unionByName _)

  /** ref: stats_generator.py:33-113 `global_summary` →
    * [metric, value] with row/column counts and per-role column counts.
    */
  def globalSummary(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val (num, cat, other) = ColumnRole.segregate(df.schema)
    val rows = df.count()
    Seq(
      ("rows_count", rows.toString),
      ("columns_count", df.columns.length.toString),
      ("numcols_count", num.size.toString),
      ("catcols_count", cat.size.toString),
      ("othercols_count", other.size.toString)
    ).toDF("metric", "value")
  }

  /** ref: stats_generator.py:116-176 `missingCount_computation` —
    * one pass of count() per column (the reference used summary("count") +
    * transpose).  pct rounded 4.
    */
  def missingCount(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    val exprs = cs.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).cast(LongType).as(s"missing_count__$c"),
        round((count(lit(1)) - count(col(c))) * lit(1.0) / count(lit(1)), 4)
          .as(s"missing_pct__$c"))
    }
    longForm(agg1(df, exprs), cs, Seq("missing_count", "missing_pct"))
  }

  /** Nonzero predicate only applies to numeric columns (matching the
    * reference, which restricts nonzeroCount to numericals) — comparing
    * a string column to 0 would throw under ANSI.
    */
  private def nonzeroExpr(df: DataFrame, c: String): Column =
    if (ColumnRole.of(df.schema(c).dataType) == ColumnRole.Numerical)
      count(when(col(c).isNotNull && col(c) =!= 0, 1)).cast(LongType)
    else lit(null).cast(LongType)

  /** ref: stats_generator.py:179-248 `nonzeroCount_computation` — the
    * reference round-trips through mllib colStats; ours is pure SQL in the
    * same single agg.
    */
  def nonzeroCount(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    val exprs = cs.flatMap { c =>
      val nz = nonzeroExpr(df, c)
      Seq(
        nz.as(s"nonzero_count__$c"),
        round(nz * lit(1.0) / count(lit(1)), 4).as(s"nonzero_pct__$c"))
    }
    longForm(agg1(df, exprs), cs, Seq("nonzero_count", "nonzero_pct"))
  }

  /** ref: stats_generator.py:251-325 `measures_of_counts` — fill +
    * missing + nonzero in one agg (the reference composes three jobs and a
    * full_outer join).
    */
  def measuresOfCounts(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    val exprs = cs.flatMap { c =>
      val fill = count(col(c)).cast(LongType)
      val miss = (count(lit(1)) - count(col(c))).cast(LongType)
      val nz = nonzeroExpr(df, c)
      Seq(
        fill.as(s"fill_count__$c"),
        round(fill * lit(1.0) / count(lit(1)), 4).as(s"fill_pct__$c"),
        miss.as(s"missing_count__$c"),
        round(miss * lit(1.0) / count(lit(1)), 4).as(s"missing_pct__$c"),
        nz.as(s"nonzero_count__$c"),
        round(nz * lit(1.0) / count(lit(1)), 4).as(s"nonzero_pct__$c"))
    }
    longForm(agg1(df, exprs), cs,
      Seq("fill_count", "fill_pct", "missing_count", "missing_pct", "nonzero_count", "nonzero_pct"))
  }

  /** ref: stats_generator.py:328-421 `mode_computation`, but batched: the
    * reference runs groupBy(c).count().orderBy.limit(1) per column (N
    * jobs); ours melts all columns and resolves every mode in a single
    * shuffle + window. Ties break on the smaller value (deterministic,
    * where the reference picks arbitrarily).
    * Output: [attribute, mode, mode_count, mode_pct].
    */
  def modeComputation(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    modeChunk(df, cs)
  }

  private def modeChunk(df: DataFrame, cols: Seq[String]): DataFrame = {
    val long = Reshape.melt(df, Nil, cols).filter(col("value").isNotNull)
    val counts = long.groupBy("attribute", "value").agg(count(lit(1)).as("mode_count"))
    // top-1 and the non-null total in ONE partially-aggregatable pass:
    // min(struct(-count, value)) == (count desc, value asc) argmin — same
    // tie-break as the previous rank window, but with map-side combine
    // and no per-attribute sort (continuous columns leave ~n_rows count
    // rows per attribute; a window partitioned on ~10 attributes funneled
    // them all through a handful of sorting partitions)
    counts
      .groupBy("attribute")
      .agg(
        min(struct((-col("mode_count")).as("nc"), col("value").as("v"))).as("m"),
        sum(col("mode_count")).as("__nonnull"))
      .select(
        col("attribute"),
        col("m.v").as("mode"),
        (-col("m.nc")).as("mode_count"),
        round((-col("m.nc")) * lit(1.0) / col("__nonnull"), 4).as("mode_pct"))
  }

  /** ref: stats_generator.py:424-526 `measures_of_centralTendency` —
    * full reference schema [attribute, mean, median, mode, mode_rows,
    * mode_pct]: mean (exact-decimal-sum) + exact median in one agg,
    * joined with the single-shuffle melt-based mode computation.
    */
  def centralTendency(df: DataFrame, cols: Seq[String]): DataFrame = {
    val meanMedian = chunked(cols) { cs =>
      val exprs = cs.flatMap { c =>
        Seq(
          NumExpr.dmean(col(c)).as(s"mean__$c"),
          NumExpr.pct(col(c), 0.5).as(s"median__$c"))
      }
      longForm(agg1(df, exprs), cs, Seq("mean", "median"))
    }
    val modes = modeComputation(df, cols)
      .withColumnRenamed("mode_count", "mode_rows")
    meanMedian.join(modes, Seq("attribute"), "full_outer")
      .select(col("attribute"), col("mean"), col("median"),
        col("mode"), col("mode_rows"), col("mode_pct"))
  }

  /** ref: stats_generator.py:529-620 `uniqueCount_computation`.
    * exact = countDistinct; approx = HLL++ `approx_count_distinct(rsd)` —
    * the 100 TB path.
    */
  def uniqueCount(df: DataFrame, cols: Seq[String], approx: Boolean = false, rsd: Double = 0.05): DataFrame =
    chunked(cols) { cs =>
      val exprs = cs.map { c =>
        val u = if (approx) approx_count_distinct(col(c), rsd) else countDistinct(col(c))
        u.cast(LongType).as(s"unique_values__$c")
      }
      longForm(agg1(df, exprs), cs, Seq("unique_values"))
    }

  /** ref: stats_generator.py:623-733 `measures_of_cardinality` — uniques +
    * IDness = unique/non-null, one agg.
    */
  def measuresOfCardinality(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame =
    chunked(cols) { cs =>
      val exprs = cs.flatMap { c =>
        val u = (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))).cast(LongType)
        Seq(
          u.as(s"unique_values__$c"),
          round(u * lit(1.0) / count(col(c)), 4).as(s"IDness__$c"))
      }
      longForm(agg1(df, exprs), cs, Seq("unique_values", "IDness"))
    }

  /** ref: stats_generator.py:736-829 `measures_of_dispersion`: stddev,
    * variance, cov (=sd/mean), IQR (exact), range. Single agg; the two
    * quartiles share one percentile buffer.
    */
  def measuresOfDispersion(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    val exprs = cs.flatMap { c =>
      val sd = stddev_samp(col(c))
      Seq(
        round(sd, 4).as(s"stddev__$c"),
        round(var_samp(col(c)), 4).as(s"variance__$c"),
        round(sd / NumExpr.dmean(col(c)), 4).as(s"cov__$c"),
        NumExpr.pcts(col(c), Seq(0.25, 0.75)).as(s"q__$c"),
        (max(col(c)) - min(col(c))).cast(DoubleType).as(s"range__$c"))
    }
    val extracted = agg1(df, exprs).select(
      cs.flatMap { c =>
        Seq(col(s"stddev__$c"), col(s"variance__$c"), col(s"cov__$c"),
          round(element_at(col(s"q__$c"), 2) - element_at(col(s"q__$c"), 1), 4).as(s"IQR__$c"),
          col(s"range__$c"))
      }: _*)
    longForm(extracted, cs, Seq("stddev", "variance", "cov", "IQR", "range"))
  }

  val percentilePoints: Seq[Double] = Seq(0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99)

  /** Exact multi-point percentiles for several columns in ONE shared
    * declarative plan: melt → groupBy-count the DISTINCT values
    * (map-side combine collapses duplicates before the shuffle) →
    * per-column cumulative counts over a value-ordered window → read the
    * ≤ 2·|ps| bracket rows per column with a broadcast position join →
    * quantile_cont interpolation at p·(n−1).
    *
    * This replaces Spark's `percentile` aggregate for the exact path:
    * that aggregate carries a boxed value→count OpenHashMap per column
    * through partial/final aggregation, which degenerates on
    * near-unique columns (a single ~600 k-distinct double column cost
    * more than the rest of the stats suite combined). Here every stage
    * is a standard shuffle; the window's one-task-per-column is bounded
    * by the column's DISTINCT count, not its row count, and columns run
    * in parallel. Returns [attribute, n, vmin, vmax, qs(array ordered
    * like ps)]; columns with no non-null values get n=0 and null stats.
    */
  def exactPercentiles(df: DataFrame, cols: Seq[String], ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(DoubleType).as("v"))): _*)).as("s"))
      .select(col("s.c").as("c"), col("s.v").as("v"))
      .filter(col("v").isNotNull)
    val vc = melted.groupBy("c", "v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c").orderBy("v")
    val cum = vc
      .withColumn("hi", sum(col("cnt")).over(w))
      .withColumn("lo", col("hi") - col("cnt"))
    val pos = vc.groupBy("c")
      .agg(sum(col("cnt")).as("n"), min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .select(col("c"), col("n"), col("vmin"), col("vmax"),
        posexplode(array(ps.map(lit): _*)).as(Seq("pi", "p")))
      .withColumn("pos", col("p") * (col("n") - 1))
      .withColumn("i_lo", floor(col("pos")).cast(LongType))
      .withColumn("i_hi", ceil(col("pos")).cast(LongType))
    // one pass over the cumulative frame: each (column, point) keeps the
    // 1-2 rows bracketing its lower/upper sorted index
    val brackets = cum.join(broadcast(pos), Seq("c"))
      .where((col("i_lo") >= col("lo") && col("i_lo") < col("hi")) ||
        (col("i_hi") >= col("lo") && col("i_hi") < col("hi")))
      .groupBy(col("c"), col("pi"))
      .agg(
        first(col("pos")).as("pos"),
        first(col("n")).as("n"), first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"),
        max(when(col("i_lo") >= col("lo") && col("i_lo") < col("hi"), col("v"))).as("v_lo"),
        max(when(col("i_hi") >= col("lo") && col("i_hi") < col("hi"), col("v"))).as("v_hi"))
      .withColumn("q",
        col("v_lo") + (col("pos") - floor(col("pos"))) * (col("v_hi") - col("v_lo")))
    val perCol = brackets.groupBy(col("c").as("attribute"))
      .agg(first(col("n")).as("n"), first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"),
        transform(array_sort(collect_list(struct(col("pi"), col("q")))),
          x => x.getField("q")).as("qs"))
    // all-null / empty columns fall out of the melt — reinstate with null stats
    val names = spark.createDataFrame(cols.map(Tuple1(_))).toDF("attribute")
    names.join(perCol, Seq("attribute"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** ref: stats_generator.py:832-916 `measures_of_percentiles` — min, the
    * 9 canonical percentiles (exact, linear interpolation), max. Exact
    * path: the shared melt plan of [[exactPercentiles]] (scales to
    * near-unique columns); at 100 TB swap in `percentile_approx` via
    * `approx` (one agg, one sketch buffer per column).
    */
  def measuresOfPercentiles(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    val names = percentilePoints.map(q => f"pct_${(q * 100).toInt}%d")
    if (!approx) {
      val ep = exactPercentiles(df, cols, percentilePoints)
      ep.select(
        Seq(col("attribute"), col("vmin").as("min")) ++
          names.zipWithIndex.map { case (n, i) =>
            round(element_at(col("qs"), i + 1), 4).as(n)
          } ++ Seq(col("vmax").as("max")): _*)
    } else chunked(cols) { cs =>
      val exprs = cs.flatMap { c =>
        val arr = percentile_approx(col(c), array(percentilePoints.map(lit): _*), lit(10000))
        Seq(
          min(col(c)).cast(DoubleType).as(s"min__$c"),
          arr.as(s"pcts__$c"),
          max(col(c)).cast(DoubleType).as(s"max__$c"))
      }
      val extracted = agg1(df, exprs).select(
        cs.flatMap { c =>
          Seq(col(s"min__$c")) ++
            names.zipWithIndex.map { case (n, i) =>
              round(element_at(col(s"pcts__$c"), i + 1).cast(DoubleType), 4).as(s"${n}__$c")
            } ++
            Seq(col(s"max__$c"))
        }: _*)
      longForm(extracted, cs, Seq("min") ++ names ++ Seq("max"))
    }
  }

  /** ref: stats_generator.py:919-1011 `measures_of_shape` — population
    * skewness g1 and excess kurtosis, batched (the reference batches too,
    * :993-994).
    */
  def measuresOfShape(df: DataFrame, cols: Seq[String]): DataFrame = chunked(cols) { cs =>
    val exprs = cs.flatMap { c =>
      Seq(
        round(skewness(col(c)), 4).as(s"skewness__$c"),
        round(kurtosis(col(c)), 4).as(s"kurtosis__$c"))
    }
    longForm(agg1(df, exprs), cs, Seq("skewness", "kurtosis"))
  }
}
