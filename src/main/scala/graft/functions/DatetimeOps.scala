package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Datetime surface (ref: data_transformer/datetime.py, 2 012 LoC — thin
  * wrappers over Spark SQL functions, all codegen'd; no UDFs anywhere).
  */
object DatetimeOps {

  // ---- epoch <-> timestamp (ref: datetime.py:126-271)
  def timestampToUnix(c: Column, precision: String = "s"): Column = precision match {
    case "s"  => unix_timestamp(c)
    case "ms" => unix_millis(c)
    case p    => throw new IllegalArgumentException(s"unknown precision $p")
  }
  def unixToTimestamp(c: Column, precision: String = "s"): Column = precision match {
    case "s"  => timestamp_seconds(c)
    case "ms" => timestamp_millis(c)
    case p    => throw new IllegalArgumentException(s"unknown precision $p")
  }

  // ---- tz / format (ref: datetime.py:272-549)
  def timezoneConversion(c: Column, from: String, to: String): Column =
    from_utc_timestamp(to_utc_timestamp(c, from), to)
  def stringToTimestamp(c: Column, fmt: String): Column = to_timestamp(c, fmt)
  def timestampToString(c: Column, fmt: String): Column = date_format(c, fmt)
  def dateformatConversion(c: Column, inFmt: String, outFmt: String): Column =
    date_format(to_timestamp(c, inFmt), outFmt)

  // ---- component extraction (ref: datetime.py:550-623)
  val timeUnits: Seq[String] = Seq("year", "month", "dayofmonth", "dayofweek",
    "dayofyear", "hour", "minute", "second", "weekofyear", "quarter")
  def timeUnitExtract(c: Column, unit: String): Column = unit match {
    case "year"       => year(c)
    case "month"      => month(c)
    case "dayofmonth" => dayofmonth(c)
    case "dayofweek"  => dayofweek(c) // 1 = Sunday (Spark convention)
    case "dayofyear"  => dayofyear(c)
    case "hour"       => hour(c)
    case "minute"     => minute(c)
    case "second"     => second(c)
    case "weekofyear" => weekofyear(c)
    case "quarter"    => quarter(c)
    case u => throw new IllegalArgumentException(s"unknown unit $u")
  }

  // ---- arithmetic (ref: datetime.py:624-922)
  /** Difference t2 - t1 expressed in `unit` (seconds-based, double).
    * Subtract in exact integer milliseconds FIRST, divide once — dividing
    * each epoch separately would round twice on ~1e12-magnitude values
    * and lose ~1e-7 s of precision.
    */
  def timeDiff(t1: Column, t2: Column, unit: String = "seconds"): Column = {
    val secs = (unix_millis(t2.cast("timestamp")) -
      unix_millis(t1.cast("timestamp"))) / 1000.0
    unit match {
      case "seconds" => secs
      case "minutes" => secs / 60.0
      case "hours"   => secs / 3600.0
      case "days"    => secs / 86400.0
      case "weeks"   => secs / (86400.0 * 7)
      case u => throw new IllegalArgumentException(s"unknown unit $u")
    }
  }
  def timeElapsed(c: Column, unit: String = "seconds"): Column =
    timeDiff(c, current_timestamp(), unit)
  def addingTimeUnits(c: Column, n: Int, unit: String): Column = unit match {
    case "days"    => date_add(c, n).cast("timestamp")
    case "months"  => add_months(c, n).cast("timestamp")
    case "years"   => add_months(c, n * 12).cast("timestamp")
    case "hours"   => timestamp_seconds(unix_timestamp(c) + n * 3600L)
    case "minutes" => timestamp_seconds(unix_timestamp(c) + n * 60L)
    case "seconds" => timestamp_seconds(unix_timestamp(c) + n.toLong)
    case u => throw new IllegalArgumentException(s"unknown unit $u")
  }
  def timestampComparison(c: Column, other: Column, op: String): Column = op match {
    case "greater"       => c > other
    case "lesser"        => c < other
    case "greaterEqual"  => c >= other
    case "lesserEqual"   => c <= other
    case o => throw new IllegalArgumentException(s"unknown comparator $o")
  }

  // ---- calendar flags (ref: datetime.py:923-1716)
  def startOfMonth(c: Column): Column = trunc(c, "month")
  def endOfMonth(c: Column): Column = last_day(c)
  def isMonthStart(c: Column): Column = (dayofmonth(c) === 1).cast("int")
  def isMonthEnd(c: Column): Column = (to_date(c) === last_day(c)).cast("int")
  def startOfYear(c: Column): Column = trunc(c, "year")
  def endOfYear(c: Column): Column = last_day(add_months(trunc(c, "year"), 11))
  def isYearStart(c: Column): Column = (dayofyear(c) === 1).cast("int")
  def isYearEnd(c: Column): Column = ((month(c) === 12) && (dayofmonth(c) === 31)).cast("int")
  def startOfQuarter(c: Column): Column = trunc(c, "quarter")
  def endOfQuarter(c: Column): Column = last_day(add_months(trunc(c, "quarter"), 2))
  def isQuarterStart(c: Column): Column =
    ((dayofmonth(c) === 1) && (month(c) - 1) % 3 === 0).cast("int")
  def isQuarterEnd(c: Column): Column =
    ((to_date(c) === last_day(c)) && (month(c) % 3 === 0)).cast("int")
  def isYearFirstHalf(c: Column): Column = (month(c) <= 6).cast("int")
  def isLeapYear(c: Column): Column = {
    val y = year(c)
    ((y % 4 === 0) && ((y % 100 =!= 0) || (y % 400 === 0))).cast("int")
  }
  def isWeekend(c: Column): Column = dayofweek(c).isin(1, 7).cast("int")
  def isSelectedHour(c: Column, startHour: Int, endHour: Int): Column =
    (if (startHour <= endHour) hour(c).between(startHour, endHour)
     else hour(c) >= startHour || hour(c) <= endHour).cast("int")

  /** ref: ts_analyzer.py:52-84 `daypart_cat` — chained `when`, not the
    * reference's Python UDF.
    */
  def daypartCat(c: Column): Column = {
    val h = hour(c)
    when(h.between(0, 5), "late_hours")
      .when(h.between(10, 16), "work_hours")
      .when(h.between(20, 23), "early_hours")
      .when(h.isin(7, 8, 9, 17, 18, 19), "commuting_hours")
      .otherwise("other_hours")
  }

  /** ref: ts_analyzer.py:259-405 `ts_viz_data` — the chart-data producer
    * behind the ts dashboard: bucket the timestamp (daily date /
    * weekly dow / hourly daypart), then
    *  - categorical y: collapse to the top `nCat` categories (count
    *    desc, value asc — the reference's bare count-desc order is
    *    nondeterministic on ties), everything else → "Others", and
    *    count per (y, bucket);
    *  - numeric y: per-bucket min / max / mean / exact median.
    * One aggregation either way (plus the O(nCat) top-list fit for the
    * categorical arm); the frame returned is chart-sized.
    */
  def tsVizData(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outputType: String = "daily",
      nCat: Int = 10): DataFrame = {
    val ts = col(xCol)
    val (bucket, bucketName) = outputType match {
      case "daily"  => (date_format(ts, "yyyy-MM-dd"), xCol)
      case "weekly" => (dayofweek(ts).cast("int"), "dow")
      case "hourly" => (daypartCat(ts), "daypart_cat")
      case o => throw new IllegalArgumentException(s"unknown output_type: $o")
    }
    val isCat = df.schema(yCol).dataType == org.apache.spark.sql.types.StringType
    if (isCat) {
      // the reference's top_cat fit groups WITH null as a key, so a
      // frequent null burns one of the nCat slots — match that: nulls
      // count toward the cap, and if null makes the cut those rows keep
      // their null category instead of collapsing to "Others" (nulls
      // sort after every real value on the count-tie, mirroring
      // NULLS LAST)
      val topRows = df
        .groupBy(col(yCol)).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col(yCol).asc_nulls_last)
        .limit(nCat).collect()
      val top = topRows.flatMap(r => Option(r.get(0)).map(_.toString))
      val nullInTop = topRows.exists(_.isNullAt(0))
      val keep = col(yCol).isin(top.toIndexedSeq: _*)
      val collapsed =
        if (nullInTop)
          when(col(yCol).isNull || keep, col(yCol)).otherwise(lit("Others"))
        else
          when(keep, col(yCol)).otherwise(lit("Others"))
      df.withColumn(yCol, collapsed)
        .groupBy(col(yCol), bucket.as(bucketName))
        .agg(count(lit(1)).as("count"))
    } else {
      df.groupBy(bucket.as(bucketName))
        .agg(
          min(col(yCol)).as("min"),
          max(col(yCol)).as("max"),
          avg(col(yCol)).as("mean"),
          graft.core.NumExpr.pct(col(yCol).cast("double"), 0.5).as("median"))
    }
  }

  // ---- grouped / windowed time aggregation (ref: datetime.py:1721-2012)

  /** Classic additive seasonal decomposition y = trend + seasonal +
    * residual over a daily-aggregated series (one series per
    * `seriesCols` group): trend is the centered `period`-row moving
    * average (defined only where the window is FULL — the textbook edge
    * rule), the seasonal component is the mean detrended value per
    * within-period position re-centered to sum to zero across the
    * period, and the residual is what's left. Period positions come
    * from `row_number % period` over the day order, so any period
    * replays in SQL (not just weekly).
    *
    * Numerics are engine-portable by construction: every sum that could
    * be reordered across engines (daily totals, window sums, per-position
    * and per-series means) runs in DECIMAL with a pre-round, so the only
    * doubles are deterministic single divisions. Scale: all windows
    * partition by the series key over the DAILY aggregate (≤ a few
    * thousand rows per series), never over raw events.
    */
  def seasonalDecompose(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      seriesCols: Seq[String],
      period: Int = 7): DataFrame = {
    require(period >= 2, "period must be >= 2")
    require(period % 2 == 1,
      "even periods need the 2x(period+1) weighted MA — use an odd period")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val half = period / 2
    val series = seriesCols.map(col)
    val daily = df
      .groupBy(series :+ date_format(col(tsCol), "yyyy-MM-dd").as("day"): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, 4))).cast(DoubleType).as("y"))
    val order = Window.partitionBy(series: _*).orderBy(col("day"))
    val w = order.rowsBetween(-half, half)
    val t = daily
      .withColumn("trend",
        when(count(lit(1)).over(w) === period,
          sum(col("y").cast(DecimalType(18, 4))).over(w).cast(DoubleType) / period))
      .withColumn("pos", ((row_number().over(order) - 1) % period).cast("int"))
      .withColumn("detr", round(col("y") - col("trend"), 8))
    val s0 = t.groupBy(series :+ col("pos"): _*)
      .agg((sum(col("detr").cast(DecimalType(18, 8))).cast(DoubleType) /
        count(col("trend"))).as("seas0"))
    val sbar = s0.groupBy(series: _*)
      .agg((sum(round(col("seas0"), 8).cast(DecimalType(18, 8))).cast(DoubleType) /
        count(col("seas0"))).as("sbar"))
    t.join(s0, seriesCols :+ "pos")
      .join(sbar, seriesCols)
      .withColumn("seasonal", round(col("seas0") - col("sbar"), 4))
      .select(series ++ Seq(col("day"), round(col("y"), 4).as("y"),
        round(col("trend"), 4).as("trend"), col("seasonal"),
        round(col("y") - col("trend") - (col("seas0") - col("sbar")), 4)
          .as("resid")): _*)
  }

  /** The shared daily-series base of the ts-diagnostics family: one
    * row per (series, day) with the DECIMAL-exact daily sum as a double.
    */
  private def dailySeries(df: DataFrame, tsCol: String, valueCol: String,
      seriesCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    df.groupBy(seriesCols.map(col) :+ date_format(col(tsCol), "yyyy-MM-dd").as("day"): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, 4))).cast(DoubleType).as("y"))
  }

  /** Sample autocorrelation of the per-series daily totals at lags
    * 1..maxLag: acf(k) = Σ dev_t·dev_{t−k} / Σ dev_t² with deviations
    * from the series mean — the diagnostic that tells a pipeline which
    * seasonal period to feed [[seasonalDecompose]]. Cross-engine exact:
    * the mean is a DECIMAL sum over the daily frame, deviations and
    * their products pre-round to 8 decimals before the DECIMAL
    * numerator/denominator sums, so no reorderable double addition
    * exists anywhere. One window pass computes all maxLag lag columns;
    * everything partitions by the series key over the daily aggregate.
    */
  def autocorrelation(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      seriesCols: Seq[String],
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val series = seriesCols.map(col)
    val daily = dailySeries(df, tsCol, valueCol, seriesCols)
    val mean = daily.groupBy(series: _*)
      .agg((sum(col("y").cast(DecimalType(18, 4))).cast(DoubleType) /
        count(lit(1))).as("__ybar"))
    val order = Window.partitionBy(series: _*).orderBy(col("day"))
    val dev = daily.join(mean, seriesCols)
      .withColumn("__dev", round(col("y") - col("__ybar"), 8))
    val lagged = (1 to maxLag).foldLeft(dev) { (d, k) =>
      d.withColumn(s"__dev_lag$k", lag(col("__dev"), k).over(order))
    }
    val prodCols = (1 to maxLag).map(k =>
      round(col("__dev") * col(s"__dev_lag$k"), 8).cast(DecimalType(28, 8))
        .as(s"__p$k"))
    val base = lagged.select(series ++ Seq(
      round(col("__dev") * col("__dev"), 8).cast(DecimalType(28, 8)).as("__d2")) ++
      prodCols: _*)
    val aggs = sum(col("__d2")).cast(DoubleType).as("__denom") +:
      (1 to maxLag).map(k => sum(col(s"__p$k")).cast(DoubleType).as(s"__n$k"))
    val sums = base.groupBy(series: _*).agg(aggs.head, aggs.tail: _*)
    // a constant series has zero deviation mass — acf is undefined
    // (null), not an ANSI DIVIDE_BY_ZERO that aborts every other series
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, round(CASE WHEN __denom > 0 THEN __n$k / __denom END, 4)")
      .mkString(", ")
    sums.selectExpr(seriesCols :+
      s"stack($maxLag, $stackArgs) as (lag, acf)": _*)
  }

  /** Durbin–Levinson recursion unrolled to closed-form SQL arithmetic
    * over acf columns `a1..aK`: returns the expression strings for
    * pacf(1..K). The SAME text evaluates in Spark (`expr`) and DuckDB,
    * so both engines execute an identical double expression tree — the
    * cross-engine determinism trick for a recursion neither engine can
    * express relationally. K is small (the driver-side unroll grows the
    * k-th expression like the recursion's closed form), so this is for
    * diagnostic lag counts, not long-memory studies.
    */
  private[graft] def pacfExprs(maxLag: Int): Seq[String] = {
    // phi(k)(j): expression string for φ_{k,j}
    val phi = Array.ofDim[String](maxLag + 1, maxLag + 1)
    phi(1)(1) = "a1"
    for (k <- 2 to maxLag) {
      val num = (1 until k).foldLeft(s"a$k") { (acc, j) =>
        s"($acc - (${phi(k - 1)(j)}) * a${k - j})"
      }
      val den = (1 until k).foldLeft("1.0") { (acc, j) =>
        s"($acc - (${phi(k - 1)(j)}) * a$j)"
      }
      phi(k)(k) = s"(($num) / ($den))"
      for (j <- 1 until k)
        phi(k)(j) = s"((${phi(k - 1)(j)}) - (${phi(k)(k)}) * (${phi(k - 1)(k - j)}))"
    }
    (1 to maxLag).map(k => phi(k)(k))
  }

  /** Partial autocorrelation (lags 1..maxLag) of the per-series daily
    * totals: the AR-order diagnostic — pacf(k) is the lag-k correlation
    * with the intermediate lags regressed out, computed from the
    * [[autocorrelation]] values via the Durbin–Levinson recursion.
    * The recursion runs as ONE closed-form arithmetic expression per
    * lag over the series' acf row ([[pacfExprs]] — identical text on
    * both engines), so the whole op stays a pivot + scalar projection
    * on a (series × maxLag)-sized frame.
    */
  def partialAutocorrelation(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      seriesCols: Seq[String],
      maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1 && maxLag <= 5,
      "unrolled Durbin-Levinson: 1 <= maxLag <= 5 (expression size grows super-exponentially)")
    val acf = autocorrelation(df, tsCol, valueCol, seriesCols, maxLag)
    // wide acf row per series: a1..aK (max(when(...)) pivot — one
    // non-null value per (series, lag), so max is exact selection, and
    // unlike first() it cannot land on a null from another lag's row)
    val wide = acf.groupBy(seriesCols.map(col): _*)
      .agg(
        max(when(col("lag") === 1, col("acf"))).as("a1"),
        (2 to maxLag).map(k =>
          max(when(col("lag") === k, col("acf"))).as(s"a$k")): _*)
    val exprs = pacfExprs(maxLag)
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, round(${exprs(k - 1)}, 4)").mkString(", ")
    wide.selectExpr(seriesCols :+
      s"stack($maxLag, $stackArgs) as (lag, pacf)": _*)
  }

  /** CUSUM level-shift detection over the per-series daily totals: the
    * running sum of deviations from the series mean peaks (in absolute
    * value) at the most likely changepoint. Output: one row per series —
    * the argmax day, the peak |cusum| normalized by the series stddev,
    * and a shift flag at `threshold`. All cumulative and total sums are
    * DECIMAL over 8-dp pre-rounded deviations (exact on both engines);
    * ties on |cusum| break to the earliest day.
    */
  def cusumChangepoints(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      seriesCols: Seq[String],
      threshold: Double = 5.0): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val series = seriesCols.map(col)
    val daily = dailySeries(df, tsCol, valueCol, seriesCols)
    val stats = daily.groupBy(series: _*)
      .agg(
        (sum(col("y").cast(DecimalType(18, 4))).cast(DoubleType) /
          count(lit(1))).as("__ybar"),
        count(lit(1)).as("__n"))
    val order = Window.partitionBy(series: _*).orderBy(col("day"))
    val cum = daily.join(stats, seriesCols)
      .withColumn("__dev", round(col("y") - col("__ybar"), 8))
      .withColumn("__cusum",
        sum(col("__dev").cast(DecimalType(28, 8))).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
    // series stddev from the SAME exact deviations (population form —
    // deterministic single division), for a scale-free peak statistic
    val sd = cum.groupBy(series: _*)
      .agg((sum(round(col("__dev") * col("__dev"), 8).cast(DecimalType(28, 8)))
        .cast(DoubleType) / max(col("__n"))).as("__var"))
    val rank = Window.partitionBy(series: _*)
      .orderBy(abs(col("__cusum")).desc, col("day").asc)
    cum.join(sd, seriesCols)
      .withColumn("__rk", row_number().over(rank))
      .filter(col("__rk") === 1)
      .select(series ++ Seq(
        col("day").as("changepoint_day"),
        // zero-variance series: no scale to normalize by — null peak,
        // unshifted (not an ANSI DIVIDE_BY_ZERO crash)
        when(col("__var") > 0,
          round(abs(col("__cusum")) / sqrt(col("__var")), 4)).as("peak_stat"),
        when(col("__var") > 0,
          abs(col("__cusum")) / sqrt(col("__var")) > threshold)
          .otherwise(lit(false)).as("shifted")): _*)
  }

  /** ref: datetime.py:1721-1821 `aggregator` — groupBy formatted time
    * bucket; agg list maps to built-ins (median = exact percentile).
    */
  def aggregator(
      df: DataFrame,
      tsCol: String,
      fmt: String,
      valueCols: Seq[String],
      aggs: Seq[String]): DataFrame = {
    val exprs = for (c <- valueCols; a <- aggs) yield aggExpr(col(c), a).as(s"${a}_$c")
    df.groupBy(date_format(col(tsCol), fmt).as("time_bucket"))
      .agg(exprs.head, exprs.tail: _*)
  }

  private def aggExpr(c: Column, a: String): Column = a match {
    case "count"          => count(c)
    case "min"            => min(c)
    case "max"            => max(c)
    case "sum"            => sum(c)
    case "mean"           => avg(c)
    case "median"         => percentile(c, lit(0.5))
    case "stddev"         => stddev_samp(c)
    case "countDistinct"  => countDistinct(c)
    case "sumDistinct"    => sum_distinct(c)
    case "collect_list"   => collect_list(c)
    case "collect_set"    => collect_set(c)
    case x => throw new IllegalArgumentException(s"unknown agg $x")
  }

  /** Batch gap-based sessionization (companion to the streaming
    * `StreamingOps.sessionize`): a new session starts when the gap to the
    * previous event of the same user exceeds `gapUs` microseconds.
    * Two key-partitioned windows (lag, then running sum) — every window
    * partitions on the user key, so the work distributes; integer
    * microsecond arithmetic keeps the session boundaries bit-identical
    * across engines. Adds `__us` (event micros) and `session_idx`
    * (0-based per user).
    */
  def sessionize(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long = 1800000000L,
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run) - 1L)
      .drop("__new")
  }

  /** Per-key time-ordered forward fill: nulls take the most recent
    * non-null value of the same key (`last(ignoreNulls)` over an
    * unbounded-preceding frame — one key-partitioned window, the
    * standard gap-filling pass for sensor/event streams). Leading nulls
    * (no prior observation) stay null.
    */
  def forwardFill(
      df: DataFrame,
      valueCols: Seq[String],
      partitionCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Bounded-lookback exponentially-weighted moving average: weights
    * (1−α)^k over the last `n` rows of the partition, normalized by the
    * weights actually present (partial windows at the head of each key
    * use only available lags). With α a negative power of two the
    * weights are exact binary fractions, so the arithmetic is
    * bit-identical on any engine. One key-partitioned window, n lag
    * terms — map-side after the single shuffle.
    */
  def ewmaLagged(
      df: DataFrame,
      valueCol: String,
      partitionCols: Seq[String],
      orderCols: Seq[String],
      alpha: Double = 0.5,
      n: Int = 5,
      outCol: String = "ewma"): DataFrame = {
    require(n >= 1 && alpha > 0 && alpha < 1, "need n >= 1 and alpha in (0,1)")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val terms = (0 until n).map { k =>
      val wk = math.pow(1 - alpha, k)
      val x = lag(col(valueCol), k).over(w)
      (when(x.isNotNull, lit(wk) * x).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wk)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn(outCol, when(den > 0, num / den))
  }

  /** ref: datetime.py:1824-1930 `window_aggregator` — expanding
    * (unboundedPreceding→current) or rolling (−N+1→current) row frames
    * over time order, optional partition.
    */
  def windowAggregator(
      df: DataFrame,
      valueCol: String,
      orderCols: Seq[String],
      partitionCols: Seq[String],
      windowType: String = "expanding",
      windowSize: Int = 3,
      aggs: Seq[String] = Seq("sum"),
      outputPrefix: String = ""): DataFrame = {
    val base =
      if (partitionCols.isEmpty) Window.orderBy(orderCols.map(col): _*)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val spec: WindowSpec = windowType match {
      case "expanding" => base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case "rolling"   => base.rowsBetween(-(windowSize - 1), Window.currentRow)
      case t => throw new IllegalArgumentException(s"unknown window type $t")
    }
    aggs.foldLeft(df) { (d, a) =>
      d.withColumn(s"$outputPrefix${a}_$valueCol", aggExpr(col(valueCol), a).over(spec))
    }
  }

  /** ref: datetime.py:1933-2012 `lagged_ts` — lag(col, n) over time order,
    * optionally with the time delta vs the lagged timestamp.
    */
  def laggedTs(
      df: DataFrame,
      valueCol: String,
      orderCols: Seq[String],
      partitionCols: Seq[String],
      lagN: Int = 1,
      tsDiffUnit: Option[String] = None): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(orderCols.map(col): _*)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val lagged = df.withColumn(s"${valueCol}_lag$lagN", lag(col(valueCol), lagN).over(w))
    tsDiffUnit match {
      case Some(unit) =>
        lagged.withColumn(s"${valueCol}_lag${lagN}_diff",
          timeDiff(col(s"${valueCol}_lag$lagN"), col(valueCol), unit))
      case None => lagged
    }
  }

  /** ref: ts_analyzer.py ts_eligiblity_check — the timeseries-readiness
    * profile (test_ts_analyzer.py:61-102 pins the productivity.csv
    * values this port reproduces): per-id unique-date counts and
    * per-date unique-id counts (opt 1), plus the unique-date span and
    * the consecutive-gap statistics (opt 2; sample variance like the
    * reference's pandas .var()). The gap window sorts UNIQUE DATES only
    * (calendar-bounded — thousands of rows for decades of dates), never
    * the data; everything else is two count-distinct aggregates.
    */
  /** HALF_UP at `scale` — the same rounding SQL round() applies. */
  private def halfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  def tsEligibility(df: DataFrame, idCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val d = df.select(col(idCol).cast("string").as("id"), to_date(col(tsCol)).as("d"))
      .na.drop()
    val perId = d.groupBy("id").agg(countDistinct(col("d")).as("n"))
      .agg(min("n").cast("long"), max("n").cast("long")).first()
    val perDate = d.groupBy("d").agg(countDistinct(col("id")).as("n"))
      .agg(min("n").cast("long"), max("n").cast("long")).first()
    val dates = d.select("d").distinct()
    val gaps = dates
      .withColumn("prev", lag(col("d"), 1).over(Window.orderBy(col("d"))))
      .filter(col("prev").isNotNull)
      .select(datediff(col("d"), col("prev")).cast("double").as("g"))
    val span = dates.agg(
      count(lit(1)).cast("long"), min("d").cast("string"), max("d").cast("string"),
      datediff(max("d"), min("d")).cast("long")).first()
    require(span.getLong(0) > 0, "no non-null (id, timestamp) rows — nothing to profile")
    val g = gaps.agg(
      avg("g"), var_samp(col("g")), stddev_samp(col("g"))).first()
    // a single unique date has no gaps (avg/var null) → report 0.0
    def gd(i: Int, s: Int) = if (g.isNullAt(i)) 0.0 else halfUp(g.getDouble(i), s)
    import spark.implicits._
    Seq((
      span.getLong(0), span.getString(1), span.getString(2), span.getLong(3),
      gd(0, 2), gd(1, 3), gd(2, 3),
      perId.getLong(0), perId.getLong(1), perDate.getLong(0), perDate.getLong(1)))
      .toDF("count_unique_dates", "min_date", "max_date", "date_diff",
        "gap_mean", "gap_variance", "gap_stdev",
        "id_date_pair_min", "id_date_pair_max",
        "date_id_pair_min", "date_id_pair_max")
  }

  /** SCD-type-2 interval builder: collapse a per-key change history
    * into validity intervals — one row per RUN of equal values
    * (gaps-and-islands), with `valid_from` = first observation of the
    * run, `valid_to` = the next run's start (null = current). Two
    * stacked windows over ONE key-partitioned sort (lag to mark run
    * starts, lead over the kept run starts for the closing bound) —
    * a single shuffle, no self-joins. `orderCols` must make the
    * per-key ordering total or run boundaries are nondeterministic.
    */
  def scd2Intervals(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
    val marked = df
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // null-safe: a genuine null value still forms runs
      .filter(!(col(valueCol) <=> col("__prev")) || col("__rn") === 1)
      .drop("__prev", "__rn")
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
    marked
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ Seq(col(valueCol), col("valid_from"),
        col("valid_to"), col("is_current")): _*)
  }
}
