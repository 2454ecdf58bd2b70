package graft.queries

import graft.functions.DatetimeOps
import graft.queries.QueryPack._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Datetime / window operator queries (SURVEY.md §2.5/2.9). */
object TimeQueries {

  /** Component extraction. Spark's dayofweek is 1=Sunday; DuckDB's is
    * 0=Sunday, hence the +1 on the oracle side. Extract outputs are cast
    * long to match DuckDB's BIGINT.
    */
  val qDtExtract = Q(
    "q_dt_extract",
    (s, dir) => {
      val o = tables(s, dir).orders
      val d = col("o_orderdate")
      o.select(
        col("o_orderkey"),
        DatetimeOps.timeUnitExtract(d, "year").cast(LongType).as("yr"),
        DatetimeOps.timeUnitExtract(d, "month").cast(LongType).as("mo"),
        DatetimeOps.timeUnitExtract(d, "dayofmonth").cast(LongType).as("dom"),
        DatetimeOps.timeUnitExtract(d, "dayofweek").cast(LongType).as("dow"),
        DatetimeOps.timeUnitExtract(d, "dayofyear").cast(LongType).as("doy"),
        DatetimeOps.timeUnitExtract(d, "quarter").cast(LongType).as("qtr"))
    },
    Some("""
      SELECT o_orderkey,
        year(o_orderdate) AS yr,
        month(o_orderdate) AS mo,
        day(o_orderdate) AS dom,
        dayofweek(o_orderdate) + 1 AS dow,
        dayofyear(o_orderdate) AS doy,
        quarter(o_orderdate) AS qtr
      FROM orders"""))

  val qCalendarFlags = Q(
    "q_calendar_flags",
    (s, dir) => {
      val o = tables(s, dir).orders
      val d = col("o_orderdate")
      o.select(
        col("o_orderkey"),
        DatetimeOps.isWeekend(d).as("is_weekend"),
        DatetimeOps.isMonthStart(d).as("is_month_start"),
        DatetimeOps.isMonthEnd(d).as("is_month_end"),
        DatetimeOps.isLeapYear(d).as("is_leap_year"),
        DatetimeOps.isYearFirstHalf(d).as("is_h1"),
        date_format(DatetimeOps.startOfQuarter(d), "yyyy-MM-dd").as("q_start"),
        date_format(DatetimeOps.endOfQuarter(d), "yyyy-MM-dd").as("q_end"),
        date_format(DatetimeOps.endOfYear(d), "yyyy-MM-dd").as("y_end"))
    },
    Some("""
      SELECT o_orderkey,
        CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
        CASE WHEN day(o_orderdate) = 1 THEN 1 ELSE 0 END AS is_month_start,
        CASE WHEN CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE)) THEN 1 ELSE 0 END AS is_month_end,
        CASE WHEN year(o_orderdate) % 4 = 0
              AND (year(o_orderdate) % 100 <> 0 OR year(o_orderdate) % 400 = 0)
             THEN 1 ELSE 0 END AS is_leap_year,
        CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 0 END AS is_h1,
        strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS q_start,
        strftime(last_day(date_trunc('quarter', CAST(o_orderdate AS DATE)) + INTERVAL 2 MONTH), '%Y-%m-%d') AS q_end,
        strftime(make_date(CAST(year(o_orderdate) AS INT), 12, 31), '%Y-%m-%d') AS y_end
      FROM orders"""))

  /** Timestamp arithmetic: +3 months (month-end clamped in both engines),
    * day difference vs a fixed anchor.
    */
  val qDtArithmetic = Q(
    "q_dt_arithmetic",
    (s, dir) => {
      val o = tables(s, dir).orders
      val d = col("o_orderdate")
      o.select(
        col("o_orderkey"),
        date_format(DatetimeOps.addingTimeUnits(d, 3, "months"), "yyyy-MM-dd").as("plus_3m"),
        round(DatetimeOps.timeDiff(d, lit("2000-01-01").cast("timestamp"), "days"), 4)
          .as("days_to_2000"))
    },
    Some("""
      SELECT o_orderkey,
        strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        round(CAST(date_diff('millisecond', o_orderdate, TIMESTAMP '2000-01-01') AS DOUBLE)
              / 1000 / 86400, 4) AS days_to_2000
      FROM orders"""))

  /** Grouped time aggregation: daily buckets over events. */
  val qTsAggregatorFull = Q(
    "q_ts_agg_daily",
    (s, dir) => {
      val e = tables(s, dir).events
      e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"),
          (sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType) / count(col("value")))
            .as("mean_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          countDistinct(col("user_id")).as("n_users"))
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS mean_value,
        min(value) AS min_value,
        max(value) AS max_value,
        count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1"""))

  /** Rolling + expanding window aggregation over per-user event streams.
    * Exact decimal window sums keep both engines bit-identical.
    */
  val qWindowAggregator = Q(
    "q_window_aggregator",
    (s, dir) => {
      val e = tables(s, dir).events
        .withColumn("value", col("value").cast(DecimalType(18, 4)))
      val rolled = DatetimeOps.windowAggregator(e, "value",
        orderCols = Seq("ts", "event_id"), partitionCols = Seq("user_id"),
        windowType = "rolling", windowSize = 3, aggs = Seq("sum"), outputPrefix = "rolling_")
      val expanded = DatetimeOps.windowAggregator(rolled, "value",
        orderCols = Seq("ts", "event_id"), partitionCols = Seq("user_id"),
        windowType = "expanding", aggs = Seq("count"), outputPrefix = "expanding_")
      expanded.select(
        col("event_id"),
        col("rolling_sum_value").cast(DoubleType).as("rolling_sum"),
        col("expanding_count_value").as("expanding_count"))
    },
    Some("""
      SELECT event_id,
        CAST(sum(CAST(value AS DECIMAL(18,4))) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum,
        count(*) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS expanding_count
      FROM events"""))

  /** lag() + inter-event time difference per user. */
  val qLaggedTs = Q(
    "q_lagged_ts",
    (s, dir) => {
      val e = tables(s, dir).events
      val lagged = DatetimeOps.laggedTs(e, "ts",
        orderCols = Seq("ts", "event_id"), partitionCols = Seq("user_id"),
        lagN = 1, tsDiffUnit = Some("seconds"))
      lagged.select(
        col("event_id"),
        round(col("ts_lag1_diff"), 4).as("secs_since_prev"))
    },
    Some("""
      SELECT event_id,
        round(CAST(date_diff('millisecond',
            lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
          AS DOUBLE) / 1000, 4) AS secs_since_prev
      FROM events"""))

  /** Daypart bucketing (chained when-expression, no UDF). */
  val qDaypart = Q(
    "q_daypart",
    (s, dir) => tables(s, dir).events
      .groupBy(DatetimeOps.daypartCat(col("ts")).as("daypart"))
      .agg(count(lit(1)).as("n")),
    Some("""
      SELECT CASE
          WHEN hour(ts) BETWEEN 0 AND 5 THEN 'late_hours'
          WHEN hour(ts) BETWEEN 10 AND 16 THEN 'work_hours'
          WHEN hour(ts) BETWEEN 20 AND 23 THEN 'early_hours'
          WHEN hour(ts) IN (7, 8, 9, 17, 18, 19) THEN 'commuting_hours'
          ELSE 'other_hours' END AS daypart,
        count(*) AS n
      FROM events GROUP BY 1"""))

  /** Regex timestamp auto-detection round-trip: format a date column to
    * strings, auto-detect the format from a capped distinct sample, cast
    * back — components must equal the originals (identity oracle).
    */
  val qTsAutodetect = Q(
    "q_ts_autodetect",
    (s, dir) => {
      import graft.functions.AutoDetect
      val o = tables(s, dir).orders
        .withColumn("date_str", date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .withColumn("us_str", date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .withColumn("mname_str", date_format(col("o_orderdate"), "MMM d, yyyy"))
        .withColumn("compact_str", date_format(col("o_orderdate"), "yyyyMMdd"))
      val strCols = Seq("date_str", "us_str", "mname_str", "compact_str")
      val det = AutoDetect.detectTimestampColumns(o, strCols)
      // month-first disambiguates because orders' sample spans days > 12
      val expected = Map(
        "date_str" -> "d/M/yyyy", "us_str" -> "M/d/yyyy",
        "mname_str" -> "MMM d yyyy", "compact_str" -> "yyyyMMdd")
      det.foreach(x =>
        require(x.format.contains(expected(x.attribute)), s"detection failed: $x"))
      val cast = AutoDetect.tsPreprocess(o, det)
      cast.select(
        col("o_orderkey"),
        year(col("date_str")).cast(LongType).as("yr"),
        month(col("date_str")).cast(LongType).as("mo"),
        dayofmonth(col("date_str")).cast(LongType).as("dom"),
        date_format(col("us_str"), "yyyy-MM-dd").as("rt_us"),
        date_format(col("mname_str"), "yyyy-MM-dd").as("rt_mname"),
        date_format(col("compact_str"), "yyyy-MM-dd").as("rt_compact"))
    },
    Some("""
      SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             day(o_orderdate) AS dom,
             strftime(o_orderdate, '%Y-%m-%d') AS rt_us,
             strftime(o_orderdate, '%Y-%m-%d') AS rt_mname,
             strftime(o_orderdate, '%Y-%m-%d') AS rt_compact
      FROM orders"""))

  /** Semi-structured extraction: parse the events.props JSON column with
    * from_json and aggregate the typed field. The oracle reaches the
    * same values by regex (avoids DuckDB's JSON extension dependency).
    */
  val qJsonExtract = Q(
    "q_json_extract",
    (s, dir) => {
      val e = tables(s, dir).events
      e.withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))).getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(col("k")).as("n_parsed"),
          sum(col("k").cast(LongType)).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    },
    Some("""
      SELECT event_type,
        count(k) AS n_parsed,
        CAST(sum(k) AS BIGINT) AS sum_k,
        min(k) AS min_k,
        max(k) AS max_k
      FROM (SELECT event_type,
              TRY_CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) AS k
            FROM events)
      GROUP BY event_type"""))

  /** Format-conversion wrappers: ts→string and string-format→format. */
  val qDtFormatConvert = Q(
    "q_dt_format_convert",
    (s, dir) => {
      val o = tables(s, dir).orders
      o.select(
        col("o_orderkey"),
        DatetimeOps.timestampToString(col("o_orderdate"), "yyyy/MM/dd").as("slash_fmt"),
        DatetimeOps.dateformatConversion(
          DatetimeOps.timestampToString(col("o_orderdate"), "yyyy/MM/dd"),
          "yyyy/MM/dd", "MM-dd-yyyy").as("us_fmt"),
        date_format(DatetimeOps.unixToTimestamp(
          DatetimeOps.timestampToUnix(col("o_orderdate")), "s"), "yyyy-MM-dd")
          .as("epoch_roundtrip"))
    },
    Some("""
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y/%m/%d') AS slash_fmt,
        strftime(strptime(strftime(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d'), '%m-%d-%Y') AS us_fmt,
        strftime(to_timestamp(epoch(o_orderdate)), '%Y-%m-%d') AS epoch_roundtrip
      FROM orders"""))

  /** ts_analyzer-style profile: daypart × weekday activity grid with
    * exact means (ref: ts_analyzer.py — the stats behind its charts).
    */
  val qTsAnalyzer = Q(
    "q_ts_analyzer",
    (s, dir) => {
      val e = tables(s, dir).events
      e.groupBy(
          DatetimeOps.daypartCat(col("ts")).as("daypart"),
          dayofweek(col("ts")).cast(LongType).as("dow"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType) / count(col("value")))
            .as("mean_value"),
          countDistinct(col("user_id")).as("n_users"))
    },
    Some("""
      SELECT CASE
          WHEN hour(ts) BETWEEN 0 AND 5 THEN 'late_hours'
          WHEN hour(ts) BETWEEN 10 AND 16 THEN 'work_hours'
          WHEN hour(ts) BETWEEN 20 AND 23 THEN 'early_hours'
          WHEN hour(ts) IN (7, 8, 9, 17, 18, 19) THEN 'commuting_hours'
          ELSE 'other_hours' END AS daypart,
        dayofweek(ts) + 1 AS dow,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS mean_value,
        count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2"""))

  /** Batch gap-based sessionization over the events stream table:
    * per-user lag + running-sum windows (both partition on the user key),
    * then one combining aggregation per session. Microsecond integer
    * arithmetic end to end → oracle-exact session boundaries.
    */
  val qSessionization = Q(
    "q_sessionization",
    (s, dir) => DatetimeOps.sessionize(tables(s, dir).events, "user_id", "ts")
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("duration_us")),
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM e),
      n AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                           THEN 1 ELSE 0 END AS ns FROM l),
      s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS UNBOUNDED PRECEDING) - 1 AS session_idx FROM n)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        count(*) AS n_events,
        CAST(max(us) - min(us) AS BIGINT) AS duration_us
      FROM s GROUP BY user_id, session_idx"""))

  /** Point-in-time as-of join: each click event picks up the most recent
    * prior (≤) purchase value of its user. Oracle = DuckDB's native
    * ASOF LEFT JOIN; the Spark plan is the union + key-window shape
    * (one shuffle on user_id).
    */
  val qAsofJoin = Q(
    "q_asof_join",
    (s, dir) => {
      val e = tables(s, dir).events.withColumn("__us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "__us")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "__us")
        .agg(max(col("value")).as("purchase_value"))
      graft.functions.AsofJoin.asofJoin(
          clicks, purchases, Seq("user_id"), "__us", "__us", Seq("purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("purchase_value").as("last_purchase_value"))
    },
    Some("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, r.pv AS last_purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us"""))

  /** Forward as-of join (next purchase at-or-after each click): DuckDB's
    * native ASOF with `<=` is the oracle. Same one-shuffle union-window
    * plan as backward, frame reversed.
    */
  val qAsofForward = Q(
    "q_asof_forward",
    (s, dir) => {
      val e = tables(s, dir).events.withColumn("__us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "__us")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "__us")
        .agg(max(col("value")).as("purchase_value"))
      graft.functions.AsofJoin.asofJoin(
          clicks, purchases, Seq("user_id"), "__us", "__us", Seq("purchase_value"),
          direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("purchase_value").as("next_purchase_value"))
    },
    Some("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, r.pv AS next_purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us <= r.us"""))

  /** Nearest as-of join (closest purchase either side, ties backward —
    * pandas merge_asof semantics): the oracle composes DuckDB's two
    * directional ASOFs with the same distance tie-break.
    */
  val qAsofNearest = Q(
    "q_asof_nearest",
    (s, dir) => {
      val e = tables(s, dir).events.withColumn("__us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "__us")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "__us")
        .agg(max(col("value")).as("purchase_value"))
      graft.functions.AsofJoin.asofJoin(
          clicks, purchases, Seq("user_id"), "__us", "__us", Seq("purchase_value"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("purchase_value").as("nearest_purchase_value"))
    },
    Some("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2),
      b AS (SELECT l.event_id, l.user_id, l.us, r.us AS bus, r.pv AS bpv
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us),
      f AS (SELECT l.event_id, r.us AS fus, r.pv AS fpv
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us <= r.us)
      SELECT b.event_id, b.user_id,
        CASE WHEN fus IS NULL THEN bpv
             WHEN bus IS NULL THEN fpv
             WHEN b.us - bus <= fus - b.us THEN bpv
             ELSE fpv END AS nearest_purchase_value
      FROM b JOIN f ON b.event_id = f.event_id"""))

  /** Backward as-of join with pandas merge_asof's `tolerance`: a prior
    * purchase further than 3 days before the click is discarded (value
    * null), the click row stays. Oracle = native ASOF plus a distance
    * CASE — the engine implements it as a pure post-window expression on
    * the same one-shuffle union-window plan.
    */
  val qAsofTolerance = Q(
    "q_asof_tolerance",
    (s, dir) => {
      val e = tables(s, dir).events.withColumn("__us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "__us")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "__us")
        .agg(max(col("value")).as("purchase_value"))
      graft.functions.AsofJoin.asofJoin(
          clicks, purchases, Seq("user_id"), "__us", "__us", Seq("purchase_value"),
          tolerance = Some(3.0 * 86400 * 1000000)) // 3 days in µs
        .select(col("event_id"), col("user_id"),
          col("purchase_value").as("recent_purchase_value"))
    },
    Some("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id,
        CASE WHEN l.us - r.us <= 259200000000 THEN r.pv END
          AS recent_purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us"""))

  /** Strict backward as-of (pandas allow_exact_matches=False): a
    * purchase AT the click timestamp is invisible — only strictly prior
    * rows match. Same one-shuffle plan (the strictness is just the
    * equal-ts sort order); oracle = DuckDB ASOF with `>`.
    */
  val qAsofStrict = Q(
    "q_asof_strict",
    (s, dir) => {
      val e = tables(s, dir).events.withColumn("__us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "__us")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "__us")
        .agg(max(col("value")).as("purchase_value"))
      graft.functions.AsofJoin.asofJoin(
          clicks, purchases, Seq("user_id"), "__us", "__us", Seq("purchase_value"),
          allowExactMatches = false)
        .select(col("event_id"), col("user_id"),
          col("purchase_value").as("prior_purchase_value"))
    },
    Some("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, r.pv AS prior_purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us > r.us"""))

  /** Timeseries eligibility profile (ref ts_eligiblity_check, whose
    * productivity.csv values AutoDetectSpec pins): unique-date span +
    * consecutive-gap stats + per-id/per-date pair-count ranges, all
    * replayed by the oracle.
    */
  val qTsEligibility = Q(
    "q_ts_eligibility",
    (s, dir) => DatetimeOps.tsEligibility(tables(s, dir).events, "user_id", "ts"),
    Some("""
      WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS id,
                   CAST(ts AS DATE) AS dt FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      dates AS (SELECT DISTINCT dt FROM d),
      gaps AS (SELECT CAST(date_diff('day', prev, dt) AS DOUBLE) AS g FROM
        (SELECT dt, lag(dt) OVER (ORDER BY dt) AS prev FROM dates)
        WHERE prev IS NOT NULL),
      perid AS (SELECT min(n) AS mn, max(n) AS mx FROM
        (SELECT id, count(DISTINCT dt) AS n FROM d GROUP BY id)),
      perdate AS (SELECT min(n) AS mn, max(n) AS mx FROM
        (SELECT dt, count(DISTINCT id) AS n FROM d GROUP BY dt)),
      span AS (SELECT count(*) AS cu, CAST(min(dt) AS VARCHAR) AS mind,
                 CAST(max(dt) AS VARCHAR) AS maxd,
                 date_diff('day', min(dt), max(dt)) AS dd FROM dates),
      g AS (SELECT round(COALESCE(avg(g), 0), 2) AS gm,
              round(COALESCE(var_samp(g), 0), 3) AS gv,
              round(COALESCE(stddev_samp(g), 0), 3) AS gs FROM gaps)
      SELECT CAST(span.cu AS BIGINT) AS count_unique_dates,
        span.mind AS min_date, span.maxd AS max_date,
        CAST(span.dd AS BIGINT) AS date_diff,
        g.gm AS gap_mean, g.gv AS gap_variance, g.gs AS gap_stdev,
        CAST(perid.mn AS BIGINT) AS id_date_pair_min,
        CAST(perid.mx AS BIGINT) AS id_date_pair_max,
        CAST(perdate.mn AS BIGINT) AS date_id_pair_min,
        CAST(perdate.mx AS BIGINT) AS date_id_pair_max
      FROM span CROSS JOIN g CROSS JOIN perid CROSS JOIN perdate"""))

  /** SCD-type-2 validity intervals from the event history: one row per
    * RUN of equal per-user event types (gaps-and-islands — two stacked
    * windows over one key sort), valid_to = next run start, null =
    * current. Exact-integer micros → hash oracle.
    */
  val qScd2Intervals = Q(
    "q_scd2_intervals",
    (s, dir) => {
      val e = tables(s, dir).events
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      DatetimeOps.scd2Intervals(e, Seq("user_id"), "event_type", Seq("us", "event_id"))
        .select(col("user_id"), col("event_type"),
          col("valid_from").as("valid_from_us"), col("valid_to").as("valid_to_us"),
          col("is_current"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      m AS (SELECT *,
              lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
                AS prev,
              row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
            FROM e),
      runs AS (SELECT user_id, event_type, us, event_id FROM m
               WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      iv AS (SELECT user_id, event_type, us AS valid_from_us,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                 AS valid_to_us
             FROM runs)
      SELECT user_id, event_type, valid_from_us, valid_to_us,
             valid_to_us IS NULL AS is_current
      FROM iv"""))

  /** Per-user EWMA of event values (α = 1/2, 5-row lookback): exact
    * binary weights → bit-identical replay via explicit lag terms.
    */
  /** Additive seasonal decomposition of the per-event-type daily series:
    * textbook trend/seasonal/residual split with the full-window edge
    * rule and zero-centered period positions. Every reorderable sum is
    * DECIMAL on both engines (daily totals, the 7-row window sum, the
    * per-position and per-series means), so the only doubles are single
    * deterministic divisions — the hash gate then checks the whole
    * decomposition cell-exactly.
    */
  val qTsDecompose = Q(
    "q_ts_decompose",
    (s, dir) => DatetimeOps.seasonalDecompose(
      tables(s, dir).events, "ts", "value", Seq("event_type"), period = 7),
    Some("""
      WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      t AS (
        SELECT *,
          CASE WHEN count(*) OVER w = 7 THEN
            CAST(sum(CAST(y AS DECIMAL(18,4))) OVER w AS DOUBLE) / 7 END AS trend,
          CAST((row_number() OVER (PARTITION BY event_type ORDER BY day) - 1) % 7
            AS INT) AS pos
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      d AS (SELECT *, round(y - trend, 8) AS detr FROM t),
      s0 AS (
        SELECT event_type, pos,
          CAST(sum(CAST(detr AS DECIMAL(18,8))) AS DOUBLE) / count(trend) AS seas0
        FROM d GROUP BY 1, 2),
      sc AS (
        SELECT event_type,
          CAST(sum(CAST(round(seas0, 8) AS DECIMAL(18,8))) AS DOUBLE)
            / count(seas0) AS sbar
        FROM s0 GROUP BY 1)
      SELECT d.event_type, d.day, round(d.y, 4) AS y, round(d.trend, 4) AS trend,
        round(s0.seas0 - sc.sbar, 4) AS seasonal,
        round(d.y - d.trend - (s0.seas0 - sc.sbar), 4) AS resid
      FROM d JOIN s0 ON d.event_type = s0.event_type AND d.pos = s0.pos
             JOIN sc ON d.event_type = sc.event_type"""))

  /** Sample autocorrelation of each event type's daily series at lags
    * 1..7 — the period diagnostic feeding seasonal decomposition. All
    * reorderable sums are DECIMAL over 8-dp pre-rounded products, so
    * numerators and denominators are exact on both engines and the only
    * double op is one division per (series, lag).
    */
  private def acfOracleSql(maxLag: Int): String = {
    val lagCols = (1 to maxLag).map(k => s"lag(dev, $k) OVER w AS g$k").mkString(", ")
    val numSums = (1 to maxLag).map(k =>
      s"CAST(sum(CAST(round(dev * g$k, 8) AS DECIMAL(28,8))) AS DOUBLE) AS n$k")
      .mkString(", ")
    val arms = (1 to maxLag).map(k =>
      s"SELECT event_type, $k AS lag, round(CASE WHEN denom > 0 THEN n$k / denom END, 4) AS acf FROM s")
      .mkString(" UNION ALL ")
    s"""
      WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type,
              CAST(sum(CAST(y AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS ybar
            FROM daily GROUP BY 1),
      d AS (SELECT daily.event_type, day, round(y - ybar, 8) AS dev
            FROM daily JOIN m ON daily.event_type = m.event_type),
      l AS (SELECT *, $lagCols FROM d
            WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      s AS (SELECT event_type,
              CAST(sum(CAST(round(dev * dev, 8) AS DECIMAL(28,8))) AS DOUBLE) AS denom,
              $numSums
            FROM l GROUP BY 1)
      $arms"""
  }

  val qTsAcf = Q(
    "q_ts_acf",
    (s, dir) => DatetimeOps.autocorrelation(
      tables(s, dir).events, "ts", "value", Seq("event_type"), maxLag = 7),
    Some(acfOracleSql(7)))

  /** Partial autocorrelation at lags 1..4 via the unrolled
    * Durbin–Levinson recursion — the SAME generated arithmetic text
    * runs on both engines over the (rounded) acf values, so the doubles
    * are bit-identical by construction; only the acf inputs (already
    * exact by the DECIMAL discipline) feed it.
    */
  val qTsPacf = Q(
    "q_ts_pacf",
    (s, dir) => DatetimeOps.partialAutocorrelation(
      tables(s, dir).events, "ts", "value", Seq("event_type"), maxLag = 4),
    Some {
      val wideCols = (1 to 4).map(k =>
        s"max(CASE WHEN lag = $k THEN acf END) AS a$k").mkString(", ")
      val exprs = DatetimeOps.pacfExprs(4)
      val arms = (1 to 4).map(k =>
        s"SELECT event_type, $k AS lag, round(${exprs(k - 1)}, 4) AS pacf FROM wide")
        .mkString(" UNION ALL ")
      s"""
      WITH acf AS (${acfOracleSql(4)}),
      wide AS (SELECT event_type, $wideCols FROM acf GROUP BY 1)
      $arms"""
    })

  /** CUSUM level-shift scan per event type: the running deviation sum's
    * absolute peak marks the most likely changepoint; the peak statistic
    * normalizes by the population stddev computed from the SAME exact
    * deviations. Ties on |cusum| break to the earliest day on both
    * engines.
    */
  val qTsCusum = Q(
    "q_ts_cusum",
    (s, dir) => DatetimeOps.cusumChangepoints(
      tables(s, dir).events, "ts", "value", Seq("event_type"), threshold = 5.0),
    Some("""
      WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type,
              CAST(sum(CAST(y AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS ybar,
              count(*) AS n
            FROM daily GROUP BY 1),
      d AS (SELECT daily.event_type, day, round(y - ybar, 8) AS dev, n
            FROM daily JOIN m ON daily.event_type = m.event_type),
      c AS (SELECT *, CAST(sum(CAST(dev AS DECIMAL(28,8))) OVER
              (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cusum
            FROM d),
      v AS (SELECT event_type,
              CAST(sum(CAST(round(dev * dev, 8) AS DECIMAL(28,8))) AS DOUBLE)
                / max(n) AS var
            FROM d GROUP BY 1),
      r AS (SELECT *, row_number() OVER
              (PARTITION BY event_type ORDER BY abs(cusum) DESC, day ASC) AS rk
            FROM c)
      SELECT r.event_type, day AS changepoint_day,
        CASE WHEN var > 0 THEN round(abs(cusum) / sqrt(var), 4) END AS peak_stat,
        CASE WHEN var > 0 THEN abs(cusum) / sqrt(var) > 5.0 ELSE false END AS shifted
      FROM r JOIN v ON r.event_type = v.event_type WHERE rk = 1"""))

  val qEwma = Q(
    "q_ewma",
    (s, dir) => DatetimeOps.ewmaLagged(
        tables(s, dir).events.withColumn("__us", unix_micros(col("ts"))),
        "value", Seq("user_id"), Seq("__us", "event_id"))
      .select(col("event_id"), col("user_id"), round(col("ewma"), 4).as("ewma")),
    Some {
      val terms = (0 until 5).map { k =>
        val wk = math.pow(0.5, k)
        (s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN $wk * lag(value, $k) OVER w ELSE 0.0 END",
          s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN CAST($wk AS DOUBLE) ELSE 0.0 END")
      }
      val num = terms.map(_._1).mkString(" + ")
      val den = terms.map(_._2).mkString(" + ")
      s"""
      SELECT event_id, user_id,
        round(CASE WHEN ($den) > 0 THEN ($num) / ($den) END, 4) AS ewma
      FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)"""
    })

  /** Interval join: events against 50 synthetic half-day-on windows via
    * the chunked equi-join (never BroadcastNestedLoop); aggregated to
    * per-window event counts.
    */
  val qIntervalJoin = Q(
    "q_interval_join",
    (s, dir) => {
      val dayUs = 86400000000L
      val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in micros
      val windows = s.range(0, 50).select(
        col("id").as("w"),
        (lit(t0) + col("id") * dayUs).as("w_start"),
        (lit(t0) + col("id") * dayUs + dayUs / 2).as("w_end"))
      val pts = tables(s, dir).events
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      graft.functions.AsofJoin
        .intervalJoin(pts, windows, "us", "w_start", "w_end", chunk = dayUs)
        .groupBy(col("w")).agg(count(lit(1)).as("n_events"))
    },
    Some("""
      WITH w AS (SELECT i AS w,
          1704067200000000 + i * 86400000000 AS s,
          1704067200000000 + i * 86400000000 + 43200000000 AS e
        FROM range(0, 50) t(i)),
      p AS (SELECT event_id, epoch_us(ts) AS us FROM events)
      SELECT w.w, count(*) AS n_events
      FROM p JOIN w ON p.us >= w.s AND p.us < w.e
      GROUP BY w.w"""))

  /** RANGE-framed rolling aggregation: per-user trailing-24h event count
    * and value sum at every event — a time framed window (rangeBetween on
    * the microsecond axis), unlike windowAggregator's row frames. The
    * window partitions on the user key; decimal sums keep the oracle
    * exact.
    */
  val qRolling24h = Q(
    "q_rolling_24h",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayUs = 86400000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
        .rangeBetween(-(dayUs - 1), 0)
      tables(s, dir).events
        .withColumn("__us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("sum_24h"))
    },
    Some("""
      SELECT event_id, user_id,
        count(*) OVER w AS n_24h,
        CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_24h
      FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY us
        RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)"""))

  /** Forward fill over planted gaps: error events' values are nulled,
    * then each user's series carries its last observation forward —
    * leading nulls stay null. Oracle replays the same window.
    */
  val qForwardFill = Q(
    "q_forward_fill",
    (s, dir) => {
      val e = tables(s, dir).events
        .withColumn("__us", unix_micros(col("ts")))
        .withColumn("value",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      DatetimeOps.forwardFill(e, Seq("value"), Seq("user_id"), Seq("__us", "event_id"))
        .select(col("event_id"), col("user_id"), col("value").as("value_filled"))
    },
    Some("""
      SELECT event_id, user_id,
        last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
      FROM events"""))

  /** Multi-format auto-detection round-trip: render events.ts into five
    * unrelated string layouts (12-hour am/pm, epoch seconds, month-name,
    * US month-first, compact), detect ALL of them in one sampling job,
    * cast back, and compare renders against the original timestamp
    * (identity oracle). Exercises the batched detection path end-to-end.
    */
  val qTsMultiformat = Q(
    "q_ts_multiformat",
    (s, dir) => {
      import graft.functions.AutoDetect
      val e = tables(s, dir).events
        .withColumn("ts0", date_trunc("second", col("ts")))
        .withColumn("s_ampm", date_format(col("ts0"), "yyyy-MM-dd h:mm:ss a"))
        .withColumn("s_epoch", unix_timestamp(col("ts0")).cast(StringType))
        .withColumn("s_mname", date_format(col("ts0"), "MMM d, yyyy"))
        .withColumn("s_euro", date_format(col("ts0"), "dd/MM/yyyy HH:mm:ss"))
        .withColumn("s_compact", date_format(col("ts0"), "yyyyMMddHHmmss"))
      val strCols = Seq("s_ampm", "s_epoch", "s_mname", "s_euro", "s_compact")
      val det = AutoDetect.detectTimestampColumns(e, strCols)
      val expected = Map(
        "s_ampm" -> "yyyy-MM-dd h:mm:ss a", "s_epoch" -> "epoch_seconds",
        "s_mname" -> "MMM d yyyy", "s_euro" -> "d/M/yyyy HH:mm:ss",
        "s_compact" -> "yyyyMMddHHmmss")
      det.foreach(x =>
        require(x.format.contains(expected(x.attribute)), s"detection failed: $x"))
      val cast = AutoDetect.tsPreprocess(e, det)
      cast.select(
        col("event_id"),
        date_format(col("s_ampm"), "yyyy-MM-dd HH:mm:ss").as("rt_ampm"),
        date_format(col("s_epoch"), "yyyy-MM-dd HH:mm:ss").as("rt_epoch"),
        date_format(col("s_mname"), "yyyy-MM-dd").as("rt_mname"),
        date_format(col("s_euro"), "yyyy-MM-dd HH:mm:ss").as("rt_euro"),
        date_format(col("s_compact"), "yyyy-MM-dd HH:mm:ss").as("rt_compact"))
    },
    Some("""
      SELECT event_id,
        strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS rt_ampm,
        strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS rt_epoch,
        strftime(date_trunc('second', ts), '%Y-%m-%d') AS rt_mname,
        strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS rt_euro,
        strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS rt_compact
      FROM events"""))

  /** Ordered conversion funnel (view → click → purchase): the classic
    * event-analytics shape. Sequential step times are stacked
    * conditional window mins over ONE user partitioning (t2 only counts
    * clicks after the user's first view, t3 only purchases after that
    * click), so the whole funnel costs a single shuffle — no
    * self-joins, no per-step rescans. Exact-integer single-row output.
    */
  val qFunnelSteps = Q(
    "q_funnel_steps",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      val e = tables(s, dir).events
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("t1", min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("us") > col("t1"), col("us"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("us") > col("t2"), col("us"))).over(w))
      e.groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("t1").isNotNull.cast("long")).as("step_view"),
          sum(col("t2").isNotNull.cast("long")).as("step_click"),
          sum(col("t3").isNotNull.cast("long")).as("step_purchase"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      f AS (SELECT user_id,
              min(CASE WHEN event_type = 'view' THEN us END)
                OVER (PARTITION BY user_id) AS t1, us, event_type
            FROM e),
      g AS (SELECT user_id, t1,
              min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
                OVER (PARTITION BY user_id) AS t2, us, event_type
            FROM f),
      h AS (SELECT user_id, t1, t2,
              min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
                OVER (PARTITION BY user_id) AS t3
            FROM g),
      u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
            FROM h GROUP BY user_id)
      SELECT count(*) AS n_users,
        CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
        CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
        CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
      FROM u"""))

  /** Cohort retention: users cohorted by first-activity day, activity
    * counted per day offset — one window min for the cohort day (single
    * user-partition shuffle, shared with nothing else) + one
    * distinct-count aggregate per (cohort, offset). Exact integers.
    */
  val qCohortRetention = Q(
    "q_cohort_retention",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      tables(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("cohort", min(col("day")).over(w))
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      c AS (SELECT user_id, day,
              min(day) OVER (PARTITION BY user_id) AS cohort FROM e)
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        CAST(date_diff('day', cohort, day) AS INT) AS offset_days,
        count(DISTINCT user_id) AS n_users
      FROM c GROUP BY 1, 2"""))

  /** ts_viz_data numeric arm (ref ts_analyzer.py:259-405): per-day
    * min/max/mean/exact-median of the value column — the daily-view
    * chart frame.
    */
  val qTsVizDaily = Q(
    "q_ts_viz_daily",
    (s, dir) => DatetimeOps.tsVizData(tables(s, dir).events, "ts", "value", "daily")
      .select(col("ts"), col("min"), col("max"),
        round(col("mean"), 4).as("mean"), round(col("median"), 4).as("median")),
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS ts,
        min(value) AS "min", max(value) AS "max",
        round(avg(value), 4) AS mean,
        round(quantile_cont(CAST(value AS DOUBLE), 0.5), 4) AS median
      FROM events GROUP BY 1"""))

  /** ts_viz_data categorical arm: top-3 event types (count desc, value
    * asc, nulls last — null is a real group and burns a top-N slot when
    * frequent, matching the reference's top_cat), the rest collapsed to
    * Others, counted per weekday.
    */
  val qTsVizWeekly = Q(
    "q_ts_viz_weekly",
    (s, dir) => DatetimeOps.tsVizData(
      tables(s, dir).events, "ts", "event_type", "weekly", nCat = 3),
    Some("""
      WITH top AS (SELECT event_type FROM events
                   GROUP BY event_type
                   ORDER BY count(*) DESC, event_type ASC NULLS LAST LIMIT 3),
      lab AS (SELECT CASE WHEN event_type IS NULL THEN
                            CASE WHEN EXISTS(SELECT 1 FROM top WHERE event_type IS NULL)
                                 THEN NULL ELSE 'Others' END
                          WHEN event_type IN (SELECT event_type FROM top WHERE event_type IS NOT NULL)
                          THEN event_type ELSE 'Others' END AS event_type,
                     dayofweek(ts) + 1 AS dow
              FROM events)
      SELECT event_type, CAST(dow AS INT) AS dow, count(*) AS count
      FROM lab GROUP BY 1, 2"""))

  def all: Seq[Q] = Seq(qDtExtract, qCalendarFlags, qDtArithmetic, qTsAggregatorFull, qTsDecompose, qTsAcf, qTsPacf, qTsCusum,
    qWindowAggregator, qLaggedTs, qDaypart, qTsAutodetect, qJsonExtract, qDtFormatConvert,
    qTsAnalyzer, qSessionization, qAsofJoin, qEwma, qIntervalJoin, qRolling24h,
    qForwardFill, qTsMultiformat, qFunnelSteps, qCohortRetention,
    qAsofForward, qAsofNearest, qAsofTolerance, qAsofStrict, qScd2Intervals,
    qTsEligibility, qTsVizDaily, qTsVizWeekly)
}
