package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp & geo column auto-detection
  * (ref: data_ingest/ts_auto_detection.py:95-258 — REGEX_PARTS /
  * REGEX_PATTERNS_PARSERS format table — and geo_auto_detection.py:23-177).
  *
  * 100 TB posture: detection runs ONE sampling job for ALL candidate
  * columns — a row-capped slice followed by a single aggregate computing
  * `slice(collect_set(c), 1, sampleCap)` per column — so driver state is
  * O(cols * sampleCap) and job count is O(1), not O(cols). (The previous
  * shape, one distinct().limit().collect() job per column, was the §4
  * per-column-job-loop anti-pattern.) The cast itself is a distributed
  * codegen'd try_to_timestamp over the full data.
  */
object AutoDetect {

  // ---- regex building blocks (ref: ts_auto_detection.py:95-148) ----
  private val Y  = """(?:19[4-9]\d|20[0-3]\d)"""                  // 1940-2039
  private val y2 = """(?:\d\d)"""                                 // 2-digit year
  private val m  = """(?:1[012]|0?[1-9])"""                       // month 1-12
  private val mz = """(?:1[012]|0[1-9])"""                        // zero-padded month
  private val d  = """(?:3[01]|[12]\d|0?[1-9])"""                 // day 1-31
  private val dz = """(?:3[01]|[12]\d|0[1-9])"""                  // zero-padded day
  private val H  = """(?:2[0-3]|[01]?\d)"""                       // hour 0-23
  private val I  = """(?:1[012]|0?[1-9])"""                       // 12h hour
  private val M  = """(?:[0-5]\d)"""                              // minute
  private val S  = """(?:[0-5]\d|6[01])"""                        // second (leap)
  // month tokens accept the reference's Malay variants too
  // (ts_auto_detection.py:100-113 B group: MAC, MEI, OGOS, OKT, DIS, …)
  private val B3 = """(?:JAN|FEB|MAR|MAC|APR|MAY|MEI|JUN|JUL|AUG|OGO|SEP|OCT|OKT|NOV|DEC|DIS)"""
  private val BF =
    """(?:JANUARY|JANUARI|FEBRUARY|FEBRUARI|MARCH|APRIL|MAY|MEI|JUNE?|JULY|JULAI|AUGUST|OGOS|SEPTEMBER|OCTOBER|OKTOBER|NOVEMBER|DECEMBER|DISEMBER)"""
  private val th = """(?:ST|ND|RD|TH)"""                          // ordinal suffix
  private val A3 = """(?:MON|TUE|WED|THU|FRI|SAT|SUN)"""          // day-name abbrev
  // full/abbrev day names, English + Malay (ref A group,
  // ts_auto_detection.py:154-163: ISNIN/SELASA/RABU/KHAMIS/JUMAAT/
  // SABTU/AHAD and their short forms)
  private val AA =
    """(?:MON(?:DAY)?|TUE(?:S(?:DAY)?)?|WED(?:NESDAY)?|THU(?:RS(?:DAY)?)?|FRI(?:DAY)?|SAT(?:URDAY)?|SUN(?:DAY)?|ISN(?:IN)?|SEN(?:IN)?|SEL(?:ASA)?|RABU?|KHA(?:MIS)?|JUM(?:AAT)?|SAB(?:TU)?|AHA?D|MIN(?:GGU)?)"""
  private val ap = """(?:[AP]\.? ?M\.?)"""                        // am/pm marker
  private val tz = """(?:[+-](?:0\d|1[0-4]):?(?:00|15|30|45))"""  // utc offset
  // curated common subset of the reference's Z group (the full Wikipedia
  // timezone-abbreviation list, ts_auto_detection.py:139-152); parsed as
  // the naive local time like the reference's default tz="Local"
  private val ZA =
    """(?:UTC|GMT|EST|EDT|CST|CDT|MST|MDT|PST|PDT|AKST|AKDT|HST|AST|ADT|NST|NDT|AEST|AEDT|ACST|ACDT|AWST|BST|CET|CEST|EET|EEST|WET|WEST|MSK|IST|JST|KST|SGT|HKT|MYT|WIB|WITA|WIT|NZST|NZDT|CAT|EAT|WAT|SAST)"""

  /** Pre-parse normalization family for a format. */
  sealed trait Norm
  case object NoNorm    extends Norm
  /** canonical `Aug`/`August` casing; strip ordinals, commas, quotes */
  case object MonthNorm extends Norm
  /** uppercase AM/PM; strip periods (`p.m.` → `PM`) */
  case object AmPmNorm  extends Norm
  case object EpochSec  extends Norm
  case object EpochMs   extends Norm
  case object EpochUs   extends Norm
  /** strip the leading "Mon, " day-name token (Spark's CORRECTED parser
    * cannot PARSE EEE), then month normalization
    */
  case object RfcNorm   extends Norm
  /** Spark's flexible ISO cast (fractional seconds / offsets) */
  case object IsoAuto   extends Norm
  /** strip a trailing timezone-abbreviation token (parsed as the naive
    * local time, the reference's default tz="Local"), then parse `inner`
    */
  final case class TzAbbrev(inner: String) extends Norm
  /** strip a leading day-name token (English or Malay), then month
    * normalization and parse `inner`
    */
  final case class DayPrefix(inner: String) extends Norm
  /** "14-15 Aug 2023" day ranges resolve to the range START (the
    * reference's d_range part keeps the first day)
    */
  case object DayRange  extends Norm
  /** "1430 HRS" military time */
  case object MilitaryHrs extends Norm
  /** "12 NOON" / "12 MIDNIGHT" (ref p2 group) */
  case object NoonMidnight extends Norm

  final case class TsFormat(
      regex: String,
      fmt: String,
      norm: Norm = NoNorm,
      ci: Boolean = false) {
    lazy val pattern: Pattern =
      Pattern.compile(regex, if (ci) Pattern.CASE_INSENSITIVE else 0)
  }

  /** Candidate formats, probed in order. Ties in match rate resolve to the
    * EARLIER entry, so day-first layouts precede month-first (the reference
    * pins dateutil to dayfirst, ts_auto_detection.py:333) and full
    * datetimes precede bare dates.
    */
  val tsFormats: Seq[TsFormat] = Seq(
    // ---- ISO datetime family ----
    TsFormat(s"^$Y-$mz-$dz $H:$M:$S$$",                      "yyyy-MM-dd HH:mm:ss"),
    TsFormat(s"^$Y-$mz-${dz}T$H:$M:$S$$",                    "yyyy-MM-dd'T'HH:mm:ss"),
    TsFormat(s"^$Y-$mz-$dz[T ]$H:$M:$S\\.\\d{1,9}(?:Z|$tz)?$$", "iso_fractional", IsoAuto),
    TsFormat(s"^$Y-$mz-$dz[T ]$H:$M:$S(?:Z|$tz)$$",          "iso_offset", IsoAuto),
    TsFormat(s"^$Y-$mz-$dz $H:$M$$",                         "yyyy-MM-dd HH:mm"),
    TsFormat(s"^$Y/$m/$d $H:$M:$S$$",                        "yyyy/M/d HH:mm:ss"),
    TsFormat(s"^$Y$mz$dz$H$M$S$$",                           "yyyyMMddHHmmss"),
    TsFormat(s"^$Y$mz${dz}T$H$M$S$$",                        "yyyyMMdd'T'HHmmss"),
    // ---- 12-hour datetime (am/pm) ----
    TsFormat(s"^$Y-$mz-$dz $I:$M:$S ?$ap$$",                 "yyyy-MM-dd h:mm:ss a", AmPmNorm, ci = true),
    TsFormat(s"^$Y-$mz-$dz $I:$M ?$ap$$",                    "yyyy-MM-dd h:mm a", AmPmNorm, ci = true),
    TsFormat(s"^$d/$m/$Y $I:$M ?$ap$$",                      "d/M/yyyy h:mm a", AmPmNorm, ci = true),
    // ---- day-first datetimes ----
    TsFormat(s"^$d/$m/$Y $H:$M:$S$$",                        "d/M/yyyy HH:mm:ss"),
    TsFormat(s"^$d-$m-$Y $H:$M:$S$$",                        "d-M-yyyy HH:mm:ss"),
    // ---- month-first datetimes ----
    TsFormat(s"^$m/$d/$Y $H:$M:$S$$",                        "M/d/yyyy HH:mm:ss"),
    TsFormat(s"^$m-$d-$Y $H:$M:$S$$",                        "M-d-yyyy HH:mm:ss"),
    // ---- ISO-ish dates ----
    TsFormat(s"^$Y-$mz-$dz$$",                               "yyyy-MM-dd"),
    TsFormat(s"^$Y/$m/$d$$",                                 "yyyy/M/d"),
    TsFormat(s"^$Y\\.$m\\.$d$$",                             "yyyy.M.d"),
    TsFormat(s"^$Y $m $d$$",                                 "yyyy M d"),
    TsFormat(s"^$Y$mz$dz$$",                                 "yyyyMMdd"),
    // ---- day-first dates (4-digit year) ----
    TsFormat(s"^$d/$m/$Y$$",                                 "d/M/yyyy"),
    TsFormat(s"^$d-$m-$Y$$",                                 "d-M-yyyy"),
    TsFormat(s"^$d\\.$m\\.$Y$$",                             "d.M.yyyy"),
    TsFormat(s"^$d $m $Y$$",                                 "d M yyyy"),
    TsFormat(s"^$dz$mz$Y$$",                                 "ddMMyyyy"),
    // ---- month-first dates (4-digit year) ----
    TsFormat(s"^$m/$d/$Y$$",                                 "M/d/yyyy"),
    TsFormat(s"^$m-$d-$Y$$",                                 "M-d-yyyy"),
    TsFormat(s"^$m\\.$d\\.$Y$$",                             "M.d.yyyy"),
    TsFormat(s"^$mz$dz$Y$$",                                 "MMddyyyy"),
    // ---- 2-digit-year dates (day-first, then month-first, then yy-first;
    //      Spark's `yy` maps to 2000-2099) ----
    TsFormat(s"^$d/$m/$y2$$",                                "d/M/yy"),
    TsFormat(s"^$d-$m-$y2$$",                                "d-M-yy"),
    TsFormat(s"^$d\\.$m\\.$y2$$",                            "d.M.yy"),
    TsFormat(s"^$m/$d/$y2$$",                                "M/d/yy"),
    TsFormat(s"^$m-$d-$y2$$",                                "M-d-yy"),
    TsFormat(s"^$y2/$m/$d$$",                                "yy/M/d"),
    TsFormat(s"^$y2-$m-$d$$",                                "yy-M-d"),
    TsFormat(s"^$y2\\.$m\\.$d$$",                            "yy.M.d"),
    // ---- month-name dates ----
    TsFormat(s"^$d$th? $B3,? $Y$$",                          "d MMM yyyy", MonthNorm, ci = true),
    TsFormat(s"^$d$th? $BF,? $Y$$",                          "d MMMM yyyy", MonthNorm, ci = true),
    TsFormat(s"^$d$th?-$B3-$Y$$",                            "d-MMM-yyyy", MonthNorm, ci = true),
    TsFormat(s"^$B3 $d$th?,? $Y$$",                          "MMM d yyyy", MonthNorm, ci = true),
    TsFormat(s"^$BF $d$th?,? $Y$$",                          "MMMM d yyyy", MonthNorm, ci = true),
    TsFormat(s"^$B3-$d$th?-$Y$$",                            "MMM-d-yyyy", MonthNorm, ci = true),
    TsFormat(s"^$d$th?-$B3-'?$y2$$",                         "d-MMM-yy", MonthNorm, ci = true),
    TsFormat(s"^$B3 $Y$$",                                   "MMM yyyy", MonthNorm, ci = true),
    TsFormat(s"^$BF $Y$$",                                   "MMMM yyyy", MonthNorm, ci = true),
    // ---- month-name datetimes (RFC-1123-style) ----
    TsFormat(s"^$A3, ?$d $B3 $Y $H:$M:$S$$",                 "rfc1123_datetime", RfcNorm, ci = true),
    TsFormat(s"^$d $B3 $Y $H:$M:$S$$",                       "d MMM yyyy HH:mm:ss", MonthNorm, ci = true),
    TsFormat(s"^$d $B3 $Y $H:$M$$",                          "d MMM yyyy HH:mm", MonthNorm, ci = true),
    // ---- day-name-prefixed dates/datetimes (English + Malay day names,
    //      ref A group; comma optional) ----
    TsFormat(s"^$AA,? ?$d $B3,? $Y $H:$M:$S$$",              "dayname_datetime", DayPrefix("d MMM yyyy HH:mm:ss"), ci = true),
    TsFormat(s"^$AA,? ?$d $B3,? $Y$$",                       "dayname_date_abbrev", DayPrefix("d MMM yyyy"), ci = true),
    TsFormat(s"^$AA,? ?$d $BF,? $Y$$",                       "dayname_date_full", DayPrefix("d MMMM yyyy"), ci = true),
    // ---- day ranges "14-15 Aug 2023" → range start (ref d_range) ----
    TsFormat(s"^$d ?- ?$d $B3 $Y$$",                         "day_range_month", DayRange, ci = true),
    // ---- timezone-abbreviation datetimes (naive local parse, ref Z) ----
    TsFormat(s"^$Y-$mz-$dz $H:$M:$S $ZA$$",                  "tz_abbrev_iso", TzAbbrev("yyyy-MM-dd HH:mm:ss"), ci = true),
    TsFormat(s"^$d/$m/$Y $H:$M:$S $ZA$$",                    "tz_abbrev_dmy", TzAbbrev("d/M/yyyy HH:mm:ss"), ci = true),
    // ---- time-only (parses onto the epoch date, like to_timestamp) ----
    TsFormat(s"^$H:$M:$S$$",                                 "H:mm:ss"),
    TsFormat(s"^$H:$M$$",                                    "H:mm"),
    TsFormat(s"^$I:$M:$S ?$ap$$",                            "h:mm:ss a", AmPmNorm, ci = true),
    TsFormat(s"^$I:$M ?$ap$$",                               "h:mm a", AmPmNorm, ci = true),
    TsFormat(s"^$I ?$ap$$",                                  "h a", AmPmNorm, ci = true),
    // ---- military / noon-midnight times (ref p/p2 groups) ----
    TsFormat(s"^(?:2[0-3]|[01]\\d)$M ?HRS$$",                "military_hrs", MilitaryHrs, ci = true),
    TsFormat("^12 ?(?:NOON|MIDNIGHT|MIDNITE)$",              "noon_midnight", NoonMidnight, ci = true),
    // ---- bare year (the reference's productivity.csv YR contract:
    //      regex_date_time_parser casts int years to Jan-1 dates,
    //      test_ts_auto_detection.py:58-60) ----
    TsFormat(s"^$Y$$",                                       "yyyy"),
    // ---- epoch strings (1x-prefixed to avoid phone/id collisions) ----
    TsFormat("^1[0-9]{9}$",                                  "epoch_seconds", EpochSec),
    TsFormat("^1[0-9]{12}$",                                 "epoch_millis", EpochMs),
    TsFormat("^1[0-9]{15}$",                                 "epoch_micros", EpochUs))

  private val formatByFmt: Map[String, TsFormat] =
    tsFormats.map(f => f.fmt -> f).toMap

  final case class TsDetection(attribute: String, format: Option[String], matchRate: Double)

  /** One sampling job for ALL columns, DETERMINISTICALLY: small inputs
    * (≤ 2·rowCap, from the ~free count — parquet answers it from footer
    * metadata) are taken whole; larger ones keep rows whose xxhash64
    * content hash falls under the 2·rowCap/n threshold, so
    * WHICH rows feed detection is a pure function of the data (the
    * previous `limit(rowCap)` slice was partition-layout dependent and
    * blind to formats appearing only late in the table; the hash filter
    * spreads the sample across the whole table). The per-column sets are
    * then `slice(sort_array(collect_set(c)))` in a single aggregate —
    * sorted so the surviving slice is deterministic too. Driver state
    * stays O(cols · sampleCap); job count stays O(1).
    */
  private[graft] def sampleDistincts(
      df: DataFrame,
      cols: Seq[String],
      sampleCap: Int,
      rowCap: Int = 20000): Map[String, Seq[String]] = {
    val strings = df.select(cols.map(c => col(c).cast(StringType).as(c)): _*)
    val n = strings.count()
    val capped =
      if (n <= 2L * rowCap) strings
      else {
        // xxhash64 >>> 1 is uniform on [0, 2^63); keep the sub-threshold
        // slice. xxhash64, not the md5 family: the sample feeds the format
        // HEURISTIC only - nothing external replays it - and the native
        // hash keeps the full-scan filter ~10x cheaper than md5
        val frac = 2.0 * rowCap / n
        val thr = math.floor(frac * 9.223372036854775e18).toLong
        strings.filter(
          shiftrightunsigned(xxhash64(cols.map(col): _*), 1) < lit(thr))
      }
    val row = capped
      .select(cols.map(c => slice(sort_array(collect_set(col(c))), 1, sampleCap).as(c)): _*)
      .head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) Seq.empty[String] else row.getSeq[String](i))
    }.toMap
  }

  /** Detect the datetime format of string columns from a capped distinct
    * sample; a column is a timestamp candidate when >= minMatchRate of its
    * sampled values match one format. All columns share ONE Spark job.
    */
  def detectTimestampColumns(
      df: DataFrame,
      cols: Seq[String],
      sampleCap: Int = 1000,
      minMatchRate: Double = 0.8): Seq[TsDetection] = {
    if (cols.isEmpty) return Seq.empty
    val samples = sampleDistincts(df, cols, sampleCap)
    cols.map { c =>
      val sample = samples(c)
      if (sample.isEmpty) TsDetection(c, None, 0.0)
      else {
        val scored = tsFormats.map { f =>
          (f.fmt, sample.count(v => f.pattern.matcher(v.trim).matches()).toDouble / sample.length)
        }
        val (fmt, rate) = scored.maxBy(_._2)
        TsDetection(c, if (rate >= minMatchRate) Some(fmt) else None, rate)
      }
    }
  }

  /** Malay month token → English (ref accepts both spellings,
    * ts_auto_detection.py:100-113); longest-first so OKTOBER doesn't
    * partially match OKT's replacement.
    */
  private val malayMonths: Seq[(String, String)] = Seq(
    // full forms → full English (MMMM parses full names only)
    "JANUARI" -> "JANUARY", "FEBRUARI" -> "FEBRUARY", "DISEMBER" -> "DECEMBER",
    "OKTOBER" -> "OCTOBER", "JULAI" -> "JULY", "OGOS" -> "AUGUST",
    // abbreviations → English abbreviations (MMM)
    "MAC" -> "MAR", "MEI" -> "MAY", "OGO" -> "AUG", "OKT" -> "OCT",
    "DIS" -> "DEC")

  /** canonical month casing; strip ordinals, commas, quotes; translate
    * Malay month tokens to the English names Java's parser knows
    */
  private def monthClean(c: Column): Column = {
    val translated = malayMonths.foldLeft(c) { case (acc, (my, en)) =>
      regexp_replace(acc, s"(?i)\\b$my\\b", en)
    }
    initcap(lower(regexp_replace(
      regexp_replace(translated, "(?i)(\\d)(st|nd|rd|th)", "$1"),
      "[,'‘’]", "")))
  }

  /** Distributed cast of one string column under a detected format —
    * normalization + try_to_timestamp, all codegen'd builtins.
    */
  def castColumn(c: Column, fmt: String): Column = {
    val f = formatByFmt.getOrElse(fmt, TsFormat("", fmt))
    f.norm match {
      case EpochSec => timestamp_seconds(c.cast(LongType))
      case EpochMs  => timestamp_millis(c.cast(LongType))
      case EpochUs  => timestamp_micros(c.cast(LongType))
      case IsoAuto  => c.cast(TimestampType)
      case MonthNorm =>
        // initcap only capitalizes at whitespace boundaries — normalize
        // dash-separated month layouts ("15-aug-2020") to spaces and
        // parse with the space form of the pattern, else lowercase month
        // tokens stay lowercase and the case-sensitive parser nulls out
        if (f.fmt.contains("-"))
          try_to_timestamp(
            monthClean(regexp_replace(trim(c), "-", " ")),
            lit(f.fmt.replace('-', ' ')))
        else try_to_timestamp(monthClean(trim(c)), lit(f.fmt))
      case RfcNorm =>
        val noDay = regexp_replace(trim(c), "(?i)^[a-z]+, *", "")
        try_to_timestamp(monthClean(noDay), lit("d MMM yyyy HH:mm:ss"))
      case TzAbbrev(inner) =>
        // the abbreviation names a zone, but the reference's default
        // tz="Local" parses the wall-clock part as-is — mirror that
        try_to_timestamp(
          regexp_replace(trim(c), s"(?i) ?$ZA$$", ""), lit(inner))
      case DayPrefix(inner) =>
        val noDay = regexp_replace(trim(c), s"(?i)^$AA,? *", "")
        try_to_timestamp(monthClean(noDay), lit(inner))
      case DayRange =>
        val start = regexp_replace(trim(c), "^(\\d{1,2}) ?- ?\\d{1,2}", "$1")
        try_to_timestamp(monthClean(start), lit("d MMM yyyy"))
      case MilitaryHrs =>
        try_to_timestamp(
          regexp_replace(upper(trim(c)), " ?HRS$", ""), lit("HHmm"))
      case NoonMidnight =>
        try_to_timestamp(
          regexp_replace(
            regexp_replace(upper(trim(c)), "^12 ?(?:MIDNIGHT|MIDNITE)$", "00:00"),
            "^12 ?NOON$", "12:00"),
          lit("H:mm"))
      case AmPmNorm =>
        // collapse the whole marker token in one pass ("a. m." → "AM" —
        // stripping only periods left "A M", which 'a' cannot parse),
        // then guarantee the single space the 'a' pattern requires
        // ("9:45AM" → "9:45 AM")
        val marker = regexp_replace(upper(trim(c)), "([AP])\\.? ?M\\.?", "$1M")
        try_to_timestamp(
          regexp_replace(marker, "([0-9])(AM|PM)$", "$1 $2"), lit(f.fmt))
      case NoNorm =>
        try_to_timestamp(trim(c), lit(f.fmt))
    }
  }

  // suffix matches require a snake/camel boundary — a bare `(id)$`
  // alternation would hit "grid"/"paid"/"monkey" and silently suppress
  // genuine epoch detections on those columns
  private val idLikeRe =
    ("(?i)(^|[_-])(id|ids|key|keys|code|num|no|number|phone|tel|msisdn|mobile|account|acct)([_-]|$)" +
      "|[a-z0-9](Id|Key|Phone|Number)$|(?i)[_-](id|key|phone|number)$" +
      "|(?i)(userid|uid|uuid|guid)$").r

  /** Heuristic: does this column NAME look like an identifier/phone
    * rather than a time? Ten-digit id columns whose values mostly start
    * with '1' clear the epoch_seconds regex purely by accident.
    */
  private[graft] def isIdLikeName(name: String): Boolean =
    idLikeRe.findFirstIn(name).isDefined

  /** Drop epoch-family detections on id/phone-looking column names —
    * applied by auto mode, where EVERY string column is probed and a
    * numeric id that happens to start with '1' would otherwise be
    * destructively rewritten to timestamps. Explicitly listed columns
    * bypass this guard (the caller asserted they are times).
    */
  def epochIdGuard(detections: Seq[TsDetection]): Seq[TsDetection] =
    detections.map { d =>
      if (d.format.exists(_.startsWith("epoch")) && isIdLikeName(d.attribute))
        d.copy(format = None)
      else d
    }

  /** ref: ts_auto_detection.py:622 ts_preprocess — cast every detected
    * column with its inferred format (ANSI-safe try_to_timestamp).
    */
  def tsPreprocess(df: DataFrame, detections: Seq[TsDetection]): DataFrame =
    detections.foldLeft(df) {
      case (acc, TsDetection(c, Some(fmt), _)) => acc.withColumn(c, castColumn(col(c), fmt))
      case (acc, _)                            => acc
    }

  final case class GeoDetection(latCols: Seq[String], lonCols: Seq[String], geohashCols: Seq[String])

  /** ref: geo_auto_detection.py:23-177 — name heuristics + sampled range
    * checks. A numeric column whose name contains "lat" with values in
    * [-90,90] is a latitude; "lon"/"lng" in [-180,180] a longitude; a
    * base32 string column named "geohash" (or fully base32, len<=12) a
    * geohash. All range checks share ONE full-scan aggregate; geohash
    * value-samples share one row-capped job.
    */
  def detectGeoColumns(df: DataFrame, sampleCap: Int = 1000): GeoDetection = {
    val (num, cat, _) = graft.core.ColumnRole.segregate(df.schema)
    val latCand = num.filter(_.toLowerCase.contains("lat"))
    val lonCand = num.filter { c =>
      val n = c.toLowerCase
      n.contains("lon") || n.contains("lng")
    }
    val rangeCand = latCand ++ lonCand
    val ranges: Map[String, (Option[Double], Option[Double])] =
      if (rangeCand.isEmpty) Map.empty
      else {
        val aggs = rangeCand.flatMap(c =>
          Seq(min(col(c)).cast(DoubleType).as(s"min_$c"), max(col(c)).cast(DoubleType).as(s"max_$c")))
        val r = df.select(aggs: _*).head()
        rangeCand.zipWithIndex.map { case (c, i) =>
          c -> (
            (if (r.isNullAt(2 * i)) None else Some(r.getDouble(2 * i))),
            (if (r.isNullAt(2 * i + 1)) None else Some(r.getDouble(2 * i + 1))))
        }.toMap
      }
    def inRange(c: String, lo: Double, hi: Double): Boolean = ranges(c) match {
      case (Some(mn), Some(mx)) => mn >= lo && mx <= hi
      case _                    => false
    }
    val lats = latCand.filter(inRange(_, -90, 90))
    val lons = lonCand.filter(inRange(_, -180, 180))
    val ghNamed  = cat.filter(_.toLowerCase.contains("geohash"))
    val ghByName = ghNamed.toSet
    val ghCand   = cat.filterNot(ghByName)
    val ghSampled =
      if (ghCand.isEmpty) Seq.empty[String]
      else {
        val samples = sampleDistincts(df, ghCand, sampleCap)
        ghCand.filter { c =>
          val s = samples(c)
          s.nonEmpty && s.forall(v => v.length <= 12 && v.matches("[0-9b-hjkmnp-z]+"))
        }
      }
    GeoDetection(lats, lons, cat.filter(c => ghByName(c) || ghSampled.contains(c)))
  }
}
