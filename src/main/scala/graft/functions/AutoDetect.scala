package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp & geo column auto-detection
  * (ref: data_ingest/ts_auto_detection.py:51-553 and
  * geo_auto_detection.py:23-177).
  *
  * 100 TB posture: format inference runs over a CAPPED sample of
  * DISTINCT values (the reference collected unbounded distincts,
  * ts_auto_detection.py:312 — here driver state is O(sampleCap)); the
  * cast itself is then a distributed to_timestamp over the full data.
  */
object AutoDetect {

  /** Candidate datetime formats, probed in order (regex gate + parse). */
  val tsPatterns: Seq[(String, String)] = Seq(
    ("""^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$""", "yyyy-MM-dd HH:mm:ss"),
    ("""^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$""", "yyyy-MM-dd'T'HH:mm:ss"),
    ("""^\d{4}-\d{2}-\d{2}$""", "yyyy-MM-dd"),
    ("""^\d{2}/\d{2}/\d{4}$""", "dd/MM/yyyy"),
    ("""^\d{2}-\d{2}-\d{4}$""", "dd-MM-yyyy"),
    ("""^\d{4}/\d{2}/\d{2}$""", "yyyy/MM/dd"),
    ("""^\d{8}$""", "yyyyMMdd"),
    ("""^\d{2}\.\d{2}\.\d{4}$""", "dd.MM.yyyy"))

  final case class TsDetection(attribute: String, format: Option[String], matchRate: Double)

  /** Detect the datetime format of string columns from a capped distinct
    * sample; a column is a timestamp candidate when >= minMatchRate of its
    * sampled values match one format.
    */
  def detectTimestampColumns(
      df: DataFrame,
      cols: Seq[String],
      sampleCap: Int = 1000,
      minMatchRate: Double = 0.8): Seq[TsDetection] = {
    cols.map { c =>
      val sample = df.select(col(c).cast(StringType)).filter(col(c).isNotNull)
        .distinct().limit(sampleCap).collect().map(_.getString(0))
      if (sample.isEmpty) TsDetection(c, None, 0.0)
      else {
        val scored = tsPatterns.map { case (re, fmt) =>
          (fmt, sample.count(_.matches(re)).toDouble / sample.length)
        }
        val (fmt, rate) = scored.maxBy(_._2)
        TsDetection(c, if (rate >= minMatchRate) Some(fmt) else None, rate)
      }
    }
  }

  /** ref: ts_auto_detection.py:622 ts_preprocess — cast every detected
    * column with its inferred format (ANSI-safe try_to_timestamp).
    */
  def tsPreprocess(df: DataFrame, detections: Seq[TsDetection]): DataFrame =
    detections.foldLeft(df) {
      case (d, TsDetection(c, Some(fmt), _)) =>
        d.withColumn(c, expr(s"try_to_timestamp(`$c`, '$fmt')"))
      case (d, _) => d
    }

  final case class GeoDetection(latCols: Seq[String], lonCols: Seq[String], geohashCols: Seq[String])

  /** ref: geo_auto_detection.py:23-177 — name heuristics + sampled range
    * checks. A numeric column whose name contains "lat" with values in
    * [-90,90] is a latitude; "lon"/"lng" in [-180,180] a longitude; a
    * base32 string column named "geohash" (or fully base32, len<=12) a
    * geohash.
    */
  def detectGeoColumns(df: DataFrame, sampleCap: Int = 1000): GeoDetection = {
    val (num, cat, _) = graft.core.ColumnRole.segregate(df.schema)
    def inRange(c: String, lo: Double, hi: Double): Boolean = {
      val r = df.select(min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType)).first()
      !r.isNullAt(0) && r.getDouble(0) >= lo && r.getDouble(1) <= hi
    }
    val lats = num.filter(c => c.toLowerCase.contains("lat") && inRange(c, -90, 90))
    val lons = num.filter { c =>
      val n = c.toLowerCase
      (n.contains("lon") || n.contains("lng")) && inRange(c, -180, 180)
    }
    val ghs = cat.filter { c =>
      c.toLowerCase.contains("geohash") || {
        val sample = df.select(col(c)).filter(col(c).isNotNull).limit(sampleCap)
          .collect().map(_.getString(0))
        sample.nonEmpty && sample.forall(v => v.length <= 12 && v.matches("[0-9b-hjkmnp-z]+"))
      }
    }
    GeoDetection(lats, lons, ghs)
  }
}
