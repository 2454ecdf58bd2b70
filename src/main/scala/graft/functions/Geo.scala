package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial surface (ref: data_transformer/geospatial.py + geo_utils.py).
  * Distance/centroid/ROG math is pure Catalyst trig (codegen'd, no UDF —
  * the reference wrapped everything in Python UDFs); geohash encode/decode
  * and point-in-polygon are small deterministic Scala UDFs over pure
  * functions, applied per-row with broadcast constants.
  */
object Geo {

  val EarthRadiusKm = 6371.0088

  // ------------------------------------------------------------- distances

  /** ref: geo_utils.py:228 haversine — great-circle distance in km. */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * atan2(sqrt(a), sqrt(lit(1) - a))
  }

  /** ref: geo_utils.py:325 euclidean distance on unit-sphere cartesian
    * coordinates, scaled to km.
    */
  def euclideanKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val (x1, y1, z1) = cartesian(lat1, lon1)
    val (x2, y2, z2) = cartesian(lat2, lon2)
    lit(EarthRadiusKm) * sqrt(pow(x1 - x2, 2) + pow(y1 - y2, 2) + pow(z1 - z2, 2))
  }

  /** ref: geo_utils.py:283 vincenty — iterative inverse geodesic on the
    * WGS-84 ellipsoid (pure function + UDF; the iteration doesn't fit a
    * closed-form Catalyst expression). Distance in km.
    */
  def vincentyKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val a = 6378137.0; val f = 1 / 298.257223563; val b = (1 - f) * a
    val l = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(lat2)))
    val (sinU1, cosU1) = (math.sin(u1), math.cos(u1))
    val (sinU2, cosU2) = (math.sin(u2), math.cos(u2))
    var lambda = l
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 100 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinL, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosL, 2))
      if (sinSigma == 0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = l + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - deltaSigma) / 1000.0
  }

  val vincentyUdf = udf((lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
    vincentyKm(lat1, lon1, lat2, lon2))

  /** Unit-sphere cartesian (ref: geo_utils.py:161 from_latlon). */
  def cartesian(lat: Column, lon: Column): (Column, Column, Column) = (
    cos(radians(lat)) * cos(radians(lon)),
    cos(radians(lat)) * sin(radians(lon)),
    sin(radians(lat)))

  // ------------------------------------------------------- format converts

  /** Decimal degrees → degrees/minutes/seconds string (ref: geospatial.py:39). */
  def ddToDms(dd0: Column): Column = {
    val dd = dd0.cast("double") // decimal inputs would format seconds as "0.00"
    val sign = when(dd < 0, "-").otherwise("")
    val a = abs(dd)
    val d = floor(a)
    val m = floor((a - d) * 60)
    val s = round((a - d - m / 60) * 3600, 2)
    concat(sign, d.cast("int"), lit("°"), m.cast("int"), lit("'"), s, lit("\""))
  }

  def ddToRadians(dd: Column): Column = radians(dd)
  def radiansToDd(r: Column): Column = degrees(r)

  // ----------------------------------------------------------- geohash UDF

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Pure geohash encode (public algorithm; ref exposes the same op via
    * the python geohash lib, geospatial.py:333).
    */
  def geohashEncode(lat: Double, lon: Double, precision: Int): String = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new StringBuilder
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Geohash decode → (lat, lon) cell centre. */
  def geohashDecode(gh: String): (Double, Double) = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    var isLon = true
    gh.foreach { c =>
      val ch = base32.indexOf(c)
      (4 to 0 by -1).foreach { b =>
        val bit = (ch >> b) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  val geohashEncodeUdf = udf((lat: Double, lon: Double, p: Int) => geohashEncode(lat, lon, p))
  val geohashDecodeLatUdf = udf((gh: String) => geohashDecode(gh)._1)
  val geohashDecodeLonUdf = udf((gh: String) => geohashDecode(gh)._2)

  /** ref: geospatial.py:653 geohash_precision_control — truncation. */
  def geohashPrecisionControl(gh: Column, precision: Int): Column =
    substring(gh, 1, precision)

  // ----------------------------------------------------- polygon membership

  /** Ray-casting point-in-polygon (ref: geo_utils.py:368-502), pure
    * function applied via UDF with the polygon broadcast in the closure.
    */
  def pointInPolygon(lat: Double, lon: Double, poly: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = poly.length - 1
    var i = 0
    while (i < poly.length) {
      val (yi, xi) = poly(i)
      val (yj, xj) = poly(j)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def inPolygonUdf(poly: Seq[(Double, Double)]) =
    udf((lat: Double, lon: Double) => pointInPolygon(lat, lon, poly))

  // --------------------------------------------------- centroid / ROG aggs

  /** ref: geospatial.py:975-1098 centroid — mean unit-sphere cartesian per
    * group, back to lat/lon via atan2. One groupBy, pure SQL.
    */
  def centroid(df: DataFrame, idCol: String, latCol: String, lonCol: String,
      weight: Option[Column] = None): DataFrame = {
    val (x, y, z) = cartesian(col(latCol), col(lonCol))
    val w = weight.getOrElse(lit(1.0))
    df.groupBy(col(idCol))
      .agg(
        (sum(x * w) / sum(w)).as("__x"),
        (sum(y * w) / sum(w)).as("__y"),
        (sum(z * w) / sum(w)).as("__z"))
      .select(
        col(idCol),
        round(degrees(atan2(col("__z"), sqrt(pow(col("__x"), 2) + pow(col("__y"), 2)))), 4)
          .as("centroid_lat"),
        round(degrees(atan2(col("__y"), col("__x"))), 4).as("centroid_lon"))
  }

  /** ref: geospatial_analyzer.py:390-733 geo cluster analysis — the
    * reference runs MiniBatchKMeans with an elbow search on a capped
    * pandas sample; here spark.ml KMeans on a seeded capped sample, k
    * chosen by the largest second difference of WSSE (elbow), labels
    * applied distributed. Returns (k, labeled frame).
    */
  def clusterAnalysis(
      df: DataFrame,
      latCol: String,
      lonCol: String,
      maxK: Int = 8,
      sampleCap: Long = 100000L,
      seed: Long = 42L): (Int, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = df.withColumn("__fv",
      array_to_vector(array(col(latCol).cast("double"), col(lonCol).cast("double"))))
    val fitDf = graft.operators.QualityChecker.sampleCapped(feat, Some(sampleCap), seed)
    val costs = (2 to maxK).map { k =>
      val m = new KMeans().setK(k).setSeed(seed)
        .setFeaturesCol("__fv").setPredictionCol("__c").fit(fitDf)
      k -> m.summary.trainingCost
    }
    val bestK =
      if (costs.size < 3) costs.head._1
      else costs.sliding(3).map { w =>
        (w(1)._1, (w(0)._2 - w(1)._2) - (w(1)._2 - w(2)._2))
      }.maxBy(_._2)._1
    val model = new KMeans().setK(bestK).setSeed(seed)
      .setFeaturesCol("__fv").setPredictionCol("geo_cluster").fit(fitDf)
    (bestK, model.transform(feat).drop("__fv"))
  }

  /** ref: geospatial.py:1223-1334 rog_calculation — mean haversine
    * distance to the group centroid (broadcast-joined back), km.
    */
  def radiusOfGyration(df: DataFrame, idCol: String, latCol: String, lonCol: String): DataFrame = {
    val cent = centroid(df, idCol, latCol, lonCol)
    df.join(broadcast(cent), Seq(idCol))
      .groupBy(col(idCol))
      .agg(round(avg(
        haversine(col(latCol), col(lonCol), col("centroid_lat"), col("centroid_lon"))), 4)
        .as("rog_km"))
  }
}
