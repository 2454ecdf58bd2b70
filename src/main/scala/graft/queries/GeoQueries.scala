package graft.queries

import graft.functions.Geo
import graft.queries.QueryPack._
import org.apache.spark.sql.functions._

/** Geospatial operator queries (SURVEY.md §2.10). The test tables carry
  * no geo columns, so lat/lon are derived deterministically from customer
  * keys (identical integer arithmetic on both engines; .25 offsets stay
  * exact in binary).
  */
object GeoQueries {

  private val latExpr = "((c_custkey * 7) % 160) - 80 + 0.25"
  private val lonExpr = "((c_custkey * 13) % 340) - 170 + 0.25"
  private val lat2Expr = "((c_custkey * 11) % 160) - 80 + 0.25"
  private val lon2Expr = "((c_custkey * 17) % 340) - 170 + 0.25"

  private def withPoints(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("lat", expr(latExpr))
    .withColumn("lon", expr(lonExpr))
    .withColumn("lat2", expr(lat2Expr))
    .withColumn("lon2", expr(lon2Expr))

  private val haversineSql =
    """2 * 6371.009 * atan2(
         sqrt(pow(sin(radians(lat2 - lat) / 2), 2)
              + cos(radians(lat)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon) / 2), 2)),
         sqrt(1 - (pow(sin(radians(lat2 - lat) / 2), 2)
              + cos(radians(lat)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon) / 2), 2))))"""

  private val pointsCte =
    s"""WITH pts AS (
        SELECT c_custkey, c_mktsegment,
          $latExpr AS lat, $lonExpr AS lon,
          $lat2Expr AS lat2, $lon2Expr AS lon2
        FROM customer)"""

  val qDistance = Q(
    "q_geo_distance",
    (s, dir) => {
      val pts = withPoints(tables(s, dir).customer)
      pts.select(
        col("c_custkey"),
        round(Geo.haversine(col("lat"), col("lon"), col("lat2"), col("lon2")), 4)
          .as("haversine_km"),
        round(Geo.euclideanKm(col("lat"), col("lon"), col("lat2"), col("lon2")), 4)
          .as("euclidean_km"))
    },
    Some(s"""$pointsCte
      SELECT c_custkey,
        round($haversineSql, 4) AS haversine_km,
        round(6371.009 * sqrt(
          pow(cos(radians(lat)) * cos(radians(lon)) - cos(radians(lat2)) * cos(radians(lon2)), 2)
          + pow(cos(radians(lat)) * sin(radians(lon)) - cos(radians(lat2)) * sin(radians(lon2)), 2)
          + pow(sin(radians(lat)) - sin(radians(lat2)), 2)), 4) AS euclidean_km
      FROM pts"""))

  val qCentroid = Q(
    "q_geo_centroid",
    (s, dir) => Geo.centroid(withPoints(tables(s, dir).customer),
      "c_mktsegment", "lat", "lon"),
    Some(s"""$pointsCte,
      c AS (SELECT c_mktsegment,
              sum(cos(radians(lat)) * cos(radians(lon)) * 1.0) / sum(1.0) AS x,
              sum(cos(radians(lat)) * sin(radians(lon)) * 1.0) / sum(1.0) AS y,
              sum(sin(radians(lat)) * 1.0) / sum(1.0) AS z
            FROM pts GROUP BY c_mktsegment)
      SELECT c_mktsegment,
        round(degrees(atan2(z, sqrt(pow(x, 2) + pow(y, 2)))), 4) AS centroid_lat,
        round(degrees(atan2(y, x)), 4) AS centroid_lon
      FROM c"""))

  val qRog = Q(
    "q_geo_rog",
    (s, dir) => Geo.radiusOfGyration(withPoints(tables(s, dir).customer),
      "c_mktsegment", "lat", "lon"),
    Some(s"""$pointsCte,
      c AS (SELECT c_mktsegment,
              sum(cos(radians(lat)) * cos(radians(lon)) * 1.0) / sum(1.0) AS x,
              sum(cos(radians(lat)) * sin(radians(lon)) * 1.0) / sum(1.0) AS y,
              sum(sin(radians(lat)) * 1.0) / sum(1.0) AS z
            FROM pts GROUP BY c_mktsegment),
      cent AS (SELECT c_mktsegment,
              round(degrees(atan2(z, sqrt(pow(x, 2) + pow(y, 2)))), 4) AS clat,
              round(degrees(atan2(y, x)), 4) AS clon
            FROM c),
      d AS (SELECT pts.c_mktsegment,
              2 * 6371.009 * atan2(
                sqrt(pow(sin(radians(clat - lat) / 2), 2)
                     + cos(radians(lat)) * cos(radians(clat)) * pow(sin(radians(clon - lon) / 2), 2)),
                sqrt(1 - (pow(sin(radians(clat - lat) / 2), 2)
                     + cos(radians(lat)) * cos(radians(clat)) * pow(sin(radians(clon - lon) / 2), 2)))) AS dist
            FROM pts JOIN cent ON pts.c_mktsegment = cent.c_mktsegment)
      SELECT c_mktsegment, round(avg(dist), 4) AS rog_km FROM d GROUP BY c_mktsegment"""))

  val qFormat = Q(
    "q_geo_format",
    (s, dir) => {
      val pts = withPoints(tables(s, dir).customer)
      pts.select(
        col("c_custkey"),
        Geo.ddToDms(col("lat")).as("lat_dms"),
        round(Geo.ddToRadians(col("lat")), 6).as("lat_rad"))
    },
    Some(s"""$pointsCte
      SELECT c_custkey,
        concat(CASE WHEN lat < 0 THEN '-' ELSE '' END,
               CAST(CAST(floor(abs(lat)) AS INT) AS VARCHAR), '°',
               CAST(CAST(floor((abs(lat) - floor(abs(lat))) * 60) AS INT) AS VARCHAR), '''',
               round((abs(lat) - floor(abs(lat))
                      - floor((abs(lat) - floor(abs(lat))) * 60) / 60) * 3600, 2), '"') AS lat_dms,
        round(radians(lat), 6) AS lat_rad
      FROM pts"""))

  /** Rectangle membership via the generic ray-casting UDF; the oracle can
    * express the same rectangle as range predicates.
    */
  val qPolygon = Q(
    "q_geo_in_polygon",
    (s, dir) => {
      val poly = Seq((0.0, -50.0), (0.0, 50.0), (60.0, 50.0), (60.0, -50.0))
      val pts = withPoints(tables(s, dir).customer)
      pts.select(col("c_custkey"),
        Geo.inPolygonUdf(poly)(col("lat"), col("lon")).cast("int").as("in_region"))
    },
    Some(s"""$pointsCte
      SELECT c_custkey,
        CASE WHEN lat > 0 AND lat < 60 AND lon > -50 AND lon < 50
             THEN 1 ELSE 0 END AS in_region
      FROM pts"""))

  /** Geohash encode/truncate/decode round-trip via the NATIVE codegen'd
    * expression (no DuckDB equivalent → rows-only; exactness is covered
    * by unit tests with known vectors).
    */
  val qGeohash = Q(
    "q_geohash",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val pts = withPoints(tables(s, dir).customer)
      pts.select(
        col("c_custkey"),
        expr("geohash_encode(cast(lat as double), cast(lon as double), 7)").as("gh7"))
        .withColumn("gh4", Geo.geohashPrecisionControl(col("gh7"), 4))
        .withColumn("lat_rt", round(Geo.geohashDecodeLatUdf(col("gh7")), 2))
    },
    // closed-form oracle: the bisection encoder is equivalent to taking
    // the top nlon/nlat bits of the normalized coordinates and
    // interleaving them (lon first). Precision 7 → 18 lon + 17 lat bits.
    // The interleave/base32 SQL is generated here so both engines share
    // one spec; decode-lat is the cell midpoint.
    Some {
      val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
      def bitExpr(i: Int): String =
        if (i % 2 == 0) s"((xi >> ${17 - i / 2}) & 1)"
        else s"((yi >> ${16 - (i - 1) / 2}) & 1)"
      val chars = (0 until 7).map { c =>
        val v = (0 until 5)
          .map(b => s"${bitExpr(5 * c + b)} * ${1 << (4 - b)}")
          .mkString(" + ")
        s"substring('$base32', CAST($v AS INT) + 1, 1)"
      }
      s"""
      WITH pts AS (
        SELECT c_custkey, $latExpr AS lat, $lonExpr AS lon FROM customer),
      idx AS (
        SELECT c_custkey, lat, lon,
          LEAST(CAST(floor((lon + 180) * 262144 / 360) AS BIGINT), 262143) AS xi,
          LEAST(CAST(floor((lat + 90) * 131072 / 180) AS BIGINT), 131071) AS yi
        FROM pts),
      enc AS (
        SELECT c_custkey, yi, ${chars.mkString(" || ")} AS gh7 FROM idx)
      SELECT c_custkey, gh7, substring(gh7, 1, 4) AS gh4,
             round((yi + 0.5) * 180.0 / 131072.0 - 90.0, 2) AS lat_rt
      FROM enc"""
    })

  /** Country membership via the broadcast bounding-box table (ref
    * geo_utils.py:799 point_in_country_approx). The oracle's VALUES table
    * is generated from the SAME Scala box constants — one source of truth.
    */
  val qInCountry = Q(
    "q_geo_in_country_boxes",
    (s, dir) => {
      val pts = withPoints(tables(s, dir).customer)
      Geo.locationCountries(pts, "lat", "lon")
        .filter(col("country_code").isNotNull)
        .groupBy("country_code", "country_name")
        .agg(count(lit(1)).as("n_points"))
    },
    Some {
      val rows = Geo.countryBoundingBoxes.toSeq.sortBy(_._1)
        .map { case (code, b) =>
          s"('$code', '${b.name.replace("'", "''")}', ${b.lonMin}, ${b.latMin}, ${b.lonMax}, ${b.latMax})"
        }
        .mkString(",\n            ")
      s"""$pointsCte,
          boxes(code, name, lon_min, lat_min, lon_max, lat_max) AS (VALUES
            $rows)
          SELECT code AS country_code, name AS country_name, count(*) AS n_points
          FROM pts JOIN boxes
            ON lat BETWEEN lat_min AND lat_max
            AND ((lon_min <= lon_max AND lon BETWEEN lon_min AND lon_max)
              OR (lon_min > lon_max AND (lon >= lon_min OR lon <= lon_max)))
          GROUP BY 1, 2"""
    })

  /** Offline reverse geocoding: nearest embedded capital (haversine
    * argmin over the broadcast 50-row gazetteer, partial-agg collapse).
    * Distances are rounded to 4 BEFORE the argmin on both engines, so
    * the winner selection is float-stable; ties break on country code.
    */
  val qReverseGeocode = Q(
    "q_reverse_geocode",
    (s, dir) => Geo.reverseGeocode(
      withPoints(tables(s, dir).customer), Seq("c_custkey"), "lat", "lon"),
    Some {
      val capValues = Geo.countryCapitals.map(c =>
        s"('${c.code}', '${c.city}', CAST(${c.lat} AS DOUBLE), CAST(${c.lon} AS DOUBLE))")
        .mkString(",\n        ")
      val capHaversine =
        """2 * 6371.009 * atan2(
             sqrt(pow(sin(radians(clat - lat) / 2), 2)
                  + cos(radians(lat)) * cos(radians(clat)) * pow(sin(radians(clon - lon) / 2), 2)),
             sqrt(1 - (pow(sin(radians(clat - lat) / 2), 2)
                  + cos(radians(lat)) * cos(radians(clat)) * pow(sin(radians(clon - lon) / 2), 2))))"""
      s"""$pointsCte,
      caps(code, city, clat, clon) AS (VALUES
        $capValues),
      d AS (SELECT c_custkey, code, city,
              round($capHaversine, 4) AS dkm
            FROM pts CROSS JOIN caps),
      r AS (SELECT *, row_number() OVER
              (PARTITION BY c_custkey ORDER BY dkm, code) AS rn FROM d)
      SELECT c_custkey, code AS rg_country_code, city AS rg_city,
             dkm AS rg_distance_km
      FROM r WHERE rn = 1"""
    })

  def all: Seq[Q] = Seq(qDistance, qCentroid, qRog, qFormat, qPolygon, qGeohash,
    qInCountry, qReverseGeocode)
}
