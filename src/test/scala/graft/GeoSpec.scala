package graft

import graft.functions.Geo
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("geohash encode matches public test vectors") {
    assert(Geo.geohashEncode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geo.geohashEncode(42.6, -5.6, 5) == "ezs42")
    val (lat, lon) = Geo.geohashDecode("ezs42")
    assert(math.abs(lat - 42.6) < 0.03 && math.abs(lon + 5.6) < 0.03)
  }

  test("haversine matches known city distance") {
    // Paris (48.8566, 2.3522) — London (51.5074, -0.1278) ≈ 343.5 km
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("lat1", "lon1", "lat2", "lon2")
    val km = d.select(Geo.haversine(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .first().getDouble(0)
    assert(math.abs(km - 343.5) < 1.0)
  }

  test("centroid of symmetric points is their middle") {
    val d = Seq(("g", 10.0, 20.0), ("g", -10.0, 20.0)).toDF("id", "lat", "lon")
    val c = Geo.centroid(d, "id", "lat", "lon").first()
    assert(math.abs(c.getDouble(1)) < 1e-6 && math.abs(c.getDouble(2) - 20.0) < 1e-6)
  }

  test("radius of gyration grows with spread") {
    val tight = Seq(("g", 10.0, 10.0), ("g", 10.1, 10.1)).toDF("id", "lat", "lon")
    val wide = Seq(("g", 0.0, 0.0), ("g", 20.0, 20.0)).toDF("id", "lat", "lon")
    val rTight = Geo.radiusOfGyration(tight, "id", "lat", "lon").first().getDouble(1)
    val rWide = Geo.radiusOfGyration(wide, "id", "lat", "lon").first().getDouble(1)
    assert(rTight < 15 && rWide > 1000)
  }

  test("vincenty matches haversine within ellipsoidal correction") {
    // Paris—London: vincenty (WGS-84) ≈ 343.9 km
    val v = Geo.vincentyKm(48.8566, 2.3522, 51.5074, -0.1278)
    assert(math.abs(v - 343.9) < 1.0)
    assert(Geo.vincentyKm(10.0, 20.0, 10.0, 20.0) == 0.0)
  }

  test("feature stability estimation propagates moments through a formula") {
    import graft.operators.StabilityEstimation
    import graft.operators.StabilityEstimation.AttrStats
    // stable base attributes → stable derived feature
    val stable = Seq.fill(3)(Map("x" -> AttrStats(10.0, 1.0), "y" -> AttrStats(5.0, 0.5)))
    val r1 = StabilityEstimation.featureStabilityEstimation(spark, "x + 2 * y", stable).first()
    assert(r1.getAs[Double]("stability_index_lower_bound") == 4.0)
    // f0 = mean propagation: f(10,5) = 20
    val props = StabilityEstimation.propagate(spark, "x + 2 * y", stable)
    assert(math.abs(props.head.mean - 20.0) < 1e-6)
    assert(math.abs(props.head.stddev - math.sqrt(1.0 + 4 * 0.25)) < 1e-3)
    // drifting means → low score
    val drifting = Seq(
      Map("x" -> AttrStats(10.0, 1.0)), Map("x" -> AttrStats(100.0, 1.0)),
      Map("x" -> AttrStats(-50.0, 1.0)))
    val r2 = StabilityEstimation.featureStabilityEstimation(spark, "x * 3", drifting).first()
    assert(r2.getAs[Int]("mean_si") == 0)
  }

  test("point-in-polygon ray casting") {
    val triangle = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    assert(Geo.pointInPolygon(2.0, 2.0, triangle))
    assert(!Geo.pointInPolygon(8.0, 8.0, triangle))
  }

  test("geo cluster analysis recovers separated clusters via elbow") {
    val rnd = new scala.util.Random(3)
    val pts = Seq((0.0, 0.0), (40.0, 40.0), (-40.0, 70.0)).flatMap { case (clat, clon) =>
      (1 to 100).map(_ => (clat + rnd.nextGaussian(), clon + rnd.nextGaussian()))
    }
    val d = pts.toDF("lat", "lon")
    val (k, labeled) = Geo.clusterAnalysis(d, "lat", "lon", maxK = 6)
    assert(k == 3, s"elbow picked $k")
    assert(labeled.select("geo_cluster").distinct().count() == 3)

    // deterministic sibling at fixed k: same blobs, each blob must land
    // in ONE cell, and assignments must be partition-invariant
    val withId = pts.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
      .toDF("id", "lat", "lon")
    val det = Geo.clusterAnalysisDeterministic(withId, "id", "lat", "lon", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(det.size == 300)
    val byBlob = (0 until 3).map(b => (0 until 100).map(i => det((b * 100 + i).toLong)).toSet)
    assert(byBlob.forall(_.size == 1), s"blob split across cells: $byBlob")
    assert(byBlob.flatten.toSet.size == 3, "blobs must map to distinct cells")
    val det2 = Geo.clusterAnalysisDeterministic(withId.repartition(7), "id", "lat", "lon", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(det == det2)
  }

  test("DBSCAN + silhouette recovers planted clusters and flags noise") {
    val rnd = new scala.util.Random(11)
    // three tight blobs (~±0.2°) far apart + 5 isolated noise points
    val blobs = Seq((0.0, 0.0), (40.0, 40.0), (-40.0, 70.0)).flatMap { case (clat, clon) =>
      (1 to 60).map(_ => (clat + 0.2 * rnd.nextGaussian(), clon + 0.2 * rnd.nextGaussian()))
    }
    val noise = Seq((70.0, -150.0), (-70.0, 150.0), (10.0, -120.0), (65.0, 10.0), (-20.0, -30.0))
    val d = (blobs ++ noise).toDF("lat", "lon")
    val r = Geo.dbscanClusterAnalysis(d, "lat", "lon")
    assert(r.nClusters == 3, s"dbscan found ${r.nClusters} clusters")
    assert(r.silhouette > 0.7, s"weak silhouette ${r.silhouette}")
    val labels = r.labeled.select(col("lat"), col("geo_cluster_dbscan")).collect()
      .map(row => row.getDouble(0) -> row.getInt(1))
    // all blob members share their blob's label; noise points are -1
    val blobLabels = Seq(0.0, 40.0, -40.0).map { clat =>
      labels.filter(p => math.abs(p._1 - clat) < 2).map(_._2).distinct.toSeq
    }
    assert(blobLabels.forall(ls => ls.length == 1 && ls.head >= 0), s"blob labels: $blobLabels")
    assert(blobLabels.flatten.distinct.length == 3)
    assert(labels.filter(p => p._1 == 70.0 || p._1 == -70.0).forall(_._2 == -1))
  }

  test("local DBSCAN matches expected membership on a line fixture") {
    // 5 points in a 10km chain + 1 far point; eps=15km, minSamples=3
    val pts = Array((0.0, 0.0), (0.05, 0.0), (0.1, 0.0), (0.15, 0.0), (0.2, 0.0), (5.0, 5.0))
    val labels = Geo.dbscanLocal(pts, epsKm = 15.0, minSamples = 3)
    assert(labels.take(5).distinct.toSeq == Seq(0))
    assert(labels(5) == -1)
  }

  test("deterministic DBSCAN matches classic dbscanLocal partitioning on unambiguous fixtures") {
    // two well-separated chains + isolated noise; every border point has
    // core neighbors from exactly ONE cluster, so classic DBSCAN's
    // BFS-order-dependent border assignment is unique and the min-id
    // sibling must produce the identical partition
    val pts = Array(
      (0.0, 0.0), (0.05, 0.0), (0.1, 0.0), (0.15, 0.0), (0.2, 0.0), // chain A
      (40.0, 40.0), (40.05, 40.0), (40.1, 40.0), (40.15, 40.0),     // chain B
      (70.0, -120.0))                                               // noise
    val classic = Geo.dbscanLocal(pts, epsKm = 15.0, minSamples = 3)
    val d = pts.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
      .toSeq.toDF("id", "lat", "lon")
    val det = Geo.dbscanDeterministic(d, "id", "lat", "lon", epsKm = 15.0, minSamples = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same partition: points share a det label iff they share a classic label
    for (i <- pts.indices; j <- pts.indices) {
      val sameClassic = classic(i) >= 0 && classic(i) == classic(j)
      val sameDet = det(i.toLong) >= 0 && det(i.toLong) == det(j.toLong)
      assert(sameClassic == sameDet, s"pair ($i,$j): classic=$sameClassic det=$sameDet")
    }
    // noise agrees exactly
    pts.indices.foreach { i =>
      assert((classic(i) == -1) == (det(i.toLong) == -1L), s"noise mismatch at $i")
    }
    // labels are min member ids (the documented stable convention)
    assert(det(0L) == 0L && det(5L) == 5L && det(9L) == -1L)
  }

  test("native geohash_encode expression matches the pure function (codegen path)") {
    graft.plans.GraftFunctions.register(spark)
    val d = Seq((57.64911, 10.40744), (42.6, -5.6)).toDF("lat", "lon")
    val out = d.selectExpr("geohash_encode(cast(lat as double), cast(lon as double), 5) AS gh")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("u4pru", "ezs42"))
    // null-safe
    val n = spark.sql("SELECT geohash_encode(CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE), 5)")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("dd to dms formatting") {
    val d = Seq(30.25, -45.5).toDF("dd")
    val dms = d.select(Geo.ddToDms(col("dd"))).collect().map(_.getString(0))
    assert(dms(0) == "30°15'0.0\"" && dms(1) == "-45°30'0.0\"")
  }

  test("location in country: flags, nulls, and the broadcast box join") {
    // Kansas City is in the US box; Paris in FR; the null row stays null
    val d = Seq(
      (1L, Some(39.1), Some(-94.6)),
      (2L, Some(48.85), Some(2.35)),
      (3L, None: Option[Double], None: Option[Double])
    ).toDF("id", "lat", "lon")
    val flags = d.select(col("id"),
      Geo.locationInCountry(col("lat"), col("lon"), "US").as("us"),
      Geo.locationInCountry(col("lat"), col("lon"), "FR").as("fr"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(flags(1L) == ((1, 0)) && flags(2L) == ((0, 1)))
    assert(flags(3L) == ((null, null)))
    intercept[IllegalArgumentException](Geo.locationInCountry(col("lat"), col("lon"), "XX"))

    val joined = Geo.locationCountries(d, "lat", "lon")
    val byId = joined.filter(col("country_code").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toSeq
      .groupMap(_._1)(_._2)
    assert(byId(1L).contains("US") && byId(2L).contains("FR"))
    // the null-coord row survives the left join with NULL country
    assert(joined.filter(col("id") === 3 && col("country_code").isNull).count() == 1)
    // dimension must broadcast: no shuffle on the fact side
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("golden parity: reference location_distance expected values") {
    // ref test_geospatial.py test_location_distance: row id=1 of
    // sample_geo_data_two_latlon.csv must give these integer metre
    // distances (haversine / vincenty / euclidean, EARTH_RADIUS 6371009)
    val path = "/root/reference/data/test_dataset/geo_data/sample_geo_data_two_latlon.csv"
    assume(new java.io.File(path).exists())
    val df = spark.read.option("header", "true").csv(path)
      .select(col("id").cast("int").as("id"),
        col("lat1").cast("double"), col("lon1").cast("double"),
        col("lat2").cast("double"), col("lon2").cast("double"))
      .filter(col("id") === 1)
    val r = df.select(
      (Geo.haversine(col("lat1"), col("lon1"), col("lat2"), col("lon2")) * 1000).as("hav_m"),
      (Geo.euclideanKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")) * 1000).as("euc_m"),
      (Geo.vincentyUdf(col("lat1"), col("lon1"), col("lat2"), col("lon2")) * 1000).as("vin_m"))
      .collect()(0)
    assert(r.getDouble(0).toInt == 17394182, s"haversine ${r.getDouble(0)}")
    assert(r.getDouble(2).toInt == 17373936, s"vincenty ${r.getDouble(2)}")
    assert(r.getDouble(1).toInt == 12473414, s"euclidean ${r.getDouble(1)}")
  }

  test("golden parity: reference dd→dms divmod parts and geohash strings") {
    val path = "/root/reference/data/test_dataset/geo_data/sample_geo_data_two_latlon.csv"
    assume(new java.io.File(path).exists())
    val row = spark.read.option("header", "true").csv(path)
      .select(col("id").cast("int").as("id"),
        col("lat1").cast("double"), col("lon1").cast("double"),
        col("lat2").cast("double"), col("lon2").cast("double"))
      .filter(col("id") === 1)
      .select(
        Geo.ddToDmsParts(col("lat1")).as("p1"), Geo.ddToDmsParts(col("lon1")).as("p2"),
        Geo.ddToDmsParts(col("lat2")).as("p3"), Geo.ddToDmsParts(col("lon2")).as("p4"),
        Geo.dmsPartsToDd(Geo.ddToDmsParts(col("lat1")).getField("degree"),
          Geo.ddToDmsParts(col("lat1")).getField("minute"),
          Geo.ddToDmsParts(col("lat1")).getField("second")).as("rt"),
        col("lat1"),
        Geo.geohashEncodeUdf(col("lat1"), col("lon1"), lit(8)).as("gh1"),
        Geo.geohashEncodeUdf(col("lat2"), col("lon2"), lit(8)).as("gh2"))
      .collect()(0)
    // ref test_geospatial.py test_geo_format_latlon: divmod int parts per
    // coordinate of row id=1, and the precision-8 geohash strings
    def ints(field: String): (Int, Int, Int) = {
      val s = row.getAs[org.apache.spark.sql.Row](field)
      (s.getDouble(0).toInt, s.getDouble(1).toInt, s.getDouble(2).toInt)
    }
    assert(ints("p1") == ((-83, 40, 24)), s"lat1 ${ints("p1")}")
    assert(ints("p2") == ((-127, 21, 26)), s"lon1 ${ints("p2")}")
    assert(ints("p3") == ((62, 24, 12)), s"lat2 ${ints("p3")}")
    assert(ints("p4") == ((105, 7, 56)), s"lon2 ${ints("p4")}")
    assert(math.abs(row.getAs[Double]("rt") - row.getAs[Double]("lat1")) < 1e-9)
    assert(row.getAs[String]("gh1") == "11mgwhvt")
    assert(row.getAs[String]("gh2") == "y74g025n")
  }

  test("reverse geocoding resolves the nearest capital, drops null coords") {
    def jd(v: Double): java.lang.Double = java.lang.Double.valueOf(v)
    val d = Seq(
      (1L, jd(48.9), jd(2.4)),                         // ~Paris
      (2L, jd(35.7), jd(139.7)),                       // ~Tokyo
      (3L, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double])
    ).toDF("id", "lat", "lon")
    val out = Geo.reverseGeocode(d, Seq("id"), "lat", "lon")
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getDouble(3))).toMap
    assert(rows(1L)._1 == "FR" && rows(1L)._2 == "Paris" && rows(1L)._3 < 20.0)
    assert(rows(2L)._1 == "JP" && rows(2L)._2 == "Tokyo" && rows(2L)._3 < 20.0)
    assert(!rows.contains(3L)) // null coords cannot be geocoded
    // map-only contract: the packed-least argmin needs no join, no
    // aggregate, and no exchange at all
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Aggregate"), plan)
  }
}
