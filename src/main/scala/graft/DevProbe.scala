package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for in-round investigation (not part of the driver
  * contract; deleted or repurposed freely between rounds).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sql")) {
      val s = graft.queries.VarClusSql.sql(Seq("l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_partkey", "l_suppkey"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/varclus.sql"), s)
      println(s"wrote ${s.length} chars to /tmp/varclus.sql")
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables(spark, sfDir).lineitem
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_partkey", "l_suppkey")
    System.err.println("== portable ==")
    val port = graft.operators.VarClus.variableClusteringPortable(
      li, cols, trace = true)
    port.orderBy("Cluster", "Attribute").show(20, false)
    System.err.println("== full (Breeze) ==")
    val full = graft.operators.VarClus.variableClustering(li, cols)
    full.orderBy("Cluster", "Attribute").show(20, false)
    spark.stop()
  }
}
