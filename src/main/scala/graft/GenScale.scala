package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale tier from an existing one by key-remapped
  * replication — used to produce a local sf1 for the TriScale growth
  * guard (the driver only ships sf0.001/0.01/0.1; /root/testdata is
  * read-only, so the output goes to a scratch dir).
  *
  * Shapes preserved on purpose:
  *  - lineitem: order keys offset per replica (key space grows with the
  *    data, like a real 10× corpus), measures untouched — quantile/PCA
  *    fit costs scale with rows, distinct keys scale with rows.
  *  - documents: doc ids offset; text passed through a PER-REPLICA
  *    letter permutation (`translate`), so replicas are NOT near-dups of
  *    each other and the near-dup/cluster density per doc stays at the
  *    source tier's level instead of inflating 10×. An identical-copy
  *    replication would make every doc a member of a 10-clone cluster
  *    and measure a different (denser) workload, not a bigger one.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> [factor=10]
  */
object GenScale {
  private val alphabet = "aeiousnrtlc" // 11 letters → shifts 1..10 all distinct

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    // ONE shared order-key offset so the lineitem↔orders join keeps
    // resolving inside each replica
    val okOff = math.max(
      li.agg(max("l_orderkey")).first().getLong(0),
      ord.agg(max("o_orderkey")).first().getLong(0)) + 1
    (0 until factor).map(i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * okOff)))
      .reduce(_ unionAll _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // orders: order keys ride the shared offset; customer keys offset per
    // replica too, so the customer→supplier graph grows in NODES with the
    // data (suppliers stay shared across replicas and become 10×-degree
    // hubs — exactly the power-law growth the salted-PageRank and
    // degree-oriented-triangle paths are built for)
    val ckOff = ord.agg(max("o_custkey")).first().getLong(0) + 1
    (0 until factor).map(i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * okOff))
          .withColumn("o_custkey", col("o_custkey") + lit(i * ckOff)))
      .reduce(_ unionAll _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // events: event ids and USER ids offset per replica — per-user event
    // counts stay at the source tier's level, so window/sessionization
    // state per key is constant while the key space grows 10× (the shape
    // a real bigger event log has); timestamps untouched (days get
    // denser, like real traffic growth). ts ships as the raw nanos longs
    // it was read as (nanosAsLong) — Tables converts on read either way.
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evOff = ev.agg(max("event_id")).first().getLong(0) + 1
    val userOff = ev.agg(max("user_id")).first().getLong(0) + 1
    (0 until factor).map(i =>
        ev.withColumn("event_id", col("event_id") + lit(i * evOff))
          .withColumn("user_id", col("user_id") + lit(i * userOff)))
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val idOff = docs.agg(max("doc_id")).first().getLong(0) + 1
    (0 until factor).map { i =>
        val shifted = alphabet.drop(i % alphabet.length) + alphabet.take(i % alphabet.length)
        docs.withColumn("doc_id", col("doc_id") + lit(i * idOff))
          .withColumn("text", translate(col("text"), alphabet, shifted))
      }
      .reduce(_ unionAll _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // supplier: keys offset per replica; names pass through a PER-REPLICA
    // digit permutation (`translate`), so replicas are not 1-edit
    // variants of each other and the fuzzy-pair density per name stays at
    // the source tier's level — the documents letter-permutation argument
    // (identical names would put every supplier in a 10-clone variant
    // bucket: a denser workload, not a bigger one)
    val sup = spark.read.parquet(s"$src/supplier.parquet")
    val skOff = sup.agg(max("s_suppkey")).first().getLong(0) + 1
    val digits = "0123456789"
    (0 until factor).map { i =>
        val shiftedD = digits.drop(i % digits.length) + digits.take(i % digits.length)
        sup.withColumn("s_suppkey", col("s_suppkey") + lit(i * skOff))
          .withColumn("s_name", translate(col("s_name"), digits, shiftedD))
      }
      .reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    // embeddings: vec ids offset per replica; each replica's vectors go
    // through a PER-REPLICA dimension rotation — an orthogonal transform,
    // so norms and all WITHIN-replica cosines (and thus the source tier's
    // near-dup/cluster structure) are preserved exactly, while a vector
    // and its rotated copy in another replica are decorrelated (cosine ≈
    // random) instead of being a 10-clone semantic-dup cluster. Identical-
    // copy replication would measure a denser workload, not a bigger one
    // — the same argument as the documents letter permutation.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecOff = emb.agg(max("vec_id")).first().getLong(0) + 1
    (0 until factor).map { i =>
        val d = size(col("embedding"))
        val rotated =
          if (i == 0) col("embedding")
          else concat(
            slice(col("embedding"), lit(i + 1), d - lit(i)),
            slice(col("embedding"), lit(1), lit(i)))
        emb.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
          .withColumn("embedding", rotated)
      }
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    System.err.println(s"[genscale] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
