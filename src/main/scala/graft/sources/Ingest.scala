package graft.sources

import graft.core.Reshape
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read/write/reshape ETL surface (ref: data_ingest/data_ingest.py).
  * Everything is declarative DataFrame API so Catalyst keeps pushdown,
  * pruning and join planning.
  */
object Ingest {

  /** ref: data_ingest.py:23-51 `read_dataset`. `avro` first tries the
    * spark-avro connector (when bundled, as the reference's distribution
    * does) and falls back to the built-in avro-mapred path ([[AvroIO]]) —
    * same container format either way.
    */
  def readDataset(
      spark: SparkSession,
      filePath: String,
      fileType: String,
      options: Map[String, String] = Map.empty): DataFrame =
    if (fileType == "avro") {
      try spark.read.format(fileType).options(options).load(filePath)
      catch {
        case e: Throwable if isMissingAvroConnector(e) => AvroIO.read(spark, filePath)
      }
    } else spark.read.format(fileType).options(options).load(filePath)

  private def isMissingAvroConnector(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Failed to find data source: avro") ||
      m.contains("Failed to find the data source: avro") ||
      m.contains("Avro is built-in but external data source")
  }

  /** ref: data_ingest.py:54-117 `write_dataset` — repartition if target
    * partition count above current, else coalesce (avoids a shuffle on
    * shrink, same rule as data_ingest.py:108-117).
    */
  def writeDataset(
      df: DataFrame,
      filePath: String,
      fileType: String,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty,
      repartitionTo: Option[Int] = None,
      partitionBy: Seq[String] = Nil,
      columnOrder: Seq[String] = Nil): Unit = {
    // ref write_dataset column_order contract
    // (test_data_ingest_unit.py:97-137): reorder on write; a list that
    // doesn't cover the schema exactly is an error, as is a
    // non-positive repartition count
    repartitionTo.foreach(n => require(n > 0, s"repartition count must be positive, got $n"))
    val ordered =
      if (columnOrder.isEmpty) df
      else {
        require(columnOrder.length == df.columns.length &&
          columnOrder.toSet == df.columns.toSet,
          s"column_order ${columnOrder.mkString(",")} must be a permutation of " +
            s"the schema ${df.columns.mkString(",")}")
        df.select(columnOrder.map(col): _*)
      }
    val out = repartitionTo match {
      // repartition (not coalesce-if-smaller): probing df.rdd for the
      // current partition count forces physical-plan materialization and
      // defeats AQE; a round-robin shuffle to exactly n gives evenly
      // sized output files, and AQE still coalesces the write if n is
      // oversized.
      case Some(n) => ordered.repartition(n)
      case None => ordered
    }
    if (fileType == "avro") {
      try {
        val w = out.write.format(fileType).options(options).mode(mode)
        val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
        pw.save(filePath)
      } catch {
        case e: Throwable if isMissingAvroConnector(e) =>
          require(partitionBy.isEmpty, "avro fallback writer does not support partitionBy")
          AvroIO.write(out, filePath, mode)
      }
    } else {
      val w = out.write.format(fileType).options(options).mode(mode)
      val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
      pw.save(filePath)
    }
  }

  /** Range-clustered write: `repartitionByRange(clusterCols)` +
    * `sortWithinPartitions` before the parquet write, so each output
    * file covers a NARROW range of the cluster keys. Parquet row-group
    * min/max statistics then let any later range/equality filter on
    * those keys skip whole files — the linear-clustering half of what
    * Z-ORDER gives, from two builtin operators. At 100 TB this is the
    * difference between scanning a shard and scanning the table for
    * time-range or key-range queries.
    */
  def writeClustered(
      df: DataFrame,
      filePath: String,
      clusterCols: Seq[String],
      numFiles: Int,
      mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty && numFiles > 0, "need cluster columns and a file count")
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(filePath)
  }

  /** Z-value of a row: each column is scaled to a `bits`-bit integer bin
    * over its [min, max] range (nulls and degenerate ranges bin to 0,
    * out-of-range values clamp), and the bins' bits are interleaved —
    * bit `i` of column `j` lands at position `i·k + j`. Rows close in
    * EVERY dimension get close z-values, which is what makes a z-sorted
    * layout skippable on any subset of the cluster columns. Pure Column
    * arithmetic (bits·k shift/mask terms, all codegen'd); the identical
    * expression is SQL-replayable, which is how the roundtrip oracle
    * checks the interleave bit-for-bit.
    */
  def zorderValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == mins.size && mins.size == maxs.size,
      "zorderValue needs one (min, max) per column")
    require(bits >= 1 && bits * cols.size <= 62, "z-value must fit a signed long")
    val k = cols.size
    val scale = (1L << bits).toDouble
    val top = (1L << bits) - 1L
    val bins = cols.zipWithIndex.map { case (c, j) =>
      val (mn, mx) = (mins(j), maxs(j))
      if (mx <= mn) lit(0L)
      else coalesce(
        least(greatest(
          floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(scale)), lit(0.0)),
          lit(top.toDouble)).cast("long"),
        lit(0L))
    }
    val terms = for {
      i <- 0 until bits
      j <- 0 until k
    } yield shiftleft(shiftright(bins(j), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustered write: range-partition + sort on the interleaved
    * z-value of `zCols`, then drop the helper column before the parquet
    * write. Each output file covers one compact z-range — a TILE of the
    * multi-dimensional key space — so parquet min/max stats stay tight
    * on EVERY cluster column and a later filter on any of them (not just
    * the leading one, which is all a linear sort can serve) skips files.
    * The min/max scan that anchors the bins is one tiny aggregate; at
    * 100 TB this is the layout that turns multi-dimension slice queries
    * from full scans into tile reads.
    */
  def writeZOrdered(
      df: DataFrame,
      filePath: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16,
      mode: String = "overwrite"): Unit = {
    require(zCols.size >= 2, "z-ordering needs at least 2 columns (use writeClustered for 1)")
    require(numFiles > 0, "need a file count")
    val stats = df.select(zCols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    val mins = zCols.indices.map(i => if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i))
    val maxs = zCols.indices.map(i => if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1))
    val z = zorderValue(zCols.map(col), mins, maxs, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(filePath)
  }

  /** Bucketed managed-table write: pre-shuffles once at write time so
    * later equi-joins/aggregations on the bucket keys run WITHOUT a
    * shuffle (both sides bucketed on the same keys ⇒ sort-merge join
    * with no exchange). This is the co-located-join tactic for repeated
    * 100 TB joins; the reference has no equivalent (it re-shuffles every
    * run).
    */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode).bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** ref: data_ingest.py:120-152 `concatenate_dataset`.
    * method "name" = align by column name (unionByName);
    * method "index" = positional union against the first frame's arity.
    */
  def concatenateDataset(dfs: Seq[DataFrame], method: String = "name"): DataFrame = {
    require(dfs.nonEmpty, "concatenate of zero frames")
    method match {
      case "name" => Reshape.pairwiseReduce(dfs)(_ unionByName _)
      case "index" =>
        val arity = dfs.head.columns.length
        require(dfs.forall(_.columns.length == arity), "positional union needs equal arity")
        Reshape.pairwiseReduce(dfs)(_ union _)
      case m => throw new IllegalArgumentException(s"unknown concat method: $m")
    }
  }

  /** ref: data_ingest.py:155-198 `join_dataset` — n-ary equi-join on
    * shared key(s), balanced pairwise so plan depth stays O(log n).
    * Catalyst picks broadcast vs shuffle per pair; callers can pre-wrap
    * small dims in `broadcast(...)`.
    */
  def joinDataset(dfs: Seq[DataFrame], keys: Seq[String], joinType: String = "inner"): DataFrame = {
    require(dfs.size >= 2, "join needs at least two frames")
    val allowed = Set("inner", "full", "left", "right", "left_semi", "left_anti")
    require(allowed.contains(joinType), s"unsupported join type $joinType")
    Reshape.pairwiseReduce(dfs)(_.join(_, keys, joinType))
  }

  /** ref: data_ingest.py:239-274. */
  def selectColumn(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.distinct.map(col): _*)

  /** ref: data_ingest.py:201-236. */
  def deleteColumn(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.distinct: _*)

  /** ref: data_ingest.py:277-319 — single `select`, not chained
    * withColumnRenamed (one projection node).
    */
  def renameColumn(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(mapping.getOrElse(c, c))).toSeq: _*)

  /** ref: data_ingest.py:322-367. */
  def recastColumn(df: DataFrame, casts: Map[String, String]): DataFrame =
    df.select(df.columns.map { c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toSeq: _*)

  /** Contiguous 0-based row ids under a caller-supplied TOTAL order —
    * distributed range-partitioned sort + zipWithIndex, never a
    * partitionless row_number window (which funnels the whole table
    * through one partition). For ids that only need uniqueness (not
    * contiguity) use monotonicId, which is a pure map.
    */
  def withRowId(df: DataFrame, orderCols: Seq[String], name: String = "row_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.orderBy(orderCols.map(col): _*)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(name, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      outSchema)
  }

  /** Unique (non-contiguous) 64-bit ids — map-only, no sort, no shuffle. */
  def monotonicId(df: DataFrame, name: String = "row_id"): DataFrame =
    df.withColumn(name, monotonically_increasing_id())

  /** ref: data_ingest.py:370-533 `recommend_type` — cardinality-driven
    * numerical↔categorical recommendation. threshold =
    * min(dynamicFrac * rows, staticCap); a numerical column below it is
    * recommended categorical, a castable string column above it numerical.
    * One distributed agg job for all columns.
    */
  def recommendType(
      df: DataFrame,
      dynamicFrac: Double = 0.01,
      staticCap: Long = 100): DataFrame = {
    import df.sparkSession.implicits._
    val (num, cat, _) = graft.core.ColumnRole.segregate(df.schema)
    val aggs = Seq(count(lit(1)).as("__n")) ++
      (num ++ cat).map(c => countDistinct(col(c)).as(s"uniq__$c")) ++
      // try_cast: ANSI-safe castability probe (plain cast throws under ANSI)
      cat.map(c => count(when(col(c).isNotNull && expr(s"try_cast(`$c` as double)").isNull, 1))
        .as(s"uncast__$c"))
    // the partial aggregate does all the distinct-hashing + try_cast work:
    // widen a one-file scan so it runs at session parallelism, not 1 task
    val row = graft.functions.Dedup.widenForCompute(df)
      .agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    val threshold = math.min(dynamicFrac * n, staticCap.toDouble)
    val recs =
      num.map { c =>
        val u = row.getAs[Long](s"uniq__$c")
        (c, "numerical", u, if (u <= threshold) "categorical" else "numerical")
      } ++
      cat.map { c =>
        val u = row.getAs[Long](s"uniq__$c")
        val unCastable = row.getAs[Long](s"uncast__$c")
        (c, "categorical", u, if (unCastable == 0 && u > threshold) "numerical" else "categorical")
      }
    recs.toDF("attribute", "current_type", "unique_values", "recommended_type")
  }

  /** Row-level snapshot diff — the incremental-pipeline primitive: which
    * keys were added, removed, or changed between two versions of a
    * table. One full-outer join on the keys; non-key columns compare
    * with NULL-SAFE equality (a null→value transition IS a change; a
    * null→null pair is not), so the semantics replay engine-for-engine
    * (`IS NOT DISTINCT FROM` in SQL). Unchanged keys are dropped —
    * output size is O(churn), not O(table). At 100 TB both sides
    * shuffle once on the key (or zero times if both snapshots are
    * written bucketed by it); there is no row-comparison state beyond
    * the join.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshot diff needs key columns")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshots must share a schema")
    val valCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    val o = oldDf.withColumn("__old", lit(1))
    val n = newDf.withColumn("__new", lit(1))
      .select(keyCols.map(col) ++ valCols.map(c => col(c).as(s"__n_$c")) :+ col("__new"): _*)
    val same = valCols.map(c => col(c) <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** Apply a keyed changelog to a snapshot (CDC merge / upsert
    * compaction — the MERGE INTO primitive): the LATEST change per key
    * (by `seqCol`, ties broken by nothing — sequences must be unique
    * per key) wins; 'I'/'U' upsert their payload, 'D' deletes the key.
    * One window pass compacts the changelog, one left-anti join drops
    * superseded snapshot rows, one union appends the upserts — the
    * changelog (churn-sized) shuffles, the snapshot shuffles once on
    * the key for the anti join (zero times if bucketed by it).
    * `changes` must carry the snapshot's columns plus `opCol`/`seqCol`.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "changelog apply needs key columns")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = snapshot.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    untouched.unionByName(
      latest.filter(col(opCol) =!= "D")
        .select(snapshot.columns.map(col).toSeq: _*))
  }
}
