package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-store primitive Spark lacks
  * natively: each left row picks up the right row with the greatest
  * right-timestamp ≤ its own timestamp, per key. This is what makes
  * offline feature joins leakage-free (a training example may only see
  * feature values that existed at its event time; ref the feast
  * point-in-time contract the exporter targets,
  * `workflow/FeastExporter`).
  *
  * Spark-first shape: tag both sides, union, then ONE key-partitioned
  * window pass propagating the last-seen right values
  * (`last(ignoreNulls)` over unbounded-preceding). A single shuffle on
  * the key — never a per-row subquery or a range cross-join, and the
  * window partitions on the join key so parallelism is #keys. Compose
  * with salting for pathological hot keys.
  */
object AsofJoin {

  /** Left as-of join. `right` must be unique per (keyCols, rightTs) —
    * pre-aggregate it otherwise (ambiguous duplicates have no canonical
    * winner). Timestamps compare inclusively (a right row AT the left
    * timestamp is visible). Right value columns arrive null where no
    * matching right row exists.
    *
    * `direction`: "backward" (default — greatest right ts ≤ left ts,
    * the leakage-free feature-store contract), "forward" (smallest
    * right ts ≥ left ts), or "nearest" (whichever is closer in time;
    * ties break backward, matching pandas merge_asof). All three run
    * as the SAME single key-shuffle union-window plan — nearest adds a
    * second frame over the one sort, never a second exchange.
    *
    * `tolerance` (pandas merge_asof's third knob): a matched right row
    * further than this from the left timestamp is discarded — the left
    * row stays, its value columns go null. Units are the ts column's
    * double-cast units (epoch seconds for timestamps, the raw value for
    * numeric ts). A pure post-window column expression: no extra
    * shuffle, no plan change.
    *
    * `allowExactMatches = false` (pandas' fourth knob) makes the
    * comparison strict: backward sees only rights strictly BEFORE the
    * left timestamp, forward only strictly AFTER. Implemented purely by
    * flipping which side sorts first at equal timestamps — same plan,
    * zero extra cost. Unsupported for `nearest` (whose two frames would
    * need opposite equal-ts orderings in one sort); compose a strict
    * backward and a strict forward pass instead.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction: $direction")
    require(allowExactMatches || direction != "nearest",
      "strict nearest is ambiguous in one pass: compose strict backward + strict forward")
    val leftCols = left.columns.toSeq
    // ONE struct carries the whole right row (plus its ts for nearest's
    // distance pick), so the matched row wins atomically: a right row
    // whose value column is legitimately NULL still wins (the struct
    // itself is non-null), and columns can never mix across different
    // right rows — per-column last(ignoreNulls) would skip the null and
    // surface a stale older value
    val vStructType = org.apache.spark.sql.types.StructType(
      right.schema(rightTs).copy(name = "__rts", nullable = true) +:
        valueCols.map(c => right.schema(c).copy(name = c, nullable = true)))
    // at equal timestamps the right row must fall INSIDE the frame that
    // direction reads when exact matches are allowed (before left rows
    // for the preceding frame, after them for the following frame) — and
    // OUTSIDE it when they are not
    val rightFirst = (direction != "forward") == allowExactMatches
    val (leftSide, rightSide) = if (rightFirst) (1, 0) else (0, 1)
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(leftSide))
      .select(leftCols.map(col) :+ col("__ts") :+ col("__side") :+
        lit(null).cast(vStructType).as("__vs"): _*)
    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(rightSide))
      .select((leftCols.map(c =>
        if (keyCols.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__ts") :+ col("__side")) :+
        struct(col(rightTs).as("__rts") +: valueCols.map(col): _*).as("__vs"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val back = last(col("__vs"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__vs"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val union = taggedLeft.unionByName(taggedRight)
    val carried = direction match {
      case "backward" => union.withColumn("__vs", back)
      case "forward"  => union.withColumn("__vs", fwd)
      case "nearest"  =>
        // both frames ride the one sort; equal-ts rights live in the
        // preceding frame only, which is exactly the backward tie-break
        val lts = col("__ts").cast("double")
        val bd = abs(lts - col("__b").getField("__rts").cast("double"))
        val fd = abs(col("__f").getField("__rts").cast("double") - lts)
        union.withColumn("__b", back).withColumn("__f", fwd)
          .withColumn("__vs",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              .when(bd <= fd, col("__b"))
              .otherwise(col("__f")))
          .drop("__b", "__f")
    }
    val bounded = tolerance match {
      case Some(t) =>
        val dist = abs(col("__ts").cast("double") -
          col("__vs").getField("__rts").cast("double"))
        carried.withColumn("__vs",
          when(col("__vs").isNotNull && dist <= lit(t), col("__vs")))
      case None => carried
    }
    bounded.filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__vs").getField(c).as(c)): _*)
  }

  /** Interval (range) join — points against [start, end) intervals —
    * as a CHUNKED EQUI-JOIN: bucket the time axis into `chunk`-sized
    * cells, explode each interval over the cells it covers, equi-join
    * on the cell id, then apply the exact range predicate. Without this,
    * Spark executes an inequality-only join as BroadcastNestedLoop —
    * quadratic when the interval side outgrows a broadcast. Chunk cost
    * is (interval span / chunk) rows on the interval side; pick `chunk`
    * near the median interval length. Both join sides hash-partition on
    * the cell id → scales on both sides.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    val p = points.withColumn("__cell", floor(col(pointCol) / chunk))
    val iv = intervals.withColumn("__cell",
      explode(sequence(floor(col(startCol) / chunk), floor((col(endCol) - 1) / chunk))))
    p.join(iv, Seq("__cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }
}
