package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join — for each left row, the most recent right row
  * with `right.ts <= left.ts` in the same key group (the point-in-time
  * lookup behind "value of stream B as of each datapoint of stream A";
  * the reference's nearest-previous-datapoint alignment generalized to a
  * first-class operator).
  *
  * Spark has no native as-of join, and the naive formulations do not
  * scale: a `BETWEEN`-style theta join plans as a broadcast-nested-loop
  * (O(|L|·|R|) per key), and a per-key `collect`+scan is a driver loop.
  * This implementation uses the union-and-scan shape instead:
  *
  *   1. tag both sides and UNION them — a narrow concat, no join node;
  *   2. one window over `(key)` ordered by `(ts, side, tie)` with rights
  *      sorting BEFORE lefts at equal timestamps (as-of is inclusive);
  *   3. `last(right_payload, ignoreNulls)` over rows-unbounded-preceding
  *      carries the latest right payload forward to every left row;
  *   4. filter back to the left side.
  *
  * Cost: ONE hash-partition shuffle on the key + a per-key sort — the
  * same shape as any windowed derive, skew-bounded by the hottest key,
  * with no quadratic blowup however dense the right side is. Right-side
  * payload columns ride through `struct` so one window pass carries all
  * of them.
  */
object TimeJoin {

  /** As-of join `left` with `right` on equal `keyCols` and
    * `right.tsCol <= left.tsCol`. Right payload columns (`valueCols`)
    * appear on the output with `rightPrefix`, NULL when no right row
    * precedes. `left` keeps all its columns and its row count exactly —
    * like a LEFT OUTER join, every left row appears once.
    *
    * Right rows must be unique per `(key, ts)` (the reference's
    * per-stream monotone-append invariant); if several share a
    * timestamp, the largest `tieCol` wins deterministically.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String = "ts", valueCols: Seq[String] = Seq("value"),
           rightPrefix: String = "right_",
           tieCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("_asof_")),
      "left side may not carry _asof_-prefixed columns")
    val payload = struct(valueCols.map(col): _*)
    val tie: Column = tieCol.map(col).getOrElse(lit(0L))
    // side 0 sorts before side 1 at equal ts: the right row is visible to
    // a simultaneous left row (inclusive as-of), and among equal-ts right
    // rows the largest tie value is the one last() sees
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("_asof_side"),
        lit(null).cast("long").as("_asof_tie"),
        lit(null).cast(payloadType(right, valueCols)).as("_asof_payload"),
        struct(leftCols.map(col): _*).as("_asof_row")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("_asof_side"),
        tie.cast("long").as("_asof_tie"),
        payload.as("_asof_payload"),
        lit(null).cast(l.schema("_asof_row").dataType).as("_asof_row")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_asof_side").asc, col("_asof_tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r)
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
    joined.select(
      leftCols.map(c => col(s"_asof_row.$c").as(c)) ++
        valueCols.map(c => col(s"_asof_match.$c").as(s"$rightPrefix$c")): _*)
  }

  private def payloadType(right: DataFrame, valueCols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))

  /** Interval (range) join: each point row joined to every interval of the
    * same key containing its timestamp (`start <= ts <= end`, inclusive).
    *
    * A direct `BETWEEN` theta join has no hash-join strategy — Spark plans
    * it as a nested loop over each key group. This is the bucketized
    * formulation instead (the standard binned range-join): intervals are
    * exploded into the fixed-width time buckets they overlap, points carry
    * their single containing bucket, both sides hash-equi-join on
    * `(key…, bucket)`, and the exact predicate filters within the bucket
    * matches. A (point, interval) pair can meet in at most ONE bucket —
    * the point's — so no post-join dedup is needed. Cost: one shuffle per
    * side + interval fan-out of `span/bucketUs + 1` rows; pick `bucketUs`
    * near the typical interval span so the fan-out stays O(1) per
    * interval.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                bucketUs: Long, tsCol: String = "ts",
                startCol: String = "start", endCol: String = "end"): DataFrame = {
    require(keyCols.nonEmpty, "range join needs at least one key column")
    require(bucketUs > 0, s"bucket width must be positive µs, got $bucketUs")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet) -- keyCols
    require(clash.isEmpty,
      s"non-key columns shared by both sides would be ambiguous in the " +
        s"output: ${clash.toSeq.sorted.mkString(", ")}")
    val iv = intervals.withColumn("_rj_bucket",
      explode(sequence(
        expr(s"unix_micros($startCol) div $bucketUs"),
        expr(s"unix_micros($endCol) div $bucketUs"))))
    val pt = points.withColumn("_rj_bucket",
      expr(s"unix_micros($tsCol) div $bucketUs"))
    pt.join(iv, keyCols :+ "_rj_bucket", "inner")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_rj_bucket")
  }
}
