package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a fixed grid — the gap-filling step a
  * training pipeline runs before feeding irregular telemetry to a model
  * that expects an evenly-spaced sequence (and the natural companion to
  * the engine's downsamplers, which aggregate INTO intervals rather than
  * sampling AT instants).
  *
  * Two fill policies:
  *   - `fillForward` — each grid instant carries the latest observation
  *     at-or-before it (the point-in-time snapshot, same semantics as the
  *     as-of join);
  *   - `interpolate` — linear interpolation between the neighbouring
  *     observations, holding the last value after the final observation.
  *
  * Scale shape: the grid is `distinct keys × instants` built from a
  * narrow `explode(sequence(...))` — no join to produce it — and each
  * fill is ONE hash-partition shuffle on the key (the union-and-scan
  * window from [[TimeJoin.asOf]]; `interpolate` evaluates both window
  * directions over the same partitioning + sort, so Catalyst plans a
  * single Exchange and a single Sort feeding two Window operators). At
  * 100 TB the cost is the per-key sort, bounded by the hottest series —
  * never a per-grid-point probe join and never quadratic in the
  * observation density.
  */
object Resample {

  /** The resample grid: one row per `(key…, grid_ts)` for every distinct
    * key of `obs` and every instant `gridStartUs + i·stepUs <= gridEndUs`
    * (inclusive). Epoch microseconds, UTC.
    */
  def grid(obs: DataFrame, keyCols: Seq[String],
           gridStartUs: Long, gridEndUs: Long, stepUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "resample needs at least one key column")
    require(stepUs > 0, s"grid step must be positive µs, got $stepUs")
    require(gridEndUs >= gridStartUs,
      s"empty grid: end $gridEndUs < start $gridStartUs")
    obs.select(keyCols.map(col): _*).distinct()
      .withColumn("grid_ts", explode(sequence(
        lit(gridStartUs), lit(gridEndUs), lit(stepUs))))
      .withColumn("grid_ts", timestamp_micros(col("grid_ts")))
  }

  /** Deduplicate observations to one row per `(key…, ts)`, keeping the
    * largest value (mirrors the as-of join's largest-tie-wins rule) so
    * both fills — and their oracles — are well-defined under timestamp
    * collisions.
    */
  def dedupObs(obs: DataFrame, keyCols: Seq[String],
               tsCol: String, valueCol: String): DataFrame =
    obs.groupBy((keyCols :+ tsCol).map(col): _*)
      .agg(max(col(valueCol)).as(valueCol))

  /** Forward-fill resample: `(key…, grid_ts, last_ts, last_value)`, with
    * NULLs for grid instants before the key's first observation. Exactly
    * the as-of join of the grid against the (deduplicated) observations.
    */
  def fillForward(obs: DataFrame, keyCols: Seq[String],
                  gridStartUs: Long, gridEndUs: Long, stepUs: Long,
                  tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val o = dedupObs(obs, keyCols, tsCol, valueCol)
    // asOf joins on a shared ts column name; rename the grid instant to the
    // obs column's name for the join, then restore it on the way out.
    val joined = TimeJoin.asOf(
      grid(o, keyCols, gridStartUs, gridEndUs, stepUs)
        .withColumnRenamed("grid_ts", tsCol),
      o, keyCols = keyCols, tsCol = tsCol,
      valueCols = Seq(tsCol, valueCol), rightPrefix = "last_")
    joined.withColumnRenamed(tsCol, "grid_ts")
      .withColumnRenamed(s"last_$tsCol", "last_ts")
      .withColumnRenamed(s"last_$valueCol", "last_value")
  }

  /** Linear-interpolation resample: `(key…, grid_ts, filled_value,
    * fill_kind)` where `fill_kind` is
    *   - `none`   — no observation at-or-before the instant (NULL value);
    *   - `exact`  — an observation sits exactly on the instant;
    *   - `hold`   — past the final observation, last value held;
    *   - `interp` — strictly between two observations, linear in time.
    *
    * The interpolation weight is computed in double precision from epoch
    * microseconds with a fixed expression shape
    * (`p + (n − p)·((g − tp)/(tn − tp))`), so an independent SQL replay
    * of the same shape matches bit-for-bit.
    */
  def interpolate(obs: DataFrame, keyCols: Seq[String],
                  gridStartUs: Long, gridEndUs: Long, stepUs: Long,
                  tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val o = dedupObs(obs, keyCols, tsCol, valueCol)
    val g = grid(o, keyCols, gridStartUs, gridEndUs, stepUs)
    // union-and-scan, both directions: observations (side 0) sort before
    // grid instants (side 1) at equal timestamps, so the backward scan is
    // INCLUSIVE (an exact-hit observation is its grid instant's `prev`)
    // and the forward scan is STRICT (the same observation is not its own
    // `next` — harmless, since an exact hit lerps to `prev` with weight 0).
    val obsRows = o.select(
      keyCols.map(col) ++ Seq(
        unix_micros(col(tsCol)).as("_rs_us"), lit(0).as("_rs_side"),
        struct(unix_micros(col(tsCol)).as("us"),
          col(valueCol).cast("double").as("v")).as("_rs_obs")): _*)
    val gridRows = g.select(
      keyCols.map(col) ++ Seq(
        unix_micros(col("grid_ts")).as("_rs_us"), lit(1).as("_rs_side"),
        lit(null).cast(obsRows.schema("_rs_obs").dataType).as("_rs_obs")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_rs_us").asc, col("_rs_side").asc)
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    val scanned = obsRows.unionByName(gridRows)
      .withColumn("_rs_prev", last(col("_rs_obs"), ignoreNulls = true).over(back))
      .withColumn("_rs_next", first(col("_rs_obs"), ignoreNulls = true).over(fwd))
      .where(col("_rs_side") === 1)
    val p = col("_rs_prev"); val n = col("_rs_next")
    val frac = (col("_rs_us").cast("double") - p("us").cast("double")) /
      (n("us").cast("double") - p("us").cast("double"))
    val filled = when(p.isNull, lit(null).cast("double"))
      .when(p("us") === col("_rs_us"), p("v"))
      .when(n.isNull, p("v"))
      .otherwise(p("v") + (n("v") - p("v")) * frac)
    val kind = when(p.isNull, lit("none"))
      .when(p("us") === col("_rs_us"), lit("exact"))
      .when(n.isNull, lit("hold"))
      .otherwise(lit("interp"))
    scanned.select(
      keyCols.map(col) ++ Seq(
        timestamp_micros(col("_rs_us")).as("grid_ts"),
        filled.as("filled_value"), kind.as("fill_kind")): _*)
  }
}
