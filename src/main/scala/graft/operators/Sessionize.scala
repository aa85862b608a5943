package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Downsample

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the gap between them is ≤ `gapUs`; a larger gap (or
  * the first event) starts a new session. The batch analog of Structured
  * Streaming's `session_window`, as a first-class batch operator — the
  * standard segmentation step for interaction logs before per-session
  * feature extraction.
  *
  * Shape: the classic two-window formulation — `lag` marks session starts,
  * a running sum turns marks into per-key session ordinals. Both windows
  * share one `(key) ORDER BY ts` spec, so the plan pays ONE hash-partition
  * shuffle + per-key sort for the windows, then a partial→final aggregate
  * for the per-session rollup. Skew-bounded by the hottest key, exact
  * decimal value sums like every other aggregate in the engine.
  */
object Sessionize {

  /** Per-session summary: `(keyCols…, session_seq, session_start,
    * session_end, n_events, value_sum)`. `session_seq` is 1-based in ts
    * order within each key. Timestamps must be unique per key (the
    * engine's per-stream monotone invariant).
    */
  def sessions(events: DataFrame, keyCols: Seq[String], gapUs: Long,
               tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    require(keyCols.nonEmpty, "sessionization needs at least one key column")
    require(gapUs > 0, s"gap must be positive µs, got $gapUs")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val marked = events.withColumn("_prev_us",
        lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull ||
          unix_micros(col(tsCol)) - col("_prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(keyCols.map(col) :+ col("session_seq"): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(Downsample.DecV)).cast("double").as("value_sum"))
  }
}
