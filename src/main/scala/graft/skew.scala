package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot grouping keys (SURVEY.md §7.4.5 / builder brief).
  *
  * The cascade's natural key `(stream_id, bucket)` is high-cardinality, but
  * derived aggregations can collapse onto few keys (e.g. W1 summing
  * thousands of source streams into ONE derived stream per bucket). At
  * cluster scale a hot key serializes into one reducer; salting splits it:
  * partial-aggregate on `(key, salt)`, then merge the partials — legal for
  * exactly the re-aggregable state the engine already uses (sum/count/
  * min/max re-merge; decimal sums stay exact, so results are bit-identical
  * to the unsalted plan).
  *
  * AQE's skew-join handling covers joins; this covers aggregations, which
  * AQE does not rebalance.
  */
object Skew {

  /** Two-phase salted sum: `agg(sum)` over (keys + salt), then over keys.
    * `salt` buckets a uniform hash of the whole row — deterministic given
    * the input row, uniform across partitions.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 64): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol).cast(Downsample.DecV)).as("_partial"),
        count(lit(1)).as("_cnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").cast("double").as("sum"),
        sum("_cnt").as("count"))
  }

  /** Salted flavor of the W1 derive op for hot derived keys: identical
    * output to `Derive.sumStreams` (decimal partials merge exactly).
    */
  def sumStreamsSalted(sources: DataFrame, g: Granularity,
                       derivedKeys: Seq[String], buckets: Int = 64): DataFrame = {
    val bucketed = sources.withColumn("bucket_start",
      Downsample.bucketStart(col("ts"), g))
    val out = saltedSum(bucketed, derivedKeys :+ "bucket_start", "value", buckets)
    out.withColumnRenamed("count", "contributing")
  }
}
