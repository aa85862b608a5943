package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet tables (TESTDATA.md / FIXTURES.md §A).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * exactly the coercion DuckDB applies when reading the same file — so the
  * engine and the DuckDB oracle see identical timestamps.
  *
  * At 100 TB the fact table would be date-partitioned and bucketed by
  * `stream_id`; these helpers only bind the driver's flat test files.
  */
object Sources {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Raw events with µs-precision timestamps (ns truncated, like DuckDB).
    * The original ns long survives as `ts_ns`: predicates on the derived
    * `ts` cannot reach the parquet scan (the conversion hides them from
    * pushdown), so range scans add equivalent bounds on `ts_ns`, which DO
    * push into row-group min/max pruning — see GetData.raw.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Events recast as datastream datapoints (FIXTURES.md §B): stream identity
    * is `(user_id, event_type)` rendered as an opaque `stream_id`, value is
    * the numeric `value` column. The reference models exactly this shape:
    * an append-only `(stream_id, ts, value)` fact table
    * [ds :: backends/mongodb.py :: Backend.append] (SURVEY.md §1.1).
    */
  def eventsAsDatapoints(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      concat_ws(":", col("user_id"), col("event_type")).as("stream_id"),
      col("ts"), col("ts_ns"), col("value"),
      col("user_id"), col("event_type"), col("event_id"), col("props"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")
}
