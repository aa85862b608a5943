package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType}

/** Readers for the driver's parquet tables (TESTDATA.md / FIXTURES.md §A).
  *
  * The driver's `events.parquet` has shipped `ts` in two physical shapes
  * across testdata generations: parquet TIMESTAMP(NANOS) (whose reader
  * Spark gates behind `spark.sql.legacy.parquet.nanosAsLong`, yielding a
  * raw ns LONG we truncate to µs — exactly the coercion DuckDB applies),
  * and µs-precision TIMESTAMP_NTZ (which the pinned-UTC session casts to
  * TimestampType as a wall-clock identity — again matching DuckDB, which
  * reads the same file as a naive µs TIMESTAMP). [[tsMicrosCol]] branches
  * on the actual file schema so the engine and the oracle see identical
  * timestamps in either generation.
  *
  * At 100 TB the fact table would be date-partitioned and bucketed by
  * `stream_id`; these helpers only bind the driver's flat test files.
  */
object Sources {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** µs-TimestampType normalization of an events `ts` column, by physical
    * type: ns-as-long → truncate, TIMESTAMP_NTZ → UTC-identity cast,
    * TimestampType → as-is.
    */
  def tsMicrosCol(schema: StructType): Column = schema("ts").dataType match {
    case LongType => expr("timestamp_micros(ts div 1000)")
    case _: TimestampNTZType => col("ts").cast("timestamp")
    case _ => col("ts")
  }

  /** Raw events with µs-precision timestamps. The PHYSICAL time column
    * survives alongside the derived `ts` — as `ts_ns` (raw ns long) or
    * `ts_ntz` (µs NTZ) — because predicates on the derived `ts` cannot
    * reach the parquet scan (the conversion hides them from pushdown);
    * range scans add equivalent bounds on the physical column, which DO
    * push into row-group min/max pruning — see GetData.raw.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        df.withColumn("ts_ntz", col("ts"))
          .withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Events recast as datastream datapoints (FIXTURES.md §B): stream identity
    * is `(user_id, event_type)` rendered as an opaque `stream_id`, value is
    * the numeric `value` column. The reference models exactly this shape:
    * an append-only `(stream_id, ts, value)` fact table
    * [ds :: backends/mongodb.py :: Backend.append] (SURVEY.md §1.1).
    */
  def eventsAsDatapoints(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    val push = Seq("ts_ns", "ts_ntz").filter(ev.columns.contains).map(col)
    ev.select(Seq(
      concat_ws(":", col("user_id"), col("event_type")).as("stream_id"),
      col("ts")) ++ push ++ Seq(col("value"),
      col("user_id"), col("event_type"), col("event_id"), col("props")): _*)
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")
}
