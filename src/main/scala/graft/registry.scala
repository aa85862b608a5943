package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream metadata registry — the reference's `streams` collection
  * [ds :: api.py :: ensure_stream, find_streams] (SURVEY.md §2.1 S4/S5).
  *
  * The registry is the *small dimension side*: at any realistic scale
  * (millions of streams ≈ low GB) it broadcasts, so stream selection is a
  * broadcast hash semi-join against the fact table and never shuffles the
  * 100 TB side (SURVEY.md §2.3 J1). If it ever outgrew broadcast the same
  * plan degrades to a shuffle join — a config change, not a redesign.
  */
object StreamRegistry {

  /** Derive the stream-metadata dimension from the events fact table:
    * one stream per `(user_id, event_type)` with the FIXTURES.md §B tag
    * fixture. Mirrors what `ensure_stream` accumulates in the reference:
    * tags + reserved keys (`earliest_datapoint`, `latest_datapoint`).
    */
  def fromEvents(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_datapoints"),
        min("ts").as("earliest_datapoint"),
        max("ts").as("latest_datapoint"))
      .select(
        concat_ws(":", col("user_id"), col("event_type")).as("stream_id"),
        map(
          lit("user"), col("user_id").cast("string"),
          lit("type"), col("event_type")).as("tags"),
        // nested tag document (P2): the HTTP layer's `tags__meta__parity`
        // path queries resolve against this JSON column via get_json_object
        to_json(struct(
          col("user_id").cast("string").as("user"),
          col("event_type").as("type"),
          struct(when(col("user_id") % 2 === 1, "odd").otherwise("even")
            .as("parity")).as("meta"))).as("tags_json"),
        lit(ValueType.Numeric).as("value_type"),
        typedLit(Downsamplers.allValue.toSeq.sorted).as("value_downsamplers"),
        typedLit(Downsamplers.allTime.toSeq.sorted).as("time_downsamplers"),
        lit(Granularity.Seconds.name).as("highest_granularity"),
        typedLit(Seq.empty[String]).as("derived_from"),
        col("earliest_datapoint"),
        col("latest_datapoint"),
        col("n_datapoints"))

  /** Tag-equality query over the registry — the reference's
    * `find_streams(query_tags)` (SURVEY.md §2.2 P2). Flat tags match via
    * `element_at` on the tags map; nested paths (the HTTP layer's
    * `tags__a__b=c`, expressed here as "a.b" keys) match via
    * `get_json_object` on a `tags_json` column when present.
    */
  def findStreams(registry: DataFrame, tagQuery: Map[String, String]): DataFrame =
    tagQuery.foldLeft(registry) { case (df, (k, v)) =>
      if (k.contains(".") && df.columns.contains("tags_json"))
        df.where(get_json_object(col("tags_json"), s"$$.$k") === v)
      else
        df.where(element_at(col("tags"), k) === v)
    }

  /** Stream-selection semi-join (J1): restrict the fact table to datapoints
    * of the matched streams. Broadcast keeps the fact side shuffle-free.
    */
  def selectDatapoints(fact: DataFrame, matched: DataFrame): DataFrame =
    fact.join(broadcast(matched.select("stream_id")), Seq("stream_id"), "left_semi")

  /** Dependency check backing `delete_streams`
    * [ds :: backends/mongodb.py :: delete_streams]: refuse deletion when a
    * surviving derived stream lists a doomed stream in `derived_from`.
    * Returns the violating (derived, source) pairs; empty ⇒ safe to delete.
    */
  def outstandingDependencies(registry: DataFrame, doomed: DataFrame): DataFrame = {
    val survivors = registry.join(doomed.select("stream_id"), Seq("stream_id"), "left_anti")
    survivors
      .select(col("stream_id").as("derived_stream"),
        explode_outer(col("derived_from")).as("source_stream"))
      .join(doomed.select(col("stream_id").as("source_stream")), Seq("source_stream"))
  }
}
