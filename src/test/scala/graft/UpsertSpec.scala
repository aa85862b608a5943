package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Merge-by-key writes (upsertDatapoints): replace/insert semantics, the
  * same-commit rollup repair including finalized gap buckets, watermark
  * interplay with later maintenance, and the refusal contract.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDs = {
    val dir = Files.createTempDirectory("graft-upsert").toString
    (new Datastream(spark, dir), dir)
  }

  /** Same seed as RowDeleteSpec: a=6 rows over 3 minutes, b=3 rows,
    * minutes finalized up to 2024-01-01T01:00Z. */
  private def seed(ds: Datastream): Unit = {
    ds.ensureStream("a", Map("team" -> "red"))
    ds.ensureStream("b", Map("team" -> "blue"))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("a", "2024-01-01T00:00:40Z", 2.0),
      ("a", "2024-01-01T00:01:10Z", 4.0),
      ("a", "2024-01-01T00:01:40Z", 8.0),
      ("a", "2024-01-01T00:02:10Z", 16.0),
      ("a", "2024-01-01T00:02:40Z", 32.0),
      ("b", "2024-01-01T00:00:20Z", 100.0),
      ("b", "2024-01-01T00:01:20Z", 200.0),
      ("b", "2024-01-01T00:02:20Z", 400.0))).select("stream_id", "ts", "value"))
    ds.downsampleStreams(ts("2024-01-01T01:00:00Z"))
  }

  private def minutes(ds: Datastream, sid: String): Seq[(String, Double, Long)] =
    ds.getData(sid, Granularity.Minutes)
      .select(col("bucket_start").cast("string"), col("sum"), col("count"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  test("upsert replaces matched keys, inserts new ones, repairs rollups " +
    "including finalized gap buckets, in one atomic commit") {
    val (ds, _) = freshDs
    seed(ds)
    val vBefore = ds.currentVersion.get
    val n = ds.upsertDatapoints(dp(Seq(
      ("a", "2024-01-01T00:01:10Z", 400.0),  // replace (was 4.0)
      ("a", "2024-01-01T00:01:50Z", 0.5),    // insert into existing bucket
      ("a", "2024-01-01T00:30:00Z", 7.0),    // insert: finalized GAP bucket
      ("b", "2024-01-01T02:00:00Z", 9.0)     // insert ABOVE the watermark
    )).select("stream_id", "ts", "value"))
    assert(n === 1L) // exactly one stored row replaced

    // fact table: a = 6 - 1 + 3 = 8 rows, b = 4; replaced value visible
    assert(ds.rawDatapoints.where(col("stream_id") === "a").count() === 8)
    assert(ds.rawDatapoints.where(col("stream_id") === "b").count() === 4)
    assert(ds.getData("a", Granularity.Seconds)
      .where(col("ts") === lit(ts("2024-01-01T00:01:10Z")))
      .select("value").as[Double].head() === 400.0)

    // rollups repaired in the SAME commit: minute 1 re-aggregated over the
    // merged rows, minute 30 (gap bucket below the watermark) materialized
    assert(minutes(ds, "a") === Seq(
      ("2024-01-01 00:00:00", 3.0, 2L),
      ("2024-01-01 00:01:00", 408.5, 3L),
      ("2024-01-01 00:02:00", 48.0, 2L),
      ("2024-01-01 00:30:00", 7.0, 1L)))
    // b's above-watermark insert is NOT pre-aggregated — maintenance owns it
    assert(minutes(ds, "b").map(_._1).forall(_ < "2024-01-01 01:00"))

    // metadata counts stay exact through the merge-on-read state
    assert(ds.countDatapoints() === 12L)
    assert(ds.countDatapoints(streamIds = Some(Seq("a"))) === 8L)

    // later maintenance finalizes b's new bucket WITHOUT double-counting
    // anything the upsert repair already wrote
    ds.downsampleStreams(ts("2024-01-01T03:00:00Z"))
    assert(minutes(ds, "b").filter(_._1 >= "2024-01-01 01:00") ===
      Seq(("2024-01-01 02:00:00", 9.0, 1L)))
    assert(minutes(ds, "a") === Seq(
      ("2024-01-01 00:00:00", 3.0, 2L),
      ("2024-01-01 00:01:00", 408.5, 3L),
      ("2024-01-01 00:02:00", 48.0, 2L),
      ("2024-01-01 00:30:00", 7.0, 1L)))

    // registry bounds widened to the inserted tail
    val meta = ds.streamMeta("b")
    assert(meta.latest_datapoint.contains(ts("2024-01-01T02:00:00Z")))

    // time travel: pre-upsert snapshot serves the original rows
    assert(ds.rawDatapointsAt(vBefore).where(col("stream_id") === "a")
      .count() === 6)
    assert(ds.rawDatapointsAt(vBefore)
      .where(col("stream_id") === "a" &&
        col("ts") === lit(ts("2024-01-01T00:01:10Z")))
      .select("value").as[Double].head() === 4.0)

    // copy-on-write leaves no pending merge-on-read state behind
    assert(ds.pendingDeletes.count() === 0)

    // restore undoes the merge wholesale (fact + rollups)
    ds.restore(vBefore)
    assert(ds.rawDatapoints.where(col("stream_id") === "a").count() === 6)
    assert(minutes(ds, "a") === Seq(
      ("2024-01-01 00:00:00", 3.0, 2L),
      ("2024-01-01 00:01:00", 12.0, 2L),
      ("2024-01-01 00:02:00", 48.0, 2L)))
  }

  test("gap-bucket repair covers every ladder level of a coarser-granularity stream") {
    val (ds, _) = freshDs
    ds.ensureStream("m", Map.empty, highestGranularity = Granularity.Minutes)
    ds.appendMultiple(dp(Seq(("m", "2024-01-10T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"))
    ds.downsampleStreams(ts("2024-02-01T00:00:00Z"))
    ds.upsertDatapoints(dp(Seq(("m", "2023-12-25T10:30:00Z", 42.0)))
      .select("stream_id", "ts", "value"))
    val hours = ds.getData("m", Granularity.Hours)
      .select(col("bucket_start").cast("string"), col("sum"), col("count"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(hours === Seq(
      ("2023-12-25 10:00:00", 42.0, 1L),
      ("2024-01-10 00:00:00", 1.0, 1L)))
    val days = ds.getData("m", Granularity.Days)
      .select(col("bucket_start").cast("string"), col("count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(days === Seq(
      ("2023-12-25 00:00:00", 1L),
      ("2024-01-10 00:00:00", 1L)))
  }

  test("duplicate stored rows at one key collapse into the single upsert row") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    // append allows ts == latest, so one key can legally hold two rows
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("a", "2024-01-01T00:00:10Z", 2.0))).select("stream_id", "ts", "value"))
    assert(ds.rawDatapoints.count() === 2)
    val n = ds.upsertDatapoints(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 5.0))).select("stream_id", "ts", "value"))
    assert(n === 2L) // both stored rows replaced
    val rows = ds.rawDatapoints.select("value").as[Double].collect()
    assert(rows.toSeq === Seq(5.0))
  }

  test("pure insert returns 0 and behaves like a history-extending append") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.appendMultiple(dp(Seq(("a", "2024-01-05T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"))
    // upsert BEFORE the earliest datapoint: append would refuse this
    val n = ds.upsertDatapoints(dp(Seq(("a", "2024-01-02T00:00:00Z", 2.0)))
      .select("stream_id", "ts", "value"))
    assert(n === 0L)
    assert(ds.rawDatapoints.count() === 2)
    assert(ds.streamMeta("a").earliest_datapoint
      .contains(ts("2024-01-02T00:00:00Z")))
    assert(ds.pendingDeletes.count() === 0) // no matched keys → no delete file
  }

  test("changefeed treats an upsert as a raw-rewriting change commit: " +
    "loud by default, skippable explicitly") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:10Z", 1.0)))
      .select("stream_id", "ts", "value"))
    val v1 = ds.currentVersion.get
    ds.upsertDatapoints(dp(Seq(("a", "2024-01-01T00:00:10Z", 2.0)))
      .select("stream_id", "ts", "value"))
    // a replace retires the touched raw file — no row-level change encoding
    // exists in the log, so the feed must fail loudly, naming the op
    val e = intercept[IllegalStateException](ds.readChanges(v1).collect())
    assert(e.getMessage.contains("upsert_datapoints"))
    // the documented Delta-style opt-out skips the commit wholesale
    assert(ds.readChanges(v1, skipChangeCommits = true)
      .where(col("stream_id") === "a").count() === 0)
    // a PURE-INSERT upsert retires nothing: it is a clean insert commit
    // the feed surfaces like any append
    val v2 = ds.currentVersion.get
    ds.upsertDatapoints(dp(Seq(("a", "2024-01-02T00:00:10Z", 3.0)))
      .select("stream_id", "ts", "value"))
    val fed = ds.readChanges(v2).select("value").as[Double].collect().toSeq
    assert(fed === Seq(3.0))
  }

  test("upsertBatch is idempotent under foreachBatch replays, on its own " +
    "watermark family") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    // ingest hwm advanced to 5 must NOT mask upsert batch 1 (separate family)
    ds.appendBatch(dp(Seq(("a", "2024-01-01T00:00:10Z", 1.0)))
      .select("stream_id", "ts", "value"), batchId = 5L)
    val batch = dp(Seq(("a", "2024-01-01T00:00:10Z", 7.0)))
      .select("stream_id", "ts", "value")
    ds.upsertBatch(batch, batchId = 1L)
    import spark.implicits._
    assert(ds.rawDatapoints.select("value").as[Double].collect().toSeq
      === Seq(7.0))
    val vAfter = ds.currentVersion.get
    ds.upsertBatch(batch, batchId = 1L) // replay: no-op, no new commit
    assert(ds.currentVersion.get === vAfter)
    assert(ds.rawDatapoints.count() === 1)
    ds.upsertBatch(dp(Seq(("a", "2024-01-01T00:00:10Z", 9.0)))
      .select("stream_id", "ts", "value"), batchId = 2L)
    assert(ds.rawDatapoints.select("value").as[Double].collect().toSeq
      === Seq(9.0))
  }

  test("stream-id collect guardrail: an over-bound batch refuses with the " +
    "pinned message; the distributed fallback (maxPruneStreams = 0) " +
    "produces identical results to the pruned path") {
    val (ds, _) = freshDs
    seed(ds)
    val batch = dp(Seq(
      ("a", "2024-01-01T00:01:10Z", 400.0),
      ("a", "2024-01-01T00:30:00Z", 7.0),
      ("b", "2024-01-01T00:01:20Z", 999.0)
    )).select("stream_id", "ts", "value")
    // over-bound: loud refusal BEFORE any work, never an OOM mid-collect
    val e = intercept[IllegalArgumentException](
      ds.upsertDatapoints(batch, maxPruneStreams = 1))
    assert(e.getMessage.contains("maxPruneStreams=1"))
    assert(ds.rawDatapoints.count() === 9) // nothing committed
    // fallback on a twin warehouse ≡ the pruned default path
    val (ds2, _) = freshDs
    seed(ds2)
    val nPruned = ds.upsertDatapoints(batch)
    val nWide = ds2.upsertDatapoints(batch, maxPruneStreams = 0)
    assert(nWide === nPruned)
    def facts(d: Datastream) = d.rawDatapoints
      .select(col("stream_id"), col("ts").cast("string"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq.sorted
    assert(facts(ds2) === facts(ds))
    assert(minutes(ds2, "a") === minutes(ds, "a"))
    assert(minutes(ds2, "b") === minutes(ds, "b"))
  }

  test("refusals: duplicate batch keys, derived streams, outstanding " +
    "dependents, CHECK constraints") {
    val (ds, _) = freshDs
    ds.ensureStream("src")
    ds.appendMultiple(dp(Seq(("src", "2024-01-01T00:00:10Z", 1.0)))
      .select("stream_id", "ts", "value"))
    intercept[IllegalArgumentException] {
      ds.upsertDatapoints(dp(Seq(
        ("src", "2024-01-01T00:00:10Z", 1.0),
        ("src", "2024-01-01T00:00:10Z", 2.0))).select("stream_id", "ts", "value"))
    }
    ds.ensureStream("der", deriveOp = Some("sum"), derivedFrom = Seq("src"))
    intercept[errors.AppendToDerivedStreamNotAllowed] {
      ds.upsertDatapoints(dp(Seq(("der", "2024-01-01T00:00:10Z", 1.0)))
        .select("stream_id", "ts", "value"))
    }
    intercept[errors.OutstandingDependenciesError] {
      ds.upsertDatapoints(dp(Seq(("src", "2024-01-01T00:00:10Z", 9.0)))
        .select("stream_id", "ts", "value"))
    }
    // nothing committed by the refused verbs
    assert(ds.rawDatapoints.count() === 1)
    val (ds2, _) = freshDs
    ds2.ensureStream("a")
    ds2.addCheckConstraint("value_nonneg", "value >= 0")
    intercept[errors.ConstraintViolation] {
      ds2.upsertDatapoints(dp(Seq(("a", "2024-01-01T00:00:10Z", -1.0)))
        .select("stream_id", "ts", "value"))
    }
  }

  test("null merge keys are rejected BEFORE any write: the declared " +
    "write scope drops null dates, so a null-ts row would land as an " +
    "undeclared default-partition file invisible to the commit diff") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:10Z", 1.0)))
      .select("stream_id", "ts", "value"))
    def withNullTs = dp(Seq(("a", "2024-01-01T00:05:00Z", 2.0)))
      .select(col("stream_id"),
        lit(null).cast("timestamp").as("ts"), col("value"))
    val eU = intercept[IllegalArgumentException](
      ds.upsertDatapoints(withNullTs))
    assert(eU.getMessage.contains("null"))
    val eA = intercept[IllegalArgumentException](
      ds.appendMultiple(withNullTs))
    assert(eA.getMessage.contains("null"))
    // null stream_id is equally refused
    val eS = intercept[IllegalArgumentException](
      ds.upsertDatapoints(dp(Seq(("a", "2024-01-01T00:05:00Z", 2.0)))
        .select(lit(null).cast("string").as("stream_id"),
          col("ts"), col("value"))))
    assert(eS.getMessage.contains("null"))
    // nothing leaked into the fact table from the refused verbs
    assert(ds.rawDatapoints.count() === 1)
  }
}
