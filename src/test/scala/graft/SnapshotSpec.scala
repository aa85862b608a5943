package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Snapshot-consistent reads over the commit log's raw-table manifests:
  * a torn append (crash between the raw write and the registry swap /
  * commit rename) must leave readers on the previous committed snapshot —
  * its files exist on disk but are invisible — and later successful
  * mutations must never adopt the orphans. The torn state is constructed
  * on disk exactly as the crashed mutation would have left it: the same
  * partitioned parquet append the facade performs, plus the surviving
  * `.intent` marker (the on-disk contract recovery code sees is the thing
  * under test, not the in-flight JVM).
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshDs = {
    val dir = Files.createTempDirectory("graft-snap").toString
    (new Datastream(spark, dir), dir)
  }

  private def tornAppend(dir: String, rows: Seq[(String, String, Double)]): Unit = {
    // byte-equivalent to the crashed mutation's partial work: the same
    // dp_date-partitioned append appendMultiple runs...
    dp(rows).select(col("stream_id"), col("ts"), col("value"),
        lit(null).cast("string").as("value_json"))
      .withColumn("dp_date", to_date(col("ts")))
      .write.mode(SaveMode.Append).partitionBy("dp_date").parquet(s"$dir/raw")
    // ...plus the intent marker that never reached .commit
    val log = new java.io.File(s"$dir/commitlog")
    log.mkdirs()
    val version = 1L + Option(log.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(_.getName.split('.').headOption.flatMap(_.toLongOption))
      .foldLeft(0L)(math.max)
    java.nio.file.Files.writeString(
      new java.io.File(log, f"$version%09d.intent").toPath,
      s"""{"version":$version,"op":"append"}""")
    ()
  }

  test("torn append is invisible: readers serve the pre-mutation snapshot") {
    val (ds, dir) = freshDs
    ds.ensureStream("s1")
    ds.appendMultiple(dp(Seq(
      ("s1", "2024-01-01T00:00:00Z", 1.0),
      ("s1", "2024-01-01T00:00:01Z", 2.0))).select("stream_id", "ts", "value"))
    assert(ds.rawDatapoints.count() === 2)
    tornAppend(dir, Seq(("s1", "2024-01-01T00:00:02Z", 99.0)))
    // the orphan file IS on disk, under a date partition readers scan
    assert(spark.read.parquet(s"$dir/raw").count() === 3)
    // ...but every read surface stays on the committed snapshot
    assert(ds.rawDatapoints.count() === 2)
    assert(ds.rawDatapoints.agg(sum("value")).first().getDouble(0) === 3.0)
    assert(ds.getData("s1", Granularity.Seconds).count() === 2)
    // and the tear is still detected, exactly as before
    assert(ds.tornOperations === Seq("append"))
  }

  test("later commits never adopt orphans; vacuum reclaims them") {
    val (ds, dir) = freshDs
    ds.ensureStream("s1")
    ds.appendMultiple(dp(Seq(("s1", "2024-01-01T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"))
    tornAppend(dir, Seq(("s1", "2024-01-01T00:00:01Z", 99.0)))
    // a subsequent SUCCESSFUL append commits a new manifest: its own rows
    // appear, the orphan stays invisible (manifest = prev ∪ written, not
    // a directory listing)
    ds.appendMultiple(dp(Seq(("s1", "2024-01-02T00:00:00Z", 5.0)))
      .select("stream_id", "ts", "value"))
    assert(ds.rawDatapoints.select("value").as[Double].collect().sorted.toSeq
      === Seq(1.0, 5.0))
    // vacuum deletes exactly the unreferenced orphan files
    val onDiskBefore = spark.read.parquet(s"$dir/raw").count()
    assert(onDiskBefore === 3)
    assert(ds.vacuumRaw() >= 1L)
    assert(spark.read.parquet(s"$dir/raw").count() === 2)
    assert(ds.rawDatapoints.count() === 2)
  }

  test("maintenance on a torn warehouse downsample reads the snapshot, not the orphans") {
    val (ds, dir) = freshDs
    ds.ensureStream("s1", highestGranularity = Granularity.Minutes)
    ds.appendMultiple(dp(Seq(
      ("s1", "2024-01-01T00:00:00Z", 1.0),
      ("s1", "2024-01-01T00:01:00Z", 2.0))).select("stream_id", "ts", "value"))
    tornAppend(dir, Seq(("s1", "2024-01-01T00:02:00Z", 99.0)))
    ds.downsampleStreams(ts("2024-02-01T00:00:00Z"))
    // rollups built from the committed snapshot only: the 99.0 orphan
    // contributed to no bucket
    val hours = ds.getData("s1", Granularity.Hours).collect()
    assert(hours.length === 1)
    assert(hours.head.getAs[Double]("sum") === 3.0)
    assert(hours.head.getAs[Long]("count") === 2L)
  }

  test("time-range reads prune partitions AND stay on the snapshot") {
    val (ds, dir) = freshDs
    ds.ensureStream("s1")
    ds.appendMultiple(dp(Seq(
      ("s1", "2024-01-01T00:00:00Z", 1.0),
      ("s1", "2024-01-03T00:00:00Z", 2.0))).select("stream_id", "ts", "value"))
    tornAppend(dir, Seq(("s1", "2024-01-01T00:00:05Z", 99.0)))
    val df = ds.getData("s1", Granularity.Seconds,
      start = Some(ts("2024-01-01T00:00:00Z")),
      end = Some(ts("2024-01-02T00:00:00Z")))
    assert(df.collect().map(_.getAs[Double]("value")).toSeq === Seq(1.0))
    // the explicit-file-list read must still PRUNE: the dp_date bounds
    // appear as partition filters on the scan, not just row predicates
    val planText = df.queryExecution.executedPlan.toString
    val partLine = planText.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("dp_date"),
      s"dp_date bounds did not reach PartitionFilters:\n$planText")
  }
}
