package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Additive schema evolution on the raw fact table (addRawColumn): mixed
  * pre/post-evolution snapshots read with NULL-fill, rewrite paths carry
  * the column, pinned reads pin the column set, the manifest protocol
  * bumps to v4, and every incompatible change is refused with a pinned
  * error.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDs = {
    val dir = Files.createTempDirectory("graft-evo").toString
    (new Datastream(spark, dir), dir)
  }

  private def extrasOf(ds: Datastream): Seq[(String, Long, Option[Double])] =
    ds.rawDatapointsWithExtras()
      .select(col("stream_id"), unix_micros(col("ts")), col("quality"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sorted

  test("pre- and post-evolution files read through one snapshot: old rows " +
    "NULL-fill, new rows carry values, getData is unaffected") {
    val (ds, _) = freshDs
    ds.ensureStream("a", Map("t" -> "x"))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("a", "2024-01-01T00:00:40Z", 2.0))).select("stream_id", "ts", "value"))
    val preVersion = ds.currentVersion.get
    assert(ds.rawExtraColumns.isEmpty)
    ds.addRawColumn("quality", "double")
    assert(ds.rawExtraColumns == Seq(("quality", "DOUBLE")))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:01:10Z", 4.0)))
      .select("stream_id", "ts", "value")
      .withColumn("quality", lit(0.75)))
    // batches WITHOUT the declared column keep appending (null-filled)
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:01:40Z", 8.0))).select("stream_id", "ts", "value"))
    assert(extrasOf(ds).map(_._3) == Seq(None, None, Some(0.75), None))
    // the base fact view and getData read across both file generations
    assert(ds.rawDatapoints.count() === 4)
    ds.downsampleStreams(ts("2024-01-01T01:00:00Z"))
    val mins = ds.getData("a", Granularity.Minutes)
      .select(col("sum")).as[Double].collect().sorted.toSeq
    assert(mins == Seq(3.0, 12.0))
    // pinned read BEFORE the declaration: neither the column nor the rows
    val pinned = ds.rawDatapointsWithExtras(Some(preVersion))
    assert(!pinned.columns.contains("quality"))
    assert(pinned.count() === 2)
    // protocol: evolved manifests require reader v4 and carry the list
    val head = new java.io.File(s"${ds.warehouse}/commitlog").listFiles()
      .filter(_.getName.endsWith(".manifest")).map(_.getName).max
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"${ds.warehouse}/commitlog/$head"))
    assert(txt.startsWith("#graft v4 "))
    assert(txt.linesIterator.next().contains("rawcols=quality:DOUBLE"))
  }

  test("rewrite paths carry the declared column: compaction, z-order, " +
    "copy-on-write upsert, merge-on-read delete + applyDeletes") {
    val (ds, _) = freshDs
    ds.ensureStream("a", Map("t" -> "x"))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0))).select("stream_id", "ts", "value"))
    ds.addRawColumn("quality", "double")
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:40Z", 2.0)))
      .select("stream_id", "ts", "value").withColumn("quality", lit(0.5)))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:01:10Z", 4.0)))
      .select("stream_id", "ts", "value").withColumn("quality", lit(0.9)))
    def want = Seq(None, Some(0.5), Some(0.9))
    assert(extrasOf(ds).map(_._3) == want)
    // compaction rewrites the fragmented day into one file — values survive
    ds.compact()
    assert(extrasOf(ds).map(_._3) == want)
    ds.compactZOrder(maxRecordsPerFile = 2L)
    assert(extrasOf(ds).map(_._3) == want)
    // copy-on-write upsert replaces one key; the survivors keep their values
    ds.upsertDatapoints(Seq(("a", ts("2024-01-01T00:00:40Z"), 3.0))
      .toDF("stream_id", "ts", "value").withColumn("quality", lit(0.6)))
    assert(extrasOf(ds).map(_._3) == Seq(None, Some(0.6), Some(0.9)))
    // merge-on-read delete voids the first row; applyDeletes rewrites the
    // survivors — the column survives the physical rewrite too
    ds.deleteDatapoints(Map("t" -> "x"),
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:00:30Z"))
    assert(extrasOf(ds).map(_._3) == Seq(Some(0.6), Some(0.9)))
    ds.applyDeletes()
    assert(extrasOf(ds).map(_._3) == Seq(Some(0.6), Some(0.9)))
  }

  test("incompatible changes are refused with pinned errors; a v5 manifest " +
    "is refused by this reader") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.addRawColumn("quality", "double")
    def bad(f: => Unit) = intercept[IllegalArgumentException](f)
    assert(bad(ds.addRawColumn("quality", "string"))
      .getMessage.contains("ADDITIVE-ONLY"))
    assert(bad(ds.addRawColumn("value", "double"))
      .getMessage.contains("ADDITIVE-ONLY"))
    assert(bad(ds.addRawColumn("dp_date", "date"))
      .getMessage.contains("ADDITIVE-ONLY"))
    assert(bad(ds.addRawColumn("Bad-Name", "double"))
      .getMessage.contains("invalid column name"))
    assert(bad(ds.addRawColumn("okname", "no_such_type"))
      .getMessage.contains("cannot parse type"))
    // registry-join internals: a same-named extra would make every later
    // append's validation join ambiguous, irreversibly
    assert(bad(ds.addRawColumn("value_type", "string"))
      .getMessage.contains("reserved"))
    assert(bad(ds.addRawColumn("derive_op", "string"))
      .getMessage.contains("reserved"))
    assert(bad(ds.addRawColumn("latest", "double"))
      .getMessage.contains("reserved"))
    // a NEWER writer's protocol (v5) must refuse loudly at resolve time
    val log = new java.io.File(s"${ds.warehouse}/commitlog")
    val v = ds.currentVersion.get + 1
    java.nio.file.Files.writeString(
      new java.io.File(log, f"$v%09d.manifest").toPath,
      s"#graft v5 parent=${v - 1} depth=1 full=0 tables=raw\n")
    java.nio.file.Files.writeString(
      new java.io.File(log, f"$v%09d.commit").toPath,
      s"""{"version":$v,"op":"foreign"}""")
    val e = intercept[IllegalStateException](ds.rawDatapoints.count())
    assert(e.getMessage.contains("reader protocol 'v5'"))
  }

  test("the changefeed serves declared extras: inserts carry values, " +
    "pre-evolution rows null-fill, decoded deletes keep their extras") {
    val (ds, _) = freshDs
    ds.ensureStream("a", Map("t" -> "x"))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0))).select("stream_id", "ts", "value"))
    ds.addRawColumn("quality", "double")
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:40Z", 2.0)))
      .select("stream_id", "ts", "value").withColumn("quality", lit(0.5)))
    // a CDF consumer mirroring the table must see the declared column —
    // the silent-drop failure mode the v4 protocol bump exists to prevent
    val feed = ds.readChanges(0L)
    assert(feed.columns.contains("quality"))
    val got = feed.select(col("value"), col("quality")).collect()
      .map(r => (r.getDouble(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq.sorted
    assert(got == Seq((1.0, None), (2.0, Some(0.5))))
    // a merge-on-read delete's DECODED rows carry the voided extras too
    ds.deleteDatapoints(Map("t" -> "x"),
      ts("2024-01-01T00:00:30Z"), ts("2024-01-01T00:01:00Z"))
    val deletes = ds.readChangesWithDeletes(0L)
      .where(col("_change_type") === "delete")
      .select(col("value"), col("quality")).collect()
      .map(r => (r.getDouble(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(deletes == Seq((2.0, Some(0.5))))
  }

  test("replication propagates the declaration and the column values") {
    val (src, _) = freshDs
    val (dst, _) = freshDs
    src.ensureStream("a", Map("t" -> "x"))
    src.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0))).select("stream_id", "ts", "value"))
    src.addRawColumn("quality", "double")
    src.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:40Z", 2.0)))
      .select("stream_id", "ts", "value").withColumn("quality", lit(0.5)))
    src.replicateTo(dst)
    assert(dst.rawExtraColumns == Seq(("quality", "DOUBLE")))
    assert(extrasOf(dst) == extrasOf(src))
    // idempotent re-run: declaration not duplicated, rows not doubled
    src.replicateTo(dst)
    assert(dst.rawExtraColumns == Seq(("quality", "DOUBLE")))
    assert(extrasOf(dst) == extrasOf(src))
    // a destination declaring the same name with a DIFFERENT type refuses
    // loudly — replaying through it would silently cast the replica apart
    val (dst2, _) = freshDs
    dst2.ensureStream("a", Map("t" -> "x"))
    dst2.addRawColumn("quality", "string")
    val e = intercept[IllegalArgumentException](src.replicateTo(dst2))
    assert(e.getMessage.contains("incompatible schema evolution"))
  }
}
