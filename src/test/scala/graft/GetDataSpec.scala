package graft

import org.apache.spark.sql.functions._

class GetDataSpec extends SparkSpec {

  private def fixture = dp(Seq(
    ("a", "2024-01-01T00:00:00Z", 1.0),
    ("a", "2024-01-01T00:01:00Z", 2.0),
    ("a", "2024-01-01T00:02:00Z", 3.0),
    ("b", "2024-01-01T00:01:00Z", 9.0)))

  test("inclusive/exclusive bounds at exact edges") {
    val f = fixture
    def vals(se: Boolean, ee: Boolean): Seq[Double] =
      GetData.raw(f, "a",
        start = Some(ts("2024-01-01T00:00:00Z")), end = Some(ts("2024-01-01T00:02:00Z")),
        startExclusive = se, endExclusive = ee)
        .collect().map(_.getAs[Double]("value")).toSeq
    assert(vals(false, false) == Seq(1.0, 2.0, 3.0))
    assert(vals(true, false) == Seq(2.0, 3.0))
    assert(vals(false, true) == Seq(1.0, 2.0))
    assert(vals(true, true) == Seq(2.0))
  }

  test("reverse equals reversed forward scan") {
    val f = fixture
    val fwd = GetData.raw(f, "a").collect().map(_.getAs[Double]("value")).toSeq
    val rev = GetData.raw(f, "a", reverse = true).collect().map(_.getAs[Double]("value")).toSeq
    assert(rev == fwd.reverse)
  }

  test("only the requested stream's datapoints are returned") {
    assert(GetData.raw(fixture, "b").collect().map(_.getAs[Double]("value")).toSeq == Seq(9.0))
  }

  test("downsampled projection returns only requested downsamplers") {
    val partial = Downsample.aggregateRaw(fixture, Granularity.Minutes)
    val out = GetData.downsampled(partial, "a",
      valueDownsamplers = Seq(Downsamplers.Mean, Downsamplers.Count),
      timeDownsamplers = Seq(Downsamplers.TimeLast))
    assert(out.columns.toSeq == Seq("stream_id", "bucket_start", "mean", "count", "t_last"))
    assert(out.count() == 3)
  }

  test("downsampled bounds: incl/excl at exact bucket edges; reverse reverses") {
    val partial = Downsample.aggregateRaw(fixture, Granularity.Minutes)
    def buckets(se: Boolean, ee: Boolean): Seq[java.sql.Timestamp] =
      GetData.downsampled(partial, "a",
        start = Some(ts("2024-01-01T00:00:00Z")), end = Some(ts("2024-01-01T00:02:00Z")),
        startExclusive = se, endExclusive = ee,
        valueDownsamplers = Seq(Downsamplers.Count))
        .collect().map(_.getAs[java.sql.Timestamp]("bucket_start")).toSeq
    assert(buckets(false, false) ==
      Seq(ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:01:00Z"), ts("2024-01-01T00:02:00Z")))
    assert(buckets(true, false) == Seq(ts("2024-01-01T00:01:00Z"), ts("2024-01-01T00:02:00Z")))
    assert(buckets(false, true) == Seq(ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:01:00Z")))
    val rev = GetData.downsampled(partial, "a", reverse = true,
      valueDownsamplers = Seq(Downsamplers.Count))
      .collect().map(_.getAs[java.sql.Timestamp]("bucket_start")).toSeq
    assert(rev == buckets(false, false).reverse)
  }

  test("unsupported downsampler name raises UnsupportedDownsampler") {
    val partial = Downsample.aggregateRaw(fixture, Granularity.Minutes)
    assertThrows[errors.UnsupportedDownsampler](
      GetData.downsampled(partial, "a", valueDownsamplers = Seq("median")))
  }

  test("getDataMatrix: one column per matched stream, cells = rollup " +
    "downsampler, NULL where a stream lacks the bucket; refusals pinned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-matrix-t").toString
    val ds = new Datastream(spark, dir)
    ds.ensureStream("a", Map("team" -> "red"))
    ds.ensureStream("b", Map("team" -> "red"))
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("a", "2024-01-01T00:00:40Z", 3.0),
      ("a", "2024-01-01T00:01:10Z", 8.0),
      ("b", "2024-01-01T00:00:20Z", 100.0))).select("stream_id", "ts", "value"))
    ds.downsampleStreams(ts("2024-01-01T01:00:00Z"))
    val m = ds.getDataMatrix(Map("team" -> "red"), Granularity.Minutes,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:05:00Z"))
    assert(m.columns.toSeq == Seq("bucket_start", "a", "b"))
    val rows = m.orderBy("bucket_start").collect()
    assert(rows.length === 2)
    assert(rows(0).getDouble(1) === 2.0 && rows(0).getDouble(2) === 100.0)
    assert(rows(1).getDouble(1) === 8.0 && rows(1).isNullAt(2))
    // count downsampler arm
    val c = ds.getDataMatrix(Map("team" -> "red"), Granularity.Minutes,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:05:00Z"),
      downsampler = "count").orderBy("bucket_start").collect()
    assert(c(0).getLong(1) === 2L && c(0).getLong(2) === 1L)
    // refusals: no match, finer-than-highest, undeclared, over-bound
    assertThrows[errors.StreamNotFound](
      ds.getDataMatrix(Map("team" -> "blue"), Granularity.Minutes,
        ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:05:00Z")))
    intercept[IllegalArgumentException](
      ds.getDataMatrix(Map("team" -> "red"), Granularity.Minutes,
        ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:05:00Z"),
        maxStreams = 1))
    assertThrows[errors.UnsupportedDownsampler](
      ds.getDataMatrix(Map("team" -> "red"), Granularity.Minutes,
        ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:05:00Z"),
        downsampler = "median"))
  }
}
