package graft

import org.apache.spark.sql.functions._

class DeriveSpec extends SparkSpec {

  test("derivative: (Δv/Δt) per consecutive pair; first point emits nothing") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:00Z", 10.0),
      ("s", "2024-01-01T00:00:10Z", 30.0),  // +20 over 10s → 2.0
      ("s", "2024-01-01T00:00:15Z", 20.0))) // -10 over 5s → -2.0
    val out = Derive.derivative(raw).orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("derivative")).toSeq == Seq(2.0, -2.0))
  }

  test("counter_reset: emits 1 exactly where the counter decreases") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:00Z", 5.0),
      ("s", "2024-01-01T00:00:10Z", 7.0),
      ("s", "2024-01-01T00:00:20Z", 2.0),  // reset
      ("s", "2024-01-01T00:00:30Z", 4.0)))
    val out = Derive.counterReset(raw).collect()
    assert(out.length == 1)
    assert(out.head.getAs[java.sql.Timestamp]("ts") == ts("2024-01-01T00:00:20Z"))
    assert(out.head.getAs[Long]("reset") == 1L)
  }

  test("counter_derivative with max_value handles wraparound") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:00Z", 90.0),
      ("s", "2024-01-01T00:00:10Z", 95.0),  // +5 over 10s → 0.5
      ("s", "2024-01-01T00:00:20Z", 3.0)))  // wrap: 3 + (100-95) = 8 over 10s → 0.8
    val out = Derive.counterDerivative(raw, Some(100.0)).orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("counter_derivative")).toSeq == Seq(0.5, 0.8))
  }

  test("counter_derivative without max_value skips decreases") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:00Z", 90.0),
      ("s", "2024-01-01T00:00:10Z", 95.0),
      ("s", "2024-01-01T00:00:20Z", 3.0)))
    val out = Derive.counterDerivative(raw, None).collect()
    assert(out.map(_.getAs[Double]("counter_derivative")).toSeq == Seq(0.5))
  }

  test("counter_derivative rejects non-positive max_value") {
    assertThrows[errors.InvalidOperatorArguments](
      Derive.counterDerivative(dp(Seq()), Some(-1.0)))
  }

  test("sum derive op aligns streams on rounded timestamps") {
    val raw = dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("b", "2024-01-01T00:00:50Z", 2.0),  // same minute bucket as a's point
      ("a", "2024-01-01T00:01:10Z", 5.0))) // alone in its bucket
      .withColumn("group", lit("g"))
    val out = Derive.sumStreams(raw, Granularity.Minutes, Seq("group"))
      .orderBy("bucket_start").collect()
    assert(out.map(r => (r.getAs[Double]("sum"), r.getAs[Long]("contributing"))).toSeq
      == Seq((3.0, 2L), (5.0, 1L)))
  }

  test("sumStreamsRequireAll withholds buckets missing a declared source") {
    val raw = dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("b", "2024-01-01T00:00:50Z", 2.0),  // minute 0: both sources → emitted
      ("a", "2024-01-01T00:01:10Z", 5.0),  // minute 1: b missing → withheld
      ("b", "2024-01-01T00:02:05Z", 7.0),  // minute 2: a missing → withheld
      ("a", "2024-01-01T00:03:00Z", 4.0),
      ("a", "2024-01-01T00:03:30Z", 6.0),
      ("b", "2024-01-01T00:03:59Z", 8.0),  // minute 3: both (a twice) → emitted
      ("c", "2024-01-01T00:04:00Z", 9.0))) // undeclared stream: ignored entirely
      .withColumn("group", lit("g"))
    val out = Derive.sumStreamsRequireAll(raw, Granularity.Minutes,
        Seq("group"), Seq("a", "b"))
      .orderBy("bucket_start").collect()
    assert(out.map(r => (r.getAs[Double]("sum"), r.getAs[Long]("contributing"),
      r.getAs[Long]("n_sources"))).toSeq
      == Seq((3.0, 2L, 2L), (18.0, 3L, 2L)))
  }
}
