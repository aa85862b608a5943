package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DownsampleSpec extends SparkSpec {

  test("ladder durations divide evenly (cascade correctness invariant)") {
    Granularity.ladder.sliding(2).foreach { case Seq(finer, coarser) =>
      assert(coarser.durationSeconds % finer.durationSeconds == 0,
        s"${coarser.name} not a multiple of ${finer.name}")
    }
  }

  test("bucket edges: a point exactly on a boundary opens the next bucket") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:59.999999Z", 1.0),
      ("s", "2024-01-01T00:01:00Z", 2.0), // boundary → second bucket
      ("s", "2024-01-01T00:01:59Z", 3.0)))
    val out = Downsample.aggregateRaw(raw, Granularity.Minutes)
      .orderBy("bucket_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[java.sql.Timestamp]("bucket_start") == ts("2024-01-01T00:00:00Z"))
    assert(out(0).getAs[Long]("cnt") == 1L)
    assert(out(1).getAs[java.sql.Timestamp]("bucket_start") == ts("2024-01-01T00:01:00Z"))
    assert(out(1).getAs[Long]("cnt") == 2L)
  }

  test("empty buckets emit nothing (no zero-fill)") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:00Z", 1.0),
      ("s", "2024-01-01T00:10:00Z", 2.0)))
    assert(Downsample.aggregateRaw(raw, Granularity.Minutes).count() == 2)
  }

  test("finalizeView derives mean and population std_dev from partials") {
    val raw = dp(Seq(
      ("s", "2024-01-01T00:00:01Z", 2.0),
      ("s", "2024-01-01T00:00:02Z", 4.0),
      ("s", "2024-01-01T00:00:03Z", 6.0)))
    val row = Downsample.cascadeTo(raw, Granularity.Minutes).collect().head
    assert(row.getAs[Double]("mean") == 4.0)
    assert(row.getAs[Double]("sum") == 12.0)
    assert(row.getAs[Double]("min") == 2.0)
    assert(row.getAs[Double]("max") == 6.0)
    assert(row.getAs[Double]("sum_squares") == 56.0)
    // population σ of {2,4,6} = sqrt(8/3)
    assert(math.abs(row.getAs[Double]("std_dev") - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(row.getAs[Long]("count") == 3L)
    assert(row.getAs[java.sql.Timestamp]("t_first") == ts("2024-01-01T00:00:01Z"))
    assert(row.getAs[java.sql.Timestamp]("t_mean") == ts("2024-01-01T00:00:02Z"))
    assert(row.getAs[java.sql.Timestamp]("t_last") == ts("2024-01-01T00:00:03Z"))
  }

  test("cascade associativity: seconds→days rollup ≡ direct days aggregation (property)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      val sid = s"s${rnd.nextInt(5)}"
      val t = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(rnd.nextInt(3 * 86400).toLong)
        .plusNanos(rnd.nextInt(1000000) * 1000L)
      (sid, t.toString, rnd.nextDouble() * 100 - 50)
    }
    val raw = dp(rows)
    val viaLadder = Downsample.finalizeView(
      Downsample.cascade(raw, Granularity.Seconds, Granularity.Days)(Granularity.Days))
    val direct = Downsample.finalizeView(
      Downsample.aggregateRaw(raw, Granularity.Days))
    // exact decimal partials ⇒ bit-identical results, so except is empty
    assert(viaLadder.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaLadder).count() == 0)
  }

  test("all-null values (nominal): count populated, value aggregates all null") {
    import spark.implicits._
    val raw = Seq(
      ("s", ts("2024-01-01T00:00:01Z"), null.asInstanceOf[java.lang.Double]),
      ("s", ts("2024-01-01T00:00:02Z"), null.asInstanceOf[java.lang.Double]))
      .toDF("stream_id", "ts", "value")
    val row = Downsample.cascadeTo(raw, Granularity.Minutes).collect().head
    assert(row.getAs[Long]("count") == 2L)
    Seq("mean", "sum", "min", "max", "sum_squares", "std_dev").foreach { c =>
      assert(row.isNullAt(row.fieldIndex(c)), s"$c should be null")
    }
    assert(row.getAs[java.sql.Timestamp]("t_first") == ts("2024-01-01T00:00:01Z"))
  }

  test("unknown granularity name raises") {
    assertThrows[IllegalArgumentException](Granularity("fortnights"))
  }

  test("bucket alignment is session-timezone independent (property, every granularity)") {
    // bucketStart is pure epoch-µs arithmetic, so a caller who forgets the
    // UTC session pin must get the SAME buckets — probe zones with whole,
    // half (Kolkata) and 45-minute (Eucla, Chatham) offsets plus a
    // DST-observing zone, over timestamps straddling a DST transition
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = ts("2024-03-09T00:00:00Z").getTime // US DST springs forward 2024-03-10
    val times = (0 until 200).map(_ => base + (rnd.nextLong() % (5L * 86400000L)).abs)
    val df = times.map(new java.sql.Timestamp(_)).toDF("ts")
    val zones = Seq("UTC", "America/New_York", "Asia/Kolkata",
      "Australia/Eucla", "Pacific/Chatham")
    val original = spark.conf.get("spark.sql.session.timeZone")
    try {
      Granularity.ladder.foreach { g =>
        val perZone = zones.map { z =>
          spark.conf.set("spark.sql.session.timeZone", z)
          z -> df.select(Downsample.bucketStart(col("ts"), g).as("b"))
            .collect().map(_.getTimestamp(0).getTime).toSeq
        }.toMap
        zones.tail.foreach { z =>
          assert(perZone(z) === perZone("UTC"),
            s"bucketStart($g) differs between UTC and $z")
        }
        // and the UTC alignment invariants hold: every bucket start is a
        // multiple of the duration (days = UTC midnight, hours6 = 00/06/12/18)
        perZone("UTC").foreach { b =>
          assert(b % (g.durationSeconds * 1000L) === 0L)
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", original)
  }
}
