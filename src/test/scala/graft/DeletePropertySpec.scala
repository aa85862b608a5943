package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property for row-level deletes: for ANY dataset, delete
  * window, doomed-stream set and physical strategy (merge-on-read or
  * copy-on-write), the post-delete warehouse is indistinguishable from a
  * warehouse that never held the deleted rows — on the raw read path, the
  * exact voided-row count, the repaired minutes rollup (bit-identical to
  * direct aggregation of the survivors, by the decimal-partials
  * invariant), and the stats-served count over a random probe window.
  */
class DeletePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session

  private val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
  private val spanUs = 2L * 3600L * 1000000L // two hours

  private val pointGen = for {
    stream <- Gen.oneOf("a", "b")
    us <- Gen.choose(0L, spanUs - 1L)
    value <- Gen.choose(-1e6, 1e6)
  } yield (stream, us, value)

  private def tsOf(us: Long) =
    new java.sql.Timestamp(baseMs + us / 1000L)

  test("a row delete is indistinguishable from never having appended the rows") {
    import spark.implicits._
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(pointGen),
      Gen.choose(0L, spanUs - 1L), Gen.choose(0L, spanUs - 1L),
      Gen.choose(0, 2), Gen.oneOf(true, false),
      Gen.choose(0L, spanUs - 1L), Gen.choose(0L, spanUs - 1L)) {
      (points0, w1, w2, doomedSel, mor, p1, p2) =>
        // unique (stream, µs) keys; µs-truncated timestamps so the naive
        // twin and the warehouse agree on identity
        val points = points0.map { case (s, us, v) => ((s, us / 1000 * 1000), v) }
          .toMap.toSeq.map { case ((s, us), v) => (s, us, v) }
        val (loUs, hiUs) = (math.min(w1, w2), math.max(w1, w2))
        val doomed = doomedSel match {
          case 0 => Set("a")
          case 1 => Set("b")
          case _ => Set("a", "b")
        }
        val tagQuery = doomedSel match {
          case 0 => Map("t" -> "a")
          case 1 => Map("t" -> "b")
          case _ => Map.empty[String, String]
        }
        val dir = Files.createTempDirectory("graft-delprop").toString
        val ds = new Datastream(spark, dir)
        ds.ensureStream("a", Map("t" -> "a"))
        ds.ensureStream("b", Map("t" -> "b"))
        val raw = points.map { case (s, us, v) => (s, tsOf(us), v) }
          .toDF("stream_id", "ts", "value")
        ds.appendMultiple(raw)
        ds.downsampleStreams(tsOf(spanUs + 86400L * 1000000L))
        val expectVoided = points.count { case (s, us, _) =>
          doomed(s) && us >= loUs && us <= hiUs
        }
        val n = ds.deleteDatapoints(tagQuery, tsOf(loUs), tsOf(hiUs),
          if (mor) DeleteMode.MergeOnRead else DeleteMode.CopyOnWrite)
        val survivors = points.filterNot { case (s, us, _) =>
          doomed(s) && us >= loUs && us <= hiUs
        }
        // 1. exact voided count
        val countOk = n == expectVoided.toLong
        // 2. raw read path == naive filter
        val got = ds.rawDatapoints.select("stream_id", "ts", "value")
          .collect().map(r => (r.getString(0),
            r.getTimestamp(1).getTime, r.getDouble(2))).toSet
        val want = survivors.map { case (s, us, v) =>
          (s, baseMs + us / 1000L, v) }.toSet
        val rawOk = got == want
        // 3. repaired minutes rollup == direct aggregation of survivors
        val survDf = survivors.map { case (s, us, v) => (s, tsOf(us), v) }
          .toDF("stream_id", "ts", "value")
        val cmpCols = Seq("stream_id", "bucket_start", "count", "sum",
          "min", "max", "sum_squares", "std_dev", "mean", "t_first", "t_last")
        val twin = Downsample.finalizeView(
            Downsample.aggregateRaw(survDf, Granularity.Minutes))
          .select(cmpCols.map(col): _*)
        val gAll = Seq("a", "b").map(s => ds.getData(s, Granularity.Minutes)
            .withColumn("stream_id", lit(s)))
          .reduce(_.unionByName(_)).select(cmpCols.map(col): _*)
        val rollupOk = gAll.exceptAll(twin).isEmpty &&
          twin.exceptAll(gAll).isEmpty
        // 4. stats-served count over a random probe window == naive count
        val (qLo, qHi) = (math.min(p1, p2), math.max(p1, p2))
        val probe = ds.countDatapoints(Some(tsOf(qLo)), Some(tsOf(qHi)))
        val probeWant = survivors.count { case (_, us, _) =>
          us >= qLo && us <= qHi }.toLong
        val probeOk = probe == probeWant
        countOk && rawOk && rollupOk && probeOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
