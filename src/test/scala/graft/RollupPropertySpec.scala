package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the ladder cascade is exactly associative — rolling
  * up through ANY intermediate level equals direct aggregation, because the
  * partial state is decimal-exact (SURVEY.md §5 test strategy).
  */
class RollupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session

  private val pointGen = for {
    stream <- Gen.oneOf("a", "b", "c")
    offsetS <- Gen.choose(0L, 3L * 86400L)
    micros <- Gen.choose(0L, 999999L)
    value <- Gen.choose(-1e6, 1e6)
  } yield (stream, offsetS * 1000000L + micros, value)

  test("cascade through any intermediate granularity equals direct aggregation") {
    import spark.implicits._
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(pointGen),
      Gen.choose(1, Granularity.ladder.size - 2)) { (points, midIdx) =>
      val mid = Granularity.ladder(midIdx)
      val target = Granularity.Days
      val raw = points.map { case (s, us, v) =>
        (s, new java.sql.Timestamp(1704067200000L + us / 1000), v)
      }.toDF("stream_id", "ts", "value")
      val direct = Downsample.finalizeView(Downsample.aggregateRaw(raw, target))
      val viaMid = Downsample.finalizeView(
        Downsample.rollup(Downsample.aggregateRaw(raw, mid), target))
      direct.exceptAll(viaMid).isEmpty && viaMid.exceptAll(direct).isEmpty
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
