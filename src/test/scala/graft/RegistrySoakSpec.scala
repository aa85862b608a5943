package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

object SlowTest extends org.scalatest.Tag("graft.SlowTest")

/** Many-streams soak: the registry claims ("driver state bounded by
  * ladder size, never O(streams)"; "append path O(changed streams) on the
  * driver") exercised at a realistic cardinality — 50k streams through
  * the full ensure → append → maintain → query → delete lifecycle, with
  * exact-count correctness checks at every step and coarse wall-time /
  * heap-growth ceilings that would trip on an O(streams²) registry
  * round-trip or a driver-side collect of the registry.
  */
class RegistrySoakSpec extends SparkSpec {
  import spark.implicits._

  private def usedHeap(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  test("50k-stream registry lifecycle stays bounded in time and driver heap", SlowTest) {
    val n = 50000
    val dir = Files.createTempDirectory("graft-soak").toString
    val ds = new Datastream(spark, dir)
    val heap0 = usedHeap()
    val t0 = System.nanoTime()

    // ensure: one registry job + one swap for all 50k specs
    val specs = (0 until n).map { i =>
      StreamMeta(
        stream_id = s"u$i:m",
        tags = Map("user" -> i.toString, "shard" -> (i % 100).toString),
        value_type = ValueType.Numeric,
        value_downsamplers = Seq.empty,
        time_downsamplers = Seq.empty,
        highest_granularity = Granularity.Minutes.name)
    }
    ds.ensureStreams(specs)
    val tEnsure = (System.nanoTime() - t0) / 1e9
    assert(ds.findStreams().count() === n.toLong)

    // append: one datapoint per stream in a single batch (validation is
    // one broadcast-join job; bounds maintenance is a join, not a collect)
    val base = ts("2024-01-01T00:00:00Z").toInstant.getEpochSecond * 1000000L
    val pts = spark.range(n).select(
      concat(lit("u"), col("id"), lit(":m")).as("stream_id"),
      expr(s"timestamp_micros($base + (id % 60) * 60000000)").as("ts"),
      col("id").cast("double").as("value"))
    ds.appendMultiple(pts)
    val tAppend = (System.nanoTime() - t0) / 1e9 - tEnsure
    assert(ds.rawDatapoints.count() === n.toLong)

    // maintenance: full cascade across every stream; driver state per
    // level is the ladder-sized stats map, never O(streams)
    ds.downsampleStreams(ts("2024-02-01T00:00:00Z"))
    val tMaint = (System.nanoTime() - t0) / 1e9 - tEnsure - tAppend
    // every stream contributed exactly one raw point -> one hours bucket
    assert(ds.rollup(Granularity.Hours).count() === n.toLong)

    // operator tag query + ranged fetch stay interactive
    assert(ds.findStreamsWhere(Map(
      "user" -> Seq(StreamRegistry.TagPred.Gte(0), StreamRegistry.TagPred.Lt(100))))
      .count() === 100L)
    assert(ds.getData("u7:m", Granularity.Hours).count() === 1L)

    // delete one shard tag: 500 streams, purge partition-pruned
    assert(ds.deleteStreams(Map("shard" -> "7")) === 500L)
    assert(ds.findStreams().count() === (n - 500).toLong)
    assert(ds.rawDatapoints.count() === (n - 500).toLong)

    val total = (System.nanoTime() - t0) / 1e9
    val heapGrowth = (usedHeap() - heap0) / (1024.0 * 1024.0)
    info(f"ensure=$tEnsure%.1fs append=$tAppend%.1fs maintain=$tMaint%.1fs " +
      f"total=$total%.1fs heapGrowth=$heapGrowth%.0fMB")
    // coarse ceilings: generous enough for a loaded CI box, tight enough
    // that O(streams) driver loops or per-stream registry round-trips
    // (50k swaps) could not pass
    assert(total < 600.0, f"soak took $total%.1fs — registry ops no longer bounded")
    assert(heapGrowth < 3072.0,
      f"driver heap grew $heapGrowth%.0fMB — suggests an O(streams) driver collect")
  }
}
