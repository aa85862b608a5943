package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.functions.col

/** Model-based soak of the snapshot-manifest storage layer: a seeded
  * random interleaving of every mutation verb — appends, tag-query
  * deletes, compactions, vacuums — with CRASHES injected into a fraction
  * of them, checked after each step against an in-memory model of the
  * committed fact table. The invariant under test is the round-8 contract
  * in one sentence: a committed mutation is exactly applied, a crashed
  * mutation is exactly invisible, and vacuum/compact never change visible
  * rows. Complements the hand-built SnapshotSpec scenarios with breadth:
  * the interleavings here (e.g. crash-append → compact → vacuum → delete)
  * are the ones nobody writes by hand.
  */
class StorageSoakSpec extends SparkSpec {
  import spark.implicits._

  private val streams = (0 until 5).map(i => s"s$i")

  test("randomized mutation soak: committed = applied, crashed = invisible, vacuum/compact = no-ops on visible rows") {
    val rnd = new scala.util.Random(20240813L)
    val dir = Files.createTempDirectory("graft-soak").toString
    val ds = new Datastream(spark, dir)
    streams.foreach(s => ds.ensureStream(s, Map("team" -> s"t${s.last.toInt % 2}")))
    // model: stream -> points of the COMMITTED world; clockUs keeps every
    // append monotone per the facade's timestamp contract
    val model = mutable.Map.empty[String, Vector[(Timestamp, Double)]]
      .withDefaultValue(Vector.empty)
    var clockUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def nextTs(): Timestamp = {
      // jump up to ~2 days so appends cross partition boundaries often
      clockUs += (1L + rnd.nextInt(172800)) * 1000000L
      new Timestamp(clockUs / 1000L)
    }
    def appendBatch(crash: Boolean): Unit = {
      val rows = (0 until (1 + rnd.nextInt(3))).map { _ =>
        (streams(rnd.nextInt(streams.size)), nextTs(), rnd.nextInt(1000).toDouble)
      }
      if (crash) {
        ds.crashBeforeCommitOf = Set("append")
        intercept[IllegalStateException] {
          ds.appendMultiple(rows.toDF("stream_id", "ts", "value"))
        }
        ds.crashBeforeCommitOf = Set.empty
        // crashed: the model must NOT change
      } else {
        ds.appendMultiple(rows.toDF("stream_id", "ts", "value"))
        rows.foreach { case (s, t, v) => model(s) = model(s) :+ ((t, v)) }
      }
    }
    def deleteOne(crash: Boolean): Unit = {
      // tag queries match on tags; the team tag names 2-3 streams — a
      // delete dooms the whole team (then re-ensures its members fresh,
      // their history gone). A CRASHED delete runs its full purge (real
      // rewrites of every affected partition) before dying pre-swap, and
      // must leave the model — registry included — untouched.
      val victim = streams(rnd.nextInt(streams.size))
      val team = s"t${victim.last.toInt % 2}"
      val doomed = streams.filter(s => s"t${s.last.toInt % 2}" == team)
      if (crash) {
        ds.crashBeforeCommitOf = Set("delete_streams_purge")
        intercept[IllegalStateException] {
          ds.deleteStreams(Map("team" -> team))
        }
        ds.crashBeforeCommitOf = Set.empty
      } else {
        ds.deleteStreams(Map("team" -> team))
        doomed.foreach { s =>
          model.remove(s)
          ds.ensureStream(s, Map("team" -> s"t${s.last.toInt % 2}"))
        }
      }
    }
    def check(label: String): Unit = {
      val got = ds.rawDatapoints
        .select("stream_id", "ts", "value")
        .as[(String, Timestamp, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3)).sortBy(_._1.getTime).toVector)
        .toMap
      val want = model.filter(_._2.nonEmpty).view
        .mapValues(_.sortBy(_._1.getTime)).toMap
      assert(got === want, s"model divergence after $label")
      // RANGE read through the stats-skipping + dp_date-pruning path for a
      // random existing stream: a wrong manifest stat (or a skip comparing
      // the wrong bound) silently loses rows — this is the property guard
      // for round 9's file-level data skipping
      val sids = want.keys.toSeq.sorted
      if (sids.nonEmpty) {
        val sid = sids(rnd.nextInt(sids.size))
        val pts = want(sid)
        val lo = pts(rnd.nextInt(pts.size))._1
        val hi = pts(rnd.nextInt(pts.size))._1
        val (s, e) = if (lo.getTime <= hi.getTime) (lo, hi) else (hi, lo)
        val gotRange = ds.getData(sid, Granularity.Seconds,
            start = Some(s), end = Some(e))
          .select("ts", "value").as[(Timestamp, Double)].collect()
          .sortBy(_._1.getTime).toVector
        val wantRange = pts.filter(p =>
          p._1.getTime >= s.getTime && p._1.getTime <= e.getTime)
          .sortBy(_._1.getTime)
        assert(gotRange === wantRange,
          s"range-read divergence after $label (stream $sid, [$s, $e])")
        // the SAME selection as an AD-HOC Catalyst-filtered read (no
        // facade hint): the pushed sid/ts predicates drive manifest
        // skipping inside the planner via GraftFileIndex — a wrong bound
        // extraction or an over-eager skip silently loses rows that the
        // hinted path above would still serve
        import org.apache.spark.sql.functions.{col, lit}
        val gotAdHoc = ds.rawDatapoints
          .where(col("stream_id") === sid &&
            col("ts") >= lit(s) && col("ts") <= lit(e))
          .select("ts", "value").as[(Timestamp, Double)].collect()
          .sortBy(_._1.getTime).toVector
        assert(gotAdHoc === wantRange,
          s"ad-hoc FileIndex read divergence after $label (stream $sid, [$s, $e])")
      }
    }
    var step = 0
    (0 until 22).foreach { i =>
      val roll = rnd.nextInt(100)
      val label =
        if (roll < 45) { appendBatch(crash = false); "append" }
        else if (roll < 55) { appendBatch(crash = true); "crashed append" }
        else if (roll < 65) { deleteOne(crash = false); "delete" }
        else if (roll < 72) { deleteOne(crash = true); "crashed delete" }
        else if (roll < 80) {
          if (rnd.nextBoolean()) { ds.compact(); "compact" }
          else {
            ds.crashBeforeCommitOf = Set("compact")
            intercept[IllegalStateException](ds.compact())
            ds.crashBeforeCommitOf = Set.empty
            "crashed compact"
          }
        }
        else if (roll < 90) { ds.vacuumRaw(); s"vacuum(all)" }
        else { ds.acknowledgeTorn(); ds.vacuumRaw(retainVersions = 1); "ack+vacuum(1)" }
      step += 1
      // check after every crash and every 3rd step (collect cost bound)
      if (label.startsWith("crashed") || step % 3 == 0) check(s"step $step: $label")
    }
    ds.acknowledgeTorn()
    ds.vacuumRaw(retainVersions = 1)
    check("final vacuum")
    // the final vacuumed table holds EXACTLY the committed rows on disk too:
    // re-reading the raw directory without the manifest must agree, because
    // retainVersions=1 reclaimed every orphan and every retired file
    val onDisk = spark.read
      .schema(Schemas.rawDatapointsPartitioned).parquet(s"$dir/raw")
      .select("stream_id", "ts", "value")
      .as[(String, Timestamp, Double)].collect().toSet
    val committed = model.values.flatten.isEmpty ||
      onDisk === model.flatMap { case (s, pts) => pts.map(p => (s, p._1, p._2)) }.toSet
    assert(committed, "post-vacuum disk state diverges from the model")
  }

  test("commit-path soak: delta-chain resolve cost stays bounded past checkpoint cadence ×10") {
    // 110 commits = full-manifest cadence (10) × 11: deep enough that an
    // O(total versions) resolve path would show as a growing meter. The
    // assertion is on MANIFEST FILES PARSED (the storage reads a resolve
    // costs), the driver-time proxy that is immune to ambient load.
    val dir = Files.createTempDirectory("graft-soak-commits").toString
    val ds = new Datastream(spark, dir)
    ds.ensureStream("s0")
    var us = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def next(): Timestamp = { us += 3600L * 1000000L; new Timestamp(us / 1000L) }
    val perCommit = mutable.Buffer.empty[Long]
    (1 to 110).foreach { i =>
      val before = ds.manifestParseMeter.get()
      ds.appendMultiple(Seq(("s0", next(), i.toDouble))
        .toDF("stream_id", "ts", "value"))
      perCommit += ds.manifestParseMeter.get() - before
    }
    // WARM path (long-lived writer): ancestors are memoized per immutable
    // version, so each commit parses O(1) NEW manifests — flat at v20 and
    // still flat at v110, far past the checkpoint cadence ×10
    val steady = perCommit.drop(20)
    assert(steady.max <= 12,
      s"per-commit manifest parses grew past the cadence bound: " +
        s"max=${steady.max}, trail=${perCommit.takeRight(10).mkString(",")}")
    // COLD reader at v110 (fresh caches, same warehouse): resolution walks
    // the delta chain only back to the last FULL checkpoint — ≤ cadence
    // manifests, never the 110-long history
    val cold = new Datastream(spark, dir)
    val before = cold.manifestParseMeter.get()
    assert(cold.rawDatapoints.count() === 110L)
    val parses = cold.manifestParseMeter.get() - before
    assert(parses <= 12,
      s"cold resolve at v110 parsed $parses manifests (expected ≤ cadence+2)")
  }

  test("racing writers soak: concurrent facades serialize — every commit " +
      "wins exactly one version, losers retry, no torn snapshot") {
    val dir = Files.createTempDirectory("graft-race").toString
    val setup = new Datastream(spark, dir)
    val nWriters = 4
    val perWriter = 6
    (0 until nWriters).foreach(i => setup.ensureStream(s"w$i"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val retries = new java.util.concurrent.atomic.AtomicLong
    val threads = (0 until nWriters).map { i =>
      new Thread(() => {
        try {
          // each writer is its OWN facade (separate caches, separate lock
          // attempts) appending to its own stream with monotone timestamps
          val ds = new Datastream(spark, dir)
          var us = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L +
            i * 1000000L
          (1 to perWriter).foreach { j =>
            us += 3600L * 1000000L
            var done = false
            while (!done) {
              try {
                ds.appendMultiple(Seq((s"w$i", new Timestamp(us / 1000L), j.toDouble))
                  .toDF("stream_id", "ts", "value"))
                done = true
              } catch {
                // the two pinned concurrency outcomes — and the ONLY two:
                // fast-path lock contention, or a CAS/staleness conflict.
                // Both mean "retry the mutation", which must then succeed.
                case _: errors.MaintenanceLockContended |
                     _: errors.CommitConflict =>
                  retries.incrementAndGet()
                  Thread.sleep(2L + scala.util.Random.nextInt(8))
              }
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    // a concurrent READER hammers every read surface during the writer
    // storm: reads take no lock, so this exercises exactly the windows
    // eager reclamation used to tear (a registry generation or snapshot
    // file swept microseconds after a reader resolved its pointer — the
    // bug class the retention grace windows close). Counts must be
    // monotone non-decreasing (append-only workload) and nothing throws.
    val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        val ds = new Datastream(spark, dir)
        var lastCount = 0L
        while (!stopReader.get()) {
          val c = ds.rawDatapoints.count()
          assert(c >= lastCount, s"snapshot went backwards: $lastCount -> $c")
          lastCount = c
          assert(ds.streams.count() >= nWriters.toLong)
          val d = ds.getData("w0", Granularity.Seconds).count()
          assert(d >= 0L)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    stopReader.set(true)
    reader.join(30000)
    assert(failures.isEmpty,
      s"writer/reader died: ${Option(failures.peek()).map(_.toString)}")
    // every append landed exactly once, fully serialized
    val check = new Datastream(spark, dir)
    assert(check.rawDatapoints.count() === (nWriters * perWriter).toLong)
    (0 until nWriters).foreach { i =>
      assert(check.getData(s"w$i", Granularity.Seconds).count() === perWriter.toLong)
    }
    // one committed version per successful mutation, contiguous up to the
    // exact total (bounded history retains the newest 20) — no version
    // ever double-claimed, none skipped by a phantom commit
    val total = (nWriters * perWriter).toLong
    assert(check.snapshotVersions === (math.max(1L, total - 19L) to total))
    // the lineage invariant holds at every retained version (validateLineage
    // runs inside each pinned resolve)
    check.snapshotVersions.takeRight(5).foreach { v =>
      assert(check.rawDatapointsAt(v).count() >= 0L)
    }
    // and nothing torn: every loser either retried to success or left no
    // marker (lock losers never reach the intent)
    assert(check.tornOperations.isEmpty)
    ()
  }

  test("racing delete soak: merge-on-read takedowns serialize with appends, " +
      "readers see monotone per-surface state, physical apply converges") {
    val dir = Files.createTempDirectory("graft-delrace").toString
    val setup = new Datastream(spark, dir)
    // a static pre-seeded stream the deleter chews through in disjoint
    // 5-point windows, plus two streams the appenders grow concurrently
    setup.ensureStream("old", Map("kind" -> "old"))
    setup.ensureStream("w0")
    setup.ensureStream("w1")
    val baseUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    setup.appendMultiple((1 to 40).map { j =>
      ("old", new Timestamp((baseUs + j * 60L * 1000000L) / 1000L), j.toDouble)
    }.toDF("stream_id", "ts", "value"))
    // rollups exist BEFORE the storm so every delete runs the repair path
    // under contention
    setup.downsampleStreams(new Timestamp(
      (baseUs + 86400L * 1000000L) / 1000L))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val retries = new java.util.concurrent.atomic.AtomicLong
    def retrying(body: => Unit): Unit = {
      var done = false
      while (!done) {
        try { body; done = true } catch {
          case _: errors.MaintenanceLockContended |
               _: errors.CommitConflict =>
            retries.incrementAndGet()
            Thread.sleep(2L + scala.util.Random.nextInt(8))
        }
      }
    }
    val perWriter = 5
    val appenders = (0 until 2).map { i =>
      new Thread(() => {
        try {
          val ds = new Datastream(spark, dir)
          var us = baseUs + (i + 1) * 1000000L
          (1 to perWriter).foreach { j =>
            us += 3600L * 1000000L
            val t = new Timestamp(us / 1000L)
            retrying(ds.appendMultiple(
              Seq((s"w$i", t, j.toDouble)).toDF("stream_id", "ts", "value")))
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    val nDeletes = 4
    val deleter = new Thread(() => {
      try {
        val ds = new Datastream(spark, dir)
        (0 until nDeletes).foreach { k =>
          val lo = new Timestamp((baseUs + (k * 5 + 1) * 60L * 1000000L) / 1000L)
          val hi = new Timestamp((baseUs + (k * 5 + 5) * 60L * 1000000L) / 1000L)
          retrying {
            val n = ds.deleteDatapoints(Map("kind" -> "old"), lo, hi)
            assert(n === 5L, s"window $k voided $n rows, expected 5")
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        val ds = new Datastream(spark, dir)
        var lastOld = Long.MaxValue
        var lastNew = 0L
        while (!stopReader.get()) {
          // the deleted stream only shrinks; the appended streams only grow
          val o = ds.getData("old", Granularity.Seconds).count()
          assert(o <= lastOld, s"deleted stream grew back: $lastOld -> $o")
          lastOld = o
          val n = ds.rawDatapoints
            .where(col("stream_id").isin("w0", "w1")).count()
          assert(n >= lastNew, s"append went backwards: $lastNew -> $n")
          lastNew = n
          assert(ds.pendingDeletes.count() >= 0L)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    (appenders :+ deleter).foreach(_.start())
    (appenders :+ deleter).foreach(_.join(180000))
    stopReader.set(true)
    reader.join(30000)
    assert(failures.isEmpty,
      s"writer/deleter/reader died: ${Option(failures.peek()).map(_.toString)}")
    val check = new Datastream(spark, dir)
    assert(check.getData("old", Granularity.Seconds).count() ===
      (40 - nDeletes * 5).toLong)
    assert(check.rawDatapoints.where(col("stream_id").isin("w0", "w1"))
      .count() === (2 * perWriter).toLong)
    // rollup repair held under contention: minutes of `old` equal a direct
    // aggregation of the surviving points
    val survTs = (1 to 40).filterNot(j => j >= 1 && j <= nDeletes * 5)
    assert(check.getData("old", Granularity.Minutes).count() ===
      survTs.size.toLong)
    assert(check.tornOperations.isEmpty)
    // physical convergence: apply + vacuum change nothing visible
    check.applyDeletes()
    check.vacuumRaw(1)
    assert(check.getData("old", Granularity.Seconds).count() ===
      (40 - nDeletes * 5).toLong)
    assert(check.pendingDeletes.count() === 0L)
    ()
  }

  test("racing upsert soak: restatements serialize with appends, row count " +
      "is invariant, rollup repair lands the restated values exactly") {
    val dir = Files.createTempDirectory("graft-upsrace").toString
    val setup = new Datastream(spark, dir)
    setup.ensureStream("old", Map("kind" -> "old"))
    setup.ensureStream("w0")
    setup.ensureStream("w1")
    val baseUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def tsOfMin(j: Int) = new Timestamp((baseUs + j * 60L * 1000000L) / 1000L)
    setup.appendMultiple((1 to 40).map(j => ("old", tsOfMin(j), j.toDouble))
      .toDF("stream_id", "ts", "value"))
    // rollups exist BEFORE the storm so every upsert runs the repair path
    // under contention
    setup.downsampleStreams(new Timestamp(
      (baseUs + 86400L * 1000000L) / 1000L))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def retrying(body: => Unit): Unit = {
      var done = false
      while (!done) {
        try { body; done = true } catch {
          case _: errors.MaintenanceLockContended |
               _: errors.CommitConflict =>
            Thread.sleep(2L + scala.util.Random.nextInt(8))
        }
      }
    }
    val perWriter = 5
    val appenders = (0 until 2).map { i =>
      new Thread(() => {
        try {
          val ds = new Datastream(spark, dir)
          var us = baseUs + (i + 1) * 1000000L
          (1 to perWriter).foreach { j =>
            us += 3600L * 1000000L
            val t = new Timestamp(us / 1000L)
            retrying(ds.appendMultiple(
              Seq((s"w$i", t, j.toDouble)).toDF("stream_id", "ts", "value")))
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    val nWindows = 4
    val upserter = new Thread(() => {
      try {
        val ds = new Datastream(spark, dir)
        (0 until nWindows).foreach { k =>
          val batch = (1 to 5).map { m =>
            val j = k * 5 + m
            ("old", tsOfMin(j), j.toDouble + 1000.0)
          }.toDF("stream_id", "ts", "value")
          retrying {
            val n = ds.upsertDatapoints(batch)
            assert(n === 5L, s"window $k replaced $n rows, expected 5")
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        val ds = new Datastream(spark, dir)
        var lastNew = 0L
        while (!stopReader.get()) {
          // an upsert REPLACES — the restated stream's row count never moves
          assert(ds.getData("old", Granularity.Seconds).count() === 40L)
          val n = ds.rawDatapoints
            .where(col("stream_id").isin("w0", "w1")).count()
          assert(n >= lastNew, s"append went backwards: $lastNew -> $n")
          lastNew = n
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    reader.start()
    (appenders :+ upserter).foreach(_.start())
    (appenders :+ upserter).foreach(_.join(180000))
    stopReader.set(true)
    reader.join(30000)
    assert(failures.isEmpty,
      s"writer/upserter/reader died: ${Option(failures.peek()).map(_.toString)}")
    val check = new Datastream(spark, dir)
    assert(check.getData("old", Granularity.Seconds).count() === 40L)
    assert(check.rawDatapoints.where(col("stream_id").isin("w0", "w1"))
      .count() === (2 * perWriter).toLong)
    // every restated value landed; untouched tail kept its original values
    val vals = check.getData("old", Granularity.Seconds)
      .orderBy("ts").select("value").collect().map(_.getDouble(0)).toSeq
    assert(vals === (1 to 40).map(j =>
      if (j <= nWindows * 5) j.toDouble + 1000.0 else j.toDouble))
    // rollup repair held under contention: each restated minute bucket
    // carries the restated sum
    val mins = check.getData("old", Granularity.Minutes)
      .orderBy("bucket_start").select("sum").collect()
      .map(_.getDouble(0)).toSeq
    assert(mins === (1 to 40).map(j =>
      if (j <= nWindows * 5) j.toDouble + 1000.0 else j.toDouble))
    assert(check.tornOperations.isEmpty)
    ()
  }
}
