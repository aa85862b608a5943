package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._

/** Scratch verb-level profiler (not part of the driver contract): replays
  * the upsert-gate fixture one warehouse verb at a time and reports each
  * verb's wall clock, Spark job count and summed job wall — so the
  * measure-first loop (guide §1) can tell which VERB inside a 20 s
  * lifecycle gate carries the time, and how much of it is Spark jobs vs
  * driver-side gaps (commit protocol, planning, footer reads).
  */
object VerbProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // same checkpoint manager as Bench/Verify/Probe/JobProfile, so
      // streaming-adjacent verb numbers are taken under bench conditions
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(e.jobId, e.time); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s > 0) jobMs.addAndGet(e.time - s)
        ()
      }
    })
    def drain(): Unit =
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
    def time[T](name: String)(f: => T): T = {
      drain()
      val (j0, m0) = (jobs.get(), jobMs.get())
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[verb] $name%-28s ${wall}%7.2fs jobs=${jobs.get() - j0}%-4d " +
        f"jobWall=${(jobMs.get() - m0) / 1e3}%6.2fs " +
        f"gaps=${wall - (jobMs.get() - m0) / 1e3}%6.2fs")
      r
    }
    def ts(s: String): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.parse(s))
    spark.range(1000).selectExpr("sum(id)").collect()

    val rounds = sys.env.getOrElse("VERB_ROUNDS", "2").toInt
    (1 to rounds).foreach { round =>
      println(s"--- round $round ---")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-vprof").toString
      val ds = new Datastream(spark, dir)
      time("ensureStream x2") {
        ds.ensureStream("7:click", Map("user" -> "7", "type" -> "click"),
          highestGranularity = Granularity.Minutes)
        ds.ensureStream("3:view", Map("user" -> "3", "type" -> "view"),
          highestGranularity = Granularity.Minutes)
      }
      val pts = Sources.eventsAsDatapoints(spark, sfDir)
        .where((col("user_id") === 7 && col("event_type") === "click") ||
          (col("user_id") === 3 && col("event_type") === "view"))
        .select("stream_id", "ts", "value")
      time("appendMultiple")(ds.appendMultiple(pts))
      time("downsampleStreams")(ds.downsampleStreams(ts("2024-02-01T00:00:00Z")))
      val updReplace = pts
        .where(col("stream_id") === "7:click" &&
          col("ts") >= lit(ts("2024-01-05T00:00:00Z")) &&
          col("ts") < lit(ts("2024-01-20T00:00:00Z")))
        .groupBy("stream_id", "ts")
        .agg((max("value") + lit(1000.0).cast("double")).as("value"))
      val updInsert = pts
        .where(col("stream_id") === "3:view" &&
          col("ts") >= lit(ts("2024-01-01T00:00:00Z")) &&
          col("ts") < lit(ts("2024-01-15T00:00:00Z")))
        .select(col("stream_id"),
          (col("ts") + expr("INTERVAL 1 MICROSECOND")).as("ts"),
          (col("value") * lit(2.0).cast("double")).as("value"))
        .groupBy("stream_id", "ts").agg(max("value").as("value"))
      val gap = spark.range(1).select(lit("7:click").as("stream_id"),
        lit(ts("2023-12-25T10:30:00Z")).as("ts"), lit(42.0).as("value"))
      time("upsertDatapoints")(ds.upsertDatapoints(
        updReplace.unionByName(updInsert).unionByName(gap)))
      time("getData hours + stats") {
        ds.getData("7:click", Granularity.Hours).count()
        ds.rawDatapoints.count()
        ds.countDatapoints()
      }
      time("rowDelete (MoR+repair)") {
        ds.deleteDatapoints(Map("user" -> "7"),
          ts("2024-01-10T00:00:00Z"), ts("2024-01-12T00:00:00Z"))
      }
    }
    spark.stop()
  }
}
