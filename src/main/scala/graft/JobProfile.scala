package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch per-JOB profiler for registered queries (not part of the driver
  * contract). For each SPARK_GRAFT_ONLY query it runs once cold, once warm,
  * and on the warm run prints every Spark job with its wall time, task
  * count, shuffle bytes and the action callsite (the stage name carries
  * `parquet at api.scala:NNNN` etc.) — the measure-first loop of the
  * optimization guide §1 applied to multi-job lifecycle verbs, where a
  * single `.count()` wall number says nothing about WHICH of the dozens of
  * commits/actions inside the verb is slow.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, site: String, start: Long,
                   var end: Long = -1, var tasks: Int = 0,
                   var shuffleRead: Long = 0, var shuffleWrite: Long = 0,
                   var taskTimeMs: Long = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        // SQL executions run their action in a pooled thread, so the
        // captured callSite is a useless CompletableFuture frame — the
        // final stage's name carries the real action callsite instead
        val fromProps = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filterNot(s => s.contains("CompletableFuture") ||
            s.contains("withThreadLocalCaptured") || s.contains("Future"))
        val site = fromProps
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, site, e.time))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(e.stageId)
        val j = if (jid != null) jobs.get(jid) else null
        if (j != null && e.taskMetrics != null) {
          j.tasks += 1
          j.taskTimeMs += e.taskMetrics.executorRunTime
          j.shuffleRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    def drain(): Unit =
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)

    // JP_SAMPLE=1: sample executor-task thread stacks twice a second and
    // print a frame histogram at the end — the poor man's async-profiler
    // for "task wall ≫ task CPU, what are tasks blocked on?"
    if (sys.env.contains("JP_SAMPLE")) {
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]
      val t = new Thread(() => {
        while (true) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, frames) =>
            if (th.getName.startsWith("Executor task launch") && frames.nonEmpty) {
              val sig = frames.take(6).map(f =>
                s"${f.getClassName.split('.').last}.${f.getMethodName}")
                .mkString(" <- ")
              hist.merge(s"[${th.getState}] $sig", 1, (a, b) => a + b)
            }
          }
          Thread.sleep(500)
        }
      })
      t.setDaemon(true)
      t.start()
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (sig, n) =>
          println(f"[sample] $n%5d  $sig")
        }
      }))
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count() // cold: planning + codegen + first I/O
        val cold = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        drain(); jobs.clear(); stageToJob.clear(); recording = true
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        val warm = (System.nanoTime() - t1) / 1e9
        drain(); recording = false
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.start)
        val totalJobMs = js.map(j => (j.end - j.start).max(0)).sum
        println(f"%n==== $name cold=$cold%.2fs warm=$warm%.2fs " +
          f"jobs=${js.size} jobWall=${totalJobMs / 1e3}%.2fs " +
          f"gaps=${warm - totalJobMs / 1e3}%.2fs ====")
        // aggregate by callsite: lifecycle verbs fire the same action many
        // times; the per-site rollup is what points at the hot verb line
        val bySite = js.groupBy(_.site).map { case (site, g) =>
          (site, g.size, g.map(j => (j.end - j.start).max(0)).sum,
            g.map(_.tasks).sum, g.map(_.taskTimeMs).sum,
            g.map(_.shuffleRead).sum, g.map(_.shuffleWrite).sum)
        }.toSeq.sortBy(-_._3)
        bySite.foreach { case (site, n, ms, tasks, taskMs, sr, sw) =>
          println(f"  ${ms / 1e3}%7.2fs  n=$n%-4d tasks=$tasks%-5d " +
            f"taskTime=${taskMs / 1e3}%7.2fs sr=${sr / 1e6}%6.1fMB " +
            f"sw=${sw / 1e6}%6.1fMB  $site")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
