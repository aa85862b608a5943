package graft

/** Driver-side overlap of INDEPENDENT Spark jobs (optimization guide §2.6):
  * actions are only sequential because driver code calls them sequentially,
  * and a lifecycle gate full of small jobs leaves most of the cluster idle
  * in each job's tail. Running independent units from a bounded thread pool
  * lets the next unit's tasks back-fill freed cores. FIFO scheduling (the
  * default) keeps the earlier unit ahead, which is exactly the back-fill
  * behaviour wanted.
  *
  * Results come back in INPUT ORDER (never completion order) and each thunk
  * runs exactly once, so a caller whose units are deterministic gets a
  * deterministic result — parallelism here changes wall clock, not values.
  * The first failure is rethrown after all threads settle (no thread leak).
  */
object Concurrency {
  def inParallel[T](thunks: Seq[() => T], maxConcurrent: Int = 0): Seq[T] = {
    if (thunks.isEmpty) return Seq.empty
    if (thunks.size == 1 || sys.env.contains("GRAFT_NO_PARALLEL"))
      return thunks.map(_())
    val n = if (maxConcurrent > 0) math.min(maxConcurrent, thunks.size)
            else thunks.size
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      import scala.jdk.CollectionConverters._
      val futures = pool.invokeAll(
        thunks.map(t => new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        }).asJava)
      futures.asScala.toSeq.map { f =>
        try f.get()
        catch { // unwrap so callers see the verb's own exception type
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
