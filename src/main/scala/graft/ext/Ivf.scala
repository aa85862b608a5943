package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to random-hyperplane LSH (builder brief: "an IVF or LSH-bucketed
  * variant"). Shape:
  *
  *  1. centroids: a deterministic hash-ordered sample of the corpus
  *     (k-means-free "IVF-flat on sampled seeds" — at 100 TB a periodic
  *     k-means job would refine these; the pipeline is identical);
  *  2. cell assignment: per-partition argmax-cosine loop against the
  *     broadcast centroid matrix (narrow map, no shuffle);
  *  3. queries probe their `nProbe` nearest cells; candidates = corpus
  *     vectors in probed cells (a join on `cell`, moving only ids);
  *  4. exact cosine re-rank, top-k per query.
  *
  * With `nProbe == nCells` the search is exhaustive and equals brute force
  * exactly (asserted in tests); recall/cost trades via `nProbe`.
  */
object Ivf {

  private def dotLoop(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def nearestCells(vec: Array[Float], cents: Array[(Int, Array[Float], Double)],
                           n: Int): Seq[Int] = {
    val vn = math.sqrt(dotLoop(vec, vec))
    cents.map { case (cell, cv, cn) => (cell, dotLoop(vec, cv) / (cn * vn)) }
      .sortBy { case (cell, cos) => (-cos, cell) }
      .take(n).map(_._1).toSeq
  }

  /** Deterministic centroid sample: the `nCells` corpus vectors with the
    * smallest xxhash64(vec_id) — stable across runs and partitionings.
    */
  def centroids(corpus: DataFrame, nCells: Int,
                vecCol: String = "embedding", idCol: String = "vec_id"): Array[(Int, Array[Float])] = {
    import corpus.sparkSession.implicits._
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .withColumn("_h", xxhash64(col(idCol)))
      .orderBy("_h").limit(nCells)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  /** SPHERICAL k-means refinement of the IVF centroids — the periodic
    * maintenance job that tightens cells after the seed sample. The
    * assignment metric is cosine, the SAME metric `ivfTopK` assigns and
    * probes with, and the update step is the normalized mean of the
    * assigned UNIT vectors — the closed-form maximizer of the cosine
    * objective Σᵢ cos(xᵢ, c₍ₐ₍ᵢ₎₎) for a fixed assignment. Both steps are
    * ascent steps on that one objective, so it is non-decreasing per
    * iteration (the guarantee plain Lloyd only gives the Euclidean
    * objective — mixing cosine assignment with coordinate means has
    * neither). Each iteration is one narrow assignment map against the
    * broadcast centroid matrix plus ONE partial-aggregating shuffle of
    * `(cell, pos, component)` rows (map-side combine reduces every
    * partition to ≤ nCells×dim rows before the exchange); the driver only
    * ever holds the nCells×dim centroid matrix. Empty cells (and
    * degenerate all-zero means) keep their previous centroid.
    */
  def refineCentroids(corpus: DataFrame, init: Array[(Int, Array[Float])],
                      iters: Int = 3,
                      vecCol: String = "embedding", idCol: String = "vec_id")
      : Array[(Int, Array[Float])] = {
    import corpus.sparkSession.implicits._
    val sc = corpus.sparkSession.sparkContext
    var cents = init
    (0 until iters).foreach { _ =>
      val centB = sc.broadcast(cents.map { case (c, v) =>
        (c, v, math.sqrt(dotLoop(v, v))) })
      val assigned = corpus.select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val cs = centB.value
          it.map { case (_, v) =>
            val n = math.sqrt(dotLoop(v, v))
            val unit =
              if (n > 0) v.map(x => (x / n).toFloat) else v
            (nearestCells(v, cs, 1).head, unit)
          }
        }.toDF("cell", "vec")
      val means = assigned
        .select(col("cell"), posexplode(col("vec")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .collect() // ≤ nCells × dim rows
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.map { case (c, old) =>
        byCell.get(c) match {
          case Some(rows) =>
            val m = new Array[Double](old.length)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            val norm = math.sqrt(m.map(x => x * x).sum)
            if (norm > 0) (c, m.map(x => (x / norm).toFloat))
            else (c, old) // degenerate mean: keep previous centroid
          case None => (c, old) // empty cell: keep previous centroid
        }
      }
      centB.destroy()
    }
    cents
  }

  /** Persist an IVF index: the build-once / query-many lifecycle a 100 TB
    * deployment needs (`ivfTopK` recomputes centroids and the full-corpus
    * assignment on every call — fine for one-shot analytics, wasteful under
    * a query workload). Layout under `path`:
    *
    *   CURRENT               — one-line pointer `v<N>` to the live version
    *   v<N>/centroids/       (cell, centroid) — tiny, read to the driver
    *   v<N>/cells/cell=<c>/  (vec_id, embedding) — the inverted file
    *                         itself, PARTITIONED BY CELL with the vectors
    *                         embedded, so probing reads ONLY the probed
    *                         cells' partitions (scan cost ≈ nProbe/nCells
    *                         of the corpus before any row is touched)
    *
    * Readers resolve CURRENT first ([[indexDir]]); both index tables of a
    * version become visible in ONE atomic pointer move, so a rebuild or
    * [[refreshIndex]] crash at any instant leaves queries on a complete
    * older version — never a half-swapped index (pre-versioned layouts
    * without a CURRENT file still resolve to `path` itself, so legacy
    * indexes stay readable and migrate on their next refresh). On an
    * object store the pointer move is the metadata commit a table format
    * provides.
    *
    * Build = the same assignment map `ivfTopK` runs, plus one partitioned
    * write; optional spherical-k-means refinement before persisting.
    */
  def buildIndex(corpus: DataFrame, path: String, nCells: Int = 64,
                 refineIters: Int = 0,
                 vecCol: String = "embedding", idCol: String = "vec_id"): Unit = {
    val seeds = centroids(corpus, nCells, vecCol, idCol)
    val refined =
      if (refineIters > 0) refineCentroids(corpus, seeds, refineIters, vecCol, idCol)
      else seeds
    writeVersion(corpus, path, refined, vecCol, idCol)
  }

  // ---- versioned-pointer plumbing ----------------------------------------

  /** Pointer I/O goes through the Hadoop FileSystem API (the index lives
    * beside the warehouse it serves — `file://`, `hdfs://` or `s3a://`;
    * store-class semantics documented on [[graft.WarehouseIO]]).
    */
  private def io(path: String): graft.WarehouseIO =
    new graft.WarehouseIO(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf(),
      path)

  /** The live version is the max over `CURRENT.v<N>` MARKER files — a
    * commit CREATES a fresh marker (atomic on every store class: visible
    * only once closed/PUT) rather than overwriting a single `CURRENT`
    * file, because overwrite-rename is atomic on POSIX but not on
    * HDFS+S3A's rename semantics. A crash mid-sweep leaves extra markers
    * whose max is still the committed version; a legacy single `CURRENT`
    * file (pre-marker layout) keeps resolving until the next commit
    * migrates it.
    */
  private def currentVersion(path: String): Option[Long] = {
    val s = io(path)
    val markers = s.childNames(path)
      .filter(_.startsWith("CURRENT.v"))
      .flatMap(_.stripPrefix("CURRENT.v").toLongOption)
    if (markers.nonEmpty) Some(markers.max)
    else if (s.exists(s"$path/CURRENT"))
      Some(s.readString(s"$path/CURRENT").trim.stripPrefix("v").toLong)
    else None
  }

  /** Directory holding the LIVE index tables (`centroids/`, `cells/`):
    * `path/v<N>` per the CURRENT pointer, or `path` itself for an index
    * written by a pre-versioned build.
    */
  def indexDir(path: String): String =
    currentVersion(path).map(v => s"$path/v$v").getOrElse(path)


  /** Write a complete index version (centroids + assignment) into a fresh
    * `v<N>` directory, then atomically move the CURRENT pointer onto it
    * and reclaim superseded versions. The pointer move is the ONLY commit
    * point — a crash anywhere before it leaves CURRENT (and readers) on
    * the previous complete version.
    */
  private def writeVersion(vecs: DataFrame, path: String,
                           cents: Array[(Int, Array[Float])],
                           vecCol: String, idCol: String): Unit = {
    import vecs.sparkSession.implicits._
    val next = currentVersion(path).getOrElse(0L) + 1
    val dir = s"$path/v$next"
    cents.toSeq.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val centB = vecs.sparkSession.sparkContext.broadcast(
      cents.map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) })
    vecs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (id, v) => (id, v, nearestCells(v, cs, 1).head) }
      }.toDF("vec_id", "embedding", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    commitVersion(path, next)
  }

  private def commitVersion(path: String, v: Long): Unit = {
    val s = io(path)
    // the marker CREATE is the commit point (see [[currentVersion]]) —
    // everything after is reclamation of now-invisible state
    s.writeString(s"$path/CURRENT.v$v", s"v$v")
    s.childNames(path).foreach { n =>
      val stale =
        (n.matches("v\\d+") && n != s"v$v") ||
          Seq("centroids", "cells", "centroids_next", "cells_next").contains(n) ||
          n.startsWith("CURRENT.tmp-") || n == "CURRENT" ||
          (n.startsWith("CURRENT.v") &&
            n.stripPrefix("CURRENT.v").toLongOption.exists(_ < v))
      if (stale) s.rmTree(s"$path/$n")
    }
  }

  /** INCREMENTAL index maintenance: assign a new shard to the EXISTING
    * centroids and append its rows to the inverted file — O(shard) work
    * per ingest (one narrow assignment map + a partitioned append), never
    * a re-cluster of the already-indexed corpus. The flip side of folding
    * into fixed centroids is drift: as appended data shifts the
    * distribution, cells get lopsided and probe recall decays — that is
    * what the periodic [[refreshIndex]] compaction is for. Same
    * single-writer contract as the dedup index.
    */
  def appendToIndex(newVecs: DataFrame, path: String,
                    vecCol: String = "embedding", idCol: String = "vec_id"): Unit = {
    import newVecs.sparkSession.implicits._
    val spark = newVecs.sparkSession
    val dir = indexDir(path)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid"))
      .as[(Int, Array[Float])].collect()
      .map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) }
    val centB = spark.sparkContext.broadcast(cents)
    newVecs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (id, v) => (id, v, nearestCells(v, cs, 1).head) }
      }.toDF("vec_id", "embedding", "cell")
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
  }

  /** PERIODIC compaction for an index that has absorbed appends:
    * re-learns centroids from the index's own contents (spherical k-means
    * seeded by the stored centroids — no access to the original corpus
    * needed) and writes a complete fresh version (the build never reads
    * files it is replacing). The COMMIT is a single atomic move of the
    * CURRENT pointer: a crash at any earlier instant leaves readers on the
    * previous complete version — centroids and assignments always move
    * together, no half-swapped window (crash-injected in tests via
    * [[refreshIndexImpl]]).
    */
  def refreshIndex(path: String, spark: org.apache.spark.sql.SparkSession,
                   refineIters: Int = 3): Unit =
    refreshIndexImpl(path, spark, refineIters, crashBeforeCommit = false)

  /** [[refreshIndex]] with a crash-injection seam: `crashBeforeCommit`
    * returns after the new version's tables are fully written but BEFORE
    * the CURRENT pointer moves — the worst-case crash instant, which must
    * leave queries on the old version.
    */
  private[graft] def refreshIndexImpl(path: String,
                                      spark: org.apache.spark.sql.SparkSession,
                                      refineIters: Int,
                                      crashBeforeCommit: Boolean): Unit = {
    import spark.implicits._
    val cur = indexDir(path)
    val all = spark.read.parquet(s"$cur/cells").select("vec_id", "embedding")
    val init = spark.read.parquet(s"$cur/centroids")
      .select(col("cell"), col("centroid"))
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    val refined = refineCentroids(all, init, refineIters)
    val next = currentVersion(path).getOrElse(0L) + 1
    val dir = s"$path/v$next"
    refined.toSeq.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val centB = spark.sparkContext.broadcast(
      refined.map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) })
    all.as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (id, v) => (id, v, nearestCells(v, cs, 1).head) }
      }.toDF("vec_id", "embedding", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    if (crashBeforeCommit) return
    commitVersion(path, next)
  }

  /** Query a persisted index: probe each query's `nProbe` nearest cells,
    * scan ONLY those cell partitions (partition pruning does the candidate
    * generation), exact-cosine re-rank, top-k. Same arithmetic and
    * tie-break as `ivfTopK`/brute force — with `nProbe == nCells` the
    * result is bit-identical to brute (the gate configuration). No second
    * corpus join: the inverted file already carries the vectors.
    */
  def queryIndex(path: String, queries: DataFrame, k: Int, nProbe: Int = 8,
                 vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import queries.sparkSession.implicits._
    val spark = queries.sparkSession
    val dir = indexDir(path)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid"))
      .as[(Int, Array[Float])].collect()
      .map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) }
    val centB = spark.sparkContext.broadcast(cents)
    val probes = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.flatMap { case (qid, v) => nearestCells(v, cs, nProbe).map(c => (qid, c)) }
      }.toDF("query_vec_id", "cell")
    // probed cell set across all queries: bounded by nCells — the isin
    // literal list is what prunes the cells/ partitions at scan planning
    val probedCells = probes.select("cell").distinct().as[Int].collect().sorted
    val cand = spark.read.parquet(s"$dir/cells")
      .where(col("cell").isin(probedCells.toSeq: _*))
      .join(broadcast(probes), "cell")
      .where(col("vec_id") =!= col("query_vec_id"))
    val qvecs = broadcast(queries.select(col(idCol).cast("long").as("query_vec_id"),
      col(vecCol).as("qvec")))
    val scored = cand.join(qvecs, "query_vec_id")
      .select(col("query_vec_id"), col("vec_id"),
        Similarity.cosine(col("qvec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 64, nProbe: Int = 8,
              vecCol: String = "embedding", idCol: String = "vec_id",
              refineIters: Int = 0): DataFrame = {
    import corpus.sparkSession.implicits._
    val seeds = centroids(corpus, nCells, vecCol, idCol)
    val refined =
      if (refineIters > 0) refineCentroids(corpus, seeds, refineIters, vecCol, idCol)
      else seeds
    val cents = refined
      .map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) }
    val centB = corpus.sparkSession.sparkContext.broadcast(cents)

    // corpus side: one cell per vector (narrow map)
    val assigned = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (id, v) => (id, nearestCells(v, cs, 1).head) }
      }.toDF("vec_id", "cell")

    // query side: nProbe probed cells per query (small, broadcast)
    val probes = broadcast(queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = centB.value
        it.flatMap { case (qid, v) => nearestCells(v, cs, nProbe).map(c => (qid, c)) }
      }.toDF("query_vec_id", "cell"))

    val cands = assigned.join(probes, "cell")
      .where(col("vec_id") =!= col("query_vec_id"))
      .select("query_vec_id", "vec_id").distinct()

    val qvecs = broadcast(queries.select(col(idCol).cast("long").as("query_vec_id"),
      col(vecCol).as("qvec")))
    val scored = cands
      .join(corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec")), "vec_id")
      .join(qvecs, "query_vec_id")
      .select(col("query_vec_id"), col("vec_id"),
        Similarity.cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
