package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.11 X3).
  *
  * Scale posture:
  *  - `topK` broadcasts the (small) query set and scans the corpus once —
  *    cost O(corpus × queries), no corpus self-join, no shuffle of the big
  *    side beyond the final per-query top-k (TakeOrderedAndProject-shaped).
  *  - `annTopK` / `nearDupPairs` go through random-hyperplane LSH buckets:
  *    candidates must collide in ≥1 band, so cost tracks bucket occupancy,
  *    not n². This is the 100 TB path; brute force is the exactness
  *    baseline the driver oracle checks.
  *
  * All dot products are *sequential left folds in double* (`aggregate` over
  * the array) — bit-identical to the DuckDB oracle's `list_reduce` fold.
  */
object Similarity {

  /** Σ aᵢ·bᵢ via the custom codegen'd expression — bit-identical to the
    * ordered-fold form (same left-to-right double accumulation, which is
    * also what the DuckDB oracle's list_reduce computes), ~5× faster than
    * the interpreted higher-order-function fold.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** The declarative fold `dot` (kept as the semantic reference the custom
    * expression must match — asserted equal in tests).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ vᵢ² as the ordered left fold in double — works for float or double
    * arrays, same accumulation order as the oracle's `list_reduce`.
    */
  def norm2Fold(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Unit-normalization: adds `norm2` (Σ vᵢ², the ordered fold) and
    * `unit` (vᵢ/√norm2 as array<double>; zero vectors pass through as
    * zeros rather than NaN). A narrow map — the standard pre-step before
    * cosine indexes, centroid refinement, or LSH, done once at ingest
    * instead of per-comparison.
    */
  def normalize(df: DataFrame, vecCol: String = "embedding",
                outCol: String = "unit"): DataFrame =
    df.withColumn("norm2", norm2Fold(col(vecCol)))
      .withColumn(outCol,
        when(col("norm2") > 0.0,
          transform(col(vecCol), x => x.cast("double") / sqrt(col("norm2"))))
        .otherwise(transform(col(vecCol), x => x.cast("double"))))

  /** Composed form — the semantic reference the fused expression must
    * match bit-for-bit (asserted in tests).
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fused single-pass cosine (custom codegen'd expression): identical
    * arithmetic to `cosineComposed`, one array traversal instead of three.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.CosineSimilarity(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Deterministic ±1 hyperplane for (band, plane), materialized at
    * PLAN-BUILD time as a literal array (a seeded driver-side draw) — the
    * signs are row-independent, so evaluating a hash for them per row would
    * be pure waste at scale.
    */
  private def hyperplane(band: Int, plane: Int, maxDim: Int): Column =
    typedLit(hyperplaneSigns(band, plane, maxDim).toSeq)

  private def hyperplaneSigns(band: Int, plane: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(band * 7919 + plane)
    Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** LSH signatures as rows `(id, band, sig)` via a tight per-partition
    * primitive loop. The sign projections are a (bands·bits)×dim
    * matrix-vector product per row — genuine imperative per-partition work
    * where expression trees only allocate (96 slices + zip arrays per row
    * measured 2-3× the whole query's runtime at sf0.1). Sign matrix is the
    * same seeded draw as `hyperplane`, built once per partition.
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String,
                    bands: Int, bitsPerBand: Int): DataFrame = {
    import df.sparkSession.implicits._
    val nPlanes = bands * bitsPerBand
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        var signs: Array[Array[Double]] = null // per-partition init, dim-lazy
        it.flatMap { case (id, vec) =>
          if (signs == null || signs(0).length != vec.length)
            signs = Array.tabulate(nPlanes) { pl =>
              hyperplaneSigns(pl / bitsPerBand, pl % bitsPerBand, vec.length)
            }
          (0 until bands).map { b =>
            var sig = 0L
            var j = 0
            while (j < bitsPerBand) {
              val s = signs(b * bitsPerBand + j)
              var proj = 0.0
              var i = 0
              while (i < vec.length) { proj += vec(i).toDouble * s(i); i += 1 }
              if (proj > 0) sig |= (1L << j)
              j += 1
            }
            (id, b, sig)
          }
        }
      }.toDF(idCol, "band", "sig")
  }

  /** Random-hyperplane LSH: `bands` signatures of `bitsPerBand` sign bits
    * each. Returns an array of `bands` ints; two vectors are candidates iff
    * they share a (band_index, signature) pair. Pure codegen'd expressions
    * over literal hyperplanes (supports dims ≤ `maxDim`).
    */
  def lshBuckets(vec: Column, bands: Int, bitsPerBand: Int,
                 maxDim: Int = 4096): Column = {
    val bandSigs = (0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        val proj = aggregate(
          zip_with(vec, slice(hyperplane(b, j, maxDim), lit(1), size(vec)),
            (x, s) => x.cast("double") * s),
          lit(0.0), _ + _)
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
    }
    array(bandSigs: _*)
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (self excluded). `queries` must be small — it is
    * broadcast; the corpus is scanned exactly once.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           vecCol: String = "embedding", idCol: String = "vec_id",
           maxQueries: Int = 100000): DataFrame = {
    // The query set is small by contract: ship it as a broadcast variable
    // and score in one pass over the corpus, emitting only scalars — a
    // broadcast join would materialize |corpus|×|queries| rows each
    // carrying two float arrays (measured 3× the scoring cost). Per-pair
    // arithmetic is the same ordered double fold as the declarative form,
    // so results stay bit-identical to the oracle.
    //
    // Fail-fast guardrail on that contract: fetch at most maxQueries + 1
    // rows (never an unbounded collect), and refuse past the bound with a
    // clear message instead of OOMing the driver mid-collect.
    import corpus.sparkSession.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol), col("label").cast("long"))
      .as[(Long, Array[Float], Long)].head(maxQueries + 1)
    require(qRows.length <= maxQueries,
      s"topK: query set exceeds maxQueries=$maxQueries rows — the query side " +
        "is collected and broadcast, so it must be small; raise maxQueries " +
        "deliberately or use annTopK/IVF for a large query side")
    val qB = corpus.sparkSession.sparkContext.broadcast(
      qRows.map { case (id, v, label) => (id, v, label, math.sqrt(dotLoop(v, v))) })
    val scored = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qB.value
        it.flatMap { case (vid, vec) =>
          val vnrm = math.sqrt(dotLoop(vec, vec))
          qs.iterator.collect { case (qid, qvec, label, qnrm) if qid != vid =>
            (label, qid, vid, dotLoop(qvec, vec) / (qnrm * vnrm))
          }
        }
      }.toDF("label", "query_vec_id", "vec_id", "cosine")
      .withColumn("label", col("label").cast("int")) // preserve source type
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Left-to-right double fold — same IEEE sequence as `dot`/`dotFold`. */
  private def dotLoop(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** ANN top-k through LSH buckets: only corpus vectors colliding with the
    * query in ≥1 band are scored. Recall < 1 by design; the scale path.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 8, bitsPerBand: Int = 12,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // SLIM banding: the collision join moves only (id, band, sig) — never
    // the float arrays. Vectors are fetched once per DISTINCT candidate
    // pair, so cosine is computed exactly once per pair.
    val qb = broadcast(
      lshSignatures(queries, idCol, vecCol, bands, bitsPerBand)
        .withColumnRenamed(idCol, "query_vec_id"))
    val cb = lshSignatures(corpus, idCol, vecCol, bands, bitsPerBand)
      .withColumnRenamed(idCol, "vec_id")
    val cands = cb.join(qb, Seq("band", "sig"))
      .where(col("vec_id") =!= col("query_vec_id"))
      .select("query_vec_id", "vec_id").distinct()
    val qvecs = broadcast(queries.select(col(idCol).as("query_vec_id"),
      col(vecCol).as("qvec")))
    val scored = cands
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")), "vec_id")
      .join(qvecs, "query_vec_id")
      .select(col("query_vec_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** EXACT near-dup pair set: all (a < b) pairs with cosine ≥ `threshold`.
    * O(n²) by definition — this is the recall-gate baseline `nearDupPairs`
    * is measured against (and the DuckDB twin recomputes), NOT a scale
    * path. The corpus is shipped once as a broadcast and scored in a
    * single scan emitting scalars, so the plan stays broadcast+scan (no
    * cartesian join node); same ordered-double fold as every cosine here.
    */
  def exactPairs(corpus: DataFrame, threshold: Double,
                 vecCol: String = "embedding", idCol: String = "vec_id",
                 maxRows: Int = 500000): DataFrame = {
    import corpus.sparkSession.implicits._
    // Fail-fast guardrail: this baseline collects the WHOLE corpus to the
    // driver by design (recall gates only). Fetch at most maxRows + 1 so
    // misuse against a real corpus raises here with a clear message
    // instead of OOMing the driver inside an unbounded collect.
    val rows = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].head(maxRows + 1)
    require(rows.length <= maxRows,
      s"exactPairs: corpus exceeds maxRows=$maxRows rows — this is the O(n²) " +
        "recall-gate baseline, not a scale path; use nearDupPairs for real " +
        "corpora or raise maxRows deliberately")
    val bc = corpus.sparkSession.sparkContext.broadcast(
      rows.map { case (id, v) => (id, v, math.sqrt(dotLoop(v, v))) })
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (aId, aVec) =>
          val aNrm = math.sqrt(dotLoop(aVec, aVec))
          all.iterator.collect { case (bId, bVec, bNrm) if aId < bId =>
            (aId, bId, dotLoop(aVec, bVec) / (aNrm * bNrm))
          }.filter(_._3 >= threshold)
        }
      }.toDF("a", "b", "cosine")
  }

  /** SemDeDup-style semantic dedup (the embedding-space analog of MinHash
    * near-dup: cluster first, compare only within clusters). Vectors are
    * assigned to their nearest spherical-k-means cell (deterministic
    * xxhash64-seeded sample, optionally Lloyd-refined — the same centroid
    * machinery the IVF index uses), and a vector is DROPPED when some
    * LOWER-ID member of its cell has cosine ≥ `threshold` to it
    * (keep-lowest-id: deterministic, order-free). Returns the dropped ids.
    *
    * `nCells = 1` degenerates to the exact global rule — the
    * SQL-replayable oracle arm. For any clustering the dropped set is
    * PROVABLY a subset of the exact arm's (a within-cell pair is a global
    * pair), so the clustered arm has precision exactly 1 by construction
    * and only recall needs a measured gate. `nAssign` assigns each vector
    * to its nAssign nearest cells (multi-probe): pairs straddling a cell
    * boundary still meet in a shared second-choice cell — measured at
    * sf0.01 this lifts recall 0.34 → 0.91 at 16 cells for ~nAssign× the
    * pair-generation cost, the same recall/cost dial IVF probing turns.
    *
    * 100 TB posture: never all-pairs — candidate pairs are generated per
    * cell (the paper's per-cluster similarity matrices), so compare cost
    * is Σ|cell|², bounded by the clustering granularity; the assignment
    * is one narrow map against a broadcast nCells×dim matrix and the
    * per-cell self-join is one hash-partition shuffle on `cell`, skew-
    * bounded by the hottest cell like every windowed op here.
    */
  def semDedupDropped(corpus: DataFrame, threshold: Double, nCells: Int = 16,
                      refineIters: Int = 1, nAssign: Int = 2,
                      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import corpus.sparkSession.implicits._
    // nCells <= 1 is the EXACT global rule, i.e. an all-pairs baseline by
    // definition: take the exactPairs broadcast-and-scan shape (guardrailed
    // collect, no join node) rather than a degenerate constant-key
    // self-join, which Catalyst would plan as a nested-loop join
    if (nCells <= 1)
      return exactPairs(corpus, threshold, vecCol, idCol)
        .select(col("b").as("vec_id")).distinct()
    val assigned = {
        val cents = Ivf.refineCentroids(corpus,
          Ivf.centroids(corpus, nCells, vecCol, idCol), refineIters, vecCol, idCol)
        val centB = corpus.sparkSession.sparkContext.broadcast(
          cents.map { case (c, v) => (c, v, math.sqrt(dotLoop(v, v))) })
        val na = nAssign.max(1).min(nCells)
        corpus.select(col(idCol).cast("long"), col(vecCol))
          .as[(Long, Array[Float])]
          .mapPartitions { it =>
            val cs = centB.value
            it.flatMap { case (id, v) =>
              val vn = math.sqrt(dotLoop(v, v))
              // nAssign nearest cells (cosine desc, cell asc on ties) —
              // the multi-probe analog: a mid-similarity pair straddling a
              // cell boundary still collides in a shared second-choice
              // cell, which single-assignment SemDeDup structurally misses
              cs.map { case (c, cv, cn) =>
                (c, if (vn > 0 && cn > 0) dotLoop(v, cv) / (cn * vn) else 0.0)
              }.sortBy { case (c, cos) => (-cos, c) }
                .take(na).iterator.map { case (c, _) => (id, v, c) }
            }
          }.toDF("vec_id", "v", "cell")
      }
    assigned.as("x").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .where(cosine(col("x.v"), col("y.v")) >= threshold)
      .select(col("y.vec_id").as("vec_id"))
      .distinct()
  }

  /** SemDeDup survivors: the corpus minus [[semDedupDropped]]. */
  def semDedup(corpus: DataFrame, threshold: Double, nCells: Int = 16,
               refineIters: Int = 1, nAssign: Int = 2,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    corpus.join(
      semDedupDropped(corpus, threshold, nCells, refineIters, nAssign, vecCol, idCol)
        .withColumnRenamed("vec_id", idCol),
      Seq(idCol), "left_anti")

  /** CONTINUOUS-INGEST SemDeDup: dedup an arriving shard against the
    * PERSISTED IVF index (the [[Ivf.buildIndex]] layout) instead of
    * against a full corpus — the embedding-space analog of
    * `DedupIndex.dedupeAgainstIndex`. A new vector is DROPPED when its
    * best indexed match under `nProbe`-cell probing has cosine ≥
    * `threshold`; survivors are returned for the caller to fold in via
    * [[Ivf.appendToIndex]], keeping per-shard ingest O(shard) — the index
    * is both the dedup state and the ANN serving structure, maintained by
    * the same append/refresh lifecycle the IVF gates already pin.
    *
    * At `nProbe = nCells` the probe is exhaustive and every decision
    * EXACT (the gate configuration, SQL-replayable); production uses
    * bounded probes, whose recall the IVF recall gates measure.
    */
  def semDedupAgainstIndex(newVecs: DataFrame, indexPath: String,
                           threshold: Double, nProbe: Int = 8,
                           vecCol: String = "embedding",
                           idCol: String = "vec_id"): DataFrame = {
    val dropped = Ivf.queryIndex(indexPath, newVecs, k = 1, nProbe,
        vecCol, idCol)
      .where(col("cosine") >= threshold)
      .select(col("query_vec_id").as(idCol))
    newVecs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-dup candidates: pairs colliding in ≥1 LSH band
    * with exact cosine ≥ `threshold`. Never all-pairs.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   bands: Int = 8, bitsPerBand: Int = 12,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // slim banding: collisions move (id, band, sig) only; vectors join in
    // once per DISTINCT pair for a single cosine evaluation
    val banded = lshSignatures(corpus, idCol, vecCol, bands, bitsPerBand)
      .withColumnRenamed(idCol, "vec_id")
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    cands
      .join(vecs.withColumnsRenamed(Map("id" -> "a", "v" -> "va")), "a")
      .join(vecs.withColumnsRenamed(Map("id" -> "b", "v" -> "vb")), "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** MMR result DIVERSIFICATION (Carbonell & Goldstein, SIGIR'98): rerank
    * a relevance top-`poolSize` so each pick maximizes
    * `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` — the standard fix for
    * a retrieval page (or a few-shot example set) collapsing onto near
    * duplicates of one result. λ=1 degenerates to pure relevance order
    * (pinned by a test); lower λ trades relevance for spread.
    *
    * Shape: the DISTRIBUTED part is the candidate pool (brute/ANN/IVF
    * top-`poolSize` — any ranker); the greedy itself is O(k·poolSize)
    * scalar work over the collected pool, driver-side BY DESIGN with the
    * same bounded-collect guardrail as the centroid/codebook collects
    * (`poolSize ≤ maxPool`, fail-fast). Every double derives by the same
    * IEEE sequence the DuckDB oracle unrolls (`dotLoop` folds, fixed
    * `λ·rel − (1−λ)·maxsim` association, greatest-of-doubles maxsim),
    * so the gate compare is bit-exact; ties break by candidate id. Output:
    * `(rank, vec_id, rel, mmr)` — `mmr` is the pick's score at selection
    * time.
    */
  def mmrTopK(corpus: DataFrame, queryVec: DataFrame, k: Int = 10,
              poolSize: Int = 30, lambda: Double = 0.75,
              vecCol: String = "embedding", idCol: String = "vec_id",
              maxPool: Int = 10000): DataFrame = {
    require(k >= 1 && poolSize >= k, "mmrTopK: need poolSize >= k >= 1")
    require(poolSize <= maxPool,
      s"mmrTopK: poolSize $poolSize exceeds maxPool=$maxPool — the pool is " +
        "collected for the greedy; raise maxPool deliberately")
    require(lambda >= 0.0 && lambda <= 1.0, "mmrTopK: lambda in [0, 1]")
    // forward the column names so the relevance pool and the pairwise-
    // similarity side read the SAME columns (topK additionally requires a
    // `label` column on the query side — its broadcast carries it through)
    mmrRerank(
      topK(corpus, queryVec, poolSize, vecCol, idCol).select(col("vec_id"),
        col("cosine").as("rel")),
      corpus, k, lambda, vecCol, idCol, maxPool)
  }

  /** [[mmrTopK]] with the relevance ranking supplied by the CALLER — the
    * composition entry: any ranker's `(vec_id, rel)` pool (hybrid RRF,
    * an index-served list, a cross-encoder score) diversifies against
    * pairwise embedding cosine looked up from `corpus`. Pool rows missing
    * an embedding are a loud analysis-side error (inner join + count
    * check), not a silent drop.
    */
  def mmrRerank(ranked: DataFrame, corpus: DataFrame, k: Int = 10,
                lambda: Double = 0.75,
                vecCol: String = "embedding", idCol: String = "vec_id",
                maxPool: Int = 10000): DataFrame = {
    require(k >= 1, "mmrRerank: k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "mmrRerank: lambda in [0, 1]")
    val spark = corpus.sparkSession
    import spark.implicits._
    // bounded fail-fast collect of the pool itself (house head(max+1)
    // pattern), then DISTINCT-aware validation: raw count comparisons
    // misfire under duplicates (a duplicated ranked id inflates the inner
    // join and can mask a genuinely missing embedding — and would let the
    // greedy select one id twice), so ranked ids must be unique and the
    // corpus must carry exactly one embedding per pool id.
    val rankedRows = ranked
      .select(col("vec_id").cast("long"), col("rel").cast("double"))
      .as[(Long, Double)].head(maxPool + 1)
    require(rankedRows.length <= maxPool,
      s"mmrRerank: pool exceeds maxPool=$maxPool — the pool is " +
        "collected for the greedy; raise maxPool deliberately")
    val dupRanked = rankedRows.groupBy(_._1).collect {
      case (id, rs) if rs.length > 1 => id
    }
    require(dupRanked.isEmpty,
      s"mmrRerank: ranked pool has duplicate vec_id rows (" +
        dupRanked.toSeq.sorted.take(10).mkString(", ") +
        ") — pool ids must be unique or the greedy could select one twice")
    val joined = ranked.select(col("vec_id").cast("long").as("vec_id"))
      .join(corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol)),
        "vec_id")
      .select(col("vec_id"), col(vecCol))
      .as[(Long, Array[Float])].head(rankedRows.length + 1)
    require(joined.length <= rankedRows.length,
      s"mmrRerank: corpus has duplicate $idCol rows across the pool — the " +
        "pairwise-similarity side must carry exactly one embedding per id")
    val missing = rankedRows.map(_._1).toSet -- joined.map(_._1)
    require(missing.isEmpty,
      s"mmrRerank: ${missing.size} pool ids have no embedding in the " +
        s"corpus ($idCol): " + missing.toSeq.sorted.take(10).mkString(", "))
    val vecOf = joined.toMap
    val pool = rankedRows.sortBy(_._1)
      .map { case (id, rel) => (id, rel, vecOf(id)) }
    val oneMinus = 1.0 - lambda
    def cosOf(a: Array[Float], b: Array[Float]): Double =
      dotLoop(a, b) / (math.sqrt(dotLoop(a, a)) * math.sqrt(dotLoop(b, b)))
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double)] // (rank, id, rel, mmr)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < remaining.length) {
        val (_, rel, vec) = remaining(i)
        val maxsim =
          if (chosen.isEmpty) 0.0
          else chosen.iterator.map(s => cosOf(vec, s)).max
        val mmr = lambda * rel - oneMinus * maxsim
        // strict > plus ascending-id iteration = smallest-id tie-break,
        // matching the oracle's ORDER BY mmr DESC, vec_id LIMIT 1
        if (mmr > bestScore) { bestScore = mmr; bestIdx = i }
        i += 1
      }
      val (id, rel, vec) = remaining.remove(bestIdx)
      selected += ((rank, id, rel, bestScore))
      chosen += vec
      rank += 1
    }
    selected.toSeq.toDF("rank", "vec_id", "rel", "mmr")
  }
}
