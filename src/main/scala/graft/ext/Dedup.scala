package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication over a document corpus (SURVEY.md §2.11 X1/X2).
  *
  * Scale posture (the part that matters at 100 TB):
  *  - exact dedup is one hash-groupBy — a single shuffle on a uniform key;
  *  - near-dup NEVER does all-pairs: candidates come either from an
  *    inverted shingle index (pairs must share ≥1 shingle) or from MinHash
  *    LSH banding (pairs must collide in ≥1 band). Both are
  *    `explode → groupBy/join on a compact key`, so cost tracks the number
  *    of *colliding* pairs, not n².
  */
object Dedup {

  /** X1 exact dedup: group by content hash; keeper = min(doc_id). */
  def exact(docs: DataFrame,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** C4-style text canonicalization for duplicate detection: lowercase,
    * ASCII punctuation stripped (the four ASCII punct ranges — non-ASCII
    * letters pass through untouched, so CJK text is NOT destroyed),
    * whitespace runs collapsed to one space, ends trimmed. Every step is
    * a builtin (codegen'd, no UDF) with an exact regexp twin in the
    * oracle.
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[!-/:-@\\[-`{-~]", ""), "\\s+", " "))

  /** [[exact]] over the NORMALIZED text — the dedup arm that catches the
    * trivially-reformatted copies (case, punctuation, whitespace) byte
    * hashing misses, the C4/RefinedWeb first pass before any near-dup
    * machinery runs.
    */
  def exactNormalized(docs: DataFrame,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(normalized(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles from a BOUND token-array column. The
    * tokens must be a plain attribute, not an inline `split(...)`: lambda
    * bodies in higher-order functions are evaluated interpreted with no
    * common-subexpression elimination, so an embedded split would re-run
    * per element reference (measured 4s/5000 docs at sf0.1). Docs shorter
    * than `n` tokens yield an empty array (Spark's `sequence` would
    * otherwise run descending and fabricate positions).
    */
  def shinglesFromTokens(w: Column, n: Int = 3): Column =
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws("_", (0 until n).map(o => element_at(w, i + o + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Convenience for small inputs/tests; see shinglesFromTokens for why the
    * hot paths bind the token column first.
    */
  def shingles(textCol: Column, n: Int = 3): Column =
    shinglesFromTokens(split(textCol, " "), n)

  /** `(doc_id, sh)` computed in a tight per-partition loop — the string
    * churn of shingling (split → n-gram concat → first-occurrence dedup) is
    * per-row imperative work where interpreted higher-order expressions
    * measured ~3s/5000 docs; the loop produces the exact same arrays (same
    * separator, same first-occurrence order) as `shinglesFromTokens`.
    */
  private[ext] def shingled(docs: DataFrame, n: Int,
                            textCol: String, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          val sh =
            if (w.length < n) Array.empty[String]
            else {
              val seen = new java.util.LinkedHashSet[String]()
              var i = 0
              while (i <= w.length - n) {
                val sb = new StringBuilder(w(i))
                var o = 1
                while (o < n) { sb.append('_').append(w(i + o)); o += 1 }
                seen.add(sb.toString)
                i += 1
              }
              seen.toArray(new Array[String](seen.size))
            }
          (id, sh)
        }
      }.toDF("doc_id", "sh")
  }

  /** Banded MinHash signature rows `(doc_id, band, band_hash)` from a
    * shingled frame. ROW-LOCAL: one loop per doc computes all permuted
    * minima and band hashes — no explode + per-permutation aggregation
    * shuffle. The permutation coefficients are drawn from a FIXED seed, so
    * two invocations with the same `(bands, rowsPerBand)` produce
    * identical signatures — the property the persisted dedup index relies
    * on (signatures written at build time must collide with signatures
    * computed at query time).
    */
  private[ext] def bandedRows(sh: DataFrame, bands: Int,
                              rowsPerBand: Int): DataFrame = {
    val abArr = minhashCoeffs(bands * rowsPerBand)
    import sh.sparkSession.implicits._
    sh.select(col("doc_id"), col("sh")).as[(Long, Array[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, shingles) =>
          bandHashesOf(shingles, abArr, bands, rowsPerBand).zipWithIndex
            .map { case (bh, b) => (id, b, bh) }
        }
      }.toDF("doc_id", "band", "band_hash")
  }

  private val MinhashP = 2147483647L // 2^31 − 1

  /** The fixed-seed permutation coefficients every banding run shares —
    * factored out so a driver-side caller (the persisted index's scheme
    * fingerprint) computes the exact signatures the executors do.
    */
  private[ext] def minhashCoeffs(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(8191)
    Array.fill(numHashes)(
      (math.abs(rnd.nextLong()) % (MinhashP - 1)) + 1,
      math.abs(rnd.nextLong()) % MinhashP)
  }

  /** One document's band hashes (index = band). Single code path for the
    * executor loop AND the index fingerprint, so the fingerprint breaks iff
    * real signatures would (MurmurHash3 / Random internals drifting across
    * Scala or JVM versions).
    */
  private[ext] def bandHashesOf(shingles: Array[String],
                                abArr: Array[(Long, Long)],
                                bands: Int, rowsPerBand: Int): Array[Long] = {
    val mins = Array.fill(abArr.length)(Long.MaxValue)
    shingles.foreach { s =>
      val h = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s).toLong, MinhashP)
      var i = 0
      while (i < abArr.length) {
        val (a, b) = abArr(i)
        val v = math.floorMod(h * a + b, MinhashP)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    Array.tabulate(bands) { b =>
      var bh = 1125899906842597L // simple polynomial band hash
      var r = 0
      while (r < rowsPerBand) {
        bh = bh * 31 + mins(b * rowsPerBand + r); r += 1
      }
      bh
    }
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b)).cast("long")
    i.cast("double") / (size(a).cast("long") + size(b).cast("long") - i)
  }

  /** X2a shingle-index near-dup: candidate pairs share ≥1 shingle (inverted
    * index), verified by exact Jaccard ≥ `threshold`. Output (a, b, jac),
    * a < b.
    *
    * `docFreqCap`: at 100 TB a stop-phrase shingle appearing in millions of
    * docs makes the index self-join quadratic in that posting list. With a
    * cap, shingles whose document frequency exceeds it are dropped from the
    * INDEX ONLY — Jaccard is still computed over the full shingle sets, so
    * surviving pairs score exactly; only candidate recall can drop (a pair
    * sharing exclusively ultra-common shingles is a non-duplicate anyway).
    * Default `None` keeps the exact candidate set (the oracle contract).
    */
  def nearDupJaccard(docs: DataFrame, threshold: Double, n: Int = 3,
                     textCol: String = "text", idCol: String = "doc_id",
                     docFreqCap: Option[Int] = None): DataFrame = {
    val sh = shingled(docs, n, textCol, idCol)
    val sized = sh.select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
    val inv0 = sized.select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
    val inv = docFreqCap.fold(inv0) { cap =>
      // df via groupBy + anti-join, NOT a Window.partitionBy("s"): the
      // partial-aggregating groupBy combines hot shingles map-side, where a
      // window would route a hot shingle's entire posting list through one
      // task — recreating the very skew hotspot the cap exists to bound
      val hot = inv0.groupBy("s").agg(count(lit(1)).as("_df"))
        .where(col("_df") > cap).select("s")
      inv0.join(hot, Seq("s"), "left_anti")
    }
    val pairs = inv.as("x").join(inv.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sz").as("sa"), col("y.sz").as("sb"))
      .agg(count(lit(1)).as("i"))
    if (docFreqCap.isEmpty)
      // uncapped: the collision count IS the intersection size — score from it
      pairs
        .select(col("a"), col("b"),
          (col("i").cast("double") / (col("sa") + col("sb") - col("i"))).as("jaccard"))
        .where(col("jaccard") >= threshold)
    else
      // capped: collisions undercount the intersection (capped shingles are
      // absent from the index), so re-score candidates from the FULL sets
      pairs.select(col("a"), col("b"))
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
        .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
        .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
        .where(col("jaccard") >= threshold)
  }

  /** Cross-corpus DECONTAMINATION — the train-vs-eval overlap removal a
    * training pipeline must run before shipping a corpus: drops from
    * `corpus` every document that is an exact copy (md5 text equality) or
    * a near-duplicate (shingle-Jaccard ≥ `threshold`) of ANY document in
    * `held` (the eval/benchmark side). Candidates come from joining the two
    * corpora's inverted shingle indexes — never all-pairs — so cost tracks
    * shared-shingle collisions; the held side is small by contract (eval
    * sets) and is broadcast into the index join, leaving the big corpus
    * side shuffle-free for candidate generation. Returns the surviving
    * `corpus` rows unchanged.
    */
  def decontaminate(corpus: DataFrame, held: DataFrame,
                    threshold: Double = 0.8, n: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cInv = shingled(corpus, n, textCol, idCol)
      .select(col("doc_id").as("cid"), size(col("sh")).cast("long").as("sc"),
        explode(col("sh")).as("s"))
    val hInv = shingled(held, n, textCol, idCol)
      .select(col("doc_id").as("hid"), size(col("sh")).cast("long").as("sz_h"),
        explode(col("sh")).as("s"))
    val nearDup = cInv.join(broadcast(hInv), "s")
      .groupBy("cid", "hid", "sc", "sz_h")
      .agg(count(lit(1)).as("i"))
      .where(col("i").cast("double") / (col("sc") + col("sz_h") - col("i"))
        >= threshold)
      .select(col("cid").as(idCol))
    val exact = corpus.select(col(idCol), md5(col(textCol)).as("_h"))
      .join(broadcast(held.select(md5(col(textCol)).as("_h")).distinct()), "_h")
      .select(col(idCol))
    // doomed is O(contaminated) — unioned, deduped by the anti-join itself
    corpus.join(nearDup.unionByName(exact), Seq(idCol), "left_anti")
  }

  /** X2b MinHash+LSH near-dup: signature → `bands` bands of `rowsPerBand`
    * → band-hash collision join → exact-Jaccard verification ≥ `threshold`.
    *
    * EAGER + VOLATILE: the verified pair set is materialized at call time
    * via `localCheckpoint(true)` (runs the whole LSH pipeline immediately)
    * and lives in non-replicated executor storage — it is not recomputable
    * from lineage after an executor loss. Callers composing it lazily or
    * expecting fault-tolerant recomputation should persist the result to
    * storage; the trade buys a flat plan for downstream iteration
    * (duplicateClusters) and lets the shingle cache release at return.
    * With rowsPerBand=4, bands=16: P(candidate | j) = 1−(1−j⁴)¹⁶ — steep
    * around j≈0.7, so near-orthogonal corpus pairs almost never collide
    * while pairs at the 0.8 threshold are caught w.p. ≥ 0.9997; the
    * verified output equals the exact shingle-index result (same oracle).
    *
    * Shape chosen for scale AND codegen: shingles are exploded to rows and
    * hashed ONCE, then all `numHashes` permuted minima come from a single
    * `groupBy(doc).agg(min…)` — one shuffle keyed by doc, flat codegen'd
    * aggregates, no nested-lambda expression that projection collapse would
    * duplicate per permutation (the array-lambda formulation measured 60×
    * slower at sf0.1 for exactly that reason).
    */
  def nearDupMinhash(docs: DataFrame, threshold: Double, n: Int = 3,
                     bands: Int = 16, rowsPerBand: Int = 4,
                     textCol: String = "text", idCol: String = "doc_id",
                     maxBucket: Int = 64): DataFrame = {
    // persisted: referenced by the signature path AND both verify joins —
    // without it every branch would recompute the shingling. Released in the
    // finally below (buckets too — a mid-pipeline throw must not leak either
    // cache): the verified pair set is materialized eagerly, so the returned
    // DataFrame no longer pins these blocks (round-2 leak: repeated
    // invocations accumulated cached shingle blocks forever).
    val sh = shingled(docs, n, textCol, idCol).where(size(col("sh")) > 0).persist()
    var pinned: DataFrame = null // the persisted slim (id, band, hash) rows
    try {
    val banded = bandedRows(sh, bands, rowsPerBand)
    // pair generation INSIDE each (band, bucket): one shuffle, no self-join
    // (which would recompute the signature pipeline once per side). Buckets
    // hold near-identical docs, so expanding pairs bucket-locally is the
    // candidate set by construction; ids are sorted so a < b.
    //
    // Hot-bucket bound, decided BEFORE any array materializes: bucket sizes
    // come from a counting aggregation (constant-size state per bucket), and
    // only buckets with 1 < size ≤ maxBucket are collect_list'ed — a
    // degenerate bucket of k identical docs never builds a k-element array
    // in one aggregation buffer, let alone the k²/2 pair structs of one
    // in-row expansion. Oversize buckets route through a join-based
    // expansion: k slim rows self-joined bucket-locally, the inherent k²
    // output streaming through tasks. The candidate SET is identical either
    // way (both expand exactly {(a,b) : a<b in bucket}).
    pinned = banded.persist() // slim (id, band, hash) rows, read 3×
    val sizes = pinned.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
    val small = pinned
      .join(sizes.where(col("_n") <= maxBucket).select("band", "band_hash"),
        Seq("band", "band_hash"), "left_semi")
      .groupBy("band", "band_hash")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ids")) - 2),
        i => transform(
          slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          b => struct(element_at(col("ids"), i + 1).as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bigIds = pinned
      .join(broadcast(sizes.where(col("_n") > maxBucket)
        .select("band", "band_hash")), Seq("band", "band_hash"), "left_semi")
      .select(col("band"), col("band_hash"), col("doc_id"))
    val big = bigIds.as("x").join(bigIds.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val candidates = small.unionByName(big).distinct()
    val withSets = candidates
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
    val verified = withSets
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // Eager materialization: the verified pair set is tiny relative to the
    // corpus (only true near-dups), and checkpointing it here (a) frees the
    // shingle cache immediately, (b) hands downstream consumers
    // (duplicateClusters' iterations) a flat plan instead of lineage chaining
    // through the whole LSH pipeline.
    verified.localCheckpoint(true)
    } finally {
      sh.unpersist()
      if (pinned != null) pinned.unpersist()
      ()
    }
  }

  /** Duplicate-cluster resolution: connected components over a near-dup
    * pair list via iterative min-label propagation (the small-star/
    * large-star pattern — each round is one shuffle; rounds ≈ cluster
    * diameter, which for dedup clusters is tiny). Returns
    * `(doc_id, cluster)` where `cluster` is the smallest doc_id reachable.
    * This is the step that turns pairwise candidates into "keep one doc
    * per duplicate group" at corpus scale — no driver-side union-find.
    *
    * Convergence is observed via a zero-change round, so detection takes
    * diameter+1 rounds: `maxIter` must EXCEED the largest cluster diameter
    * (a component reaching fixpoint exactly on round maxIter still throws —
    * conservative, never wrong). The default of 20 covers dedup clusters,
    * whose diameter is bounded by near-identical-text transitivity.
    *
    * Storage discipline: each round's labels are eagerly checkpointed (one
    * materializing job, truncated lineage); the PREVIOUS round's checkpoint
    * blocks are unpersisted as soon as the new round supersedes them, so
    * executor storage holds O(1) label generations however many rounds run
    * (round-3 advice: GC-only release pinned up to maxIter snapshots).
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    import graft.Plans.checkpointTracked
    val (edges, edgeRdds) = checkpointTracked(
      pairs.select(col("a"), col("b"))
        .union(pairs.select(col("b").as("a"), col("a").as("b"))))
    // Each round is ONE materializing job: the `_changed` flag rides the
    // same pass that computes the new labels, and the eager localCheckpoint
    // both runs that job and truncates lineage (without it round i's plan
    // chains through every previous round back into the pair pipeline — the
    // round-2 bench paid 22s here). The convergence probe below then scans
    // checkpointed blocks, not a recomputation.
    var (labels, labelRdds) = checkpointTracked(
      edges.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate label per node: min of own and neighbors' labels
      val viaNeighbors = edges
        .join(labels.select(col("id").as("b"), col("label").as("nbl")), "b")
        .groupBy(col("a").as("id")).agg(min("nbl").as("nbl"))
      val (next, nextRdds) = checkpointTracked(
        labels.join(viaNeighbors, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbl"), col("label"))).as("label"),
            (coalesce(col("nbl"), col("label")) < col("label")).as("_changed")))
      converged = next.where(col("_changed")).limit(1).count() == 0L
      // `next` is checkpointed — the old labels are no longer referenced
      labelRdds.foreach(_.unpersist(blocking = false))
      labels = next.drop("_changed")
      labelRdds = nextRdds
      i += 1
    }
    // the returned labels are self-contained checkpoint data; the
    // doubled-edge set is only needed while iterating
    edgeRdds.foreach(_.unpersist(blocking = false))
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters: min-label propagation did not converge in $maxIter " +
          "rounds (cluster diameter > maxIter) — raise maxIter; refusing to " +
          "return incorrect cluster labels")
    labels.withColumnRenamed("label", "cluster")
  }

  /** Deduplicated corpus: drop every doc that shares a near-dup cluster
    * with a smaller doc_id (exact + near duplicates collapse to one
    * representative each).
    */
  def keepOnePerCluster(docs: DataFrame, pairs: DataFrame,
                        idCol: String = "doc_id"): DataFrame = {
    val doomed = duplicateClusters(pairs)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    // deliberately NO broadcast hint: doomed is O(duplicate count) — often
    // 30-50% of a web corpus, far past broadcastable — so the shuffled
    // anti-join on the uniform doc_id key is the plan that survives 100 TB;
    // when doomed IS small, AQE converts it to a broadcast join at runtime
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** LEAKAGE-FREE train/eval split (X6 extension): content-hash split
    * assignment in which every near-duplicate CLUSTER lands wholly on one
    * side. A plain per-document content split ([[Text.splitAssign]]) puts
    * two near-identical documents on OPPOSITE sides of a train/eval cut
    * whenever their bytes differ at all — the classic evaluation-leakage
    * failure that span decontamination exists to paper over after the
    * fact; splitting cluster-atomically prevents it at assignment time.
    *
    * The split key is the cluster REPRESENTATIVE's content hash: `pairs`
    * (from [[nearDupMinhash]] / [[exactPairs]] / any candidate+verify
    * pipeline) collapse to min-label connected components
    * ([[duplicateClusters]]), and every member takes
    * `pmod(docHash(representativeText), buckets)`. Deterministic,
    * content-defined, cluster-atomic by construction; a document with no
    * duplicate partner is its own representative, so singletons split
    * exactly as `splitAssign` would — the leakage fix changes ONLY the
    * documents that needed it.
    *
    * Scale shape: two equi-join shuffles on uniform keys (members by id
    * against the O(duplicates) label table — AQE broadcasts it when
    * small — then members by cluster against the O(clusters)
    * representative hashes); the corpus text column is never shuffled
    * (the hash travels, not the text).
    *
    * Output: `docs` + (`cluster`, `split_bucket`).
    */
  def splitWithoutLeakage(docs: DataFrame, pairs: DataFrame,
                          buckets: Int = 10,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val clusters = duplicateClusters(pairs)
      .select(col("id").cast("long").as(idCol), col("cluster").cast("long"))
    val withCluster = docs
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster",
        coalesce(col("cluster"), col(idCol).cast("long")))
    // representative = the member whose id IS the min label (always a
    // member of its component); only (cluster, hash) travels
    val reps = withCluster.where(col(idCol).cast("long") === col("cluster"))
      .select(col("cluster"), Text.docHash(col(textCol)).as("_rh"))
    withCluster.join(reps, Seq("cluster"))
      .withColumn("split_bucket", pmod(col("_rh"), lit(buckets.toLong)))
      .drop("_rh")
  }

  /** X2c SimHash 64-bit signature of a shingle set, computed row-locally:
    * bit j is set when Σ_shingles ±1 > 0, the ±1 being bit j of the
    * shingle's 64-bit hash. (64 per-bit interpreted array folds — the
    * expression formulation — paid the same interpreted-lambda tax the
    * minhash path did; signatures are per-row work.)
    */
  private[ext] def simhash64(shingles: Array[String]): Long = {
    val votes = new Array[Int](64)
    shingles.foreach { s =>
      val lo = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      val hi = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
      val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** SimHash near-dup candidates: docs whose signatures collide on one of
    * four 16-bit bands, with the pair's Hamming distance attached. Pair
    * generation is bucket-local like the minhash path, with the SAME
    * hot-bucket discipline: sizes are counted first (constant-state agg),
    * buckets ≤ `maxBucket` expand in-row from a collect_list'ed array, and
    * oversize buckets (k near-identical docs ⇒ k²/2 inherent pairs) route
    * through a streaming bucket-local self-join instead of materializing
    * either the k-element array or the pair structs in one buffer. The
    * pair set is identical on both routes.
    *
    * EAGER + VOLATILE like `nearDupMinhash`: the pair set materializes at
    * call time via `localCheckpoint(true)` (frees the banded-signature
    * cache at return; not recomputable after executor loss).
    */
  def simhashCandidates(docs: DataFrame, n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id",
                        maxBucket: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    val banded = shingled(docs, n, textCol, idCol)
      .select(col("doc_id"), col("sh")).as[(Long, Array[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, sh) =>
          val sig = simhash64(sh)
          (0 until 4).map(b => (id, sig, b, (sig >>> (b * 16)) & 0xffffL))
        }
      }.toDF("doc_id", "sig", "band", "band_bits")
      .persist()
    try {
      val sizes = banded.groupBy("band", "band_bits")
        .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
      val hamming = (x: Column, y: Column) =>
        bit_count(x("sig").bitwiseXOR(y("sig")))
      val small = banded
        .join(sizes.where(col("_n") <= maxBucket).select("band", "band_bits"),
          Seq("band", "band_bits"), "left_semi")
        .groupBy("band", "band_bits")
        .agg(array_sort(collect_list(struct(col("doc_id"), col("sig")))).as("members"))
        .select(explode(flatten(transform(
          sequence(lit(0), size(col("members")) - 2),
          i => transform(
            slice(col("members"), i + 2, size(col("members")) - i - 1),
            y => struct(
              element_at(col("members"), i + 1)("doc_id").as("a"),
              y("doc_id").as("b"),
              hamming(element_at(col("members"), i + 1), y).as("hamming")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("p.hamming").as("hamming"))
      val bigRows = banded
        .join(broadcast(sizes.where(col("_n") > maxBucket)
          .select("band", "band_bits")), Seq("band", "band_bits"), "left_semi")
      val big = bigRows.as("x").join(bigRows.as("y"),
          col("x.band") === col("y.band") && col("x.band_bits") === col("y.band_bits") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      val out = small.unionByName(big).distinct().localCheckpoint(true)
      out
    } finally { banded.unpersist(); () }
  }

  /** `(doc_id, g)` — one row per k-token span position; docs shorter than
    * `k` tokens emit nothing. Shared by the span-dedup family. A tight
    * per-partition loop for the same reason as [[shingled]]: the
    * `transform`/`slice`/`concat_ws` formulation runs interpreted lambda
    * bodies per position AND materializes the whole per-doc gram array
    * before exploding; the loop streams grams straight out
    * ([[spanGramsDeclarative]] is the twin, asserted equal in
    * CorpusOpsSpec, and the randomized model-check pins the semantics).
    */
  private[graft] def spanGrams(docs: DataFrame, k: Int,
                             textCol: String, idCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (w.length < k) Iterator.empty
          else (0 to w.length - k).iterator.map { i =>
            val sb = new java.lang.StringBuilder(w(i))
            var o = 1
            while (o < k) { sb.append(' ').append(w(i + o)); o += 1 }
            (id, sb.toString)
          }
        }
      }.toDF("doc_id", "g")
  }

  /** The declarative twin of [[spanGrams]] kept as its semantic reference. */
  private[graft] def spanGramsDeclarative(docs: DataFrame, k: Int,
                                        textCol: String,
                                        idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .where(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - k),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(k))))).as("g"))

  /** X2e substring-level (duplicated-span) dedup, the span-granular
    * complement to the document-granular near-dup family: a run of `k`
    * consecutive whitespace tokens occurring more than once across the
    * corpus marks every covering position as duplicated boilerplate
    * (templates, license headers, scraped navigation). Per surviving doc:
    * `(doc_id, total_grams, dup_grams, overlap_ratio)`; docs shorter than
    * `k` tokens have no k-gram and emit no row. With `crossDocOnly` a gram
    * must appear in more than one DISTINCT document (within-doc repetition
    * ignored); the default counts total occurrences, so a doc repeating
    * its own span is also flagged.
    *
    * This is the linear-scan rendering of the suffix-array approach in
    * Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better" (arXiv:2107.06499): the suffix array finds repeated substrings
    * via a global sort; on Spark the same repeated-span set (at fixed span
    * length k) is an `explode → partial-agg groupBy` — hot spans combine
    * map-side, there is no global sort, and nothing is driver-resident.
    *
    * Scale posture: one row per token position (the same expansion every
    * shingle index here pays); `hashGrams` (default) shuffles an 8-byte
    * xxhash64 of the span instead of the k-token string, so shuffle width
    * is constant in k. The dup-gram set is joined back on the gram key —
    * a shuffle equi-join whose skew is bounded by the same partial-agg
    * discipline as the shingle index's docFreqCap. The oracle gate runs
    * `hashGrams = false` so DuckDB replays the span key byte-for-byte;
    * a spec asserts both key schemes produce identical per-doc counts.
    */
  def substringOverlap(docs: DataFrame, k: Int = 8,
                       textCol: String = "text", idCol: String = "doc_id",
                       hashGrams: Boolean = true,
                       crossDocOnly: Boolean = false): DataFrame = {
    val grams = spanGrams(docs, k, textCol, idCol)
    val keyed =
      if (hashGrams) grams.select(col("doc_id"), xxhash64(col("g")).as("g"))
      else grams
    val dup =
      if (crossDocOnly)
        // two-level agg, not count_distinct: (g, doc_id) partials combine
        // map-side so a corpus-wide hot span never funnels through one task
        keyed.groupBy("g", "doc_id").agg(count(lit(1)).as("_c"))
          .groupBy("g").agg(count(lit(1)).as("_n"))
          .where(col("_n") > 1).select("g")
      else
        keyed.groupBy("g").agg(count(lit(1)).as("_n"))
          .where(col("_n") > 1).select("g")
    val total = keyed.groupBy("doc_id").agg(count(lit(1)).as("total_grams"))
    val dupPerDoc = keyed.join(dup, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("dup_grams"))
    total.join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        (coalesce(col("dup_grams"), lit(0L)).cast("double") /
          col("total_grams")).as("overlap_ratio"))
  }

  /** SPAN-LEVEL cross-corpus decontamination: drop from `corpus` every doc
    * sharing at least one run of `k` consecutive tokens with ANY held-out
    * document — the published eval-overlap filter (Brown et al. 2020,
    * "Language Models are Few-Shot Learners", arXiv:2005.14165 app. C uses
    * 13-gram overlap; `k` defaults to 13 accordingly). Complements
    * [[decontaminate]]'s document-similarity flavor: a doc that EMBEDS an
    * eval item inside otherwise-novel text scores low Jaccard yet is still
    * contaminated — span overlap catches exactly that.
    *
    * Scale shape mirrors [[decontaminate]]: the held side is small by
    * contract (eval sets), so its DISTINCT span set broadcasts into a
    * semi-join against the corpus's exploded spans — the corpus side stays
    * shuffle-free, and the semi-join cannot expand rows however hot a span
    * is. `hashGrams` (default) matches on 8-byte xxhash64 keys; the gate
    * runs the default against a string-keyed DuckDB replay, so the hash
    * scheme itself is oracle-checked.
    */
  def decontaminateSpans(corpus: DataFrame, held: DataFrame, k: Int = 13,
                         textCol: String = "text", idCol: String = "doc_id",
                         hashGrams: Boolean = true): DataFrame = {
    val key = (df: DataFrame) =>
      if (hashGrams) df.select(col("doc_id"), xxhash64(col("g")).as("g"))
      else df
    val cg = key(spanGrams(corpus, k, textCol, idCol))
    val hg = key(spanGrams(held, k, textCol, idCol)).select("g").distinct()
    val doomed = cg.join(broadcast(hg), Seq("g"), "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
    corpus.join(doomed, Seq(idCol), "left_anti")
  }

  /** The corpus-side deliverable over [[substringOverlap]]: drop every doc
    * whose duplicated-span coverage exceeds `maxOverlap`. Docs shorter than
    * `k` tokens carry no spans and always survive.
    */
  def dropOverlapping(docs: DataFrame, maxOverlap: Double, k: Int = 8,
                      textCol: String = "text", idCol: String = "doc_id",
                      crossDocOnly: Boolean = false): DataFrame = {
    val doomed = substringOverlap(docs, k, textCol, idCol,
        hashGrams = true, crossDocOnly = crossDocOnly)
      .where(col("overlap_ratio") > maxOverlap)
      .select(col("doc_id").as(idCol))
    docs.join(doomed, Seq(idCol), "left_anti")
  }
}
