package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-driven subword tokenizer — the greedy longest-prefix-match
  * decision rule BPE/WordPiece inference applies once a merges table has
  * been learned: each whitespace word is consumed left to right, at every
  * position taking the LONGEST vocabulary entry that prefixes the
  * remainder, or a single character as an unknown token when nothing
  * matches. This replaces the regex token-count ESTIMATE
  * (`Text.bpeishTokenCount`) wherever a token budget should reflect what
  * a training run's real tokenizer would see (packing, chunk budgets,
  * length histograms).
  *
  * Scale shape: the vocabulary is driver state broadcast once (real BPE
  * vocabs are 32–100k entries — a few MB), tokenization is a tight
  * per-partition loop over the shard (same discipline as
  * `Dedup.shingled`), and the output is one slim `(id, n_tok)` row per
  * document — a narrow map, no shuffle.
  *
  * Exactness: the per-word token count is a pure function of (word,
  * vocab), so the oracle tokenizes each DISTINCT word once via a
  * recursive CTE replaying the same longest-prefix rule and joins counts
  * back — an independent implementation, not a port. Positions are
  * consumed by UTF-16 code unit on the Spark side and by code point in
  * DuckDB: identical for BMP text (this corpus; supplementary-plane
  * emoji would diverge and would need a code-point loop here).
  */
object Bpe {

  /** Deterministic fixture vocabulary for the gates: subwords of the
    * synthetic corpus' lexicon plus bare vowels, mixing whole-word,
    * multi-char and single-char matches so every arm of the
    * longest-match rule fires (consonants are absent, exercising the
    * unknown-token fallback).
    */
  val FixtureVocab: Seq[String] = Seq(
    "the", "query", "quer", "sort", "filter", "fil", "ter", "stream",
    "str", "eam", "agg", "small", "window", "win", "dow", "value", "val",
    "ue", "batch", "ba", "tch", "table", "ta", "ble", "group", "gr",
    "oup", "order", "or", "der", "hash", "ha", "sh", "scan", "sc", "an",
    "big", "key", "row", "data", "da", "line", "li", "ne", "vector",
    "vec", "tor", "part", "par", "merge", "mer", "ge", "column", "col",
    "umn", "slow", "sl", "ow", "customer", "cust", "omer",
    "a", "e", "i", "o", "u")

  /** Greedy longest-prefix token count of ONE word — allocation-free hot
    * loop; `maxLen` caps the probe length at the longest vocab entry.
    */
  private[graft] def countTokens(w: String, vocab: Set[String], maxLen: Int): Long = {
    var n = 0L
    var i = 0
    while (i < w.length) {
      var l = math.min(maxLen, w.length - i)
      var step = 1
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(w.substring(i, i + l))) { step = l; found = true }
        l -= 1
      }
      n += 1
      i += step
    }
    n
  }

  /** The tokens themselves (tests + debugging; the count path above never
    * materializes them).
    */
  private[graft] def tokenizeWord(w: String, vocab: Set[String],
                                  maxLen: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      var l = math.min(maxLen, w.length - i)
      var step = 1
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(w.substring(i, i + l))) { step = l; found = true }
        l -= 1
      }
      out += w.substring(i, i + step)
      i += step
    }
    out.result()
  }

  /** Apply one merge `(l, r) → lr` to a symbol sequence, leftmost
    * non-overlapping in a single left-to-right pass — the standard BPE
    * apply order (and exactly what a string `replace` of `·l·r·` with
    * `·lr·` does on a delimiter-joined rendering, which is how the DuckDB
    * oracle replays it).
    */
  private[graft] def applyMerge(s: Array[String], l: String,
                                r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** LEARN a BPE merge table from a corpus — the standard training loop
    * (count adjacent symbol pairs weighted by word frequency, merge the
    * most frequent pair, repeat), distributed:
    *
    *  - the corpus is scanned ONCE into a distinct-word frequency table
    *    (one shuffle) — at 100 TB the word table is orders of magnitude
    *    smaller than the corpus (heavy-tailed vocabulary), and it is the
    *    only thing the loop ever touches again;
    *  - each merge step is one partial-aggregating pair-count shuffle
    *    over the word table plus a narrow merge-apply map; the driver
    *    only ever holds the argmax pair and the merge list (O(numMerges));
    *  - the evolving word table is localCheckpoint'd per step so the loop
    *    does not re-derive K generations of lineage.
    *
    * Determinism: ties break by (weight DESC, left ASC, right ASC) — the
    * oracle replays the same total order. Stops early when the best
    * pair's weight drops below `minCount` (merging hapax pairs memorizes
    * the corpus). For production-size vocabularies (K ≈ 32k) the per-step
    * driver round-trip dominates; there the word-frequency table (a few
    * million rows) collapses to the driver and the classic heap-based
    * learner finishes in memory — this loop is the shape that stays
    * distributed when it does NOT fit.
    *
    * Returns `(left, right, weight)` in merge order.
    */
  def learnMerges(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
                  textCol: String = "text"): Seq[(String, String, Long)] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    import docs.sparkSession.implicits._
    var words = docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").count()
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .localCheckpoint(true)
    var prev = words
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    // BATCHED ROUNDS, bit-identical to the one-merge-per-job loop: each
    // round collects the top `BatchK` pairs (same shuffle as top-1) and
    // merges the maximal SAFE PREFIX of that sorted list in one pass over
    // the word table. A prefix element p_j is safe iff
    //  (a) its symbols are disjoint from every earlier chosen pair's —
    //      then no earlier merge changes p_j's count or positions, and
    //  (b) p_j's weight STRICTLY exceeds the best possible weight of any
    //      pair an earlier merge CREATES — a new pair (x, ab) consumes an
    //      occurrence of (x, a), so its weight is ≤ min(w(x,a), w(a,b));
    //      pairs outside the collected list are bounded by the last
    //      collected weight. Strict ensures no new pair can even TIE p_j,
    //      so the sequential (w DESC, l, r) order is reproduced exactly.
    // Existing pairs can't overtake a prefix element either: merge steps
    // only ever decrease existing counts. The first unsafe element ends
    // the batch (no skipping — a skipped higher-weight pair would be the
    // sequential argmax). Worst case the prefix is length 1 and the round
    // degenerates to the original loop; Zipfian pair tables batch heavily,
    // cutting the jobs-per-vocab constant (the trainer's 100 TB watch item).
    val BatchK = 64
    while (k < numMerges && !done) {
      val top = words
        .flatMap { case (s, c) =>
          (0 until s.length - 1).map(i => (s(i), s(i + 1), c)) }
        .toDF("l", "r", "cnt")
        .groupBy("l", "r").agg(sum("cnt").as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(BatchK)
        .as[(String, String, Long)].collect()
      if (top.isEmpty || top.head._3 < minCount) done = true
      else {
        val uncollectedBound = top.last._3 // any pair not collected is ≤ this
        val chosen = scala.collection.mutable.ArrayBuffer(top.head)
        var stop = false
        top.tail.foreach { cand =>
          val (cl, cr, cw) = cand
          if (!stop && k + chosen.length < numMerges && cw >= minCount) {
            val disjoint = chosen.forall { case (l, r, _) =>
              cl != l && cl != r && cr != l && cr != r }
            val beatsNewPairs = chosen.forall { case (l, r, w) =>
              // strongest pair a merge of (l, r) can create: (x, l·r)
              // needs (x, l) before it, (l·r, y) needs (r, y) after it
              val interacting = top.iterator
                .filter { case (ql, qr, _) => qr == l || ql == r }
                .map { case (_, _, qw) => math.min(qw, w) }
              val bound = (interacting ++
                Iterator.single(math.min(uncollectedBound, w))).max
              cw > bound
            }
            if (disjoint && beatsNewPairs) chosen += cand else stop = true
          } else stop = true
        }
        merges ++= chosen
        val batch = chosen.toArray
        words = words
          .map { case (s, c) =>
            var cur = s
            batch.foreach { case (l, r, _) => cur = applyMerge(cur, l, r) }
            (cur, c)
          }
          .localCheckpoint(true)
        prev.unpersist(blocking = false)
        prev = words
        k += chosen.length
        // a sub-minCount top-1 NEXT round ends the loop (new pairs this
        // round's merges created may still clear minCount — recount)
      }
    }
    words.unpersist(blocking = false)
    merges.result()
  }

  /** The greedy-inference vocabulary a learned merge table induces: every
    * single character seen in the corpus (so no word is untokenizable)
    * plus each merge's product. Feed to [[tokenCounts]].
    */
  def learnedVocab(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
                   textCol: String = "text"): Seq[String] = {
    import docs.sparkSession.implicits._
    val chars = docs
      .select(explode(split(coalesce(col(textCol), lit("")), "")).as("c"))
      .where(col("c") =!= "" && col("c") =!= " ")
      .distinct().as[String].collect().toSeq
    (chars ++ learnMerges(docs, numMerges, minCount, textCol)
      .map { case (l, r, _) => l + r }).distinct
  }

  /** Per-document real token counts `(idCol, n_bpe)`: whitespace
    * pre-split (the same word boundary every other Text operator uses),
    * then greedy longest-match per word against the broadcast vocabulary.
    */
  def tokenCounts(docs: DataFrame, vocab: Seq[String] = FixtureVocab,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(vocab.nonEmpty, "tokenCounts needs a non-empty vocabulary")
    import docs.sparkSession.implicits._
    val maxLen = vocab.map(_.length).max
    val bc = docs.sparkSession.sparkContext.broadcast(vocab.toSet)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (id, text) =>
          var n = 0L
          if (text != null)
            text.split(" ", -1).foreach(w => n += countTokens(w, v, maxLen))
          (id, n)
        }
      }.toDF(idCol, "n_bpe")
  }
}
