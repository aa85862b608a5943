package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis over a document corpus (SURVEY.md §2.11 X4): language ID,
  * quality scoring, token counting, fingerprinting. Everything is built
  * from codegen'd expressions (no UDFs); every arithmetic result is either
  * exact integers or doubles derived by operations the DuckDB oracle can
  * replicate verbatim.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Marker stopword lists for the n-gram/stopword language-ID heuristic.
    * Deterministic and tiny by design — real language ID at 100 TB would
    * broadcast a bigger marker table; the *shape* (score = Σ marker hits,
    * argmax with alphabetical tie-break) is the operator.
    */
  val markers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que"),
    "fr" -> Seq("le", "la", "les", "est", "et", "dans", "que", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  /** Score for one language = count of tokens in its marker list. */
  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(markers(lang)))).cast("long")

  /** Predicted language: argmax over marker scores, ties broken by
    * alphabetical language order (deterministic).
    */
  def langId(toks: Column): Column = {
    val langs = markers.keys.toSeq.sorted
    val scores = langs.map(l => langScore(toks, l))
    val best = greatest(scores: _*)
    // fallback = LAST language, matching the oracle twins' CASE … ELSE arm:
    // reachable only when every score is null (null text), where the SQL
    // CASE also falls through to its ELSE — keep the two aligned
    langs.zip(scores).foldRight(lit(langs.last): Column) {
      case ((l, s), acc) => when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** Character-n-gram profiles for the second language-ID flavor: per
    * language, a few distinctive character trigrams (space-padded word
    * edges included — the classic Cavnar-Trenkle shape, profile kept tiny
    * and deterministic like `markers`).
    */
  val charNgramProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "ein", "sch", "ich", "und", "cht"),
    "en" -> Seq("the", "ing", "and", " of", "ion", "tha"),
    "es" -> Seq(" el", "los", "que", "ión", "ado", " la"),
    "fr" -> Seq(" le", "les", "est", "ait", "une", "ans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Occurrences of substring `g` in `text` via the replace-count identity
    * `(len(t) − len(replace(t, g, ''))) / len(g)` — pure codegen'd string
    * functions with an exact DuckDB twin (no regex, no lambda).
    */
  def substrCount(text: Column, g: String): Column =
    ((length(text) - length(call_function("replace", text, lit(g), lit("")))) /
      g.length).cast("long")

  /** Char-n-gram score = Σ profile-trigram occurrence counts. */
  def charNgramScore(text: Column, lang: String): Column =
    charNgramProfiles(lang).map(g => substrCount(text, g))
      .reduce(_ + _)

  /** Char-n-gram language ID: argmax of profile scores, alphabetical
    * tie-break — same decision shape as `langId`, different evidence.
    */
  def charNgramLangId(text: Column): Column = {
    val langs = charNgramProfiles.keys.toSeq.sorted
    val scores = langs.map(l => charNgramScore(text, l))
    val best = greatest(scores: _*)
    // fallback = LAST language — same null-text alignment as langId
    langs.zip(scores).foldRight(lit(langs.last): Column) {
      case ((l, s), acc) => when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** All character trigrams of `text` (overlapping, in order) as an array
    * column; text shorter than 3 chars yields an empty array. Declarative
    * sequence+transform, so the oracle's list comprehension is an exact
    * twin.
    */
  private def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2), i => text.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** LEARN per-language character-trigram profiles from a LABELED corpus —
    * the data-driven replacement for the fixed toy tables above (their
    * scaladoc's "broadcast a bigger marker table" arm, with the table now
    * LEARNED instead of curated): per language, the `topK` most frequent
    * trigrams, ties broken by gram ascending so the profile is a pure
    * function of the data. One explode + one partial-aggregating shuffle +
    * a per-language top-k window over trigram cardinality (bounded), never
    * the corpus.
    */
  def learnLangProfiles(labeled: DataFrame, topK: Int = 8,
                        textCol: String = "text",
                        langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    labeled.select(col(langCol).as("lang"),
        explode(charTrigrams(col(textCol))).as("gram"))
      .groupBy("lang", "gram").count()
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("count").desc, col("gram"))))
      .where(col("rk") <= topK)
      .select(col("lang"), col("gram"), col("count").as("weight"))
  }

  /** Classify documents against a learned profile TABLE: per document,
    * score(lang) = number of trigram occurrences that appear in that
    * language's profile, argmax with alphabetical tie-break (the same
    * decision shape as `langId`/`charNgramLangId`, evidence now a
    * broadcast table instead of compiled-in literals). The profile join
    * filters the exploded trigrams BEFORE the aggregate, so the shuffle
    * carries only profile hits; documents with no hits at all fall back
    * to the alphabetically first profile language (the all-zero-scores
    * arm of the literal flavors). Output = the input row plus
    * `predicted`.
    */
  def langIdByProfiles(docs: DataFrame, profiles: DataFrame,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    // the profile table is bounded by construction (nLangs × topK rows),
    // so materialize it ONCE to a local relation: the fallback scalar and
    // the broadcast side then share that single evaluation — an unpersisted
    // `profiles` plan (e.g. learnLangProfiles composed inline) would
    // otherwise be recomputed in full for the fallback lookup and again
    // for the join's broadcast exchange
    val spark = docs.sparkSession
    val local = profiles.select(col("lang").cast("string"),
      col("gram").cast("string")).collect().toSeq
    require(local.nonEmpty, "langIdByProfiles: empty profile table")
    val fallback = local.map(_.getString(0)).min
    import spark.implicits._
    val profLocal = local.map(r => (r.getString(0), r.getString(1)))
      .toDF("_plang", "gram")
    val hits = docs
      .select(col(idCol), explode(charTrigrams(col(textCol))).as("gram"))
      .join(broadcast(profLocal), Seq("gram"))
      .groupBy(col(idCol), col("_plang")).agg(count(lit(1)).as("_score"))
    val best = hits.groupBy(idCol).agg(
      min_by(col("_plang"), struct((-col("_score")).as("s"), col("_plang")))
        .as("_pred"))
    docs.join(best, Seq(idCol), "left")
      .withColumn("predicted", coalesce(col("_pred"), lit(fallback)))
      .drop("_pred")
  }

  /** Number of ASCII word tokens ([A-Za-z0-9]+ runs) plus one per
    * non-ASCII char — a BPE-ish token-count estimate that behaves sanely
    * for both alphabetic and CJK text. ASCII regex semantics are identical
    * in Java regex and RE2, so the oracle matches.
    */
  def bpeishTokenCount(text: Column): Column =
    (regexp_count(text, lit("[A-Za-z0-9]+")) +
      length(regexp_replace(text, "[\\x00-\\x7F]", ""))).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  /** Quality components per document: length/stopword/punctuation signals
    * plus the intra-document REPETITION ratio (1 − distinct/total word
    * trigrams — the boilerplate/looped-generation filter every corpus
    * pipeline runs), each computed with the exact op sequence the oracle
    * mirrors.
    */
  def quality(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    // bind the token array once — lambda bodies (filter/transform) are
    // interpreted without CSE, so an inline split would re-run per reference
    val bound = docs.select(col(idCol), col(textCol), tokens(col(textCol)).as("w"))
    val nTok = size(col("w")).cast("long")
    val nChars = length(col(textCol)).cast("long")
    val nStop = langScore(col("w"), "en")
    val nPunct = punctCount(col(textCol)).cast("long")
    val nGrams = greatest(size(col("w")) - 2, lit(0)).cast("long")
    val nDistinct = size(Dedup.shinglesFromTokens(col("w"))).cast("long")
    bound.select(
      col(idCol),
      nTok.as("n_tokens"),
      nChars.as("n_chars"),
      nStop.as("n_stopwords"),
      nPunct.as("n_punct"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (nChars.cast("double") / nTok.cast("double")).as("mean_token_len"),
      nGrams.as("n_grams"),
      nDistinct.as("n_distinct_grams"),
      when(nGrams > 0,
        lit(1.0) - nDistinct.cast("double") / nGrams.cast("double"))
        .otherwise(lit(0.0)).as("repetition_ratio"))
  }

  /** Gopher RULE-BASED quality filter (Rae et al. 2021, arXiv:2112.11446
    * §A1.1) — the classic pre-training keep/reject rule set as ONE
    * codegen-friendly projection: per document, the seven signals the
    * paper thresholds, each rule's verdict, and the overall `keep`.
    * Thresholds (and the required-stopword list) are parameters carrying
    * the paper's defaults: word count in [50, 100k]; mean word length in
    * [3, 10]; symbol-to-word ratio (`#`/ellipsis) < 0.1; < 90% of lines
    * bullet-started; < 30% of lines ellipsis-ended; ≥ 80% of words
    * containing an alphabetic character; ≥ 2 of the required stopwords
    * present. Word separator is the corpus's single-space tokenization
    * (matching [[tokens]]); lines split on `\n`.
    *
    * 100 TB shape: a pure narrow map — no shuffle, no UDF, every signal a
    * builtin expression, so the filter runs at scan speed and composes
    * with any downstream selection (`.where(col("keep"))` reaches the
    * parquet scan as a post-projection filter on the same pass).
    */
  def gopherRules(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3,
                  minAlphaRatio: Double = 0.8,
                  minStopHits: Int = 2,
                  stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val sig = gopherSignals(col(textCol), col("w"), col("ln"),
      minWords, maxWords, minMeanLen, maxMeanLen, maxSymbolRatio,
      maxBulletRatio, maxEllipsisRatio, minAlphaRatio, minStopHits,
      stopwords)
    docs.select(col(idCol), col(textCol),
        split(col(textCol), " ").as("w"), split(col(textCol), "\n").as("ln"))
      .select(col(idCol) +: sig.map { case (n, c) => c.as(n) }: _*)
  }

  /** [[gopherRules]] as an APPENDING variant: the input columns plus the
    * `keep` verdict — the composable form a pipeline filters on with no
    * self-join (the [[withRepetitionSignals]] precedent; a join back on
    * doc_id would shuffle the whole corpus at 100 TB for a value the scan
    * can compute in place).
    */
  def withGopherKeep(docs: DataFrame, textCol: String = "text",
                     minWords: Long = 50L, maxWords: Long = 100000L,
                     minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                     maxSymbolRatio: Double = 0.1,
                     maxBulletRatio: Double = 0.9,
                     maxEllipsisRatio: Double = 0.3,
                     minAlphaRatio: Double = 0.8,
                     minStopHits: Int = 2,
                     stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val sig = gopherSignals(col(textCol), col("_gw"), col("_gl"),
      minWords, maxWords, minMeanLen, maxMeanLen, maxSymbolRatio,
      maxBulletRatio, maxEllipsisRatio, minAlphaRatio, minStopHits,
      stopwords).toMap
    docs.withColumn("_gw", split(col(textCol), " "))
      .withColumn("_gl", split(col(textCol), "\n"))
      .withColumn("keep", sig("keep"))
      .drop("_gw", "_gl")
  }

  /** Gopher §A1.1's required-stopword list. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The shared signal/verdict expressions over a BOUND text column and
    * its pre-split word (`w`) and line (`ln`) arrays (bound once for the
    * same no-CSE reason as [[quality]]). Ordered: 8 signals, 7 per-rule
    * verdicts, the conjunction.
    */
  private def gopherSignals(text: Column, w: Column, ln: Column,
                            minWords: Long, maxWords: Long,
                            minMeanLen: Double, maxMeanLen: Double,
                            maxSymbolRatio: Double, maxBulletRatio: Double,
                            maxEllipsisRatio: Double, minAlphaRatio: Double,
                            minStopHits: Int,
                            stopwords: Seq[String]): Seq[(String, Column)] = {
    val nWords = size(w).cast("long")
    val nLines = size(ln).cast("long")
    // Σ word length = chars minus the single-space separators — exact,
    // and the oracle replays the identical integer arithmetic
    val meanLen = (length(text) - (size(w) - 1))
      .cast("double") / nWords.cast("double")
    val symbolRatio = regexp_count(text, lit("#|\\.\\.\\.|…"))
      .cast("double") / nWords.cast("double")
    val bulletRatio = size(filter(ln,
      l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines.cast("double")
    val ellipsisRatio = size(filter(ln,
      l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines.cast("double")
    val alphaRatio = size(filter(w,
      x => x.rlike("[A-Za-z]"))).cast("double") / nWords.cast("double")
    val stopHits = stopwords.map(s =>
      when(array_contains(w, s), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMeanLen = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val okSymbols = symbolRatio < maxSymbolRatio
    val okBullets = bulletRatio < maxBulletRatio
    val okEllipsis = ellipsisRatio < maxEllipsisRatio
    val okAlpha = alphaRatio >= minAlphaRatio
    val okStops = stopHits >= minStopHits
    Seq(
      "n_words" -> nWords, "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio, "bullet_ratio" -> bulletRatio,
      "ellipsis_ratio" -> ellipsisRatio, "alpha_ratio" -> alphaRatio,
      "n_stop_hits" -> stopHits,
      "ok_words" -> okWords, "ok_mean_len" -> okMeanLen,
      "ok_symbols" -> okSymbols, "ok_bullets" -> okBullets,
      "ok_ellipsis" -> okEllipsis, "ok_alpha" -> okAlpha,
      "ok_stopwords" -> okStops,
      "keep" -> (okWords && okMeanLen && okSymbols && okBullets &&
        okEllipsis && okAlpha && okStops))
  }

  /** Gopher-style within-doc repetition signals (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", arXiv:2112.11446 §A1.1): per
    * doc, the fraction of word `n`-grams that are repeats of an earlier
    * occurrence (`dup_frac` = 1 − distinct/total) and the share of the
    * single MOST FREQUENT n-gram (`top_frac` = mode count / total) — the
    * two filters that catch looped generations and boilerplate that
    * length/stopword signals miss. [[quality]] already carries the
    * distinct/total trigram ratio row-locally; the mode requires per-gram
    * counts, so this op pays one explode → two-level partial-agg groupBy
    * (`(doc, gram)` partials combine map-side, then an O(docs) rollup) —
    * the same shape and cost class as the shingle index. Docs shorter
    * than `n` tokens emit no row.
    */
  def repetitionSignals(docs: DataFrame, n: Int = 2,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    // the signals are WITHIN-doc, so the scale shape is a pure narrow map:
    // per-doc gram counting in a partition-local hash map, ZERO shuffle —
    // at 100 TB the alternative two-level agg ([[repetitionSignalsAgg]],
    // asserted equal in CorpusOpsSpec) shuffles one row per distinct
    // (doc, gram), i.e. roughly the corpus's token count
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          repetitionOf(text, n).map { case (tot, dist, dup, top) =>
            (id, tot, dist, dup, top)
          }
        }
      }.toDF("doc_id", "n_grams", "distinct_grams", "dup_frac", "top_frac")
  }

  /** One document's repetition stats `(n_grams, distinct, dup_frac,
    * top_frac)`; `None` when the text is shorter than `n` tokens. The
    * single code path every repetition flavor (batch scored, batch
    * column-appending, streaming filter) funnels through.
    */
  private[graft] def repetitionOf(text: String, n: Int)
      : Option[(Long, Long, Double, Double)] = {
    val w = text.split(" ", -1)
    if (w.length < n) None
    else {
      val total = w.length - n + 1
      val m = new java.util.HashMap[String, Int](total * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j)); j += 1
        }
        m.merge(sb.toString, 1, (a: Int, b: Int) => a + b)
        i += 1
      }
      var maxC = 0
      val vs = m.values().iterator()
      while (vs.hasNext) { val c = vs.next(); if (c > maxC) maxC = c }
      Some((total.toLong, m.size.toLong,
        1.0 - m.size.toDouble / total.toDouble,
        maxC.toDouble / total.toDouble))
    }
  }

  /** [[repetitionSignals]] as a column-APPENDING narrow map: every input
    * row survives with `n_grams`/`distinct_grams`/`dup_frac`/`top_frac`
    * appended (null for docs shorter than `n` tokens — no evidence), so
    * filters compose downstream and the op is usable unchanged inside a
    * Structured Streaming pipeline (stateless, no shuffle, no watermark).
    */
  def withRepetitionSignals(docs: DataFrame, n: Int = 2,
                            textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val schema = docs.schema
      .add("n_grams", LongType).add("distinct_grams", LongType)
      .add("dup_frac", DoubleType).add("top_frac", DoubleType)
    val ti = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      it.map { r =>
        repetitionOf(r.getString(ti), n) match {
          case Some((tot, dist, dup, top)) =>
            // Seq[Any]: a plain Seq would numerically widen the mixed
            // Long/Double elements to all-Double and break the row schema
            Row.fromSeq(r.toSeq ++ Seq[Any](tot, dist, dup, top))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The declarative twin of [[repetitionSignals]] — explode → two-level
    * partial-agg groupBy. Kept as the semantic reference the narrow-map
    * flavor is asserted bit-identical to (the doubles divide the same
    * longs, so IEEE equality holds), and as the fallback if per-partition
    * heap for a pathological single document ever became a concern (the
    * hash map is bounded by ONE doc's gram count; the agg flavor spreads
    * even that).
    */
  def repetitionSignalsAgg(docs: DataFrame, n: Int = 2,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("w")) - n),
        i => concat_ws(" ", slice(col("w"), i + 1, lit(n))))).as("g"))
    grams.groupBy("doc_id", "g").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id")
      .agg(sum("_c").as("n_grams"), count(lit(1)).as("distinct_grams"),
        max("_c").as("_top"))
      .select(col("doc_id"), col("n_grams"), col("distinct_grams"),
        (lit(1.0) - col("distinct_grams").cast("double") /
          col("n_grams").cast("double")).as("dup_frac"),
        (col("_top").cast("double") / col("n_grams").cast("double"))
          .as("top_frac"))
  }

  /** Polynomial rolling hash of the char `k`-gram starting at 1-based
    * position `i`: fold (acc·B + codepoint) mod p, p = 2³¹−1, B = 131 —
    * exact long arithmetic (acc < 2³¹, so acc·131 + c < 2³⁹), identical
    * in any engine.
    */
  private def kgramHash(text: Column, i: Column, k: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(k - 1)),
        o => ascii(substring(text, i + o, lit(1)))),
      lit(0L), (acc, c) => pmod(acc * 131L + c.cast("long"), lit(2147483647L)))

  /** Document fingerprint over char 8-gram rolling hashes, mod-sampled
    * (keep h where h % sampleMod == 0 — the winnowing-style sparse
    * selection). Emits per-doc summary stats (all exact integers).
    */
  def fingerprint(docs: DataFrame, k: Int = 8, sampleMod: Int = 16,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val positions = sequence(lit(1), length(col(textCol)) - (k - 1))
    val hashes = when(length(col(textCol)) >= k,
        transform(positions, i => kgramHash(col(textCol), i, k)))
      .otherwise(array().cast("array<bigint>"))
    val selected = filter(hashes, h => pmod(h, lit(sampleMod.toLong)) === 0L)
    docs.select(
      col(idCol),
      size(hashes).cast("long").as("n_grams"),
      size(selected).cast("long").as("n_selected"),
      array_min(selected).as("fp_min"),
      aggregate(selected, lit(0L), _ + _).as("fp_sum"))
  }

  /** Whole-document polynomial rolling hash — the same exact-long fold as
    * `kgramHash` applied to ALL characters (acc·131 + codepoint, mod
    * 2³¹−1). Engine-independent by construction; empty/null text hashes
    * to 0 on both sides (DuckDB's seedless `list_reduce` starts at the
    * first element, which equals this fold's 0-init first step). Runs as
    * the codegen'd `RollingHash` expression (~20× the interpreted
    * per-character fold, measured at sf0.1); `docHashFold` below is the
    * declarative semantic reference the expression must match
    * (asserted equal in tests).
    */
  def docHash(text: Column): Column =
    coalesce(
      org.apache.spark.sql.GraftBridge.column(
        graft.expressions.RollingHash(
          org.apache.spark.sql.GraftBridge.expression(text))),
      lit(0L))

  /** The declarative form of `docHash` (per-character expression fold) —
    * kept as the reference the custom expression is tested against.
    */
  def docHashFold(text: Column): Column =
    when(length(text) >= 1,
      aggregate(
        transform(sequence(lit(1), length(text)),
          i => ascii(substring(text, i, lit(1)))),
        lit(0L), (acc, c) => pmod(acc * 131L + c.cast("long"), lit(2147483647L))))
      .otherwise(lit(0L))

  /** Deterministic content-hash corpus split (train/val/test): bucket =
    * docHash(text) mod `buckets`. CONTENT-based, so the assignment is
    * reproducible across re-crawls, re-shards, and id reassignment — the
    * property a doc_id- or position-based split lacks — and identical text
    * always lands in the same bucket (split leakage of exact duplicates is
    * structurally impossible; pair with near-dup decontamination for the
    * rest). A narrow map over the corpus: no shuffle, no driver state.
    */
  def splitAssign(docs: DataFrame, buckets: Int = 10,
                  textCol: String = "text"): DataFrame =
    docs.withColumn("split_bucket", pmod(docHash(col(textCol)), lit(buckets.toLong)))

  /** PII patterns for corpus scrubbing, applied IN ORDER (each class is
    * counted on the text as the previous classes left it — the sequential
    * semantics both engines replicate exactly). Patterns restrict
    * themselves to constructs with identical semantics in Java regex and
    * RE2 (no backreferences, no lookaround, ASCII `\d`), so the DuckDB
    * twin matches byte-for-byte.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\+\\d{7,15}", "[PHONE]"))

  /** Redacted text: every PII class replaced by its placeholder, classes
    * applied in `piiPatterns` order. Pure codegen'd `regexp_replace` —
    * a narrow map over the corpus, no shuffle.
    */
  def scrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** Per-class PII hit counts plus the scrubbed text, as columns
    * `n_<class>` and `scrubbed`. Counts are sequential (class k counted
    * after classes 1..k−1 were replaced), mirroring `scrub`.
    */
  def piiReport(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val (cols, _) = piiPatterns.foldLeft(
      (Seq.empty[(String, Column)], col(textCol))) {
      case ((acc, t), (name, pat, repl)) =>
        (acc :+ (s"n_$name" -> regexp_count(t, lit(pat)).cast("long")),
          regexp_replace(t, pat, repl))
    }
    docs.select(
      col(idCol) +: cols.map { case (n, c) => c.as(n) } :+
        scrub(col(textCol)).as("scrubbed"): _*)
  }

  /** Fixed-size character-window chunking with overlap — the
    * concat-and-split step that turns documents into training context
    * windows. Chunk `i` covers characters `[i·stride+1, i·stride+window]`
    * (1-based, inclusive); a document emits
    * `max(1, ceil((len − window)/stride) + 1)` chunks, so every character
    * is covered and the final chunk may be short. A narrow
    * `explode` — no shuffle, chunk count is per-row arithmetic.
    */
  def chunk(docs: DataFrame, window: Int = 200, stride: Int = 150,
            textCol: String = "text", idCol: String = "doc_id",
            passthrough: Seq[String] = Nil): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val len = length(col(textCol))
    // positive-int arithmetic only: double division is exact here and
    // floor-truncation matches DuckDB's `//` on BIGINT
    val nChunks = when(len <= window, lit(1L)).otherwise(
      floor((len - window + (stride - 1)).cast("double") / stride)
        .cast("long") + 1L)
    // passthrough rides the explode instead of forcing the caller to
    // re-join chunks back to their documents (which would duplicate the
    // upstream subplan — measured as a doubled mixTo in the composed
    // pipeline before this existed)
    val carried = passthrough.map(col)
    docs.select(col(idCol) +: carried :+ col(textCol) :+
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"): _*)
      .select(col(idCol) +: carried :+ col("chunk_idx") :+
        col(textCol).substr(col("chunk_idx").cast("int") * stride + 1,
          lit(window)).as("chunk_text"): _*)
      .withColumn("n_chunk_chars", length(col("chunk_text")).cast("long"))
  }

  /** Deterministic stratified sampling: keep a document iff
    * `rollingHash(text) mod 1000 < perMille(stratum)` — the data-mixing
    * primitive that downweights overrepresented strata (languages,
    * sources) with a content-determined, reproducible keep decision.
    * Unlisted strata keep `defaultPerMille`. A narrow filter: no shuffle,
    * no RNG state, identical selection on every re-run and re-shard.
    */
  def sampleStrata(docs: DataFrame, perMille: Map[String, Int],
                   defaultPerMille: Int = 1000,
                   strataCol: String = "lang",
                   textCol: String = "text"): DataFrame = {
    require((defaultPerMille +: perMille.values.toSeq)
      .forall(r => r >= 0 && r <= 1000), "per-mille rates must be in [0,1000]")
    val thr = perMille.toSeq.sortBy(_._1).foldLeft(
      lit(defaultPerMille.toLong): Column) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v.toLong)).otherwise(acc)
    }
    docs.where(pmod(docHash(col(textCol)), lit(1000L)) < thr)
  }

  /** Deterministic IMPORTANCE SAMPLING — the per-ROW-weight member of the
    * sampling family ([[sampleStrata]] = per-stratum rate, [[sampleQuota]]
    * = exact counts, [[mixTo]] = target mixture; this = DSIR-style
    * resampling, Xie et al. 2023 arXiv:2302.03169, where each document's
    * keep probability is its own importance weight). RNG-free and
    * content-keyed like the rest: keep ⇔ `rollingHash(text) mod 1000 <
    * clamp(weight, 0, 1)·1000` — identical selection on every re-run and
    * re-shard, and a pure narrow filter (the weight is a caller-supplied
    * Column, typically a quality/relevance score already on the row — no
    * shuffle, no state). Hash uniformity makes the realized rate converge
    * to the mean weight per slice; the sub-per-mille truncation is the
    * deterministic price of an RNG-free decision (weights quantize to
    * 1/1000ths).
    */
  def sampleByWeight(docs: DataFrame, weight: Column,
                     textCol: String = "text"): DataFrame =
    docs.where(pmod(docHash(col(textCol)), lit(1000L)).cast("double") <
      least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)) * 1000.0)

  /** X4 tf-idf machinery: term frequency per (doc, term), document frequency
    * over the corpus, top-`k` terms per doc ranked by `(tf desc, df asc,
    * term)`. All-integer outputs — the ranking IS tf-idf's ordering for a
    * fixed corpus (idf is monotone-decreasing in df), without a
    * cross-engine-fragile `ln`. Shuffle shape: explode → two groupBys +
    * one broadcast-friendly join on term.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 5,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df")
  }

  /** Exact-quota stratified sampling: stratum `s` keeps EXACTLY
    * `min(quota_s, n_s)` documents — the first `quota_s` in
    * `(rollingHash(text), id)` order, so selection is content-determined
    * and reproducible like `sampleStrata`, but with exact counts where
    * the per-mille threshold gives only hash-approximate ones. Price of
    * exactness: one rank window keyed by stratum (a shuffle the narrow
    * threshold filter avoids); hash-ordering makes the chosen subset
    * uniform, not a prefix of ingest order. Strata without a quota are
    * dropped.
    */
  def sampleQuota(docs: DataFrame, quotas: Map[String, Long],
                  strataCol: String = "lang", textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 0),
      "quotas must be non-negative")
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (k, q)) => when(col(strataCol) === k, lit(q)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("_sq_hash"), col(idCol))
    docs.where(col(strataCol).isInCollection(quotas.keys.toSeq))
      .withColumn("_sq_hash", docHash(col(textCol)))
      .withColumn("_sq_rank", row_number().over(w).cast("long"))
      .where(col("_sq_rank") <= quota)
      .drop("_sq_hash", "_sq_rank")
  }

  /** TOKEN-DISTRIBUTION DRIFT between two corpus slices — the mix/drift
    * monitor a pipeline runs when a new crawl shard, a re-filtered corpus
    * version, or two mixture strata should (or should not) look alike:
    * per token, counts and probabilities on each side and the absolute
    * probability gap, top `k` by gap. Probabilities are exact long/long
    * IEEE divisions (no logs), so the report is engine-reproducible
    * bit-for-bit — a KL/JS score can be folded from the same columns
    * downstream if a scalar is wanted.
    *
    * Plan shape: one partial-agg token count per side (map-side combine
    * absorbs Zipf-hot tokens), a full-outer join on the token key —
    * vocabulary-sized, far smaller than either corpus — a 1-row totals
    * aggregate broadcast back, and a TakeOrderedAndProject for the top-k;
    * the corpora themselves are never joined or shuffled beyond the
    * vocabulary rollup. Ties in the gap break deterministically by token.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, k: Int = 50,
                 textCol: String = "text"): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(explode(tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(as))
    val j = counts(a, "n_a").join(counts(b, "n_b"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = j.agg(sum("n_a").as("_ta"), sum("n_b").as("_tb"))
    val pA = col("n_a").cast("double") / col("_ta").cast("double")
    val pB = col("n_b").cast("double") / col("_tb").cast("double")
    j.crossJoin(broadcast(tot)) // 1-row totals
      .select(col("token"), col("n_a"), col("n_b"),
        pA.as("p_a"), pB.as("p_b"), abs(pA - pB).as("drift"))
      .orderBy(col("drift").desc, col("token"))
      .limit(k)
  }

  /** Corpus rebalancing to TARGET stratum proportions — the data-mixing
    * step that turns "50% en / 25% zh / …" mixture weights into per-
    * stratum keep rates. Since sampling can only shrink strata, the
    * largest feasible corpus is `T = min_s(n_s / w_s)` and stratum `s`
    * keeps `w_s·T` documents, i.e. rate `w_s·T/n_s` (the binding stratum
    * keeps everything). Selection reuses the content-hash per-mille
    * threshold of `sampleStrata`, so the survivor SET is deterministic
    * and reproducible; realized counts track `rate·n_s` to hash-uniformity
    * (exact-quota selection would need a per-stratum rank — one more
    * shuffle — where this stays a broadcast-join + narrow filter).
    *
    * Plan shape: one small groupBy for stratum counts, a 1-row global min,
    * both broadcast back into a narrow filter over the corpus — the big
    * side never shuffles.
    */
  def mixTo(docs: DataFrame, targets: Map[String, Double],
            strataCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive weights")
    require(math.abs(targets.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1, got ${targets.values.sum}")
    val weight = targets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, w)) => when(col(strataCol) === k, lit(w)).otherwise(acc)
    }
    val counts = docs.where(col(strataCol).isInCollection(targets.keys.toSeq))
      .groupBy(col(strataCol)).agg(count(lit(1)).cast("double").as("_n"))
      .withColumn("_w", weight)
    // a target stratum with ZERO documents makes every mixture infeasible
    // (T = min over PRESENT strata would silently ignore it and ship wrong
    // proportions); the counts frame is |strata| rows, so this check is a
    // metadata-scale action, not a corpus scan
    val present = counts.select(strataCol).collect().map(_.getString(0)).toSet
    val absent = targets.keySet -- present
    require(absent.isEmpty,
      s"target strata absent from the corpus: ${absent.toSeq.sorted.mkString(", ")}")
    val feasible = counts.agg(min(col("_n") / col("_w")).as("_t"))
    val rates = counts.crossJoin(broadcast(feasible))
      .withColumn("_permille",
        floor(col("_w") * col("_t") / col("_n") * 1000.0).cast("long"))
      .select(col(strataCol), col("_permille"))
    docs.join(broadcast(rates), Seq(strataCol), "inner")
      .where(pmod(docHash(col(textCol)), lit(1000L)) < col("_permille"))
      .withColumnRenamed("_permille", "mix_permille")
  }

  /** One row per word n-gram occurrence (`_`-joined), exploded from every
    * document — a per-partition primitive loop instead of an interpreted
    * transform/element_at lambda (same measured tax as Dedup.shingled,
    * 2.5s → ~0.4s at sf0.1); emits exactly the split-and-join grams the
    * oracles' string_split/list_transform twins produce.
    */
  def ngrams(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    require(n >= 1, s"need n>=1, got n=$n")
    import docs.sparkSession.implicits._
    docs.select(col(textCol)).as[String].mapPartitions { it =>
      it.flatMap { text =>
        val w = if (text == null) Array.empty[String] else text.split(" ", -1)
        if (w.length < n) Iterator.empty
        else (0 to w.length - n).iterator.map { i =>
          val sb = new StringBuilder(w(i))
          var o = 1
          while (o < n) { sb.append('_').append(w(i + o)); o += 1 }
          sb.result()
        }
      }
    }.toDF("ngram")
  }

  /** [[ngrams]] with the document id carried on every gram row —
    * `(id, ngram)` — for per-document gram statistics.
    */
  def ngramsById(docs: DataFrame, n: Int, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(n >= 1, s"need n>=1, got n=$n")
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (w.length < n) Iterator.empty
          else (0 to w.length - n).iterator.map { i =>
            val sb = new StringBuilder(w(i))
            var o = 1
            while (o < n) { sb.append('_').append(w(i + o)); o += 1 }
            (id, sb.result())
          }
        }
      }.toDF(idCol, "ngram")
  }

  /** [[ngrams]] with a STRING key carried on every gram row — `(key,
    * ngram)` — for per-group gram statistics (per language, per source).
    */
  def ngramsByKey(docs: DataFrame, n: Int, keyCol: String,
                  textCol: String = "text"): DataFrame = {
    require(n >= 1, s"need n>=1, got n=$n")
    import docs.sparkSession.implicits._
    docs.select(col(keyCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (key, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (w.length < n) Iterator.empty
          else (0 to w.length - n).iterator.map { i =>
            val sb = new StringBuilder(w(i))
            var o = 1
            while (o < n) { sb.append('_').append(w(i + o)); o += 1 }
            (key, sb.result())
          }
        }
      }.toDF(keyCol, "ngram")
  }

  /** Each document's boilerplate share: how many of its word n-grams are
    * corpus-wide heavy hitters (`hot` of `n_grams`; both 0 for docs too
    * short to form a gram). The CCNet/quality-filter signal "this text is
    * mostly template" as exact integers: pair with
    * [[graft.operators.HeavyHitters.exact]] for the hitter set and filter
    * on an integer-ratio threshold (`hot·10 > n_grams·4` for 40%), never
    * a float.
    *
    * 100 TB: grams come from the same per-partition loop as [[ngrams]];
    * hitter membership is a broadcast LEFT join on the gram (the hitter
    * set is sketch-bounded); both the per-doc aggregate and the join back
    * onto the corpus hash on the id key.
    */
  def boilerplateShare(docs: DataFrame, hitters: DataFrame,
                       n: Int = 2, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val share = ngramsById(docs, n, idCol, textCol)
      .join(broadcast(hitters.select(col("ngram"), lit(1L).as("_hot"))),
        Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hot"), lit(0L))).as("hot"))
    docs.join(share, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("hot", coalesce(col("hot"), lit(0L)))
  }

  /** Corpus-wide top-k word n-grams: explode per-doc n-grams, one
    * partial→final count aggregate, then a distributed top-k
    * (`TakeOrderedAndProject` — each partition keeps k candidates, no
    * global sort or single-partition shuffle). Ordering `(count desc,
    * ngram asc)` makes the selected set deterministic under ties. The
    * data-card / contamination-probe staple: what boilerplate dominates
    * the corpus.
    */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20,
                textCol: String = "text"): DataFrame = {
    require(n >= 1 && k >= 1, s"need n>=1 and k>=1, got n=$n k=$k")
    ngrams(docs, n, textCol).groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Frequency-ranked vocabulary of the corpus's top `v` tokens:
    * `(token, id)` with 1-based ids in `(count desc, token asc)` order —
    * the deterministic tie-break makes the table reproducible years
    * later. Id 0 is reserved for out-of-vocabulary tokens.
    *
    * 100 TB: one partial→final count aggregate, then a DISTRIBUTED top-v
    * (`TakeOrderedAndProject`, each partition keeps v candidates); only
    * the final v-row ranking runs in a single task, bounded by config,
    * never by data.
    */
  def buildVocab(docs: DataFrame, v: Int,
                 textCol: String = "text"): DataFrame = {
    require(v >= 1, s"need v>=1, got $v")
    import org.apache.spark.sql.expressions.Window
    ngrams(docs, 1, textCol).withColumnRenamed("ngram", "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(v)
      .withColumn("id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token").asc)).cast("long"))
      .select("token", "id")
  }

  /** The corpus mapped to id sequences under a vocabulary: `(doc_id,
    * ids)` with `ids(i)` the vocab id of token i (0 for OOV), preserving
    * token order. The lookup is one narrow `posexplode`, a broadcast
    * equi-join on the token (the vocabulary is bounded by config), and a
    * regroup on `doc_id` — the same key the downstream pack/chunk steps
    * shuffle on. Order is restored by sorting the collected `(pos, id)`
    * structs, not by trusting collect_list's arrival order.
    */
  def mapToIds(docs: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val pos = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    pos.join(broadcast(vocab), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(0L)))
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("id")))).as("_ord"))
      .select(col(idCol), transform(col("_ord"), s => s("id")).as("ids"))
  }

  /** The same id mapping as [[mapToIds]] as a STATELESS projection: the
    * vocabulary rides along as a map literal (bounded by config — the
    * deployment shape of a shipped tokenizer artifact), so the lookup is
    * a pure per-row `transform` with no explode, no join, and no regroup.
    * Works identically over a batch frame and a micro-batch stream; for
    * vocabularies too large to ship as a literal, use the join-based
    * [[mapToIds]] batch path instead.
    */
  def withIds(docs: DataFrame, vocab: Map[String, Long],
              textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(!vocab.valuesIterator.contains(0L), "id 0 is reserved for OOV")
    val m = typedLit(vocab)
    docs.withColumn("ids", transform(split(col(textCol), " "),
      t => coalesce(element_at(m, t), lit(0L))))
  }

  /** DSIR-flavored target-relevance scoring: each corpus document's
    * coverage = |its DISTINCT word n-grams ∩ the target slice's gram
    * vocabulary| / |its distinct grams| — the hashed-n-gram importance
    * family's exact, log-free core (a ratio of two small integers, so the
    * double is bit-identical across engines). Selecting the top-coverage
    * docs is "importance resampling toward the target domain" with a
    * deterministic tie-break instead of Gumbel noise.
    *
    * Docs with fewer than `n` tokens have no grams: they surface with
    * `n_grams = 0`, `coverage = 0` — visible, never silently dropped.
    *
    * 100 TB: corpus grams come from the same per-partition loop as
    * `topNgrams` + one partial-agg distinct; the target vocabulary is its
    * own distinct (target slices are small by construction) and membership
    * rides ONE equi-join on the gram key (AQE broadcasts a small
    * vocabulary); per-doc scoring is one partial→final aggregate. Nothing
    * is all-pairs and nothing collects.
    */
  def targetCoverage(corpus: DataFrame, target: DataFrame, n: Int = 2,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"need n>=1, got n=$n")
    import corpus.sparkSession.implicits._
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, text) =>
            val w = if (text == null) Array.empty[String] else text.split(" ", -1)
            if (w.length < n) Iterator.empty
            else (0 to w.length - n).iterator.map { i =>
              val sb = new StringBuilder(w(i))
              var o = 1
              while (o < n) { sb.append('_').append(w(i + o)); o += 1 }
              (id, sb.result())
            }
          }
        }.toDF(idCol, "gram").distinct()
    val vocab = grams(target).select("gram").distinct()
      .withColumn("_hit", lit(1L))
    val scored = grams(corpus)
      .join(vocab, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
    corpus.select(col(idCol).cast("long"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("coverage",
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_grams").cast("double")))
  }

  /** A learned add-one-smoothed bigram language model: unigram counts,
    * bigram counts, and the vocabulary size — the CCNet-style reference
    * model a perplexity filter scores against. A model artifact, not a
    * table: like a shipped KenLM binary (or this repo's BPE vocab and
    * lang-ID profile tables) it is learned DISTRIBUTED but held as
    * driver state and broadcast once to every scoring task.
    */
  case class BigramLm(vocabSize: Long, uni: Map[String, Long],
                      bi: Map[(String, String), Long])

  /** Learn [[BigramLm]] counts from a reference slice: one corpus scan
    * into partial→final unigram and adjacent-bigram counts. The collect is
    * guarded by `maxVocab` with a `head(max+1)` fail-fast — the reference
    * slice is model-sized BY CONTRACT (CCNet's KenLM is ~a few hundred MB
    * learned from a curated slice, not the whole crawl); feeding a
    * 100 TB corpus in as the "model" is misuse and dies loudly instead of
    * OOMing the driver.
    */
  def learnBigramLm(target: DataFrame, textCol: String = "text",
                    maxVocab: Int = 1 << 20): BigramLm = {
    import target.sparkSession.implicits._
    val toks = target.select(col(textCol)).as[String]
    val uniRows = toks.flatMap(t =>
        if (t == null) Iterator.empty else t.split(" ", -1).iterator)
      .groupBy(col("value").as("t")).agg(count(lit(1)).as("c"))
      .head(maxVocab + 1)
    require(uniRows.length <= maxVocab,
      s"bigram LM vocabulary exceeds maxVocab=$maxVocab — the reference " +
        "slice must be model-sized; score against a curated target, not " +
        "the corpus itself")
    val biRows = toks.flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val w = t.split(" ", -1)
          (0 until w.length - 1).iterator.map(i => (w(i), w(i + 1)))
        }
      }.groupBy(col("_1").as("a"), col("_2").as("b")).agg(count(lit(1)).as("c"))
      .collect()
    BigramLm(uniRows.length.toLong,
      uniRows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      biRows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
  }

  /** CCNet-slot LM quality scoring, log-free: per document, walk adjacent
    * token pairs IN POSITION ORDER and fold the add-one-smoothed INVERSE
    * conditional probability `(c(t_i) + V) / (c(t_i, t_{i+1}) + 1)` into a
    * running sum; `surprise` = that sum / n_pairs — the arithmetic-mean
    * cousin of perplexity (which is the geometric mean of the same inverse
    * probabilities). The swap is deliberate: every step is an exact-IEEE
    * integer division and a position-ordered double add, so the DuckDB
    * oracle replays the fold bit-for-bit (`list_reduce` over
    * `list(... ORDER BY i)`), where a log/exp formulation would hash-drift
    * on libm differences. High surprise = far from the reference slice —
    * the same ranking CCNet's perplexity filter cuts on.
    *
    * Output per doc: `n_pairs`, `n_unseen` (bigrams absent from the
    * model — the OOV-transition count), `surprise` (0.0 when the doc has
    * no pairs — visible, never dropped).
    *
    * 100 TB: the model rides one broadcast; scoring is a ZERO-SHUFFLE
    * narrow map (allocation-light per-partition loop), the same posture as
    * BPE tokenization — the corpus never shuffles and never joins.
    */
  def lmSurprise(corpus: DataFrame, model: BigramLm,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import corpus.sparkSession.implicits._
    val bc = corpus.sparkSession.sparkContext.broadcast(model)
    corpus.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          var sum = 0.0
          var unseen = 0L
          var i = 0
          while (i < w.length - 1) {
            val cUni = m.uni.getOrElse(w(i), 0L)
            val cBi = m.bi.getOrElse((w(i), w(i + 1)), 0L)
            if (cBi == 0L) unseen += 1
            sum += (cUni + m.vocabSize).toDouble / (cBi + 1L).toDouble
            i += 1
          }
          val nPairs = math.max(w.length - 1, 0).toLong
          (id, nPairs, unseen, if (nPairs == 0) 0.0 else sum / nPairs.toDouble)
        }
      }.toDF(idCol, "n_pairs", "n_unseen", "surprise")
  }

  /** [[lmSurprise]] as a row-preserving append — every input column plus
    * `lm_pairs`/`lm_unseen`/`lm_surprise` — so the LM quality filter
    * composes in pipelines and in Structured Streaming (a stateless
    * zero-shuffle narrow map lifts to micro-batches unchanged; the model
    * rides the closure's broadcast like the BPE vocab).
    */
  def withLmSurprise(docs: DataFrame, model: BigramLm,
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val schema = docs.schema
      .add("lm_pairs", LongType).add("lm_unseen", LongType)
      .add("lm_surprise", DoubleType)
    val ti = docs.schema.fieldIndex(textCol)
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        val text = r.getString(ti)
        val w = if (text == null) Array.empty[String] else text.split(" ", -1)
        var sum = 0.0
        var unseen = 0L
        var i = 0
        while (i < w.length - 1) {
          val cUni = m.uni.getOrElse(w(i), 0L)
          val cBi = m.bi.getOrElse((w(i), w(i + 1)), 0L)
          if (cBi == 0L) unseen += 1
          sum += (cUni + m.vocabSize).toDouble / (cBi + 1L).toDouble
          i += 1
        }
        val nPairs = math.max(w.length - 1, 0).toLong
        Row.fromSeq(r.toSeq ++ Seq[Any](nPairs, unseen,
          if (nPairs == 0) 0.0 else sum / nPairs.toDouble))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Exact rank-based percentiles of the token count per stratum: the
    * p-th percentile is the value at row `ceil(p·n)` of the
    * `(n_tok, doc_id)` order — `percentile_disc` semantics, all-integer
    * arithmetic (per-mille ranks, no interpolation), so the result is
    * engine-exact where interpolating quantiles are not. One window
    * shuffle keyed by stratum + a broadcast of the per-stratum counts;
    * the length-distribution report that sizes truncation and packing
    * policies.
    */
  def lengthPercentiles(docs: DataFrame, perMilles: Seq[Int] = Seq(250, 500, 750, 950),
                        strataCol: String = "lang", textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(perMilles.nonEmpty && perMilles.forall(p => p > 0 && p <= 1000),
      s"per-mille ranks must be in (0,1000], got $perMilles")
    val t = docs.select(col(strataCol), col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("n_tok"), col(idCol))
    val counts = t.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    t.withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(strataCol))
      .withColumn("pm", explode(array(perMilles.map(p => lit(p)): _*)))
      .where(col("rank") === expr("(n_docs * pm + 999) div 1000"))
      .select(col(strataCol), col("pm"), col("n_docs"), col("n_tok").as("value"))
  }

  /** X8 SKETCH arm of the quantile report: per-stratum token-length
    * quantiles via `percentile_approx` (Greenwald-Khanna) under a PINNED
    * accuracy contract. The exact rank walk ([[lengthPercentiles]]) costs
    * a per-stratum sort window; the GK sketch is ONE pass with mergeable
    * partials — the 100 TB path (like `approx_count_distinct` next to
    * the exact distinct). The contract: GK bounds the rank error by
    * `n/accuracy`, so the sketch's answer must lie between the exact
    * values at ranks `ceil(pm·n/1000) ∓ (ceil(n/accuracy)+1)` — checked
    * row-by-row against the same ranked table the exact report uses.
    * Output carries the EXACT value plus `within_bounds`, so the DuckDB
    * twin (which cannot run the sketch) pins the exact quantiles and
    * literal `true`: a sketch drifting past its own guarantee breaks the
    * gate hash, not just a test expectation.
    */
  def approxLengthPercentiles(docs: DataFrame,
                              perMilles: Seq[Int] = Seq(500, 900),
                              accuracy: Int = 100,
                              strataCol: String = "lang",
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    require(perMilles.nonEmpty && perMilles.forall(p => p > 0 && p <= 1000),
      s"per-mille ranks must be in (0,1000], got $perMilles")
    require(accuracy >= 10, s"accuracy must be >= 10, got $accuracy")
    val t = docs.select(col(strataCol), col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("n_tok"), col(idCol))
    val counts = t.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val pcts = perMilles.map(p => lit(p / 1000.0))
    val approx = t.groupBy(col(strataCol))
      .agg(percentile_approx(col("n_tok"), array(pcts: _*), lit(accuracy))
        .as("_ap"))
      .select(col(strataCol), posexplode(col("_ap")).as(Seq("_i", "approx_value")))
      .withColumn("pm", element_at(
        array(perMilles.map(p => lit(p)): _*), col("_i") + 1))
      .drop("_i")
    val ranked = t.withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(strataCol))
      .withColumn("pm", explode(array(perMilles.map(p => lit(p)): _*)))
      .withColumn("_rt", expr("(n_docs * pm + 999) div 1000"))
      .withColumn("_m", expr(s"(n_docs + ${accuracy - 1}) div $accuracy + 1"))
    val brackets = ranked.groupBy(col(strataCol), col("pm"))
      .agg(first("n_docs").as("n_docs"),
        max(when(col("rank") === col("_rt"), col("n_tok"))).as("value"),
        max(when(col("rank") === greatest(col("_rt") - col("_m"), lit(1L)),
          col("n_tok"))).as("_lo"),
        max(when(col("rank") === least(col("_rt") + col("_m"), col("n_docs")),
          col("n_tok"))).as("_hi"))
    brackets.join(approx, Seq(strataCol, "pm"))
      .select(col(strataCol), col("pm"), col("n_docs"), col("value"),
        (col("approx_value") >= col("_lo") &&
          col("approx_value") <= col("_hi")).as("within_bounds"))
  }

  /** Token-count histogram per language: bucket = `n_tokens div width`
    * (fixed-width bins). One narrow map + one aggregate — the corpus
    * length-distribution report that sizes packing budgets and truncation
    * policies.
    */
  def tokenHistogram(docs: DataFrame, width: Int = 16,
                     textCol: String = "text"): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    docs.select(col("lang"),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $width"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens_sum"),
        min("n_tok").as("tok_min"), max("n_tok").as("tok_max"))
  }

  /** Per-language corpus analysis: doc counts, whitespace + BPE-ish token
    * sums, marker-score sums, predicted-language distribution.
    */
  def languageReport(docs: DataFrame, textCol: String = "text"): DataFrame = {
    docs.select(col("lang"), col(textCol), tokens(col(textCol)).as("w"))
      .select(col("lang"),
        size(col("w")).cast("long").as("n_tokens"),
        bpeishTokenCount(col(textCol)).as("n_bpeish"),
        langId(col("w")).as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_sum"),
        sum("n_bpeish").as("bpeish_sum"))
  }

  // ---- trained corpus classifier (the GPT-3/FineWeb-Edu filter slot) -----

  /** Class-conditional unigram counts learned from a reference slice:
    * `vocab` distinct tokens, `total` token occurrences, per-token
    * `counts`. One slice per class; the slices are model-sized BY
    * CONTRACT (the curated "positive" corpus a pipeline's quality/domain
    * classifier is trained against is curated precisely because it is
    * small next to the crawl), so like [[BigramLm]] the collect is
    * guarded by `maxVocab` with a fail-fast.
    */
  case class ClassUnigrams(vocab: Long, total: Long, counts: Map[String, Long])

  /** Learn [[ClassUnigrams]] from one labeled slice: a distributed
    * partial→final token count, collected once and broadcast to scoring
    * tasks like a shipped model artifact.
    */
  def learnClassUnigrams(slice: DataFrame, textCol: String = "text",
                         maxVocab: Int = 1 << 20): ClassUnigrams = {
    import slice.sparkSession.implicits._
    val rows = slice.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Iterator.empty else t.split(" ", -1).iterator)
      .groupBy(col("value").as("t")).agg(count(lit(1)).as("c"))
      .head(maxVocab + 1)
    require(rows.length <= maxVocab,
      s"class-unigram vocabulary exceeds maxVocab=$maxVocab — train the " +
        "classifier on a curated model-sized slice, not the corpus itself")
    ClassUnigrams(rows.length.toLong, rows.map(_.getLong(1)).sum,
      rows.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  /** Trained corpus classifier, the GPT-3 "WebText-like vs raw crawl" /
    * FineWeb-Edu filter slot, log-free like [[lmSurprise]]: per document
    * and per class, walk tokens IN POSITION ORDER and fold the add-one-
    * smoothed INVERSE class-conditional unigram probability
    * `(total_c + vocab_c) / (count_c(t) + 1)` into a running sum; the
    * per-class `surprise` is that sum / n_tok (0.0 for empty docs). The
    * predicted label is the LEAST-surprised class — the same argmax-
    * posterior decision a naive-Bayes classifier makes, with the
    * arithmetic-mean-of-inverse-probabilities surrogate replacing the
    * log-sum so every step is an exact-IEEE long→double division plus a
    * position-ordered add that the DuckDB oracle replays bit-for-bit
    * (`list_reduce` over `list(... ORDER BY i)`); a log formulation
    * would hash-drift on libm. Ties break on class-label order.
    *
    * Output per doc: `n_tok`, one `s_<label>` surprise column per class
    * (class-label order), `label`.
    *
    * 100 TB: the models ride one broadcast; scoring is a ZERO-SHUFFLE
    * narrow map — the corpus never shuffles, never joins, and the argmin
    * happens inside the same per-partition loop.
    */
  def classifyBySurprise(corpus: DataFrame,
                         classes: Seq[(String, ClassUnigrams)],
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(classes.nonEmpty, "classifyBySurprise needs at least one class")
    require(classes.map(_._1).distinct.length == classes.length,
      "class labels must be distinct")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
    val ordered = classes.sortBy(_._1)
    val labels = ordered.map(_._1)
    val schema = ordered.foldLeft(
        new StructType().add(idCol, LongType).add("n_tok", LongType)) {
        (s, c) => s.add(s"s_${c._1}", DoubleType)
      }.add("label", StringType)
    val bc = corpus.sparkSession.sparkContext.broadcast(ordered.map(_._2))
    import corpus.sparkSession.implicits._
    corpus.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, text) =>
          val w = if (text == null) Array.empty[String] else text.split(" ", -1)
          val s = ms.map(meanInverseProb(w, _))
          var best = 0
          var k = 1
          while (k < s.length) { if (s(k) < s(best)) best = k; k += 1 }
          Row.fromSeq(Seq[Any](id, w.length.toLong) ++ s :+ labels(best))
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The classifier's per-class score: the mean add-one-smoothed INVERSE
    * unigram probability, folded over tokens in position order — shared
    * by the batch and streaming paths so both are bit-identical.
    */
  private def meanInverseProb(w: Array[String], m: ClassUnigrams): Double = {
    val base = m.total + m.vocab
    var sum = 0.0
    var i = 0
    while (i < w.length) {
      sum += base.toDouble / (m.counts.getOrElse(w(i), 0L) + 1L).toDouble
      i += 1
    }
    if (w.length == 0) 0.0 else sum / w.length.toDouble
  }

  /** [[classifyBySurprise]] as a row-preserving append — every input
    * column plus `clf_label` — so the trained filter composes in
    * pipelines and in Structured Streaming (a stateless zero-shuffle
    * narrow map lifts to micro-batches unchanged; the class models ride
    * the closure's broadcast like the LM and BPE artifacts).
    */
  def withClassLabel(docs: DataFrame,
                     classes: Seq[(String, ClassUnigrams)],
                     textCol: String = "text"): DataFrame = {
    require(classes.nonEmpty, "withClassLabel needs at least one class")
    require(classes.map(_._1).distinct.length == classes.length,
      "class labels must be distinct")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StringType
    val ordered = classes.sortBy(_._1)
    val labels = ordered.map(_._1)
    val schema = docs.schema.add("clf_label", StringType)
    val ti = docs.schema.fieldIndex(textCol)
    val bc = docs.sparkSession.sparkContext.broadcast(ordered.map(_._2))
    docs.mapPartitions { it =>
      val ms = bc.value
      it.map { r =>
        val text = r.getString(ti)
        val w = if (text == null) Array.empty[String] else text.split(" ", -1)
        var best = 0
        var bestS = meanInverseProb(w, ms(0))
        var k = 1
        while (k < ms.length) {
          val s = meanInverseProb(w, ms(k))
          if (s < bestS) { best = k; bestS = s }
          k += 1
        }
        Row.fromSeq(r.toSeq :+ labels(best))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
