package graft

import org.apache.spark.sql.functions._

/** Index-chain compaction lifecycle: the shard chain collapses to one,
  * query results are bit-identical across the compaction (a physical
  * merge, never a retrain), tombstones fold away, vacuum reclaims the
  * superseded chain — and a fully-tombstoned chain REFUSES compaction
  * (returns false, nothing committed) instead of publishing a version
  * whose zero-row partitioned table would be unreadable. Also pins the
  * IVF-PQ rerank==k contract: any supplied rerank corpus triggers the
  * exact rescore, so scores are true cosine, not PQ-approximate.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def vecCorpus(seed: Int, n: Int = 200) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1), i % 3))
      .toDF("vec_id", "embedding", "label")
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IVF compaction: chain collapses to 1 shard, results bit-identical, tombstones fold, vacuum serves") {
    val corpus = vecCorpus(61)
    val dir = tmp("graft-ivfcomp")
    ext.Ivf.buildIndex(corpus.where(col("vec_id") % 2 === 0), dir, nCells = 4)
    ext.Ivf.appendToIndex(corpus.where(col("vec_id") % 2 === 1), dir)
    assert(ext.Ivf.removeFromIndex(dir, Seq(0L, 1L).toDF("vec_id")) === 2L)
    val queries = corpus.where(col("vec_id") < 3)
    def q(): Set[(Long, Long, Long, Double)] =
      ext.Ivf.queryIndex(dir, queries, k = 5, nProbe = 4)
        .select("query_vec_id", "vec_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSet
    val before = q()
    assert(ext.VersionedIndex.liveShardCount(spark, dir, "cells") === 2)
    assert(ext.Ivf.compactIndex(dir, spark))
    assert(ext.VersionedIndex.liveShardCount(spark, dir, "cells") === 1)
    assert(q() === before)
    // tombstones folded physically into the merged shard
    val live = ext.VersionedIndex.resolveDir(spark, dir, None)
    assert(!new java.io.File(s"$live/tombstones").exists())
    assert(ext.Ivf.cells(spark, dir).where(col("vec_id").isin(0L, 1L))
      .count() === 0L)
    ext.Ivf.vacuumIndex(spark, dir, retainVersions = 1)
    assert(!new java.io.File(s"$dir/v1").exists())
    assert(q() === before)
  }

  test("fully-tombstoned chains refuse compaction: false, nothing committed, reads keep serving") {
    // IVF
    locally {
      val corpus = vecCorpus(67, n = 40)
      val dir = tmp("graft-ivfempty")
      ext.Ivf.buildIndex(corpus, dir, nCells = 2)
      ext.Ivf.removeFromIndex(dir, corpus.select("vec_id"))
      val v = ext.VersionedIndex.currentVersion(spark, dir).get
      assert(!ext.Ivf.compactIndex(dir, spark))
      assert(ext.VersionedIndex.currentVersion(spark, dir).get === v)
      assert(ext.Ivf.queryIndex(dir, corpus.limit(1), k = 3, nProbe = 2)
        .count() === 0L)
    }
    // SQ8
    locally {
      val corpus = vecCorpus(71, n = 40)
      val dir = tmp("graft-sqempty")
      ext.Sq.buildIndex(corpus, dir)
      ext.Sq.removeFromIndex(dir, corpus.select("vec_id"))
      val v = ext.VersionedIndex.currentVersion(spark, dir).get
      assert(!ext.Sq.compactIndex(dir, spark))
      assert(ext.VersionedIndex.currentVersion(spark, dir).get === v)
      assert(ext.Sq.queryIndex(dir, corpus.limit(1), k = 3).count() === 0L)
    }
    // dedup
    locally {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "an entirely different document about spark query planning"))
        .toDF("doc_id", "text")
      val dir = tmp("graft-dedempty")
      ext.DedupIndex.buildIndex(docs, dir)
      ext.DedupIndex.removeFromIndex(dir, docs.select("doc_id"))
      val v = ext.VersionedIndex.currentVersion(spark, dir).get
      assert(!ext.DedupIndex.compactIndex(dir, spark))
      assert(ext.VersionedIndex.currentVersion(spark, dir).get === v)
      // with every fingerprint tombstoned, nothing suppresses
      assert(ext.DedupIndex.dedupeAgainstIndex(docs, dir).count() === 2L)
    }
    // BM25 search
    locally {
      val docs = Seq(
        (1L, "spark window merge"),
        (2L, "columnar storage formats"))
        .toDF("doc_id", "text")
      val dir = tmp("graft-searchempty")
      ext.Search.buildIndex(docs, dir)
      ext.Search.removeFromIndex(dir, docs.select("doc_id"))
      val v = ext.VersionedIndex.currentVersion(spark, dir).get
      assert(!ext.Search.compactIndex(dir, spark))
      assert(ext.VersionedIndex.currentVersion(spark, dir).get === v)
      assert(ext.Search.queryIndex(spark, dir, Seq("q" -> Seq("spark")))
        .count() === 0L)
    }
  }

  test("streaming-fold soak: periodic compaction bounds the shard chain; replay-safe; results exact") {
    // IVF: 12 micro-batch folds, compact+vacuum every 4th — the chain
    // must stay bounded by the compaction cadence, a replayed batch must
    // stay a no-op across compaction/vacuum (the root hwm marker), and
    // the final exhaustive-probe query must equal brute force over
    // everything ingested.
    val corpus = vecCorpus(79, n = 240)
    val dir = tmp("graft-ivfsoak")
    val slices = (0 until 12).map(b => corpus.where(col("vec_id") % 12 === b))
    var maxShards = 0
    slices.zipWithIndex.foreach { case (s, b) =>
      ext.Ivf.appendBatchToIndex(s, dir, b.toLong, nCells = 4)
      if ((b + 1) % 4 == 0) {
        assert(ext.Ivf.compactIndex(dir, spark))
        ext.Ivf.vacuumIndex(spark, dir, retainVersions = 1)
      }
      maxShards =
        math.max(maxShards, ext.VersionedIndex.liveShardCount(spark, dir, "cells"))
    }
    assert(maxShards <= 4, s"shard chain unbounded: peaked at $maxShards")
    assert(ext.VersionedIndex.liveShardCount(spark, dir, "cells") === 1)
    // exactly-once across compaction + vacuum: replaying a folded batch
    // commits nothing (hwm survives at the root once versions age out)
    val vNow = ext.VersionedIndex.currentVersion(spark, dir).get
    ext.Ivf.appendBatchToIndex(slices(5), dir, 5L, nCells = 4)
    assert(ext.VersionedIndex.currentVersion(spark, dir).get === vNow)
    val queries = corpus.where(col("vec_id") < 3)
    val brute = ext.Similarity.topK(corpus, queries, k = 5)
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val got = ext.Ivf.queryIndex(dir, queries, k = 5, nProbe = 4)
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === brute)

    // BM25 search: same soak shape — compaction folds stats_adjust away
    // and scores stay identical to a fresh one-shot index over the union
    val docs = (0 until 36).map(i =>
      (i.toLong, s"doc $i term${i % 7} term${i % 5} spark merge window"))
      .toDF("doc_id", "text")
    val sdir = tmp("graft-searchsoak")
    val sSlices = (0 until 6).map(b => docs.where(col("doc_id") % 6 === b))
    sSlices.zipWithIndex.foreach { case (s, b) =>
      ext.Search.appendBatchToIndex(s, sdir, b.toLong)
      if ((b + 1) % 3 == 0) {
        assert(ext.Search.compactIndex(sdir, spark))
        ext.Search.vacuumIndex(spark, sdir, retainVersions = 1)
      }
    }
    assert(ext.VersionedIndex.liveShardCount(spark, sdir, "data") === 1)
    val fresh = tmp("graft-searchfresh")
    ext.Search.buildIndex(docs, fresh)
    val q = Seq("qa" -> Seq("spark", "term3"), "qb" -> Seq("term1", "merge"))
    val want = ext.Search.queryIndex(spark, fresh, q, topK = 10)
      .collect().map(_.toString).sorted.toSeq
    val have = ext.Search.queryIndex(spark, sdir, q, topK = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(have === want)
  }

  test("IVF-PQ rerank == k triggers the exact rescore (scores are true cosine)") {
    val corpus = vecCorpus(73, n = 120)
    val dir = tmp("graft-pqrrk")
    ext.Ivf.buildPqIndex(corpus, dir, nCells = 4, m = 4, codes = 8)
    val queries = corpus.where(col("vec_id") < 2)
    // exhaustive probe + rerank depth == k over the full corpus: the
    // returned (id, cosine) pairs must be bit-identical to brute force
    // restricted to the PQ candidate top-k — i.e. real cosine values, not
    // PQ-approximate scores mislabeled 'cosine'
    val got = ext.Ivf.queryPqIndex(dir, queries, k = 5, nProbe = 4,
        rerank = 5, rerankAgainst = Some(corpus))
      .select("query_vec_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val brute = ext.Similarity.topK(corpus, queries, k = 200)
      .select("query_vec_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    assert(got.nonEmpty)
    got.foreach { case (q, v, c) =>
      assert(c === brute((q, v)),
        s"query $q vec $v: rerank==k returned a non-exact score")
    }
  }
}
