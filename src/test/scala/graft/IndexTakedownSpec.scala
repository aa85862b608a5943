package graft

import org.apache.spark.sql.functions._

/** Takedown (right-to-be-forgotten) for the persisted indexes: tombstone
  * versions void removed ids from every read, appends keep them in force,
  * refresh drains them physically, pinned pre-takedown versions still
  * serve, and the dedup index stops suppressing re-submissions of a
  * removed document.
  */
class IndexTakedownSpec extends SparkSpec {
  import spark.implicits._

  private def vecCorpus(seed: Int, n: Int = 300) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1), i % 3))
      .toDF("vec_id", "embedding", "label")
  }

  test("IVF takedown: queries/cells exclude removed ids; pin, append, refresh contracts") {
    val corpus = vecCorpus(41)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString
    ext.Ivf.buildIndex(corpus, dir, nCells = 8)
    val vPre = ext.VersionedIndex.currentVersion(spark, dir).get
    val queries = corpus.where(col("vec_id") < 3)
    // remove two ids that brute force over the full corpus ranks for q0
    val dead = Seq(10L, 11L).toDF("vec_id")
    assert(ext.Ivf.removeFromIndex(dir, dead) === 2L)
    val survivors = corpus.where(!col("vec_id").isin(10L, 11L))
    val brute = ext.Similarity.topK(survivors, queries, k = 5)
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val got = ext.Ivf.queryIndex(dir, queries, k = 5, nProbe = 8)
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === brute)
    assert(ext.Ivf.cells(spark, dir).where(col("vec_id").isin(10L, 11L))
      .count() === 0L)
    // pinned pre-takedown version still serves the removed vectors
    assert(ext.Ivf.cells(spark, dir, asOfVersion = Some(vPre))
      .where(col("vec_id").isin(10L, 11L)).count() === 2L)
    // removing an absent id is a no-op: no new version
    val vNow = ext.VersionedIndex.currentVersion(spark, dir).get
    assert(ext.Ivf.removeFromIndex(dir, Seq(9999L).toDF("vec_id")) === 0L)
    assert(ext.VersionedIndex.currentVersion(spark, dir).get === vNow)
    // an append keeps the takedown in force
    ext.Ivf.appendToIndex(
      Seq((500L, Seq.fill(16)(0.1f), 0)).toDF("vec_id", "embedding", "label"),
      dir)
    assert(ext.Ivf.cells(spark, dir).where(col("vec_id").isin(10L, 11L))
      .count() === 0L)
    assert(ext.Ivf.cells(spark, dir).where(col("vec_id") === 500L).count() === 1L)
    // refresh drains the tombstones physically: raw shards no longer hold
    // the ids and the new version carries no tombstone table
    ext.Ivf.refreshIndex(dir, spark, refineIters = 1)
    assert(!new java.io.File(s"${ext.Ivf.indexDir(spark, dir)}/tombstones").exists())
    assert(ext.Ivf.cells(spark, dir).count() === 299L) // 300 - 2 + 1 appended
    assert(ext.Ivf.cells(spark, dir).where(col("vec_id").isin(10L, 11L))
      .count() === 0L)
  }

  test("IVF-PQ takedown: exhaustive probe + full rerank equals brute over survivors") {
    val corpus = vecCorpus(43, n = 200)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqdel").toString
    ext.Ivf.buildPqIndex(corpus, dir, nCells = 8, m = 4, codes = 16)
    val queries = corpus.where(col("vec_id") < 2)
    assert(ext.Ivf.removeFromIndex(dir, Seq(20L, 21L, 22L).toDF("vec_id")) === 3L)
    val survivors = corpus.where(!col("vec_id").isin(20L, 21L, 22L))
    val brute = ext.Similarity.topK(survivors, queries, k = 5)
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val got = ext.Ivf.queryPqIndex(dir, queries, k = 5, nProbe = 8,
        rerank = 200, rerankAgainst = Some(survivors))
      .select("query_vec_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === brute)
  }

  test("dedup-index takedown: a removed document stops suppressing re-submissions") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark query planning"),
      (3L, "yet another unrelated text on columnar storage formats"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-deddel").toString
    ext.DedupIndex.buildIndex(docs, dir)
    // a byte-identical copy of doc 1 is suppressed by the index
    val resub = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    assert(ext.DedupIndex.dedupeAgainstIndex(resub, dir).count() === 0L)
    // takedown doc 1: its fingerprints must stop suppressing
    assert(ext.DedupIndex.removeFromIndex(dir, Seq(1L).toDF("doc_id")) === 1L)
    assert(ext.DedupIndex.dedupeAgainstIndex(resub, dir).count() === 1L)
    // other documents still suppress their duplicates
    val resub2 = Seq(
      (101L, "an entirely different document about spark query planning"))
      .toDF("doc_id", "text")
    assert(ext.DedupIndex.dedupeAgainstIndex(resub2, dir).count() === 0L)
    // an appended shard carries the takedown forward
    ext.DedupIndex.appendToIndex(
      Seq((5L, "fresh fifth document with novel content entirely"))
        .toDF("doc_id", "text"), dir)
    assert(ext.DedupIndex.dedupeAgainstIndex(resub, dir).count() === 1L)
    // absent id: no-op, no version
    val vNow = ext.VersionedIndex.currentVersion(spark, dir).get
    assert(ext.DedupIndex.removeFromIndex(dir, Seq(888L).toDF("doc_id")) === 0L)
    assert(ext.VersionedIndex.currentVersion(spark, dir).get === vNow)
  }
}
