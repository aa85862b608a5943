package graft

import org.apache.spark.sql.functions._

class RegistryAndDedupSpec extends SparkSpec {
  import spark.implicits._

  test("findStreams matches on tag equality; semi-join restricts the fact table") {
    val fact = dp(Seq(
      ("1:click", "2024-01-01T00:00:00Z", 1.0),
      ("1:view", "2024-01-01T00:00:00Z", 2.0),
      ("2:click", "2024-01-01T00:00:00Z", 3.0)))
      .withColumn("user_id", split(col("stream_id"), ":").getItem(0).cast("long"))
      .withColumn("event_type", split(col("stream_id"), ":").getItem(1))
    val registry = StreamRegistry.fromEvents(fact)
    assert(registry.count() == 3)
    val clicks = StreamRegistry.findStreams(registry, Map("type" -> "click"))
    assert(clicks.select("stream_id").as[String].collect().toSet == Set("1:click", "2:click"))
    val selected = StreamRegistry.selectDatapoints(fact, clicks)
    assert(selected.select("value").as[Double].collect().toSet == Set(1.0, 3.0))
  }

  test("outstandingDependencies finds derived streams that survive a delete") {
    val registry = Seq(
      ("raw1", Seq.empty[String]),
      ("raw2", Seq.empty[String]),
      ("derived", Seq("raw1", "raw2"))).toDF("stream_id", "derived_from")
    // deleting raw1 alone: derived depends on it → violation
    val viol = StreamRegistry.outstandingDependencies(
      registry, Seq("raw1").toDF("stream_id"))
    assert(viol.select("derived_stream", "source_stream").as[(String, String)]
      .collect().toSeq == Seq(("derived", "raw1")))
    // deleting raw1 + derived together: no violation
    val ok = StreamRegistry.outstandingDependencies(
      registry, Seq("raw1", "derived").toDF("stream_id"))
    assert(ok.count() == 0)
  }

  test("exact dedup groups identical texts and keeps min doc_id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = ext.Dedup.exact(docs).orderBy("keep_doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("keep_doc_id"), r.getAs[Long]("n_copies"))).toSeq
      == Seq((1L, 2L), (3L, 1L)))
  }

  test("shingle Jaccard near-dup finds the overlapping pair, not the disjoint one") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val pairs = ext.Dedup.nearDupJaccard(docs, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH candidates contain the true near-dup pair and verify equal jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val exact = ext.Dedup.nearDupJaccard(docs, threshold = 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = ext.Dedup.nearDupMinhash(docs, threshold = 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(lsh == exact)
  }

  test("duplicate clusters: min-label propagation finds connected components") {
    // components: {1,2,3,7} (chain 1-2, 2-3, 3-7), {10,11}, singleton 20 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("a", "b")
    val clusters = ext.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 7L, 10L, 11L, 20L).toDF("doc_id")
    val kept = ext.Dedup.keepOnePerCluster(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 20L))
  }

  test("keepOnePerCluster collapses exact duplicates found by minhash end-to-end") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (4L, "totally different content in this one here"))
      .toDF("doc_id", "text")
    val pairs = ext.Dedup.nearDupMinhash(docs, threshold = 0.8)
    val kept = ext.Dedup.keepOnePerCluster(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("simhash: identical docs collide at hamming 0; unrelated docs are far") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val cands = ext.Dedup.simhashCandidates(docs)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect()
    val identical = cands.find(c => c._1 == 1L && c._2 == 2L)
    assert(identical.exists(_._3 == 0L))
    assert(cands.filter(c => c._3 == 0L).map(c => (c._1, c._2)).toSet == Set((1L, 2L)))
  }
}
