package graft

import org.apache.spark.sql.functions._

/** The shared [[ext.VersionedIndex]] commit protocol across crash points
  * the streaming gates don't reach: orphaned fold records vs foreign
  * batch mutations, empty micro-batches, and the SQ8 rerank-depth
  * contract.
  */
class IndexProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "cat dog cat fish"),
    (1L, "dog dog dog"),
    (2L, "fish fish cat cat cat cat"),
    (3L, "bird bird bird bird"),
    (4L, "cat")
  ).toDF("doc_id", "text")

  /** 4-dim embeddings with distinct directions; ids 0..7. */
  private def vecs = Seq(
    (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.2f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.1f, 0.0f)),
    (3L, Array(0.1f, 0.9f, 0.2f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.1f)),
    (5L, Array(0.0f, 0.1f, 0.9f, 0.2f)),
    (6L, Array(0.2f, 0.0f, 0.0f, 1.0f)),
    (7L, Array(0.1f, 0.1f, 0.1f, 0.9f))
  ).toDF("vec_id", "embedding")

  private def asRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("a foreign batch mutation scrubs an orphaned fold record — the " +
    "restarted stream must NOT skip the crashed batch's replay") {
    val path = java.nio.file.Files.createTempDirectory("graft-orph").toString
    val shard1 = corpus.where(col("doc_id") < 2)
    val shard2 = corpus.where(col("doc_id") === 2)
    val shard3 = corpus.where(col("doc_id") >= 3)
    ext.Search.appendBatchToIndex(shard1, path, batchId = 0L) // v1 = build
    // crashed fold attempt for batch 7: the record is stamped INSIDE v2
    // before the body runs, and the body never commits
    val io = ext.VersionedIndex.io(spark, path)
    io.mkdirs(s"$path/v2")
    io.writeString(s"$path/v2/ingest_batch_id", "7")
    // a foreign BATCH mutation now allocates v2 and commits — pre-scrub it
    // ADOPTED the orphan, the high-watermark jumped to 7, and every stream
    // batch <= 7 was silently skipped from then on
    ext.Search.appendToIndex(shard2, path)
    assert(!io.exists(s"$path/v2/ingest_batch_id"),
      "the batch append must scrub the orphaned fold record it would adopt")
    // the restarted stream's next batch (1 <= 7) must still fold
    ext.Search.appendBatchToIndex(shard3, path, batchId = 1L)
    val qs = Seq("q" -> Seq("cat", "bird"))
    assert(asRows(ext.Search.queryIndex(spark, path, qs, topK = 10)) ==
      asRows(ext.Search.bm25(corpus, qs, topK = 10)))
  }

  test("an empty first micro-batch advances the watermark without " +
    "committing a degenerate build (IVF and SQ8)") {
    val empty = vecs.where(lit(false))
    for ((fold, query) <- Seq[((org.apache.spark.sql.DataFrame, String, Long) => Unit,
                               String => org.apache.spark.sql.DataFrame)](
      (((b, p, id) => ext.Ivf.appendBatchToIndex(b, p, id, nCells = 4)),
        (p => ext.Ivf.queryIndex(p, vecs, k = 2, nProbe = 4))),
      (((b, p, id) => ext.Sq.appendBatchToIndex(b, p, id)),
        (p => ext.Sq.queryIndex(p, vecs, k = 2,
          rerank = 8, rerankAgainst = Some(vecs)))))) {
      val path = java.nio.file.Files.createTempDirectory("graft-mtb").toString
      fold(empty, path, 0L)
      // nothing committed: no version, no degenerate model
      assert(ext.VersionedIndex.currentVersion(spark, path).isEmpty)
      fold(empty, path, 0L) // replay of the empty batch: still a no-op
      fold(vecs, path, 1L)  // first NON-empty batch builds
      val v = ext.VersionedIndex.currentVersion(spark, path)
      assert(v.nonEmpty)
      // exhaustive config reproduces brute force over the corpus
      assert(asRows(query(path)) ==
        asRows(ext.Similarity.topK(vecs, vecs.withColumn("label", lit(0)), k = 2)
          .select("query_vec_id", "vec_id", "cosine", "rank")))
      fold(empty, path, 2L) // empty LATER batch: watermark-only
      assert(ext.VersionedIndex.currentVersion(spark, path) == v)
      fold(vecs.where(lit(false)), path, 2L) // replay: no-op
      assert(asRows(query(path)) ==
        asRows(ext.Similarity.topK(vecs, vecs.withColumn("label", lit(0)), k = 2)
          .select("query_vec_id", "vec_id", "cosine", "rank")))
    }
  }

  test("Sq.queryIndex: rerank == k with a rerank corpus runs the EXACT " +
    "rescore (scores carry no quantization error)") {
    val path = java.nio.file.Files.createTempDirectory("graft-sqrk").toString
    ext.Sq.buildIndex(vecs, path)
    val got = ext.Sq.queryIndex(path, vecs, k = 2,
      rerank = 2, rerankAgainst = Some(vecs))
    // every returned cosine must be the exact float-vector cosine — the
    // pre-fix path returned SQ8-approximate scores labeled 'cosine'
    val v = vecs.select(col("vec_id"), col("embedding"))
    val exact = got.join(v.select(col("vec_id").as("query_vec_id"),
        col("embedding").as("_qv")), "query_vec_id")
      .join(v.select(col("vec_id"), col("embedding").as("_cv")), "vec_id")
      .select(col("cosine"),
        ext.Similarity.cosine(col("_qv"), col("_cv")).as("_exact"))
      .where(col("cosine") =!= col("_exact"))
    assert(exact.isEmpty,
      "rerank == k must exact-rescore, not serve SQ8-approximate scores")
  }
}
