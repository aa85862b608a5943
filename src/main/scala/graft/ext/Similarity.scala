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

  /** Σ aᵢ·bᵢ as an ordered double fold (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), _ + _))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 hyperplane for (band, plane), materialized at
    * PLAN-BUILD time as a literal array (a seeded driver-side draw) — the
    * signs are row-independent, so evaluating a hash for them per row would
    * be pure waste at scale.
    */
  private def hyperplane(band: Int, plane: Int, maxDim: Int): Column = {
    val rnd = new scala.util.Random(band * 7919 + plane)
    typedLit((0 until maxDim).map(_ => if (rnd.nextBoolean()) 1.0 else -1.0))
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
           vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_vec_id"), col(vecCol).as("qvec"),
      col("label").as("label")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .join(q, col("vec_id") =!= col("query_vec_id"))
      .select(col("label"), col("query_vec_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** ANN top-k through LSH buckets: only corpus vectors colliding with the
    * query in ≥1 band are scored. Recall < 1 by design; the scale path.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 8, bitsPerBand: Int = 12,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(id), col(vec),
          posexplode(lshBuckets(col(vec), bands, bitsPerBand)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "sig"))
    val qb = broadcast(banded(
      queries.select(col(idCol).as("query_vec_id"), col(vecCol).as("qvec")),
      "query_vec_id", "qvec"))
    val cb = banded(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")),
      "vec_id", "vec")
    val cands = cb.join(qb, Seq("band", "sig"))
      .where(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"), col("qvec"), col("vec"))
      .dropDuplicates("query_vec_id", "vec_id")
    val w = Window.partitionBy("query_vec_id").orderBy(col("cosine").desc, col("vec_id"))
    cands.select(col("query_vec_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-dup candidates: pairs colliding in ≥1 LSH band
    * with exact cosine ≥ `threshold`. Never all-pairs.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   bands: Int = 8, bitsPerBand: Int = 12,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val banded = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
        posexplode(lshBuckets(col(vecCol), bands, bitsPerBand)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "sig"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.vec").as("va"), col("y.vec").as("vb"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
