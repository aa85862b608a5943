package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (SURVEY.md §2.11 extension surface): assign documents
  * to fixed token-budget bins by their starting offset in the concatenated
  * token stream — the "concatenate the corpus, then cut every `budget`
  * tokens" sharding a training run performs when packing documents into
  * context windows. Document d (in `idCol` order) lands in bin
  * `floor(start_offset(d) / budget)` where `start_offset` is the exclusive
  * prefix sum of token counts.
  *
  * The prefix sum is the scale problem: a single global window
  * (`Window.orderBy(id)`) coalesces the corpus into ONE task. This
  * implementation uses the classic two-level scan instead:
  *
  *   1. block id = `id div blockSize` (narrow map);
  *   2. per-block token sums — one partial-aggregating shuffle over
  *      `n/blockSize` rows;
  *   3. exclusive prefix over the BLOCK table — the only single-partition
  *      window, and it runs over `n/blockSize` rows, not `n` (at larger
  *      scale the same two steps recurse over the block table; no driver
  *      collect at any size);
  *   4. block offsets broadcast-joined back, then a per-block window
  *      (partitioned by block — parallel again) finishes the scan.
  *
  * Every step is exact long arithmetic (`div`, never double division), so
  * the assignment is bit-identical to the naive global-window formulation —
  * which is exactly what the DuckDB oracle computes.
  */
object Pack {

  /** Per-document bin assignment: `(idCol, n_tok, bin)`. `df` must carry
    * one row per document with a unique numeric `idCol` and its token
    * count in `tokCol`.
    */
  def packContiguous(df: DataFrame, budget: Long, blockSize: Long = 64,
                     idCol: String = "doc_id",
                     tokCol: String = "n_tok"): DataFrame = {
    require(budget > 0 && blockSize > 0, "budget and blockSize must be > 0")
    val base = df.select(col(idCol).cast("long").as("_id"),
        col(tokCol).cast("long").as("_n"))
      .withColumn("_blk", expr(s"_id div $blockSize"))
    val blocks = base.groupBy("_blk").agg(sum("_n").as("_bsum"))
    // deliberate single-partition window: n/blockSize rows, the scan's apex
    val blockW = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocks
      .withColumn("_off", coalesce(sum("_bsum").over(blockW), lit(0L)))
      .select("_blk", "_off")
    val inBlockW = Window.partitionBy("_blk").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), "_blk")
      .withColumn("_cum", col("_off") + sum("_n").over(inBlockW))
      .withColumn("bin", expr(s"(_cum - _n) div $budget"))
      .select(col("_id").as(idCol), col("_n").as(tokCol), col("bin"))
  }
}
