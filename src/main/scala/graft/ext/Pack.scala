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
  * implementation uses the classic multi-level scan instead:
  *
  *   1. block id = `id div blockSize` (narrow map);
  *   2. per-block token sums — one partial-aggregating shuffle over
  *      `n/blockSize` rows;
  *   3. exclusive prefix over the BLOCK table, computed RECURSIVELY: while
  *      the block table exceeds `maxSinglePartition` rows, the same
  *      group-into-superblocks step repeats (each level shrinks by
  *      `blockSize`×), so the single-partition window at the apex runs
  *      over ≤ `maxSinglePartition` rows however large the corpus — no
  *      driver collect and no unconditional broadcast at any size (the
  *      per-level offset joins are plain equi-joins; AQE broadcasts the
  *      small levels at runtime);
  *   4. block offsets join back, then a per-block window (partitioned by
  *      block — parallel again) finishes the scan.
  *
  * Every step is exact long arithmetic (`div`, never double division), so
  * the assignment is bit-identical to the naive global-window formulation —
  * which is exactly what the DuckDB oracle computes.
  */
object Pack {

  /** Per-document bin assignment: `(idCol, n_tok, bin)`. `df` must carry
    * one row per document with a unique numeric `idCol` and its token
    * count in `tokCol`. `maxSinglePartition` bounds the apex window — the
    * default (1 << 20 block rows ≈ a few MB of (long, long) state) keeps
    * recursion depth at 1 until ~64M docs and 2 until ~4G docs at the
    * default blockSize.
    */
  def packContiguous(df: DataFrame, budget: Long, blockSize: Long = 64,
                     idCol: String = "doc_id",
                     tokCol: String = "n_tok",
                     maxSinglePartition: Long = 1L << 20): DataFrame = {
    require(budget > 0 && blockSize > 1 && maxSinglePartition > 0,
      "budget and maxSinglePartition must be > 0; blockSize must be > 1 " +
        "(each recursion level must shrink the block table)")
    val base = df.select(col(idCol).cast("long").as("_id"),
        col(tokCol).cast("long").as("_n"))
      .withColumn("_blk", expr(s"_id div $blockSize"))
    val blocks = base.groupBy("_blk").agg(sum("_n").as("_bsum"))
    val offsets = exclusiveOffsets(blocks, blockSize, maxSinglePartition)
    val inBlockW = Window.partitionBy("_blk").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    // plain equi-join on _blk — n/blockSize offset rows; AQE broadcasts
    // when the table is actually small instead of an unconditional hint
    // that would OOM the driver once the block table outgrows it
    base.join(offsets, "_blk")
      .withColumn("_cum", col("_off") + sum("_n").over(inBlockW))
      .withColumn("bin", expr(s"(_cum - _n) div $budget"))
      .select(col("_id").as(idCol), col("_n").as(tokCol), col("bin"))
  }

  /** Exclusive prefix sums over a `(_blk, _bsum)` table, ordered by
    * `_blk`: returns `(_blk, _off)`. Recursive — a level that still
    * exceeds `maxSingle` rows aggregates into superblocks of `fanout`
    * and recurses; the base case is the only single-partition window and
    * runs over ≤ `maxSingle` rows. Each level is eagerly checkpointed:
    * the row-count probe that decides the branch would otherwise re-run
    * the whole upstream aggregation chain once per level, and the tables
    * are metadata-scale (corpus/blockSize^depth rows).
    */
  private def exclusiveOffsets(blocks: DataFrame, fanout: Long,
                               maxSingle: Long): DataFrame = {
    val t = blocks.localCheckpoint(true)
    if (t.count() <= maxSingle) {
      val w = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("_off", coalesce(sum("_bsum").over(w), lit(0L)))
        .select("_blk", "_off")
    } else {
      val sup = t.withColumn("_sblk", expr(s"_blk div $fanout"))
      val supOff = exclusiveOffsets(
        sup.groupBy(col("_sblk").as("_blk")).agg(sum("_bsum").as("_bsum")),
        fanout, maxSingle)
        .select(col("_blk").as("_sblk"), col("_off").as("_soff"))
      val w = Window.partitionBy("_sblk").orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
      sup.join(supOff, "_sblk")
        .withColumn("_off", col("_soff") + coalesce(sum("_bsum").over(w), lit(0L)))
        .select("_blk", "_off")
    }
  }
}
