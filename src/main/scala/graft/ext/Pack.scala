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

  /** Curriculum shard export: every document's EXACT global rank in
    * `(orderCol, idCol)` order, and from it the sized output shard and
    * in-shard position a curriculum-ordered training export writes —
    * `shard = (rank-1) div shardSize`, `pos = (rank-1) mod shardSize`.
    * The naive formulation is one global window (`row_number() OVER
    * (ORDER BY score, id)`), which coalesces the corpus into a single
    * task; this one is the classic scalable total-order rank instead:
    *
    *   1. `repartitionByRange(orderCol, idCol)` — the one full-data
    *      shuffle, every partition a contiguous slice of the total order
    *      (ties impossible: `idCol` is unique);
    *   2. a per-partition `mapPartitions` walk over the within-partition
    *      sort emits LOCAL ranks — narrow, no window exchange;
    *   3. per-partition counts (= max local rank) aggregate to a
    *      partition-count-sized table; the exclusive prefix over THAT
    *      (the only single-partition window) runs over `numPartitions`
    *      rows — metadata-scale at any corpus size;
    *   4. offsets equi-join back on partition id (AQE broadcasts the
    *      small side at runtime).
    *
    * The local-rank table is eagerly checkpointed so steps 3 and 4 read
    * ONE materialization (a 3-long projection, ~24 B/doc — never the
    * corpus columns); without it each consumer would re-run the range
    * shuffle and AQE could hand them different partition layouts. The
    * result is bit-identical to the global window — which is exactly
    * what the DuckDB oracle computes.
    */
  def shardByRank(df: DataFrame, orderCol: String, shardSize: Long,
                  idCol: String = "doc_id"): DataFrame = {
    require(shardSize > 0, "shardSize must be > 0")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructType}
    val src = df.select(col(orderCol).as("_s"), col(idCol).cast("long").as("_id"))
    val ranged = src.repartitionByRange(col("_s"), col("_id"))
      .sortWithinPartitions("_s", "_id")
    val schema = new StructType()
      .add("_pid", LongType).add("_lrank", LongType).add("_id", LongType)
    // eagerly materialized ONCE: the counts aggregate and the offset join
    // below both consume `ranked`, and without pinning it each would
    // re-execute the range shuffle independently — AQE may then give the
    // two executions different partition layouts, making the (pid, lrank)
    // pairs inconsistent between them. The checkpoint holds only the
    // 3-long projection (~24 B/doc), never the corpus columns.
    val ranked = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var r = 0L
      it.map { row => r += 1; Row(pid, r, row.getLong(1)) }
    }(org.apache.spark.sql.Encoders.row(schema)).localCheckpoint(true)
    val counts = ranked.groupBy("_pid").agg(max("_lrank").as("_n"))
    val w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum("_n").over(w), lit(0L)))
      .select("_pid", "_off")
    ranked.join(offsets, "_pid")
      .withColumn("rank", col("_off") + col("_lrank"))
      .withColumn("shard", expr(s"(rank - 1) div $shardSize"))
      .withColumn("pos", expr(s"(rank - 1) % $shardSize"))
      .select(col("_id").as(idCol), col("rank"), col("shard"), col("pos"))
  }

  /** Scalable 0-BASED dense rank over a UNIQUE string key — the
    * [[shardByRank]] machinery generalized to a non-numeric key, for
    * callers that need a total order over a dimension table without a
    * single-partition window (e.g. the z-order rewrite's stream ranks:
    * correct at a registry of millions where `Window.orderBy(stream_id)`
    * would coalesce into one task). Same shape: one range shuffle on the
    * key, per-partition local ranks, an exclusive prefix over the
    * partition-count-sized table (the only single-partition window —
    * metadata-scale at any input size), offsets joined back. Output:
    * `(keyCol, rankCol)` with ranks `0..n-1` in key order, bit-identical
    * to `row_number() OVER (ORDER BY key) - 1`.
    */
  def globalRankByKey(df: DataFrame, keyCol: String,
                      rankCol: String = "rank0"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val src = df.select(col(keyCol).cast("string").as("_k"))
    val ranged = src.repartitionByRange(col("_k")).sortWithinPartitions("_k")
    val schema = new StructType()
      .add("_pid", LongType).add("_lrank", LongType).add("_k", StringType)
    // one materialization for both consumers (counts + join), as in
    // shardByRank — AQE must not hand them different partition layouts
    val ranked = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var r = 0L
      it.map { row => r += 1; Row(pid, r, row.getString(0)) }
    }(org.apache.spark.sql.Encoders.row(schema)).localCheckpoint(true)
    val counts = ranked.groupBy("_pid").agg(max("_lrank").as("_n"))
    val w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum("_n").over(w), lit(0L)))
      .select("_pid", "_off")
    ranked.join(offsets, "_pid")
      .select(col("_k").as(keyCol),
        (col("_off") + col("_lrank") - 1L).as(rankCol))
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
