package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact φ-heavy hitters — every value whose frequency exceeds `n/k` —
  * without ever shuffling the full value distribution.
  *
  * The naive formulation (`groupBy(value).count()` then filter) shuffles
  * one record per DISTINCT value; over a 100 TB token stream that is a
  * full-corpus-vocabulary exchange just to find a few hundred frequent
  * items. This is the two-pass sketch-then-verify shape instead
  * (Misra–Gries summaries, the deterministic ancestor of lossy counting /
  * space-saving):
  *
  *   1. one narrow scan runs a k-counter Misra–Gries summary PER
  *      PARTITION (no shuffle). MG's undercount is at most `n_p/(k+1)`,
  *      so any value with partition frequency above `n_p/(k+1)` still
  *      holds a live counter; by pigeonhole, a value with GLOBAL
  *      frequency above `n/(k+1)` — and a fortiori above `n/k` — must
  *      clear that bar in at least one partition. The union of partition
  *      survivors is therefore a guaranteed superset of the true heavy
  *      hitters, at most `k` candidates per partition.
  *   2. the candidate set (size ≤ k·P — a SKETCH, bounded by config, not
  *      by data) is broadcast back, and one more scan counts ONLY the
  *      candidates exactly: a broadcast semi-join feeding a partial→final
  *      aggregate over ≤ k·P distinct keys.
  *
  * The output is EXACT — `(value, cnt)` for every value with
  * `cnt·k > n` — and independent of partitioning: the sketch only decides
  * who gets recounted, never what is reported. Two scans total, zero
  * wide shuffles of the raw distribution.
  */
object HeavyHitters {

  /** All values of `valueCol` (as strings; NULLs ignored) occurring more
    * than `n/k` times among the non-null rows, with their exact counts.
    * Eager: the sketch pass runs at call time (it is an action over the
    * input); the returned frame re-scans lazily for the exact recount.
    */
  def exact(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df.select(col(valueCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        var np = 0L
        it.foreach { v =>
          if (v != null) {
            np += 1
            counters.get(v) match {
              case Some(c) => counters.update(v, c + 1)
              case None if counters.size < k => counters.update(v, 1L)
              case None =>
                // decrement-all; amortized O(1): each decrement cancels
                // one prior increment
                val dead = List.newBuilder[String]
                counters.foreach { case (cv, c) =>
                  if (c == 1L) dead += cv else counters.update(cv, c - 1)
                }
                dead.result().foreach(counters.remove)
            }
          }
        }
        counters.keysIterator.map(v => (v, 0L)) ++ Iterator(((null: String), np))
      }.toDF("value", "np")
    // collect the SKETCH (≤ (k+1)·P rows by construction), not the data —
    // the same driver footprint as any sketch aggregate's merged state
    val rows = sketch.collect()
    val total = rows.iterator.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val candidates = rows.iterator.filterNot(_.isNullAt(0))
      .map(_.getString(0)).toSeq.distinct
    val candDf = candidates.toDF("_hh_cand")
    df.join(broadcast(candDf), col(valueCol).cast("string") === col("_hh_cand"),
        "left_semi")
      .groupBy(col(valueCol).cast("string").as(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > lit(total))
  }

  /** Per-group exact heavy hitters: within each group, every value
    * occurring more than `n_group/k` times. The sketch pass keeps an
    * independent k-counter Misra–Gries summary PER (partition, group) —
    * the superset proof applies group-wise, so state is O(groups·k) per
    * partition (use for bounded group domains: languages, sources,
    * shards) — and the recount is the same broadcast semi-join, now on
    * `(group, value)`, thresholded against each group's own total via a
    * broadcast totals join. Exact and partitioning-independent, like the
    * global variant.
    */
  def exactPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                    k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df.select(col(groupCol).cast("string"),
        col(valueCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val groups = mutable.HashMap
          .empty[String, (mutable.HashMap[String, Long], Array[Long])]
        it.foreach { case (g, v) =>
          if (g != null && v != null) {
            val (counters, np) = groups.getOrElseUpdate(g,
              (mutable.HashMap.empty[String, Long], Array(0L)))
            np(0) += 1
            counters.get(v) match {
              case Some(c) => counters.update(v, c + 1)
              case None if counters.size < k => counters.update(v, 1L)
              case None =>
                val dead = List.newBuilder[String]
                counters.foreach { case (cv, c) =>
                  if (c == 1L) dead += cv else counters.update(cv, c - 1)
                }
                dead.result().foreach(counters.remove)
            }
          }
        }
        groups.iterator.flatMap { case (g, (counters, np)) =>
          counters.keysIterator.map(v => (g, v, 0L)) ++
            Iterator((g, (null: String), np(0)))
        }
      }.toDF("group", "value", "np")
    val rows = sketch.collect()
    val totals = rows.filter(_.isNullAt(1))
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(2)).sum }
    val cands = rows.filterNot(_.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1))).distinct.toSeq
    val candDf = cands.toDF("_hh_grp", "_hh_cand")
    val totalsDf = totals.toSeq.toDF("_hh_grp2", "_hh_total")
    df.join(broadcast(candDf),
        col(groupCol).cast("string") === col("_hh_grp") &&
          col(valueCol).cast("string") === col("_hh_cand"), "left_semi")
      .groupBy(col(groupCol).cast("string").as(groupCol),
        col(valueCol).cast("string").as(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totalsDf), col(groupCol) === col("_hh_grp2"))
      .where(col("cnt") * k > col("_hh_total"))
      .select(groupCol, valueCol, "cnt")
  }
}
