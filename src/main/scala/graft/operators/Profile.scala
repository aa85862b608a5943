package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass table profiling — the data-quality summary a pipeline
  * audits before (and after) every materialization: per column, the row
  * count, NULL count, exact distinct count, and numeric min/max.
  *
  * Shape: ONE aggregate over the table computes every statistic as a
  * wide single row (the exact distincts plan through Catalyst's Expand —
  * one pass over the data fanned out per distinct-column, partial→final,
  * never a per-column re-scan), which is then unpivoted driver-free into
  * one row per column with `stack`. For corpus-scale tables where exact
  * distincts are too hot, `approx = true` swaps them for HLL++ sketches
  * (`approx_count_distinct`, mergeable partials, no Expand) — same
  * output schema, bounded error.
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** `(col_name, n_rows, n_null, n_distinct, min_num, max_num)` for each
    * of `cols` (defaults to every column). `min_num`/`max_num` are NULL
    * for non-numeric columns — no cross-engine string rendering of
    * values, doubles pass through without arithmetic.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "nothing to profile")
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: names.flatMap { c =>
      val nd = if (approx) approx_count_distinct(col(c))
        else count_distinct(col(c))
      val (mn, mx) =
        if (isNumeric(df.schema(c).dataType))
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      Seq(count(col(c)).as(s"_nn_$c"), nd.as(s"_nd_$c"),
        mn.as(s"_mn_$c"), mx.as(s"_mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.map { c =>
      s"'$c', _nn_$c, _nd_$c, _mn_$c, _mx_$c"
    }.mkString(", ")
    wide.select(col("_n"), expr(
        s"stack(${names.size}, $stackArgs) AS (col_name, _nn, n_distinct, min_num, max_num)"))
      .select(col("col_name"), col("_n").as("n_rows"),
        (col("_n") - col("_nn")).as("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"))
  }
}
