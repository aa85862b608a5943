package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters, so the
  * engine can compose its custom codegen expressions (graft.expressions.*)
  * in ordinary Column pipelines. The standard pattern for libraries that
  * ship Catalyst expressions without a SparkSessionExtensions requirement.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The RDD(s) physically backing a (local)checkpointed Dataset — read
    * straight off its `LogicalRDD` plan leaves, so callers can unpersist
    * the blocks deterministically. Unlike diffing
    * `sparkContext.getPersistentRDDs` around the checkpoint call, this is
    * immune to concurrent persists from other threads (which the diff
    * could capture and later wrongly unpersist).
    */
  def backingRdds(df: Dataset[_]): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** A DataFrame over a [[org.apache.spark.sql.sources.BaseRelation]] —
    * the constructor `spark.read` uses internally, needed to serve the
    * engine's snapshot `FileIndex` (`graft.plans.GraftFileIndex`) through
    * an ordinary `HadoopFsRelation` scan.
    */
  def ofRelation(spark: SparkSession,
                 rel: org.apache.spark.sql.sources.BaseRelation): DataFrame =
    spark.asInstanceOf[classic.SparkSession].baseRelationToDataFrame(rel)

  /** Block until the listener bus has delivered every queued event — task
    * metrics arrive asynchronously, so a bench snapshotting listener-
    * accumulated counters must drain the bus on both sides of the timed
    * region or attribute one query's tasks to the next.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
