package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Iterative-loop checkpoint that stays FLAT.
  *
  * `Dataset.localCheckpoint` (Spark 3.4+) rewraps the data in a LogicalRDD
  * that carries `originStats`/`originConstraints` referencing the
  * pre-checkpoint plan. In an iterative loop each iteration's leaf then
  * embeds the previous iteration's whole join tree: size-only statistics
  * MULTIPLY `sizeInBytes` across joins, so the BigInt digit count multiplies
  * every round and stats computation goes exponential (observed: >60s/iter
  * by round 10 on a 216-vertex graph, all in BigInteger.multiply).
  *
  * This shim materializes via RDD-level localCheckpoint and rebuilds a bare
  * LogicalRDD leaf: no origin stats, no origin constraints, but WITH the
  * physical `outputPartitioning`/`outputOrdering` — preserving the
  * one-shuffle-per-iteration partitioning contract of graft.algo.
  *
  * Lives under org.apache.spark.sql to reach the `private[sql]` Dataset
  * factory; uses only stable internals (LogicalRDD's public constructor).
  */
object FlatCheckpoint {

  /** Eagerly materialize `df`; returns a flat-leaf frame over the
    * checkpointed blocks. Caller may unpersist via the returned RDD. */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[CSparkSession]
    val qe = df.queryExecution
    val physical = qe.executedPlan
    val internal: RDD[InternalRow] = qe.toRdd.map(_.copy())
    internal.localCheckpoint()
    internal.count()
    val logical = LogicalRDD(
      qe.analyzed.output,
      internal,
      firstLeafPartitioning(physical.outputPartitioning),
      physical.outputOrdering,
      isStreaming = false,
      stream = None)(session, None, None)
    CDataset.ofRows(session, logical)
  }

  /** Mirrors Spark's own Dataset.checkpoint normalization: a join's
    * PartitioningCollection must collapse to one concrete partitioning. */
  private def firstLeafPartitioning(p: Partitioning): Partitioning = p match {
    case c: PartitioningCollection =>
      c.partitionings.map(firstLeafPartitioning).headOption
        .getOrElse(UnknownPartitioning(c.numPartitions))
    case other => other
  }
}
