package graft.graph

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Deterministic dense-id assignment for a key column — SURVEY.md §2.3 E4 /
  * §4.3. vid = rank of key in global sorted order (0-based), so ids are a
  * pure function of the key *set*: input-order- and parallelism-independent.
  *
  * Scale path: NO single-partition window. Keys are range-partitioned and
  * ranked per partition; tiny per-partition counts are aggregated and the
  * cumulative base offset is joined back (broadcast — one row per
  * partition). The distinct key set is persisted so the two passes see the
  * same range boundaries (RangePartitioner samples once per materialized
  * plan; the cache pins it).
  */
object DenseId {

  /** @return DataFrame(key: original type, vid: long) */
  def assign(keys: DataFrame, keyCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = keys.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val k = F.col(keyCol)
    val parts = keys
      .select(k.as("key"))
      .where(k.isNotNull)
      .distinct()
      .repartitionByRange(n, F.col("key"))
      .withColumn("pid", F.spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = parts.groupBy("pid").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val bases = counts.map { case (pid, c) => val b = acc; acc += c; (pid, b) }
      val baseDf = spark.createDataFrame(bases.toSeq).toDF("pid", "base")
      val w = Window.partitionBy("pid").orderBy("key")
      // Eagerly materialize (localCheckpoint) BEFORE unpersisting `parts`:
      // otherwise a later re-execution could re-sample range boundaries and
      // disagree with the collected per-partition counts.
      parts
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(baseDf), "pid")
        .select(F.col("key").as(keyCol), (F.col("base") + F.col("rn") - 1).as("vid"))
        .localCheckpoint(true)
    } finally {
      parts.unpersist(blocking = false)
    }
  }
}
