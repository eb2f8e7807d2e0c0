package graft.scale

import org.apache.spark.sql.{DataFrame, functions => F}

/** Explicit skew handling — SURVEY.md §4.2 / BASELINE.json:6 "explicit
  * salting … to tame skew from hub conversations".
  *
  * AQE's skew-join splitting only repairs sort-merge/shuffle partitions
  * post-hoc; the binding spec demands explicit handling. Strategy: detect
  * hot keys by (weighted) degree, replicate ONLY the hot vertices' state
  * across S salts (bounded replication, not a full ×S blowup), route each
  * hot edge to a salt derived from its other endpoint, and join on
  * (key, salt). Cold keys ride salt 0 untouched.
  */
object Salting {

  /** Hot vertices of `deg` (vid, wdeg): above the q-quantile, and above
    * minDegree (don't salt a uniform graph). Hot sets are by construction
    * tiny (top 0.1%) — always broadcastable. */
  def hotKeys(deg: DataFrame, quantile: Double = 0.999, minDegree: Double = 64.0): DataFrame = {
    val spark = deg.sparkSession
    val q = deg.stat.approxQuantile("wdeg", Array(quantile), 0.001)
      .headOption.getOrElse(Double.MaxValue)
    val thr = math.max(q, minDegree)
    deg.where(F.col("wdeg") >= thr).select(F.col("vid").as("hot_vid"))
  }

  /** Add a salt column to edges: hot srcs spread across `salts` buckets by
    * hash(dst); cold srcs keep salt 0. */
  def saltEdges(edges: DataFrame, hot: DataFrame, salts: Int, key: String = "src"): DataFrame =
    edges
      .join(F.broadcast(hot.withColumn("is_hot", F.lit(true))),
        edges(key) === hot("hot_vid"), "left")
      .withColumn("salt",
        F.when(F.col("is_hot"), F.pmod(F.hash(F.col("dst")), F.lit(salts)).cast("int"))
          .otherwise(F.lit(0)))
      .drop("hot_vid", "is_hot")

  /** Replicate hot vertices' state rows across all salts; cold rows get
    * salt 0. Output has one extra `salt` column. */
  def saltState(state: DataFrame, hot: DataFrame, salts: Int, key: String = "vid"): DataFrame = {
    val hotB = F.broadcast(hot.withColumn("is_hot", F.lit(true)))
    val joined = state.join(hotB, state(key) === hot("hot_vid"), "left")
    joined
      .withColumn("salt_arr",
        F.when(F.col("is_hot"), F.sequence(F.lit(0), F.lit(salts - 1)))
          .otherwise(F.array(F.lit(0))))
      .withColumn("salt", F.explode(F.col("salt_arr")))
      .drop("hot_vid", "is_hot", "salt_arr")
  }
}
