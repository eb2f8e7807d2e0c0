package graft.algo

import org.apache.spark.sql.DataFrame

/** Slot-tracked flat checkpointing for multi-frame iterative loops
  * (SCC, k-core): every loop frame goes through FlatCheckpoint (plain
  * `localCheckpoint` chains origin stats across rounds — see
  * org.apache.spark.sql.graft.FlatCheckpoint), and block reclamation is
  * GENERATIONAL: `ckpt(slot, df)` records the new blocks as the slot's
  * latest generation; `sweep(slots*)` — called at the END of a round, when
  * every frame that read the older generations has been eagerly
  * materialized — frees everything but each slot's latest. Freeing only at
  * the sweep point is what makes multi-frame rounds safe: a frame built
  * THIS round from a predecessor is flat by the time the predecessor's
  * blocks go away. Final (result) generations are never swept away. */
private[algo] final class FlatLoop(spark: org.apache.spark.sql.SparkSession) {
  private val sc = spark.sparkContext
  private var gens = Map.empty[String, List[Set[Int]]]

  def ckpt(slot: String, df: DataFrame): DataFrame = {
    val before = sc.getPersistentRDDs.keySet
    val out = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(df)
    val created = sc.getPersistentRDDs.keySet.diff(before).toSet
    gens += slot -> (created :: gens.getOrElse(slot, Nil))
    out
  }

  /** Free all but the latest generation of each named slot. */
  def sweep(slots: String*): Unit = slots.foreach { s =>
    gens.get(s).foreach { l =>
      l.drop(1).flatten.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      gens += s -> l.take(1)
    }
  }
}
