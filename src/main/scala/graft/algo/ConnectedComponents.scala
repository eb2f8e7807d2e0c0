package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** Connected components, HashMin — SURVEY.md §2.10; semantics per
  * Rastogi et al., "Finding connected components in map-reduce in
  * logarithmic rounds" (ICDE 2013) [PAPERS.md].
  *
  *   label0(v)    = vid
  *   label_t+1(v) = min(label_t(v), min_{u∈N(v)} label_t(u))   (symmetrized)
  *
  * Fixpoint when no label changes. Final label = min vid of the component —
  * independent of execution order, hence EXACT and deterministic
  * (BASELINE.json:6). Rounds ≈ graph diameter; transcript graphs are
  * shallow stars/chains, so HashMin beats star-contraction constants here.
  *
  * Per round: edges⋈labels (J1) + min-by-dst (A2) + least() merge, then a
  * changed-count agg over the committed frame (J3/A4).
  */
final case class CcResult(
    labels: DataFrame, // (vid: long, label: long)
    rounds: Int,
    metricsLog: Seq[Map[String, Any]])

object ConnectedComponents {

  def run(graph: LinkGraph, maxRounds: Int = 200,
          mat: Materializer = new LocalMaterializer): CcResult =
    IterativeConf(graph.spark) {
      val sym = mat.shared("sym", graph.symmetrized.repartition(F.col("src")))

      val (startIter, st0) = mat.resume() match {
        case Some((k, df)) => (k, df.select("vid", "label"))
        case None =>
          val init = graph.vertices
            .repartition(F.col("vid"))
            .select(F.col("vid"), F.col("vid").as("label"), F.col("vid").as("prev"))
          (0, mat.iter(0, init, Map("init" -> true)).select("vid", "label"))
      }
      var state = st0

      var round = startIter
      var changed = -1L
      while (changed != 0L && round < maxRounds) {
        round += 1
        val t0 = System.nanoTime()
        val msgs = sym
          .join(state.withColumnRenamed("vid", "src"), "src") // no exchange
          .groupBy("dst")                                     // THE shuffle
          .agg(F.min("label").as("nbr_min"))
          .withColumnRenamed("dst", "vid")
        val next = state
          .withColumnRenamed("label", "prev")
          .join(msgs, Seq("vid"), "left")                     // no exchange
          .select(F.col("vid"),
            F.least(F.col("prev"), F.coalesce(F.col("nbr_min"), F.col("prev"))).as("label"),
            F.col("prev"))
        val committed = mat.iter(round, next, Map.empty)
        changed = committed
          .agg(F.coalesce(F.sum(F.when(F.col("label") < F.col("prev"), 1L).otherwise(0L)), F.lit(0L)))
          .first().getLong(0)
        mat.note(round, Map("changed" -> changed,
          "wall_ms" -> (System.nanoTime() - t0) / 1000000L))
        state = committed.select("vid", "label")
      }
      val out = CcResult(state, round, mat.log)
      mat.close()
      out
    }
}
