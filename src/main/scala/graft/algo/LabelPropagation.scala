package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** Synchronous label propagation — SURVEY.md §2.10.
  *
  *   label0(v)    = vid
  *   label_t+1(v) = argmax_l |{u ∈ N(v) : label_t(u) = l}|,
  *                  ties broken by SMALLEST label; keep label if no nbrs.
  *
  * Synchronous update + deterministic tie-break ⇒ bit-exact reproducible
  * labels (BASELINE.json:6 "exact for … label ids"). The argmax is
  * `max_by(label, struct(cnt, -label))` — one aggregation, no second
  * shuffle, and the ordering struct is unique per (dst,label) so the pick
  * is total. Runs `maxRounds` or to fixpoint.
  */
final case class LpaResult(
    labels: DataFrame, // (vid: long, label: long)
    rounds: Int,
    converged: Boolean, // true iff a round saw zero label changes (LPA also
                        // legitimately stops at maxRounds — the classic cap)
    metricsLog: Seq[Map[String, Any]])

object LabelPropagation {

  /** `packedAdjacency`: hub-split vertex-major arrays + CsrExpand CopyLabel
    * expansion (see ConnectedComponents.run) — identical labels. */
  def run(graph: LinkGraph, maxRounds: Int = 10,
          mat: Materializer = new LocalMaterializer,
          packedAdjacency: Boolean = false,
          packedSegment: Int = graft.scale.Csr.DefaultSegment): LpaResult =
    IterativeConf(graph.spark, Some(mat.loopPartitions.getOrElse(
      IterativeConf.adaptivePartitions(graph.spark, math.max(graph.numVertices, graph.numEdges))))) {
      val sym =
        if (packedAdjacency)
          mat.shared("sym_packed", graft.scale.Csr
            .packAdjacencyKeys(graph.symmetrized, packedSegment)
            .repartition(F.col("src")), repartitionKeys = Seq("src"),
            fingerprint = Some(s"segment=$packedSegment"))
        else mat.shared("sym", graph.symmetrized.repartition(F.col("src")), repartitionKeys = Seq("src"))

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
        // Count neighbor labels, then argmax with smallest-label tie-break.
        // Explicit dst-clustered exchange: HashPartitioning(dst) satisfies
        // BOTH groupBy(dst,label) and groupBy(dst), so the round pays one
        // shuffle, not two.
        val joined = sym.join(state.withColumnRenamed("vid", "src"), "src") // no exchange
        val flat =
          if (packedAdjacency) graft.plans.GraftPlans.expandLabels(joined)
          else joined.select(F.col("dst"), F.col("label"))
        val counts = flat
          .repartition(F.col("dst"))                          // THE shuffle
          .groupBy("dst", "label")
          .agg(F.count(F.lit(1)).as("cnt"))
        val best = counts
          .groupBy("dst")                                     // no exchange
          .agg(F.max_by(F.col("label"), F.struct(F.col("cnt"), (-F.col("label")).as("nl"))).as("new_label"))
          .withColumnRenamed("dst", "vid")
        val next = state
          .withColumnRenamed("label", "prev")
          .join(best, Seq("vid"), "left")                     // no exchange
          .select(F.col("vid"),
            F.coalesce(F.col("new_label"), F.col("prev")).as("label"),
            F.col("prev"))
        val committed = mat.iter(round, next, Map.empty)
        changed = committed
          .agg(F.coalesce(F.sum(F.when(F.col("label") =!= F.col("prev"), 1L).otherwise(0L)), F.lit(0L)))
          .first().getLong(0)
        mat.note(round, Map("changed" -> changed,
          "wall_ms" -> (System.nanoTime() - t0) / 1000000L))
        state = committed.select("vid", "label")
      }
      val out = LpaResult(state, round, converged = changed == 0L, mat.log)
      mat.close()
      out
    }
}
