package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** Hop-bounded approximate betweenness centrality — SURVEY.md §2.10
  * (round 5). Sampled-source Brandes (Brandes '01; the sampling variant
  * is Brandes-Pich '07 / Bader et al.): exact shortest-path counting and
  * dependency accumulation over a deterministic SOURCE SUBSET, truncated
  * at `maxT` hops — bc(v) = Σ_{s∈S} δ_s(v), the k-bounded
  * source-sampled estimator. Both approximations (source sampling, hop
  * bound) are the published web-scale trade for an O(nm) exact algorithm,
  * and both are deterministic here, so the DuckDB oracle reproduces the
  * estimator EXACTLY (unrolled level CTEs) — no tolerance band needed.
  *
  * Level-synchronous forward phase: frontier expansion computes
  * dist(s,v) AND σ(s,v) (number of shortest s→v paths) in the same
  * one-join-one-agg round the BFS loop uses — σ(v) at level t = Σ σ(u)
  * over level-(t−1) predecessors, settled vertices excluded by anti-join.
  * σ values are INTEGERS carried as doubles: exact under any summation
  * order below 2^53, so the float path cannot diverge between engines.
  *
  * Backward phase, levels processed strictly deepest-first (the Brandes
  * invariant: δ(w) is FINAL when its level is processed): per level one
  * edges⋈level join + one agg —
  * δ(v) = Σ_{v→w, dist(s,w)=dist(s,v)+1} σ(v)/σ(w) · (1 + δ(w)).
  * Horizon-boundary vertices (dist = maxT) have δ = 0 by truncation.
  *
  * Scale shape: state is O(Σ|reachable ball within maxT|) rows bucketed
  * by source; each of the 2·maxT rounds is one shuffle; no driver-side
  * state beyond the loop counter. Source count |S| and horizon maxT are
  * the two knobs that bound total work — the standard betweenness
  * estimator configuration at web scale.
  */
object Betweenness {

  /** Per-vertex bc over the directed simple graph from the given source
    * set, σ/δ truncated at maxT hops. Returns (vid, bc) for EVERY vertex
    * (0.0 where v is never strictly between a source and a farther
    * vertex), bc rounded to 6dp. */
  def run(graph: LinkGraph, sources: DataFrame, maxT: Int): DataFrame = {
    val spark = graph.spark
    val fl = new FlatLoop(spark)
    val de = fl.ckpt("edges",
      graph.directed.where(F.col("src") =!= F.col("dst"))
        .repartition(F.col("src")))

    // ---- forward: levels(t) = (s, v, sigma) for dist(s,v) = t
    var levels = Vector(fl.ckpt("l0",
      sources.select(F.col("vid").as("s"), F.col("vid").as("v"),
        F.lit(1.0).as("sigma"))))
    var settled = fl.ckpt("settled", levels(0).select("s", "v"))
    var t = 0
    var growing = true
    while (t < maxT && growing) {
      t += 1
      val next = fl.ckpt(s"l$t",
        levels(t - 1).join(de.withColumnRenamed("src", "v"), "v")
          .select(F.col("s"), F.col("dst").as("v"), F.col("sigma"))
          .join(settled, Seq("s", "v"), "left_anti")
          .groupBy("s", "v").agg(F.sum("sigma").as("sigma")))
      if (next.isEmpty) { growing = false; levels = levels :+ next }
      else {
        settled = fl.ckpt("settled",
          settled.unionByName(next.select("s", "v")))
        levels = levels :+ next
      }
    }
    val deepest = t

    // ---- backward: delta per level, deepest-first; level `deepest` has
    // delta = 0 by horizon truncation (and genuinely-last levels by
    // having no successors).
    var delta: DataFrame = levels(deepest)
      .select(F.col("s"), F.col("v"), F.col("sigma"), F.lit(0.0).as("delta"))
    var acc: DataFrame = if (deepest > 0) delta else delta.limit(0)
    var k = deepest - 1
    while (k >= 0) {
      val contrib = levels(k)
        .join(de.withColumnRenamed("src", "v").withColumnRenamed("dst", "w"), "v")
        .join(delta.select(F.col("s"), F.col("v").as("w"),
          F.col("sigma").as("sigma_w"), F.col("delta").as("delta_w")),
          Seq("s", "w"))
        .groupBy("s", "v")
        .agg(F.sum(F.col("sigma") / F.col("sigma_w") * (F.col("delta_w") + 1.0))
          .as("delta"))
      val lvl = fl.ckpt(s"d$k",
        levels(k).join(contrib, Seq("s", "v"), "left")
          .select(F.col("s"), F.col("v"), F.col("sigma"),
            F.coalesce(F.col("delta"), F.lit(0.0)).as("delta")))
      delta = lvl
      // bc excludes the source's own row (δ_s(s) is not betweenness mass)
      acc = if (k == 0) acc.unionByName(lvl.where(F.col("v") =!= F.col("s")))
            else acc.unionByName(lvl)
      k -= 1
    }

    val bc = acc.groupBy("v").agg(F.sum("delta").as("bc"))
    graph.vertices
      .join(bc.withColumnRenamed("v", "vid"), Seq("vid"), "left")
      .select(F.col("vid"),
        F.round(F.coalesce(F.col("bc"), F.lit(0.0)), 6).as("bc"))
      .orderBy("vid")
  }
}
