package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** Truncated Katz centrality — SURVEY.md §2.10 (round 5).
  * katz(v) = Σ_{k=1..R} α^k · |paths of length k ending at v| over the
  * distinct directed simple edge set, computed by the recurrence
  * c_t = α · Aᵀ(1 + c_{t−1}), c_0 = 0 — each round is the engine's
  * standard one-join-one-agg kernel (edges⋈state, sum by dst). The
  * R-round truncation makes the estimator deterministic for ANY α (no
  * spectral-radius convergence argument needed), which is what lets the
  * DuckDB oracle reproduce it exactly with unrolled round CTEs.
  *
  * Scale shape: state is one double per vertex; per round one shuffle;
  * work R·|E| — the same profile as a fixed-iteration PageRank without
  * the degree normalization.
  */
object Katz {

  def run(graph: LinkGraph, alpha: Double, rounds: Int): DataFrame = {
    val fl = new FlatLoop(graph.spark)
    val de = fl.ckpt("edges",
      graph.directed.where(F.col("src") =!= F.col("dst"))
        .repartition(F.col("src")))
    var c = fl.ckpt("c",
      graph.vertices.select(F.col("vid"), F.lit(0.0).as("c")))
    var t = 0
    while (t < rounds) {
      t += 1
      val agg = c.join(de.withColumnRenamed("src", "vid"), "vid")
        .groupBy(F.col("dst").as("vid"))
        .agg((F.lit(alpha) * F.sum(F.col("c") + 1.0)).as("nc"))
      c = fl.ckpt("c",
        graph.vertices.join(agg, Seq("vid"), "left")
          .select(F.col("vid"), F.coalesce(F.col("nc"), F.lit(0.0)).as("c")))
      fl.sweep("c")
    }
    c.select(F.col("vid"), F.round(F.col("c"), 6).as("katz")).orderBy("vid")
  }
}
