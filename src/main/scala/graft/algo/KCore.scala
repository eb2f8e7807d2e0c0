package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** k-core membership by iterative peeling — SURVEY.md §2.10 (round 4).
  *
  * The k-core of an undirected graph is the maximal subgraph in which every
  * vertex has degree ≥ k. Computed by the classic peel: repeatedly delete
  * vertices whose degree among the SURVIVORS falls below k; the fixpoint is
  * the k-core (deletion order never matters — the k-core is unique).
  *
  * Execution shape per round: degrees of the surviving subgraph are one
  * hash aggregation over the surviving edge set; the shrink is two
  * left-semi joins of edges against the surviving vertex set. The edge set
  * only ever SHRINKS, so per-round cost is monotonically decreasing — at
  * web scale the first round (full-degree histogram) dominates, exactly one
  * shuffle + two semi-joins per round, O(peel-depth) rounds. Each round is
  * checkpoint-truncated (SURVEY §4.4) so the loop's plan stays flat.
  *
  * Round count is CAPPED at `maxRounds` with early exit on fixpoint — the
  * contract is "the surviving set after ≤ maxRounds peels", which equals
  * the true k-core whenever the peel converges within the cap (asserted at
  * fixture scale) and matches the oracle's unrolled CTE chain round for
  * round either way, the same fixed-round discipline as LPA.
  */
object KCore {

  final case class KCoreResult(members: DataFrame, rounds: Int, converged: Boolean)

  def run(graph: LinkGraph, k: Int, maxRounds: Int = 8): KCoreResult = {
    val fl = new FlatLoop(graph.spark)
    // Undirected distinct neighbor pairs, self-loops dropped: degree below
    // is |distinct neighbors|, mirroring the LPA sym frame and the oracle.
    var alive = fl.ckpt("alive",
      graph.symmetrized.where(F.col("src") =!= F.col("dst")))
    var lastKeep: DataFrame = graph.vertices
    var nAlive = -1L
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      rounds += 1
      // survivors this round: degree within the current subgraph ≥ k.
      // (sym is a distinct pair set, so count-by-src IS the degree.)
      val keep = fl.ckpt("keep",
        alive.groupBy("src").agg(F.count(F.lit(1)).as("deg"))
          .where(F.col("deg") >= k).select(F.col("src").as("vid")))
      val next = fl.ckpt("alive", alive
        .join(keep.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")) // lineage barrier per round (SURVEY §4.4)
      val n = next.count()
      // edge set is monotone-shrinking, so equal count ⇒ equal set ⇒
      // every subsequent peel is a no-op (keep is then exactly the
      // vertices incident to the stable edge set)
      converged = n == nAlive
      nAlive = n
      alive = next
      lastKeep = keep
      fl.sweep("alive", "keep") // keep's latest gen (the result) survives
    }
    KCoreResult(lastKeep, rounds, converged)
  }

  /** (vid, in_core) over the full vertex set — the query surface. */
  def membership(graph: LinkGraph, k: Int, maxRounds: Int = 8): DataFrame = {
    val m = run(graph, k, maxRounds).members.withColumn("in_core", F.lit(true))
    graph.vertices.join(m, Seq("vid"), "left")
      .select(F.col("vid"), F.coalesce(F.col("in_core"), F.lit(false)).as("in_core"))
  }
}
