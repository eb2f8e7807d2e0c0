package graft

import org.apache.spark.sql.{functions => F}

import graft.algo.ConnectedComponents
import graft.graph.{GraphBuilder, LinkGraph}

/** Small-star/large-star CC must produce EXACTLY HashMin's labels (both are
  * component-min by definition) in logarithmic rounds instead of
  * diameter-many. */
class StarCcSpec extends SparkSpec {
  import spark.implicits._

  private def mkGraph(edges: Seq[(Long, Long)]): LinkGraph = {
    val e = edges.toDF("src", "dst")
      .select(F.col("src"), F.col("dst"), F.lit(1).as("kind"), F.lit(1.0).as("weight"))
    val dict = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("vid")
      .select(F.col("vid").cast("string").as("key"), F.col("vid"))
    LinkGraph(e, dict)
  }

  private def labelsOf(r: graft.algo.CcResult): Map[Long, Long] =
    r.labels.as[(Long, Long)].collect().toMap

  test("star == HashMin on the events graph") {
    val g = GraphBuilder.fromEvents(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    assert(labelsOf(ConnectedComponents.runStar(g)) ==
           labelsOf(ConnectedComponents.run(g)))
  }

  test("deep chain: identical labels, logarithmically fewer rounds") {
    // 40-chain with permuted ids (i*37 mod 101) so the component min is
    // NOT an endpoint — exercises min propagation through interior nodes
    val ids = (0 until 41).map(i => ((i * 37) % 101).toLong)
    val g = mkGraph(ids.sliding(2).map(p => (p(0), p(1))).toSeq)
    val hashMin = ConnectedComponents.run(g)
    val star = ConnectedComponents.runStar(g)
    assert(labelsOf(star) == labelsOf(hashMin))
    assert(labelsOf(star).values.toSet.size == 1, "one component")
    assert(star.rounds * 3 < hashMin.rounds,
      s"star ${star.rounds} rounds vs HashMin ${hashMin.rounds}: expected log-vs-diameter gap")
  }

  test("multi-component + isolated vertices + two cliques") {
    // cliques {10,11,12,13}, {20,21,22}; chain 30-31-32; isolated 40
    val clique1 = for (a <- Seq(10L, 11L, 12L, 13L); b <- Seq(10L, 11L, 12L, 13L) if a < b) yield (a, b)
    val edges = clique1 ++ Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L), (31L, 32L))
    val g0 = mkGraph(edges)
    // graft a lone vertex into the dict (no edges at all)
    val g = LinkGraph(g0.edges,
      g0.dict.union(Seq(("40", 40L)).toDF("key", "vid")))
    val star = labelsOf(ConnectedComponents.runStar(g))
    val hashMin = labelsOf(ConnectedComponents.run(g))
    assert(star == hashMin)
    assert(star(13L) == 10L && star(22L) == 20L && star(32L) == 30L && star(40L) == 40L)
  }
}
