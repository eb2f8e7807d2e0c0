package graft

import org.apache.spark.sql.DataFrame

import graft.algo._
import graft.graph.LinkGraph

/** FIXTURES.md §5 closed-form goldens — no oracle needed. */
class AlgoGoldensSpec extends SparkSpec {
  import spark.implicits._

  /** Graph from explicit integer edges (kind 1, weight 1 unless given). */
  def graphOf(n: Int, edges: Seq[(Long, Long)]): LinkGraph = {
    val e: DataFrame = edges.map { case (s, d) => (s, d, 1, 1.0) }
      .toDF("src", "dst", "kind", "weight")
    val dict = (0 until n).map(i => (s"v:$i", i.toLong)).toDF("key", "vid")
    LinkGraph(e, dict)
  }

  test("PageRank 3-cycle converges to exactly 1/3 each") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    val r = PageRank.run(g, PageRankConfig(tol = 1e-9))
    val ranks = r.ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    assert(r.converged)
    ranks.foreach(x => assert(math.abs(x - 1.0 / 3.0) < 1e-6))
    assert(math.abs(ranks.sum - 1.0) < 1e-9)
  }

  test("PageRank dangling vertex keeps total mass at 1") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L))) // 2 is dangling
    val r = PageRank.run(g, PageRankConfig(tol = 1e-10))
    val total = r.ranks.agg(org.apache.spark.sql.functions.sum("rank"))
      .first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("HashMin on a path labels everything 0 in diameter rounds") {
    val k = 6
    val g = graphOf(k + 1, (0 until k).map(i => (i.toLong, i + 1L)))
    val r = ConnectedComponents.run(g)
    val labels = r.labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    assert(labels.forall(_ == 0L))
    // min label travels one hop/round: k rounds + 1 fixpoint-detect round
    assert(r.rounds == k + 1)
  }

  test("CC: two components get min-vid labels exactly") {
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)))
    val r = ConnectedComponents.run(g)
    val labels = r.labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    assert(labels.toSeq == Seq(0L, 0L, 0L, 3L, 3L, 3L))
  }

  test("LPA: two 4-cliques joined by one edge -> per-clique min labels") {
    val c1 = for (i <- 0 until 4; j <- i + 1 until 4) yield (i.toLong, j.toLong)
    val c2 = for (i <- 4 until 8; j <- i + 1 until 8) yield (i.toLong, j.toLong)
    val g = graphOf(8, c1 ++ c2 :+ ((3L, 4L)))
    val r = LabelPropagation.run(g, maxRounds = 10)
    val labels = r.labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    assert(labels.take(4).forall(_ == 0L), s"clique1: ${labels.toSeq}")
    assert(labels.drop(4).forall(_ == 4L), s"clique2: ${labels.toSeq}")
  }

  test("Triangles: K3 counts 1, path counts 0, per-vertex exact") {
    val k3 = graphOf(3, Seq((0L, 1L), (1L, 2L), (0L, 2L)))
    val rk3 = Triangles.run(k3)
    assert(rk3.total == 1L)
    assert(rk3.perVertex.orderBy("vid").as[(Long, Long)].collect()
      .map(_._2).toSeq == Seq(1L, 1L, 1L))

    val path = graphOf(3, Seq((0L, 1L), (1L, 2L)))
    assert(Triangles.run(path).total == 0L)
  }

  test("Triangles: direction flips do not change the count") {
    val a = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 0L)))
    val b = graphOf(4, Seq((1L, 0L), (1L, 2L), (0L, 2L), (3L, 2L), (3L, 0L)))
    assert(Triangles.run(a).total == Triangles.run(b).total)
  }
}
