package graft

import graft.algo._
import graft.gen.TranscriptGen
import graft.graph.GraphBuilder
import graft.oracle.Oracles

/** SURVEY.md §5.1 L1: every algorithm vs its plain-Scala oracle on the
  * skewed synthetic transcript graph — the judge's bar (scores allclose
  * 1e-6, labels exact) applied in-repo.
  */
class OracleParitySpec extends SparkSpec {
  import spark.implicits._

  // Zipf-skewed transcript graph, seed 42: hubs + chains, ~all algorithms'
  // interesting regimes in one graph.
  lazy val graph = {
    val turns = TranscriptGen.transcripts(spark, nConvs = 60, seed = 42).toDF()
    GraphBuilder.fromTranscripts(turns)
  }
  lazy val n = graph.numVertices.toInt
  lazy val weightedEdges: Seq[(Int, Int, Double)] =
    graph.edges.groupBy("src", "dst")
      .agg(org.apache.spark.sql.functions.sum("weight").as("w"))
      .as[(Long, Long, Double)].collect().toSeq
      .map { case (s, d, w) => (s.toInt, d.toInt, w) }
  lazy val undirected: Seq[(Int, Int)] =
    weightedEdges.map { case (s, d, _) => (s, d) }

  test("PageRank matches dense oracle, allclose 1e-6") {
    val got = PageRank.run(graph, PageRankConfig(tol = 1e-6))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    val want = Oracles.pageRank(n, weightedEdges, tol = 1e-6)
    assert(got.length == n)
    got.zip(want).zipWithIndex.foreach { case ((g, w), v) =>
      assert(math.abs(g - w) <= 1e-6, s"vid $v: got $g want $w")
    }
  }

  test("warm-start PageRank: prior fixpoint re-converges fast, survives graph growth") {
    import org.apache.spark.sql.{functions => F}
    val cfg = PageRankConfig(tol = 1e-8)
    val cold = PageRank.run(graph, cfg)
    assert(cold.converged)
    // same graph, seeded with its own fixpoint: converges immediately
    val warmSame = PageRank.run(graph, cfg, warmStart = Some(cold.ranks))
    assert(warmSame.converged && warmSame.iterations <= 3,
      s"warm restart took ${warmSame.iterations} rounds")
    cold.ranks.orderBy("vid").as[(Long, Double)].collect()
      .zip(warmSame.ranks.orderBy("vid").as[(Long, Double)].collect())
      .foreach { case ((v, a), (_, b)) => assert(math.abs(a - b) <= 1e-6, s"vid $v") }

    // grown graph (10% more conversations): dense ids REMAP when the
    // dictionary grows, so prior ranks re-attach via entity keys
    val g2 = GraphBuilder.fromTranscripts(
      TranscriptGen.transcripts(spark, nConvs = 66, seed = 42).toDF())
    val remapped = cold.ranks.join(graph.dict, "vid")
      .select(F.col("key"), F.col("rank"))
      .join(g2.dict, "key").select(F.col("vid"), F.col("rank"))
    val cold2 = PageRank.run(g2, cfg)
    val warm2 = PageRank.run(g2, cfg, warmStart = Some(remapped))
    assert(warm2.converged)
    assert(warm2.iterations <= cold2.iterations,
      s"warm ${warm2.iterations} > cold ${cold2.iterations}")
    cold2.ranks.orderBy("vid").as[(Long, Double)].collect()
      .zip(warm2.ranks.orderBy("vid").as[(Long, Double)].collect())
      .foreach { case ((v, a), (_, b)) => assert(math.abs(a - b) <= 1e-6, s"vid $v") }
  }

  test("warm-start CC: prior labels converge in fewer rounds with exact labels") {
    import org.apache.spark.sql.{functions => F}
    val cold = ConnectedComponents.run(graph)
    assert(cold.converged)
    // unchanged graph seeded with its own fixpoint: one verification round
    val warmSame = ConnectedComponents.run(graph, warmStart = Some(cold.labels))
    assert(warmSame.converged && warmSame.rounds <= 2)
    assert(warmSame.labels.orderBy("vid").collect().toSeq ==
      cold.labels.orderBy("vid").collect().toSeq)
    // append-only growth: remap prior labels via entity keys — labels are
    // VIDS, so map the label's old key to its new vid too
    val g2 = GraphBuilder.fromTranscripts(
      TranscriptGen.transcripts(spark, nConvs = 66, seed = 42).toDF())
    val oldKeyOf = graph.dict.select(F.col("key"), F.col("vid"))
    val remapped = cold.labels
      .join(oldKeyOf, "vid").select(F.col("key"), F.col("label"))
      .join(oldKeyOf.select(F.col("key").as("label_key"), F.col("vid").as("label")), "label")
      .join(g2.dict, "key").select(F.col("vid"), F.col("label_key"))
      .join(g2.dict.select(F.col("key").as("label_key"), F.col("vid").as("label")), "label_key")
      .select("vid", "label")
    val cold2 = ConnectedComponents.run(g2)
    val warm2 = ConnectedComponents.run(g2, warmStart = Some(remapped))
    assert(warm2.converged && warm2.rounds <= cold2.rounds,
      s"warm ${warm2.rounds} > cold ${cold2.rounds}")
    assert(warm2.labels.orderBy("vid").collect().toSeq ==
      cold2.labels.orderBy("vid").collect().toSeq)
  }

  test("PageRank fixed-iteration mode matches oracle step-for-step") {
    val got = PageRank.run(graph, PageRankConfig(fixedIters = Some(7)))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    val want = Oracles.pageRank(n, weightedEdges, fixedIters = Some(7))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) <= 1e-9) }
  }

  test("CC labels match union-find exactly") {
    val got = ConnectedComponents.run(graph)
      .labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    val want = Oracles.connectedComponents(n, undirected)
    assert(got.toSeq == want.toSeq)
  }

  test("star-contraction CC labels match union-find exactly") {
    val got = ConnectedComponents.runStar(graph)
      .labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    val want = Oracles.connectedComponents(n, undirected)
    assert(got.toSeq == want.toSeq)
  }

  test("LPA labels match synchronous oracle exactly") {
    val got = LabelPropagation.run(graph, maxRounds = 10)
      .labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    val want = Oracles.lpa(n, undirected, maxRounds = 10)
    assert(got.toSeq == want.toSeq)
  }

  test("Triangle counts match brute force exactly (global + per-vertex)") {
    val got = Triangles.run(graph)
    val (wantTotal, wantPer) = Oracles.triangles(n, undirected)
    assert(got.total == wantTotal)
    val gotPer = got.perVertex.orderBy("vid").as[(Long, Long)].collect().map(_._2)
    assert(gotPer.toSeq == wantPer.toSeq)
  }

  test("determinism: rank invariant under input row permutation") {
    val turns = TranscriptGen.transcripts(spark, nConvs = 30, seed = 7).toDF()
    val g1 = GraphBuilder.fromTranscripts(turns)
    val g2 = GraphBuilder.fromTranscripts(
      turns.orderBy(org.apache.spark.sql.functions.rand(123)).repartition(7))
    val r1 = PageRank.run(g1, PageRankConfig(tol = 1e-8))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    val r2 = PageRank.run(g2, PageRankConfig(tol = 1e-8))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    r1.zip(r2).foreach { case (a, b) => assert(math.abs(a - b) <= 1e-9) }
  }
}
