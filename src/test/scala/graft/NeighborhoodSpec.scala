package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.algo._
import graft.graph.LinkGraph
import graft.io.ParquetManifestIO

/** Neighborhood function / harmonic centrality / HyperBall (round 5):
  *  - exact N(t) + harmonic vs an in-driver all-pairs BFS oracle
  *  - HyperBall estimate within HLL error of exact, monotone per t
  *  - both variants durable + resumable (interrupted == uninterrupted)
  */
class NeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-nhood-").toString

  def graphOf(n: Int, edges: Seq[(Long, Long)]): LinkGraph = {
    val e: DataFrame = edges.map { case (s, d) => (s, d, 1, 1.0) }
      .toDF("src", "dst", "kind", "weight")
    val dict = (0 until n).map(i => (s"v:$i", i.toLong)).toDF("key", "vid")
    LinkGraph(e, dict)
  }

  /** Seeded random digraph: n=60, ~2.5 out-edges/vertex. */
  private val n = 60
  private val rng = new scala.util.Random(505)
  private val edges: Seq[(Long, Long)] = (0 until n).flatMap { s =>
    (0 until 1 + rng.nextInt(3)).map(_ => (s.toLong, rng.nextInt(n).toLong))
  }.filter { case (s, d) => s != d }.distinct
  private val maxT = 4
  private lazy val dist = oracle.Oracles.bfsAll(n, edges, maxT)

  private def oracleCounts: Seq[(Int, Long)] =
    (0 to maxT).map(t =>
      (t, dist.iterator.map(_.count(d => d >= 0 && d <= t).toLong).sum))

  private def oracleHarmonic: Seq[(Long, Double)] =
    (0 until n).map { v =>
      val h = (0 until n).iterator
        .map(o => dist(o)(v)).filter(_ > 0).map(1.0 / _).sum
      (v.toLong, math.rint(h * 1e6) / 1e6)
    }

  test("exact N(t) matches the all-pairs BFS oracle for every t") {
    val r = Neighborhood.exact(graphOf(n, edges), maxT)
    val got = r.counts.as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got == oracleCounts)
  }

  test("harmonic centrality matches the BFS oracle (6 dp)") {
    val g = graphOf(n, edges)
    val r = Neighborhood.exact(g, maxT)
    val got = Neighborhood.harmonic(g, r.reach.get)
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    got.zip(oracleHarmonic).foreach { case ((gv, gh), (ov, oh)) =>
      assert(gv == ov && math.abs(gh - oh) <= 1e-6, s"v=$gv: $gh vs $oh")
    }
  }

  test("exact BFS is resumable: interrupted at t=2 + resume == uninterrupted") {
    val g = graphOf(n, edges)
    val dir = tmp()
    // interrupted run: stops after committing round 2
    Neighborhood.exact(g, 2,
      new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "nhood"))
    // resume from the same state table, finish the full horizon
    val resumed = Neighborhood.exact(g, maxT,
      new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "nhood"))
    val clean = Neighborhood.exact(g, maxT)
    assert(resumed.counts.as[(Int, Long)].collect().sortBy(_._1).toSeq ==
           clean.counts.as[(Int, Long)].collect().sortBy(_._1).toSeq)
    // the reach frames agree row for row (bit-identical distances)
    assert(resumed.reach.get.orderBy("o", "v").collect().toSeq ==
           clean.reach.get.orderBy("o", "v").collect().toSeq)
  }

  test("HyperBall estimates track exact N(t) within HLL error, monotone") {
    val g = graphOf(n, edges)
    val hb = Neighborhood.hyperball(g, maxT, lgK = 12)
    val est = hb.counts.as[(Int, Double)].collect().sortBy(_._1)
    val exact = oracleCounts
    // lgK=12 → rse ≈ 1.04/√4096 ≈ 1.6%; allow 5σ
    est.zip(exact).foreach { case ((t, e), (_, x)) =>
      assert(math.abs(e - x) <= 0.09 * x + 1.0, s"t=$t: est $e vs exact $x")
    }
    est.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b >= a - 1e-9, "estimates must be monotone in t")
    }
  }

  test("HyperBall is resumable: ledger recovers earlier rounds' estimates") {
    // cycle of length 8 → N(t) keeps growing until t=7: no early saturation
    val cn = 8
    val cyc = (0 until cn).map(i => (i.toLong, ((i + 1) % cn).toLong))
    val g = graphOf(cn, cyc)
    val dir = tmp()
    Neighborhood.hyperball(g, 2, lgK = 12,
      new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "hb"))
    val resumed = Neighborhood.hyperball(g, 5, lgK = 12,
      new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "hb"))
    val clean = Neighborhood.hyperball(g, 5, lgK = 12)
    // HLL register unions are order-independent → estimates are deterministic
    assert(resumed.counts.as[(Int, Double)].collect().sortBy(_._1).toSeq ==
           clean.counts.as[(Int, Double)].collect().sortBy(_._1).toSeq)
  }

  test("effective diameter: smallest t with N(t) ≥ q·N(maxT)") {
    // path 0→1→2→3: N = (4, 7, 9, 10); 0.9·10 = 9 → t = 2
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val r = Neighborhood.exact(g, 3)
    assert(Neighborhood.effectiveDiameter(r.counts, 0.9) == 2)
    assert(Neighborhood.effectiveDiameter(r.counts, 1.0) == 3)
  }

  test("flat tail: rounds after frontier dry-out stay at the saturated count") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L)))
    val r = Neighborhood.exact(g, 6) // diameter 2, horizon 6
    val got = r.counts.as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq == Seq(3L, 5L, 6L, 6L, 6L, 6L, 6L))
  }
}
