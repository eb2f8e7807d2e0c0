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
    // the per-vertex centrality accumulators ride the durable commits:
    // resume reproduces the uninterrupted HyperANF frame bit-identically
    def pv(r: Neighborhood.NhoodResult) = r.perVertex.get
      .select("vid", "reached_est", "harmonic_est", "sumdist_est",
        "closeness_est", "ecc_est")
      .as[(Long, Double, Double, Double, Double, Int)]
      .collect().sortBy(_._1).toSeq
    assert(pv(resumed) == pv(clean))
  }

  test("HyperANF per-vertex centralities are EXACT at coupon scale") {
    // balls ≤ 60 keep the lgK=12 sketch in coupon (list/set) mode, where
    // Datasketches estimates are exact — so the ball-delta derivation must
    // reproduce the BFS-oracle centralities to rounding (6 dp contract)
    val g = graphOf(n, edges)
    val in = Neighborhood.hyperball(g, maxT, lgK = 12)
    val hEst = in.perVertex.get.select("vid", "harmonic_est")
      .as[(Long, Double)].collect().sortBy(_._1)
    hEst.zip(oracleHarmonic).foreach { case ((gv, gh), (ov, oh)) =>
      assert(gv == ov && math.abs(gh - oh) <= 2e-6, s"v=$gv: $gh vs $oh")
    }
    // out-direction (reverse=true): closeness/ecc group by origin like
    // g_closeness/g_ecc
    val out = Neighborhood.hyperball(g, maxT, lgK = 12, reverse = true)
    val rows = out.perVertex.get
      .select("vid", "reached_est", "closeness_est", "ecc_est")
      .as[(Long, Double, Double, Int)].collect().sortBy(_._1)
    assert(rows.length == n)
    rows.foreach { case (v, r, c, e) =>
      val ds = dist(v.toInt).filter(_ >= 0)
      val reached = ds.length
      val sumd = ds.map(_.toLong).sum
      val cEx = if (sumd > 0)
        math.rint((reached - 1).toDouble / sumd * 1e6) / 1e6 else 0.0
      assert(r == reached.toDouble, s"v=$v reached: $r vs $reached")
      assert(math.abs(c - cEx) <= 1e-6, s"v=$v closeness: $c vs $cEx")
      assert(e == ds.max, s"v=$v ecc: $e vs ${ds.max}")
    }
  }

  test("HyperANF centralities track exact within HLL error at sketch scale") {
    // dense enough that t=3 balls exceed the lgK=8 coupon threshold → real
    // HLL estimation error. Deterministic (fixed seed + fixed HLL hash),
    // so the bands below are pinned, not flaky: 5σ-style per-vertex band
    // + a tight aggregate band (the N(t)-sum discipline).
    val bn = 1200
    val brng = new scala.util.Random(907)
    val bedges = (0 until bn).flatMap { s =>
      (0 until 6).map(_ => (s.toLong, brng.nextInt(bn).toLong))
    }.filter { case (s, d) => s != d }.distinct
    val bmaxT = 3
    val bd = oracle.Oracles.bfsAll(bn, bedges, bmaxT)
    val hb = Neighborhood.hyperball(graphOf(bn, bedges), bmaxT, lgK = 8)
    val est = hb.perVertex.get.select("vid", "harmonic_est")
      .as[(Long, Double)].collect().sortBy(_._1).map(_._2)
    val exact = (0 until bn).map { v =>
      (0 until bn).iterator.map(o => bd(o)(v)).filter(_ > 0).map(1.0 / _).sum
    }
    val sumEst = est.sum
    val sumEx = exact.sum
    assert(math.abs(sumEst - sumEx) <= 0.10 * sumEx,
      s"aggregate harmonic: $sumEst vs $sumEx")
    est.zip(exact).zipWithIndex.foreach { case ((e, x), v) =>
      assert(math.abs(e - x) <= 0.35 * x + 2.0, s"v=$v: est $e vs exact $x")
    }
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
