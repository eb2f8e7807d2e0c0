package graft

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.algo.Betweenness
import graft.graph.LinkGraph

/** Hop-bounded sampled-source betweenness (round 5) vs an in-driver
  * Brandes oracle (BFS + path counting + dependency accumulation,
  * truncated at the same horizon) on random digraphs and hand graphs. */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private def lg(n: Int, edges: Seq[(Long, Long)]): LinkGraph = {
    val e: DataFrame = edges.map { case (s, d) => (s, d, 1, 1.0) }
      .toDF("src", "dst", "kind", "weight")
    val dict = (0 until n).map(i => (s"v:$i", i.toLong)).toDF("key", "vid")
    LinkGraph(e, dict)
  }

  /** Truncated Brandes from one source: returns δ_s(v) for all v ≠ s. */
  private def brandes(n: Int, adj: Map[Long, Seq[Long]], s: Long, maxT: Int): Array[Double] = {
    val dist = Array.fill(n)(-1)
    val sigma = Array.fill(n)(0.0)
    val delta = Array.fill(n)(0.0)
    var order = List.empty[Int] // reverse BFS order
    dist(s.toInt) = 0; sigma(s.toInt) = 1.0
    var frontier = List(s.toInt)
    var t = 0
    while (frontier.nonEmpty && t < maxT) {
      t += 1
      val next = scala.collection.mutable.LinkedHashSet.empty[Int]
      for (u <- frontier; v <- adj.getOrElse(u.toLong, Nil).map(_.toInt)) {
        if (dist(v) == -1 || dist(v) == t) {
          if (dist(v) == -1) { dist(v) = t; next += v }
          sigma(v) += sigma(u)
        }
      }
      order = next.toList reverse_::: order
      frontier = next.toList
    }
    // deepest-first accumulation (order is already deepest-first);
    // vertices AT the horizon keep δ = 0 — nothing past maxT was explored
    for (w <- order; u <- 0 until n)
      if (dist(u) == dist(w) - 1 && adj.getOrElse(u.toLong, Nil).contains(w.toLong))
        delta(u) += sigma(u) / sigma(w) * (1.0 + delta(w))
    delta(s.toInt) = 0.0
    delta
  }

  private def check(n: Int, edges: Seq[(Long, Long)], stride: Int, maxT: Int): Unit = {
    val de = edges.filter(e => e._1 != e._2).distinct
    val adj = de.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).distinct }
    val sources = (0L until n.toLong).filter(_ % stride == 0)
    val want = Array.fill(n)(0.0)
    sources.foreach { s =>
      val d = brandes(n, adj, s, maxT)
      (0 until n).foreach { v => if (v.toLong != s) want(v) += d(v) }
    }
    val got = Betweenness.run(lg(n, edges), sources.toDF("vid"), maxT)
      .as[(Long, Double)].collect().toMap
    (0 until n).foreach { v =>
      val w = BigDecimal(want(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(v.toLong) - w) < 1e-6, s"v=$v got ${got(v.toLong)} want $w")
    }
  }

  test("diamond: middle vertices split the dependency, score 0.5 each") {
    // 0→1→3, 0→2→3: σ(3)=2, δ(1)=δ(2)=0.5, endpoints 0
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val got = Betweenness.run(lg(4, edges), Seq(0L).toDF("vid"), 4)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5, 3L -> 0.0))
  }

  test("chain: interior vertices accumulate downstream mass") {
    // 0→1→2→3 from source 0: δ(2)=1 (for 3), δ(1)=1+δ(2)=2
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = Betweenness.run(lg(4, edges), Seq(0L).toDF("vid"), 4)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 0.0, 1L -> 2.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("horizon truncation: paths beyond maxT carry no mass") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = Betweenness.run(lg(4, edges), Seq(0L).toDF("vid"), 2)
      .as[(Long, Double)].collect().toMap
    // only 0→1→2 visible: δ(1)=1 (for 2); 3 unreached
    assert(got == Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("Brandes oracle parity on random digraphs, multiple sources") {
    Seq(5, 17, 29).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 30
      val edges = (0 until 110).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }
      check(n, edges, stride = 4, maxT = 4)
    }
  }

  test("Brandes oracle parity at property scale (n=200, 800 edges)") {
    val rng = new scala.util.Random(41)
    val n = 200
    val edges = (0 until 800).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
    }
    check(n, edges, stride = 10, maxT = 6)
  }

  test("Brandes oracle parity with full horizon (exact betweenness from the sample)") {
    val rng = new scala.util.Random(11)
    val n = 24
    val edges = (0 until 80).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
    }
    check(n, edges, stride = 3, maxT = n)
  }
}
