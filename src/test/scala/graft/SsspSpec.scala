package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.algo._
import graft.graph.LinkGraph
import graft.io.ParquetManifestIO

/** Weighted shortest paths (round 5): Bellman-Ford relaxation vs an
  * in-driver Dijkstra oracle on random weighted digraphs, hop-truncated
  * semantics, per-kind cost mapping, and the durable resume contract. */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def graphOf(n: Int, edges: Seq[(Long, Long, Int)]): LinkGraph = {
    // kind 1 → cost 1, kind 2 → cost 2 (ShortestPaths.KindCost)
    val e: DataFrame = edges.map { case (s, d, c) => (s, d, c, 1.0) }
      .toDF("src", "dst", "kind", "weight")
    val dict = (0 until n).map(i => (s"v:$i", i.toLong)).toDF("key", "vid")
    LinkGraph(e, dict)
  }

  /** Dijkstra from one source over integer costs; Int.MaxValue = unreached. */
  private def dijkstra(n: Int, adj: Map[Long, Seq[(Long, Int)]], src: Long): Array[Int] = {
    val dist = Array.fill(n)(Int.MaxValue)
    dist(src.toInt) = 0
    val pq = scala.collection.mutable.PriorityQueue.empty[(Int, Long)](
      Ordering.by[(Int, Long), Int](_._1).reverse)
    pq.enqueue((0, src))
    while (pq.nonEmpty) {
      val (d0, v) = pq.dequeue()
      if (d0 == dist(v.toInt))
        adj.getOrElse(v, Nil).foreach { case (w, c) =>
          if (d0 + c < dist(w.toInt)) { dist(w.toInt) = d0 + c; pq.enqueue((d0 + c, w)) }
        }
    }
    dist
  }

  test("Bellman-Ford == Dijkstra oracle on random weighted digraphs (exact horizon)") {
    Seq(7, 19).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 40
      val edges = (0 until 160).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1 + rng.nextInt(2))
      }.distinct.filter(e => e._1 != e._2)
      val g = graphOf(n, edges)
      // parallel (src,dst) under both costs must collapse to the cheaper —
      // exercised because distinct is on the triple, not the pair
      val adj = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.groupBy(_._2).map { case (d, cs) => (d, cs.map(_._3).min) }.toSeq
      }
      val srcs = (0L until n.toLong).filter(_ % 5 == 0)
      val r = ShortestPaths.run(g, srcs.toDF("vid"), maxRounds = n)
      assert(r.converged)
      val got = r.dists.as[(Long, Long, Int)].collect()
        .map { case (o, v, d) => (o, v) -> d }.toMap
      srcs.foreach { o =>
        val want = dijkstra(n, adj, o)
        (0 until n).foreach { v =>
          val w = if (want(v) == Int.MaxValue) None else Some(want(v))
          assert(got.get((o, v.toLong)) == w, s"seed $seed o=$o v=$v")
        }
      }
    }
  }

  test("hop truncation: maxRounds bounds the path LENGTH, not the cost") {
    // chain 0 -c1-> 1 -c1-> 2 -c1-> 3 plus a costly shortcut 0 -c2*2-> 3
    // (two kind-2 hops via 9): with 3 rounds the cheap 3-hop path (cost 3)
    // wins; with 1 round nothing reaches 3; with 2 rounds only the
    // shortcut (cost 4) is visible — exactly the ≤-R-edges contract.
    val edges = Seq((0L, 1L, 1), (1L, 2L, 1), (2L, 3L, 1), (0L, 9L, 2), (9L, 3L, 2))
    val g = graphOf(10, edges)
    val o = Seq(0L).toDF("vid")
    def distTo3(r: ShortestPaths.SsspResult): Option[Int] =
      r.dists.where(F.col("v") === 3).as[(Long, Long, Int)].collect()
        .headOption.map(_._3)
    assert(distTo3(ShortestPaths.run(g, o, maxRounds = 1)).isEmpty)
    assert(distTo3(ShortestPaths.run(g, o, maxRounds = 2)).contains(4))
    assert(distTo3(ShortestPaths.run(g, o, maxRounds = 3)).contains(3))
  }

  test("durable sssp: interrupted + resumed == uninterrupted (bit-identical)") {
    val rng = new scala.util.Random(23)
    val n = 30
    val edges = (0 until 120).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1 + rng.nextInt(2))
    }.distinct.filter(e => e._1 != e._2)
    val g = graphOf(n, edges)
    val origins = Seq(0L, 7L, 14L).toDF("vid")
    val clean = ShortestPaths.run(g, origins, maxRounds = 10)
      .dists.orderBy("o", "v").as[(Long, Long, Int)].collect().toSeq

    val dir = Files.createTempDirectory("graft-sssp-").toString
    // "interrupt" after 2 rounds: a capped run committing to the manifest
    ShortestPaths.run(g, origins, maxRounds = 2,
      mat = new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "sssp"))
    val resumed = ShortestPaths.run(g, origins, maxRounds = 10,
      mat = new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "sssp"))
    assert(resumed.converged)
    assert(resumed.dists.orderBy("o", "v").as[(Long, Long, Int)].collect().toSeq == clean)
    // and it genuinely resumed: the manifest's latest committed round > 2
    val io = new ParquetManifestIO(spark, dir)
    assert(io.latest("sssp").exists(_ > 2), s"latest=${io.latest("sssp")}")
  }
}
