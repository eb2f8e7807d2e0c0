package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.algo._
import graft.graph.LinkGraph
import graft.io.ParquetManifestIO

/** Landmark (hub) distance labels vs the all-pairs BFS oracle (round 5):
  * labels ARE BFS distances from/to the landmarks; the query bound is an
  * upper bound on true distance, exact through landmarks, and matches the
  * oracle-side min-over-hubs replication; the label build is resumable.
  */
class HubLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-hub-").toString

  def graphOf(n: Int, edges: Seq[(Long, Long)]): LinkGraph = {
    val e: DataFrame = edges.map { case (s, d) => (s, d, 1, 1.0) }
      .toDF("src", "dst", "kind", "weight")
    val dict = (0 until n).map(i => (s"v:$i", i.toLong)).toDF("key", "vid")
    LinkGraph(e, dict)
  }

  private val n = 60
  private val rng = new scala.util.Random(707)
  private val edges: Seq[(Long, Long)] = (0 until n).flatMap { s =>
    (0 until 1 + rng.nextInt(3)).map(_ => (s.toLong, rng.nextInt(n).toLong))
  }.filter { case (s, d) => s != d }.distinct
  private val L = 5
  private val maxT = 6

  private lazy val g = graphOf(n, edges)
  private lazy val dist = oracle.Oracles.bfsAll(n, edges, maxT)
  private lazy val rdist = oracle.Oracles.bfsAll(n, edges.map(_.swap), maxT)
  private lazy val labels = HubLabels.build(g, L, maxT)
  private lazy val lms: Seq[Long] =
    labels.landmarks.as[Long].collect().toSeq.sorted

  test("landmark selection: top-L by degree, ties to smaller vid") {
    val deg = new Array[Int](n)
    edges.foreach { case (s, d) => deg(s.toInt) += 1; deg(d.toInt) += 1 }
    val want = (0 until n).sortBy(v => (-deg(v), v)).take(L).map(_.toLong).sorted
    assert(lms == want)
  }

  test("labelsIn are exact BFS distances hub→v; labelsOut exact v→hub") {
    val in = labels.labelsIn.as[(Long, Long, Int)].collect()
    assert(in.nonEmpty)
    in.foreach { case (vid, hub, d) =>
      assert(dist(hub.toInt)(vid.toInt) == d, s"in: hub=$hub v=$vid") }
    val out = labels.labelsOut.as[(Long, Long, Int)].collect()
    out.foreach { case (vid, hub, d) =>
      assert(rdist(hub.toInt)(vid.toInt) == d, s"out: v=$vid hub=$hub") }
    // completeness: every reachable (hub, v) pair within maxT has a label
    val inSet = in.map { case (v, h, _) => (h, v) }.toSet
    for (h <- lms; v <- 0 until n if dist(h.toInt)(v) >= 0)
      assert(inSet.contains((h, v.toLong)), s"missing in-label ($h, $v)")
  }

  test("dist_ub is a sound upper bound and equals min-over-hubs replication") {
    val pairs = (for (u <- 0 until n; v <- 0 until n) yield (u.toLong, v.toLong))
      .toDF("u", "v")
    val got = HubLabels.distances(pairs, labels)
      .select("u", "v", "dist_ub")
      .as[(Long, Long, Int)].collect().map { case (u, v, d) => ((u, v), d) }.toMap
    val want = (for {
      u <- 0 until n; v <- 0 until n
      ds = lms.flatMap { h =>
        val a = rdist(h.toInt)(u); val b = dist(h.toInt)(v)
        if (a >= 0 && b >= 0) Some(a + b) else None
      }
      if ds.nonEmpty
    } yield ((u.toLong, v.toLong), ds.min)).toMap
    assert(got == want)
    // soundness: never below the true distance when the true distance exists
    want.foreach { case ((u, v), ub) =>
      val t = dist(u.toInt)(v.toInt)
      if (t >= 0) assert(ub >= t, s"($u,$v): ub $ub < true $t")
    }
    // exactness through landmarks: u or v a landmark → bound is tight
    lms.foreach { h =>
      (0 until n).foreach { v =>
        val t = dist(h.toInt)(v)
        if (t >= 0) assert(got((h, v.toLong)) == t, s"hub-origin ($h,$v)")
      }
    }
  }

  test("label build is resumable: partial forward BFS + resume == clean") {
    val dir = tmp()
    val lm = HubLabels.landmarks(g, L)
    // interrupted forward run: two rounds only, committed durably
    Neighborhood.bfsFrom(g, lm, 2, reverse = false,
      new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "hubf"))
    // build resumes the forward side from the same state table
    val resumed = HubLabels.build(g, L, maxT,
      matFwd = new CheckpointMaterializer(new ParquetManifestIO(spark, dir), "hubf"))
    def canon(df: DataFrame) =
      df.orderBy("vid", "hub").as[(Long, Long, Int)].collect().toSeq
    assert(canon(resumed.labelsIn) == canon(labels.labelsIn))
    assert(canon(resumed.labelsOut) == canon(labels.labelsOut))
  }
}
