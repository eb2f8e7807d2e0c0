package graft.tools

import graft.GraftSession
import graft.algo._
import graft.gen.TranscriptGen
import graft.graph.GraphBuilder

/** Diagnostic: per-iteration wall clock of the PageRank loop — verifies the
  * stable-codegen / single-shuffle iteration contract empirically.
  * Run: sbt "runMain graft.tools.IterProbe [nConvs]"
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    // Arg forms: `IterProbe 200` (generated transcripts, local[4]) or
    // `IterProbe /root/testdata/sf0.1 32 10` (events graph, bench-like conf).
    val (g, spark, iters) =
      if (args.nonEmpty && args(0).startsWith("/")) {
        val cpus = if (args.length > 1) args(1).toInt else 32
        val it = if (args.length > 2) args(2).toInt else 10
        val s = GraftSession.build(s"local[$cpus]", "iter-probe", shufflePartitions = cpus)
        (GraphBuilder.fromEvents(s.read.parquet(s"${args(0)}/events.parquet")), s, it)
      } else {
        val nConvs = if (args.nonEmpty) args(0).toLong else 200L
        val s = GraftSession.build("local[4]", "iter-probe", shufflePartitions = 4)
        (GraphBuilder.fromTranscripts(TranscriptGen.transcripts(s, nConvs).toDF()), s, 25)
      }
    println(s"vertices=${g.numVertices} edges=${g.edges.count()}")
    val t0 = System.nanoTime()
    val r = PageRank.run(g, PageRankConfig(fixedIters = Some(iters)))
    val total = (System.nanoTime() - t0) / 1e9
    val walls = r.metricsLog.flatMap(_.get("wall_ms")).mkString(",")
    println(s"total=${total}s iters=${r.iterations} wall_ms_per_iter=[$walls]")

    // Show the iteration plan once for exchange-count inspection.
    spark.stop()
  }
}
