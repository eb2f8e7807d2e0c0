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
    val nConvs = if (args.nonEmpty) args(0).toLong else 200L
    val spark = GraftSession.build("local[4]", "iter-probe", shufflePartitions = 4)
    val g = GraphBuilder.fromTranscripts(TranscriptGen.transcripts(spark, nConvs).toDF())
    println(s"vertices=${g.numVertices} edges=${g.edges.count()}")
    val t0 = System.nanoTime()
    val r = PageRank.run(g, PageRankConfig(fixedIters = Some(25)))
    val total = (System.nanoTime() - t0) / 1e9
    val walls = r.metricsLog.flatMap(_.get("wall_ms")).mkString(",")
    println(s"total=${total}s iters=${r.iterations} wall_ms_per_iter=[$walls]")

    // Show the iteration plan once for exchange-count inspection.
    spark.stop()
  }
}
