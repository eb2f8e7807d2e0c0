package graft

import org.apache.spark.sql.{functions => F}

import graft.algo.{PageRank, PageRankConfig}
import graft.gen.TranscriptGen
import graft.graph.GraphBuilder
import graft.plans.GraftPlans
import graft.scale.Csr

/** The custom whole-operator plan path (LogicalPlan + Rule + Strategy +
  * SparkPlan): CSR message expansion must be bitwise-equal to the
  * explode(zip_with(...)) composition it replaces, plan as CsrExpandExec,
  * prune the child join's unused columns, and keep packed PageRank equal
  * to the plain layout. */
class CsrExpandSpec extends SparkSpec {
  import spark.implicits._

  lazy val graph = GraphBuilder.fromTranscripts(
    TranscriptGen.transcripts(spark, nConvs = 60, seed = 42).toDF())

  private def packedJoined = {
    val ew = graph.edges.groupBy("src", "dst").agg(F.sum("weight").as("w"))
    val wdeg = ew.groupBy("src").agg(F.sum("w").as("wdeg"))
    val emRows = ew.join(wdeg, "src")
      .select(F.col("src"), F.col("dst"), (F.col("w") / F.col("wdeg")).as("p"))
    val st = graph.vertices.select(F.col("vid").as("src"),
      (F.col("vid") * 0.001 + 0.5).as("rank")) // deterministic non-trivial state
    Csr.packAdjacency(emRows).join(st, "src")
  }

  test("CsrExpand == explode(zip_with(...)) bitwise; plans as CsrExpandExec") {
    val joined = packedJoined.localCheckpoint(true)
    val got = GraftPlans.expandMessages(joined)
      .orderBy("dst", "c").as[(Long, Double)].collect().toSeq
    val want = joined
      .select(F.explode(F.expr(
        "zip_with(dsts, ps, (d, pp) -> struct(d AS dst, pp * rank AS c))")).as("m"))
      .select(F.col("m.dst").as("dst"), F.col("m.c").as("c"))
      .orderBy("dst", "c").as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // physical rendering strips the Exec suffix — assert on the node CLASS
    val exec = GraftPlans.expandMessages(joined).queryExecution.executedPlan
    assert(exec.collect { case e: graft.plans.CsrExpandExec => e }.nonEmpty,
      s"custom operator not planned:\n$exec")
  }

  test("CsrExpandExec fuses INTO whole-stage codegen; interpreted fallback agrees") {
    val joined = packedJoined.localCheckpoint(true)
    val df = GraftPlans.expandMessages(joined)
    // the operator must live inside a WholeStageCodegen span (joined scan →
    // expand → downstream all one generated function), not break it
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.exists(_.collect { case e: graft.plans.CsrExpandExec => e }.nonEmpty),
      s"CsrExpandExec not inside WholeStageCodegen:\n${df.queryExecution.executedPlan}")
    // and the generated loop must agree with the interpreted doExecute path
    val gen = df.orderBy("dst", "c").as[(Long, Double)].collect().toSeq
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      GraftPlans.expandMessages(joined)
        .orderBy("dst", "c").as[(Long, Double)].collect().toSeq
    }
    assert(gen.nonEmpty && gen == interp)
    // CopyLabel kernel too
    val packed = Csr.packAdjacencyKeys(graph.symmetrized)
    val st = graph.vertices.select(F.col("vid").as("src"), (F.col("vid") * 7 + 3).as("label"))
    val lj = packed.join(st, "src").localCheckpoint(true)
    val genL = GraftPlans.expandLabels(lj)
      .orderBy("dst", "label").as[(Long, Long)].collect().toSeq
    val interpL = withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      GraftPlans.expandLabels(lj)
        .orderBy("dst", "label").as[(Long, Long)].collect().toSeq
    }
    assert(genL.nonEmpty && genL == interpL)
  }

  private def withSQLConf[T](kv: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("pruning rule drops the join key under CsrExpand") {
    val optimized = GraftPlans.expandMessages(packedJoined)
      .queryExecution.optimizedPlan.toString
    // the src join key feeds the join but must not survive INTO CsrExpand
    val expandLine = optimized.linesIterator.find(_.contains("CsrExpand")).get
    assert(!expandLine.contains("src"), s"src not pruned:\n$optimized")
  }

  test("CopyLabel mode == explode(dsts) bitwise; plans as CsrExpandExec") {
    val packed = Csr.packAdjacencyKeys(graph.symmetrized)
    val st = graph.vertices.select(F.col("vid").as("src"), (F.col("vid") * 3 + 1).as("label"))
    val joined = packed.join(st, "src").localCheckpoint(true)
    val got = GraftPlans.expandLabels(joined)
      .orderBy("dst", "label").as[(Long, Long)].collect().toSeq
    val want = joined.select(F.explode(F.col("dsts")).as("dst"), F.col("label"))
      .orderBy("dst", "label").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == want)
    val exec = GraftPlans.expandLabels(joined).queryExecution.executedPlan
    assert(exec.collect {
      case e: graft.plans.CsrExpandExec if e.mode == graft.plans.CsrExpandMode.CopyLabel => e
    }.nonEmpty, s"CopyLabel operator not planned:\n$exec")
  }

  test("packed CC == row-path CC exactly (hub-split segments)") {
    val row = graft.algo.ConnectedComponents.run(graph)
      .labels.orderBy("vid").as[(Long, Long)].collect().toSeq
    val packed = graft.algo.ConnectedComponents.run(graph,
      packedAdjacency = true, packedSegment = 8) // force splitting
      .labels.orderBy("vid").as[(Long, Long)].collect().toSeq
    assert(row == packed)
  }

  test("packed LPA == row-path LPA exactly (hub-split segments)") {
    val row = graft.algo.LabelPropagation.run(graph, maxRounds = 5)
      .labels.orderBy("vid").as[(Long, Long)].collect().toSeq
    val packed = graft.algo.LabelPropagation.run(graph, maxRounds = 5,
      packedAdjacency = true, packedSegment = 8)
      .labels.orderBy("vid").as[(Long, Long)].collect().toSeq
    assert(row == packed)
  }

  test("packed PageRank through the custom operator == plain layout, 1e-9") {
    val plain = PageRank.run(graph, PageRankConfig(fixedIters = Some(8)))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    val packed = PageRank.run(graph, PageRankConfig(fixedIters = Some(8), packedAdjacency = true))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    plain.zip(packed).foreach { case (a, b) => assert(math.abs(a - b) <= 1e-9) }
  }
}
