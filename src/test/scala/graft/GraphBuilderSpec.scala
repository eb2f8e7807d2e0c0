package graft

import java.sql.Timestamp

import graft.graph.GraphBuilder

/** FIXTURES.md §4 worked micro-example, hand-verified golden. */
class GraphBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def t(c: String, i: Int, r: String, tool: Option[String]): Turn =
    Turn(c, i, r, s"msg|$c|$i", tool, new Timestamp(1767225600000L + i * 7000L))

  private val turns = Seq(
    t("A", 0, "user", None), t("A", 1, "assistant", Some("grep")),
    t("A", 2, "user", None), t("A", 3, "assistant", Some("grep")),
    t("B", 0, "user", None), t("B", 1, "assistant", Some("bash")))

  test("micro golden: dictionary is dense, sorted, deterministic") {
    val g = GraphBuilder.fromTranscripts(turns.toDF())
    val dict = g.dict.orderBy("vid").as[(String, Long)].collect().toSeq
    assert(dict == Seq("conv:A" -> 0L, "conv:B" -> 1L, "role:user" -> 2L,
      "tool:bash" -> 3L, "tool:grep" -> 4L))
  }

  test("micro golden: weighted edge table matches FIXTURES.md §4") {
    val g = GraphBuilder.fromTranscripts(turns.toDF())
    val edges = g.edges.orderBy("src", "dst", "kind")
      .as[(Long, Long, Int, Double)].collect().toSet
    val expected = Set(
      (2L, 4L, 1, 2.0), // role:user -> tool:grep (A:0->1, A:2->3)
      (4L, 2L, 1, 1.0), // tool:grep -> role:user (A:1->2)
      (2L, 3L, 1, 1.0), // role:user -> tool:bash (B:0->1)
      (0L, 4L, 2, 2.0), // conv:A -> tool:grep (A:1, A:3)
      (1L, 3L, 2, 1.0)) // conv:B -> tool:bash (B:1)
    assert(edges == expected)
  }

  test("text column never enters the graph-side plan (column pruning)") {
    val g = GraphBuilder.fromTranscripts(turns.toDF())
    val plan = g.edges.queryExecution.optimizedPlan.toString
    assert(!plan.contains("text"), s"graph plan must prune `text`:\n$plan")
  }

  test("dictionary ids are input-order independent") {
    val shuffled = scala.util.Random.shuffle(turns)
    val g1 = GraphBuilder.fromTranscripts(turns.toDF())
    val g2 = GraphBuilder.fromTranscripts(shuffled.toDF().repartition(3))
    assert(g1.dict.orderBy("vid").collect().toSeq ==
           g2.dict.orderBy("vid").collect().toSeq)
    assert(g1.edges.orderBy("src", "dst", "kind").collect().toSeq ==
           g2.edges.orderBy("src", "dst", "kind").collect().toSeq)
  }
}
