package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.algo._
import graft.gen.TranscriptGen
import graft.graph.GraphBuilder
import graft.oracle.Oracles

/** SURVEY.md §5.1 L2 property layer (seed-parameterized; sizes kept small
  * so the whole suite stays fast).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  val seeds = Seq(1L, 7L, 23L, 101L)

  test("per-turn text equality under stable ordering survives ingest/repartition") {
    seeds.foreach { seed =>
      val turns = TranscriptGen.transcripts(spark, nConvs = 25, seed = seed).toDF()
      val dir = java.nio.file.Files.createTempDirectory(s"graft-txt-$seed").toString
      // ingest path: write, read back, shuffle hard
      turns.repartition(7).write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).repartition(3, F.col("role"))
      // stable (conv_id, turn_idx) ordering: texts re-attach exactly
      val joined = turns.as("a").join(back.as("b"),
        F.col("a.conv_id") === F.col("b.conv_id") &&
        F.col("a.turn_idx") === F.col("b.turn_idx"))
      val n = turns.count()
      assert(joined.count() == n, "join must be 1:1 (turn_idx unique per conv)")
      assert(joined.where(F.col("a.text") =!= F.col("b.text")).count() == 0)
      // self-describing texts: content encodes its own (conv_id, turn_idx)
      val bad = back.where(
        !F.col("text").startsWith(F.concat(F.lit("msg|"), F.col("conv_id"),
          F.lit("|"), F.col("turn_idx"), F.lit("|")))).count()
      assert(bad == 0)
    }
  }

  test("turn_idx is unique per conversation (generator invariant)") {
    seeds.foreach { seed =>
      val turns = TranscriptGen.transcripts(spark, nConvs = 40, seed = seed).toDF()
      val dups = turns.groupBy("conv_id", "turn_idx").count()
        .where(F.col("count") > 1).count()
      assert(dups == 0)
    }
  }

  test("CC == union-find for all seeds (exact)") {
    seeds.foreach { seed =>
      val g = GraphBuilder.fromTranscripts(
        TranscriptGen.transcripts(spark, nConvs = 20, seed = seed).toDF())
      val n = g.numVertices.toInt
      val und = g.edges.select("src", "dst").as[(Long, Long)].collect()
        .map { case (a, b) => (a.toInt, b.toInt) }.toSeq
      val got = ConnectedComponents.run(g)
        .labels.orderBy("vid").as[(Long, Long)].collect().map(_._2)
      assert(got.toSeq == Oracles.connectedComponents(n, und).toSeq, s"seed $seed")
    }
  }

  test("rank mass conservation: sum(rank) == 1 every run") {
    seeds.take(2).foreach { seed =>
      val g = GraphBuilder.fromTranscripts(
        TranscriptGen.transcripts(spark, nConvs = 20, seed = seed).toDF())
      val r = PageRank.run(g, PageRankConfig(fixedIters = Some(6)))
      val total = r.ranks.agg(F.sum("rank")).first().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"seed $seed: $total")
      // the metrics ledger agrees
      val last = r.metricsLog.last
      assert(math.abs(last("rank_total").toString.toDouble - 1.0) < 1e-9)
    }
  }

  test("triangle count invariant under edge direction flips (all seeds)") {
    seeds.take(2).foreach { seed =>
      val g = GraphBuilder.fromTranscripts(
        TranscriptGen.transcripts(spark, nConvs = 20, seed = seed).toDF())
      val flipped = graft.graph.LinkGraph(
        g.edges.select(
          F.when(F.pmod(F.col("src") + F.col("dst"), F.lit(2)) === 0, F.col("dst"))
            .otherwise(F.col("src")).as("src"),
          F.when(F.pmod(F.col("src") + F.col("dst"), F.lit(2)) === 0, F.col("src"))
            .otherwise(F.col("dst")).as("dst"),
          F.col("kind"), F.col("weight")),
        g.dict)
      assert(Triangles.run(g).total == Triangles.run(flipped).total, s"seed $seed")
    }
  }
}
