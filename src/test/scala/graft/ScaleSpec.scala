package graft

import org.apache.spark.sql.{functions => F}
import graft.algo._
import graft.gen.TranscriptGen
import graft.graph.GraphBuilder
import graft.scale.{Csr, Salting}

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  lazy val graph = {
    val turns = TranscriptGen.transcripts(spark, nConvs = 80, seed = 5).toDF()
    GraphBuilder.fromTranscripts(turns)
  }

  lazy val plainRanks: Array[Double] =
    PageRank.run(graph, PageRankConfig(tol = 1e-8))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)

  test("CSR block pack/unpack roundtrips the edge set exactly") {
    val edges = graph.edges.groupBy("src", "dst")
      .agg(F.sum("weight").as("weight"))
    val packed = Csr.pack(edges, 4)
    val back = Csr.unpack(packed)
    val a = edges.orderBy("src", "dst").as[(Long, Long, Double)].collect().toSeq
    val b = back.orderBy("src", "dst").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
    // block invariants
    packed.collect().foreach { blk =>
      assert(blk.offsets.length == blk.vids.length + 1)
      assert(blk.offsets.last == blk.nbrs.length)
      assert(blk.nbrs.length == blk.weights.length)
      assert(blk.vids.toSeq == blk.vids.sorted.toSeq)
    }
  }

  test("packed-adjacency PageRank == plain PageRank (1e-9)") {
    val packed = PageRank.run(graph, PageRankConfig(tol = 1e-8, packedAdjacency = true))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    plainRanks.zip(packed).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9, s"$a vs $b")
    }
  }

  test("hub splitting: a mega-hub packs into ceil(deg/K) bounded segment rows; parity holds") {
    import graft.graph.LinkGraph
    // hub 0 → 1..200 (degree 200) grafted onto a 200-chain: forces the
    // power-law shape packAdjacency must bound
    val hubDeg = 200
    val K = 16
    val edges = ((1 to hubDeg).map(i => (0L, i.toLong)) ++
      (1 until hubDeg).map(i => (i.toLong, i.toLong + 1)))
      .toDF("src", "dst")
      .select(F.col("src"), F.col("dst"), F.lit(1).as("kind"), F.lit(1.0).as("weight"))
    val dict = (0 to hubDeg).map(_.toLong).toDF("vid")
      .select(F.col("vid").cast("string").as("key"), F.col("vid"))
    val g = LinkGraph(edges, dict)

    val em = g.edges.select(F.col("src"), F.col("dst"), (F.col("weight") / 1.0).as("p"))
    val packed = Csr.packAdjacency(em, maxSegment = K)
    val hubRows = packed.where(F.col("src") === 0L)
      .select(F.col("dsts")).as[Seq[Long]].collect()
    assert(hubRows.length == (hubDeg + K - 1) / K,
      s"hub must split into ceil($hubDeg/$K) rows, got ${hubRows.length}")
    assert(hubRows.forall(_.size <= K), "no segment may exceed the cap")
    assert(hubRows.flatten.sorted.toSeq == (1 to hubDeg).map(_.toLong),
      "segments must be disjoint and cover the full neighbor set")
    // non-hub vertices stay single-row
    assert(packed.groupBy("src").count().where(F.col("count") > 1)
      .select("src").as[Long].collect().toSeq == Seq(0L))

    // and the split layout computes the same ranks as the plain one
    val plain = PageRank.run(g, PageRankConfig(tol = 1e-8))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    val split = PageRank.run(g, PageRankConfig(tol = 1e-8,
      packedAdjacency = true, packedSegment = K))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    plain.zip(split).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9, s"$a vs $b")
    }
  }

  test("salted PageRank == plain PageRank (1e-9), with real hot keys") {
    // force salting to actually engage on this small graph
    val salted = PageRank.run(graph, PageRankConfig(tol = 1e-8, salts = 4,
      hotQuantile = 0.8, hotMinDegree = 2.0))
      .ranks.orderBy("vid").as[(Long, Double)].collect().map(_._2)
    plainRanks.zip(salted).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9, s"$a vs $b")
    }
  }

  test("salting preserves the joined message multiset size") {
    val em = graph.edges.groupBy("src", "dst")
      .agg(F.sum("weight").as("w"))
    val deg = em.groupBy(F.col("src").as("vid"))
      .agg(F.sum("w").as("wdeg"))
    val hot = Salting.hotKeys(deg, 0.8, 2.0)
    assert(hot.count() > 0, "test graph must have hot keys for this test to bite")
    val state = graph.vertices.withColumnRenamed("vid", "src")
      .withColumn("rank", F.lit(1.0))
    val plainJoin = em.join(state, "src").count()
    val saltedJoin = Salting.saltEdges(em, hot, 4)
      .join(Salting.saltState(state, hot, 4, "src"), Seq("src", "salt")).count()
    assert(plainJoin == saltedJoin)
  }

  test("adaptive loop width: tiny states loop narrow; one shuffle per round at the narrow width") {
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(IterativeConf.adaptivePartitions(spark, 1L) == 1)
    assert(IterativeConf.adaptivePartitions(spark, IterativeConf.RowsPerPartition) == 1)
    assert(IterativeConf.adaptivePartitions(spark, IterativeConf.RowsPerPartition + 1) == 2)
    assert(IterativeConf.adaptivePartitions(spark, Long.MaxValue / 4) == P,
      "web-scale states must keep the session width")

    // a round planned at the adaptive width still pays exactly one exchange,
    // and that exchange is at the NARROW width (the d_dedup_clusters fix:
    // the CC fixpoint on a tiny dup graph must not pay P-wide scheduling)
    IterativeConf(spark, Some(2)) {
      val sym = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(
        graph.symmetrized.repartition(F.col("src")))
      // deliberately the REAL init shape (label/prev are bare aliases of the
      // partition key): FlatCheckpoint must collapse the alias
      // PartitioningCollection onto the SURVIVING loop key (vid), not onto
      // an alias the next round drops — pins the round-1 extra-shuffle fix
      val state = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(
        graph.vertices.repartition(F.col("vid"))
          .select(F.col("vid"), F.col("vid").as("label"), F.col("vid").as("prev")))
        .select("vid", "label")
      val msgs = sym.join(state.withColumnRenamed("vid", "src"), "src")
        .groupBy("dst").agg(F.min("label").as("nbr_min"))
      val plan = msgs.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
      assert(exchanges.length == 1, s"expected 1 shuffle, got $exchanges in:\n$plan")
      assert(exchanges.head.endsWith(", 2)"),
        s"the round's shuffle must run at the loop width 2: ${exchanges.head}")
      assert(state.rdd.getNumPartitions == 2)
    }
  }

  test("iteration plan shape: exactly ONE shuffle exchange per round") {
    IterativeConf(spark) {
      val ew = graph.edges.groupBy("src", "dst")
        .agg(F.sum("weight").as("w"))
      val wdeg = ew.groupBy("src").agg(F.sum("w").as("wdeg"))
      val emRows = ew.join(wdeg, "src").select(
        F.col("src"),
        F.col("dst"),
        (F.col("w") / F.col("wdeg")).as("p"))
      val em = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(
        emRows.repartition(F.col("src")))
      val vmeta = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(
        graph.vertices.repartition(F.col("vid"))
          .withColumn("has_out", F.lit(true)))
      val state0 = org.apache.spark.sql.graft.FlatCheckpoint.localCheckpoint(
        vmeta.select(F.col("vid"),
          F.lit(1.0).as("rank")))

      val msgs = em.join(state0.withColumnRenamed("vid", "src"), "src")
        .groupBy("dst")
        .agg(F.sum(
          F.col("p") * F.col("rank")).as("msum"))
        .withColumnRenamed("dst", "vid")
      val next = vmeta.join(msgs, Seq("vid"), "left")
        .join(state0.withColumnRenamed("rank", "prev"), "vid")

      val plan = next.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles == 1, s"expected 1 shuffle, got $shuffles in plan:\n$plan")
    }
  }
}
