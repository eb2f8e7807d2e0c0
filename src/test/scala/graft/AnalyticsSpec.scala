package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.queries.{GraphQueries, PipelineQueries}

/** Round-5 analytics operators: degree distribution, assortativity, and
  * Adamic-Adar link prediction against in-driver brute-force oracles on
  * the real sf0.001 graph; PII pattern counts against crafted documents
  * and a Java-regex replay; per-source stats against a driver rollup. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def undOf(d: String): Map[Long, Set[Long]] = {
    val g = GraphQueries.graph(spark, d)
    val e = g.edges.where(F.col("src") =!= F.col("dst"))
      .select("src", "dst").as[(Long, Long)].collect()
    val sym = e.flatMap { case (s, dd) => Seq((s, dd), (dd, s)) }.toSet
    sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
  }

  /** Undirected simple adjacency of the events graph, collected. */
  private lazy val und: Map[Long, Set[Long]] = undOf(dir)

  /** Mirror of GraphQueries.aaAnchors (round 6): the first AaCount vids
    * among the stride multiples OF THE VERTEX SET (not just vertices with
    * undirected edges — an isolated anchor consumes a slot and emits no
    * rows, and the brute force must agree on which anchors made the cut). */
  private def anchorsOf(d: String): Seq[Long] =
    GraphQueries.graph(spark, d).vertices.select("vid").as[Long]
      .collect().sorted.filter(_ % GraphQueries.AaStride == 0)
      .take(GraphQueries.AaCount).toSeq

  test("g_degdist == driver histogram, and totals cover every vertex") {
    val nVerts = GraphQueries.graph(spark, dir).numVertices
    val got = GraphQueries.queries("g_degdist")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    val want = (0L until nVerts).map(v => und.getOrElse(v, Set.empty).size.toLong)
      .groupBy(identity).map { case (d, vs) => (d, vs.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.map(_._2).sum == nVerts)
  }

  test("g_assortativity == driver Pearson over exact integer moments") {
    val pairs = for {
      (u, ns) <- und.toSeq; v <- ns.toSeq // toSeq: a Set would dedup equal degree pairs
    } yield (und(u).size.toLong, und(v).size.toLong)
    val n = pairs.size.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val want = BigDecimal((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = GraphQueries.queries("g_assortativity")(spark, dir)
      .as[(Long, Double)].collect().head
    assert(row._1 == n)
    assert(math.abs(row._2 - want) < 1e-9, s"got ${row._2} want $want")
  }

  test("g_adamic_adar == brute-force 2-hop scores with existing-edge exclusion") {
    val got = GraphQueries.queries("g_adamic_adar")(spark, dir)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    // brute force over the same fixed-count anchor set
    val anchors = anchorsOf(dir).filter(und.contains)
    val want = anchors.flatMap { u =>
      val scores = scala.collection.mutable.Map.empty[Long, (Long, Double)]
      for (w <- und(u) if und(w).size > 1; v <- und(w) if v != u && !und(u).contains(v)) {
        val (c, s) = scores.getOrElse(v, (0L, 0.0))
        scores(v) = (c + 1, s + 1.0 / math.log(und(w).size.toDouble))
      }
      scores.toSeq
        .map { case (v, (c, s)) =>
          (v, c, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (v, _, s) => (-s, v) }
        .take(GraphQueries.AaK).zipWithIndex
        .map { case ((v, c, s), i) => (u, i + 1, v, c, s) }
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"row mismatch: got $g want $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"score: got $g want $w")
    }
  }

  test("d_pii_counts finds crafted emails/urls/digit runs; clean docs stay clean") {
    val tmp = Files.createTempDirectory("graft-pii-").toString
    Seq(
      (0L, "contact alice.smith+x@example.org or bob@sub.domain.co today", "en", "web", 58L),
      (1L, "see https://example.com/a/b_c-d and http://x.org/p for details", "en", "web", 62L),
      (2L, "call 12345678 ref 999123456789 end", "en", "web", 34L),
      (3L, "a perfectly clean document with short numbers 123 456", "en", "web", 53L),
      (4L, "mixed a@b.io https://e.f/g 76543210", "en", "web", 35L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = PipelineQueries.dPiiCounts(spark, tmp)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, 0L, true),
      (1L, 0L, 2L, 0L, true),
      (2L, 0L, 0L, 2L, true),
      (3L, 0L, 0L, 0L, false),
      (4L, 1L, 1L, 1L, true)))
  }

  test("d_pii_counts == Java-regex replay on the real corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      (id,
        PipelineQueries.PiiEmailRe.r.findAllIn(t).size.toLong,
        PipelineQueries.PiiUrlRe.r.findAllIn(t).size.toLong,
        PipelineQueries.PiiDigitsRe.r.findAllIn(t).size.toLong)
    }.sortBy(_._1).toSeq
    val got = PipelineQueries.dPiiCounts(spark, dir)
      .select("doc_id", "n_emails", "n_urls", "n_digit_runs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("g_reciprocity == driver count over directed distinct pairs") {
    val de = GraphQueries.graph(spark, dir).directed
      .where(F.col("src") =!= F.col("dst"))
      .as[(Long, Long)].collect().toSet
    val n = de.size.toLong
    val rec = de.count { case (s, d) => de.contains((d, s)) }.toLong
    val want = (n, rec,
      BigDecimal(rec.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = GraphQueries.queries("g_reciprocity")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(got == want)
  }

  test("g_effdiam == Neighborhood.effectiveDiameter at both quantiles") {
    val counts = GraphQueries.nhood(spark, dir).counts
    val total = counts.agg(F.max("pairs")).as[Long].collect().head
    val got = GraphQueries.queries("g_effdiam")(spark, dir)
      .as[(Double, Int, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0.5, 0.9))
    got.foreach { case (q, eff, tot) =>
      assert(tot == total)
      assert(eff == graft.algo.Neighborhood.effectiveDiameter(counts, q), s"q=$q")
    }
  }

  test("d_redact replaces crafted PII in order; counts match dPiiCounts totals") {
    val tmp = Files.createTempDirectory("graft-redact-").toString
    Seq(
      (0L, "mail a.b@example.org then visit https://x.io/p?z=1 ref 987654321 done", "en", "web", 68L),
      (1L, "clean text only", "en", "web", 15L),
      (2L, "url with digits https://host/a/123456789/b stays one token", "en", "web", 58L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = PipelineQueries.dRedact(spark, tmp)
      .as[(Long, String, Long)].collect().toSeq
    assert(got(0)._2 == "mail <EMAIL> then visit <URL>?z=1 ref <NUM> done")
    assert(got(0)._3 == 3)
    assert(got(1) == ((1L, "clean text only", 0L)))
    // the digit run inside the URL is consumed by the URL pass, not NUM —
    // but n_redactions counts patterns on the PRE-redaction text (doc'd
    // convention), so the embedded digit run still counts
    assert(got(2)._2 == "url with digits <URL> stays one token")
    assert(got(2)._3 == 2)

    // real corpus: redaction output length/count replay via Java regex
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      val r = t.replaceAll(PipelineQueries.PiiEmailRe, "<EMAIL>")
        .replaceAll(PipelineQueries.PiiUrlRe, "<URL>")
        .replaceAll(PipelineQueries.PiiDigitsRe, "<NUM>")
      (id, r)
    }.sortBy(_._1).toSeq
    val real = PipelineQueries.dRedact(spark, dir)
      .select("doc_id", "text_redacted").as[(Long, String)].collect().toSeq
    assert(real == want)
  }

  test("g_jaccard == brute-force neighbor-set similarity with top-K ranking") {
    val got = GraphQueries.queries("g_jaccard")(spark, dir)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    val anchors = anchorsOf(dir).filter(und.contains)
    val want = anchors.flatMap { u =>
      val nu = und(u)
      val cands = nu.flatMap(w => und(w)).filter(v => v != u && !nu.contains(v))
      cands.toSeq.map { v =>
        val cn = (nu & und(v)).size.toLong
        val j = BigDecimal(cn.toDouble / (nu.size + und(v).size - cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (v, cn, j)
      }.sortBy { case (v, _, j) => (-j, v) }
        .take(GraphQueries.AaK).zipWithIndex
        .map { case ((v, c, j), i) => (u, i + 1, v, c, j) }
    }
    assert(got == want)
  }

  test("g_adamic_adar brute-force parity at the larger sf0.01 graph (155 vertices)") {
    val d01 = "/root/testdata/sf0.01"
    val u01 = undOf(d01)
    val got = GraphQueries.queries("g_adamic_adar")(spark, d01)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    // the fixed-count cap BITES here (~52 stride anchors at sf0.01 > AaCount)
    val anchors = anchorsOf(d01).filter(u01.contains)
    val want = anchors.flatMap { u =>
      val scores = scala.collection.mutable.Map.empty[Long, (Long, Double)]
      for (w <- u01(u) if u01(w).size > 1; v <- u01(w) if v != u && !u01(u).contains(v)) {
        val (c, s) = scores.getOrElse(v, (0L, 0.0))
        scores(v) = (c + 1, s + 1.0 / math.log(u01(w).size.toDouble))
      }
      scores.toSeq
        .map { case (v, (c, s)) =>
          (v, c, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (v, _, s) => (-s, v) }
        .take(GraphQueries.AaK).zipWithIndex
        .map { case ((v, c, s), i) => (u, i + 1, v, c, s) }
    }
    assert(got.size == want.size && got.size > 100)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4, s"got $g want $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"score: got $g want $w")
    }
  }

  test("g_closeness == driver derivation from BFS distances") {
    val reach = GraphQueries.nhood(spark, dir).reach.get
      .as[(Long, Long, Int)].collect()
    val want = reach.groupBy(_._1).toSeq.sortBy(_._1).map { case (o, rs) =>
      val sumd = rs.map(_._3.toLong).sum
      val c = if (sumd > 0)
        BigDecimal((rs.size - 1).toDouble / sumd)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      (o, rs.size.toLong, c)
    }
    val got = GraphQueries.queries("g_closeness")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("g_katz == driver matrix recurrence; chain golden") {
    // chain 0→1→2: katz(1) = α, katz(2) = α + α², katz(0) = 0 — via the
    // driver recurrence on the real graph AND a closed-form hand check
    val alpha = GraphQueries.KatzAlpha; val rounds = GraphQueries.KatzRounds
    val g = GraphQueries.graph(spark, dir)
    val de = g.directed.where(F.col("src") =!= F.col("dst"))
      .as[(Long, Long)].collect()
    val n = g.numVertices.toInt
    var c = Array.fill(n)(0.0)
    (1 to rounds).foreach { _ =>
      val nc = Array.fill(n)(0.0)
      de.foreach { case (s, d) => nc(d.toInt) += c(s.toInt) + 1.0 }
      c = nc.map(_ * alpha)
    }
    val want = c.zipWithIndex.map { case (v, i) =>
      (i.toLong, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val got = GraphQueries.queries("g_katz")(spark, dir)
      .as[(Long, Double)].collect().toSeq
    got.zip(want).foreach { case (gt, w) =>
      assert(gt._1 == w._1 && math.abs(gt._2 - w._2) < 1e-9, s"got $gt want $w")
    }

    val chain = graft.graph.LinkGraph(
      Seq((0L, 1L, 1, 1.0), (1L, 2L, 1, 1.0)).toDF("src", "dst", "kind", "weight"),
      Seq(("a", 0L), ("b", 1L), ("c", 2L)).toDF("key", "vid"))
    val hand = graft.algo.Katz.run(chain, 0.5, 4)
      .as[(Long, Double)].collect().toMap
    assert(hand == Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.75)) // α, α+α²
  }

  test("d_source_stats == driver rollup from exact sums") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "lang", "n_chars", "text")
      .as[(String, String, Long, String)].collect()
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val chars = ds.map(_._3).sum
      val toks = ds.map(d => d._4.split(" ").count(_.nonEmpty).toLong).sum
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, ds.length.toLong, chars, toks, ds.map(_._2).distinct.length.toLong,
        r6(chars.toDouble / ds.length), r6(toks.toDouble / ds.length))
    }
    val got = PipelineQueries.dSourceStats(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == want)
  }
}
