package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.graph.LinkGraph

/** Truncated HITS (hubs and authorities, Kleinberg JACM '99) — SURVEY.md
  * §2.10 (round 6). Over the distinct directed simple edge set, R rounds
  * of the ORIGINAL sequential update:
  *
  *   a_t(v) = Σ_{u→v} h_{t−1}(u)       (authorities from previous hubs)
  *   h_t(v) = Σ_{v→w} a_t(w)           (hubs from the NEW authorities)
  *
  * with a_0 = h_0 = 1, normalized ONCE at the end (a/Σa, h/Σh, 6dp).
  * Deferring normalization keeps every intermediate value an INTEGER
  * (a_t(v) counts alternating in-out walks of length 2t−1 ending at v;
  * h_t counts length-2t walks) carried as doubles — exact under any
  * summation order below 2^53, so Spark's and DuckDB's float paths
  * cannot diverge (the betweenness-σ discipline). The final two sums
  * are integer sums; each score sees exactly ONE division + round(6).
  *
  * The 2^53 ceiling bounds R at web scale: walk counts grow like
  * (d_avg²)^R, so R ≤ ~4 on a heavy-tailed web graph — which is also
  * the published truncation regime for HITS-as-feature. A production
  * variant would renormalize per round (breaking oracle exactness);
  * this estimator keeps the exact contract, like Katz's fixed-R trade.
  *
  * Durable via [[Materializer]]: each round commits (vid, a, h); resume
  * continues from the last committed round — the Katz/PageRank contract.
  *
  * Scale shape: state two doubles per vertex; TWO shuffles per round
  * (one per direction — inherent to the mutual recurrence); work R·|E|.
  */
object Hits {

  /** Returns (vid, auth, hub), both L1-normalized and rounded to 6dp. */
  def run(graph: LinkGraph, rounds: Int,
          mat: Materializer = new LocalMaterializer): DataFrame =
    IterativeConf(graph.spark, Some(mat.loopPartitions.getOrElse(
      IterativeConf.adaptivePartitions(graph.spark,
        math.max(graph.numVertices, graph.numEdges))))) {
      val fl = new FlatLoop(graph.spark)
      val de = mat.shared("de",
        graph.directed.where(F.col("src") =!= F.col("dst"))
          .repartition(F.col("src")), repartitionKeys = Seq("src"))
      val (start, s0) = mat.resume() match {
        case Some((i, df)) => (i, fl.ckpt("s", df.select("vid", "a", "h")))
        case None =>
          val init = graph.vertices.select(F.col("vid"),
            F.lit(1.0).as("a"), F.lit(1.0).as("h"))
          (0, fl.ckpt("s",
            mat.iter(0, init.repartition(F.col("vid")), Map("init" -> true))))
      }
      var s = s0
      var t = start
      while (t < rounds) {
        t += 1
        // authorities from previous hubs: one edges⋈state join, sum by dst
        val aAgg = s.select(F.col("vid"), F.col("h"))
          .join(de.withColumnRenamed("src", "vid"), "vid")
          .groupBy(F.col("dst").as("vid")).agg(F.sum("h").as("na"))
        // hubs from the NEW authorities: sum over out-neighbors. Consumes
        // aAgg DIRECTLY — a vertex absent from aAgg has a = 0 and
        // contributes nothing to any hub sum, so padding the zeros in
        // before this join (the previous shape's full-vertex aNew frame)
        // only added a second vertices join per round for identical sums.
        val hAgg = aAgg
          .join(de.withColumnRenamed("dst", "vid")
            .withColumnRenamed("src", "osrc"), "vid")
          .groupBy(F.col("osrc").as("vid")).agg(F.sum("na").as("nh"))
        val next = graph.vertices
          .join(aAgg, Seq("vid"), "left")
          .join(hAgg, Seq("vid"), "left")
          .select(F.col("vid"),
            F.coalesce(F.col("na"), F.lit(0.0)).as("a"),
            F.coalesce(F.col("nh"), F.lit(0.0)).as("h"))
        s = fl.ckpt("s", mat.iter(t, next, Map.empty))
        fl.sweep("s")
      }
      // ONE normalization at the end: integer sums, one division, 6dp
      val sums = s.agg(F.sum("a").as("sa"), F.sum("h").as("sh")).first()
      val (sa, sh) = (sums.getDouble(0), sums.getDouble(1))
      val out = fl.ckpt("result",
        s.select(F.col("vid"),
          F.round(F.col("a") / (if (sa > 0) sa else 1.0), 6).as("auth"),
          F.round(F.col("h") / (if (sh > 0) sh else 1.0), 6).as("hub"))
          .orderBy("vid"))
      fl.releaseAll("result")
      mat.close()
      out
    }
}
