package graft.algo

import org.apache.spark.sql.{DataFrame, functions => F}

/** k-truss decomposition (Cohen '08) — SURVEY.md §2.10 (round 6). The
  * k-truss is the maximal subgraph in which every EDGE participates in at
  * least k−2 triangles of the subgraph — the edge-analogue of k-core and
  * the standard cohesive-community primitive. Classic peel:
  *
  *   round t: compute per-edge support (triangles containing the edge)
  *   over the SURVIVING edge set; drop edges with support < k−2.
  *
  * Monotone (support only falls as edges leave), so the fixpoint is the
  * unique k-truss; round-capped with early exit like k-core, and extra
  * oracle rounds at fixpoint are no-ops — the same discipline that lets
  * the unrolled DuckDB oracle replay it round for round.
  *
  * Per round: support(u,v) = |N(u) ∩ N(v)| over the surviving undirected
  * simple graph, computed as one wedge join (canonical edge ⋈ symmetric
  * closure on the u side, then matched against the v side) + one count
  * agg + one left-join-filter. The wedge fan-out through hub vertices is
  * the triangle-count cost profile; the surviving edge set only SHRINKS,
  * so per-round work decays with the peel (k-core's shape, one order
  * heavier per round by the wedge).
  *
  * Durable via [[Materializer]]: each round commits the surviving
  * canonical edge set (u, v); resume recomputes support on the committed
  * survivors — correct because the peel is monotone in the edge set.
  *
  * @param und  symmetric simple adjacency (both directions, no
  *             self-loops) — the engine's shared `undirected` frame.
  * @return surviving canonical edges (u < v) with their fixpoint
  *         support: (u, v, sup), ordered.
  */
object Truss {

  def run(und: DataFrame, k: Int, maxRounds: Int,
          mat: Materializer = new LocalMaterializer,
          sizeHint: Long = -1L): DataFrame = {
    require(k >= 2, s"k-truss needs k >= 2, got $k")
    val spark = und.sparkSession
    IterativeConf(spark, Some(mat.loopPartitions.getOrElse(
      if (sizeHint > 0) IterativeConf.adaptivePartitions(spark, sizeHint)
      else spark.conf.get("spark.sql.shuffle.partitions").toInt))) {
      val fl = new FlatLoop(spark)
      val (start, e0) = mat.resume() match {
        case Some((i, df)) => (i, fl.ckpt("e", df.select("u", "v")))
        case None =>
          val init = und.where(F.col("src") < F.col("dst"))
            .select(F.col("src").as("u"), F.col("dst").as("v"))
          (0, fl.ckpt("e",
            mat.iter(0, init.repartition(F.col("u")), Map("init" -> true))))
      }

      // support over the CURRENT survivors: rebuild the symmetric closure
      // from the canonical set each round (survivors shrink, so this is a
      // cheap union-projection, not a distinct)
      def supportOf(e: DataFrame): DataFrame = {
        val sym = e.select(F.col("u").as("a"), F.col("v").as("b"))
          .unionByName(e.select(F.col("v").as("a"), F.col("u").as("b")))
        val wedges = e
          .join(sym.select(F.col("a").as("u"), F.col("b").as("w")), "u")
          .where(F.col("w") =!= F.col("v"))
        val closed = wedges
          .join(sym.select(F.col("a").as("v"), F.col("b").as("w")),
            Seq("v", "w"))
          .groupBy("u", "v").agg(F.count(F.lit(1)).as("sup"))
        e.join(closed, Seq("u", "v"), "left")
          .select(F.col("u"), F.col("v"),
            F.coalesce(F.col("sup"), F.lit(0L)).as("sup"))
      }

      var e = e0
      var t = start
      var active = true
      var lastSup: DataFrame = null
      while (t < maxRounds && active) {
        t += 1
        val sup = fl.ckpt("sup", supportOf(e))
        val next = sup.where(F.col("sup") >= k - 2).select("u", "v")
        val committed = fl.ckpt("e", mat.iter(t, next, Map.empty))
        // fixpoint when nothing was dropped this round
        active = committed.count() < e.count()
        e = committed
        lastSup = sup
        fl.sweep("e", "sup")
      }
      // fixpoint support values for the survivors (recompute only if the
      // cap fired while still active — the committed sup is then stale)
      val withSup =
        if (!active && lastSup != null)
          lastSup.where(F.col("sup") >= k - 2)
        else supportOf(e)
      val out = fl.ckpt("result", withSup.orderBy("u", "v"))
      fl.releaseAll("result")
      mat.close()
      out
    }
  }
}
