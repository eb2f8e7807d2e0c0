package graft.oracle

/** In-driver plain-Scala ground-truth oracles — SURVEY.md §5.1 L1.
  * Deliberately naive (arrays + loops); correctness bar, not speed.
  */
object Oracles {

  /** Union-find: exact CC labels; label = min vid of component. */
  def connectedComponents(n: Int, edges: Seq[(Int, Int)]): Array[Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }; r }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    Array.tabulate(n)(v => find(v).toLong)
  }

  /** Dense synchronous PageRank, identical semantics to graft.algo.PageRank:
    * weighted transition, dangling redistribution, stop at linf < tol. */
  def pageRank(n: Int, edges: Seq[(Int, Int, Double)], damping: Double = 0.85,
               tol: Double = 1e-6, maxIters: Int = 100,
               fixedIters: Option[Int] = None): Array[Double] = {
    val wdeg = new Array[Double](n)
    edges.foreach { case (s, _, w) => wdeg(s) += w }
    var p = Array.fill(n)(1.0 / n)
    var iter = 0
    val iters = fixedIters.getOrElse(maxIters)
    var done = false
    while (iter < iters && !done) {
      iter += 1
      val nxt = new Array[Double](n)
      edges.foreach { case (s, d, w) => nxt(d) += p(s) * w / wdeg(s) }
      var dangling = 0.0
      (0 until n).foreach(v => if (wdeg(v) == 0.0) dangling += p(v))
      val base = (1.0 - damping) / n
      var linf = 0.0
      val out = Array.tabulate(n) { v =>
        val r = base + damping * (nxt(v) + dangling / n)
        linf = math.max(linf, math.abs(r - p(v)))
        r
      }
      p = out
      done = fixedIters.isEmpty && linf < tol
    }
    p
  }

  /** Synchronous LPA with smallest-label tie-break, identical to
    * graft.algo.LabelPropagation (symmetrized, distinct neighbors). */
  def lpa(n: Int, undirected: Seq[(Int, Int)], maxRounds: Int = 10): Array[Long] = {
    val nbrs = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    undirected.foreach { case (a, b) => if (a != b) { nbrs(a) += b; nbrs(b) += a } }
    var label = Array.tabulate(n)(_.toLong)
    var round = 0
    var changed = -1
    while (changed != 0 && round < maxRounds) {
      round += 1
      changed = 0
      val next = Array.tabulate(n) { v =>
        if (nbrs(v).isEmpty) label(v)
        else {
          val cnt = scala.collection.mutable.Map.empty[Long, Int]
          nbrs(v).foreach(u => cnt(label(u)) = cnt.getOrElse(label(u), 0) + 1)
          // argmax count, ties -> smallest label
          cnt.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      (0 until n).foreach(v => if (next(v) != label(v)) changed += 1)
      label = next
    }
    label
  }

  /** Brute-force triangle enumeration over the undirected simple graph. */
  def triangles(n: Int, undirected: Seq[(Int, Int)]): (Long, Array[Long]) = {
    val adj = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    undirected.foreach { case (a, b) => if (a != b) { adj(a) += b; adj(b) += a } }
    var total = 0L
    val per = new Array[Long](n)
    for (u <- 0 until n; v <- adj(u) if v > u; w <- adj(u) if w > v) {
      if (adj(v).contains(w)) { total += 1; per(u) += 1; per(v) += 1; per(w) += 1 }
    }
    (total, per)
  }
}
