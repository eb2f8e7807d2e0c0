package graft.queries

/** DuckDB oracle SQL for SparkEntry.queries — the driver's correctness gate
  * runs these over the same parquet tables and hash-compares results.
  *
  * Contract discipline:
  *  - column NAMES and TYPES match the Spark output exactly (counts cast to
  *    BIGINT: DuckDB sum(int) would widen to HUGEINT; Spark count is long)
  *  - every float aggregate is round()ed identically on both sides so
  *    summation-order fp noise can't flip the driver's value hash
  *  - every query ORDER BYs a deterministic key
  *  - the event-graph CTE chain mirrors GraphBuilder.fromEvents and
  *    DenseId line by line (same entity keys, same dense-rank ids)
  */
object OracleSql {

  /** Shared derivation: events → string edges → dense-id weighted edges.
    * Must stay in lock-step with GraphBuilder.fromEvents. */
  val eventEdges: String =
    """keyed AS (
      |  SELECT user_id, event_id, 'etype:' || event_type AS key, event_type FROM events
      |),
      |adj AS (
      |  SELECT key AS src_key,
      |         lead(key) OVER (PARTITION BY user_id ORDER BY event_id) AS dst_key
      |  FROM keyed
      |),
      |raw AS MATERIALIZED (
      |  SELECT src_key, dst_key, 1 AS kind FROM adj
      |  WHERE dst_key IS NOT NULL AND src_key <> dst_key
      |  UNION ALL
      |  SELECT 'user:' || CAST(user_id AS VARCHAR), 'etype:' || event_type, 2 FROM events
      |),
      |dict AS MATERIALIZED (
      |  SELECT key, CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS vid
      |  FROM (SELECT DISTINCT src_key AS key FROM raw
      |        UNION
      |        SELECT DISTINCT dst_key FROM raw)
      |),
      |edges AS MATERIALIZED (
      |  SELECT s.vid AS src, d.vid AS dst, r.kind, CAST(count(*) AS DOUBLE) AS weight
      |  FROM raw r JOIN dict s ON r.src_key = s.key JOIN dict d ON r.dst_key = d.key
      |  GROUP BY 1, 2, 3
      |)""".stripMargin

  val gEdges: String =
    s"""WITH $eventEdges
       |SELECT src, dst, kind, weight FROM edges ORDER BY src, dst, kind""".stripMargin

  val gDict: String =
    s"""WITH $eventEdges
       |SELECT key, vid FROM dict ORDER BY vid""".stripMargin

  val gDegree: String =
    s"""WITH $eventEdges,
       |o AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS out_deg,
       |             round(sum(weight), 6) AS out_wdeg
       |      FROM edges GROUP BY src),
       |i AS (SELECT dst AS vid, CAST(count(*) AS BIGINT) AS in_deg,
       |             round(sum(weight), 6) AS in_wdeg
       |      FROM edges GROUP BY dst)
       |SELECT d.vid,
       |       coalesce(o.out_deg, 0) AS out_deg,
       |       coalesce(o.out_wdeg, 0.0) AS out_wdeg,
       |       coalesce(i.in_deg, 0) AS in_deg,
       |       coalesce(i.in_wdeg, 0.0) AS in_wdeg
       |FROM dict d LEFT JOIN o ON o.vid = d.vid LEFT JOIN i ON i.vid = d.vid
       |ORDER BY d.vid""".stripMargin

  /** CTE chain for unrolled weighted PageRank with dangling redistribution,
    * `iters` synchronous rounds — matches graft.algo.PageRank step for step. */
  private def pageRankCtes(iters: Int, damping: Double): String = {
    def iterCte(k: Int): String =
      s"""r$k AS MATERIALIZED (
         |  SELECT v.vid,
         |         (1.0 - $damping) / nv.n + $damping * (coalesce(c.s, 0.0) + dg.m / nv.n) AS rank
         |  FROM dict v
         |  LEFT JOIN (
         |    SELECT e.dst AS vid, sum(p.rank * e.weight / od.wdeg) AS s
         |    FROM edges e
         |    JOIN r${k - 1} p ON p.vid = e.src
         |    JOIN odeg od ON od.vid = e.src
         |    GROUP BY e.dst) c ON c.vid = v.vid
         |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0.0) AS m
         |              FROM r${k - 1} p LEFT JOIN odeg od ON od.vid = p.vid
         |              WHERE od.vid IS NULL) dg
         |  CROSS JOIN nv
         |)""".stripMargin
    s"""$eventEdges,
       |odeg AS MATERIALIZED (SELECT src AS vid, sum(weight) AS wdeg FROM edges GROUP BY src),
       |nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM dict),
       |r0 AS MATERIALIZED (SELECT vid, 1.0 / nv.n AS rank FROM dict CROSS JOIN nv),
       |${(1 to iters).map(iterCte).mkString(",\n")}""".stripMargin
  }

  def gPageRank(iters: Int, damping: Double): String =
    s"""WITH ${pageRankCtes(iters, damping)}
       |SELECT vid, round(rank, 7) AS rank FROM r$iters ORDER BY vid""".stripMargin

  def gTopPageRank(iters: Int, damping: Double, k: Int): String =
    s"""WITH ${pageRankCtes(iters, damping)}
       |SELECT d.key, t.vid, round(t.rank, 7) AS rank
       |FROM r$iters t JOIN dict d ON d.vid = t.vid
       |ORDER BY round(t.rank, 7) DESC, t.vid LIMIT $k""".stripMargin

  /** Unrolled PERSONALIZED PageRank: teleport uniform over the user-entity
    * seed set (key LIKE 'user:%'), dangling mass returns to the seeds —
    * matches graft.algo.PageRank's teleport branch step for step. */
  def gPpr(iters: Int, damping: Double): String = {
    def iterCte(k: Int): String =
      s"""r$k AS MATERIALIZED (
         |  SELECT v.vid,
         |         (1.0 - $damping) * v.t + $damping * (coalesce(c.s, 0.0) + dg.m * v.t) AS rank
         |  FROM tele v
         |  LEFT JOIN (
         |    SELECT e.dst AS vid, sum(p.rank * e.weight / od.wdeg) AS s
         |    FROM edges e
         |    JOIN r${k - 1} p ON p.vid = e.src
         |    JOIN odeg od ON od.vid = e.src
         |    GROUP BY e.dst) c ON c.vid = v.vid
         |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0.0) AS m
         |              FROM r${k - 1} p LEFT JOIN odeg od ON od.vid = p.vid
         |              WHERE od.vid IS NULL) dg
         |)""".stripMargin
    s"""WITH $eventEdges,
       |odeg AS MATERIALIZED (SELECT src AS vid, sum(weight) AS wdeg FROM edges GROUP BY src),
       |seeds AS MATERIALIZED (SELECT vid FROM dict WHERE key LIKE 'user:%'),
       |ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
       |tele AS MATERIALIZED (
       |  SELECT d.vid, CASE WHEN s.vid IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS t
       |  FROM dict d LEFT JOIN seeds s ON s.vid = d.vid CROSS JOIN ns),
       |r0 AS MATERIALIZED (SELECT vid, t AS rank FROM tele),
       |${(1 to iters).map(iterCte).mkString(",\n")}
       |SELECT vid, round(rank, 7) AS rank FROM r$iters ORDER BY vid""".stripMargin
  }

  /** Unrolled k-core peel: s_t = vertices whose degree within the subgraph
    * induced by s_{t-1} is ≥ k; `rounds` rounds (a no-op once the peel hits
    * its fixpoint) — matches graft.algo.KCore round for round. */
  def gKcore(k: Int, rounds: Int): String = {
    def roundCte(t: Int): String =
      s"""s$t AS MATERIALIZED (
         |  SELECT e.src AS vid FROM sym e
         |  JOIN s${t - 1} a ON a.vid = e.src
         |  JOIN s${t - 1} b ON b.vid = e.dst
         |  GROUP BY e.src HAVING count(*) >= $k
         |)""".stripMargin
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |s0 AS MATERIALIZED (SELECT vid FROM dict),
       |${(1 to rounds).map(roundCte).mkString(",\n")}
       |SELECT d.vid, (m.vid IS NOT NULL) AS in_core
       |FROM dict d LEFT JOIN s$rounds m ON m.vid = d.vid
       |ORDER BY d.vid""".stripMargin
  }

  /** Exact SCC labels, closed-form: label(v) = min u with v→*u AND u→*v —
    * forward and backward transitive closures intersected. No round-count
    * coupling with the engine's coloring algorithm; both compute the same
    * well-defined fixpoint. */
  val gScc: String =
    s"""WITH RECURSIVE $eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |fwd AS (
       |  SELECT vid, vid AS r FROM dict
       |  UNION
       |  SELECT fwd.vid, de.dst AS r FROM fwd JOIN de ON de.src = fwd.r
       |),
       |bwd AS (
       |  SELECT vid, vid AS r FROM dict
       |  UNION
       |  SELECT bwd.vid, de.src AS r FROM bwd JOIN de ON de.dst = bwd.r
       |)
       |SELECT f.vid, min(f.r) AS scc_label
       |FROM fwd f JOIN bwd b ON b.vid = f.vid AND b.r = f.r
       |GROUP BY f.vid ORDER BY f.vid""".stripMargin

  /** Exact CC labels via recursive min-reachability (label = min vid in the
    * symmetric transitive closure) — the HashMin fixpoint by definition. */
  val gCc: String =
    s"""WITH RECURSIVE $eventEdges,
       |sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |reach AS (
       |  SELECT vid, vid AS r FROM dict
       |  UNION
       |  SELECT reach.vid, sym.dst AS r FROM reach JOIN sym ON sym.src = reach.r
       |)
       |SELECT vid, min(r) AS label FROM reach GROUP BY vid ORDER BY vid""".stripMargin

  /** Component size histogram from the same closure as gCc: label sizes,
    * then how many components share each size. */
  val gCompsizes: String =
    s"""WITH RECURSIVE $eventEdges,
       |sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |reach AS (
       |  SELECT vid, vid AS r FROM dict
       |  UNION
       |  SELECT reach.vid, sym.dst AS r FROM reach JOIN sym ON sym.src = reach.r
       |),
       |labels AS (SELECT vid, min(r) AS label FROM reach GROUP BY vid),
       |comp AS (SELECT label, CAST(count(*) AS BIGINT) AS size
       |         FROM labels GROUP BY label)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_components
       |FROM comp GROUP BY size ORDER BY size""".stripMargin

  /** Unrolled truncated HITS: sequential update (authorities from previous
    * hubs, hubs from the NEW authorities), a_0 = h_0 = 1, single final
    * L1 normalization — mirrors Hits.run (all intermediates are integer
    * walk counts, so the float paths agree exactly). */
  def gHits(rounds: Int): String = {
    def roundCte(k: Int): String =
      s"""a$k AS MATERIALIZED (
         |  SELECT d.vid, coalesce(m.s, CAST(0 AS DOUBLE)) AS a
         |  FROM dict d LEFT JOIN (
         |    SELECT de.dst AS vid, sum(p.h) AS s
         |    FROM de JOIN s${k - 1} p ON p.vid = de.src GROUP BY de.dst) m
         |  ON m.vid = d.vid),
         |h$k AS MATERIALIZED (
         |  SELECT d.vid, coalesce(m.s, CAST(0 AS DOUBLE)) AS h
         |  FROM dict d LEFT JOIN (
         |    SELECT de.src AS vid, sum(p.a) AS s
         |    FROM de JOIN a$k p ON p.vid = de.dst GROUP BY de.src) m
         |  ON m.vid = d.vid),
         |s$k AS MATERIALIZED (
         |  SELECT a$k.vid, a$k.a, h$k.h FROM a$k JOIN h$k ON h$k.vid = a$k.vid)""".stripMargin
    s"""WITH $eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |s0 AS (SELECT vid, CAST(1 AS DOUBLE) AS a, CAST(1 AS DOUBLE) AS h FROM dict),
       |${(1 to rounds).map(roundCte).mkString(",\n")},
       |sums AS (SELECT sum(a) AS sa, sum(h) AS sh FROM s$rounds)
       |SELECT vid,
       |  round(a / (CASE WHEN sa > 0 THEN sa ELSE CAST(1 AS DOUBLE) END), 6) AS auth,
       |  round(h / (CASE WHEN sh > 0 THEN sh ELSE CAST(1 AS DOUBLE) END), 6) AS hub
       |FROM s$rounds, sums ORDER BY vid""".stripMargin
  }

  /** Unrolled deterministic local-min MIS: per round, every undecided
    * vertex smaller than all undecided neighbors joins (st 1), its
    * undecided neighbors leave (st 2); rounds beyond fixpoint are no-ops
    * — mirrors Mis.run round for round. */
  def gMis(rounds: Int): String = {
    def roundCte(k: Int): String =
      s"""c$k AS MATERIALIZED (
         |  SELECT u.vid FROM s${k - 1} u WHERE u.st = 0 AND NOT EXISTS (
         |    SELECT 1 FROM sym e JOIN s${k - 1} n ON n.vid = e.dst
         |    WHERE e.src = u.vid AND n.st = 0 AND n.vid < u.vid)),
         |o$k AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS vid FROM sym e
         |  JOIN c$k c ON e.src = c.vid
         |  JOIN s${k - 1} n ON n.vid = e.dst WHERE n.st = 0),
         |s$k AS MATERIALIZED (
         |  SELECT v.vid, CASE WHEN v.st <> 0 THEN v.st
         |    WHEN v.vid IN (SELECT vid FROM c$k) THEN 1
         |    WHEN v.vid IN (SELECT vid FROM o$k) THEN 2
         |    ELSE 0 END AS st
         |  FROM s${k - 1} v)""".stripMargin
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |s0 AS (SELECT vid, 0 AS st FROM dict),
       |${(1 to rounds).map(roundCte).mkString(",\n")}
       |SELECT vid, st FROM s$rounds ORDER BY vid""".stripMargin
  }

  /** Unrolled k-truss peel: per round, per-edge support = common-neighbor
    * count over the surviving symmetric closure, edges below k−2 dropped;
    * rounds beyond fixpoint are no-ops. Final select reports the
    * survivors' support over the final edge set (LEFT JOIN + coalesce 0,
    * matching Truss.supportOf exactly) — mirrors Truss.run. */
  def gKtruss(k: Int, rounds: Int): String = {
    def symCte(j: Int): String =
      s"""y$j AS MATERIALIZED (
         |  SELECT u AS a, v AS b FROM e$j UNION ALL SELECT v, u FROM e$j)""".stripMargin
    def roundCte(j: Int): String =
      s"""${symCte(j - 1)},
         |p$j AS MATERIALIZED (
         |  SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
         |  FROM e${j - 1} e
         |  JOIN y${j - 1} a ON a.a = e.u AND a.b <> e.v
         |  JOIN y${j - 1} b ON b.a = e.v AND b.b = a.b
         |  GROUP BY e.u, e.v),
         |e$j AS MATERIALIZED (
         |  SELECT u, v FROM p$j WHERE sup >= ${k - 2})""".stripMargin
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |e0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM sym WHERE src < dst),
       |${(1 to rounds).map(roundCte).mkString(",\n")},
       |${symCte(rounds)},
       |f AS (
       |  SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS sup
       |  FROM e$rounds e
       |  JOIN y$rounds a ON a.a = e.u AND a.b <> e.v
       |  JOIN y$rounds b ON b.a = e.v AND b.b = a.b
       |  GROUP BY e.u, e.v)
       |SELECT e.u, e.v, coalesce(f.sup, CAST(0 AS BIGINT)) AS sup
       |FROM e$rounds e LEFT JOIN f ON f.u = e.u AND f.v = e.v
       |ORDER BY e.u, e.v""".stripMargin
  }

  /** Unrolled synchronous LPA, smallest-label tie-break, `rounds` rounds. */
  def gLpa(rounds: Int): String = {
    def roundCte(k: Int): String =
      s"""l$k AS MATERIALIZED (
         |  SELECT v.vid, coalesce(b.new_label, v.label) AS label
         |  FROM l${k - 1} v
         |  LEFT JOIN (
         |    SELECT vid, label AS new_label FROM (
         |      SELECT dst AS vid, label,
         |             row_number() OVER (PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
         |      FROM (
         |        SELECT e.dst, p.label, count(*) AS c
         |        FROM sym e JOIN l${k - 1} p ON p.vid = e.src
         |        GROUP BY e.dst, p.label))
         |    WHERE rn = 1) b ON b.vid = v.vid
         |)""".stripMargin
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |l0 AS MATERIALIZED (SELECT vid, vid AS label FROM dict),
       |${(1 to rounds).map(roundCte).mkString(",\n")}
       |SELECT vid, label FROM l$rounds ORDER BY vid""".stripMargin
  }

  private val triangleCtes: String =
    s"""$eventEdges,
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |        FROM edges WHERE src <> dst),
       |dg AS MATERIALIZED (SELECT w AS vid, count(*) AS d
       |       FROM (SELECT u AS w FROM und UNION ALL SELECT v FROM und)
       |       GROUP BY w),
       |a AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s,
       |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t
       |      FROM und JOIN dg du ON du.vid = u JOIN dg dv ON dv.vid = v),
       |ad AS MATERIALIZED (SELECT a.s, a.t, dg.d AS dt FROM a JOIN dg ON dg.vid = a.t),
       |tri AS MATERIALIZED (SELECT e1.s AS a, e1.t AS b, e2.t AS c
       |        FROM ad e1
       |        JOIN ad e2 ON e1.s = e2.s
       |              AND (e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t))
       |        JOIN a e3 ON e3.s = e1.t AND e3.t = e2.t)""".stripMargin

  val gTriangles: String =
    s"""WITH $triangleCtes
       |SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri""".stripMargin

  /** Depth-bounded directed min-distance closure: mind(o, v, dist) with
    * dist = dist(o→v) ≤ maxT over the distinct directed edge set — matches
    * Neighborhood.exact's BFS (same de = distinct (src, dst), src ≠ dst). */
  private def reachCtes(maxT: Int): String =
    s"""$eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |reach AS (
       |  SELECT vid AS o, vid AS v, 0 AS dist FROM dict
       |  UNION
       |  SELECT r.o, e.dst, r.dist + 1 FROM reach r JOIN de e ON e.src = r.v
       |  WHERE r.dist < $maxT
       |),
       |mind AS MATERIALIZED (SELECT o, v, min(dist) AS dist FROM reach GROUP BY o, v)""".stripMargin

  /** Exact truncated neighborhood function N(t) = |{(o,v) : dist(o→v) ≤ t}|
    * for t = 0..maxT — matches Neighborhood.exact + cumulativeCounts. */
  def gNhood(maxT: Int): String =
    s"""WITH RECURSIVE ${reachCtes(maxT)}
       |SELECT CAST(ts.t AS INT) AS t, CAST(count(m.v) AS BIGINT) AS pairs
       |FROM range(0, ${maxT + 1}) ts(t) LEFT JOIN mind m ON m.dist <= ts.t
       |GROUP BY ts.t ORDER BY t""".stripMargin

  /** T-truncated in-harmonic centrality H(v) = Σ_{o≠v, dist(o→v)≤maxT} 1/dist
    * — matches Neighborhood.harmonic (round 6, zero for unreached). */
  def gHarmonic(maxT: Int): String =
    s"""WITH RECURSIVE ${reachCtes(maxT)},
       |h AS (SELECT v AS vid, sum(1.0 / dist) AS h FROM mind WHERE dist > 0 GROUP BY v)
       |SELECT d.vid, round(coalesce(h.h, 0.0), 6) AS harmonic
       |FROM dict d LEFT JOIN h ON h.vid = d.vid
       |ORDER BY d.vid""".stripMargin

  /** Landmark distance labels: top-L degree landmarks, depth-bounded
    * forward/backward closures — matches HubLabels.build (same degree
    * definition, same (deg DESC, vid) tie-break, same maxT truncation). */
  private def hubCtes(l: Int, maxT: Int): String =
    s"""$eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |lm AS MATERIALIZED (
       |  SELECT vid FROM (
       |    SELECT w AS vid, count(*) AS deg FROM (
       |      SELECT src AS w FROM de UNION ALL SELECT dst FROM de)
       |    GROUP BY w)
       |  ORDER BY deg DESC, vid ASC LIMIT $l),
       |fwd AS (
       |  SELECT vid AS hub, vid AS v, 0 AS d FROM lm
       |  UNION
       |  SELECT f.hub, e.dst, f.d + 1 FROM fwd f JOIN de e ON e.src = f.v
       |  WHERE f.d < $maxT
       |),
       |fmin AS MATERIALIZED (SELECT hub, v, CAST(min(d) AS INT) AS d FROM fwd GROUP BY hub, v),
       |bwd AS (
       |  SELECT vid AS hub, vid AS v, 0 AS d FROM lm
       |  UNION
       |  SELECT b.hub, e.src, b.d + 1 FROM bwd b JOIN de e ON e.dst = b.v
       |  WHERE b.d < $maxT
       |),
       |bmin AS MATERIALIZED (SELECT hub, v, CAST(min(d) AS INT) AS d FROM bwd GROUP BY hub, v)""".stripMargin

  /** Both label sides: (vid, hub, d, dir) with dir ∈ {to_hub, from_hub} —
    * matches the g_hub_labels union. */
  def gHubLabels(l: Int, maxT: Int): String =
    s"""WITH RECURSIVE ${hubCtes(l, maxT)}
       |SELECT v AS vid, hub, d, 'to_hub' AS dir FROM bmin
       |UNION ALL
       |SELECT v AS vid, hub, d, 'from_hub' AS dir FROM fmin
       |ORDER BY vid, hub, dir""".stripMargin

  /** Label-join distance bound over the linear deterministic pair sample
    * (u ↔ u + j·stride, j = −offsets..offsets, offset vid must exist):
    * dist_ub = min over shared hubs of d(u→hub) + d(hub→v) — matches
    * HubLabels.distances (pairs with no shared hub emit no row). */
  def gHubDistq(l: Int, maxT: Int, stride: Int, offsets: Int): String =
    s"""WITH RECURSIVE ${hubCtes(l, maxT)},
       |s AS (SELECT vid FROM dict WHERE vid % $stride = 0),
       |pairs AS (
       |  SELECT a.vid AS u, a.vid + j.j * $stride AS v
       |  FROM s a CROSS JOIN (
       |    SELECT unnest(range(${-offsets}, ${offsets + 1})) AS j) j
       |  WHERE EXISTS (SELECT 1 FROM dict d2
       |                WHERE d2.vid = a.vid + j.j * $stride))
       |SELECT p.u, p.v, CAST(min(lo.d + li.d) AS INT) AS dist_ub
       |FROM pairs p
       |JOIN bmin lo ON lo.v = p.u
       |JOIN fmin li ON li.v = p.v AND li.hub = lo.hub
       |GROUP BY p.u, p.v
       |ORDER BY p.u, p.v""".stripMargin

  /** Hop-bounded weighted shortest-path closure from the vid-stride origin
    * set: dist(o→v) = min cost over paths of ≤ maxRounds edges, edge cost
    * per-kind (adjacency 1, tool-invocation 2, parallel edges min) —
    * matches ShortestPaths.run's Bellman-Ford semantics exactly. The
    * recursive enumeration is finite: (o, v, dist, hops) with dist ≤
    * 2·maxRounds and hops ≤ maxRounds. */
  def gSssp(stride: Int, maxRounds: Int): String =
    s"""WITH RECURSIVE $eventEdges,
       |wde AS MATERIALIZED (
       |  SELECT src, dst, min(CASE WHEN kind = 1 THEN 1 ELSE 2 END) AS cost
       |  FROM edges WHERE src <> dst GROUP BY src, dst),
       |paths AS (
       |  SELECT vid AS o, vid AS v, 0 AS dist, 0 AS hops
       |  FROM dict WHERE vid % $stride = 0
       |  UNION
       |  SELECT p.o, e.dst, p.dist + e.cost, p.hops + 1
       |  FROM paths p JOIN wde e ON e.src = p.v
       |  WHERE p.hops < $maxRounds)
       |SELECT o, v, CAST(min(dist) AS INT) AS dist
       |FROM paths GROUP BY o, v ORDER BY o, v""".stripMargin

  /** Truncated out-eccentricity + reached-ball size per vertex from the
    * same depth-bounded closure as gNhood — matches the g_ecc derivation
    * from Neighborhood.exact's reach frame. */
  def gEcc(maxT: Int): String =
    s"""WITH RECURSIVE ${reachCtes(maxT)}
       |SELECT o AS vid, CAST(max(dist) AS INT) AS ecc,
       |       CAST(count(*) AS BIGINT) AS reached
       |FROM mind GROUP BY o ORDER BY vid""".stripMargin

  /** Local clustering coefficient over the undirected simple graph —
    * triangle counts from the same degree-ordered closure as
    * gTriPerVertex, degree from the symmetric distinct edge set. */
  val gClustering: String =
    s"""WITH $triangleCtes,
       |cnt AS (SELECT w AS vid, CAST(count(*) AS BIGINT) AS triangles
       |        FROM (SELECT a AS w FROM tri UNION ALL SELECT b FROM tri
       |              UNION ALL SELECT c FROM tri)
       |        GROUP BY w)
       |SELECT d.vid,
       |       coalesce(dg.d, 0) AS deg,
       |       coalesce(cnt.triangles, 0) AS triangles,
       |       round(CASE WHEN coalesce(dg.d, 0) <= 1 THEN 0.0
       |             ELSE coalesce(cnt.triangles, 0) * 2.0 / (dg.d * (dg.d - 1))
       |             END, 6) AS lcc
       |FROM dict d
       |LEFT JOIN dg ON dg.vid = d.vid
       |LEFT JOIN cnt ON cnt.vid = d.vid
       |ORDER BY d.vid""".stripMargin

  /** Degree histogram over the undirected simple graph (deg 0 vertices
    * included via dict left join — none exist in this fixture, but the
    * contract covers them). */
  val gDegdist: String =
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |dgv AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS deg
       |        FROM sym GROUP BY src)
       |SELECT coalesce(dgv.deg, 0) AS deg,
       |       CAST(count(*) AS BIGINT) AS n_vertices
       |FROM dict d LEFT JOIN dgv ON dgv.vid = d.vid
       |GROUP BY 1 ORDER BY deg""".stripMargin

  /** Degree assortativity: Pearson r of endpoint degrees over the
    * symmetric simple edge list. Moments as exact integer sums, the float
    * formula applied once — matches g_assortativity's arithmetic exactly
    * (no order-dependent float aggregation on either side). */
  val gAssortativity: String =
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |dgv AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS deg
       |        FROM sym GROUP BY src),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(dx.deg) AS BIGINT) AS sx,
       |         CAST(sum(dy.deg) AS BIGINT) AS sy,
       |         CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
       |         CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
       |         CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy
       |  FROM sym e JOIN dgv dx ON dx.vid = e.src JOIN dgv dy ON dy.vid = e.dst)
       |SELECT n AS n_dir_edges,
       |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |             (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |              sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       |         AS assortativity
       |FROM m""".stripMargin

  /** Adamic-Adar link prediction from the fixed-count anchor set (first
    * `cnt` vids among the stride multiples): 2-hop expansion, existing
    * edges excluded, score = Σ 1/ln(deg(w)) over common neighbors with
    * deg > 1, top-K per anchor ranked on the ROUNDED score (ties by v)
    * — mirrors g_adamic_adar. */
  def gAdamicAdar(stride: Int, cnt: Int, k: Int): String =
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |dgv AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS deg
       |        FROM sym GROUP BY src),
       |anchors AS (SELECT vid FROM dict WHERE vid % $stride = 0
       |            ORDER BY vid LIMIT $cnt),
       |aa AS (
       |  SELECT e1.src AS u, e2.dst AS v,
       |         CAST(count(*) AS BIGINT) AS cn,
       |         round(sum(1.0 / ln(dw.deg)), 6) AS score
       |  FROM sym e1
       |  JOIN dgv dw ON dw.vid = e1.dst AND dw.deg > 1
       |  JOIN sym e2 ON e2.src = e1.dst AND e2.dst <> e1.src
       |  WHERE e1.src IN (SELECT vid FROM anchors)
       |    AND NOT EXISTS (SELECT 1 FROM sym s
       |                    WHERE s.src = e1.src AND s.dst = e2.dst)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT u, v, cn, score,
       |         CAST(row_number() OVER (PARTITION BY u ORDER BY score DESC, v) AS INT) AS rk
       |  FROM aa)
       |SELECT u, rk, v, cn, score FROM ranked
       |WHERE rk <= $k ORDER BY u, rk""".stripMargin

  /** Reciprocity over distinct directed simple edges — integer counts,
    * one EXISTS probe against the swapped set, division applied once. */
  val gReciprocity: String =
    s"""WITH $eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
       |         CAST(count(*) FILTER (WHERE EXISTS (
       |           SELECT 1 FROM de r WHERE r.src = de.dst AND r.dst = de.src))
       |           AS BIGINT) AS n_reciprocal
       |  FROM de)
       |SELECT n_edges, n_reciprocal,
       |       round(CAST(n_reciprocal AS DOUBLE) / n_edges, 6) AS reciprocity
       |FROM m""".stripMargin

  /** Effective diameter at q ∈ {0.5, 0.9}: smallest t with N(t) ≥ q·N(T)
    * over the same depth-bounded closure as gNhood — matches g_effdiam's
    * integer definition (Neighborhood.effectiveDiameter). */
  def gEffdiam(maxT: Int): String =
    s"""WITH RECURSIVE ${reachCtes(maxT)},
       |counts AS (
       |  SELECT CAST(ts.t AS INT) AS t, CAST(count(m.v) AS BIGINT) AS pairs
       |  FROM range(0, ${maxT + 1}) ts(t) LEFT JOIN mind m ON m.dist <= ts.t
       |  GROUP BY ts.t),
       |tot AS (SELECT max(pairs) AS total_pairs FROM counts),
       |qs(q) AS (VALUES (0.5), (0.9))
       |SELECT q, CAST(min(t) AS INT) AS eff_diameter, total_pairs
       |FROM qs CROSS JOIN tot JOIN counts ON pairs >= q * total_pairs
       |GROUP BY q, total_pairs ORDER BY q""".stripMargin

  /** Hop-bounded sampled-source Brandes betweenness, unrolled level by
    * level — matches Betweenness.run exactly: forward σ (path counts,
    * integers carried as doubles — exact under any summation order),
    * backward δ deepest-first with the horizon level pinned at δ = 0,
    * bc(v) = Σ over levels ≥ 1 (level 0 is the s=v diagonal — endpoints
    * carry no betweenness mass). */
  def gBetweenness(stride: Int, maxT: Int): String = {
    def sigCte(t: Int): String =
      s"""sig$t AS MATERIALIZED (
         |  SELECT m.s, m.v, sum(p.sigma) AS sigma
         |  FROM sig${t - 1} p JOIN de e ON e.src = p.v
         |  JOIN mind m ON m.s = p.s AND m.v = e.dst AND m.dist = $t
         |  GROUP BY m.s, m.v)""".stripMargin
    def delCte(t: Int): String =
      if (t == maxT)
        s"d$t AS (SELECT s, v, sigma, CAST(0 AS DOUBLE) AS delta FROM sig$t)"
      else
        s"""d$t AS MATERIALIZED (
           |  SELECT l.s, l.v, l.sigma, coalesce(c.delta, CAST(0 AS DOUBLE)) AS delta
           |  FROM sig$t l LEFT JOIN (
           |    SELECT l2.s, l2.v, sum(l2.sigma / w.sigma * (w.delta + 1.0)) AS delta
           |    FROM sig$t l2 JOIN de e ON e.src = l2.v
           |    JOIN d${t + 1} w ON w.s = l2.s AND w.v = e.dst
           |    GROUP BY l2.s, l2.v) c ON c.s = l.s AND c.v = l.v)""".stripMargin
    val unions = (1 to maxT).map(t => s"SELECT v, delta FROM d$t").mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE $eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |reach AS (
       |  SELECT vid AS s, vid AS v, 0 AS dist FROM dict WHERE vid % $stride = 0
       |  UNION
       |  SELECT r.s, e.dst, r.dist + 1 FROM reach r JOIN de e ON e.src = r.v
       |  WHERE r.dist < $maxT
       |),
       |mind AS MATERIALIZED (SELECT s, v, min(dist) AS dist FROM reach GROUP BY s, v),
       |sig0 AS (SELECT s, v, CAST(1 AS DOUBLE) AS sigma FROM mind WHERE dist = 0),
       |${(1 to maxT).map(sigCte).mkString(",\n")},
       |${(maxT to 0 by -1).map(delCte).mkString(",\n")},
       |bc AS (
       |  SELECT v, sum(delta) AS bc FROM (
       |  $unions)
       |  GROUP BY v)
       |SELECT d.vid, round(coalesce(bc.bc, 0.0), 6) AS bc
       |FROM dict d LEFT JOIN bc ON bc.v = d.vid
       |ORDER BY d.vid""".stripMargin
  }

  /** Truncated out-closeness from the same depth-bounded closure as
    * gNhood — integer sums, one division, matches g_closeness. */
  def gCloseness(maxT: Int): String =
    s"""WITH RECURSIVE ${reachCtes(maxT)}
       |SELECT o AS vid, CAST(count(*) AS BIGINT) AS reached,
       |       round(CASE WHEN sum(dist) > 0
       |             THEN (count(*) - 1) / CAST(sum(dist) AS DOUBLE)
       |             ELSE 0.0 END, 6) AS closeness
       |FROM mind GROUP BY o ORDER BY vid""".stripMargin

  /** Jaccard neighbor similarity from the same fixed-count anchor set as
    * gAdamicAdar — all integer counts, one division; mirrors g_jaccard
    * exactly. */
  def gJaccard(stride: Int, cnt: Int, k: Int): String =
    s"""WITH $eventEdges,
       |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
       |  WHERE src <> dst),
       |dgv AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS deg
       |        FROM sym GROUP BY src),
       |anchors AS (SELECT vid FROM dict WHERE vid % $stride = 0
       |            ORDER BY vid LIMIT $cnt),
       |cn AS (
       |  SELECT e1.src AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn
       |  FROM sym e1
       |  JOIN sym e2 ON e2.src = e1.dst AND e2.dst <> e1.src
       |  WHERE e1.src IN (SELECT vid FROM anchors)
       |    AND NOT EXISTS (SELECT 1 FROM sym s
       |                    WHERE s.src = e1.src AND s.dst = e2.dst)
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cn.u, cn.v, cn.cn,
       |         round(cn.cn / CAST(du.deg + dv.deg - cn.cn AS DOUBLE), 6) AS jaccard
       |  FROM cn JOIN dgv du ON du.vid = cn.u JOIN dgv dv ON dv.vid = cn.v),
       |ranked AS (
       |  SELECT u, v, cn, jaccard,
       |         CAST(row_number() OVER (PARTITION BY u ORDER BY jaccard DESC, v) AS INT) AS rk
       |  FROM scored)
       |SELECT u, rk, v, cn, jaccard FROM ranked
       |WHERE rk <= $k ORDER BY u, rk""".stripMargin

  /** Truncated Katz, unrolled R rounds of c = α·Aᵀ(1+c) over the
    * distinct directed simple edge set — matches Katz.run exactly
    * (coalesced zeros every round, doubles throughout). */
  def gKatz(alpha: Double, rounds: Int): String = {
    def roundCte(t: Int): String =
      s"""k$t AS MATERIALIZED (
         |  SELECT d.vid, coalesce(a.c, CAST(0 AS DOUBLE)) AS c
         |  FROM dict d LEFT JOIN (
         |    SELECT e.dst AS vid, $alpha * sum(p.c + 1.0) AS c
         |    FROM de e JOIN k${t - 1} p ON p.vid = e.src
         |    GROUP BY e.dst) a ON a.vid = d.vid)""".stripMargin
    s"""WITH $eventEdges,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
       |k0 AS (SELECT vid, CAST(0 AS DOUBLE) AS c FROM dict),
       |${(1 to rounds).map(roundCte).mkString(",\n")}
       |SELECT vid, round(c, 6) AS katz FROM k$rounds ORDER BY vid""".stripMargin
  }

  val gTriPerVertex: String =
    s"""WITH $triangleCtes,
       |cnt AS (SELECT w AS vid, CAST(count(*) AS BIGINT) AS triangles
       |        FROM (SELECT a AS w FROM tri UNION ALL SELECT b FROM tri
       |              UNION ALL SELECT c FROM tri)
       |        GROUP BY w)
       |SELECT d.vid, coalesce(cnt.triangles, 0) AS triangles
       |FROM dict d LEFT JOIN cnt ON cnt.vid = d.vid
       |ORDER BY d.vid""".stripMargin
}
