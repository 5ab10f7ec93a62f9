package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.GraftGraph

/** Link-graph centrality rows ([[GraftGraph]]) — the web-graph quality
  * signals of a crawl-curation pipeline (page rank as a document-quality
  * prior; hubs/authorities on bipartite interaction graphs), exercised
  * on the order→part purchase graph derived from `lineitem` (the
  * repo's largest table, so the rows scale-test the iteration shape).
  * Node ids disambiguate the two key spaces in-plan: orders ↦ 2k,
  * parts ↦ 2k+1.
  *
  * Both operators are integer-exact on a fixed-point grid (see the
  * [[GraftGraph]] scaladoc), so the oracles replay every iteration in
  * SQL and hash-match — centrality is certified arithmetic here, not a
  * float that happens to agree.
  */
object GraphQueries extends QueryModule {

  // shared edge CTE: the deduplicated order→part graph with both key
  // spaces folded into one node-id space
  private val edgeCte =
    """e AS (SELECT DISTINCT l_orderkey * 2 AS src,
      |                      l_partkey * 2 + 1 AS dst FROM lineitem),
      |nodes AS (SELECT DISTINCT src AS node_id FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src)""".stripMargin

  override def all: Seq[GraftQuery] = Seq(
    // PageRank, 3 integer-exact iterations at damping 85/100. Dangling
    // mass (every part node — the bipartite sinks) is dropped per the
    // operator contract; the oracle replays the identical integral
    // arithmetic: r' = (15*grid + 85*sum(r div deg)) div 100.
    GraftQuery(
      "graph_pagerank",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        GraftGraph.pageRank(edges, iters = 3)
      },
      Some(s"""WITH $edgeCte,
        |r0 AS (SELECT node_id, 1000000::BIGINT AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node_id, sum(r0.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r0 ON r0.node_id = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node_id,
        |         (15000000 + 85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c1 USING (node_id)),
        |c2 AS (SELECT e.dst AS node_id, sum(r1.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r1 ON r1.node_id = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node_id,
        |         (15000000 + 85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c2 USING (node_id)),
        |c3 AS (SELECT e.dst AS node_id, sum(r2.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r2 ON r2.node_id = e.src GROUP BY e.dst),
        |r3 AS (SELECT n.node_id,
        |         (15000000 + 85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c3 USING (node_id))
        |SELECT node_id, CAST(r AS BIGINT) AS pr_micro FROM r3""".stripMargin)),

    // HITS, 2 rounds — authority = Σ hub(in-neighbors), hub =
    // Σ auth(out-neighbors), each side max-renormalized to the 10⁶
    // grid in integer arithmetic (x·grid div max). On the bipartite
    // purchase graph hubs are orders, authorities parts — the
    // max-rescale keeps both sides' rankings engine-exact.
    GraftQuery(
      "graph_hits",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        GraftGraph.hits(edges, iters = 2)
      },
      Some(s"""WITH $edgeCte,
        |h0 AS (SELECT node_id, 1000000::BIGINT AS h FROM nodes),
        |a1r AS (SELECT n.node_id, coalesce(x.s, 0) AS a FROM nodes n
        |        LEFT JOIN (SELECT e.dst AS node_id, sum(h0.h) AS s
        |                   FROM e JOIN h0 ON h0.node_id = e.src
        |                   GROUP BY e.dst) x USING (node_id)),
        |a1 AS (SELECT node_id, CASE WHEN (SELECT max(a) FROM a1r) > 0
        |         THEN a * 1000000 // (SELECT max(a) FROM a1r)
        |         ELSE 0 END AS a FROM a1r),
        |h1r AS (SELECT n.node_id, coalesce(x.s, 0) AS h FROM nodes n
        |        LEFT JOIN (SELECT e.src AS node_id, sum(a1.a) AS s
        |                   FROM e JOIN a1 ON a1.node_id = e.dst
        |                   GROUP BY e.src) x USING (node_id)),
        |h1 AS (SELECT node_id, CASE WHEN (SELECT max(h) FROM h1r) > 0
        |         THEN h * 1000000 // (SELECT max(h) FROM h1r)
        |         ELSE 0 END AS h FROM h1r),
        |a2r AS (SELECT n.node_id, coalesce(x.s, 0) AS a FROM nodes n
        |        LEFT JOIN (SELECT e.dst AS node_id, sum(h1.h) AS s
        |                   FROM e JOIN h1 ON h1.node_id = e.src
        |                   GROUP BY e.dst) x USING (node_id)),
        |a2 AS (SELECT node_id, CASE WHEN (SELECT max(a) FROM a2r) > 0
        |         THEN a * 1000000 // (SELECT max(a) FROM a2r)
        |         ELSE 0 END AS a FROM a2r),
        |h2r AS (SELECT n.node_id, coalesce(x.s, 0) AS h FROM nodes n
        |        LEFT JOIN (SELECT e.src AS node_id, sum(a2.a) AS s
        |                   FROM e JOIN a2 ON a2.node_id = e.dst
        |                   GROUP BY e.src) x USING (node_id)),
        |h2 AS (SELECT node_id, CASE WHEN (SELECT max(h) FROM h2r) > 0
        |         THEN h * 1000000 // (SELECT max(h) FROM h2r)
        |         ELSE 0 END AS h FROM h2r)
        |SELECT h2.node_id, CAST(h2.h AS BIGINT) AS hub_micro,
        |       CAST(a2.a AS BIGINT) AS auth_micro
        |FROM h2 JOIN a2 USING (node_id)""".stripMargin)),
  )
}
