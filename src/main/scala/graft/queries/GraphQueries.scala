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

    // WARM-START PageRank (VERDICT r13 #5 — the crawl-refresh path):
    // run 3 cold rounds, snapshot, then CONTINUE 2 more rounds seeded
    // from the snapshot via initialRanks. Because each round is a pure
    // function of the previous state, warm(2, seed = cold(3)) must equal
    // cold(5) EXACTLY — and that is what the oracle replays: five
    // integer-exact rounds from uniform. Hash-equality certifies the
    // warm continuation is bit-faithful to never having stopped, which
    // is precisely the property a refresh pipeline needs to trust
    // yesterday's ranks as today's starting state.
    GraftQuery(
      "graph_pagerank_warm",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        val snapshot = GraftGraph.pageRank(edges, iters = 3)
        GraftGraph.pageRank(edges, iters = 2,
                            initialRanks = Some(snapshot))
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
        |       FROM nodes n LEFT JOIN c3 USING (node_id)),
        |c4 AS (SELECT e.dst AS node_id, sum(r3.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r3 ON r3.node_id = e.src GROUP BY e.dst),
        |r4 AS (SELECT n.node_id,
        |         (15000000 + 85 * coalesce(c4.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c4 USING (node_id)),
        |c5 AS (SELECT e.dst AS node_id, sum(r4.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r4 ON r4.node_id = e.src GROUP BY e.dst),
        |r5 AS (SELECT n.node_id,
        |         (15000000 + 85 * coalesce(c5.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c5 USING (node_id))
        |SELECT node_id, CAST(r AS BIGINT) AS pr_micro FROM r5""".stripMargin)),

    // PageRank with DANGLING-MASS redistribution (VERDICT r12 #7): the
    // bipartite purchase graph is maximally sink-heavy — every part
    // node dangles — so this row exercises the variant where the
    // drop-dangling simplification is least defensible (crawl graphs:
    // every leaf page is a sink). Each round adds the one global scalar
    // ds = Σ r(dangling) and every node receives ds div n inside the
    // damped term — still integer-exact, and the oracle replays the
    // identical arithmetic: r' = (15·grid + 85·(Σ(r div deg)
    // + ds div n)) div 100 over 2 rounds.
    GraftQuery(
      "graph_pagerank_dangling",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        GraftGraph.pageRank(edges, iters = 2, danglingRedistribute = true)
      },
      Some(s"""WITH $edgeCte,
        |cnt AS (SELECT count(*) AS n FROM nodes),
        |srcs AS (SELECT DISTINCT src AS node_id FROM e),
        |r0 AS (SELECT node_id, 1000000::BIGINT AS r FROM nodes),
        |d0 AS (SELECT coalesce(sum(r), 0) AS ds FROM r0
        |       WHERE node_id NOT IN (SELECT node_id FROM srcs)),
        |c1 AS (SELECT e.dst AS node_id, sum(r0.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r0 ON r0.node_id = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node_id,
        |         (15000000 + 85 * (coalesce(c1.s, 0)
        |            + (SELECT ds FROM d0) // (SELECT n FROM cnt))) // 100 AS r
        |       FROM nodes n LEFT JOIN c1 USING (node_id)),
        |d1 AS (SELECT coalesce(sum(r), 0) AS ds FROM r1
        |       WHERE node_id NOT IN (SELECT node_id FROM srcs)),
        |c2 AS (SELECT e.dst AS node_id, sum(r1.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r1 ON r1.node_id = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node_id,
        |         (15000000 + 85 * (coalesce(c2.s, 0)
        |            + (SELECT ds FROM d1) // (SELECT n FROM cnt))) // 100 AS r
        |       FROM nodes n LEFT JOIN c2 USING (node_id))
        |SELECT node_id, CAST(r AS BIGINT) AS pr_micro FROM r2""".stripMargin)),

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

    // Personalized PageRank: teleport mass lands only on the SEED set
    // (urgent-priority orders — the "editorially trusted" stand-in), so
    // rank propagates outward from seeds through purchase links: a part
    // scores high exactly when urgent orders buy it, an order when it
    // shares parts with the urgent neighborhood. The curation recipe —
    // quality flows from vetted documents — as one oracled query.
    // 2 iterations: r0 = grid·[seed]; r' = (15·grid·[seed]
    // + 85·Σ(r div deg)) div 100, all integral.
    GraftQuery(
      "graph_ppr",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        val seeds = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select((col("o_orderkey") * 2).as("node_id"))
        GraftGraph.personalizedPageRank(edges, seeds, iters = 2)
      },
      Some(s"""WITH $edgeCte,
        |sd AS (SELECT DISTINCT o_orderkey * 2 AS node_id FROM orders
        |       WHERE o_orderpriority = '1-URGENT'),
        |nb AS (SELECT n.node_id,
        |         CASE WHEN sd.node_id IS NULL THEN 0
        |              ELSE 15000000 END AS b
        |       FROM nodes n LEFT JOIN sd USING (node_id)),
        |r0 AS (SELECT node_id,
        |         CASE WHEN b > 0 THEN 1000000::BIGINT ELSE 0 END AS r
        |       FROM nb),
        |c1 AS (SELECT e.dst AS node_id, sum(r0.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r0 ON r0.node_id = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node_id, (n.b + 85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nb n LEFT JOIN c1 USING (node_id)),
        |c2 AS (SELECT e.dst AS node_id, sum(r1.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r1 ON r1.node_id = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node_id, (n.b + 85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nb n LEFT JOIN c2 USING (node_id))
        |SELECT node_id, CAST(r AS BIGINT) AS pr_micro FROM r2""".stripMargin)),

    // Cross-family composition: centrality over the SIMILARITY graph the
    // near-dup miner produces — the template-page detector. A document
    // whose boilerplate echoes through many others sits central in the
    // near-dup graph (undirected: each mined pair contributes both
    // directions), so its PageRank flags it for template-stripping
    // review, a signal cluster size alone misses (a hub bridging many
    // small clusters outranks a member of one big clique). 2 integer
    // iterations over GraftDedup.nearDupPairs' word-3-shingle
    // Jaccard ≥ 0.8 pairs; the oracle replays the exact pair mine (the
    // dedup_minhash_lsh CTEs) then the exact arithmetic.
    GraftQuery(
      "graph_template_rank",
      (s, dir) => {
        val pairs = DedupQueries.minhashLshPairs(s, dir)
        val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
          .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        GraftGraph.pageRank(edges, iters = 2)
          .withColumnRenamed("node_id", "doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                                FOR i IN range(1, len(tk) - 1)]) s
        |  FROM toks WHERE len(tk) >= 3),
        |ee AS (SELECT doc_id, unnest(s) g FROM sh),
        |sz AS (SELECT doc_id, count(*) n FROM ee GROUP BY doc_id),
        |pair AS (
        |  SELECT a.doc_id a_id, b.doc_id b_id, count(*) i
        |  FROM ee a JOIN ee b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |np AS (
        |  SELECT a_id, b_id FROM pair
        |  JOIN sz sa ON sa.doc_id = a_id
        |  JOIN sz sb ON sb.doc_id = b_id
        |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8),
        |e AS (SELECT a_id AS src, b_id AS dst FROM np
        |      UNION SELECT b_id, a_id FROM np),
        |nodes AS (SELECT DISTINCT src AS node_id FROM e
        |          UNION SELECT DISTINCT dst FROM e),
        |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        |r0 AS (SELECT node_id, 1000000::BIGINT AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node_id, sum(r0.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r0 ON r0.node_id = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node_id, (15000000 + 85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c1 USING (node_id)),
        |c2 AS (SELECT e.dst AS node_id, sum(r1.r // d.dg) AS s
        |       FROM e JOIN deg d ON d.src = e.src
        |       JOIN r1 ON r1.node_id = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node_id, (15000000 + 85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN c2 USING (node_id))
        |SELECT node_id AS doc_id, CAST(r AS BIGINT) AS pr_micro
        |FROM r2""".stripMargin)),

    // Community detection by synchronous label propagation (4 fixed
    // rounds, min-label ties) over the undirected purchase graph —
    // the community signal that splits a connected component along its
    // dense cores (template families, link farms). Every round is
    // integer-exact and order-free (count argmax with deterministic
    // ties), so the oracle replays the rounds verbatim. Sync-LPA
    // oscillation on 2-colorable structures is why the budget is FIXED
    // (operator scaladoc) — the replay reads the same round.
    GraftQuery(
      "graph_lpa_communities",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val edges = li.select((col("l_orderkey") * 2).as("src"),
                              (col("l_partkey") * 2 + 1).as("dst"))
        GraftGraph.labelPropagation(edges, iters = 4)
      },
      Some("""WITH e AS (SELECT DISTINCT l_orderkey * 2 AS src,
        |                        l_partkey * 2 + 1 AS dst FROM lineitem),
        |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |l0 AS (SELECT DISTINCT src AS node_id, src AS lbl FROM und),
        |l1 AS (SELECT node_id, lbl FROM (
        |    SELECT u.dst AS node_id, l0.lbl,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY count(*) DESC, l0.lbl) rn
        |    FROM und u JOIN l0 ON l0.node_id = u.src
        |    GROUP BY u.dst, l0.lbl) WHERE rn = 1),
        |l2 AS (SELECT node_id, lbl FROM (
        |    SELECT u.dst AS node_id, l1.lbl,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY count(*) DESC, l1.lbl) rn
        |    FROM und u JOIN l1 ON l1.node_id = u.src
        |    GROUP BY u.dst, l1.lbl) WHERE rn = 1),
        |l3 AS (SELECT node_id, lbl FROM (
        |    SELECT u.dst AS node_id, l2.lbl,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY count(*) DESC, l2.lbl) rn
        |    FROM und u JOIN l2 ON l2.node_id = u.src
        |    GROUP BY u.dst, l2.lbl) WHERE rn = 1),
        |l4 AS (SELECT node_id, lbl FROM (
        |    SELECT u.dst AS node_id, l3.lbl,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY count(*) DESC, l3.lbl) rn
        |    FROM und u JOIN l3 ON l3.node_id = u.src
        |    GROUP BY u.dst, l3.lbl) WHERE rn = 1)
        |SELECT node_id, CAST(lbl AS BIGINT) AS community FROM l4""".stripMargin)),
  )
}
