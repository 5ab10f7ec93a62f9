package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import GraftSimilarity.IvfIndex

/** Hybrid lexical + semantic retrieval with reciprocal-rank fusion —
  * the standard RAG serving recipe (Cormack/Clarke/Büttcher's RRF,
  * SIGIR 2009): each query runs BM25 over the token corpus AND cosine
  * retrieval over the embedding corpus, the two top-`kCand` candidate
  * lists are fused by `score = Σ_legs 1/(rrfK + rank)`, and the fused
  * top-`k` ships with both per-leg ranks attached so a caller can see
  * WHY a hit surfaced (lexical match, semantic match, or both).
  *
  * Two semantic tiers, one fusion contract (fusion is RANK-ONLY, so the
  * fused semantics are identical wherever the candidate lists come from):
  *
  *   - [[hybridTopK]] — exact-cosine semantic leg
  *     ([[GraftSimilarity.bruteForceTopK]]): the eval/verification tier,
  *     one linear scan of the embedding corpus per query minibatch.
  *   - [[hybridTopKWith]] — the SERVED tier: the semantic leg probes a
  *     built [[GraftSimilarity.IvfIndex]] through
  *     [[GraftSimilarity.ivfTopKWith]], so against the at-rest store each
  *     query batch reads only its probed cells' files (the DPP-pruned
  *     serve path) instead of scanning the corpus. The IVF recall trade
  *     applies to that leg only — with `nprobe` covering all cells the
  *     output equals [[hybridTopK]]'s exactly (HybridSpec pins it).
  *
  * Scale shape — each leg is the already-audited retrieval kernel:
  *   - lexical: [[TextRank.bm25Scores]] — THE single BM25 kernel (also
  *     behind [[TextRank.bm25TopK]]; one formula, one home, r10's dual
  *     kernels consolidated): corpus token stream gated by a broadcast
  *     semi-join on the query-term set, per-(doc, term) stats shared
  *     across queries, df/corpus stats as skinny broadcast aggregates.
  *   - semantic: broadcast query block → pure map over the embedding
  *     scan (brute tier), or broadcast probe rows → DPP-pruned cell scan
  *     (served tier); either way `graft_topk`'s k-slot heap moves only
  *     `kCand` rows per query per partition.
  *   - fusion: both legs are capped at `kCand` rows per query BEFORE
  *     the full-outer rank join, so fusion touches ≤ 2·kCand rows per
  *     query REGARDLESS of corpus size — the window that assigns the
  *     fused rank sorts per-query lists of ≤ 2·kCand rows, never a
  *     corpus-sized partition.
  *
  * Determinism contract (the cross-engine stance of the whole catalog):
  * per-term BM25 addends quantize to a 1e-6 grid BEFORE the
  * order-insensitive integer sum; ranks are integers; the fused score
  * is an integer sum of two rank-derived integers on a 1e-9 grid — so
  * every emitted column is exactly replayable in SQL. Ties break on
  * doc id at every rank assignment.
  */
object HybridRetrieval {

  /** Lexical leg: per-query BM25 top-`kCand` ranks via the shared
    * [[TextRank.bm25Scores]] kernel. The query's own document is
    * excluded AFTER the aggregation — sound because groups are atomic in
    * (q_id, doc_id). The per-query kCand cut rides the mergeable
    * `graft_topk` heap (long scores < 2^53 are exact as doubles);
    * position in the heap output IS the rank.
    */
  private def lexRanks(docs: DataFrame, q: DataFrame, kCand: Int,
                       idCol: String, textCol: String,
                       k1: Double, b: Double): DataFrame = {
    val qTerms = q.select(col("q_id"),
                          explode(array_distinct(col("__qtk"))).as("__term"))
    TextRank.bm25Scores(docs, qTerms, idCol, textCol, k1, b)
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id")
      .agg(expr(s"graft_topk(cast(__score AS double), doc_id, $kCand)")
             .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("q_id"), col("s.id").as("doc_id"),
              (col("p") + 1).cast("long").as("lex_rank"))
  }

  /** Fuse two per-query rank lists (≤ kCand rows each) by reciprocal
    * rank: `rrf = Σ_legs round(1e9 / (rrfK + rank))`, NULL leg → 0.
    * Output (q_id, doc_id, rank, rrf, lex_rank, sem_rank). */
  private def fuse(lex: DataFrame, sem: DataFrame, k: Int,
                   rrfK: Int): DataFrame = {
    def leg(rank: Column): Column =
      coalesce(round(lit(1e9) / (lit(rrfK) + rank), 0).cast("long"),
               lit(0L))
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
              (leg(col("lex_rank")) + leg(col("sem_rank"))).as("rrf"),
              col("lex_rank"), col("sem_rank"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("rrf"),
              col("lex_rank"), col("sem_rank"))
  }

  private def requireParams(k: Int, kCand: Int, rrfK: Int, ctx: String)
      : Unit = {
    require(k >= 1, s"$ctx: k must be >= 1, got $k")
    require(kCand >= 1, s"$ctx: kCand must be >= 1, got $kCand")
    require(rrfK >= 1, s"$ctx: rrfK must be >= 1, got $rrfK")
  }

  /** Project the caller's query minibatch to the canonical (q_id, __qtk,
    * __qv) frame and PERSIST it: the minibatch is small by the serving
    * contract but its DERIVATION is the caller's — often a join against
    * the corpus (the bench rows derive it docs⋈embeddings) — and one
    * fused serve evaluates the subtree repeatedly: the term-set /
    * survivor collects and the |Q| count are driver actions, then the
    * final plan evaluates it again in each leg (r17 ProbePhases measured
    * 3-5 evaluations, ~0.12 s each, per serve at sf0.1 — guide §1.2,
    * fewer passes). Persist is lazy (first action materializes, the rest
    * read cache) and scale-safe (the serving contract bounds |Q|);
    * streaming frames pass through untouched — persist throws on them.
    */
  private def qBatch(queries: DataFrame, qIdCol: String, qTermsCol: String,
                     qVecCol: String, castId: Boolean = false): DataFrame = {
    val id = if (castId) col(qIdCol).cast("long") else col(qIdCol)
    val q = queries.select(id.as("q_id"), col(qTermsCol).as("__qtk"),
                           col(qVecCol).as("__qv"))
    if (!q.isStreaming) q.persist()
    q
  }

  /** Fused top-`k` per query, exact-cosine semantic leg. `queries`
    * carries one row per query: (`qIdCol`, `qTermsCol`:
    * array&lt;string&gt;, `qVecCol`: array&lt;double&gt;) — a
    * training/serving minibatch, small by construction, broadcast into
    * both legs. The query's own document (same id) is excluded from both
    * legs. Output: (q_id, doc_id, rank, rrf, lex_rank, sem_rank) with a
    * NULL leg rank meaning the document surfaced on the other leg only.
    */
  def hybridTopK(docs: DataFrame, vecs: DataFrame, queries: DataFrame,
                 k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                 idCol: String = "doc_id", textCol: String = "text",
                 vecIdCol: String = "vec_id", vecCol: String = "v",
                 qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                 qVecCol: String = "qv",
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopK")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val sem = GraftSimilarity.bruteForceTopK(
        vecs, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** The SERVED fused top-`k`: semantic leg through a built
    * [[GraftSimilarity.IvfIndex]] at `nprobe` probed cells per query —
    * against the at-rest store this is the DPP-pruned probe path, so a
    * RAG deployment fuses BM25 with the index it already serves instead
    * of a corpus scan. Same output contract as [[hybridTopK]]; documents
    * whose cell is not probed can only surface via the lexical leg (the
    * standard IVF recall trade, confined to the semantic leg — and with
    * `nprobe` ≥ the cell count the two tiers are EQUAL, which is the
    * spec's parity pin).
    */
  def hybridTopKWith(index: IvfIndex, docs: DataFrame, queries: DataFrame,
                     k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                     nprobe: Int = 4,
                     idCol: String = "doc_id", textCol: String = "text",
                     qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                     qVecCol: String = "qv",
                     k1: Double = 1.2, b: Double = 0.75,
                     where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWith")
    require(nprobe >= 1, s"hybridTopKWith: nprobe must be >= 1, got $nprobe")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    // METADATA-FILTERED fusion: `where` filters the SEMANTIC leg's
    // candidate population (the predicate lives in the index — see
    // ivfTopKWith). The LEXICAL leg's population is the `docs` frame the
    // caller passes — pre-filter it to the same population (BM25's
    // df/avgdl then describe exactly the filtered corpus, which is the
    // correct pre-filter statistic; a post-hoc doc filter would keep the
    // unfiltered corpus's term weights).
    val sem = GraftSimilarity.ivfTopKWith(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand, nprobe,
        where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** The fused top-`k` over the q8 (8×) tier: semantic leg through
    * [[GraftSimilarity.ivfTopKWithQ8]] — integer candidate scoring off
    * the store's byte-packed `q8` column in the probed cells, exact
    * rerank of kCand·rerankFactor survivors — behind the same rank-only
    * fusion contract. Completes the serving matrix (brute / IVF / q8 /
    * PQ, each behind one fusion): at a covering budget the q8 cut loses
    * nothing, so covering nprobe + covering rerankFactor equals
    * [[hybridTopK]] exactly (spec-pinned). `index.assigned` must carry
    * `q8` (stores written at r11+ do; [[GraftSimilarity.q8Augment]] for
    * in-memory indexes).
    */
  def hybridTopKWithQ8(index: IvfIndex, docs: DataFrame, queries: DataFrame,
                       k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                       nprobe: Int = 4, rerankFactor: Int = 4,
                       idCol: String = "doc_id", textCol: String = "text",
                       qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                       qVecCol: String = "qv",
                       k1: Double = 1.2, b: Double = 0.75,
                       where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithQ8")
    require(nprobe >= 1, s"hybridTopKWithQ8: nprobe must be >= 1, got $nprobe")
    require(rerankFactor >= 1,
      s"hybridTopKWithQ8: rerankFactor must be >= 1, got $rerankFactor")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val sem = GraftSimilarity.ivfTopKWithQ8(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        nprobe, rerankFactor, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** The fused top-`k` over the int4 (16×) tier: semantic leg through
    * [[GraftSimilarity.ivfTopKWithQ4]] — integer candidate scoring off
    * the store's nibble-packed `q4` column, exact rerank of
    * kCand·rerankFactor survivors — completing the fusion matrix
    * (brute / IVF / q8 / q4 / PQ behind ONE rank-only contract).
    * `index.assigned` must carry `q4` (a store written with
    * `writeIvfIndex(q4 = true)`, or [[GraftSimilarity.q4Augment]] for
    * in-memory indexes — the tier is opt-in at write). At covering
    * nprobe + covering rerankFactor the output equals [[hybridTopK]]
    * exactly, the same parity contract as the q8/PQ rungs.
    */
  def hybridTopKWithQ4(index: IvfIndex, docs: DataFrame, queries: DataFrame,
                       k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                       nprobe: Int = 4, rerankFactor: Int = 4,
                       idCol: String = "doc_id", textCol: String = "text",
                       qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                       qVecCol: String = "qv",
                       k1: Double = 1.2, b: Double = 0.75,
                       where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithQ4")
    require(nprobe >= 1, s"hybridTopKWithQ4: nprobe must be >= 1, got $nprobe")
    require(rerankFactor >= 1,
      s"hybridTopKWithQ4: rerankFactor must be >= 1, got $rerankFactor")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val sem = GraftSimilarity.ivfTopKWithQ4(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        nprobe, rerankFactor, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** The fused top-`k` over the ONE-BIT tier: semantic leg through
    * [[GraftSimilarity.ivfTopKWithB1]] — XOR+POPCNT Hamming candidate
    * scoring off the store's sign-packed `b1` column in the probed
    * cells (the cheapest candidate kernel of the ladder), exact rerank
    * of kCand·rerankFactor survivors — behind the same rank-only fusion
    * contract. Completes the fusion matrix at the bottom of the
    * vector-bytes ladder (brute / IVF / q8 / q4 / b1 / PQ / MaxSim).
    * The coarsest rung drops the most true semantic candidates at a
    * given budget (size `rerankFactor` from a [[GraftSimilarity
    * .tierRecall]] measurement); lexical candidates survive any
    * semantic cut, the fusion contract's usual guarantee. Requires `b1`
    * on `index.assigned` (opt-in at write; [[GraftSimilarity.b1Augment]]
    * for in-memory). */
  def hybridTopKWithB1(index: IvfIndex, docs: DataFrame, queries: DataFrame,
                       k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                       nprobe: Int = 4, rerankFactor: Int = 4,
                       idCol: String = "doc_id", textCol: String = "text",
                       qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                       qVecCol: String = "qv",
                       k1: Double = 1.2, b: Double = 0.75,
                       where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithB1")
    require(nprobe >= 1, s"hybridTopKWithB1: nprobe must be >= 1, got $nprobe")
    require(rerankFactor >= 1,
      s"hybridTopKWithB1: rerankFactor must be >= 1, got $rerankFactor")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val sem = GraftSimilarity.ivfTopKWithB1(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        nprobe, rerankFactor, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** The fused top-`k` over the 64× PQ tier: semantic leg through
    * [[GraftPq.ivfPqTopKWithCw]] — ADC candidate scoring off the store's
    * m-byte code words in the probed cells, exact rerank of
    * kCand·rerankFactor survivors — behind the SAME rank-only RRF fusion
    * contract as [[hybridTopKWith]] (VERDICT r11 missing #4). The PQ
    * recall trade is confined to the semantic leg and bounded by
    * `rerankFactor` (size it with [[GraftPq.pqAutoBudget]] — see
    * [[GraftPq.pqTopK]]'s budget warning); with `nprobe` covering every
    * cell and a covering budget the output equals [[hybridTopK]]'s
    * exactly (HybridSpec pins it). `index.assigned` must carry `cw`
    * (a PQ store snapshot, or [[GraftPq.writeIvfPqStore]]'s layout).
    */
  def hybridTopKWithPq(index: IvfIndex, cb: GraftPq.PqCodebook,
                       docs: DataFrame, queries: DataFrame,
                       k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                       nprobe: Int = 4, rerankFactor: Int = 4,
                       idCol: String = "doc_id", textCol: String = "text",
                       qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                       qVecCol: String = "qv",
                       k1: Double = 1.2, b: Double = 0.75,
                       where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithPq")
    require(nprobe >= 1, s"hybridTopKWithPq: nprobe must be >= 1, got $nprobe")
    require(rerankFactor >= 1,
      s"hybridTopKWithPq: rerankFactor must be >= 1, got $rerankFactor")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val sem = GraftPq.ivfPqTopKWithCw(
        index, cb, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        nprobe, rerankFactor, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, q, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** BM25 ⊕ late-interaction (MaxSim) fusion — the ColBERT deployment
    * shape: the lexical leg is the same [[TextRank.bm25Scores]] kernel,
    * the semantic leg is [[LateInteraction.maxSimTopKWith]] over a BUILT
    * token-level index (each query token probes its cells; token-granular
    * evidence a single pooled vector averages away), and the two
    * top-`kCand` lists fuse under the SAME rank-only RRF contract as
    * every other rung — so swapping pooled-vector retrieval for
    * late-interaction retrieval is a one-call change, not a new stack.
    * `queries` carries (qIdCol, qTextCol): BOTH legs derive from the
    * query TEXT — BM25 terms via whitespace tokens, MaxSim token vectors
    * via the same ±1 hash embedding the index was built with (`dim` /
    * `maxTokens` must match the build, the
    * [[graft.streaming.CorpusStreams.maxSimServeStream]] contract).
    */
  def hybridTopKWithMaxSim(index: IvfIndex, docs: DataFrame,
                           queries: DataFrame,
                           k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                           nprobe: Int = 4,
                           dim: Int = 8, maxTokens: Int = 16,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           qIdCol: String = "q_id",
                           qTextCol: String = "text",
                           k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithMaxSim")
    require(nprobe >= 1,
      s"hybridTopKWithMaxSim: nprobe must be >= 1, got $nprobe")
    graft.GraftSession.ensureExtensions(docs.sparkSession)
    // same minibatch-persist rationale as qBatch (text shape: both legs
    // re-derive from __qtext — tokens lexically, ±1 hash vectors
    // semantically — so the subtree is evaluated at least twice)
    val q = queries.select(col(qIdCol).cast("long").as("q_id"),
                           col(qTextCol).as("__qtext"))
    if (!q.isStreaming) q.persist()
    val lexQ = q.select(col("q_id"),
                        GraftText.whitespaceTokens(col("__qtext"))
                          .as("__qtk"))
    val qToks = LateInteraction.hashTokenVectors(
        q.select(col("q_id").as("doc_id"), col("__qtext").as("text")),
        dim = dim, maxTokens = maxTokens)
      .select(col("doc_id").as("q_id"), col("tok"), col("tv"))
    val sem = LateInteraction.maxSimTopKWith(index, qToks, kCand, nprobe)
      .select(col("q_id"), col("doc_id"), col("rnk").as("sem_rank"))
    fuse(lexRanks(docs, lexQ, kCand, idCol, textCol, k1, b), sem, k, rrfK)
  }

  /** DIVERSIFIED fusion: the hybrid serve's fused top-`kCand` candidate
    * list (lexical ∪ semantic, rank-fused — the CANDIDACY decision)
    * re-ranked by [[GraftSimilarity.mmrTopK]]'s MMR greedy with
    * relevance = exact cosine to the query embedding (the DIVERSITY
    * decision runs in embedding space — RRF scores live on a rank grid
    * too coarse and too small against cosine penalties to trade off
    * directly). The RAG serving shape for duplicate-heavy corpora:
    * hybrid retrieval decides what is RELEVANT, MMR stops the k slots
    * all going to one near-dup cluster.
    *
    * Every fused candidate must carry a vector in `index.assigned`
    * (lexical-only hits included — the corpus embedding side of the
    * fusion contract); candidates without one would silently drop, so
    * deploy over an embedding-covered corpus. Output (q_id, n_id, rank,
    * mmr) in selection order, the [[GraftSimilarity.mmrTopK]] contract;
    * cost beyond the fused serve is kCand cosines + the per-query
    * bounded greedy — no extra shuffle.
    */
  def hybridTopKWithMmr(index: IvfIndex, docs: DataFrame,
                        queries: DataFrame,
                        k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                        nprobe: Int = 4, lambda: Double = 0.5,
                        idCol: String = "doc_id", textCol: String = "text",
                        qIdCol: String = "q_id",
                        qTermsCol: String = "q_terms",
                        qVecCol: String = "qv",
                        k1: Double = 1.2, b: Double = 0.75,
                        where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithMmr")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"hybridTopKWithMmr: lambda must be in [0, 1], got $lambda")
    require(kCand >= k, s"hybridTopKWithMmr: kCand ($kCand) must be >= k ($k)")
    val fused = hybridTopKWith(index, docs, queries, k = kCand,
                               kCand = kCand, rrfK = rrfK, nprobe = nprobe,
                               idCol = idCol, textCol = textCol,
                               qIdCol = qIdCol, qTermsCol = qTermsCol,
                               qVecCol = qVecCol, k1 = k1, b = b,
                               where = where)
    val q = broadcast(queries.select(col(qIdCol).as("q_id"),
                                     col(qVecCol).as("__qv")))
    val src = index.assigned.select(col("n_id"), col("v"))
    val cand = fused.select(col("q_id"), col("doc_id").as("n_id"))
      .join(ScaleHints.gated(src), "n_id")
      .join(q, "q_id")
      .select(col("q_id"), col("n_id"),
              expr("graft_cosine(__qv, v)").as("rel"))
    GraftSimilarity.mmrRerank(cand, src, k, lambda)
  }

  /** The served fused top-`k` with the LEXICAL leg off an at-rest
    * [[ImpactIndex]] store (VERDICT r13 #1c): BM25 scores are sums of
    * the store's precomputed per-(term, doc) addends — bit-equal to
    * [[TextRank.bm25Scores]] by the shared-kernel construction — so the
    * output equals [[hybridTopKWith]] exactly at the same parameters
    * (the `ann_hybrid_ivf` oracle certifies this row verbatim) while
    * the corpus text is never re-tokenized at serve time. The scan
    * reads only the query terms' buckets: the minibatch's distinct term
    * set is collected once (model-sized, the survivor-fetch precedent)
    * and becomes literal partition predicates through
    * [[ImpactIndex.StoredImpacts.impactsFor]].
    *
    * The impact store must describe the same corpus the IVF index
    * serves and be built at the same (k1, b) — both live beside the
    * vector store in the deployment layout.
    */
  def hybridTopKWithImpacts(index: IvfIndex,
                            impacts: ImpactIndex.StoredImpacts,
                            queries: DataFrame,
                            k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                            nprobe: Int = 4,
                            qIdCol: String = "q_id",
                            qTermsCol: String = "q_terms",
                            qVecCol: String = "qv",
                            where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "hybridTopKWithImpacts")
    require(nprobe >= 1,
      s"hybridTopKWithImpacts: nprobe must be >= 1, got $nprobe")
    graft.GraftSession.ensureExtensions(queries.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol)
    val qt = q.select(col("q_id"),
                      explode(array_distinct(col("__qtk"))).as("__term"))
    val termList = qt.select(col("__term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val lex =
      if (termList.isEmpty)
        // no query terms at all: the lexical leg is empty, fusion
        // degrades to the semantic leg (the full-outer fuse contract)
        q.limit(0).select(col("q_id"), col("q_id").as("doc_id"),
                          lit(0L).as("lex_rank"))
      else impacts.impactsFor(termList)
        .join(broadcast(qt), "__term")
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("__a")).as("__score"))
        .groupBy("q_id")
        .agg(expr(s"graft_topk(cast(__score AS double), doc_id, $kCand)")
               .as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
        .select(col("q_id"), col("s.id").as("doc_id"),
                (col("p") + 1).cast("long").as("lex_rank"))
    val sem = GraftSimilarity.ivfTopKWith(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand, nprobe,
        where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** THE PRODUCTION SERVE (VERDICT r15 stretch #9): everything-at-rest
    * RAG retrieval in one composed plan — metadata filter + MaxScore-
    * PRUNED lexical leg off an at-rest impact store + quantized (q8)
    * IVF semantic leg off an at-rest vector store + RRF fusion + MMR
    * diversification. Every stage is a component certified elsewhere;
    * this method is the deployment composition: what a serving node
    * actually runs per query minibatch when both stores live beside
    * each other on an object store.
    *
    * The lexical leg is the MINIBATCH form of
    * [[ImpactIndex.bm25TopKPruned]] — per-QUERY essential splits in one
    * plan (a rank window over the broadcast query×bounds sliver instead
    * of a driver-side sort, since each query carries its own term set):
    * only each query's `essential` highest-max-impact terms' postings
    * generate candidates, candidates score exactly over all their
    * query-term postings, and the covering guard (skipped upper bound
    * strictly below the kCand-th candidate score, full heap required)
    * REFUSES per the batch operator's contract — a guard row per query
    * rides the output plan, so a zero-candidate query with skipped mass
    * refuses too instead of silently serving the semantic leg alone.
    * Postings scan stays bucket-pruned via [[ImpactIndex.StoredImpacts
    * .impactsFor]]'s literal predicates (minibatch term collect, the
    * survivor-fetch precedent).
    *
    * The semantic leg is [[GraftSimilarity.ivfTopKWithQ8]] off the
    * at-rest q8 column with `where` filtering the candidate scan BEFORE
    * the quantized cut (pre-filter semantics; predicate reaches the
    * reader beside the DPP cell prune). The two legs fuse at `kCand`
    * under the family RRF contract, and the fused candidacy re-ranks
    * through [[GraftSimilarity.mmrRerank]]'s bounded fold/explode
    * greedy with relevance = exact cosine to the query embedding
    * ([[hybridTopKWithMmr]]'s diversity contract).
    *
    * The impact store must describe the SAME (filtered) corpus the
    * `where` predicate selects — BM25's df/N/avgdl are pre-filter
    * statistics, so the store is built per allowed-source slice (the
    * `ann_hybrid_filtered` stance); pruning is exact by refusal, so the
    * unpruned-serve oracle certifies the whole composition verbatim.
    * Output (q_id, n_id, rank, mmr) in MMR selection order.
    */
  def serveProduction(index: IvfIndex,
                      impacts: ImpactIndex.StoredImpacts,
                      queries: DataFrame,
                      essential: Int = 1,
                      k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                      nprobe: Int = 4, rerankFactor: Int = 4,
                      lambda: Double = 0.5,
                      qIdCol: String = "q_id",
                      qTermsCol: String = "q_terms",
                      qVecCol: String = "qv",
                      where: Option[Column] = None): DataFrame = {
    requireParams(k, kCand, rrfK, "serveProduction")
    require(kCand >= k, s"serveProduction: kCand ($kCand) must be >= k ($k)")
    require(essential >= 1,
      s"serveProduction: essential must be >= 1, got $essential")
    require(nprobe >= 1,
      s"serveProduction: nprobe must be >= 1, got $nprobe")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"serveProduction: lambda must be in [0, 1], got $lambda")
    graft.GraftSession.ensureExtensions(queries.sparkSession)
    val q = qBatch(queries, qIdCol, qTermsCol, qVecCol, castId = true)
    val qt = q.select(col("q_id"),
                      explode(array_distinct(col("__qtk"))).as("__term"))
    val termList = qt.select(col("__term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val lex =
      if (termList.isEmpty)
        q.limit(0).select(col("q_id"), col("q_id").as("doc_id"),
                          lit(0L).as("lex_rank"))
      else {
        // per-query impact ordering: terms absent from the store have no
        // postings and drop from the split (the bm25TopKPruned rule)
        val bounds = impacts.terms
          .filter(col("__term").isin(termList: _*))
          .select(col("__term"), col("__maxa"))
        val tagged = qt.join(broadcast(bounds), Seq("__term"))
          .withColumn("__e", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("__maxa").desc, col("__term").asc))
            <= essential)
        val ne = tagged.filter(!col("__e"))
          .groupBy(col("q_id")).agg(sum(col("__maxa")).as("__ne"))
        val top = impacts.impactsFor(termList)
          .join(broadcast(tagged.select(col("q_id"), col("__term"),
                                        col("__e"))), "__term")
          .filter(col("doc_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("doc_id"))
          .agg(sum(col("__a")).as("__l"), max(col("__e")).as("__c"))
          .filter(col("__c"))
          .withColumn("lex_rank", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("__l").desc, col("doc_id").asc)).cast("long"))
          .filter(col("lex_rank") <= kCand)
        // the covering guard evaluates for EVERY query row — including
        // zero-candidate queries, which never reach `top`
        val stats = top.groupBy(col("q_id"))
          .agg(count(lit(1)).as("__cnt"), min(col("__l")).as("__th"))
        val guard = q.select(col("q_id"))
          .join(ne, Seq("q_id"), "left")
          .join(stats, Seq("q_id"), "left")
          .filter(assert_true(
            coalesce(col("__ne"), lit(0L)) === 0L ||
            (coalesce(col("__cnt"), lit(0L)) >= kCand &&
             col("__ne") < col("__th")),
            concat(lit(s"serveProduction: essential=$essential does not " +
                       s"cover kCand=$kCand for q_id="), col("q_id"),
                   lit(" — skipped-term upper bound is not strictly " +
                       "below the kCand-th candidate score; raise " +
                       "essential — a silently non-exact lexical leg " +
                       "is refused"))).isNull)
          .select(col("q_id"))
        top.join(guard, "q_id")
          .select(col("q_id"), col("doc_id"), col("lex_rank"))
      }
    val sem = GraftSimilarity.ivfTopKWithQ8(
        index, q.select(col("q_id"), col("__qv").as("qv")), kCand,
        nprobe, rerankFactor, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"),
              col("rnk").as("sem_rank"))
    val fused = fuse(lex, sem, kCand, rrfK)
    val qv = broadcast(q.select(col("q_id"), col("__qv")))
    val src = index.assigned.select(col("n_id"), col("v"))
    val cand = fused.select(col("q_id"), col("doc_id").as("n_id"))
      .join(ScaleHints.gated(src), "n_id")
      .join(qv, "q_id")
      .select(col("q_id"), col("n_id"),
              expr("graft_cosine(__qv, v)").as("rel"))
    GraftSimilarity.mmrRerank(cand, src, k, lambda)
  }

  /** [[hybridTopKWithPq]] straight off an at-rest PQ store
    * ([[GraftPq.writeIvfPqStore]] directory layout): one call from store
    * path to fused results — the RAG deployment shape where BM25 fuses
    * with the compressed index already being served. */
  def hybridTopKPqStored(spark: org.apache.spark.sql.SparkSession,
                         dir: String, docs: DataFrame, queries: DataFrame,
                         k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                         nprobe: Int = 4, rerankFactor: Int = 4,
                         idCol: String = "doc_id", textCol: String = "text",
                         qIdCol: String = "q_id",
                         qTermsCol: String = "q_terms",
                         qVecCol: String = "qv",
                         k1: Double = 1.2, b: Double = 0.75): DataFrame =
    hybridTopKWithPq(GraftSimilarity.readIvfIndex(spark, dir),
                     GraftPq.readPqCodebook(spark, dir), docs, queries,
                     k, kCand, rrfK, nprobe, rerankFactor, idCol, textCol,
                     qIdCol, qTermsCol, qVecCol, k1, b)
}
