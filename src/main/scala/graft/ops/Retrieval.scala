package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text corpus retrieval: BM25 (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework") top-k search over the `documents`
  * table — the missing READ-side family next to the dedup/quality WRITE-side
  * ops. A curation pipeline runs exactly this shape for corpus audits
  * ("which docs match this probe?"), decontamination triage, and
  * seed-set bootstrapping for the quality classifiers ([[TextOps.nbQualityScore]]).
  *
  * Determinism contract (mirrored exactly by `OpsOracle.bm25TopK`):
  *  - tokens = the corpus-wide whitespace discipline ([[TextOps.splitToks]]);
  *    query terms are DISTINCT per query (qtf folded to 1 — the standard
  *    short-query simplification).
  *  - every per-(doc, term) contribution is rounded to integer MICRO-nats by
  *    [[bm25TermMicro]] (StrictMath.log, fixed evaluation order) BEFORE the
  *    per-doc sum, so the score is an exact long sum — bit-identical at any
  *    parallelism, like the `log_prob_micro` family.
  *  - ranking = (score_micro desc, doc_id asc): a total order.
  *  - corpus stats (N, Σdl) include zero-length docs (they are indexed, they
  *    just can never match); terms absent from the corpus contribute nothing;
  *    a query with zero matching docs emits zero rows.
  *
  * Scale shape (the inverted-index-free streaming plan): the query set is
  * tiny and ships map-side (an `isin` filter + a `broadcast` of (q_id, term)
  * and the ≤|terms|-row df table). The corpus token stream is filtered to
  * query-term HITS before anything widens, so the only exchanges carry
  *  (1) (doc_id, term) tf partials — map-side combined, bounded by hits;
  *  (2) (q_id, doc_id) score partials — bounded by hits;
  *  (3) the two-phase top-k heap survivors — ≤ parts×k rows.
  * Corpus text never shuffles. The (N, Σdl) corpus stats are ONE scalar
  * aggregate collected up front — the "index statistics" pass every BM25
  * engine precomputes; at 100 TB it is a single column scan that AQE cannot
  * be asked to fuse anyway because the literals parameterize codegen.
  */
object Retrieval {

  /** One (doc, term) BM25 contribution in integer micro-nats.
    *
    * idf = ln(1 + (N − df + ½)/(df + ½))  (the Lucene/ATIRE non-negative
    * variant), tf-norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) with
    * avgdl = Σdl/N. k1 and b arrive in per-mille (1200 = 1.2, 750 = 0.75)
    * so callers cannot introduce unshared double literals. Fixed evaluation
    * order + StrictMath.log ⇒ bit-identical on every JVM; called from
    * generated code by [[graft.functions.Bm25MicroExpr]].
    */
  def bm25TermMicro(tf: Long, df: Long, dl: Long, nDocs: Long, sumDl: Long,
                    k1Pm: Int, bPm: Int): Long = {
    val idf = StrictMath.log(1.0d + (nDocs.toDouble - df.toDouble + 0.5d) / (df.toDouble + 0.5d))
    val k1 = k1Pm.toDouble / 1000.0d
    val b = bPm.toDouble / 1000.0d
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val norm = (tf.toDouble * (k1 + 1.0d)) /
      (tf.toDouble + k1 * (1.0d - b + b * (dl.toDouble / avgdl)))
    Math.round(idf * norm * 1e6d)
  }

  /** The fixed probe set for the driver gate (shared by the query and the
    * golden-oracle writer so both score the same searches). q4 is an
    * absent-term probe (zero rows by contract); q5 has a repeated term
    * (distinct-terms contract live).
    */
  val GateQueries: Seq[(Long, String)] = Seq(
    0L -> "join hash batch",
    1L -> "customer filter",
    2L -> "scan column row",
    3L -> "slow small join",
    4L -> "zzz_absent",
    5L -> "hash hash join")

  private def queryTerms(queries: Seq[(Long, String)]): Seq[(Long, String)] =
    queries.flatMap { case (q, text) =>
      text.trim.split(TextOps.WsPlus).filter(_.nonEmpty).distinct.map(q -> _)
    }

  /** BM25 top-k per query. Output: (q_id, doc_id, rank, score_micro).
    *
    * `reliableCheckpointDir`: the hit table below is materialized eagerly
    * (both the df derivation and the scoring join consume it); pass a DFS
    * dir so that cut survives executor loss at cluster scale — the same
    * fault-tolerance switch as the `Dedup` family (VERDICT round 3 item 1).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int = 10,
               k1Pm: Int = 1200, bPm: Int = 750,
               reliableCheckpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    require(queries.nonEmpty, "queries must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.Functions.bm25_micro

    val qt = queryTerms(queries)
    val terms = qt.map(_._2).distinct
    require(terms.nonEmpty, "queries contain no terms")

    val base = docs.select(Dedup.idLong(col("doc_id"), "doc_id").as("doc_id"),
      TextOps.toksOrEmpty(col("text")).as("toks"))
    val withDl = base.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"), col("toks"))

    // index statistics: one scalar aggregate (N docs, total token mass)
    val stats = withDl.agg(count(lit(1)).cast("long"), sum(col("dl"))).head()
    val nDocs = stats.getLong(0)
    val sumDl = stats.getLong(1)
    require(nDocs > 0, "empty corpus")

    // hit stream: query-term tokens only survive past the scan (map-side
    // InSet over the tiny term list), then ONE map-side-combined tf shuffle.
    // MATERIALIZED eagerly: both the df derivation and the scoring join
    // consume this table — without the cut, each would re-run the corpus
    // token scan. The materialized table is hits-sized, not corpus-sized;
    // reliableCheckpointDir picks the executor-loss-tolerant mode.
    val tf = Dedup.materialize(withDl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl")),
      reliableCheckpointDir)

    // document frequency per term: a second aggregate over the tf table's
    // output (≤ |terms| rows result); broadcast back into the hit stream
    val dfTbl = tf.groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
    val qTbl = qt.toDF("q_id", "tok")

    val scored = tf
      .join(broadcast(dfTbl), Seq("tok"))
      .join(broadcast(qTbl), Seq("tok"))
      .select(col("q_id"), col("doc_id"),
        bm25_micro(col("tf"), col("df"), col("dl"),
          nDocs, sumDl, k1Pm, bPm).as("s"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))

    Similarity.topKPerQuery(
      scored.select(col("q_id"), col("doc_id").as("n_id"),
        col("score").cast("double").as("score")), k)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rank"),
        col("score").cast("long").as("score_micro"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009 — the
    * score-free rank combiner hybrid search standardized on: BM25 and
    * dense-ANN scores live on incomparable scales, so fuse the RANKS):
    * each input ranking contributes `1e6 div (kRrf + rank)` micro-units
    * per (q_id, doc_id) entry; contributions sum and the fused top-k per
    * query is returned as (q_id, doc_id, rank, rrf_micro). Integral
    * division keeps every contribution a Long, so the fusion is
    * bit-deterministic and engine-restatable (the gate recomputes it in
    * ANSI SQL over the two goldens). Queries present in only some
    * rankings fuse over what exists — RRF's standard behavior.
    *
    * Scale shape: inputs are top-k tables (≤ |queries|·k rows each — the
    * expensive corpus work already happened inside BM25/ANN), so the
    * union + sum is a sparse aggregate; ranking reuses the two-phase heap
    * top-k, never a global window.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1, "k >= 1")
    require(kRrf >= 0, "kRrf >= 0")
    val contribs = rankings.map(_.select(
        col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        expr(s"1000000L div (${kRrf}L + CAST(rank AS BIGINT))").as("c")))
      .reduce(_ unionByName _)
    val fused = contribs.groupBy("q_id", "doc_id")
      .agg(sum(col("c")).cast("long").as("rrf_micro"))
    Similarity.topKPerQuery(
      fused.select(col("q_id"), col("doc_id").as("n_id"),
        col("rrf_micro").cast("double").as("score")), k)
      .select(col("q_id"), col("n_id").as("doc_id"),
        col("rank").cast("long").as("rank"),
        col("score").cast("long").as("rrf_micro"))
  }

  /** Rank-quality evaluation of a retrieval run — the "measure, don't
    * guess" harness for the BM25/hybrid stack: reciprocal rank of the
    * first CONJUNCTIVE match (a doc containing EVERY distinct query term —
    * boolean-AND relevance, the classic judgment-free proxy) plus the
    * conjunctive-match count inside the top-k. Returns one row per query:
    * (q_id, n_rel_topk, first_rel_rank, rr_micro) with rr_micro =
    * 10^6 div first_rel_rank, 0 when nothing relevant ranked (q4's
    * absent-term probe stays a live zero row). Mean rr_micro over queries
    * is MRR·10^6.
    *
    * Scale shape: `ranked` is k·|Q| rows — it BROADCASTS into the corpus
    * scan, so relevance is only ever evaluated on ranked candidates (the
    * corpus is pruned by the broadcast hash join, never shuffled); the
    * query-term arrays ride along as a second broadcast and the
    * containment check is an in-row `forall`. Everything after the scan
    * is |Q|-sized.
    */
  def mrrEval(docs: DataFrame, ranked: DataFrame,
              queries: Seq[(Long, String)]): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("q_id", "qtext")
    val qTerms = qdf.select(col("q_id"),
      array_distinct(split(trim(col("qtext")), TextOps.WsPlus)).as("qterms"))
    val cand = docs.select(Dedup.idLong(col("doc_id"), "doc_id").as("doc_id"),
        TextOps.toksOrEmpty(col("text")).as("toks"))
      .join(broadcast(ranked.select(col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))), Seq("doc_id"))
    val rel = cand.join(broadcast(qTerms), Seq("q_id"))
      .where(forall(col("qterms"), t => array_contains(col("toks"), t)))
      .groupBy("q_id")
      .agg(count(lit(1)).cast("long").as("n_rel_topk"),
        min(col("rank")).cast("long").as("fr"))
    qdf.select(col("q_id")).join(rel, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_rel_topk"), lit(0L)).as("n_rel_topk"),
        coalesce(col("fr"), lit(0L)).as("first_rel_rank"),
        when(col("fr").isNotNull, expr("1000000L div fr"))
          .otherwise(lit(0L)).as("rr_micro"))
  }

  /** The fixed phrase-probe set for the driver gate. p2/p4 repeat a term
    * ("a a" / "a a the") so the offset-alignment core is exercised on the
    * self-overlapping case a distinct-terms shortcut would get wrong; p3 is
    * the zero-hit probe (absent tokens emit no rows by contract).
    */
  val GatePhrases: Seq[(Long, String)] = Seq(
    0L -> "table hash",
    1L -> "slow hash batch",
    2L -> "a a",
    3L -> "zzz absent phrase",
    4L -> "a a the",
    5L -> "part filter scan")

  /** Exact multi-token phrase search over positional postings — the
    * adjacency query BM25's bag-of-words scoring cannot express (a doc
    * containing every term scattered across paragraphs is a BM25 hit but
    * not a phrase hit). The curation uses are boolean-phrase corpus audits
    * ("find every doc containing this exact sentence fragment") and
    * benchmark-contamination triage, where scattered-term matches are
    * noise.
    *
    * Algorithm (the classic positional-index intersection, restated as one
    * aggregation instead of a k-way self-join): tokenize → positional
    * postings (doc_id, pos, tok) → keep only postings whose token occurs in
    * some phrase (map-side InSet) → join the broadcast (tok, q_id, offset j,
    * phrase length) table and normalize each hit to its implied phrase
    * START `pos − j` → an occurrence exists at a start iff ALL offsets
    * 0..len−1 matched there: `countDistinct(j) == len` per
    * (q_id, doc_id, start). Repeated phrase terms need no special case —
    * each posting simply aligns to every offset the term occupies, and the
    * distinct-offset count is still exact. Output, one row per matching
    * (q_id, doc_id): n_hits (occurrence count) and first_pos (1-based token
    * index of the first occurrence); phrases with no match emit no rows.
    *
    * Scale shape: phrases are tiny and ship map-side (InSet filter +
    * broadcast join — the corpus is never shuffled as text); the only
    * exchanges carry (q_id, doc_id, start) hit partials, map-side combined
    * and bounded by term hits, then the |matches|-sized rollup. A
    * stop-word-only phrase fattens the hit stream linearly (its postings),
    * never quadratically — there is no pairwise join anywhere.
    */
  /** Windowed proximity search — the relaxation between [[phraseSearch]]
    * (exact adjacency) and [[bm25TopK]] (no position constraint at all): a
    * doc matches probe q iff ALL of q's distinct terms co-occur inside some
    * `window`-token span, in any order. The classic "terms near each other"
    * relevance predicate — a doc mentioning "license" in §1 and "apache" in
    * §9 is a bag-of-words hit but not a proximity hit.
    *
    * Restated as the same start-alignment aggregation as [[phraseSearch]]:
    * each posting of term t at position p witnesses every window START in
    * `[p − window + 1, p]` (an in-row `sequence` explode — `window`× the
    * hit stream, a plan-time constant, never corpus-sized), and a start
    * matches iff `countDistinct(term) == |distinct terms|` there. Here the
    * distinct count is REQUIRED (the same term may repeat inside one
    * window), unlike the phrase op where uniqueness is structural. Output,
    * one row per matching (q_id, doc_id): n_windows (count of matching
    * start positions — a crude within-doc proximity density) and first_pos
    * (1-based earliest matching start). Witness starts are clamped at 0 on
    * the doc head (`greatest(p − window + 1, 0)`); windows hanging past the
    * doc tail need no clamp — they can only match if the terms actually
    * present in the tail cover the probe, so no phantom matches arise.
    *
    * Scale shape identical to [[phraseSearch]]: broadcast probe table,
    * map-side InSet cut, two map-side-combined aggregates keyed by
    * (q_id, doc_id, start) then (q_id, doc_id); the countDistinct expand is
    * bounded by term hits × window, never by the corpus.
    */
  def windowSearch(docs: DataFrame, probes: Seq[(Long, String)],
                   window: Int = 8): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    require(window >= 1, "window >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // (q_id, tok, n_terms) — DISTINCT terms per probe (repeats in the probe
    // text don't change the predicate)
    val pt = probes.flatMap { case (q, text) =>
      val toks = text.trim.split(TextOps.WsPlus).filter(_.nonEmpty).distinct
      require(toks.nonEmpty, s"probe $q has no tokens")
      toks.iterator.map(t => (q, t, toks.length))
    }
    val terms = pt.map(_._2).distinct
    val ptTbl = pt.toDF("q_id", "tok", "n_terms")

    val postings = docs.select(
        Dedup.idLong(col("doc_id"), "doc_id").as("doc_id"),
        posexplode(TextOps.toksOrEmpty(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok").isin(terms: _*))

    postings.join(broadcast(ptTbl), Seq("tok"))
      .select(col("q_id"), col("doc_id"), col("tok"), col("n_terms"),
        explode(sequence(
          greatest(col("pos") - lit(window - 1), lit(0)),
          col("pos"))).as("start"))
      .groupBy("q_id", "doc_id", "start")
      .agg(countDistinct(col("tok")).as("n_here"), max(col("n_terms")).as("n_terms"))
      .where(col("n_here") === col("n_terms"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_windows"),
        (min(col("start")) + 1).cast("long").as("first_pos"))
  }

  def phraseSearch(docs: DataFrame,
                   phrases: Seq[(Long, String)]): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    // (q_id, tok, offset, len) — one row per phrase-token POSITION
    val pt = phrases.flatMap { case (q, text) =>
      val toks = text.trim.split(TextOps.WsPlus).filter(_.nonEmpty)
      require(toks.nonEmpty, s"phrase $q has no tokens")
      toks.iterator.zipWithIndex.map { case (t, j) => (q, t, j, toks.length) }
    }
    val terms = pt.map(_._2).distinct
    val ptTbl = pt.toDF("q_id", "tok", "j", "len")

    val postings = docs.select(
        Dedup.idLong(col("doc_id"), "doc_id").as("doc_id"),
        posexplode(TextOps.toksOrEmpty(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok").isin(terms: _*))

    // (q_id, doc_id, start, j) rows are unique by construction — pos is
    // determined as start + j and posexplode emits each position once — so
    // a plain count equals the distinct-offset count without the extra
    // expand + exchange a countDistinct would plan
    postings.join(broadcast(ptTbl), Seq("tok"))
      .select(col("q_id"), col("doc_id"),
        (col("pos") - col("j")).as("start"), col("len"))
      .where(col("start") >= 0)
      .groupBy("q_id", "doc_id", "start")
      .agg(count(lit(1)).as("n_matched"), max(col("len")).as("len"))
      .where(col("n_matched") === col("len"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        (min(col("start")) + 1).cast("long").as("first_pos"))
  }
}
