package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse text RETRIEVAL over the corpus — the inverted-index top-k
  * shape of Lucene/Elasticsearch, as a batch operator (the keyword
  * counterpart of [[Similarity]]'s dense ANN family; extension beyond
  * the reference, which has no search surface).
  */
object TextRetrieval {

  /** Per-posting BM25 contribution on fixed-point integers — shared by
    * the plain and the max-score-pruned operators so both score
    * BIT-IDENTICALLY. Columns expected in scope: tf, df, dl, t_total,
    * n_docs. See [[bm25TopK]] for the derivation.
    */
  private val ContribSql =
    "((CAST(1000000 AS DECIMAL(38,0)) * (2 * (n_docs - df) + 1))" +
      " div (2 * df + 1))" +
      " * (CAST(88 AS DECIMAL(38,0)) * t_total * tf)" +
      " div (CAST(40 AS DECIMAL(38,0)) * t_total * tf" +
      " + 12 * t_total + 36 * dl * n_docs)"

  /** Per-TERM score ceiling: [[ContribSql]] evaluated at (tf = tfmax,
    * dl = dlmin). The real-valued factor tf/(40·T·tf + 12·T + 36·dl·N)
    * is increasing in tf and decreasing in dl, and floor is monotone,
    * so this integer is ≥ every posting's contribution for the term —
    * a PROVABLE bound, which is what keeps the pruned operator exact.
    */
  private val UbSql =
    "((CAST(1000000 AS DECIMAL(38,0)) * (2 * (n_docs - df) + 1))" +
      " div (2 * df + 1))" +
      " * (CAST(88 AS DECIMAL(38,0)) * t_total * tfmax)" +
      " div (CAST(40 AS DECIMAL(38,0)) * t_total * tfmax" +
      " + 12 * t_total + 36 * dlmin * n_docs)"

  private case class CorpusStats(tf: DataFrame, dl: DataFrame,
      dfreq: DataFrame, tot: DataFrame)

  /** One corpus tokenization feeding the tf/dl/df aggregates (ordinary
    * combiner shuffles, the only corpus-scaled work in either operator).
    */
  private def corpusStats(docs: DataFrame): CorpusStats = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tot = dl.agg(sum(col("dl")).as("t_total"), count(lit(1)).as("n_docs"))
    CorpusStats(tf, dl, dfreq, tot)
  }

  /** Exact BM25 scores for the given postings frame (query_id, doc_id,
    * tok, tf). The df and dl joins are pinned to sort-merge
    * (vocabulary- and corpus-scaled sides must never be broadcast —
    * the 100× probe's driver-OOM lesson).
    */
  private def exactScores(posts: DataFrame, st: CorpusStats): DataFrame =
    posts
      .join(st.dfreq.hint("merge"), "tok")
      .join(st.dl.hint("merge"), "doc_id")
      .crossJoin(broadcast(st.tot))
      .withColumn("c", expr(ContribSql))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_pm"))

  private def topK(scores: DataFrame, k: Int): DataFrame = {
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score_pm").desc, col("doc_id"))
    scores.withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= k)
  }

  /** Okapi BM25 top-k retrieval (Robertson & Walker's classic ranking,
    * k1 = 1.2, b = 0.75), rebuilt on FIXED-POINT integer arithmetic so
    * any SQL engine replays scores bit-for-bit:
    *
    *  - idf_pm(t)   = (10⁶ · (2·(N − df) + 1)) div (2·df + 1) — the
    *    RSJ odds ratio (N − df + ½)/(df + ½) scaled to parts-per-
    *    million, WITHOUT the log: a rational, strictly-positive idf
    *    (log-free BM25 variant; the log is monotone per term, so rare
    *    terms still dominate, but this variant weighs them more
    *    steeply — a documented scoring choice, not an approximation of
    *    float BM25);
    *  - tf-part(t,d) = (88·T·tf) / (40·T·tf + 12·T + 36·dl·N) — exactly
    *    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with k1 = 12/10,
    *    b = 3/4, avgdl = T/N, multiplied through by 40·T so every term
    *    is an integer;
    *  - score(q,d) = Σ_t∈q idf_pm(t) · tf-part(t,d), one integer
    *    division per factor, DECIMAL(38,0) intermediates (Long wraps
    *    silently near 9.2e18 — 10⁶·2N·88·T·tf passes that far below
    *    100 TB; 38 digits cover it beyond any real corpus).
    *
    * Scale shape: one corpus tokenization feeds tf/dl/df aggregates
    * (ordinary combiner shuffles); the QUERY side is bounded and
    * broadcast, so candidate generation is a map-side semi-join of the
    * postings — docs sharing no query term never materialize. The df
    * and dl joins are pinned to sort-merge (vocabulary- and
    * corpus-scaled sides must never be broadcast — the 100× probe's
    * driver-OOM lesson). Per-query ranking is a top-k window keyed by
    * query_id; its cost is the posting-list length of the query's
    * terms, the classic inverted-index bound — stopword-heavy queries
    * degrade toward a corpus scan; [[bm25TopKPruned]] is the
    * max-score/WAND-family answer, bit-identical output.
    *
    * `queries`: (query_id, tok) — one row per query term (dedup'd
    * here). Returns (query_id, doc_id, score_pm, rnk) with rnk ≤ k,
    * ties broken by doc_id for cross-engine determinism.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    require(k > 0, s"bad k $k")
    val st = corpusStats(docs)
    val qTerms = queries.select(col("query_id"), col("tok")).distinct()
    val posts = st.tf.join(broadcast(qTerms), "tok")
    topK(exactScores(posts, st), k)
  }

  /** Max-score-pruned BM25 top-k (Turtle & Flood's max-score / the
    * WAND family's upper-bound idea, batch-shaped) — output
    * BIT-IDENTICAL to [[bm25TopK]] on the same inputs, by construction:
    *
    *  1. per query TERM, a provable score ceiling ub(t) = idf_pm(t) ×
    *     tf-part(tfmax(t), dlmin) ([[UbSql]]; monotone in both knobs,
    *     floor monotone — never below any posting's true contribution);
    *  2. per candidate DOC, ceiling(d) = Σ ub(t) over its query terms —
    *     a NARROW pass over the postings (sum of broadcast constants:
    *     no df/dl joins, no per-row decimal division);
    *  3. the k docs with the highest ceilings are scored EXACTLY; the
    *     minimum of those true scores is θ — a certified lower bound on
    *     the true k-th best (any k true scores bound it);
    *  4. only docs with ceiling(d) ≥ θ get the full scoring pipeline —
    *     a doc with ceiling < θ has true score < θ ≤ k-th best and can
    *     be dropped without scoring (ties survive: equality keeps).
    *
    * This is exactness-preserving pruning: every drop is justified by
    * an arithmetic bound, never an estimate, so results stay
    * hash-verifiable against the same oracle SQL as [[bm25TopK]].
    *
    * What it buys at scale: a stopword's postings are corpus-sized but
    * its idf (and hence ub) is tiny, so docs reachable ONLY through
    * stopwords fall under θ and skip the expensive path (df/dl
    * sort-merge joins + DECIMAL(38,0) math + the top-k window). The
    * unavoidable cost floor in a batch engine is one narrow scan of
    * the query terms' postings (step 2) — the analogue of WAND's
    * pointer advance; the saved work is everything downstream, which
    * dominates. Rare-term queries see no benefit (everything survives)
    * and pay one extra narrow aggregate — use [[bm25TopK]] when the
    * query mix is known stopword-free.
    */
  def bm25TopKPruned(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    bm25Pruned(docs, queries, k)._1

  /** [[bm25TopKPruned]] plus its instrumentation frames, for specs and
    * oracle-side assertions: (result, postings fully scored, all
    * candidate postings). The counts of the latter two certify "fewer
    * postings scored" — the operator's whole point.
    */
  private[graft] def bm25Pruned(docs: DataFrame, queries: DataFrame,
      k: Int): (DataFrame, DataFrame, DataFrame) = {
    require(k > 0, s"bad k $k")
    val st = corpusStats(docs)
    val qTerms = queries.select(col("query_id"), col("tok")).distinct()
    val qtf = st.tf.join(broadcast(qTerms), "tok")
    // per-term ceilings: tfmax over the term's postings (one combiner
    // aggregate of the semi-joined tf — narrow), dlmin global (one row)
    val tmax = qtf.groupBy(col("tok")).agg(max(col("tf")).as("tfmax"))
    val minDl = st.dl.agg(min(col("dl")).as("dlmin"))
    val ub = tmax.join(st.dfreq.hint("merge"), "tok")
      .crossJoin(broadcast(st.tot))
      .crossJoin(broadcast(minDl))
      .withColumn("ub_pm", expr(UbSql))
      .select(col("tok"), col("ub_pm"))
    // ub has ≤ |distinct query terms| rows — broadcast by contract
    val docUb = qtf.join(broadcast(ub), "tok")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ub_pm")).as("doc_ub"))
    val byUb = Window.partitionBy(col("query_id"))
      .orderBy(col("doc_ub").desc, col("doc_id"))
    val seed = docUb.withColumn("__r", row_number().over(byUb))
      .filter(col("__r") <= k)
      .select(col("query_id"), col("doc_id"))
    // θ per query from the seed's EXACT scores (k·|queries| postings —
    // bounded); with fewer than k candidates nothing may be pruned
    val theta = exactScores(
        qtf.join(broadcast(seed), Seq("query_id", "doc_id"), "left_semi"), st)
      .groupBy(col("query_id"))
      .agg(min(col("score_pm")).as("theta"), count(lit(1)).as("nseed"))
    val surv = docUb.join(broadcast(theta), Seq("query_id"), "left")
      .filter(col("theta").isNull || col("nseed") < k ||
        col("doc_ub") >= col("theta"))
      .select(col("query_id"), col("doc_id"))
    // survivors are doc-scaled: semi-join pinned to sort-merge
    val survPosts = qtf.join(surv.hint("merge"),
      Seq("query_id", "doc_id"), "left_semi")
    (topK(exactScores(survPosts, st), k), survPosts, qtf)
  }
}
