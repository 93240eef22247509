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
    * terms, the classic inverted-index bound (stopword-heavy queries
    * degrade toward a corpus scan — the WAND/max-score pruning family
    * is the known upgrade path).
    *
    * `queries`: (query_id, tok) — one row per query term (dedup'd
    * here). Returns (query_id, doc_id, score_pm, rnk) with rnk ≤ k,
    * ties broken by doc_id for cross-engine determinism.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    require(k > 0, s"bad k $k")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val tot = dl.agg(sum(col("dl")).as("t_total"), count(lit(1)).as("n_docs"))
    val qTerms = queries.select(col("query_id"), col("tok")).distinct()
    val posts = tf.join(broadcast(qTerms), "tok")
      .join(dfreq.hint("merge"), "tok")
      .join(dl.hint("merge"), "doc_id")
      .crossJoin(broadcast(tot))
    val contrib = posts.withColumn("c",
      expr("((CAST(1000000 AS DECIMAL(38,0)) * (2 * (n_docs - df) + 1))" +
        " div (2 * df + 1))" +
        " * (CAST(88 AS DECIMAL(38,0)) * t_total * tf)" +
        " div (CAST(40 AS DECIMAL(38,0)) * t_total * tf" +
        " + 12 * t_total + 36 * dl * n_docs)"))
    val scores = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_pm"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score_pm").desc, col("doc_id"))
    scores.withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= k)
  }
}
