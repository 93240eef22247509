package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and inference — the tokenizer
  * step of an LLM data pipeline (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Scale shape, which is the point at 100 TB:
  *
  *  1. TRAIN's corpus pass is ONE distributed word-count shuffle
  *     (explode → groupBy word), capped by `minCount`/`maxWords` into a
  *     BOUNDED word-frequency table — the heavy-tail cap every
  *     production trainer applies, because hapax typos add vocabulary
  *     cost but no merge signal.
  *  2. The merge loop then runs on that bounded table on the driver —
  *     the same shape SentencePiece/HF trainers use (distributed
  *     statistics, in-memory merge learning). Driver state is
  *     O(maxWords · avg word length), independent of corpus size.
  *  3. ENCODE is map-only: the ranks table (≤ numMerges entries)
  *     broadcasts to executors; each occurrence encodes locally and the
  *     only shuffle is the caller's own aggregation. No corpus-sized
  *     join, no driver round-trips.
  *
  * Symbols are Java chars (UTF-16 code units) — exact for the BMP-only
  * fixtures; a byte-level variant would swap the initial alphabet, not
  * the algorithm. The encode UDF is a deliberate exception to the
  * "builtins first" rule: BPE inference is an inherently iterative
  * lowest-rank-first reduction no Catalyst expression composes, and the
  * UDF sits in a map-only stage outside any join/agg hot path.
  */
object Bpe {

  /** Learned merge rules in priority order (rank = index). */
  final case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def encode(word: String): Seq[String] = encodeWord(word, ranks)
  }

  /** Learn up to `numMerges` merges from the corpus. Deterministic:
    * the best pair is (count DESC, left ASC, right ASC) — ties break
    * lexicographically, so retraining reproduces the model bit-exact.
    * Stops early when no adjacent pair remains (fully merged corpus).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, maxWords: Int = 65536): Model =
    Model(trainWithStats(docs, textCol, numMerges, minCount, maxWords)
      .map { case (a, b, _) => (a, b) })

  /** [[train]] plus the pair count at each selection — the auditable
    * training trace (rank, left, right, count). The q197 oracle replays
    * exactly this recurrence in SQL.
    */
  def trainWithStats(docs: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, maxWords: Int = 65536): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
      .orderBy($"n".desc, $"w") // deterministic heavy-tail cap
      .limit(maxWords)
      .as[(String, Long)].collect()

    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((a, b), n) =
          pairCounts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, n))
        words = words.map { case (syms, cnt) => (applyMerge(syms, (a, b)), cnt) }
      }
      iter += 1
    }
    merges.toSeq
  }

  /** One left-to-right pass replacing every non-overlapping (a,b)
    * adjacency with the fused symbol — the standard BPE merge step
    * (leftmost-first on overlaps, e.g. "aaa" under (a,a) → "aa","a").
    */
  private[operators] def applyMerge(
      syms: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: repeatedly apply the LOWEST-RANK adjacent pair
    * present (the standard inference rule — equivalent to replaying the
    * learned merges in training order). Words with unseen symbols fall
    * through as characters — OOV never throws.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var more = true
    while (more && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) more = false
      else syms = applyMerge(syms, best)
    }
    syms.toSeq
  }

  /** Per-document BPE token counts — the "how many tokens is my
    * corpus" pass that prices a training run. Map-only over the corpus
    * (ranks broadcast once, every word encodes where it lives); the
    * single shuffle is the per-document sum.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val nToks = udf((w: String) => encodeWord(w, ranksB.value).length)
    docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .withColumn("nt", nToks($"w"))
      .groupBy(col(idCol))
      .agg(sum($"nt").cast("long").as("n_tokens"))
  }
}
