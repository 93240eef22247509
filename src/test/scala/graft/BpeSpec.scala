package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sennrich et al.'s worked corpus: low×5 lower×2 newest×6 widest×3.
    * Hand-derived merge order (count desc, lexicographic ties):
    *   (e,s)=9 beats (s,t)=9 lexicographically → "es"
    *   (es,t)=9 → "est"
    *   (l,o)=7 beats (o,w)=7 → "lo"
    *   (lo,w)=7 → "low"
    */
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("train reproduces the hand-computed merge sequence deterministically") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    assert(m.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got ${m.merges}")
    // retrain = bit-identical model (determinism contract)
    assert(Bpe.train(corpus, "text", numMerges = 4).merges == m.merges)
  }

  test("encode applies lowest-rank-first and handles OOV as characters") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    // "lowest" never appears in the corpus but its pieces do
    assert(m.encode("lowest") == Seq("low", "est"))
    assert(m.encode("low") == Seq("low"))
    assert(m.encode("widest") == Seq("w", "i", "d", "est"))
    // fully OOV word falls through as chars, never throws
    assert(m.encode("xyz") == Seq("x", "y", "z"))
    assert(m.encode("") == Seq())
  }

  test("tokens always concatenate back to the word (lossless segmentation)") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    val words = Seq("low", "lower", "lowest", "newest", "widest",
      "wildest", "es", "t", "zzz", "newestnewest")
    words.foreach { w =>
      assert(m.encode(w).mkString == w, s"lossy segmentation of $w")
    }
  }

  test("merge loop stops early when the corpus is fully merged") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, "text", numMerges = 10)
    assert(m.merges == Seq(("a", "b")), s"got ${m.merges}")
  }

  test("minCount/maxWords bound the word table (heavy-tail cap)") {
    val df = Seq((1L, "aa aa aa zz qq")).toDF("doc_id", "text")
    // minCount=2 drops zz/qq: the only learnable merge is (a,a)
    val m = Bpe.train(df, "text", numMerges = 5, minCount = 2L)
    assert(m.merges == Seq(("a", "a")))
    // maxWords=1 keeps only the most frequent word
    val m2 = Bpe.train(df, "text", numMerges = 5, maxWords = 1)
    assert(m2.merges == Seq(("a", "a")))
  }

  test("tokenCounts equals a driver-side re-encode, and is map-only + one agg") {
    val m = Bpe.train(corpus, "text", numMerges = 4)
    val got = Bpe.tokenCounts(corpus, "doc_id", "text", m)
      .as[(Long, Long)].collect().toMap
    val expected = corpus.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty)
        .map(w => m.encode(w).length.toLong).sum
    }.toMap
    assert(got == expected)
    // low→1 token ×5; newest→(n,e,w,est)=4 ×6
    assert(got(1L) == 5L && got(3L) == 24L)
    // scale shape: exactly ONE exchange (the per-doc sum) — encoding
    // itself never shuffles
    val p = Bpe.tokenCounts(corpus, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, s"expected 1 exchange:\n$p")
  }
}
