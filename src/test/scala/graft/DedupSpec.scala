package graft

import graft.operators.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf0001).cache()
  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted near-dups exist in the fixture") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash+verify output equals the exact n-gram pair set") {
    val mh = Dedup.minhashPairs(docs, 3, 64, 16, 0.5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(mh == exactPairs)
  }

  test("simhash: banding is complete for hamming ≤ 3 (pigeonhole) and recalls most planted pairs") {
    val sh = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // ground truth by brute force over all doc pairs
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val hashes = texts.view.mapValues(Dedup.simhash64).toMap
    val ids = hashes.keys.toArray.sorted
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j))) <= 3
    } yield (ids(i), ids(j))).toSet
    assert(sh == want, s"banding missed ${want.diff(sh).size} / added ${sh.diff(want).size}")
    // planted near-dups: unigram simhash on a shared-vocab corpus is the
    // weakest of the dedup family — document its floor rather than hide it
    val recall = exactPairs.count(sh.contains).toDouble / exactPairs.size
    assert(recall >= 0.6, s"simhash recall $recall over ${exactPairs.size} planted pairs")
  }

  test("connected components: min-label propagation finds the exact clusters") {
    val s = spark
    import s.implicits._
    // two components: {1,2,3,8,9} (via 9-1 bridge) and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
    // long chain: diameter > 1 round forces multiple propagation rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain).collect().map(_.getAs[Long]("cluster")).distinct
    assert(cc.toSeq == Seq(0L))
  }

  test("exact dedup groups duplicate texts under one canonical id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc dd")).toDF("doc_id", "text")
    val out = Dedup.exact(df).collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 1L)
  }

  test("rolling hash is order-sensitive where token-multiset hashing is not") {
    assert(TextAnalysis.rollingHash("a b c") != TextAnalysis.rollingHash("c b a"))
    assert(TextAnalysis.rollingHash("a b c") == TextAnalysis.rollingHash("a b c"))
  }
}
