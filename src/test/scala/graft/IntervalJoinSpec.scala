package graft

import graft.operators.IntervalJoin
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def df(rows: (Long, Long, Long)*) = rows.toDF("id", "start", "end")

  test("overlap: closed-interval semantics incl. touch-at-endpoint, across bucket boundaries") {
    val a = df((1L, 0L, 10L), (2L, 100L, 200L), (3L, 50L, 50L))
    val b = df((10L, 10L, 20L),   // touches a1 at exactly 10 -> overlaps (closed)
               (11L, 21L, 49L),   // gap -> no pair
               (12L, 150L, 260L), // spans several width-64 buckets with a2
               (13L, 50L, 50L))   // point-point equal with a3
    val got = IntervalJoin.overlap(a, b, bucketWidth = 64)
      .select("a_id", "b_id", "ov_start", "ov_end", "ov_len")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 10L, 10L, 10L, 1L),
      (2L, 12L, 150L, 200L, 51L),
      (3L, 13L, 50L, 50L, 1L)))
  }

  test("overlap equals brute force on random-ish deterministic intervals, any bucket width") {
    val a = df((0L until 80L).map(i => (i, (i * 37) % 500, (i * 37) % 500 + (i % 23))): _*)
    val b = df((0L until 90L).map(i => (1000 + i, (i * 53) % 500, (i * 53) % 500 + (i % 17))): _*)
    val rowsA = a.as[(Long, Long, Long)].collect()
    val rowsB = b.as[(Long, Long, Long)].collect()
    val want = (for {
      (ia, sa, ea) <- rowsA; (ib, sb, eb) <- rowsB
      if sa <= eb && sb <= ea
    } yield (ia, ib)).toSet
    Seq(1L, 16L, 1000L).foreach { w =>
      val got = IntervalJoin.overlap(a, b, w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == want, s"w=$w mismatch")
    }
  }
}
