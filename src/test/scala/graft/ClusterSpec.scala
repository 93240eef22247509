package graft

import graft.operators.Cluster
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("core cells cluster across 8-adjacency; sparse cells drop; isolates self-label") {
    // cell size 10, minPts 3. Dense cells: (0,0), (1,1) — diagonal
    // adjacency, must merge. (5,5) dense but isolated. (9,9) sparse.
    def pts(cx: Long, cy: Long, k: Int) =
      (0 until k).map(i => (cx * 10 + i % 10, cy * 10 + (i / 10) % 10))
    val df = (pts(0, 0, 3) ++ pts(1, 1, 4) ++ pts(5, 5, 3) ++ pts(9, 9, 2))
      .toDF("px", "py")
    val got = Cluster.gridDensity(df, "px", "py", cellSize = 10L, minPts = 3L)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 3L),                  // min id of the merged component
      (1L, 1L, 0L, 4L),                  // merged with (0,0) via diagonal
      (5L, 5L, (5L << 32) | 5L, 3L)))    // isolated core cell labels itself
  }

  // Round-5 advice: the old decimal-shift id (cx*1e6+cy) collided for
  // mixed-sign coordinates — (1,-500000) and (0,500000) shared an id and
  // unrelated clusters silently merged; Spark's truncating div also
  // disagreed with the oracle's floor // on negatives.
  test("negative / mixed-sign coordinates: floor cells, no id collisions") {
    // Two far-apart dense cells that collided under the decimal pack:
    // cells (1, -500000) and (0, 500000) both packed to id 500000.
    def pts(cx: Long, cy: Long, k: Int) =
      (0 until k).map(i => (cx * 10 + i % 10, cy * 10 + (i / 10) % 10))
    val df = (pts(1, -500000, 3) ++ pts(0, 500000, 3)).toDF("px", "py")
    val got = Cluster.gridDensity(df, "px", "py", cellSize = 10L, minPts = 3L)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // floor division: py = -5000000 → cell -500000 exactly (not -499999)
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, -500000L), (0L, 500000L)))
    // two ISOLATED self-labelled clusters, never merged
    assert(got.map(_._3).distinct.size == 2, s"cell-id collision merged them: $got")
  }

  test("a chain of adjacent dense cells collapses to one cluster (pointer-jump depth)") {
    // 12 cells in a horizontal line — component diameter 12 forces
    // multiple CC rounds
    val df = (0 until 12).flatMap(c => (0 until 3).map(i => (c * 10 + i, 5L)))
      .toDF("px", "py")
    val got = Cluster.gridDensity(df, "px", "py", cellSize = 10L, minPts = 3L)
      .select("cluster").distinct().as[Long].collect().toSeq
    assert(got == Seq(0L), s"chain did not collapse: $got")
  }
}
