package graft

import graft.sources.TxLog
import graft.plans.KmvSketchAgg.kmvEstimate
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-resident KMV distinct-count sketches: commit harvests the k
  * smallest distinct u32 hashes per batch (`collectSketches`), and
  * `approxDistinct` answers table-level NDV metadata-only — bit-for-bit
  * equal to a full-table KmvSketchAgg scan at the same k, because KMV
  * union-merge is exact.
  */
class TxSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txsketch_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("manifest sketch merge ≡ full-scan sketch (estimator AND exact paths)") {
    val t = fresh("merge")
    // 3 batches, overlapping values across batches (merge must dedup)
    Seq(0L until 400L, 300L until 700L, 650L until 1000L).foreach { r =>
      TxLog.commit(spark, t, r.map(i => (i, (i % 7).toString)).toDF("id", "g"),
        append = true, collectSketches = Seq("id" -> 32, "g" -> 32))
    }
    val scanned = TxLog.read(spark, t)
      .agg(kmvEstimate($"id", 32).as("e_id"), kmvEstimate($"g", 32).as("e_g"))
      .collect().head
    // estimator path (1000 distinct ids >> k=32)
    assert(TxLog.approxDistinct(spark, t, "id").get == scanned.getDouble(0))
    // exact path (7 distinct groups < k)
    assert(TxLog.approxDistinct(spark, t, "g").get == scanned.getDouble(1))
    assert(TxLog.approxDistinct(spark, t, "g").get == 7.0)
  }

  test("append carry-forward preserves old sketches; a sketch-less batch declines") {
    val t = fresh("carry")
    TxLog.commit(spark, t, (0L until 50L).toDF("id"),
      append = true, collectSketches = Seq("id" -> 16))
    TxLog.commit(spark, t, (50L until 90L).toDF("id"),
      append = true, collectSketches = Seq("id" -> 16))
    assert(TxLog.approxDistinct(spark, t, "id").isDefined)
    // third append WITHOUT a sketch: the table-level answer must decline
    TxLog.commit(spark, t, (90L until 95L).toDF("id"), append = true)
    assert(TxLog.approxDistinct(spark, t, "id").isEmpty)
    // the old snapshot still answers via time travel
    assert(TxLog.approxDistinct(spark, t, "id", asOf = Some(2L)).isDefined)
    // a column never sketched declines too
    assert(TxLog.approxDistinct(spark, t, "missing", asOf = Some(2L)).isEmpty)
  }

  test("delete rewrite drops the rewritten batch's sketch -> safe decline") {
    val t = fresh("rewrite")
    TxLog.commit(spark, t, (0L until 40L).toDF("id"),
      append = true, collectSketches = Seq("id" -> 16))
    TxLog.commit(spark, t, (40L until 80L).toDF("id"),
      append = true, collectSketches = Seq("id" -> 16))
    assert(TxLog.approxDistinct(spark, t, "id").isDefined)
    TxLog.deleteWhere(spark, t, "id", Some(5L), Some(5L))
    // the rewritten batch has no sketch: decline rather than under-count
    assert(TxLog.approxDistinct(spark, t, "id").isEmpty)
  }

  test("clusterHealth: range-split key 0 overlaps, arrival-order key all overlaps") {
    val t = fresh("health")
    // committed in x-stripes: x ranges disjoint, y spans [0,99] everywhere
    (0 until 4).foreach { s4 =>
      TxLog.commit(spark, t, (0L until 100L)
        .map(y => (s4 * 100L + y, y)).toDF("x", "y"), append = true)
    }
    val h = TxLog.clusterHealth(spark, t, Seq("x", "y", "nosuch"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toMap
    assert(h("x") == ((4L, Some(0L), 6L)), "disjoint stripes never overlap")
    assert(h("y") == ((4L, Some(6L), 6L)), "arrival order overlaps every pair")
    assert(h("nosuch") == ((4L, None, 6L)), "stats-less column reports null")
    // the metric MOVES under OPTIMIZE: z-ordering (x, y) must cut y's
    // overlap below total while x stays prunable-dominant
    TxLog.compactClustered(spark, t, Seq("x", "y"), bits = 7, batches = 8)
    val h2 = TxLog.clusterHealth(spark, t, Seq("y")).collect().head
    assert(h2.getLong(3) > 6L) // 8 batches -> 28 pairs
    assert(h2.getAs[Long]("overlap_pairs") < h2.getLong(3),
      s"z-order must reduce y overlap: $h2")
  }

  test("all-null column sketches to zero distinct; nulls never hash in") {
    val t = fresh("nulls")
    TxLog.commit(spark, t,
      (0L until 5L).map(i => (i, Option.empty[String])).toDF("id", "s"),
      append = true, collectSketches = Seq("s" -> 8, "id" -> 8))
    assert(TxLog.approxDistinct(spark, t, "s").get == 0.0)
    assert(TxLog.approxDistinct(spark, t, "id").get == 5.0)
  }
}
