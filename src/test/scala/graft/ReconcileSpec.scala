package graft

import graft.jobs.{CalculateTimes, Pipeline, Reconcile}
import graft.routing._
import graft.sources.TableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Missing-pairs reconciliation (fix_missing.sh semantics): a flaky run
  * followed by reconcile must converge to the full-route result, with
  * pair-count conservation at every step.
  */
class ReconcileSpec extends AnyFunSuite {
  import SparkTestSession._

  private def origins = (0 until 60).map(i =>
    RawPoint(f"${i}%07d23", 120.0 + (i % 9) * 0.25, 28.0 + (i % 7) * 0.25))
  private def dests = (0 until 15).map(i =>
    RawPoint(f"${i + 500000}%07d41", 121.0 + (i % 5) * 0.25, 29.0 + (i % 11) * 0.25))
  private val snapper = new GridSnapper(noSnapAboveLat = 44.0)
  private val cfg0 = CalculateTimes.Config(oSplit = 16, dSplit = 8, maxDepth = 10,
    outDir = "unset")

  private def timesSet(dir: String): Set[(String, String, Double)] =
    TableIO.readPartitioned(spark, dir)
      .select("origin_id", "destination_id", "duration_sec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("flaky run + reconcile converges to the full-route result; conservation holds") {
    val s = spark
    import s.implicits._
    val out = "/tmp/graft_reconcile_spec"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    // run 1: transient failures — every origin with prefix 000001 fails
    val flaky = new SyntheticRouter(30.0,
      originIsland = p => p.id.startsWith("000001"), destIsland = _ => false)
    CalculateTimes.run(s, origins.toDS(), dests.toDS(), snapper, flaky,
      cfg0.copy(outDir = out))
    val total = 60L * 15L
    val t1 = timesSet(s"$out/times").size
    val m1 = Pipeline.countPartitioned(s, s"$out/missing_pairs")
    assert(m1 > 0, "fixture must produce missing pairs")
    assert(t1 + m1 == total)

    // reconcile with a healthy router: everything recovers
    val healthy = new SyntheticRouter(30.0)
    val r = Reconcile.missingPairs(s, out, healthy, cfg0,
      oSplit = 16, dSplit = 8, maxDepth = 10)
    assert(r.nMissingBefore == m1)
    assert(r.nReconciled == m1)
    assert(r.nStillMissing == 0)
    assert(Pipeline.countPartitioned(s, s"$out/missing_pairs") == 0)

    // the merged tree equals a clean full-route run, value for value
    val ref = "/tmp/graft_reconcile_ref"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(ref), true)
    CalculateTimes.run(s, origins.toDS(), dests.toDS(), snapper, healthy,
      cfg0.copy(outDir = ref))
    assert(timesSet(s"$out/times") == timesSet(s"$ref/times"))
    // no duplicate pairs from the merge
    val merged = TableIO.readPartitioned(s, s"$out/times")
      .groupBy("origin_id", "destination_id").count()
      .filter(col("count") > 1)
    assert(merged.isEmpty)
  }

  test("persistent failures stay missing; conservation holds step by step") {
    val s = spark
    import s.implicits._
    val out = "/tmp/graft_reconcile_partial"
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    // run 1: two failure classes — transient (origin 000001*) and
    // persistent (destination 050000[0-3]*)
    val flaky = new SyntheticRouter(30.0,
      originIsland = p => p.id.startsWith("000001"),
      destIsland = p => p.id.drop(6).take(1) == "3")
    CalculateTimes.run(s, origins.toDS(), dests.toDS(), snapper, flaky,
      cfg0.copy(outDir = out))
    val total = 60L * 15L
    val m1 = Pipeline.countPartitioned(s, s"$out/missing_pairs")
    assert(timesSet(s"$out/times").size + m1 == total)

    // reconcile fixes the transient class only
    val stillFlaky = new SyntheticRouter(30.0,
      originIsland = _ => false,
      destIsland = p => p.id.drop(6).take(1) == "3")
    val r = Reconcile.missingPairs(s, out, stillFlaky, cfg0,
      oSplit = 16, dSplit = 8, maxDepth = 10)
    assert(r.nMissingBefore == m1)
    assert(r.nStillMissing > 0 && r.nStillMissing < m1)
    assert(r.nReconciled == m1 - r.nStillMissing)
    assert(timesSet(s"$out/times").size + r.nStillMissing == total)

    // second reconcile against a healthy backend drains the rest
    val r2 = Reconcile.missingPairs(s, out, new SyntheticRouter(30.0), cfg0,
      oSplit = 16, dSplit = 8, maxDepth = 10)
    assert(r2.nStillMissing == 0)
    assert(timesSet(s"$out/times").size == total)
  }
}
