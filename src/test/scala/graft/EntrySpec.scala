package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract. Every registered query must build and run
  * at sf0.001, and every oracle key must reference a registered query.
  */
class EntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys; names are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"dangling oracles: ${o.diff(q)}")
    assert(q.forall(_.matches("q[0-9]{2,3}_[a-z0-9_]+")))
  }

  // Round-4 lesson: a dropped registration silently shrank the oracle
  // report while every surviving entry stayed green. The declared surface
  // is pinned to a literal so ANY disappearance — a query, or its oracle —
  // is a red test, not a quietly smaller CORRECTNESS file. Bump BOTH
  // literals when adding queries.
  test("declared query surface is exact (no silent shrink)") {
    assert(SparkEntry.queries.size == 239,
      s"query count changed: ${SparkEntry.queries.size} (update the literal ONLY for intentional adds/removals)")
    assert(SparkEntry.oracleSql.size == 239,
      s"oracle count changed: ${SparkEntry.oracleSql.size}; missing oracles for: " +
        SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet).toSeq.sorted.mkString(", "))
  }

  // Round-10 ADVICE: the README's prose count drifted (233 vs 236).
  // Derive the doc claim from the registry instead of hand-maintaining:
  // the README states "all N carry ANSI-SQL" and this test pins N to
  // SparkEntry.queries.size, so a query add that forgets the doc is a
  // red test, not a stale README.
  test("README query count matches the registry") {
    val readme = new java.io.File("README.md")
    assume(readme.exists(), "README.md not in test working dir")
    val txt = scala.io.Source.fromFile(readme, "UTF-8").mkString
    val m = "all (\\d+) carry ANSI-SQL".r.findFirstMatchIn(txt)
    assert(m.isDefined, "README no longer states the oracle-count claim")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README claims ${m.get.group(1)} oracle-carrying queries; registry has ${SparkEntry.queries.size}")
  }

  test("every query runs at sf0.001 and returns a readable result") {
    val failures = SparkEntry.all.flatMap { qd =>
      try {
        qd.build(spark, sf0001).count()
        None
      } catch { case e: Throwable => Some(qd.name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
